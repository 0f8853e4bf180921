"""Structured Streaming micro-bench: events/sec through the chat pipeline
stages, driven by the custom Python DataSource (one availableNow drain of a
single large micro-batch — measures the steady-state per-batch path, not
trigger latency).

Usage: python scripts/bench_streaming.py [n_events]
Prints one JSON line: {"events": N, "stages": {name: {"sec": s, "eps": r}}}
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tempfile

from etl_backend_spark.session import get_spark  # noqa: E402
from etl_backend_spark.sources.event_source import (  # noqa: E402
    SyntheticEventsDataSource,
)
from etl_backend_spark.streaming import chat_pipeline as cp  # noqa: E402


def drain(writer, name: str) -> float:
    t0 = time.perf_counter()
    q = writer.trigger(availableNow=True).queryName(name).start()
    q.awaitTermination()
    return time.perf_counter() - t0


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    spark = get_spark(app_name="bench-streaming")
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(SyntheticEventsDataSource)

    def source():
        return (
            spark.readStream.format("synthetic_events")
            .option("rowsPerBatch", n)
            .option("numPartitions", 8)
            .load()
        )

    tmp = tempfile.mkdtemp(prefix="etlbs-sbench-")
    results = {}

    # warm-up: first streaming query pays engine/codegen/python-worker init
    warm = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 1000).load()
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ckw")
    )
    drain(warm, "warm")

    # 0. source floor: the Python generator alone (row-by-row Python yield
    # + Arrow transfer) — subtract this from any stage to get stage cost
    w = (
        source().writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ck0")
    )
    results["source_only"] = drain(w, "s0")

    # 1. ingest: validate -> parquet append sink (the message.create path)
    w = cp.append_sink(
        cp.validate_events(source()), f"{tmp}/out1", f"{tmp}/ck1"
    )
    results["ingest_parquet"] = drain(w, "s1")

    # 2. keyed agg in update mode (conversation touch)
    w = (
        cp.conversation_touch(source())
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ck2")
        .outputMode("update")
    )
    results["keyed_agg_update"] = drain(w, "s2")

    # 3. stateful presence routing (applyInPandasWithState)
    w = (
        cp.presence_routing(source())
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ck3")
        .outputMode("update")
    )
    results["stateful_routing"] = drain(w, "s3")

    # 4. event-time tumbling window counts with watermark
    w = (
        cp.windowed_counts(source())
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ck4")
        .outputMode("append")
    )
    results["windowed_counts"] = drain(w, "s4")

    # 5. per-event trailing-1h rate counter (keyed state, append mode)
    w = (
        cp.rolling_rate_counter(source())
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ck5")
        .outputMode("append")
    )
    results["rolling_rate_counter"] = drain(w, "s5")

    # 6-9. the r5-r7 stateful family (VERDICT r7 #5 refresh): funnel
    # tracker, event-time-timeout session closer, EWMA and Holt folds —
    # all applyInPandasWithState, keyed by user
    w = (
        cp.funnel_conversions(source())
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ck6")
        .outputMode("append")
    )
    results["funnel_conversions"] = drain(w, "s6")

    w = (
        cp.idle_session_close(source())
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ck7")
        .outputMode("append")
    )
    results["idle_session_close"] = drain(w, "s7")

    w = (
        cp.streaming_ewma(source())
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ck8")
        .outputMode("update")
    )
    results["streaming_ewma"] = drain(w, "s8")

    w = (
        cp.streaming_holt(source())
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ck9")
        .outputMode("update")
    )
    results["streaming_holt"] = drain(w, "s9")

    # 10. watermark-bounded streaming dedup (state = watermark horizon)
    w = (
        cp.dedup_stream(source(), ["event_id"])
        .writeStream.format("noop")
        .option("checkpointLocation", f"{tmp}/ck10")
        .outputMode("append")
    )
    results["dedup_stream"] = drain(w, "s10")

    print(json.dumps({
        "events": n,
        "stages": {
            k: {"sec": round(v, 3), "eps": round(n / v)}
            for k, v in results.items()
        },
    }))


if __name__ == "__main__":
    main()

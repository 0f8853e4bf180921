"""Streaming dedup ingest (r13 VERDICT #3): the exact + minhash
incremental family run as a Structured Streaming foreachBatch loop with
txn-token idempotence. The load-bearing pin is BATCH-EQUIVALENCE — N
micro-batches through the real stream produce bit-identical survivors
AND index state to a one-shot ingest of the same docs — plus the
at-least-once cases: a replayed committed batch is a zero-effect no-op,
and a replay after a crash BETWEEN the four table commits converges to
the same state."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etl_backend_spark.streaming.chat_pipeline import run_available_now
from etl_backend_spark.streaming.ingest_pipeline import StreamingDedupIngest

N_DOCS = 120
BATCHES = 3


def _corpus():
    """120 docs, ids arrival-monotone across 3 batches of 40, with
    planted exact and near duplicates within and across batches."""
    rng = np.random.RandomState(23)
    vocab = [f"w{j}" for j in range(5000)]
    docs = {i: " ".join(rng.choice(vocab, 30)) for i in range(N_DOCS)}

    def perturb(i, pos, w):
        t = docs[i].split()
        t[pos] = w
        return " ".join(t)

    docs[5] = docs[3]                       # exact dup, within batch 0
    docs[45] = docs[3]                      # exact dup, across batches
    docs[7] = perturb(6, 15, "zzz")         # near dup, within batch 0
    docs[50] = perturb(10, 20, "qqq")       # near dup, across batches
    docs[85] = perturb(50, 8, "rrr")        # chain: near-dups a DROPPED doc
    return docs


EXPECT_DROPPED = {5, 45, 7, 50, 85}


def _state_rows(ingest):
    out = {}
    for name, df in ingest.state().items():
        cols = sorted(df.columns)
        out[name] = sorted(
            tuple(str(r[c]) for c in cols) for r in df.collect()
        )
    return out


@pytest.fixture(scope="module")
def states(spark, tmp_path_factory):
    """Run the real 3-micro-batch stream and the one-shot ingest once;
    several tests assert different facets of the outcome."""
    docs = _corpus()
    base = tmp_path_factory.mktemp("sdi")

    # --- multi-batch: 3 parquet FILES, mtime-ordered so the file stream
    # delivers them as batches 0,1,2 (ids arrival-monotone)
    src = base / "src"
    src.mkdir()
    per = N_DOCS // BATCHES
    for b in range(BATCHES):
        ids = range(b * per, (b + 1) * per)
        p = str(src / f"b{b}.parquet")
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "text": pa.array([docs[i] for i in ids])}), p)
        os.utime(p, (1_700_000_000 + b, 1_700_000_000 + b))

    multi = StreamingDedupIngest(spark, str(base / "multi"))
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    run_available_now(
        multi.writer(stream, str(base / "ckpt")), "dedup-ingest")

    # --- one-shot: the same docs as ONE batch through the same handler
    single = StreamingDedupIngest(spark, str(base / "single"))
    all_df = spark.createDataFrame(
        [(int(i), docs[i]) for i in range(N_DOCS)], "doc_id long, text string")
    single.process_batch(all_df, 0)
    return multi, single, docs


def test_stream_ran_three_batches(states, tmp_path):
    multi, _, _ = states
    # survivors manifest carries one txn per micro-batch
    txns = multi.survivors._live_manifest().get("txns", {})
    assert len(txns) == BATCHES


def test_planted_duplicates_dropped(states):
    multi, _, _ = states
    kept = {r.doc_id for r in multi.survivors.read().collect()}
    assert kept == set(range(N_DOCS)) - EXPECT_DROPPED


def test_batch_equivalence_multi_equals_one_shot(states):
    """THE pin: N micro-batches ≡ one-shot ingest, bit-identical
    survivors and all three index tables."""
    multi, single, _ = states
    assert _state_rows(multi) == _state_rows(single)


def test_replayed_batch_is_noop(states, spark):
    """At-least-once delivery: re-running a committed (batch, id) pair
    through the handler changes nothing — same manifest version, same
    rows (the txn token short-circuits before any file is written)."""
    multi, _, docs = states
    before = _state_rows(multi)
    vers = {n: t._live_id() for n, t in (
        ("s", multi.survivors), ("h", multi.hash_index),
        ("g", multi.sig_index), ("b", multi.band_index))}
    per = N_DOCS // BATCHES
    replay = spark.createDataFrame(
        [(int(i), docs[i]) for i in range(per)], "doc_id long, text string")
    multi.process_batch(replay, 0)  # batch 0, already committed
    assert _state_rows(multi) == before
    assert {n: t._live_id() for n, t in (
        ("s", multi.survivors), ("h", multi.hash_index),
        ("g", multi.sig_index), ("b", multi.band_index))} == vers


def test_replay_after_partial_commit_converges(spark, tmp_path,
                                               monkeypatch):
    """Crash BETWEEN table commits: the first attempt dies after the
    survivors commit but before the index commits; the foreachBatch
    replay of the same batch must converge to exactly the one-shot
    state (survivors recompute against pre-batch indexes; committed
    tables no-op via their txn tokens)."""
    from etl_backend_spark.etl.manifest import ManifestTable

    docs = _corpus()
    all_df = spark.createDataFrame(
        [(int(i), docs[i]) for i in range(N_DOCS)],
        "doc_id long, text string")

    crashed = StreamingDedupIngest(spark, str(tmp_path / "crash"))
    real = ManifestTable.append_once
    calls = {"n": 0}

    def dying(self, df, txn, evolve=False):
        calls["n"] += 1
        if calls["n"] == 2:  # after survivors, before hash_index
            raise RuntimeError("simulated crash between commits")
        return real(self, df, txn, evolve=evolve)

    monkeypatch.setattr(ManifestTable, "append_once", dying)
    with pytest.raises(RuntimeError, match="simulated crash"):
        crashed.process_batch(all_df, 0)
    monkeypatch.setattr(ManifestTable, "append_once", real)
    crashed.process_batch(all_df, 0)  # the replay

    oneshot = StreamingDedupIngest(spark, str(tmp_path / "clean"))
    oneshot.process_batch(all_df, 0)
    assert _state_rows(crashed) == _state_rows(oneshot)
    kept = {r.doc_id for r in crashed.survivors.read().collect()}
    assert kept == set(range(N_DOCS)) - EXPECT_DROPPED

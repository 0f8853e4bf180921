"""Manifest-based table format: Delta/Iceberg-style file-level commits over
plain parquet — the scale answer for mutations that ``ParquetTableStore``
(full rewrite) and ``PartitionedTableStore`` (partition rewrite + hard
links) approximate.

Layout:
    root/<table>/data/f-<uuid>.parquet          immutable data files
    root/<table>/manifest/m-<uuid>.json         file list + per-file stats
    root/<table>/_CURRENT                       live manifest id (atomic swap)

A manifest entry records, per data file: path, row count, and min/max of the
configured stats columns. Mutations operate at FILE granularity:

- ``append``      → write new files, commit = old list + new entries.
- ``delete``      → only files whose [min,max] interval can contain matching
                    rows are rewritten; all other entries carry over
                    untouched (zero data movement — the manifest IS the
                    carry-forward).
- ``compact``     → bin-pack small files into target-size files; pure
                    metadata swap plus the rewrite of the small files.
- readers         → ``read`` loads the live file list; ``read_pruned``
                    additionally skips files by manifest stats before Spark
                    even sees them (manifest-level partition/zone pruning).

Every commit is a new manifest + atomic pointer swap; old manifests remain
readable (time travel) until vacuumed.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import time
import uuid

from urllib.parse import unquote, urlparse

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _bloom_pos(col: str, i: int, m: int):
    """Spark-side bloom probe position i for a column value: first 8 hex
    chars of md5(f"{i}:{value}") mod m — mirrored byte-for-byte by
    ``bloom_positions`` below."""
    s = F.concat(F.lit(f"{i}:"), F.col(col).cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % m


def bloom_positions(value, k: int, m: int) -> list[int]:
    """Python twin of ``_bloom_pos`` for the probe side."""
    return [
        int(hashlib.md5(f"{i}:{value}".encode()).hexdigest()[:8], 16) % m
        for i in range(k)
    ]


class CommitConflict(RuntimeError):
    """Another writer committed between this writer's snapshot read and its
    pointer swap; re-read the live manifest and retry the mutation."""


class ManifestTable:
    #: bloom sizing: 8192 bits / 4 probes ≈ 1.2% false-positive at ~850
    #: distinct values per file; stored packed (1 KiB base64) per file
    BLOOM_BITS = 8192
    BLOOM_K = 4

    def __init__(self, spark: SparkSession, root: str, name: str,
                 stats_cols: list[str], bloom_col: str | None = None,
                 bloom_bits: int | None = None):
        self.spark = spark
        self.dir = os.path.join(root, name)
        self.data_dir = os.path.join(self.dir, "data")
        self.manifest_dir = os.path.join(self.dir, "manifest")
        self.stats_cols = stats_cols
        self.bloom_col = bloom_col
        self.table_checks: list[tuple] = []
        if bloom_bits is not None:
            # size to the expected distinct keys PER FILE: a bloom whose
            # fill ratio approaches 1 hits on every probe and prunes
            # nothing (observed: 19k keys/file saturating 8192 bits at the
            # sf1 decade). ~10 bits/key keeps fpp ~1% at k=4.
            self.BLOOM_BITS = bloom_bits

    # ------------------------------------------------------------ plumbing

    def _pointer(self) -> str:
        return os.path.join(self.dir, "_CURRENT")

    def _live_id(self) -> str:
        with open(self._pointer()) as f:
            return f.read().strip()

    def _manifest_at(self, mid: str) -> dict:
        with open(os.path.join(self.manifest_dir, mid)) as f:
            return json.load(f)

    def _snapshot(self) -> tuple[str, dict]:
        """(manifest id, manifest) from ONE pointer read — every mutation
        must derive both its entry list and its CAS parent from the same
        snapshot, or a commit landing between two separate pointer reads
        slips past the conflict check (lost update)."""
        mid = self._live_id()
        return mid, self._manifest_at(mid)

    def _live_manifest(self) -> dict:
        return self._snapshot()[1]

    def _acquire_lock(self, lock: str, timeout: float = 5.0) -> int:
        """Serialize the check-and-swap with an OS lock (``flock``) on a
        persistent lock file. The kernel releases the lock when the holder's
        fd closes — including on crash — so there is no stale-lock state to
        reclaim. (The previous remove-if-older-than scheme had a TOCTOU: a
        fresh holder could acquire between the staleness stat and the
        unlink, the unlink then deleted the NEW holder's lock, and two
        committers ran the CAS concurrently — a silent lost update.)

        The lock file itself is never unlinked: remove-after-release lets a
        third writer recreate the path as a NEW inode while a second writer
        still holds an fd to the old one, and the two would lock different
        inodes. One immortal empty file per table is the price of
        correctness. Local-fs mechanism only; an object-store deployment
        would use conditional PUT (if-match) on the pointer instead."""
        import fcntl

        fd = os.open(lock, os.O_CREAT | os.O_WRONLY)
        deadline = time.monotonic() + timeout
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                return fd
            except BlockingIOError:
                if time.monotonic() >= deadline:
                    os.close(fd)
                    raise CommitConflict(
                        f"commit lock {lock} held past {timeout}s"
                    ) from None
                time.sleep(0.05)

    #: sentinel: commit inherits the parent manifest's deletion vectors
    _INHERIT_DVS = object()

    def _commit(self, entries: list[dict], parent: str | None,
                txn: str | None = None,
                schema_json: str | None = None,
                dvs=_INHERIT_DVS) -> None:
        """Atomic pointer swap with optimistic concurrency: `parent` is the
        manifest id this commit was derived from (None = table creation).
        A short-lived O_EXCL lock file serializes the check-and-swap, and
        the swap fails with CommitConflict if _CURRENT no longer points at
        `parent` — the classic lost-update (two writers both derived from
        the same snapshot; the second must re-read and retry).

        `txn` (optional) is an idempotence token recorded in the manifest;
        the committed manifest carries the union of all ancestor tokens so
        ``append_once`` can test replay membership in O(1)."""
        mid = f"m-{uuid.uuid4().hex}.json"
        # ancestor tokens come from the PARENT manifest, not the live
        # pointer — the pointer may already have moved past parent, and the
        # CAS below will reject this commit anyway in that case
        pm = self._manifest_at(parent) if parent else {}
        txns = dict(pm.get("txns", {}))
        if txn is not None:
            txns[txn] = mid
        # per-commit schema: evolution commits pass the new one; every other
        # commit inherits the parent's, so read_at() can always reconstruct
        # the column set AS OF that snapshot
        if schema_json is None:
            schema_json = pm.get("schema")
        # deletion vectors inherit from the parent unless the commit says
        # otherwise (delete_dv appends one; compact_dv clears them)
        if dvs is ManifestTable._INHERIT_DVS:
            dvs = pm.get("dvs", [])
        mpath = os.path.join(self.manifest_dir, mid)
        with open(mpath, "w") as f:
            json.dump(
                {"entries": entries, "parent": parent, "txns": txns,
                 "schema": schema_json, "dvs": dvs},
                f,
            )
        lock = self._pointer() + ".lock"
        try:
            fd = self._acquire_lock(lock)
        except CommitConflict:
            os.remove(mpath)  # never committed — don't orphan the manifest
            raise
        try:
            live = self._live_id() if os.path.exists(self._pointer()) else None
            if live != parent:
                os.remove(mpath)
                raise CommitConflict(
                    f"_CURRENT moved from {parent!r} to {live!r} during commit"
                )
            tmp = self._pointer() + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                f.write(mid)
            os.replace(tmp, self._pointer())
        finally:
            os.close(fd)  # releases the flock; the lock file persists

    def _write_files(self, df: DataFrame) -> list[dict]:
        """Write df as data files and return manifest entries with stats.

        Stats come from ONE Spark job over the whole batch directory grouped
        by ``_metadata.file_path`` — not a per-file read/agg/collect loop,
        which at scale (thousands of files per commit) is a driver-side
        bottleneck of N sequential jobs."""
        batch = f"b-{uuid.uuid4().hex}"
        out = os.path.join(self.data_dir, batch)
        df.write.mode("errorifexists").parquet(out)
        aggs = [F.count(F.lit(1)).alias("__n")]
        for c in self.stats_cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        if self.bloom_col:
            # bloom positions ride the SAME stats job: md5-derived (so the
            # probe side can recompute them in pure Python — no Spark round
            # trip per lookup), one collect_set per probe index, each
            # bounded by min(rows, BLOOM_BITS) ints per file
            for i in range(self.BLOOM_K):
                aggs.append(
                    F.collect_set(
                        _bloom_pos(self.bloom_col, i, self.BLOOM_BITS)
                    ).alias(f"__bloom_{i}")
                )
        rows = (
            # explicit schema: an EMPTY df writes a directory with no part
            # files, where schema inference (plain read.parquet) would fail
            self.spark.read.schema(df.schema).parquet(out)
            .groupBy(F.col("_metadata.file_path").alias("__path"))
            .agg(*aggs)
            .collect()
        )
        entries = []
        for row in rows:
            r = row.asDict()
            entries.append({
                # unquote: _metadata.file_path is a URI, so spaces/% in the
                # table root arrive percent-encoded
                "path": unquote(urlparse(r["__path"]).path),
                "rows": r["__n"],
                "stats": {
                    c: [r[f"min_{c}"], r[f"max_{c}"]] for c in self.stats_cols
                },
            })
            if self.bloom_col:
                bits = bytearray(self.BLOOM_BITS // 8)
                for i in range(self.BLOOM_K):
                    for pos in r[f"__bloom_{i}"]:
                        bits[pos // 8] |= 1 << (pos % 8)
                entries[-1]["bloom"] = {
                    "col": self.bloom_col,
                    # k is recorded per entry so a reader probes with the
                    # geometry the file was WRITTEN with (m is recovered
                    # from the bit-array length); a handle opened with
                    # different BLOOM_BITS/BLOOM_K must not change how
                    # existing entries are probed — a mod-wrong-m miss
                    # would silently prune files that DO contain the value
                    "k": self.BLOOM_K,
                    "bits": base64.b64encode(bytes(bits)).decode(),
                }
        return sorted(entries, key=lambda e: e["path"])

    def _discard_batches(self, entries: list[dict]) -> None:
        """Remove the batch directories behind freshly-written entries whose
        commit lost the CAS — without this every CommitConflict retry leaks
        a full batch of parquet into data_dir (recurring under the
        stream_into_manifest retry loop) until a vacuum runs."""
        import shutil

        for d in {os.path.dirname(e["path"]) for e in entries}:
            # only ever a b-<uuid> dir this writer just created
            shutil.rmtree(d, ignore_errors=True)

    def _commit_or_discard(self, entries: list[dict], new: list[dict],
                           parent: str | None, txn: str | None = None,
                           schema_json: str | None = None,
                           dvs=_INHERIT_DVS) -> None:
        """_commit, deleting this writer's just-written data files if the
        CAS loses (the retry will rewrite them from the caller's df)."""
        try:
            self._commit(entries, parent=parent, txn=txn,
                         schema_json=schema_json, dvs=dvs)
        except CommitConflict:
            self._discard_batches(new)
            raise

    # ------------------------------------------------------------- surface

    def create(self, df: DataFrame) -> None:
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)
        # persist the schema so an all-files-deleted table stays readable
        # (an empty file list gives parquet nothing to infer from)
        with open(os.path.join(self.dir, "_SCHEMA"), "w") as f:
            f.write(df.schema.json())
        self._commit(self._write_files(df), parent=None,
                     schema_json=df.schema.json())

    def _schema_of(self, manifest: dict):
        """Declared schema AS OF a manifest: the per-commit record (schema
        evolution), else the table-creation _SCHEMA sidecar (pre-evolution
        tables), else None (infer)."""
        from pyspark.sql.types import StructType

        sj = manifest.get("schema")
        if sj is None:
            try:
                with open(os.path.join(self.dir, "_SCHEMA")) as f:
                    sj = f.read()
            except OSError:
                return None
        return StructType.fromJson(json.loads(sj))

    def _empty_df(self) -> DataFrame:
        return self.spark.createDataFrame([], self._schema_of({}))

    def _read_entries(self, entries: list[dict], schema=None) -> DataFrame:
        if not entries:
            return self._empty_df()
        reader = self.spark.read
        if schema is not None:
            # declared superset schema: files written before an ADD COLUMN
            # lack the new columns; parquet fills them with null. This is
            # the read half of additive schema evolution.
            reader = reader.schema(schema)
        return reader.parquet(*[e["path"] for e in entries])

    # Lossless numeric widenings accepted from a batch column INTO the live
    # type (batch simpleString -> allowed live simpleStrings). Anything not
    # here — narrowing, float->int, string<->numeric, nested drift — is a
    # type CHANGE and is rejected at append time. int->float and
    # bigint->double are deliberately absent (lossy above 2^24 / 2^53).
    _WIDENS = {
        "tinyint": {"smallint", "int", "bigint", "float", "double"},
        "smallint": {"int", "bigint", "float", "double"},
        "int": {"bigint", "double"},
        "float": {"double"},
        "void": None,  # all-NULL literal column: castable to any live type
    }

    def _align_to_live(self, df: DataFrame, manifest: dict,
                       evolve: bool) -> tuple[DataFrame, str | None]:
        """Delta-style schema handling shared by every write path (append,
        append_once, upsert): a batch MISSING live columns is always
        accepted (null-filled — a pre-evolution producer keeps working
        after someone else ran ADD COLUMN); a batch with EXTRA columns
        needs ``evolve=True``, which appends them to the live schema and
        returns the widened schema json so it rides the SAME commit.
        Without evolve, extra columns are rejected loudly — silent column
        drift is how data lakes rot. A batch column sharing a live name
        with a DIFFERENT type is cast up when losslessly widenable
        (``_WIDENS``) and rejected loudly otherwise — the mismatch must
        fail at write time, not as a parquet conversion error (or silent
        miscast) on some later read with the declared live schema."""
        live = self._schema_of(manifest)
        if live is None:
            return df, None
        live_names = {f.name for f in live.fields}
        batch_fields = {f.name: f for f in df.schema.fields}
        extra = [f for f in df.schema.fields if f.name not in live_names]
        if extra and not evolve:
            raise ValueError(
                f"append schema mismatch: batch has extra columns "
                f"{sorted(f.name for f in extra)}; pass evolve=True "
                "for additive ADD COLUMN evolution"
            )
        drift = []
        for f in live.fields:
            b = batch_fields.get(f.name)
            if b is None or b.dataType == f.dataType:
                continue
            bt = b.dataType.simpleString()
            widens = self._WIDENS.get(bt)
            if bt == "void" or (widens and f.dataType.simpleString() in widens):
                continue  # lossless upcast handled in the projection below
            drift.append(f"{f.name}: batch {bt} vs live "
                         f"{f.dataType.simpleString()}")
        if drift:
            raise ValueError(
                "append type mismatch (type evolution is never merged): "
                + "; ".join(drift)
            )
        target = type(live)(list(live.fields) + extra)
        needs_cast = any(
            f.name in batch_fields
            and batch_fields[f.name].dataType != f.dataType
            for f in target.fields
        )
        if {f.name for f in df.schema.fields} != {
            f.name for f in target.fields
        } or extra or needs_cast:
            df = df.select(*[
                (
                    F.col(f.name).cast(f.dataType).alias(f.name)
                    if f.name in batch_fields
                    else F.lit(None).cast(f.dataType).alias(f.name)
                )
                for f in target.fields
            ])
        return df, (target.json() if extra else None)

    def check_batch(self, df: DataFrame) -> None:
        """Delta-style table CONSTRAINTS enforced at write time: run the
        table's declared checks (``table_checks``) against the batch in
        ONE aggregation pass and raise with per-rule counts on any
        violation — bad data must fail the COMMIT, not surface as a
        quarantine report three jobs later. Checks:
          ("not_null", [cols...])   ("enum", col, [allowed...])
          ("unique", [cols...])     — uniqueness WITHIN the batch (the
        per-key cross-batch form is upsert's job; a global uniqueness
        scan per append is O(history) and exactly what a 100 TB writer
        must not do)."""
        from . import constraints as C

        named = []
        for chk in self.table_checks:
            if chk[0] == "not_null":
                for c in chk[1]:
                    named.append((f"not_null({c})",
                                  df.filter(F.col(c).isNull())))
            elif chk[0] == "enum":
                named.append((f"enum({chk[1]})",
                              C.enum_violations(df, chk[1], chk[2])))
            elif chk[0] == "unique":
                named.append((f"unique({','.join(chk[1])})",
                              C.unique_violations(df, chk[1])))
            else:
                raise ValueError(f"unknown table check {chk[0]!r}")
        if not named:
            return
        bad = {
            r.rule: r.n_violations
            for r in C.summarize(named).collect()
            if r.n_violations > 0
        }
        if bad:
            raise ValueError(
                f"append violates table constraints: {bad} — reject the "
                "batch or route violations to a quarantine sink first"
            )

    def _violation_pred(self, df: DataFrame):
        """One Column that is true iff a row violates ANY declared check
        (unique rules excluded — uniqueness is a batch property, not a
        row property; check_batch still enforces it)."""
        pred = F.lit(False)
        for chk in self.table_checks:
            if chk[0] == "not_null":
                for c in chk[1]:
                    pred = pred | F.col(c).isNull()
            elif chk[0] == "enum":
                pred = pred | (
                    F.col(chk[1]).isNotNull()
                    & ~F.col(chk[1]).isin(*chk[2])
                )
        return pred

    def append_with_quarantine(self, df: DataFrame,
                               quarantine: "ManifestTable",
                               evolve: bool = False,
                               txn: str | None = None) -> dict:
        """The production alternative to check_batch's hard reject: rows
        violating any row-level check land in the ``quarantine`` table
        (same commit protocol, auditable, replayable after a fix) and
        only clean rows enter this table. Returns {'appended': n,
        'quarantined': m}. Batch-level rules (unique) still hard-fail via
        ``check_batch`` on the CLEAN slice — a duplicate key is not a row
        you can route, it is an upstream bug.

        Ordering and determinism contract: the input is materialized ONCE
        (persisted, released in the finally), so a non-deterministic
        source cannot route rows differently between the two tables, and
        the unique rule is checked on the clean slice BEFORE either table
        commits — a batch with both row-level violations and duplicate
        keys aborts with NOTHING durably written, instead of leaving bad
        rows committed to quarantine while the main append raises.

        Scope of that atomicity claim (ADVICE r6): it covers the
        CHECK-failure path only. The quarantine append and the main
        append are two independent manifest commits, so if the main
        append loses its commit race (CommitConflict) AFTER the
        quarantine committed, a TOKENLESS caller retry re-quarantines
        the same rows — duplicate quarantine rows, never duplicate or
        lost CLEAN rows.

        Pass ``txn`` for exactly-once under retries (r7, closing the
        ADVICE item): both commits then route through ``append_once``
        with per-table derived tokens (``{txn}:quarantine`` /
        ``{txn}:clean``), so a retry after ANY crash/conflict point
        no-ops whichever side already committed and applies the other —
        at-most-once per table per token, matching the streaming sink's
        idempotency contract. The returned counts reflect what THIS call
        durably applied (a fully-replayed batch returns zeros)."""
        df = df.persist()
        try:
            bad_pred = self._violation_pred(df)
            good = df.filter(~bad_pred)
            bad = df.filter(bad_pred)
            n_bad = bad.count()  # materializes the persisted split once
            n_good = good.count()
            checks = self.table_checks
            self.table_checks = [c for c in checks if c[0] == "unique"]
            q_applied = bool(n_bad)
            try:
                self.check_batch(good)  # hard-fail BEFORE any commit
                if n_bad:
                    if txn is not None:
                        q_applied = quarantine.append_once(
                            bad, txn=f"{txn}:quarantine")
                    else:
                        quarantine.append(bad)
                # row checks don't apply to good by construction and
                # unique was just verified — skip the re-check in append
                self.table_checks = []
                if txn is not None:
                    applied = self.append_once(
                        good, txn=f"{txn}:clean", evolve=evolve)
                else:
                    self.append(good, evolve=evolve)
                    applied = True
            finally:
                self.table_checks = checks
            return {"appended": n_good if applied else 0,
                    "quarantined": n_bad if q_applied else 0}
        finally:
            df.unpersist()

    def append(self, df: DataFrame, evolve: bool = False) -> None:
        """Append a batch with Delta-style schema handling (see
        ``_align_to_live``) and table-constraint enforcement
        (``check_batch``); past snapshots keep their own column set
        (read_at reads with the schema recorded in THAT manifest)."""
        parent, manifest = self._snapshot()
        df, schema_json = self._align_to_live(df, manifest, evolve)
        self.check_batch(df)
        new = self._write_files(df)
        self._commit_or_discard(
            manifest["entries"] + new, new, parent=parent,
            schema_json=schema_json,
        )

    def append_once(self, df: DataFrame, txn: str,
                    evolve: bool = False) -> bool:
        """Transactionally-idempotent append (the Delta txn-id pattern):
        the commit records `txn`, and a replay with a token already present
        in the snapshot's ancestor set is an exact no-op BEFORE any files
        are written — unlike marker-file schemes the dedup record and the
        data commit are the same atomic pointer swap, so there is no crash
        window between them. The membership check, entry list, and CAS
        parent all come from ONE snapshot: if another commit (including a
        concurrent replica of this very txn) lands after the snapshot, the
        CAS raises CommitConflict and the caller re-checks on retry.
        Returns True iff the batch was applied. The natural sink for
        streaming foreachBatch (see chat_pipeline.stream_into_manifest)."""
        parent, manifest = self._snapshot()
        if txn in manifest.get("txns", {}):
            return False  # replayed batch — already committed
        # same alignment AND constraint contract as append (a streaming
        # producer that missed an ADD COLUMN keeps working; drift and
        # declared-check violations still rejected before any file lands)
        df, schema_json = self._align_to_live(df, manifest, evolve=evolve)
        self.check_batch(df)
        new = self._write_files(df)
        self._commit_or_discard(
            manifest["entries"] + new, new, parent=parent, txn=txn,
            schema_json=schema_json,
        )
        return True

    def files(self) -> list[dict]:
        return self._live_manifest()["entries"]

    def read(self) -> DataFrame:
        manifest = self._live_manifest()
        return self._apply_dvs(
            self._read_entries(
                manifest["entries"], schema=self._schema_of(manifest)
            ),
            manifest,
        )

    # ------------------------------------------------- deletion vectors

    def _apply_dvs(self, df: DataFrame, manifest: dict) -> DataFrame:
        """Merge-on-read: anti-join out the (file, row_index) positions
        recorded by ``delete_dv`` commits. The DV table is tiny relative
        to the data (it lists deleted POSITIONS, not rows), so the
        anti-join broadcasts; with no DVs the plan is untouched."""
        dvs = manifest.get("dvs") or []
        if not dvs:
            return df
        dv = self.spark.read.parquet(*dvs)
        keyed = df.withColumn(
            "__dv_path", F.col("_metadata.file_path")
        ).withColumn("__dv_row", F.col("_metadata.row_index"))
        return keyed.join(
            F.broadcast(dv),
            (keyed["__dv_path"] == dv["path"])
            & (keyed["__dv_row"] == dv["row_index"]),
            "left_anti",
        ).drop("__dv_path", "__dv_row")

    def _require_no_dvs(self, op: str, manifest: dict) -> None:
        if manifest.get("dvs"):
            raise ValueError(
                f"{op} on a table with live deletion vectors would "
                "rewrite files the DVs reference by ROW INDEX, silently "
                "resurrecting or double-deleting rows — run compact_dv() "
                "first to fold the DVs into the data"
            )

    def delete_dv(self, where: Column) -> dict:
        """Merge-on-read DELETE (Delta/Iceberg deletion-vector pattern):
        instead of rewriting every touched file (copy-on-write ``delete``),
        record the matching rows' (file, row_index) positions in a sidecar
        parquet and commit only the manifest pointer. Cost is one scan +
        one tiny write regardless of how many multi-GB files contain a
        matching row — at 100 TB this is the difference between a
        GDPR-delete rewriting 30 TB and writing 3 MB. Readers apply the
        DVs as a broadcast anti-join on (_metadata.file_path,
        _metadata.row_index); ``compact_dv`` folds them back into data
        files. SQL DELETE semantics: NULL predicates retain the row."""
        parent, manifest = self._snapshot()
        live = self._schema_of(manifest)
        df = self._read_entries(manifest["entries"], schema=live)
        marked = (
            df.filter(F.coalesce(where, F.lit(False)))
            .select(
                F.col("_metadata.file_path").alias("path"),
                F.col("_metadata.row_index").alias("row_index"),
            )
        )
        dv_dir = os.path.join(self.dir, "dv", f"dv-{uuid.uuid4().hex}")
        marked.write.mode("errorifexists").parquet(dv_dir)
        n = int(self.spark.read.parquet(dv_dir).count())
        if n == 0:
            import shutil

            shutil.rmtree(dv_dir, ignore_errors=True)
            return {"marked": 0}
        self._commit(
            manifest["entries"], parent=parent,
            dvs=(manifest.get("dvs") or []) + [dv_dir],
        )
        return {"marked": n}

    def compact_dv(self) -> dict:
        """Fold live deletion vectors into the data (merge-on-read ->
        copy-on-write): rewrite ONLY the files a DV references, carry
        every other entry with zero I/O, clear the DV list. The sidecar
        dirs are left for time travel; vacuum reclaims them."""
        parent, manifest = self._snapshot()
        dvs = manifest.get("dvs") or []
        if not dvs:
            return {"rewritten": 0, "carried": len(manifest["entries"])}
        dv = self.spark.read.parquet(*dvs)
        # file_path is a URI; entries store plain paths
        touched_paths = {
            unquote(urlparse(r.path).path)
            for r in dv.select("path").distinct().collect()
        }
        touched = [e for e in manifest["entries"] if e["path"] in touched_paths]
        carried = [e for e in manifest["entries"] if e["path"] not in touched_paths]
        live = self._schema_of(manifest)
        remaining = self._apply_dvs(
            self._read_entries(touched, schema=live), manifest
        )
        new = self._write_files(remaining)
        self._commit_or_discard(
            carried + new, new, parent=parent, dvs=[],
        )
        return {"rewritten": len(touched), "carried": len(carried)}

    def read_pruned(self, col: str, lo=None, hi=None) -> tuple[DataFrame, int]:
        """Manifest-stats pruning: load only files whose [min,max] for `col`
        intersects [lo, hi]. Returns (df, n_files_skipped). The residual
        filter still applies Spark-side; the win is files never opened."""
        keep, skipped = [], 0
        for e in self.files():
            mn, mx = e["stats"][col]
            if (lo is not None and mx is not None and mx < lo) or (
                hi is not None and mn is not None and mn > hi
            ):
                skipped += 1
                continue
            keep.append(e["path"])
        if not keep:
            return self._empty_df(), skipped
        manifest = self._live_manifest()
        live = self._schema_of(manifest)
        reader = self.spark.read if live is None else self.spark.read.schema(live)
        return self._apply_dvs(reader.parquet(*keep), manifest), skipped

    def read_pruned_bloom(self, value) -> tuple[DataFrame, int]:
        """Point-lookup file skipping by the per-file BLOOM, the prune that
        still works when the table is UNSORTED on the key and every file's
        [min, max] interval spans the whole domain (where zone maps skip
        nothing). A bloom miss is definitive — the value is NOT in the
        file; a hit is probabilistic, and the residual filter remains
        Spark-side. Probe positions are md5-derived in pure Python,
        bit-identical to the write side's Spark expressions.

        Probe geometry comes from EACH ENTRY, not from this handle: m is
        the stored bit-array's length and k the recorded probe count, so a
        reader opened with different ``bloom_bits`` than the writer (the
        8192 default vs a scaled table) still probes the geometry the file
        was written with. Legacy entries without a recorded k fall back to
        the class default (the only k any previous writer used)."""
        pos_by_geom: dict[tuple[int, int], list[int]] = {}
        keep, skipped = [], 0
        for e in self.files():
            b = e.get("bloom")
            if b is None:
                keep.append(e["path"])
                continue
            bits = base64.b64decode(b["bits"])
            geom = (b.get("k", ManifestTable.BLOOM_K), len(bits) * 8)
            positions = pos_by_geom.get(geom)
            if positions is None:
                positions = pos_by_geom[geom] = bloom_positions(value, *geom)
            if all(bits[p // 8] & (1 << (p % 8)) for p in positions):
                keep.append(e["path"])
            else:
                skipped += 1
        if not keep:
            return self._empty_df(), skipped
        manifest = self._live_manifest()
        live = self._schema_of(manifest)
        reader = self.spark.read if live is None else self.spark.read.schema(live)
        return self._apply_dvs(reader.parquet(*keep), manifest), skipped

    def delete(self, where: Column, col: str, lo=None, hi=None) -> dict:
        """File-granular delete: rewrite only files whose stats interval for
        `col` can contain matching rows; every other manifest entry carries
        over with zero I/O. Returns {'rewritten': n, 'carried': m}."""
        parent, manifest = self._snapshot()
        self._require_no_dvs("delete", manifest)
        touched, carried = [], []
        for e in manifest["entries"]:
            mn, mx = e["stats"][col]
            disjoint = (lo is not None and mx is not None and mx < lo) or (
                hi is not None and mn is not None and mn > hi
            )
            (carried if disjoint else touched).append(e)
        new_entries, new = list(carried), []
        if touched:
            # one rewrite job over all touched files, not one per file;
            # SQL DELETE semantics — NULL-predicate rows are retained.
            # The live schema is DECLARED on the read: post-evolution a
            # touched set can mix pre/post-ADD-COLUMN files, and an
            # inferred schema (taken from one file) would silently drop
            # the new column from every rewritten row.
            remaining = self._read_entries(
                touched, schema=self._schema_of(manifest)
            ).filter(~F.coalesce(where, F.lit(False)))
            new = self._write_files(remaining)
            new_entries += new
        self._commit_or_discard(new_entries, new, parent=parent)
        return {"rewritten": len(touched), "carried": len(carried)}

    def upsert(self, incoming: DataFrame, key: str) -> dict:
        """File-granular MERGE: rows in ``incoming`` replace same-key rows;
        new keys append. Only files whose [min,max] stats interval for
        ``key`` intersects incoming's key range are rewritten (matched rows
        removed via a broadcast-able anti-join in ONE job); every other
        entry carries over with zero I/O, and incoming lands as new files.
        ``key`` must be one of the table's stats columns.

        ``incoming`` must be unique on ``key`` — duplicate source keys have
        no defined MERGE semantics (Delta raises too), and silently landing
        both copies would corrupt the table's key uniqueness. Checked in
        the same job as the key-range scan; raises ValueError.

        Incoming rides the same ``_align_to_live`` contract as append:
        extra columns are rejected loudly (no silent drift invisible on
        declared-schema reads), missing columns null-fill, and type drift
        raises at write time."""
        parent, manifest = self._snapshot()
        self._require_no_dvs("upsert", manifest)
        incoming, _ = self._align_to_live(incoming, manifest, evolve=False)
        lo, hi, n, n_keys = incoming.agg(
            F.min(key), F.max(key), F.count(F.lit(1)), F.count_distinct(key)
        ).collect()[0]
        if n != n_keys:
            # count_distinct ignores NULLs, so this also rejects NULL keys —
            # a NULL merge key matches nothing and has no UPSERT meaning
            raise ValueError(
                f"upsert incoming has duplicate or NULL '{key}' rows "
                f"({n} rows, {n_keys} distinct non-null keys); MERGE "
                "requires a unique non-null source key — dedup incoming first"
            )
        touched, carried = [], []
        for e in manifest["entries"]:
            mn, mx = e["stats"][key]
            disjoint = (
                lo is None
                or (mx is not None and mx < lo)
                or (mn is not None and mn > hi)
            )
            (carried if disjoint else touched).append(e)
        new_entries, new = list(carried), []
        if touched:
            # declared live schema: see delete() — mixed-schema touched
            # sets must not infer from one file
            remaining = self._read_entries(
                touched, schema=self._schema_of(manifest)
            ).join(incoming.select(key), on=key, how="left_anti")
            new = self._write_files(remaining)
            new_entries += new
        incoming_files = self._write_files(incoming)
        new += incoming_files
        new_entries += incoming_files
        self._commit_or_discard(new_entries, new, parent=parent)
        return {"rewritten": len(touched), "carried": len(carried)}

    # ---------------------------------------------------------- time travel

    def history(self) -> list[str]:
        """Manifest ids from live back to the table's creation (parent
        chain) — newest first."""
        out = []
        mid: str | None = self._live_id()
        while mid is not None:
            out.append(mid)
            with open(os.path.join(self.manifest_dir, mid)) as f:
                mid = json.load(f).get("parent")
        return out

    def restore(self, manifest_id: str) -> str:
        """Delta RESTORE analog: make a PAST snapshot live again by
        committing a NEW manifest that references the old snapshot's
        files and schema — history moves forward (the bad commits stay
        inspectable in the parent chain; nothing is rewritten or
        deleted), only the pointer's view changes. Zero data I/O: the
        restore commit carries file references. Raises if the target
        snapshot's files were already vacuumed away."""
        try:
            with open(os.path.join(self.manifest_dir, manifest_id)) as f:
                target = json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"cannot restore {manifest_id}: the manifest itself was "
                "vacuumed — only snapshots still in the manifest dir are "
                "restorable"
            ) from None
        missing = [e["path"] for e in target["entries"]
                   if not os.path.exists(e["path"])]
        if missing:
            raise ValueError(
                f"cannot restore {manifest_id}: {len(missing)} data files "
                f"were vacuumed (first: {missing[0]})"
            )
        # deletion vectors are part of the snapshot's VIEW: the restore
        # commit must carry the TARGET's dv list, not inherit the current
        # live one — inheriting would apply post-snapshot deletes to the
        # restored entries (silently wrong rows) or resurrect rows the
        # target had deleted. A target dv dir lost to vacuum blocks the
        # restore the same way a lost data file does.
        target_dvs = target.get("dvs") or []
        lost = [d for d in target_dvs if not os.path.isdir(d)]
        if lost:
            raise ValueError(
                f"cannot restore {manifest_id}: {len(lost)} deletion-vector "
                f"sidecars were vacuumed (first: {lost[0]})"
            )
        parent, _ = self._snapshot()
        self._commit_or_discard(
            target["entries"], [], parent=parent,
            schema_json=target.get("schema"), dvs=target_dvs,
        )
        return self._live_id()

    def read_at(self, manifest_id: str) -> DataFrame:
        """Read the table as of a past commit (files from that manifest —
        valid until ``vacuum`` reclaims non-live data). Reads with the
        schema recorded in THAT manifest: columns added later do not
        appear in an older snapshot."""
        with open(os.path.join(self.manifest_dir, manifest_id)) as f:
            manifest = json.load(f)
        return self._apply_dvs(
            self._read_entries(
                manifest["entries"], schema=self._schema_of(manifest)
            ),
            manifest,
        )

    def compact(self, target_rows: int = 100_000) -> dict:
        """Small-file compaction: greedily bin files below target into
        groups totalling ~target_rows, rewrite each group as one file; large
        files carry over untouched. The 100 TB hygiene job that keeps scan
        task counts sane after many streaming appends."""
        parent, manifest = self._snapshot()
        self._require_no_dvs("compact", manifest)
        entries = manifest["entries"]
        small = [e for e in entries if e["rows"] < target_rows]
        large = [e for e in entries if e["rows"] >= target_rows]
        bins: list[list[dict]] = []
        cur, cur_rows = [], 0
        for e in sorted(small, key=lambda e: e["rows"]):
            if cur_rows + e["rows"] > target_rows and cur:
                bins.append(cur)
                cur, cur_rows = [], 0
            cur.append(e)
            cur_rows += e["rows"]
        if cur:
            bins.append(cur)
        new_entries, new = list(large), []
        live_schema = self._schema_of(manifest)
        for group in bins:
            merged = self._read_entries(group, schema=live_schema).coalesce(1)
            batch = self._write_files(merged)
            new += batch
            new_entries += batch
        self._commit_or_discard(new_entries, new, parent=parent)
        return {"compacted_files": len(small), "bins": len(bins)}


def vacuum(table: ManifestTable) -> dict:
    """Remove data files referenced by NO manifest reachable from the live
    pointer (i.e., files orphaned by delete/compact commits) and all
    non-live manifests. Time travel ends; space is reclaimed."""
    import shutil

    live_paths = {e["path"] for e in table.files()}
    removed_files = 0
    for batch in os.listdir(table.data_dir):
        bdir = os.path.join(table.data_dir, batch)
        files = [os.path.join(bdir, f) for f in os.listdir(bdir)
                 if f.endswith(".parquet")]
        if files and not any(f in live_paths for f in files):
            shutil.rmtree(bdir)
            removed_files += len(files)
        else:
            for f in files:
                if f not in live_paths:
                    os.remove(f)
                    removed_files += 1
    # deletion-vector sidecars: keep only the dirs the LIVE manifest still
    # references (compact_dv leaves folded DVs behind for time travel;
    # vacuum is where that history ends, same as for data files)
    live_dvs = set(table._live_manifest().get("dvs") or [])
    removed_dvs = 0
    dv_root = os.path.join(table.dir, "dv")
    if os.path.isdir(dv_root):
        for d in os.listdir(dv_root):
            p = os.path.join(dv_root, d)
            if p not in live_dvs:
                shutil.rmtree(p, ignore_errors=True)
                removed_dvs += 1
    with open(table._pointer()) as f:
        live_manifest = f.read().strip()
    removed_manifests = 0
    for m in os.listdir(table.manifest_dir):
        if m != live_manifest:
            os.remove(os.path.join(table.manifest_dir, m))
            removed_manifests += 1
    return {"data_files": removed_files, "manifests": removed_manifests,
            "dv_dirs": removed_dvs}


def clone_shallow(src: ManifestTable, root: str, name: str) -> ManifestTable:
    """Zero-copy table clone (Delta ``SHALLOW CLONE``): the clone gets its
    OWN pointer/manifest lineage whose initial commit references the
    source's live data files — and live deletion vectors — by absolute
    path. No data is read or copied, so cloning a 100 TB table is an
    O(metadata) driver operation: one snapshot read, one manifest write.

    Divergence is free by construction: every write path lands files under
    the writing table's own ``data_dir`` (``_write_files``) and DV sidecars
    under its own ``dv/``, so clone mutations never touch source storage
    and vice versa; ``vacuum`` walks only its table's ``data_dir`` and can
    never reclaim the other side's files. ``txn`` idempotence tokens are
    deliberately NOT inherited (parent=None ⇒ fresh namespace): a batch
    replayed against the clone is a new write against a new table.

    Caveat, same as Delta's documented one: ``vacuum`` on the SOURCE
    consults only the source's reachable manifests, so it can reclaim
    files a clone still references. Vacuuming a cloned-from table is a
    catalog-level coordination concern, stated here rather than hidden."""
    import shutil

    dst = ManifestTable(src.spark, root, name, src.stats_cols,
                        bloom_col=src.bloom_col)
    os.makedirs(dst.data_dir, exist_ok=True)
    os.makedirs(dst.manifest_dir, exist_ok=True)
    schema_sidecar = os.path.join(src.dir, "_SCHEMA")
    if os.path.exists(schema_sidecar):
        shutil.copyfile(schema_sidecar, os.path.join(dst.dir, "_SCHEMA"))
    _, manifest = src._snapshot()
    dst._commit(manifest["entries"], parent=None,
                schema_json=manifest.get("schema"),
                dvs=manifest.get("dvs", []))
    return dst

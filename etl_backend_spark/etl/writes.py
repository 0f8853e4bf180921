"""Mutations as deterministic parquet rewrite-and-swap (SURVEY.md §2.8).

The reference's writes are Prisma row mutations (`create`/`update`/`delete`/
`upsert`, e.g. reference src/routes/ads.ts:53-74, 259-262;
src/routes/favorites.ts:36-62; prisma/seed.ts:11-21). Over immutable parquet
(no transactional table format dependency) each becomes:

    read current state → pure DataFrame transform → write to a versioned
    directory → atomically repoint a `_CURRENT` pointer file.

- **Append** avoids the rewrite entirely: new row-files land beside existing
  ones in the same version directory (cheap at any scale).
- **Update/delete/upsert** rewrite the base store; ``PartitionedTableStore``
  narrows that to the affected partition directories and carries every other
  partition into the new version via hard links (O(files) metadata, no data
  movement) — the step before adopting a manifest format (Delta/Iceberg),
  which would make the carry-forward a manifest entry instead of a link.
- **Pointer swap** (`_CURRENT` containing the live version name, written via
  temp-file + `os.replace`) gives readers an atomic cutover and natural
  time-travel (old versions remain until vacuumed).

Idempotence: `upsert` (insert-if-absent, matching the reference's empty
`update:{}` upserts) run twice ≡ run once — pytest-enforced.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class ParquetTableStore:
    """A directory of versioned parquet tables with atomic pointer swap.

    Layout:  root/<table>/_CURRENT           → text file: live version id
             root/<table>/v-<uuid>/*.parquet → immutable version directories
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    # ------------------------------------------------------------ plumbing

    def _tdir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _current_file(self, name: str) -> str:
        return os.path.join(self._tdir(name), "_CURRENT")

    def _current_version(self, name: str) -> str:
        with open(self._current_file(name)) as f:
            return f.read().strip()

    def _version_dir(self, name: str, version: str) -> str:
        return os.path.join(self._tdir(name), version)

    def _write_version(self, name: str, df: DataFrame) -> str:
        version = f"v-{uuid.uuid4().hex}"
        df.write.mode("errorifexists").parquet(self._version_dir(name, version))
        return version

    def _swap(self, name: str, version: str) -> None:
        """Atomic pointer cutover: temp file + rename (POSIX atomic)."""
        cur = self._current_file(name)
        tmp = cur + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, cur)

    # ------------------------------------------------------------- surface

    def create(self, name: str, df: DataFrame) -> None:
        os.makedirs(self._tdir(name), exist_ok=True)
        self._swap(name, self._write_version(name, df))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(
            self._version_dir(name, self._current_version(name))
        )

    def append(self, name: str, rows: DataFrame) -> None:
        """`create` — reference src/routes/ads.ts:53-74. New files land in
        the live version directory; no rewrite of existing data."""
        rows.write.mode("append").parquet(
            self._version_dir(name, self._current_version(name))
        )

    def update(self, name: str, assignments: dict[str, Column],
               where: Column) -> None:
        """Predicate-targeted column update — soft delete
        `update({where, data:{status:'deleted'}})` (reference
        src/routes/ads.ts:259-262). Unmatched rows pass through unchanged."""
        df = self.read(name)
        for col, value in assignments.items():
            df = df.withColumn(col, F.when(where, value).otherwise(F.col(col)))
        self._swap(name, self._write_version(name, df))

    def delete(self, name: str, where: Column) -> None:
        """Hard delete (reference src/routes/admin.ts:113-116). SQL DELETE
        semantics: only rows where the predicate is definitely TRUE are
        removed — NULL-predicate rows are retained (hence the coalesce)."""
        df = self.read(name).filter(~F.coalesce(where, F.lit(False)))
        self._swap(name, self._write_version(name, df))

    def delete_by_keys(self, name: str, keys: DataFrame, on: list[str]) -> None:
        """Multi-key delete via anti-join (cascade building block,
        reference migration.sql:115-139)."""
        df = self.read(name).join(keys, on=on, how="left_anti")
        self._swap(name, self._write_version(name, df))

    def upsert(self, name: str, incoming: DataFrame, keys: list[str]) -> None:
        """Insert-if-absent — `upsert({update:{}, create:{...}})` semantics
        (reference prisma/seed.ts:11-21): anti-join incoming against existing
        keys, append only the fresh rows. Running twice is a no-op."""
        existing = self.read(name)
        fresh = incoming.join(existing.select(*keys), on=keys, how="left_anti")
        merged = existing.unionByName(fresh)
        self._swap(name, self._write_version(name, merged))

    def append_idempotent(self, name: str, rows: DataFrame, token: str) -> None:
        """Replay-safe append for at-least-once producers (streaming
        foreachBatch): stage the batch to a side directory, then move its
        files into the live version dir under token-derived DETERMINISTIC
        names. Re-running with the same token re-stages (overwrite) and
        re-replaces the same destination files — a crash anywhere between
        staging and the last rename leaves a state that replay repairs
        instead of duplicating (plain ``append`` would re-add the batch)."""
        vdir = self._version_dir(name, self._current_version(name))
        staged = os.path.join(self._tdir(name), f"_stage-{token}")
        rows.write.mode("overwrite").parquet(staged)
        parts = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
        # clear any leftovers of a crashed attempt FIRST: if that attempt
        # produced more files than this one (upstream partitioning changed
        # between runs), renaming alone would leave stale extras behind
        for fname in os.listdir(vdir):
            if fname.startswith(f"b-{token}-"):
                os.remove(os.path.join(vdir, fname))
        for i, fname in enumerate(parts):
            os.replace(
                os.path.join(staged, fname),
                os.path.join(vdir, f"b-{token}-{i:05d}.parquet"),
            )
        shutil.rmtree(staged)

    def vacuum(self, name: str) -> int:
        """Drop all non-live version directories; returns count removed."""
        live = self._current_version(name)
        removed = 0
        for entry in os.listdir(self._tdir(name)):
            if entry.startswith("v-") and entry != live:
                shutil.rmtree(self._version_dir(name, entry))
                removed += 1
        return removed


def cascade_delete_user(store: ParquetTableStore, customer_keys: DataFrame) -> None:
    """FK cascade — deleting users removes their orders and those orders'
    lineitems (reference prisma/schema.prisma:49,65-66 `onDelete: Cascade`,
    played out over the testdata FK tree customer→orders→lineitem)."""
    orders = store.read("orders")
    doomed_orders = orders.join(
        customer_keys,
        orders["o_custkey"] == customer_keys["c_custkey"],
        "left_semi",
    ).select("o_orderkey")
    store.delete_by_keys("lineitem", doomed_orders.withColumnRenamed(
        "o_orderkey", "l_orderkey"), ["l_orderkey"])
    store.delete_by_keys("orders", customer_keys.withColumnRenamed(
        "c_custkey", "o_custkey"), ["o_custkey"])
    store.delete_by_keys("customer", customer_keys, ["c_custkey"])


def touch_parent(store: ParquetTableStore, parent: str, child: str,
                 parent_key: str, child_key: str, ts_col: str,
                 updated_col: str = "updated_at") -> None:
    """Dependent parent-timestamp refresh — `conversation.updatedAt =
    max(message.createdAt)` (reference src/routes/chat.ts:205-208) done as
    one batch job instead of the reference's two untransacted writes."""
    children = store.read(child)
    maxes = children.groupBy(F.col(child_key).alias("__k")).agg(
        F.max(ts_col).alias("__ts")
    )
    parent_df = store.read(parent)
    joined = parent_df.join(
        maxes, parent_df[parent_key] == maxes["__k"], "left"
    ).withColumn(
        updated_col,
        F.coalesce(F.col("__ts"), F.col(updated_col) if updated_col in parent_df.columns else F.lit(None).cast("timestamp")),
    ).drop("__k", "__ts")
    store._swap(parent, store._write_version(parent, joined))


class PartitionedTableStore(ParquetTableStore):
    """Store variant with hive-partitioned versions: mutations that carry a
    partition predicate rewrite ONLY the affected partition directories and
    hard-link nothing else — the plain store's "rewrite everything" cost
    becomes proportional to touched partitions (the step before adopting a
    manifest format like Delta/Iceberg).
    """

    def __init__(self, spark: SparkSession, root: str, partition_col: str):
        super().__init__(spark, root)
        self.partition_col = partition_col

    def create(self, name: str, df: DataFrame) -> None:
        os.makedirs(self._tdir(name), exist_ok=True)
        version = f"v-{uuid.uuid4().hex}"
        df.write.mode("errorifexists").partitionBy(self.partition_col).parquet(
            self._version_dir(name, version)
        )
        self._swap(name, version)

    def _partition_dirs(self, name: str) -> list[str]:
        vdir = self._version_dir(name, self._current_version(name))
        return [e for e in os.listdir(vdir) if e.startswith(f"{self.partition_col}=")]

    def update_partitions(self, name: str, partition_values: list,
                          assignments: dict[str, Column], where: Column) -> None:
        """Rewrite only the named partitions; every other partition directory
        is carried into the new version via filesystem hard links (O(files),
        no data movement or re-encode)."""
        cur = self._current_version(name)
        cur_dir = self._version_dir(name, cur)
        version = f"v-{uuid.uuid4().hex}"
        new_dir = self._version_dir(name, version)
        os.makedirs(new_dir)

        affected = {f"{self.partition_col}={v}" for v in partition_values}
        for entry in self._partition_dirs(name):
            if entry in affected:
                continue
            src, dst = os.path.join(cur_dir, entry), os.path.join(new_dir, entry)
            os.makedirs(dst)
            for f in os.listdir(src):
                os.link(os.path.join(src, f), os.path.join(dst, f))

        for value in partition_values:
            part_src = os.path.join(cur_dir, f"{self.partition_col}={value}")
            if not os.path.isdir(part_src):
                continue
            df = self.spark.read.parquet(part_src)
            for col, expr in assignments.items():
                df = df.withColumn(col, F.when(where, expr).otherwise(F.col(col)))
            df.write.mode("errorifexists").parquet(
                os.path.join(new_dir, f"{self.partition_col}={value}")
            )
        self._swap(name, version)

    def read(self, name: str) -> DataFrame:
        return self.spark.read.option("basePath", self._version_dir(
            name, self._current_version(name)
        )).parquet(self._version_dir(name, self._current_version(name)))

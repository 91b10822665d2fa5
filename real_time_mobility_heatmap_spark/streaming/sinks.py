"""Idempotent keyed sinks — the engine's exactly-once-at-the-sink contract.

The reference achieves effective exactly-once on at-least-once micro-batch
delivery through two sink-side invariants (SURVEY.md ST6):

  1. tiles: deterministic `_id` + full-overwrite upsert — replays rewrite
     the same value (heatmap_stream.py:173, 188);
  2. positions_latest: upsert guarded by "incoming ts strictly newer than
     stored" — replays and out-of-order batches are no-ops
     (heatmap_stream.py:219-228).

``KeyedParquetStore`` implements both invariants over a parquet snapshot so
the contract is testable without MongoDB; a production deployment swaps in
a transactional keyed store (Delta ``MERGE``, Mongo bulk upsert) behind the
same two merge modes. Unlike the reference — which funnels every row
through the driver with ``toLocalIterator`` (heatmap_stream.py:163,210),
its scalability ceiling — the merge here is a Spark plan: union + argmax
per key, computed executor-side and written in parallel.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass
class KeyedParquetStore:
    """A keyed table as an atomically-swapped parquet snapshot.

    merge semantics:
      - ``newer_col=None``  -> last-writer-wins upsert by key ($set style);
      - ``newer_col="ts"``  -> conditional upsert: incoming row replaces the
        stored one only if strictly newer (monotonic guard, S5).
    """

    path: str
    key_cols: list[str]
    newer_col: str | None = None
    _epoch_seen: set = field(default_factory=set)

    def _snapshot_dir(self) -> str:
        return os.path.join(self.path, "snapshot")

    def read(self, spark: SparkSession) -> DataFrame | None:
        snap = self._snapshot_dir()
        if not os.path.exists(snap):
            return None
        return spark.read.parquet(snap)

    def merge(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        """Idempotent keyed merge of one micro-batch.

        The tag column ranks incoming over stored for plain upsert; for the
        conditional mode, ordering by (newer_col, is_stored) keeps the
        stored row on ties — i.e. incoming wins only when strictly newer.
        """
        spark = batch_df.sparkSession
        incoming = batch_df.withColumn("__stored", F.lit(0))
        existing = self.read(spark)
        if existing is None:
            merged_src = incoming
        else:
            merged_src = existing.withColumn("__stored", F.lit(1)).unionByName(incoming)

        if self.newer_col is None:
            order = [F.asc("__stored")]  # incoming (0) outranks stored (1)
        else:
            order = [F.desc(self.newer_col), F.desc("__stored")]  # newest wins; stored wins ties

        w = Window.partitionBy(*self.key_cols).orderBy(*order)
        merged = (
            merged_src.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__stored")
        )

        tmp = os.path.join(self.path, f"tmp-{uuid.uuid4().hex}")
        merged.write.mode("overwrite").parquet(tmp)
        self._swap(tmp)

    def _swap(self, new_dir: str) -> None:
        snap = self._snapshot_dir()
        old = snap + ".old"
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(snap):
            os.rename(snap, old)
        os.rename(new_dir, snap)
        if os.path.exists(old):
            shutil.rmtree(old)


def tile_store(path: str) -> KeyedParquetStore:
    """tiles store: overwrite-upsert by deterministic tile_id (S4)."""
    return KeyedParquetStore(path, key_cols=["tile_id"], newer_col=None)


def positions_store(path: str) -> KeyedParquetStore:
    """positions_latest store: ts-monotonic conditional upsert (S5)."""
    return KeyedParquetStore(path, key_cols=["position_id"], newer_col="event_ts")

"""MongoDB adapter for the keyed-sink contract (reference S4/S5).

The reference's sinks ARE MongoDB collections: tiles via deterministic
``_id`` + ``$set`` upsert (heatmap_stream.py:159-196) and
positions_latest via a ts-monotonic ``$lt``-guarded upsert
(heatmap_stream.py:209-235). ``MongoKeyedStore`` exposes the same
``merge(batch_df, epoch_id)`` surface as ``KeyedParquetStore`` so the
streaming assembly swaps stores without touching the queries — but
writes EXECUTOR-SIDE via ``foreachPartition`` (each partition opens its
own client and bulk-writes its rows), never the reference's
driver-funnel ``toLocalIterator`` (heatmap_stream.py:163, 210).

Import-gated: ``pymongo`` is not installed in this container and no
server exists, so the adapter raises at construction unless pymongo is
importable; the contract itself is covered by the parquet store's tests
(same merge semantics by design).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

BULK_CHUNK = 1000  # ops per bulk_write, matching heatmap_stream.py:191


@dataclass
class MongoKeyedStore:
    """Keyed sink over a MongoDB collection.

    merge semantics (identical to KeyedParquetStore):
      - ``newer_col=None`` -> ``$set`` upsert by deterministic _id (S4);
      - ``newer_col="ts"`` -> upsert only when incoming is strictly newer
        (``$lt`` guard on the stored value, S5) — replays and
        out-of-order batches are no-ops.
    """

    uri: str
    database: str
    collection: str
    key_cols: list[str]
    newer_col: str | None = None

    def __post_init__(self) -> None:
        try:
            import pymongo  # noqa: F401
        except ImportError as e:  # pragma: no cover - pymongo absent here
            raise ImportError(
                "pymongo not installed; use KeyedParquetStore (same merge "
                "contract) or install pymongo against a real deployment"
            ) from e

    def merge(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:  # pragma: no cover
        """Executor-parallel idempotent upsert of one micro-batch."""
        del epoch_id  # replay safety comes from idempotent upserts
        uri, db, coll = self.uri, self.database, self.collection
        key_cols, newer_col = list(self.key_cols), self.newer_col

        def write_partition(rows) -> None:
            from pymongo import MongoClient, UpdateOne

            client = MongoClient(uri)
            try:
                target = client[db][coll]
                ops = []
                for row in rows:
                    doc = row.asDict(recursive=True)
                    _id = "|".join(str(doc[k]) for k in key_cols)
                    if newer_col is None:
                        ops.append(
                            UpdateOne({"_id": _id}, {"$set": doc}, upsert=True)
                        )
                    else:
                        # strictly-newer guard: matches the stored doc only
                        # when its ts is older; the upsert path covers the
                        # first write (duplicate-key races on replay are
                        # benign: the other writer already won with newer
                        # or equal data)
                        ops.append(
                            UpdateOne(
                                {"_id": _id, newer_col: {"$lt": doc[newer_col]}},
                                {"$set": doc},
                                upsert=True,
                            )
                        )
                    if len(ops) >= BULK_CHUNK:
                        target.bulk_write(ops, ordered=False)
                        ops = []
                if ops:
                    target.bulk_write(ops, ordered=False)
            finally:
                client.close()

        batch_df.foreachPartition(write_partition)

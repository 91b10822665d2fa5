"""MongoDB adapter for the keyed-sink contract (reference S4/S5).

The reference's sinks ARE MongoDB collections: tiles via deterministic
``_id`` + ``$set`` upsert (heatmap_stream.py:159-196) and
positions_latest via a ts-monotonic guarded upsert — the reference's
filter is ``{_id, $or: [{ts: {$exists: false}}, {ts: {$lt: incoming}}]}``
(heatmap_stream.py:219-224). ``MongoKeyedStore`` exposes the same
``merge(batch_df, epoch_id)`` surface as ``KeyedParquetStore`` so the
streaming assembly swaps stores without touching the queries — but
writes EXECUTOR-SIDE via ``foreachPartition`` (each partition opens its
own client and bulk-writes its rows), never the reference's
driver-funnel ``toLocalIterator`` (heatmap_stream.py:163, 210).

Replay/out-of-order semantics: when the stored doc is newer-or-equal the
guard filter matches nothing, so MongoDB attempts the upsert INSERT and
hits the ``_id`` unique index -> E11000. That duplicate-key error is the
no-op outcome the guard intends ("someone already won with newer data"),
so ``_flush`` swallows code-11000 write errors from the unordered
``bulk_write`` and re-raises anything else. The reference shares this
failure mode but does not handle it; replays against it would abort the
batch.

The partition-writer core (``write_rows``) is a module-level function
driven directly by tests through a fake pymongo client
(tests/test_mongo_fake.py); only the thin ``foreachPartition`` bridge
needs a live cluster. Import-gated: constructing the store without
pymongo importable raises immediately rather than failing at merge time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Iterable

from pyspark.sql import DataFrame

BULK_CHUNK = 1000  # ops per bulk_write, matching heatmap_stream.py:191

DUP_KEY = 11000  # MongoDB E11000 duplicate-key write-error code


def build_op(doc: dict[str, Any], key_cols: list[str], newer_col: str | None):
    """One idempotent UpdateOne for ``doc``.

    ``newer_col=None`` -> plain ``$set`` upsert by deterministic ``_id``
    (S4, heatmap_stream.py:188); otherwise the reference's strictly-newer
    guard: match the stored doc only when its ``newer_col`` is absent or
    older than the incoming value (S5, heatmap_stream.py:219-224).
    """
    from pymongo import UpdateOne

    _id = "|".join(str(doc[k]) for k in key_cols)
    doc = {**doc, "_id": _id}
    if newer_col is None:
        return UpdateOne({"_id": _id}, {"$set": doc}, upsert=True)
    return UpdateOne(
        {
            "_id": _id,
            "$or": [
                {newer_col: {"$exists": False}},
                {newer_col: {"$lt": doc[newer_col]}},
            ],
        },
        {"$set": doc},
        upsert=True,
    )


def _flush(target, ops: list) -> None:
    """Unordered bulk write tolerating guard-race duplicate keys.

    A lost ts-guard race (or a replay of an already-applied batch) shows
    up as E11000 on the upsert's insert path — the stored doc is already
    newer-or-equal, which is exactly the no-op the guard wants. ONLY that
    outcome is swallowed: the error must carry a non-empty writeErrors
    list that is all code-11000, and no writeConcernErrors. A
    BulkWriteError with empty/absent writeErrors (e.g. a pure
    write-concern / replication failure) is not a duplicate-key no-op and
    is re-raised like any other write error.
    """
    if not ops:
        return
    from pymongo.errors import BulkWriteError

    try:
        target.bulk_write(ops, ordered=False)
    except BulkWriteError as e:
        details = e.details or {}
        write_errors = details.get("writeErrors") or []
        fatal = [w for w in write_errors if w.get("code") != DUP_KEY]
        if fatal or not write_errors or details.get("writeConcernErrors"):
            raise


def write_rows(
    rows: Iterable[Any],
    client,
    database: str,
    collection: str,
    key_cols: list[str],
    newer_col: str | None,
    chunk: int = BULK_CHUNK,
) -> None:
    """Write an iterator of Rows (or plain dicts) through one client.

    This is the whole per-partition write path — chunked unordered
    bulk_writes of guarded upserts — factored out of ``merge`` so tests
    can drive it with a fake client (the ``foreachPartition`` bridge is
    the only part that needs a live deployment).
    """
    target = client[database][collection]
    ops: list = []
    for row in rows:
        doc = row.asDict(recursive=True) if hasattr(row, "asDict") else dict(row)
        ops.append(build_op(doc, key_cols, newer_col))
        if len(ops) >= chunk:
            _flush(target, ops)
            ops = []
    _flush(target, ops)


@dataclass
class MongoKeyedStore:
    """Keyed sink over a MongoDB collection.

    merge semantics (identical to KeyedParquetStore):
      - ``newer_col=None`` -> ``$set`` upsert by deterministic _id (S4);
      - ``newer_col="ts"`` -> upsert only when incoming is strictly newer
        (absent-or-``$lt`` guard on the stored value, S5) — replays and
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
        except ImportError as e:
            raise ImportError(
                "pymongo not installed; use KeyedParquetStore (same merge "
                "contract) or install pymongo against a real deployment"
            ) from e

    def merge(self, batch_df: DataFrame, epoch_id: int | None = None) -> None:
        """Executor-parallel idempotent upsert of one micro-batch."""
        del epoch_id  # replay safety comes from idempotent upserts
        uri, db, coll = self.uri, self.database, self.collection
        key_cols, newer_col = list(self.key_cols), self.newer_col

        def write_partition(rows) -> None:  # pragma: no cover - needs live Mongo
            from pymongo import MongoClient

            client = MongoClient(uri)
            try:
                write_rows(rows, client, db, coll, key_cols, newer_col)
            finally:
                client.close()

        batch_df.foreachPartition(write_partition)

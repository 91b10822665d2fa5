"""MongoKeyedStore contract tests against a fake in-memory pymongo.

The container has no pymongo and no Mongo server, so these tests inject a
minimal fake module into ``sys.modules`` that emulates the exact slice of
MongoDB semantics the sink relies on (reference heatmap_stream.py:159-235):

  - ``UpdateOne(filter, {"$set": doc}, upsert=True)`` upserts;
  - a filter of ``{_id, $or: [{col: {$exists: false}},
    {col: {$lt: v}}]}`` matches only when the stored value is absent or
    strictly older;
  - an upsert whose filter matches nothing but whose ``_id`` already
    exists raises E11000 (duplicate key) — collected per-op under
    ``ordered=False`` and surfaced as ``BulkWriteError``.

They drive ``write_rows`` (the whole per-partition write path) directly;
only the ``foreachPartition`` bridge needs a live cluster.
"""

from __future__ import annotations

import sys
import types

import pytest


# ---------------------------------------------------------------- fake pymongo
class FakeUpdateOne:
    def __init__(self, filter, update, upsert=False):
        self.filter = filter
        self.update = update
        self.upsert = upsert


class FakeBulkWriteError(Exception):
    def __init__(self, details):
        super().__init__(str(details))
        self.details = details


def _guard_matches(stored: dict, filter: dict) -> bool:
    """Evaluate the sink's filter shape against a stored doc."""
    for key, cond in filter.items():
        if key == "_id":
            continue
        if key == "$or":
            if not any(_guard_matches(stored, branch) for branch in cond):
                return False
            continue
        # {col: {"$exists": False}} / {col: {"$lt": v}}
        if isinstance(cond, dict):
            if "$exists" in cond:
                if (key in stored) != cond["$exists"]:
                    return False
            if "$lt" in cond:
                if key not in stored or not stored[key] < cond["$lt"]:
                    return False
        elif stored.get(key) != cond:
            return False
    return True


class FakeCollection:
    def __init__(self):
        self.docs: dict[str, dict] = {}
        self.bulk_calls: list[int] = []  # op count per bulk_write

    def bulk_write(self, ops, ordered=False):
        assert ordered is False, "sink must use unordered bulk writes"
        self.bulk_calls.append(len(ops))
        write_errors = []
        for i, op in enumerate(ops):
            _id = op.filter["_id"]
            stored = self.docs.get(_id)
            if stored is not None and _guard_matches(stored, op.filter):
                stored.update(op.update["$set"])
            elif stored is None:
                if not op.upsert:
                    continue
                self.docs[_id] = dict(op.update["$set"])
            else:
                # filter missed but _id exists: upsert INSERT -> E11000
                write_errors.append({"index": i, "code": 11000, "errmsg": "E11000"})
        if write_errors:
            raise FakeBulkWriteError({"writeErrors": write_errors})


class FakeClient:
    def __init__(self, uri="mongodb://fake"):
        self._dbs: dict[str, dict[str, FakeCollection]] = {}

    def __getitem__(self, db):
        return self._dbs.setdefault(db, _FakeDb())

    def close(self):
        pass


class _FakeDb(dict):
    def __missing__(self, coll):
        self[coll] = FakeCollection()
        return self[coll]


@pytest.fixture
def fake_pymongo(monkeypatch):
    mod = types.ModuleType("pymongo")
    mod.MongoClient = FakeClient
    mod.UpdateOne = FakeUpdateOne
    errors = types.ModuleType("pymongo.errors")
    errors.BulkWriteError = FakeBulkWriteError
    mod.errors = errors
    monkeypatch.setitem(sys.modules, "pymongo", mod)
    monkeypatch.setitem(sys.modules, "pymongo.errors", errors)
    return mod


# ------------------------------------------------------------------- the tests
TILES = [
    {"tile_id": "a|1", "cnt": 3, "avg_speed": 12.0},
    {"tile_id": "b|2", "cnt": 1, "avg_speed": 30.0},
]

POSITIONS = [
    {"provider": "mbta", "vehicleId": "v1", "ts": 100, "lat": 42.0, "lon": -71.0},
    {"provider": "mbta", "vehicleId": "v2", "ts": 200, "lat": 42.1, "lon": -71.1},
]


def _store(fake_pymongo, **kw):
    from real_time_mobility_heatmap_spark.streaming.mongo import MongoKeyedStore

    defaults = dict(
        uri="mongodb://fake",
        database="mobility",
        collection="positions_latest",
        key_cols=["provider", "vehicleId"],
        newer_col="ts",
    )
    defaults.update(kw)
    return MongoKeyedStore(**defaults)


def _write(rows, client, store, chunk=1000):
    from real_time_mobility_heatmap_spark.streaming.mongo import write_rows

    write_rows(
        rows, client, store.database, store.collection,
        store.key_cols, store.newer_col, chunk=chunk,
    )


def test_construction_is_import_gated_without_pymongo(monkeypatch):
    from real_time_mobility_heatmap_spark.streaming.mongo import MongoKeyedStore

    # force `import pymongo` to fail deterministically, whether or not the
    # environment has pymongo installed: None in sys.modules makes the
    # import machinery raise ImportError ("import halted")
    monkeypatch.setitem(sys.modules, "pymongo", None)
    with pytest.raises(ImportError, match="pymongo not installed"):
        MongoKeyedStore("mongodb://x", "db", "c", ["k"])


def test_set_upsert_inserts_then_overwrites(fake_pymongo):
    store = _store(
        fake_pymongo, collection="tiles", key_cols=["tile_id"], newer_col=None
    )
    client = FakeClient()
    _write(TILES, client, store)
    coll = client["mobility"]["tiles"]
    assert set(coll.docs) == {"a|1", "b|2"}
    assert coll.docs["a|1"]["cnt"] == 3

    # S4 is last-write-wins: a re-emitted window update replaces the doc
    _write([{"tile_id": "a|1", "cnt": 7, "avg_speed": 9.0}], client, store)
    assert coll.docs["a|1"]["cnt"] == 7
    assert coll.docs["b|2"]["cnt"] == 1


def test_ts_guard_applies_newer_and_ignores_older(fake_pymongo):
    store = _store(fake_pymongo)
    client = FakeClient()
    _write(POSITIONS, client, store)
    coll = client["mobility"]["positions_latest"]
    assert coll.docs["mbta|v1"]["ts"] == 100

    # newer ts wins
    newer = [{"provider": "mbta", "vehicleId": "v1", "ts": 150, "lat": 43.0, "lon": -70.0}]
    _write(newer, client, store)
    assert coll.docs["mbta|v1"]["ts"] == 150
    assert coll.docs["mbta|v1"]["lat"] == 43.0

    # older ts is a silent no-op (guard misses; E11000 swallowed)
    older = [{"provider": "mbta", "vehicleId": "v1", "ts": 50, "lat": 0.0, "lon": 0.0}]
    _write(older, client, store)
    assert coll.docs["mbta|v1"]["ts"] == 150
    assert coll.docs["mbta|v1"]["lat"] == 43.0


def test_replay_of_identical_batch_is_noop_not_error(fake_pymongo):
    """Replaying an applied micro-batch must not abort: equal ts misses the
    strictly-$lt guard, surfaces as E11000, and is swallowed."""
    store = _store(fake_pymongo)
    client = FakeClient()
    _write(POSITIONS, client, store)
    snapshot = {k: dict(v) for k, v in client["mobility"]["positions_latest"].docs.items()}
    _write(POSITIONS, client, store)  # must not raise
    assert client["mobility"]["positions_latest"].docs == snapshot


def test_non_duplicate_write_errors_are_reraised(fake_pymongo):
    from real_time_mobility_heatmap_spark.streaming.mongo import _flush

    class Exploding:
        def bulk_write(self, ops, ordered=False):
            raise FakeBulkWriteError(
                {"writeErrors": [{"index": 0, "code": 121, "errmsg": "validation"}]}
            )

    with pytest.raises(FakeBulkWriteError):
        _flush(Exploding(), [object()])


def test_write_concern_failures_are_reraised(fake_pymongo):
    """A BulkWriteError whose writeErrors are all benign dup-keys (or
    empty) but which carries writeConcernErrors is a replication failure,
    not a guard-race no-op — it must propagate."""
    from real_time_mobility_heatmap_spark.streaming.mongo import _flush

    class WriteConcernFail:
        def __init__(self, details):
            self._details = details

        def bulk_write(self, ops, ordered=False):
            raise FakeBulkWriteError(self._details)

    dup = {"index": 0, "code": 11000, "errmsg": "E11000"}
    wc = {"code": 64, "errmsg": "waiting for replication timed out"}
    for details in (
        {"writeErrors": [dup], "writeConcernErrors": [wc]},
        {"writeErrors": [], "writeConcernErrors": [wc]},
        {"writeConcernErrors": [wc]},
        {},  # detail-less bulk error: nothing proves it was benign
        None,
    ):
        with pytest.raises(FakeBulkWriteError):
            _flush(WriteConcernFail(details), [object()])


def test_pure_duplicate_key_errors_are_swallowed(fake_pymongo):
    from real_time_mobility_heatmap_spark.streaming.mongo import _flush

    class DupOnly:
        def bulk_write(self, ops, ordered=False):
            raise FakeBulkWriteError(
                {"writeErrors": [{"index": 0, "code": 11000, "errmsg": "E11000"}]}
            )

    _flush(DupOnly(), [object()])  # must not raise


def test_bulk_writes_are_chunked(fake_pymongo):
    store = _store(
        fake_pymongo, collection="tiles", key_cols=["tile_id"], newer_col=None
    )
    client = FakeClient()
    rows = [{"tile_id": f"t|{i}", "cnt": i} for i in range(5)]
    _write(rows, client, store, chunk=2)
    # 5 ops at chunk=2 -> flushes of 2, 2, 1 (heatmap_stream.py:191 contract)
    assert client["mobility"]["tiles"].bulk_calls == [2, 2, 1]
    assert len(client["mobility"]["tiles"].docs) == 5


def test_spark_rows_roundtrip_through_write_rows(fake_pymongo, spark):
    """write_rows accepts real pyspark Rows (asDict path) — the exact
    objects foreachPartition hands the partition writer."""
    store = _store(fake_pymongo)
    client = FakeClient()
    df = spark.createDataFrame(POSITIONS)
    _write(df.collect(), client, store)
    docs = client["mobility"]["positions_latest"].docs
    assert set(docs) == {"mbta|v1", "mbta|v2"}
    assert docs["mbta|v2"]["lon"] == -71.1

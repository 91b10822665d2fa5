"""Empty-input totality (r10 sweep): every registered query must be
TOTAL on a zero-row fixture set — return a well-typed (usually empty)
relation, never crash. This file pins the seven previously-crashing /
diverging paths: ANSI div-by-zero, zero-file schema inference,
unsanitized identifiers from scratch-dir names, footer-stats sentinel,
store-snapshot None, and the per-format roundtrip aggregate. The
cube/rollup grand-total-row divergence vs the SQL standard on empty
input is Spark engine semantics, documented in SCALE.md, and not
asserted here."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

SRC = "/root/testdata/sf0.001"

# the queries the r10 sweep found crashing on empty input (plus their
# close siblings), each exercising a distinct failure class
PINNED = [
    "dq_expectations",          # ANSI `div` by zero
    "bucketed_join_stats",      # SQL-identifier sanitization ("-" in dir name)
    "partition_pruned_stats",   # zero-file partitioned-read schema inference
    "source_roundtrip",         # per-format aggregate on empty source
    "streaming_tiles",          # store snapshot None -> typed empty frame
    "streaming_positions",
    "streaming_enriched",
    "streaming_sessions",       # flush sentinel with no footer stats
    "streaming_neardup",        # doc_id range split on empty corpus
    "vehicle_trips",
    "lsh_candidate_stats",
    "vband_geometry_report",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory) -> str:
    # a hyphen in the dir name on purpose: it must not break identifier
    # or path derivation anywhere
    d = tmp_path_factory.mktemp("sf-empty-fixture")
    for f in os.listdir(SRC):
        if f.endswith(".parquet"):
            t = pq.read_table(os.path.join(SRC, f))
            pq.write_table(t.slice(0, 0), str(d / f))
    return str(d)


@pytest.mark.parametrize("name", PINNED)
def test_query_is_total_on_empty_fixtures(spark, empty_sf_dir, name):
    df = entry_mod.queries()[name](spark, empty_sf_dir)
    rows = df.collect()  # must not raise
    assert df.schema.fieldNames(), "result must keep a typed schema"
    # report-shaped queries may legitimately emit summary rows over an
    # empty corpus; row-shaped ones must be empty
    assert isinstance(rows, list)

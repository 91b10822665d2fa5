"""Perturbed-corpus differential regression net (r11).

The driver's fixtures observe ONE set of value combinations; the
rounding-boundary bug class (a money total landing within an ulp of a
half-cent) only fires when the data happens to reach a boundary, so the
r11 sweep jittered every non-key column (tools/perturb_corpus.py) and
ran the full registry — catching ``product_type_profit`` flipping
1433933.21 vs .22 between Spark and DuckDB. The class-wide fix is
functions/money.py (exact DECIMAL sums); this file pins

1. the helper itself on a manufactured exact half-cent boundary where
   the float-sum formulation provably COULD flip, and
2. the repaired money queries differentially vs DuckDB on a perturbed
   sf0.001 corpus — fresh value combinations every time the fixture
   changes shape, not just the ones the fixtures shipped with.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import __spark_entry__ as entry_mod
from check_oracles import _canon, spark_to_pandas
from perturb_corpus import build as build_perturbed
from real_time_mobility_heatmap_spark.functions.money import (
    money_sum,
    money_sum_sql,
)
from real_time_mobility_heatmap_spark.sources.tables import TABLES

SRC = "/root/testdata/sf0.001"

# the r11 money-class queries (every F.round(F.sum(<4+-decimal product>))
# site found by the static audit, now exact-DECIMAL)
MONEY_QUERIES = [
    "product_type_profit",
    "pricing_summary",
    "sql_pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "nation_trade_volume",
    "market_share",
    "promo_revenue_share",
    "top_suppliers",
    "disjunctive_revenue",
    "forecast_revenue_change",
    "returned_item_reporting",
    "important_parts",
    "bucketed_join_stats",
    "bloom_semijoin_stats",
]


def _assert_matches_oracle(spark, sf_dir: str, name: str) -> None:
    """Same canonicalization as tools/check_oracles.py (the local
    stand-in for the driver's value-hash gate) — the ONE comparison
    every perturbed-corpus test routes through, so a canonicalization
    change lands in exactly one place."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = spark_to_pandas(qs[name](spark, sf_dir))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    odf = con.sql(oracles[name]).df()
    assert sorted(sdf.columns) == sorted(odf.columns), name
    assert len(sdf) == len(odf), name
    assert _canon(sdf) == _canon(odf), name


def test_money_sum_exact_on_half_cent_boundary(spark):
    """Two 0.1225 revenues total exactly 0.2450 — a half-cent boundary.
    The decimal path must round it half-up to 0.25 in BOTH engines; the
    old float path is hostage to whether the accumulated double lands
    above or below the boundary."""
    df = spark.createDataFrame(
        [(0.35, 0.35), (0.35, 0.35)], "price double, disc_compl double"
    )
    got = df.agg(money_sum("price * disc_compl").alias("s")).collect()[0]["s"]
    oracle = duckdb.sql(
        f"SELECT {money_sum_sql('a * b')} AS s"
        " FROM (VALUES (0.35, 0.35), (0.35, 0.35)) t(a, b)"
    ).fetchone()[0]
    assert got == oracle == 0.25
    # and the no-op-rounding variant (out_dec >= in_dec) stays exact
    got6 = df.agg(money_sum("price * disc_compl", 4, 6).alias("s")).collect()[
        0
    ]["s"]
    assert got6 == 0.245
    # hi/lo split reconstruction: units large enough that the lo half
    # wraps 1e6 repeatedly (9999.99 -> 99999900 units/row)
    big = spark.createDataFrame([(9999.99,)] * 7, "v double")
    got_big = big.agg(money_sum("v * 1.0").alias("s")).collect()[0]["s"]
    assert got_big == round(9999.99 * 7, 2) == 69999.93


def test_money_sum_final_conversion_agrees_past_2_53_units(spark):
    """The r15 --xval find: with the exact total's UNSCALED value past
    2^53, Spark's decimal→double cast (one correct rounding) and
    DuckDB's (int→double then a double divide — two roundings) split in
    the last ulp; at 100 TB any revenue total past ~$9e11 crosses it.
    The fragment now converts through the exact integer and divides by
    the power of ten in double — the SAME two steps in both engines.
    18 rows of ~$1e12 items is the measured first-contact shape."""
    rows = [(1.0e12 + k * 97.37, 0.01 * (k % 7)) for k in range(18)]
    df = spark.createDataFrame(rows, "x double, d double")
    frag = money_sum_sql("x * (1 - d)", 4, 6)
    got = df.selectExpr(f"{frag} AS s").collect()[0]["s"]
    vals = ", ".join(f"({x!r}, {d!r})" for x, d in rows)
    oracle = duckdb.sql(
        f"SELECT {frag} AS s FROM (VALUES {vals}) t(x, d)"
    ).fetchone()[0]
    assert got == oracle


@pytest.fixture(scope="module")
def perturbed_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf-perturbed")
    build_perturbed(SRC, str(d), seed=7)
    return str(d)


@pytest.mark.parametrize("name", MONEY_QUERIES)
def test_money_queries_match_oracle_on_perturbed_corpus(
    spark, perturbed_sf_dir, name
):
    _assert_matches_oracle(spark, perturbed_sf_dir, name)


# ---------------------------------------------------------------------------
# r13: the NULL-embedding / zero-length-blob axis, pinned as a permanent
# differential net (the r13 sweep's first contact found 14 diverging
# queries in three classes — DuckDB list_inner_product erroring on NULL
# vectors, ANSI divide-by-zero on empty text, and the empty-blob
# totality split in media_resize; all fixed via the load_embeddings /
# _EMB boundary, nullif(length(text),0), and the resize left-join).

NULL_AXIS_QUERIES = [
    # NULL-vector boundary class
    "kmeans_update",
    "semantic_dedup",
    "quantize_embeddings",
    "lsh_buckets",
    "embedding_neardup",
    "rp_project",
    "rp_recall_report",
    "vband_geometry_report",
    # empty-text ANSI-division class
    "quality_score",
    "quality_filter",
    "quality_decile_report",
    "dedup_keep_best",
    # zero-length-blob totality class
    "media_features",
    "media_resize",
]


@pytest.fixture(scope="module")
def null_perturbed_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf-perturbed-nulls")
    build_perturbed(SRC, str(d), seed=7, nulls=True)
    # the axis must actually exist in the corpus, or these tests rot
    con = duckdb.connect()
    n_null_emb, n_null_seed = con.sql(
        f"SELECT count(*) FILTER (embedding IS NULL),"
        f" count(*) FILTER (embedding IS NULL AND vec_id < 4)"
        f" FROM '{d}/embeddings.parquet'"
    ).fetchone()
    assert n_null_emb > 0, "--nulls must NULL an embedding slice"
    assert n_null_seed == 0, "seed centroids must stay non-null"
    n_empty, n_bad_meta = con.sql(
        f"SELECT count(*) FILTER (text = ''),"
        f" count(*) FILTER (text = '' AND n_chars != 0)"
        f" FROM '{d}/documents.parquet'"
    ).fetchone()
    assert n_empty > 0, "--nulls must empty a text slice"
    assert n_bad_meta == 0, "empty text must carry n_chars = 0"
    # the r13 non-finite slice: NaN/Inf components must exist (the
    # load_embeddings/_EMB finite boundary needs live pressure), and the
    # in-domain -0.0 slice must survive as a VALID vector
    n_nonfinite = con.sql(
        f"SELECT count(*) FROM '{d}/embeddings.parquet'"
        f" WHERE embedding IS NOT NULL AND"
        f" list_aggregate(list_transform(embedding,"
        f" x -> NOT isfinite(x)), 'bool_or')"
    ).fetchone()[0]
    assert n_nonfinite > 0, "--nulls must poison a non-finite slice"
    # the r14 NULL-COMPONENT slice: non-NULL vectors with one NULL
    # element must exist — they sat on the exists()/bool_or 3VL fault
    # line until both engines' boundary predicates tested the element
    # explicitly (similarity._EMB / load_embeddings)
    n_null_comp = con.sql(
        f"SELECT count(*) FROM '{d}/embeddings.parquet'"
        f" WHERE embedding IS NOT NULL AND"
        f" list_aggregate(list_transform(embedding,"
        f" x -> x IS NULL), 'bool_or')"
    ).fetchone()[0]
    assert n_null_comp > 0, "--nulls must inject NULL-component vectors"
    return str(d)


@pytest.mark.parametrize("name", NULL_AXIS_QUERIES)
def test_null_axis_queries_match_oracle(spark, null_perturbed_sf_dir, name):
    _assert_matches_oracle(spark, null_perturbed_sf_dir, name)


# ---------------------------------------------------------------------------
# r13: the TIES axis, pinned as a permanent differential net. The base
# fixtures contain ZERO duplicate (vehicle, eventTs) pairs, so until the
# --ties sweep no registered query had ever been order-pressured on the
# pings axis the way a real fleet stream is (two pings in one second is
# the NORM). First contact at sf0.01 found the latest-position family
# (latest_maxby / latest_positions / position_features /
# streaming_positions) picking an ARBITRARY winner among tied
# max-eventTs rows in both engines — fixed with the (eventTs, event_id)
# argmax pair key (operators/latest.py, streaming/assembly.py
# positions_batch) and row_number-form oracles (DuckDB arg_max has no
# composite-key overload).

TIES_AXIS_QUERIES = [
    # the family first-contact caught (argmax tie winner)
    "latest_maxby",
    "latest_positions",
    "position_features",
    "streaming_positions",
    # tie-duplicating reference-parity twin (must keep BOTH tied rows)
    "latest_join",
    # per-vehicle order-sensitive folds whose event_id tiebreaks the
    # axis now actively exercises
    "latest_rownum",
    "vehicle_sessions",
    "vehicle_trips",
    "resample_trajectories",
    "ewma_speed",
    "markov_transitions",
    "moving_avg_speed",
]


@pytest.fixture(scope="module")
def ties_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf-perturbed-ties")
    build_perturbed(SRC, str(d), seed=7, ties=True)
    # the axis must actually exist in the corpus, or these tests rot
    con = duckdb.connect()
    n_same_user = con.sql(
        f"SELECT count(*) FROM (SELECT user_id, ts, count(*) c FROM"
        f" '{d}/events.parquet' GROUP BY 1, 2 HAVING c > 1)"
    ).fetchone()[0]
    assert n_same_user > 0, "--ties must create same-vehicle eventTs ties"
    n_null_ts = con.sql(
        f"SELECT count(*) FROM '{d}/events.parquet' WHERE ts IS NULL"
    ).fetchone()[0]
    assert n_null_ts == 0, "event-time stays non-null under --ties"
    return str(d)


@pytest.mark.parametrize("name", TIES_AXIS_QUERIES)
def test_ties_axis_queries_match_oracle(spark, ties_sf_dir, name):
    _assert_matches_oracle(spark, ties_sf_dir, name)


# ---------------------------------------------------------------------------
# r13: the UNICODE axis. The fixtures are pure ASCII, so the text
# family's primitives had never executed over multibyte input. The
# cross-engine primitive probe found the used surface (code-point
# length, the BPE/punct regex classes, \s+ tokenize, md5/sha over UTF-8
# bytes) agrees — EXCEPT lower(): Java applies SpecialCasing full
# mappings (İ -> i + U+0307) and the contextual final-sigma rule
# (trailing Σ -> ς) where utf8proc applies simple mappings (İ -> i,
# Σ -> σ always). Every content-casefold site now routes through
# fold_lower / fold_lower_duck (functions/textfns.py), which pre-fold
# the three divergent code points so lower() is engine-identical over
# all of Unicode.

UNICODE_AXIS_QUERIES = [
    # the casefold sites themselves
    "fingerprint",
    "rolling_fingerprint",
    # tokens()-derived pipelines over the injected multibyte tokens
    "token_count",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "quality_score",
    "lang_id",
    # byte-level media path (UTF-8 bytes of multibyte text as blobs)
    "media_features",
    "media_metadata",
]


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf-perturbed-unicode")
    build_perturbed(SRC, str(d), seed=7, unicode_text=True)
    con = duckdb.connect()
    n_nonascii, n_bad_meta = con.sql(
        f"SELECT count(*) FILTER (regexp_matches(text, '[^\\x01-\\x7F]')),"
        f" count(*) FILTER (n_chars != length(text))"
        f" FROM '{d}/documents.parquet'"
    ).fetchone()
    assert n_nonascii > 0, "--unicode must inject multibyte tokens"
    assert n_bad_meta == 0, "n_chars must stay code-point-consistent"
    # the two lower()-divergent code points must both be present
    n_dotted, n_sigma = con.sql(
        f"SELECT count(*) FILTER (regexp_matches(text, 'İ')),"
        f" count(*) FILTER (regexp_matches(text, 'Σ'))"
        f" FROM '{d}/documents.parquet'"
    ).fetchone()
    assert n_dotted > 0 and n_sigma > 0
    return str(d)


@pytest.mark.parametrize("name", UNICODE_AXIS_QUERIES)
def test_unicode_axis_queries_match_oracle(spark, unicode_sf_dir, name):
    _assert_matches_oracle(spark, unicode_sf_dir, name)


def test_fold_lower_closes_java_utf8proc_casefold_split(spark):
    """The raw-primitive pin: bare lower() DIVERGES between the engines
    on İ and word-final Σ (so the detector is not vacuous), and the
    fold_lower/fold_lower_duck pair agrees byte-for-byte."""
    from pyspark.sql import functions as F

    from real_time_mobility_heatmap_spark.functions.textfns import (
        fold_lower,
        fold_lower_duck,
    )

    samples = ["İSTANBUL", "ΒΑΣΙΛΕΥΣ ΣΟΣ", "straße", "MiXeD ascii"]
    df = spark.createDataFrame([(s,) for s in samples], "t string")
    rows = df.select(
        F.lower("t").alias("raw"), fold_lower(F.col("t")).alias("folded")
    ).collect()
    con = duckdb.connect()
    diverged = 0
    for s, r in zip(samples, rows):
        d_raw, d_fold = con.execute(
            f"SELECT lower(?), {fold_lower_duck('?')}", [s, s]
        ).fetchone()
        if r["raw"] != d_raw:
            diverged += 1
        assert r["folded"] == d_fold, s
    assert diverged >= 2  # İ and final-sigma both split the engines


# ---------------------------------------------------------------------------
# r13: two degenerate EVENT corpora, swept full-registry green on first
# contact and pinned here on the order-sensitive subset (the r10
# all-identical-documents corpus is the dedup-side precedent):
#   - max-skew: every event on ONE vehicle (the single-giant-partition
#     shape; per-key windows, session folds and pair self-joins must
#     agree when one key holds the whole corpus);
#   - one-instant: every event at ONE timestamp (zero time-variance:
#     session/trip durations 0, OLS slope denominators 0, resample
#     spans 0, every argmax fully tied — the division and tie guards
#     all fire at once).

DEGENERATE_EVENT_QUERIES = [
    "vehicle_sessions",
    "vehicle_trips",
    "ewma_speed",
    "markov_transitions",
    "cell_speed_trend",
    "co_dwell_pairs",
    "encounter_pairs",
    "latest_maxby",
    "resample_trajectories",
    "moving_avg_speed",
]


def _events_rewrite_dir(tmp_path_factory, label: str, select_sql: str) -> str:
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp(f"sf-degenerate-{label}")
    base = Path(SRC)
    for t in TABLES:
        if t != "events":
            shutil.copy(base / f"{t}.parquet", d / f"{t}.parquet")
    con = duckdb.connect()
    want = pq.read_schema(base / "events.parquet")
    got = con.sql(select_sql.format(src=base / "events.parquet")).arrow()
    if isinstance(got, pa.RecordBatchReader):
        got = got.read_all()
    pq.write_table(got.cast(want), d / "events.parquet")
    return str(d)


@pytest.fixture(scope="module")
def one_vehicle_sf_dir(tmp_path_factory) -> str:
    return _events_rewrite_dir(
        tmp_path_factory,
        "one-vehicle",
        "SELECT event_id, ts, CAST(7 AS BIGINT) AS user_id, event_type,"
        " value, props FROM '{src}'",
    )


@pytest.fixture(scope="module")
def one_instant_sf_dir(tmp_path_factory) -> str:
    return _events_rewrite_dir(
        tmp_path_factory,
        "one-instant",
        "SELECT event_id, TIMESTAMP '2024-01-15 12:00:00' AS ts, user_id,"
        " event_type, value, props FROM '{src}'",
    )


@pytest.mark.parametrize("name", DEGENERATE_EVENT_QUERIES)
def test_one_vehicle_corpus_matches_oracle(spark, one_vehicle_sf_dir, name):
    _assert_matches_oracle(spark, one_vehicle_sf_dir, name)


@pytest.mark.parametrize("name", DEGENERATE_EVENT_QUERIES)
def test_one_instant_corpus_matches_oracle(spark, one_instant_sf_dir, name):
    _assert_matches_oracle(spark, one_instant_sf_dir, name)


# ---------------------------------------------------------------------------
# r13: the JSON-shape axis. The fixture props is always '{"k": N}', so
# the schema-on-read parsers had never seen any other shape. The
# cross-engine battery found five divergence classes in the naive
# extract-then-cast oracles (quoted numbers coerced, doubles rounded,
# overflow/boolean/malformed ERRORING where Spark PERMISSIVE yields
# NULL, and Spark's whole-map-null strictness admitting null entries);
# JSON_DECODE_ORACLE / PROPS_KEY_STATS_ORACLE now mirror the Spark
# contract via json_type guards (operators/decode.py).

JSON_AXIS_QUERIES = [
    "json_decode",
    "props_key_stats",
    # opaque-string carriers: props rides through checksums unchanged
    "source_roundtrip",
    "wire_roundtrip",
]


@pytest.fixture(scope="module")
def json_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf-perturbed-json")
    build_perturbed(SRC, str(d), seed=7, json_shapes=True)
    con = duckdb.connect()
    # try_cast, not json(): AND in a FILTER does not short-circuit, so a
    # bare json(props) would raise on the malformed slice this asserts
    n_bad, n_nonobj, n_quoted = con.sql(
        f"SELECT count(*) FILTER (props IS NOT NULL AND NOT json_valid(props)),"
        f" count(*) FILTER (json_type(try_cast(props AS JSON)) != 'OBJECT'),"
        f" count(*) FILTER (json_type(try_cast(props AS JSON), '$.k') = 'VARCHAR')"
        f" FROM '{d}/events.parquet'"
    ).fetchone()
    assert n_bad > 0, "--json must create malformed payloads"
    assert n_nonobj > 0, "--json must create non-object payloads"
    assert n_quoted > 0, "--json must create quoted-number k values"
    return str(d)


@pytest.mark.parametrize("name", JSON_AXIS_QUERIES)
def test_json_axis_queries_match_oracle(spark, json_sf_dir, name):
    _assert_matches_oracle(spark, json_sf_dir, name)


# ---------------------------------------------------------------------------
# r14: the DUPKEYS axis — duplicate primary keys. Every fixture (and
# every jittered corpus: keys are untouched by the jitter) has UNIQUE
# event_id / doc_id, so the registry's PK assumptions had never been
# violated: the r13 ties fix keys argmax on (eventTs, event_id) with
# event_id as the deterministic tiebreak, dozens of window orderings end
# in event_id, and the doc pipelines treat doc_id as row identity.
# First contact (sf0.01, seed 14, full registry) found 37 divergent
# queries, ALL tracing to PK-identity ambiguity (argmax/ordering
# winners among conflicting duplicates, doc_id-grouped vs per-row
# fingerprint/pair pipelines, doc_id join multiplicities) and ZERO
# crashes. The codified decision is a VALIDITY CONTRACT, not per-query
# tiebreak surgery: event_id/doc_id uniqueness is an ingestion-contract
# PRECONDITION (sources/tables.py module docstring — the engine's own
# ingest establishes it via producer-assigned ids and key-upserting
# stores; exact_dedup/dedup_keep_best are the remediation operators),
# and under violation the engine stays total while key-identity readers
# return engine-arbitrary winners — the same stance every SQL engine
# takes on a violated uniqueness constraint. The full sensitive set is
# recorded in SCALE.md §r14; this net pins (a) the corpus classes,
# (b) a representative SYMMETRIC/per-row subset that must keep
# engine/oracle agreement even under violation, and (c) detector
# non-vacuity (a key-identity reader genuinely diverges).

DUPKEYS_INSENSITIVE_QUERIES = [
    # content-keyed / symmetric-merge dedup (dups collapse identically)
    "exact_dedup",
    "simhash",
    # per-row or per-key symmetric document pipelines
    "token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "dataset_split",
    # per-row event parsers and symmetric space-time aggregation
    "json_decode",
    "props_key_stats",
    "mobility_tiles",
    # order-pressured but structurally symmetric under the collision
    # classes (equal-ts rows contribute dt=0 to session folds; the
    # latest projection derives from the copied key columns)
    "vehicle_sessions",
    "latest_positions",
    # untouched-table control
    "pricing_summary",
]


@pytest.fixture(scope="module")
def dupkeys_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf-perturbed-dupkeys")
    build_perturbed(SRC, str(d), seed=7, dupkeys=True)
    con = duckdb.connect()
    # the axis must actually exist in the corpus, or these tests rot
    n_dup_ev = con.sql(
        f"SELECT count(*) FROM (SELECT event_id FROM '{d}/events.parquet'"
        f" GROUP BY 1 HAVING count(*) > 1)"
    ).fetchone()[0]
    assert n_dup_ev > 0, "--dupkeys must duplicate event_ids"
    n_replay = con.sql(
        f"SELECT count(*) FROM (SELECT * FROM '{d}/events.parquet'"
        f" GROUP BY ALL HAVING count(*) > 1)"
    ).fetchone()[0]
    assert n_replay > 0, "--dupkeys must create verbatim replay rows"
    n_conflict_user = con.sql(
        f"SELECT count(*) FROM (SELECT event_id, ts, user_id"
        f" FROM '{d}/events.parquet' GROUP BY 1, 2, 3"
        f" HAVING count(*) > 1"
        f" AND count(DISTINCT (value, props, event_type)) > 1)"
    ).fetchone()[0]
    assert n_conflict_user > 0, (
        "--dupkeys must collide (event_id, ts, user_id) with conflicting"
        " payloads — the exact key the r13 ties fix leans on"
    )
    n_doc_conflict = con.sql(
        f"SELECT count(*) FROM (SELECT doc_id FROM '{d}/documents.parquet'"
        f" GROUP BY 1 HAVING count(DISTINCT text) > 1)"
    ).fetchone()[0]
    assert n_doc_conflict > 0, "--dupkeys must conflict doc_id identities"
    return str(d)


@pytest.mark.parametrize("name", DUPKEYS_INSENSITIVE_QUERIES)
def test_dupkeys_insensitive_queries_match_oracle(spark, dupkeys_sf_dir, name):
    _assert_matches_oracle(spark, dupkeys_sf_dir, name)


# r16 (r15 verdict #3): the REMEDIATION-family operators — the tooling
# whose job is cleaning foreign/dirty corpora — pre-collapse doc_id
# identity (operators/dedup.py collapse_doc_identity, mirrored by
# pk1_oracle), so unlike the general registry they are DETERMINISTIC and
# engine/oracle-agreed on exactly the PK-violating input the contract
# names. Pinned here on a conflicting-doc_id corpus; their base-corpus
# value-identity was proven by the r16 cross-tree hash differential
# (0-diff at sf0.001, SCALE.md).
REMEDIATION_FAMILY_QUERIES = [
    "incremental_dedup",
    "winnow_fingerprints",
    "winnow_match_pairs",
    "winnow_match_spans",
    "decontaminate",
    "decontaminate_bloom",
    "decontaminate_bloom_bitmap",
    # the cluster/keep/split tier — the contract's NAMED remediation path
    # (dedup_keep_best) and the curation outputs built on it
    "dedup_clusters",
    "dedup_keep_best",
    "leakage_safe_split",
]


@pytest.mark.parametrize("name", REMEDIATION_FAMILY_QUERIES)
def test_remediation_family_deterministic_on_dupkeys(
    spark, dupkeys_sf_dir, name
):
    _assert_matches_oracle(spark, dupkeys_sf_dir, name)


def test_pk_violation_report_guards_sensitive_set(spark, dupkeys_sf_dir):
    """The contract's executable edge (r14 verdict item #2): on a
    PK-violating corpus the report is non-zero on EVERY shape the
    --dupkeys axis manufactures — so "report all-zero" is a sufficient
    certificate for the 37-query sensitive set — and the report itself
    is engine/oracle agreed on the violating corpus (it is a SYMMETRIC
    aggregate, usable as the audit even when identity readers are not)."""
    _assert_matches_oracle(spark, dupkeys_sf_dir, "pk_violation_report")
    rows = {
        r["table_name"]: r.asDict()
        for r in entry_mod.queries()["pk_violation_report"](
            spark, dupkeys_sf_dir
        ).collect()
    }
    for t in ("events", "documents"):
        assert rows[t]["dup_keys"] > 0, t
        assert rows[t]["replay_keys"] > 0, t
        assert rows[t]["conflict_keys"] > 0, t
        assert rows[t]["excess_rows"] == rows[t]["n_rows"] - rows[t]["n_keys"]
    # and all-zero on the clean fixture: the certificate is not vacuous
    for r in (
        entry_mod.queries()["pk_violation_report"](spark, SRC).collect()
    ):
        assert r["dup_keys"] == r["conflict_keys"] == r["null_key_rows"] == 0


def test_assert_pk_unique_is_the_contract_boundary(spark, dupkeys_sf_dir):
    """Opt-in ingest assert: raises with counts + key sample on a
    violating corpus, passes rows through untouched on a clean one."""
    from real_time_mobility_heatmap_spark.sources.tables import (
        PKViolationError,
        assert_pk_unique,
        load_table,
    )

    ev_bad = load_table(spark, dupkeys_sf_dir, "events")
    with pytest.raises(PKViolationError, match="events.event_id"):
        assert_pk_unique(ev_bad, "event_id", "events")
    ev_ok = load_table(spark, SRC, "events")
    assert assert_pk_unique(ev_ok, "event_id", "events") is ev_ok


def test_dupkeys_remediation_restores_full_agreement(
    spark, dupkeys_sf_dir, tmp_path
):
    """The contract's remediation path must actually work: restoring PK
    uniqueness on the violating corpus (one deterministic survivor per
    key — content-hash-ordered, computable identically in any engine)
    returns the SENSITIVE queries to engine/oracle agreement, proving
    the divergence is entirely the PK violation and not a latent bug
    the axis uncovered."""
    import shutil

    d = tmp_path / "deduped"
    d.mkdir()
    src = Path(dupkeys_sf_dir)
    con = duckdb.connect()
    for t in TABLES:
        if t in ("events", "documents"):
            continue
        shutil.copy(src / f"{t}.parquet", d / f"{t}.parquet")
    con.sql(
        f"COPY (SELECT event_id, ts, user_id, event_type, value, props"
        f" FROM (SELECT *, row_number() OVER ("
        f"   PARTITION BY event_id ORDER BY md5(concat_ws(':', ts,"
        f"   user_id, event_type, value, props))) AS _rn"
        f" FROM '{src}/events.parquet') WHERE _rn = 1)"
        f" TO '{d}/events.parquet' (FORMAT PARQUET)"
    )
    con.sql(
        f"COPY (SELECT doc_id, text, lang, source, n_chars"
        f" FROM (SELECT *, row_number() OVER ("
        f"   PARTITION BY doc_id ORDER BY md5(concat_ws(':', text,"
        f"   lang, source))) AS _rn"
        f" FROM '{src}/documents.parquet') WHERE _rn = 1)"
        f" TO '{d}/documents.parquet' (FORMAT PARQUET)"
    )
    # representative sensitives from each first-contact class: argmax
    # tie winner, grouped-vs-per-row signature, adjacent-row fold
    for name in ("latest_maxby", "minhash_signatures", "stay_points"):
        _assert_matches_oracle(spark, str(d), name)


@pytest.fixture(scope="module")
def null_in_dup_pair_sf_dir(tmp_path_factory) -> str:
    """Events with a conflict pair equal on (event_id, ts, user_id)
    where one side's event_type is NULL — the composition shape
    (--dupkeys x --nulls) the r14 five-axis sweep caught splitting
    streaming_exact_dedup's survivor between Spark's NULLS-FIRST
    struct ordering and DuckDB's NULLS-LAST ORDER BY."""
    return _events_rewrite_dir(
        tmp_path_factory,
        "null-dup",
        "SELECT event_id, ts, user_id, event_type, value, props FROM '{src}'"
        " UNION ALL"
        " SELECT event_id, ts, user_id, NULL, value + 1, props"
        " FROM '{src}' WHERE event_id % 50 = 3",
    )


def test_streaming_exact_dedup_deterministic_on_null_in_dup_pair(
    spark, null_in_dup_pair_sf_dir
):
    """The PK contract's remediation operator must stay deterministic
    PRECISELY on violating input: engine/oracle agree, and the survivor
    among a (ts, user_id)-tied pair is the NON-NULL event_type row
    (explicit NULLS-LAST in the tiebreak on both sides)."""
    _assert_matches_oracle(spark, null_in_dup_pair_sf_dir, "streaming_exact_dedup")
    qs = entry_mod.queries()
    sdf = qs["streaming_exact_dedup"](spark, null_in_dup_pair_sf_dir).toPandas()
    dup_slice = sdf[sdf["event_id"] % 50 == 3]
    assert len(dup_slice) > 0
    assert dup_slice["event_type"].notna().all()


def test_dupkeys_detector_is_not_vacuous(spark, dupkeys_sf_dir):
    """A key-identity reader must genuinely diverge on this corpus, or
    the insensitive-subset net proves nothing: minhash_signatures groups
    shingles by doc_id (one signature per distinct doc_id) while its
    oracle emits per source row, so ANY duplicated doc_id splits the
    row counts — the guaranteed-divergence shape of the contract."""
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    sdf = qs["minhash_signatures"](spark, dupkeys_sf_dir).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" '{dupkeys_sf_dir}/{t}.parquet'"
        )
    odf = con.sql(oracles["minhash_signatures"]).df()
    assert len(sdf) < len(odf)  # grouped vs per-row under dup doc_ids


# r15: the XVAL axis — extreme finite doubles (±DBL_MAX, subnormals,
# -0.0, in-contract 1e8 cents) on events.value, a just-under-$1e5
# boundary slice on money columns. First contact (full registry,
# sf0.001, seed 0) found and fixed three REAL silent splits on values
# both engines handle: Spark's round() normalizes -0.0 while DuckDB
# preserves it (normalize), double->VARCHAR rendering diverges outside
# the plain-decimal band (table_profile min/max, now typed numeric for
# the double column), and the first-contact out-of-contract magnitude
# slices measured exactly the inexactness the money/rounding docstrings
# predict at their documented bounds. The surviving sensitive set is
# the MEASURE-DOMAIN wire contract (operators/relational.py
# MEASURE_ABS_MAX): cents/micros consumers under non-finite input split
# on totality (Spark's double->BIGINT cast SATURATES ±Inf to ±Long.MAX
# silently; DuckDB's cast errors) — value_domain_report is the
# oracle-checked certificate, quality_filter the remediation.

XVAL_INSENSITIVE_QUERIES = [
    # full-double-domain consumers of value (no fixed-point recovery)
    "value_percentiles",
    "value_histogram",
    "ewma_speed",
    # money surface at its documented in-domain boundary slice
    "pricing_summary",
    "sql_pricing_summary",
    # the r15 fixes under the axis that caught them
    "normalize",
    "mad_outliers",  # round0 canonicalization (caught at fresh seed 1502)
    "table_profile",
    "table_profile_accuracy",
    "bloom_semijoin_stats",
    # NOT salted_cell_counts: its plain double sum is ORDER-sensitive
    # under ±DBL_MAX collisions (+Inf + -Inf = NaN depends on partition
    # order — nondeterministic even within one engine), so it sits in
    # the documented measure-domain sensitive set
]


@pytest.fixture(scope="module")
def xval_sf_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("sf-perturbed-xval")
    build_perturbed(SRC, str(d), seed=0, xval=True)
    con = duckdb.connect()
    n = con.sql(
        f"SELECT count(*) FILTER (WHERE isinf(value) OR abs(value) > 1e300),"
        f" count(*) FILTER (WHERE abs(value) < 1e-300 AND value <> 0),"
        f" count(*) FILTER (WHERE value = 0 AND signbit(value))"
        f" FROM '{d}/events.parquet'"
    ).fetchone()
    assert all(x > 0 for x in n), f"--xval slices missing: {n}"
    return str(d)


@pytest.mark.parametrize("name", XVAL_INSENSITIVE_QUERIES)
def test_xval_insensitive_queries_match_oracle(spark, xval_sf_dir, name):
    _assert_matches_oracle(spark, xval_sf_dir, name)


def test_value_domain_report_certifies_the_measure_surface(spark, xval_sf_dir):
    """The measure-domain contract's executable edge: non-zero on every
    out-of-domain shape the axis manufactures (events.value), zero on
    the in-domain money slice (lineitem), engine/oracle agreed on the
    violating corpus, and all-zero on the clean fixture."""
    _assert_matches_oracle(spark, xval_sf_dir, "value_domain_report")
    rows = {
        r["measure"]: r.asDict()
        for r in entry_mod.queries()["value_domain_report"](
            spark, xval_sf_dir
        ).collect()
    }
    ev = rows["events.value"]
    assert ev["nonfinite"] > 0 or ev["over_grid"] > 0
    assert ev["subnormal"] > 0
    assert ev["neg_zero"] > 0
    li = rows["lineitem.l_extendedprice"]
    assert (
        li["nonfinite"] == li["over_grid"] == li["subnormal"]
        == li["neg_zero"] == 0
    )
    for r in entry_mod.queries()["value_domain_report"](spark, SRC).collect():
        assert (
            r["nonfinite"] == r["over_grid"] == r["subnormal"]
            == r["neg_zero"] == 0
        ), r["measure"]


def test_assert_measure_domain_is_the_contract_boundary(spark, xval_sf_dir):
    """r16 (r15 verdict #7): the measure-domain contract's opt-in
    enforcement hook, the value analog of ``assert_pk_unique`` — raises
    with per-shape counts + a value sample on a violating corpus,
    passes rows through untouched on a clean one."""
    from real_time_mobility_heatmap_spark.sources.tables import (
        MeasureDomainError,
        assert_measure_domain,
        load_table,
    )

    ev_bad = load_table(spark, xval_sf_dir, "events")
    with pytest.raises(MeasureDomainError, match="events.value"):
        assert_measure_domain(ev_bad, "value", "events")
    ev_ok = load_table(spark, SRC, "events")
    assert assert_measure_domain(ev_ok, "value", "events") is ev_ok


def test_pk1_oracle_rewrites_join_form_and_rejects_other_forms():
    """r16 advice: pk1_oracle used to rewrite only `FROM documents`, so a
    composed oracle JOINing documents would silently read the
    UNCOLLAPSED table and diverge from collapse_doc_identity. Both
    reference forms must rewrite; any other surviving bare `documents`
    token must fail at build time, not at compare time."""
    from real_time_mobility_heatmap_spark.operators.dedup import pk1_oracle

    out = pk1_oracle("SELECT * FROM documents JOIN documents d ON 1=1")
    assert "JOIN documents_pk1 d" in out and "FROM documents_pk1" in out
    # the only bare `documents` read left is the CTE's own definition
    assert out.count("FROM documents ") + out.count("FROM documents\n") <= 1

    import pytest

    with pytest.raises(AssertionError, match="unrewritten"):
        pk1_oracle("SELECT * FROM documents, documents d2")
    with pytest.raises(AssertionError):
        pk1_oracle("WITH x AS (SELECT 1) SELECT * FROM x, documents")

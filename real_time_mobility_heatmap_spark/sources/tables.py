"""Batch table sources over the driver-generated parquet fixtures.

The engine's native source is a Kafka JSON stream with a fixed schema
(reference heatmap_stream.py:79-93); for batch/correctness work the same
operators run over parquet tables (TESTDATA.md). ``pings_from_events``
adapts the fixture ``events`` table onto the reference's GPS-ping schema
(FIXTURES.md §C): user_id -> vehicleId, event_type -> provider,
value -> speedKmh, and deterministic lat/lon derivation that is exact,
SQL-expressible column math in any engine.

PRIMARY-KEY INGESTION CONTRACT (r14, codified by the --dupkeys first
contact): ``events.event_id`` and ``documents.doc_id`` are UNIQUE row
identities as a PRECONDITION of the batch query surface. The contract
is established where the engine ingests: the producer assigns ids
(producers/mobility_producer.py) and the streaming stores upsert BY KEY
(streaming/sinks.py — a redelivered key can never persist twice); the
remediation operators for foreign data that violates it are the exact-
dedup family (operators/dedup.py ``exact_dedup`` — content-keyed — and
``dedup_keep_best``). Under violation the engine stays TOTAL (no
crashes; the r14 sweep verified all 223 queries complete on a
PK-violating corpus) and the symmetric/per-row surface keeps its
engine/oracle agreement, but the ~37 queries whose semantics READ the
key as an identity — (eventTs, event_id) argmax/ordering tiebreaks,
doc_id-grouped fingerprint/pair pipelines, doc_id equi-join
multiplicities — return engine-arbitrary winners among conflicting
duplicates, exactly as any SQL engine's results are unspecified under
a violated uniqueness constraint it was told to assume. The sensitive
set and the sweep record live in SCALE.md §r14; the pinned differential
net is tests/test_perturbed_corpus.py (DUPKEYS axis).

REMEDIATION-FAMILY EXCEPTION (r16, r15 verdict #3): operators whose JOB
is cleaning foreign/dirty corpora — ``incremental_dedup``, the winnow
family, the decontaminate family, and the cluster/keep/split tier
(``dedup_clusters`` / ``dedup_keep_best`` — the remediation operators
this contract itself names — and ``leakage_safe_split``) — are NOT
members of the sensitive set: they pre-collapse doc_id identity at entry
(operators/dedup.py ``collapse_doc_identity``, oracle mirror
``pk1_oracle``), so they stay deterministic and engine/oracle-agreed on
exactly the PK-violating input they exist to handle (pinned on a
conflicting-doc_id corpus in tests/test_perturbed_corpus.py).

The contract's EXECUTABLE EDGE (r15): ``assert_pk_unique`` below is the
opt-in ingest-boundary enforcement (``SPARK_GRAFT_ENFORCE_PK=1`` at the
fixture entrypoints), and ``operators/relational.pk_violation_report``
is the oracle-checked audit that counts violations by shape (replay /
conflict / null-key) — all-zero certifies a corpus for the full query
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# SQL fragments for the deterministic geo derivation — kept as single
# source of truth so the DuckDB oracles embed the *same* expressions.
# The explicit DOUBLE casts force IEEE double arithmetic in both engines
# (DuckDB would otherwise parse `100.0` as DECIMAL and compute exactly,
# which drifts from Spark's double math in the last ulp).
LAT_SQL = "CAST(42.0 AS DOUBLE) + (user_id % 100) / CAST(100 AS DOUBLE)"
LON_SQL = "CAST(-71.0 AS DOUBLE) - (event_id % 100) / CAST(100 AS DOUBLE)"


def spread(df: DataFrame) -> DataFrame:
    """Ensure at least one input partition per core.

    The fixture tables are single-file / single-row-group parquet, so Spark
    scans them as ONE partition and every expression-heavy pipeline
    (regexp, md5, pandas batches) runs single-threaded until the first
    shuffle. A real deployment reads many splits and never needs this; here
    a tiny round-robin repartition stands in for that layout. No-op when
    the scan already has enough splits.

    Inputs that already contain a shuffle-producing node (aggregate /
    join / window / repartition — e.g. the remediation family's
    ``collapse_doc_identity`` output) are returned untouched WITHOUT the
    partition-count probe: their parallelism comes from
    ``spark.sql.shuffle.partitions``/AQE, the probe itself
    (``df.rdd.getNumPartitions`` on an AQE plan) forces plan
    finalization and can EXECUTE the upstream shuffle just to count
    partitions (measured ~0.3 s per call at sf0.1), and the extra
    round-robin it inserted destroyed the exchange reuse the downstream
    doc_id-partitioned stages get for free (r16 profile: the collapse
    regression was mostly this, not the aggregate).

    Detection walks the analyzed logical plan's NODE CLASSES (r16 advice:
    the earlier rendered-string substring match false-positived on any
    literal/alias containing "Join" etc., and wrongly counted Generate —
    explode — which produces no shuffle, so an explode-only lineage would
    have silently run at raw-scan parallelism).
    """
    if _has_shuffle_node(df):
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# Logical-plan node classes whose physical translation introduces an
# exchange (or an explicit partitioning the caller chose): downstream
# parallelism then comes from spark.sql.shuffle.partitions / AQE, so
# spread()'s round-robin would only destroy it.
_SHUFFLE_NODE_CLASSES = frozenset(
    {
        "Aggregate",
        "Join",
        "Window",
        "Repartition",  # repartition(n) / coalesce
        "RepartitionByExpression",  # repartition(col), DISTRIBUTE BY
        "RebalancePartitions",
        "Distinct",
        "Deduplicate",  # dropDuplicates
    }
)


def _has_shuffle_node(df: DataFrame) -> bool:
    """True when the DataFrame's analyzed logical plan contains a node
    class from ``_SHUFFLE_NODE_CLASSES`` anywhere in the tree (walked via
    py4j ``children()``; conservative False on any introspection error,
    which at worst re-adds spread()'s harmless repartition)."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.getClass().getSimpleName() in _SHUFFLE_NODE_CLASSES:
                return True
            children = node.children()
            for i in range(children.length()):
                stack.append(children.apply(i))
    except Exception:
        return False
    return False


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS). How Spark reads
    that changed across versions, so this normalizes both shapes to the
    same session-zoned microsecond TimestampType column:

    - Spark <= 4.0 rejects nanos outright unless
      ``spark.sql.legacy.parquet.nanosAsLong`` is set, in which case the
      column arrives as nanos-since-epoch LongType -> convert with
      ``timestamp_micros(ts div 1000)``.
    - Spark 4.1+ reads TIMESTAMP(NANOS) natively as TimestampNTZType,
      truncated to microseconds (the legacy conf is ignored) -> cast NTZ
      to TimestampType; under the engine's pinned UTC session zone this
      yields the identical instant the legacy path produced.

    The fixture values carry no sub-microsecond component, so both
    conversions are lossless and match what DuckDB sees.
    """
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":  # legacy nanos-as-long read (Spark <= 4.0)
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(path)


# lossless text-format options: pin the timestamp format to microsecond
# precision (the defaults truncate to millis on CSV write). ORC is
# columnar/typed like parquet — no options needed, included so the
# source matrix covers both Spark-native columnar formats.
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
TEXT_FORMAT_OPTS = {
    "csv": {"header": "true", "timestampFormat": _TS_FMT},
    "json": {"timestampFormat": _TS_FMT},
    "orc": {},
}


def write_table_as(df: DataFrame, path: str, fmt: str) -> None:
    """Write a table in a supported interchange format (csv/json/orc)
    losslessly enough to round-trip through ``read_table_as``."""
    df.write.mode("overwrite").options(**TEXT_FORMAT_OPTS[fmt]).format(fmt).save(path)


def read_table_as(spark: SparkSession, path: str, fmt: str, schema) -> DataFrame:
    """Schema-on-read over csv/json/orc: the explicit schema (no
    inference pass over the data) plus pinned timestamp format make text
    sources exact, not best-effort; orc carries its own types."""
    return (
        spark.read.schema(schema).options(**TEXT_FORMAT_OPTS[fmt]).format(fmt).load(path)
    )


ROUNDTRIP_FORMATS = ("csv", "json", "orc")
# 60-bit row hash folded mod 1e9 before summing: sums stay far inside
# int64 at any fixture scale, and int sums are associative/exact in both
# engines (no float accumulation-order hazard).
_RT_HASH_MOD = 1_000_000_000


# event_type enters the checksum through an explicit NULL sentinel:
# Spark's concat() is NULL-poisoning (any NULL argument -> NULL row
# hash, silently dropped from the sum) while DuckDB's concat() skips
# NULLs — the r12 NULL-provider perturbed sweep caught the two engines
# summing different row sets. coalesce to a sentinel no real enum value
# contains keeps every row in the checksum in both engines.
_ET = "coalesce(event_type, '<null>')"


def _row_checksum_spark() -> str:
    return (
        "CAST(conv(substr(md5(concat(event_id, '|', unix_micros(ts), '|',"
        f" user_id, '|', {_ET})), 1, 15), 16, 10) AS BIGINT)"
        f" % {_RT_HASH_MOD}"
    )


def _row_checksum_duck() -> str:
    return (
        "CAST('0x' || substr(md5(concat(event_id, '|', epoch_us(ts), '|',"
        f" user_id, '|', {_ET})), 1, 15) AS BIGINT)"
        f" % {_RT_HASH_MOD}"
    )


def source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write events through every interchange format and summarize what
    came back — the driver-checkable form of the source matrix: the
    oracle computes the same summary straight off the parquet view, so a
    row lost, a column shifted, or a timestamp truncated by any format's
    writer/reader shows up as a count/checksum mismatch. The checksum
    hashes (event_id, micros(ts), user_id, event_type) per row, folded
    mod 1e9 and summed as exact int64.

    The scratch location is a local temp dir — correct for local[N]
    (this harness); on a multi-node cluster the round-trip target must
    be shared storage (object store / DFS), same code path otherwise.
    """
    import os
    import tempfile
    from functools import reduce

    ev = load_table(spark, sf_dir, "events")
    # fixed per-sf path + overwrite mode: repeated runs rewrite in place
    # instead of accumulating throwaway temp dirs
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    base = os.path.join(tempfile.gettempdir(), f"source_roundtrip_{tag}")
    # the three format writes are independent jobs; overlapping them from
    # a small thread pool lets each job's tail back-fill the others'
    # idle cores (guide §2.6) instead of running strictly serially
    from concurrent.futures import ThreadPoolExecutor

    def _write(fmt: str) -> None:
        write_table_as(ev, f"{base}/{fmt}", fmt)

    with ThreadPoolExecutor(max_workers=len(ROUNDTRIP_FORMATS)) as pool:
        list(pool.map(_write, ROUNDTRIP_FORMATS))
    outs = []
    for fmt in ROUNDTRIP_FORMATS:
        path = f"{base}/{fmt}"
        back = read_table_as(spark, path, fmt, ev.schema)
        # per-format global aggregate, not union-then-groupBy: emits one
        # row per format even when the source is EMPTY (matching the
        # oracle's static format list — r10 empty-input sweep) and drops
        # the union shuffle
        outs.append(
            back.agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("event_id").alias("sum_event_id"),
                F.countDistinct("user_id").alias("n_users"),
                F.sum(F.expr(_row_checksum_spark())).alias("row_checksum"),
            ).select(
                F.lit(fmt).alias("fmt"),
                "n_rows",
                "sum_event_id",
                "n_users",
                "row_checksum",
            )
        )
    return reduce(DataFrame.unionByName, outs)


def source_roundtrip_oracle() -> str:
    fmt_values = ", ".join(f"('{f}')" for f in ROUNDTRIP_FORMATS)
    return f"""
        WITH per AS (
            SELECT count(*) AS n_rows,
                   CAST(sum(event_id) AS BIGINT) AS sum_event_id,
                   count(DISTINCT user_id) AS n_users,
                   CAST(sum({_row_checksum_duck()}) AS BIGINT) AS row_checksum
            FROM events
        )
        SELECT fmt, n_rows, sum_event_id, n_users, row_checksum
        FROM (VALUES {fmt_values}) AS f(fmt) CROSS JOIN per
    """


class PKViolationError(ValueError):
    """A table violated the PK-uniqueness ingestion contract."""


def assert_pk_unique(df: DataFrame, key: str, table: str) -> DataFrame:
    """Boundary assert for the PK-uniqueness ingestion contract: raise
    ``PKViolationError`` if ``key`` is NULL anywhere or duplicated, else
    return ``df`` unchanged.

    This is the contract's enforcement hook for FOREIGN data entering the
    batch surface (the engine's own ingest establishes uniqueness by
    construction — producer-assigned ids, key-upserting stores). It is
    opt-in (``SPARK_GRAFT_ENFORCE_PK=1`` at the fixture entrypoints;
    callers embedding the engine invoke it directly) because validation
    costs one aggregate pass per table and the query surface must stay
    TOTAL on violating input for the remediation operators
    (``exact_dedup`` / ``dedup_keep_best``) and the audit query
    (``pk_violation_report``) to run at all.

    Scale shape: a single key-only groupBy (map-side combinable, shuffle
    carries distinct keys) with a count; the 5-key sample is fetched only
    on the failure path.
    """
    bad = (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .where((F.col("n") > 1) | F.col(key).isNull())
    )
    n_bad = bad.count()
    if n_bad:
        sample = [r[key] for r in bad.select(key).limit(5).collect()]
        raise PKViolationError(
            f"{table}.{key} violates the PK-uniqueness ingestion contract: "
            f"{n_bad} duplicated-or-NULL key(s), e.g. {sample}. Run "
            f"pk_violation_report for the violation-shape breakdown; "
            f"remediate with exact_dedup (replay) / dedup_keep_best "
            f"(conflict) before key-identity queries."
        )
    return df


def _enforce_pk_enabled() -> bool:
    import os

    return os.getenv("SPARK_GRAFT_ENFORCE_PK", "") not in ("", "0", "false")


class MeasureDomainError(ValueError):
    """A measure column violated the measure-domain wire contract."""


def assert_measure_domain(df: DataFrame, col: str, table: str) -> DataFrame:
    """Boundary assert for the MEASURE-DOMAIN wire contract (r15 --xval
    axis; the value analog of ``assert_pk_unique``, r15 verdict #7):
    raise ``MeasureDomainError`` if ``col`` carries any NaN/±Inf,
    |x| > 1e13 (beyond 2-decimal cents representability), subnormal, or
    -0.0 value — the four shapes ``relational.value_domain_report``
    audits and whose all-zero report certifies a corpus for the
    cents/micros query surface. Returns ``df`` unchanged when clean.

    Opt-in (``SPARK_GRAFT_ENFORCE_DOMAIN=1`` at the fixture entrypoints;
    embedders call it directly) for the same reason as the PK hook: one
    aggregate pass per table, and the surface must stay TOTAL on
    violating input so the audit query and the ``quality_filter``-style
    remediation can run.

    Scale shape: one fused map-side-combinable aggregate (four
    conditional sums), no shuffle of row data; the 5-value sample is
    fetched only on the failure path.
    """
    x = F.col(col)
    is_bad = (
        F.isnan(x)
        | (F.abs(x) == float("inf"))
        | (F.abs(x) > 1e13)  # MEASURE_ABS_MAX (operators/relational.py)
        | ((F.abs(x) < 2.3e-308) & (x != 0))
        # -0.0: sign via the string cast — ANSI Spark has no signbit()
        | ((x == 0) & x.cast("string").startswith("-"))
    )
    counts = df.agg(
        F.sum(F.isnan(x).cast("long")).alias("nonfinite_nan"),
        F.sum((F.abs(x) == float("inf")).cast("long")).alias("nonfinite_inf"),
        F.sum(
            (~F.isnan(x) & (F.abs(x) != float("inf")) & (F.abs(x) > 1e13))
            .cast("long")
        ).alias("over_grid"),
        F.sum(((F.abs(x) < 2.3e-308) & (x != 0) & ~F.isnan(x)).cast("long")).alias(
            "subnormal"
        ),
        F.sum(((x == 0) & x.cast("string").startswith("-")).cast("long")).alias(
            "neg_zero"
        ),
    ).collect()[0]
    n_bad = sum(v or 0 for v in counts.asDict().values())
    if n_bad:
        sample = [
            r[col] for r in df.where(is_bad).select(col).limit(5).collect()
        ]
        raise MeasureDomainError(
            f"{table}.{col} violates the measure-domain wire contract: "
            f"{dict(counts.asDict())} (total {n_bad}), e.g. {sample}. Run "
            f"value_domain_report for the per-measure breakdown; remediate "
            f"with quality_filter-style ingest filtering before the "
            f"cents/micros query surface."
        )
    return df


def _enforce_domain_enabled() -> bool:
    import os

    return os.getenv("SPARK_GRAFT_ENFORCE_DOMAIN", "") not in (
        "",
        "0",
        "false",
    )


def pings_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> GPS-ping stream shape (reference schema heatmap_stream.py:52-61).

    provider/vehicleId/eventTs/lat/lon/speedKmh — the engine's canonical
    input relation for every mobility operator.
    """
    # no spread() here: the ping pipeline is arithmetic-light, and a
    # repartition shuffle of the raw rows costs more than the parallelism
    # buys (measured at sf0.1); the heavy text/vector operators do spread.
    ev = load_table(spark, sf_dir, "events")
    if _enforce_pk_enabled():
        ev = assert_pk_unique(ev, "event_id", "events")
    if _enforce_domain_enabled():
        ev = assert_measure_domain(ev, "value", "events")
    return ev.select(
        F.col("event_type").alias("provider"),
        F.col("user_id").cast("string").alias("vehicleId"),
        F.col("ts").alias("eventTs"),
        F.expr(LAT_SQL).alias("lat"),
        F.expr(LON_SQL).alias("lon"),
        F.col("value").alias("speedKmh"),
        F.col("event_id"),
        F.col("props"),
    )


# DuckDB-side equivalent of ``pings_from_events`` — the FROM clause every
# oracle builds on. Must stay in lockstep with the Spark projection above.
PINGS_ORACLE_SQL = f"""
    SELECT
        event_type AS provider,
        CAST(user_id AS VARCHAR) AS vehicleId,
        ts AS eventTs,
        {LAT_SQL} AS lat,
        {LON_SQL} AS lon,
        value AS speedKmh,
        event_id,
        props
    FROM events
"""

"""As-of (latest-before) join — the temporal generalization of the
reference's argmax pattern (SURVEY.md §2.3: J1's semantics, "newest row per
key, tie-tolerant", IS the as-of pattern).

Spark has no ASOF JOIN operator; the scalable composition is the
merge-union trick:

  1. tag both sides and union them on the shared (key, ts) spine;
  2. one window pass per key ordered by (ts, side): ``last(right-cols,
     ignoreNulls)`` carries the most recent right row forward;
  3. keep left rows, now annotated with their as-of match.

One shuffle on the key — same cost as a plain equi-join — versus the naive
range-join (key equality + ts inequality) which degenerates to a per-key
cross product. Ordering puts the right side first at equal timestamps, so
matches are inclusive (ts_left >= ts_right), exactly DuckDB's ASOF
semantics — which is the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row: columns of the nearest right row with matching
    key and right.ts <= left.ts (``backward``, the newest-before default)
    or right.ts >= left.ts (``forward``, the earliest-after) — null when
    no such row exists. Both directions are the same one-shuffle
    merge-union plan; only the sort order flips. Matches are inclusive
    at equal timestamps (right ordered before left), matching DuckDB's
    ASOF semantics in both directions.

    The carried columns travel as ONE STRUCT, not per-column fills: the
    struct is never null on a right row even when its fields are, so the
    ``last(ignorenulls)`` skips only left rows — every ``asof_*`` output
    column comes from the SAME matched row, nulls included. Independent
    per-column fills (the original formulation) silently back-filled a
    null field from an OLDER right row — different columns could even
    mix rows — which the r11 null-bearing perturbed sweep caught
    diverging from ASOF row semantics (purchase_value 200.01 from a
    stale purchase vs the true match's NULL).
    """
    l_tagged = left.withColumn("__side", F.lit(1))
    r_tagged = right.select(
        key, ts, *right_cols
    ).withColumn("__side", F.lit(0))

    # align schemas: left gets a null right-struct; right gets null
    # left-extras and packs its carried columns into the struct
    null_struct = F.lit(None).cast(
        "struct<" + ", ".join(
            f"{c}: {right.schema[c].dataType.simpleString()}" for c in right_cols
        ) + ">"
    )
    l_aligned = l_tagged.select("*", null_struct.alias("__r"))
    r_aligned = r_tagged.select(
        key,
        ts,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in (key, ts)],
        F.col("__side"),
        F.struct(*right_cols).alias("__r"),
    )
    unioned = l_aligned.unionByName(r_aligned)

    ts_order = F.col(ts).asc() if direction == "backward" else F.col(ts).desc()
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__m")
    )
    out_cols = [c for c in left.columns] + [
        F.col(f"__m.{c}").alias(f"asof_{c}") for c in right_cols
    ]
    return filled.filter(F.col("__side") == 1).select(*out_cols)


def clicks_with_last_purchase(events: DataFrame) -> DataFrame:
    """For every click event: the user's most recent purchase at-or-before
    it (classic as-of use: enrich a fact stream with the latest state)."""
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_event_id"), F.col("value").alias("purchase_value")
    )
    out = asof_join(
        clicks, purchases, key="user_id", ts="ts",
        right_cols=["purchase_event_id", "purchase_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("asof_purchase_event_id").alias("purchase_event_id"),
        F.col("asof_purchase_value").alias("purchase_value"),
    )


CLICKS_LAST_PURCHASE_ORACLE = """
    SELECT c.event_id,
           c.user_id,
           c.ts AS click_ts,
           p.event_id AS purchase_event_id,
           p.value AS purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def clicks_with_next_purchase(events: DataFrame) -> DataFrame:
    """FORWARD as-of: for every click, the user's earliest purchase
    at-or-after it (attribution direction: which purchase did this click
    lead to?)."""
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_event_id")
    )
    out = asof_join(
        clicks, purchases, key="user_id", ts="ts",
        right_cols=["purchase_event_id"], direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.col("asof_purchase_event_id").alias("next_purchase_event_id"),
    )


CLICKS_NEXT_PURCHASE_ORACLE = """
    SELECT c.event_id,
           c.user_id,
           c.ts AS click_ts,
           p.event_id AS next_purchase_event_id
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts <= p.ts
"""

TOLERANCE_DAYS = 1


def clicks_with_recent_purchase(events: DataFrame) -> DataFrame:
    """Backward as-of with a TOLERANCE: the newest purchase before the
    click counts only if it happened within the last day — otherwise the
    match is nulled (pandas merge_asof(tolerance=...) semantics). The
    matched timestamp rides along as a carried column so the tolerance
    is a plain post-projection, not a different join."""
    clicks = events.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts", F.col("event_id").alias("purchase_event_id"))
        .withColumn("purchase_ts", F.col("ts"))
    )
    out = asof_join(
        clicks, purchases, key="user_id", ts="ts",
        right_cols=["purchase_event_id", "purchase_ts"],
    )
    fresh = F.col("asof_purchase_ts") >= F.col("ts") - F.expr(f"INTERVAL {TOLERANCE_DAYS} DAYS")
    return out.select(
        "event_id",
        "user_id",
        F.col("ts").alias("click_ts"),
        F.when(fresh, F.col("asof_purchase_event_id")).alias("purchase_event_id"),
        F.when(fresh, F.col("asof_purchase_ts")).alias("purchase_ts"),
    )


CLICKS_RECENT_PURCHASE_ORACLE = f"""
    SELECT c.event_id,
           c.user_id,
           c.ts AS click_ts,
           CASE WHEN p.ts >= c.ts - INTERVAL {TOLERANCE_DAYS} DAY THEN p.event_id END
               AS purchase_event_id,
           CASE WHEN p.ts >= c.ts - INTERVAL {TOLERANCE_DAYS} DAY THEN p.ts END
               AS purchase_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts >= p.ts
"""


def q_clicks_with_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clicks_with_last_purchase(load_table(spark, sf_dir, "events"))


def q_clicks_with_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clicks_with_next_purchase(load_table(spark, sf_dir, "events"))


def q_clicks_with_recent_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    return clicks_with_recent_purchase(load_table(spark, sf_dir, "events"))

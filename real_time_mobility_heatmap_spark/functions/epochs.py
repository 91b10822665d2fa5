"""Floor-exact epoch seconds — the cross-engine time base.

r15 --xts first contact: every Spark-side ``unix_timestamp(ts)`` site
silently disagreed with its oracle twin ``CAST(floor(epoch(ts)) AS
BIGINT)`` on PRE-EPOCH timestamps carrying fractional seconds — Spark's
unix_timestamp truncates toward zero (epoch -2992532032.75 → -2992532032)
while floor goes down (→ -2992532033). In-domain fixtures never reach
1970, so the split stayed invisible until the axis manufactured
pre-epoch rows; it then surfaced directly (stay_points ±1 s,
ping_gap_report sub-second stat drift) and amplified through bucket
math into full bucket-width shifts (hierarchical_rollups ±60 s).

Convention: FLOOR, the time-bucketing convention ``window()`` and
DuckDB's time_bucket/floor(epoch) already use — so the engine is also
self-consistent between window()-based and arithmetic-based bucketing.

The fragment is integer-exact over the full 1–9999 domain:
``unix_micros`` is exact int64 (±2.5e17 « 2^63), and the floor
correction is pure int math — no double ever touches the value (a
``floor(us / 1e6)`` double path would lose ulps beyond 2^53).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_s_sql(col: str) -> str:
    """Spark-SQL fragment: floor-exact epoch seconds of timestamp ``col``
    (identical to the oracles' ``CAST(floor(epoch(col)) AS BIGINT)``)."""
    um = f"unix_micros({col})"
    return (
        f"({um} div 1000000 - (CASE WHEN {um} % 1000000 < 0"
        f" THEN 1 ELSE 0 END))"
    )


def epoch_s(col: str) -> Column:
    return F.expr(epoch_s_sql(col))

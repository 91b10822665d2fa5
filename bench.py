#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries and prints ONE
JSON line {"metric", "value", "unit", "queries", "sf"}.

Data dir from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), CPU count
from $SPARK_GRAFT_CPUS. Each query is forced end-to-end with a noop sink
(full computation, no driver collect). One warm-up of the flagship query
amortizes JVM/codegen startup out of the per-query numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from real_time_mobility_heatmap_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.getenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(Path(sf_dir).name.replace("sf", "") or 0.1)
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry_mod.queries()

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run(qs["mobility_tiles"])  # warm-up

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        timings[name] = round(run(fn), 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()

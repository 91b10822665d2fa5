#!/usr/bin/env python
"""Dump a per-query value hash of every Spark-side registry result.

Cross-TREE differential (r13): when a change is claimed to be
value-identical on a given corpus (e.g. the casefold pre-translate,
which is the identity on ASCII text, or a deterministic argmax tie key
on a tie-free corpus), the honest check is not "oracle still matches"
— the oracle changed in lockstep, so agreement is preserved by
construction — but "the VALUES did not move vs the committed tree".
r12 proved this class of check pays: the rounding conversion was
expected value-stable and the differential found ``lm_score`` sitting
exactly on a native-round boundary.

Run this in two checkouts (working tree + a ``git worktree`` of the
base commit) against the same fixture dir, then diff the JSON:

    python tools/dump_hashes.py /root/testdata/sf0.001 out.json [query ...]

Hash = md5 over the same canonicalization as tools/check_oracles.py
(sorted columns, order-insensitive rows, dtype-strict cells).
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import __spark_entry__ as entry_mod  # noqa: E402
from check_oracles import _canon, spark_to_pandas  # noqa: E402
from real_time_mobility_heatmap_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    only = set(sys.argv[3:])

    qs = entry_mod.queries()
    spark = get_spark("hash-dump")
    out: dict[str, str] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = spark_to_pandas(fn(spark, sf_dir))
        except Exception as e:  # noqa: BLE001 — record, keep dumping
            out[name] = f"ERROR: {e}"
            continue
        canon = _canon(sdf)
        out[name] = (
            hashlib.md5("\n".join(canon).encode()).hexdigest()
            + f" ({len(sdf)} rows)"
        )
    Path(out_path).write_text(json.dumps(out, indent=1, sort_keys=True))
    print(f"{len(out)} hashes -> {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

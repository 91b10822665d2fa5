#!/usr/bin/env python
"""Regenerate the driver-window ordering of ``__spark_entry__.queries()``.

The driver verifies only the FIRST ``WINDOW`` entries of the queries()
dict each round, so the dict is a rotation window (see the queries()
docstring). With ~185 registered queries a full cycle takes ~4 rounds,
and the r9 verdict asked for strict oldest-first rotation to keep any
green row from going stale — this tool makes that mechanical instead of
hand-maintained:

1. parse the current dict body (key -> callable expression, verbatim);
2. compute each query's newest driver-green round from CORRECTNESS_r*;
3. order: (a) queries with NO driver row ever (new), (b) names passed
   on the command line (changed this round — re-verify the round the
   code lands), (c) everything else oldest-green-first (name-tiebreak);
4. rewrite the dict body in place with section comments and the
   end-of-window marker.

Usage::

    python tools/rotate_window.py [--write] [--report] [changed_query ...]

Without ``--write`` it prints the planned 50-entry window and exits.
After --write, run ``tools/check_oracles.py`` on the window head —
the tool reorders, it does not verify. ``--report`` prints the dwell
distribution (rounds since each entry's newest driver-green row).

MAX-DWELL POLICY (codified r12, per the r11 verdict): with ~223
registered entries and a 50-slot driver window, the floor on worst-case
dwell is ceil(N/50) ≈ 5 rounds at N≈225 even under perfect oldest-first
rotation with zero new or changed queries; any round that changes K
queries (which take priority slots — a changed query MUST be driver-
re-verified the round its code lands) pushes the tail out by K more.
The policy is therefore:

1. ordering is strictly new -> changed -> oldest-green-first (this
   tool; hand-editing the dict order is a policy violation);
2. the accepted dwell bound is ceil(N/50) + 1 rounds; ``--report``
   flags entries beyond it;
3. the COMPENSATING CONTROL for entries waiting in the tail is the
   standing per-round full-registry local sweep (tools/check_oracles.py
   at sf0.01 plus a fresh-seed perturbed-corpus sweep, seed = round
   number — recorded per round in SCALE.md). The driver row is the
   hard signal; the sweeps bound the risk while an entry waits.

Registry pruning (the alternative the verdict offered) is deliberately
NOT taken: every variant pair in the registry pins a distinct plan
shape (e.g. set-ops vs flags form, fused vs split profile), and
dropping either would shrink the judged operator surface.
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
ENTRY = REPO / "__spark_entry__.py"
WINDOW = 50


def latest_green() -> dict[str, int]:
    out: dict[str, int] = {}
    for p in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", Path(p).name).group(1))
        try:
            data = json.loads(Path(p).read_text())
        except ValueError:
            continue
        for q, v in data.items():
            if v.get("hash_match") or (v.get("rows_match") and v.get("err") is None):
                out[q] = max(out.get(q, 0), rnd)
    return out


def parse_entries(src: str) -> dict[str, str]:
    m = re.search(r"def queries\(\).*?return \{\n(.*?)\n    \}\n", src, re.S)
    entries: dict[str, str] = {}
    for line in m.group(1).splitlines():
        # allow a trailing "# rN" annotation — the tool's own output
        # carries one per rotated entry, and parse(write(x)) must be x
        mm = re.match(r'\s+"([a-z0-9_]+)":\s*(.+?),\s*(?:#[^"]*)?$', line)
        if mm:
            entries[mm.group(1)] = mm.group(2)
    return entries


def dwell_report(entries: dict[str, str], green: dict[str, int]) -> None:
    """Print rounds-since-green distribution and flag policy breaches."""
    import collections

    rounds = sorted(
        int(re.search(r"r(\d+)", Path(p).name).group(1))
        for p in glob.glob(str(REPO / "CORRECTNESS_r*.json"))
    )
    cur = rounds[-1] if rounds else 0
    bound = -(-len(entries) // WINDOW) + 1  # ceil(N/50) + 1
    ages = collections.Counter()
    breaches = []
    for q in entries:
        age = cur - green[q] if q in green else -1
        ages[age] += 1
        if age > bound:
            breaches.append((age, q))
    print(f"{len(entries)} entries, newest driver round r{cur}, "
          f"dwell bound {bound} rounds (ceil(N/{WINDOW})+1)")
    for age in sorted(ages):
        label = "never-checked" if age < 0 else f"{age} rounds old"
        print(f"  {label}: {ages[age]}")
    if breaches:
        print(f"POLICY BREACH — {len(breaches)} entries beyond the bound "
              "(compensating control: per-round full-registry sweeps):")
        for age, q in sorted(breaches, reverse=True):
            print(f"  {q} ({age} rounds)")
    else:
        print("no entries beyond the dwell bound")


def main() -> None:
    write = "--write" in sys.argv
    changed = [a for a in sys.argv[1:] if not a.startswith("--")]

    src = ENTRY.read_text()
    entries = parse_entries(src)
    green = latest_green()
    if "--report" in sys.argv:
        dwell_report(entries, green)
        return
    unknown = [c for c in changed if c not in entries]
    if unknown:
        sys.exit(f"not registered: {unknown}")

    new = sorted(q for q in entries if q not in green and q not in changed)
    stale = sorted(
        (q for q in entries if q in green and q not in changed),
        key=lambda q: (green[q], q),
    )
    order = new + changed + stale
    window = order[:WINDOW]

    lines = [f"        # ---- driver window (regenerated by tools/rotate_window.py) ----"]
    if new:
        lines.append("        # (0) NEW (never driver-checked):")
        lines += [f'        "{q}": {entries[q]},' for q in new]
    if changed:
        lines.append("        # (1) CHANGED this round (re-verify the round code lands):")
        lines += [f'        "{q}": {entries[q]},' for q in changed]
    lines.append("        # (2) oldest-green-first rotation:")
    in_window = len(new) + len(changed)
    for i, q in enumerate(stale):
        if in_window + i == WINDOW:
            lines.append(
                f"        # ------------- end of driver window ({WINDOW} entries) -------------"
            )
        lines.append(f'        "{q}": {entries[q]},  # r{green[q]}')
    body = "\n".join(lines)

    print(f"{len(entries)} entries; window head ({len(window)}):")
    for q in window:
        tag = "NEW" if q in new else ("CHANGED" if q in changed else f"r{green[q]}")
        print(f"  {q} [{tag}]")
    if not write:
        print("dry run — pass --write to apply")
        return

    pat = re.compile(r"(def queries\(\).*?return \{\n)(.*?)(\n    \}\n)", re.S)
    out = pat.sub(lambda m: m.group(1) + body + m.group(3), src, count=1)
    assert parse_entries(out) == entries, "rewrite must preserve every entry"
    ENTRY.write_text(out)
    print(f"wrote {ENTRY}")


if __name__ == "__main__":
    main()

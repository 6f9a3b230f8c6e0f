#!/usr/bin/env python
"""Suggest the next round's EVIDENCE_PRIORITY prefix.

Reads every CORRECTNESS_r*.json plus the current registry and prints a
candidate 50-slot prefix in priority order:

1. driver-RED rows (err / any mismatch in their LATEST sample) — a
   standing red row is worse than no row;
2. queries never driver-sampled, grouped by their first registry tag so
   the prefix spends its slots across families rather than exhausting
   one; within a group, registration order.

Greens rotate out automatically (they have evidence; never-sampled
don't); 3. with no reds and nothing never-sampled (the steady state
since r8), remaining slots go to the queries with the OLDEST driver
evidence, oldest sample round first — evidence freshness rotation
(VERDICT r8 #5). The output is a STARTING POINT for plans/evidence.py —
curate it (e.g., promote brand-new ops) rather than pasting blindly.

Usage: python scripts/gen_evidence.py [slots]
"""

from __future__ import annotations

import glob
import json
import os
import sys
from collections import OrderedDict

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    slots = int(sys.argv[1]) if len(sys.argv) > 1 else 50

    from ftm_datalake_spark.plans import REGISTRY

    import re

    latest: dict[str, dict] = {}
    last_round: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            for name, row in json.load(fh).items():
                latest[name] = row
                last_round[name] = max(last_round.get(name, 0), rnd)

    def is_red(row: dict) -> bool:
        if row.get("err"):
            return True
        return not (
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        )

    reds = [n for n in REGISTRY if n in latest and is_red(latest[n])]
    never = [n for n in REGISTRY if n not in latest]

    by_family: OrderedDict[str, list[str]] = OrderedDict()
    for name in never:
        tags = REGISTRY[name].tags or ("untagged",)
        by_family.setdefault(tags[0], []).append(name)

    prefix: list[str] = list(reds)
    # round-robin across families so every untested family gets slots
    pools = [list(v) for v in by_family.values()]
    while len(prefix) < slots and any(pools):
        for pool in pools:
            if pool and len(prefix) < slots:
                prefix.append(pool.pop(0))

    # steady state: everything green and sampled — spend the remaining
    # slots on evidence freshness, oldest driver sample first
    if len(prefix) < slots:
        stale = sorted(
            (n for n in REGISTRY if n not in prefix),
            key=lambda n: (last_round.get(n, 0), n),
        )
        prefix.extend(stale[: slots - len(prefix)])

    print(f"# suggested {slots}-slot prefix "
          f"({len(reds)} red, {len(never)} never-sampled available)")
    for name in prefix:
        status = (
            "RED"
            if name in reds
            else (
                f"last driver sample: r{last_round[name]}"
                if name in last_round
                else REGISTRY[name].tags[0]
            )
        )
        print(f'    "{name}",  # {status}')
    overflow = [n for pool in pools for n in pool]
    if overflow:
        print(f"# below the boundary ({len(overflow)} remaining):")
        for name in overflow:
            print(f'    "{name}",')
    return 0


if __name__ == "__main__":
    sys.exit(main())

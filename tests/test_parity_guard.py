"""PARITY.md freshness guard (VERDICT r10 missing #4): the committed
evidence table once claimed '17 never-sampled' against a CORRECTNESS
union that had closed them. This test recomputes the union from the
live CORRECTNESS_r*.json files + the live registry — an INDEPENDENT
implementation of the tally, not a call into the generator — and fails
whenever PARITY.md's machine-readable summary disagrees, i.e. whenever
someone adds a query or a driver round lands without re-running
`python scripts/gen_parity.py`."""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _recompute() -> dict:
    from ftm_datalake_spark.plans import REGISTRY

    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            for name, row in json.load(fh).items():
                if name not in latest or rnd > latest[name][0]:
                    latest[name] = (rnd, row)

    local_ok: set[str] = set()
    for path in sorted(glob.glob(os.path.join(REPO, "VERIFY_LOCAL_r*.json"))):
        with open(path) as fh:
            local_ok.update(json.load(fh).get("verified_ok", []))

    green = red = never = 0
    for name, spec in REGISTRY.items():
        if name not in latest:
            never += 1
            continue
        row = latest[name][1]
        if row.get("err"):
            red += 1
        elif spec.oracle is None:
            green += 1 if row.get("spark_rows") is not None else 0
            red += 0 if row.get("spark_rows") is not None else 1
        elif (
            row.get("rows_match")
            and row.get("schema_match")
            and row.get("hash_match")
        ):
            green += 1
        else:
            red += 1
    return {
        "total": len(REGISTRY),
        "green": green,
        "red": red,
        "never": never,
        "local_ok": len(local_ok & set(REGISTRY)),
    }


def test_parity_md_summary_matches_live_union():
    text = open(os.path.join(REPO, "PARITY.md"), encoding="utf-8").read()
    m = re.search(r"<!-- summary: (\{.*\}) -->", text)
    assert m, (
        "PARITY.md has no machine-readable summary — regenerate with "
        "`python scripts/gen_parity.py`"
    )
    committed = json.loads(m.group(1))
    live = _recompute()
    assert committed == live, (
        f"PARITY.md is stale: committed {committed} != live {live} — "
        "rerun `python scripts/gen_parity.py`"
    )


def test_no_standing_driver_reds():
    """The union invariant the verdicts track: zero latest-sample reds.
    A red here means a driver round flagged a query and no later round
    cleared it — fix the query, don't regenerate the table."""
    live = _recompute()
    assert live["red"] == 0, live

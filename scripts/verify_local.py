#!/usr/bin/env python
"""Full-registry local verification at the driver's correctness scale.

Runs every registry query on Spark AND its DuckDB oracle at sf0.01
(override with SPARK_GRAFT_SF_DIR) under the driver-matching compare
semantics (tests/oracle_utils.compare_query: columns sorted by name,
order-insensitive rows, dtype-kind strict, exact values), then writes
``VERIFY_LOCAL_r{N}.json`` with the queries that passed — the evidence
behind PARITY.md's "sf0.01 local" column.

Usage: python scripts/verify_local.py <round-number> [query ...]
       (no query args = the whole registry)
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> int:
    rnd = int(sys.argv[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    from pyspark.sql import SparkSession

    # Plain session, like the driver's correctness gate. Core count is
    # overridable for the local sweeps (correctness is core-invariant;
    # the determinism suite pins that separately).
    cores = os.environ.get("SPARK_GRAFT_VERIFY_CORES", "8")
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from oracle_utils import compare_query

    from ftm_datalake_spark.plans import REGISTRY

    names = sys.argv[2:] or list(REGISTRY)
    ok: list[str] = []
    fails: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            compare_query(spark, sf_dir, name)
            ok.append(name)
            print(f"{name}: OK ({time.time() - t0:.1f}s)", flush=True)
        except Exception as exc:  # noqa: BLE001 - report and continue
            fails.append(name)
            print(f"{name}: FAIL {str(exc)[:300]}", flush=True)
        # between queries: deterministically drop pinned checkpoint
        # blocks (see session.release_pinned_blocks) so a full-registry
        # sweep doesn't accumulate storage until eviction slows the tail
        from ftm_datalake_spark.session import release_pinned_blocks

        release_pinned_blocks(spark)

    out = os.environ.get("VERIFY_OUT") or os.path.join(
        ROOT, f"VERIFY_LOCAL_r{rnd:02d}.json"
    )
    if not os.path.isabs(out):
        out = os.path.join(ROOT, out)
    payload = {
        "sf": float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0)
        or sf_dir,
        "round": rnd,
        "comparator": (
            "tests/oracle_utils.compare_query (driver-matching: sorted "
            "columns, order-insensitive rows, dtype-kind strict, exact values)"
        ),
        "verified_ok": sorted(ok),
    }
    if fails:
        payload["failed"] = sorted(fails)
    # Merge with an existing same-round artifact (partial reruns).
    if os.path.exists(out):
        with open(out) as f:
            prev = json.load(f)
        payload["verified_ok"] = sorted(
            (set(prev.get("verified_ok", [])) - set(fails)) | set(ok)
        )
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"wrote {out}: {len(payload['verified_ok'])} ok, {len(fails)} failed")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())

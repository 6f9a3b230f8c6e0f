#!/usr/bin/env python
"""Time every registry query at $SPARK_GRAFT_SF_DIR with the noop sink.

One warm run (plan + JIT) then best-of-2 timed runs per query; writes a
JSON dict {name: {"sec": best, "samples": [...]}} plus interleaved host
canaries, so slow queries can be ranked for optimization work
(guide §1: measure first). Not a driver artifact — a working tool.

Usage: python scripts/time_registry.py OUT.json [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    out_path = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from ftm_datalake_spark.session import build_session, release_pinned_blocks

    spark = build_session(
        app_name="time-registry",
        master=f"local[{cpus}]",
        extra_conf={"spark.ui.enabled": "false", "spark.driver.memory": "16g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    from ftm_datalake_spark.plans import REGISTRY

    def canary() -> float:
        start = time.perf_counter()
        (
            spark.range(0, 100_000_000, 1, 32)
            .groupBy((F.col("id") % 4096).alias("k"))
            .agg(F.sum(F.hash("id").cast("long")).alias("s"))
            .write.format("noop").mode("overwrite").save()
        )
        return round(time.perf_counter() - start, 3)

    canary()
    results: dict[str, dict] = {}
    specs = [REGISTRY[n] for n in names] if names else list(REGISTRY.values())
    for i, spec in enumerate(specs):
        spark.sparkContext.setJobDescription(f"time: {spec.name}")
        try:
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples = []
            for _ in range(2):
                start = time.perf_counter()
                spec.builder(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(round(time.perf_counter() - start, 3))
            results[spec.name] = {"sec": min(samples), "samples": samples}
        except Exception as exc:  # noqa: BLE001
            results[spec.name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        # outside the timed region: deterministically drop this query's
        # pinned checkpoint blocks so they never tax the next query
        # (see session.release_pinned_blocks)
        release_pinned_blocks(spark)
        if i % 10 == 9:
            results.setdefault("__canaries__", {"samples": []})["samples"].append(
                canary()
            )
            with open(out_path, "w") as f:
                json.dump(results, f, indent=1)
        print(f"{spec.name}: {results[spec.name]}", flush=True)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()

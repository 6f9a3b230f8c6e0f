#!/usr/bin/env python
"""Capture .explain('formatted') output for registry queries into
plans/r15/<name>_<suffix>.txt (optimization-round evidence).

Usage: python scripts/capture_plans.py <suffix> [query ...]
With no query names, captures every bench=True query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from ftm_datalake_spark.session import build_session

    spark = build_session(
        app_name="plan-capture",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ftm_datalake_spark.plans import REGISTRY

    specs = (
        [REGISTRY[n] for n in names]
        if names
        else [s for s in REGISTRY.values() if s.bench]
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLANS_ROUND", "r15"),
    )
    os.makedirs(out_dir, exist_ok=True)
    for spec in specs:
        df = spec.builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{spec.name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_exchange = plan.count("Exchange")
        n_py = plan.count("EvalPython") + plan.count("MapInArrow") + plan.count(
            "MapInPandas"
        )
        print(f"{spec.name:36s} exchanges={n_exchange:3d} python_nodes={n_py}")
    spark.stop()


if __name__ == "__main__":
    main()

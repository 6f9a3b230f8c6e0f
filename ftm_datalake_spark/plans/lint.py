"""Plan-shape linting: the facts that matter at 100 TB, extracted from
a DataFrame's executed plan. One source of truth for the CLI verb
(`query --lint`), shared with the PLAN_AUDIT generator's counting
rules (scripts/gen_plan_audit.py) and the plan gates in
tests/test_plan_shapes.py.
"""

from __future__ import annotations


from pyspark.sql import DataFrame


def plan_shape(df: DataFrame) -> dict:
    """Static physical-plan shape counts. Shuffle counts are upper
    bounds — AQE collapses reused exchanges at runtime."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        "shuffle_exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcast_exchanges": plan.count("BroadcastExchange"),
        "single_partition_exchanges": plan.count("Exchange SinglePartition"),
        "cartesian_products": plan.count("CartesianProduct"),
        "broadcast_nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        # no codegen-span count: under AQE the pre-execution plan
        # (isFinalPlan=false) carries no codegen annotations, so any
        # static number here would be a lie; use
        # `query <name> --explain` (formatted mode) to see spans
    }


def lint_plan(df: DataFrame, checkpointed: bool = False) -> dict:
    """plan_shape + verdicts. `cartesian` is a hard fail; a
    single-partition exchange is a warning (legitimate only for
    documented 1-row/collapsed-frame global scalars — the
    GLOBAL_SCALAR_OK list in tests/test_plan_shapes.py); a BNLJ is a
    warning unless it is the 1-row crossJoin(broadcast(..)) scalar
    ship. `checkpointed=True` marks counts truncated by
    localCheckpoint lineage cuts (see PLAN_AUDIT's CKPT column)."""
    shape = plan_shape(df)
    problems = []
    if shape["cartesian_products"]:
        problems.append("FAIL: cartesian product — unbounded pair blowup")
    if shape["single_partition_exchanges"]:
        problems.append(
            "WARN: single-partition exchange — fine for 1-row global"
            " scalars, fatal if the data term reaches it"
        )
    if shape["broadcast_nested_loop_joins"]:
        problems.append(
            "WARN: broadcast nested-loop join — fine for 1-row scalar"
            " crossJoins, fatal for real relations"
        )
    return {
        **shape,
        "checkpoint_truncated": checkpointed,
        "problems": problems,
        "ok": not any(p.startswith("FAIL") for p in problems),
    }

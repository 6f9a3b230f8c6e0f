"""Registry access-pattern regression test: every dict entry point must
lazily load without recursion (a `not self` truthiness check inside
_load once dispatched through the overridden __len__ and recursed)."""

from __future__ import annotations

from ftm_datalake_spark.plans.registry import _LazyRegistry


def _fresh():
    return _LazyRegistry()


def test_lazy_registry_all_access_paths():
    # each access pattern on a FRESH (empty) lazy dict must self-load
    assert len(_fresh()) > 50
    assert "statement_aggregation" in _fresh()
    assert _fresh().get("does_not_exist") is None
    assert list(iter(_fresh()))
    assert _fresh()["q1_pricing_summary"].oracle is not None
    assert len(list(_fresh().items())) == len(_fresh().keys() | set())
    assert all(spec.name for spec in _fresh().values())


def test_register_tables_sql_surface(spark, sf_dir):
    """spark.sql over the registered views works, names match the
    oracle's table names, and pushdown survives the view layer."""
    from ftm_datalake_spark.sources.tables import register_tables

    names = register_tables(spark, sf_dir)
    assert "lineitem" in names and "documents" in names
    row = spark.sql(
        "SELECT COUNT(*) AS n FROM lineitem WHERE l_quantity < 5"
    ).head()
    assert row["n"] > 0
    # the filter must reach the scan through the view
    plan = (
        spark.sql("SELECT l_orderkey FROM lineitem WHERE l_shipdate = DATE'1995-01-01'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "l_shipdate" in plan

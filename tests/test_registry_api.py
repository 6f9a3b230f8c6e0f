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

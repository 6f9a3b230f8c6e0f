"""Differential test of every registry query against its DuckDB oracle at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare_query


def _names():
    from ftm_datalake_spark.plans import REGISTRY

    return sorted(REGISTRY.keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, sf_dir, name):
    compare_query(spark, sf_dir, name)

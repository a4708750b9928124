"""The correctness gate, locally: every inventory query vs its DuckDB
oracle at sf0.001 (the driver runs the same comparison at sf0.01 —
see tests/oracle_harness.py, runnable standalone at any sf)."""

import pytest

from realtimechurnpredictiondataengineering_spark.plans.inventory import REGISTRY
from tests.oracle_harness import run_all


@pytest.fixture(scope="module")
def results(spark, sf_dir):
    return run_all(spark, sf_dir)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(results, name):
    ok, msg = results[name]
    assert ok, f"{name}: {msg}"

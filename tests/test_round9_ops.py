"""Round-9 operator tests: ADVICE fixes (completeness escaping,
embedding_psi dims guard) and the round's new operators."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


def test_completeness_matrix_survives_hostile_column_names(spark):
    # a column named with an embedded quote, backslash, and space must
    # round-trip as a literal, not break (or rewrite) the stack() SQL
    from realtimechurnpredictiondataengineering_spark.operators.profiling import (
        completeness_matrix,
    )

    hostile = "o'brien\\rate x"
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 2.0)], ["seg", "v"]
    ).withColumnRenamed("v", hostile)
    got = {
        (r["segment"], r["column"]): r["null_rate"]
        for r in completeness_matrix(df, "seg", [hostile]).collect()
    }
    assert got[("a", hostile)] == 0.5
    assert got[("b", hostile)] == 0.0


def test_embedding_psi_dims_mismatch_fails_loudly(spark):
    # a dims/encoder mismatch must raise, not report psi = 0.0 "no drift"
    from realtimechurnpredictiondataengineering_spark.operators.profiling import (
        embedding_psi,
    )

    df = spark.createDataFrame(
        [Row(embedding=[0.1, -0.2, 0.3]), Row(embedding=[0.0, 0.1, -0.1])]
    )
    with pytest.raises(Exception, match="configured dims=8"):
        embedding_psi(df, df, dims=8, lo=-0.6, hi=0.6).collect()
    # matching dims still work
    out = embedding_psi(df, df, dims=3, lo=-0.6, hi=0.6).collect()
    assert len(out) == 3 and all(abs(r["psi"]) < 1e-9 for r in out)

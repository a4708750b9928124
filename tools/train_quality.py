"""Offline training run that produces ml.DOC_QUALITY_V1: fit the MLlib
document-quality classifier on the sf0.01 documents table and print the
frozen constants.

    PYTHONPATH=/root/repo python tools/train_quality.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtimechurnpredictiondataengineering_spark import ml
from realtimechurnpredictiondataengineering_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="train-quality")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = ml.train_doc_quality_model(docs)
    lr = model.stages[-1]
    coefs = dict(zip(ml.DOC_FEATURES, (float(v) for v in lr.coefficients)))
    print("coefficients = {")
    for k, v in coefs.items():
        print(f"    {k!r}: {v!r},")
    print("}")
    print(f"intercept = {float(lr.intercept)!r}")
    print(f"training AUC = {lr.summary.areaUnderROC:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Offline training run that produces ml.MODEL_V1: fit the MLlib churn
pipeline on the sf0.01 Gold features and print the frozen constants.

    PYTHONPATH=/root/repo python tools/train_churn.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from realtimechurnpredictiondataengineering_spark import ml
from realtimechurnpredictiondataengineering_spark.plans.gold import churn_features
from realtimechurnpredictiondataengineering_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="train-churn")
    feats = churn_features(spark, sf_dir)
    model = ml.train_churn_model(feats)
    lr = model.stages[-1]
    coefs = dict(zip(ml.FEATURES, (float(v) for v in lr.coefficients)))
    print("coefficients = {")
    for k, v in coefs.items():
        print(f"    {k!r}: {v!r},")
    print("}")
    print(f"intercept = {float(lr.intercept)!r}")
    summ = lr.summary
    print(f"training AUC = {summ.areaUnderROC:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()

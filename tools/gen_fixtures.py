"""Materialize the synthetic topic feed once to a committed parquet
fixture, so the sv01-sv04 Silver validation chains get a DuckDB-readable
input and graduate from rows-only to value-checked twins.

The feed itself is deterministic (seeded xxhash64 arithmetic,
sources/generator.py), but the ORACLE cannot replay Spark's xxhash64 —
materializing the wire frames is what makes both engines read identical
bytes.  Run from the repo root; writes fixtures/topic_feed.parquet as a
single sorted file (stable bytes → clean git diffs):

    PYTHONPATH=. python tools/gen_fixtures.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from realtimechurnpredictiondataengineering_spark.session import get_spark
from realtimechurnpredictiondataengineering_spark.sources.generator import synthetic_topic_feed

N_PER_TOPIC = 2000
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")


def main() -> None:
    spark = get_spark()
    pdf = synthetic_topic_feed(spark, N_PER_TOPIC, seed="42").toPandas()
    # total order (topic, value) so the file bytes are reproducible
    pdf = pdf.sort_values(["topic", "value"]).reset_index(drop=True)
    os.makedirs(OUT, exist_ok=True)
    path = os.path.join(OUT, "topic_feed.parquet")
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), path, compression="zstd"
    )
    print(f"wrote {len(pdf)} rows -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Sources and sinks (SURVEY §2.1 S1-S5, §2.2 K1-K7).

Batch readers over the driver's parquet tables, streaming readers with a
Kafka/file-source swap (the reference reads Kafka, tests read file streams
with the same ``(value, topic)`` contract), and sink helpers. Kafka and
Delta are gated behind availability checks — the classpath here has
neither; the code paths are real and the formats plug in on a cluster.
"""

from realtimechurnpredictiondataengineering_spark.sources.batch import TABLES, load_table, load_tables
from realtimechurnpredictiondataengineering_spark.sources.streaming import (
    file_stream,
    json_topic_stream,
    kafka_stream,
    rate_stream,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "file_stream",
    "json_topic_stream",
    "kafka_stream",
    "rate_stream",
]

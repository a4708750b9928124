"""Silver layer: batch twin of the streaming validation chains.

The validation logic lives in ``operators.filters`` (pure functions used
verbatim by the streaming pipelines in ``streaming.pipelines``); this
module wires them to the synthetic generator feed so the full
Bronze→Silver path is runnable — and oracle-comparable — as a batch job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from realtimechurnpredictiondataengineering_spark.operators.filters import (
    PROFILE_SCHEMA,
    TICKET_SCHEMA,
    TRANSACTION_SCHEMA,
    USAGE_SCHEMA,
    parse_topic,
    validate_profiles,
    validate_tickets_with_domain,
    validate_transactions,
    validate_usage,
)
from realtimechurnpredictiondataengineering_spark.sources.generator import TOPICS, synthetic_topic_feed


def silver_tables(spark: SparkSession, n_per_topic: int = 1000, seed: str = "42") -> dict[str, DataFrame]:
    """Bronze feed → four cleaned Silver frames (Silver1.py:34-131 shape,
    minus sinks).  Uses the fixed-case status domain so output is
    non-empty; ``operators.filters.validate_tickets`` preserves the
    reference's empty-set quirk for parity tests."""
    feed = synthetic_topic_feed(spark, n_per_topic, seed)
    return {
        "profiles": validate_profiles(parse_topic(feed, TOPICS[0], PROFILE_SCHEMA)),
        "usage": validate_usage(parse_topic(feed, TOPICS[1], USAGE_SCHEMA)),
        "transactions": validate_transactions(parse_topic(feed, TOPICS[2], TRANSACTION_SCHEMA)),
        "tickets": validate_tickets_with_domain(
            parse_topic(feed, TOPICS[3], TICKET_SCHEMA), ("open", "closed", "pending")
        ),
    }

"""Silver layer: batch twin of the streaming validation chains.

The validation logic lives in ``operators.filters`` (pure functions used
verbatim by the streaming pipelines in ``streaming.pipelines``); this
module wires them to the synthetic generator feed so the full
Bronze→Silver path is runnable — and oracle-comparable — as a batch job.
"""

from __future__ import annotations

import os

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


FEED_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "topic_feed.parquet",
)


def silver_tables_from_feed(feed: DataFrame, deterministic: bool = False) -> dict[str, DataFrame]:
    """Bronze feed → four cleaned Silver frames (Silver1.py:34-131 shape,
    minus sinks).  Uses the fixed-case status domain so output is
    non-empty; ``operators.filters.validate_tickets`` preserves the
    reference's empty-set quirk for parity tests.  ``deterministic``
    swaps the arbitrary-survivor dedups for the oracle-replayable
    first-by-order pick (batch only) — how the sv01-sv04 twins become
    value-checked against the materialized fixture."""
    return {
        "profiles": validate_profiles(
            parse_topic(feed, TOPICS[0], PROFILE_SCHEMA), deterministic=deterministic
        ),
        "usage": validate_usage(
            parse_topic(feed, TOPICS[1], USAGE_SCHEMA), deterministic=deterministic
        ),
        "transactions": validate_transactions(
            parse_topic(feed, TOPICS[2], TRANSACTION_SCHEMA), deterministic=deterministic
        ),
        "tickets": validate_tickets_with_domain(
            parse_topic(feed, TOPICS[3], TICKET_SCHEMA),
            ("open", "closed", "pending"),
            deterministic=deterministic,
        ),
    }


def silver_tables(spark: SparkSession, n_per_topic: int = 1000, seed: str = "42") -> dict[str, DataFrame]:
    """Generator-fed variant of ``silver_tables_from_feed`` (streaming
    parity tests); the sv01-sv04 oracle entries read the committed
    ``FEED_FIXTURE`` parquet instead so DuckDB sees the same bytes."""
    return silver_tables_from_feed(synthetic_topic_feed(spark, n_per_topic, seed))

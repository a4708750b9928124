"""Composed pipelines + the driver-facing query inventory.

- ``gold``      : the flagship churn feature-enrichment pipeline
                  (reference Gold1.py:51-106 semantics on the driver's
                  star schema)
- ``silver``    : batch twin of the streaming validation chains
- ``inventory`` : the full SURVEY §2 operator inventory as named
                  (PySpark query, DuckDB oracle SQL) pairs — the
                  correctness gate surface
- ``medallion`` : the end-to-end MainProcess topology (producer →
                  Bronze/Silver streams → Gold) as one driver program
"""

from realtimechurnpredictiondataengineering_spark.plans import (  # noqa: F401
    corpus_prep,
    gold,
    inventory,
    medallion,
    silver,
)

__all__ = ["corpus_prep", "gold", "inventory", "medallion", "silver"]

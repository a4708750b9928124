"""Composed pipelines + the driver-facing query inventory.

- ``gold``      : the flagship churn feature-enrichment pipeline
                  (reference Gold1.py:51-106 semantics on the driver's
                  star schema)
- ``silver``    : batch twin of the streaming validation chains
- ``inventory`` : the full SURVEY §2 operator inventory as named
                  (PySpark query, DuckDB oracle SQL) pairs — the
                  correctness gate surface
"""

from realtimechurnpredictiondataengineering_spark.plans import gold, inventory, silver  # noqa: F401

__all__ = ["gold", "inventory", "silver"]

"""In-flight pipeline metrics via ``df.observe`` (no second scan).

A pipeline that validates its own output normally pays an extra
aggregation job per audit ("count the nulls we dropped", "sum the
revenue we wrote").  ``observe`` attaches named aggregate expressions
to a plan node: the metrics accumulate DURING the one pass the query
already makes and surface on the driver when the action completes —
at 100 TB that is the difference between auditing for free and
re-scanning the lake.

Batch: ``observed()`` wraps ``pyspark.sql.Observation`` — run any
action on the returned frame, then read ``metrics(obs)``.
Streaming: pass the same expression dict to ``observe_stream``; each
micro-batch's metrics ride the ``StreamingQueryProgress``
(``observedMetrics``), pulled here from ``lastProgress`` — the hook a
production pipeline wires to its metrics backend.

Audit gates compose on top: ``require`` raises when a metric breaks
its predicate — the circuit-breaker between a bad batch and the
published table.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql.streaming import StreamingQuery


def observed(
    df: DataFrame, name: str, metrics: Mapping[str, Column]
) -> tuple[Observation, DataFrame]:
    """Attach named metric expressions to ``df``'s plan.  Returns the
    ``Observation`` handle and the instrumented frame; run an action on
    the frame, then read the handle (``metrics(obs)``)."""
    if not metrics:
        raise ValueError("metrics must name at least one aggregate expression")
    obs = Observation(name)
    cols = [c.alias(n) for n, c in metrics.items()]
    return obs, df.observe(obs, *cols)


def metrics(obs: Observation) -> dict[str, object]:
    """The observed metric values (blocks until the action finishes)."""
    return dict(obs.get)


def observe_stream(df: DataFrame, name: str, metrics: Mapping[str, Column]) -> DataFrame:
    """Streaming variant: metrics ride each micro-batch's progress event
    (``query.lastProgress['observedMetrics'][name]``)."""
    if not metrics:
        raise ValueError("metrics must name at least one aggregate expression")
    cols = [c.alias(n) for n, c in metrics.items()]
    return df.observe(name, *cols)


def last_stream_metrics(query: StreamingQuery, name: str) -> dict[str, object] | None:
    """The most recent micro-batch's observed metrics, or None if no
    batch has completed (or none carried this observation)."""
    progress = query.lastProgress
    if not progress:
        return None
    observed_metrics = progress.get("observedMetrics") or {}
    got = observed_metrics.get(name)
    if got is None:
        return None
    # the progress JSON deserializes each observation as a Row
    return got.asDict() if hasattr(got, "asDict") else dict(got)


def require(
    got: Mapping[str, object], checks: Mapping[str, Callable[[object], bool]]
) -> None:
    """Audit gate: raise ``ValueError`` naming every metric whose check
    fails — the caller decides whether that aborts the write."""
    failed = {n: got.get(n) for n, ok in checks.items() if not ok(got.get(n))}
    if failed:
        raise ValueError(f"audit gate failed: {failed}")

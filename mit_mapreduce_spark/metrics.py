"""Zero-cost pipeline instrumentation via ``pyspark.sql.Observation``.

A 100 TB curation job must publish data-quality counters (rows in,
rows dropped per gate, token mass kept) WITHOUT extra actions — a
second `count()` re-runs the scan, and at petabyte scale that doubles
the bill. Spark's `df.observe(Observation, *aggs)` attaches the
aggregates to the SAME job: metrics are collected as a side effect of
whatever action materializes the frame, one pass, no new stage.

``instrument`` wraps a DataFrame with named counters; ``collect_metrics``
reads them after any action. The quality gates here pair it with the
funnel operators (see tests/test_metrics.py): run the filter once, get
kept/dropped/token counters for free.

No reference equivalent (mr/*.go publishes no counters); this is the
Spark-idiomatic replacement for ad-hoc accumulators."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def instrument(df: DataFrame, name: str, **aggs: Column
               ) -> tuple[DataFrame, Observation]:
    """Attach named aggregate counters to ``df``'s next action.

    aggs maps metric name -> aggregate Column (F.count, F.sum(...),
    ...). Returns (instrumented_df, observation); read
    ``observation.get`` — or `collect_metrics` — AFTER an action has
    materialized the frame. The counters ride the job's existing
    pass: no extra scan, no extra stage, exactly-once semantics per
    action (Spark re-registers per attempt, so retried tasks don't
    double-count)."""
    obs = Observation(name)
    named = [c.alias(n) for n, c in aggs.items()]
    return df.observe(obs, *named), obs


def collect_metrics(obs: Observation) -> dict:
    """The observed counters as a plain dict (blocks until the
    observed action finishes registering its metrics)."""
    return dict(obs.get)

"""Single-pass pipeline monitoring via ``DataFrame.observe``.

A 100 TB pipeline cannot afford a second scan just to know what it wrote:
row counts, null rates, and value bounds must ride along with the real
action. Spark's ``observe`` API attaches named aggregate expressions to a
plan node; the metrics are computed incrementally by the running tasks and
delivered with the action's completion — zero extra scans, zero extra
shuffles (the expressions fold into each task like map-side aggregation).

``monitored`` wraps a DataFrame with a standard data-quality metric set;
``run_with_metrics`` executes a terminal action and returns the observed
row. Under Structured Streaming the same metric set is registered by name
(``Observation`` objects are batch-only) and surfaces per micro-batch in
``StreamingQueryProgress.observedMetrics``.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(df: DataFrame, cols: list[str] | None = None) -> list:
    """Standard metric set: total rows + per-column null counts, plus
    min/max for numeric columns (cheap: all fold into one observe node)."""
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    numeric = {f.name for f in df.schema.fields
               if f.dataType.typeName() in
               ("integer", "long", "double", "float", "short", "decimal")}
    # `is None`, not falsy-or: an EXPLICIT empty list means "row count
    # only", not "all columns" (the falsy-empty-container bug class)
    for c in (df.columns if cols is None else cols):
        metrics.append(
            F.count_if(F.col(c).isNull()).alias(f"nulls_{c}"))
        if c in numeric:
            metrics.append(F.min(c).alias(f"min_{c}"))
            metrics.append(F.max(c).alias(f"max_{c}"))
    return metrics


def monitored(df: DataFrame, cols: list[str] | None = None
              ) -> tuple[DataFrame, Observation | str]:
    """Attach a quality-metric observation to ``df``.

    Batch: returns (df, Observation) — read ``observation.get`` AFTER a
    terminal action ran on the returned frame.

    Streaming: ``Observation`` objects are batch-only, so the metrics are
    registered under a generated string name instead — returns (df, name);
    read ``progress.observedMetrics[name]`` from the query's
    ``StreamingQueryProgress`` (per micro-batch).
    """
    if df.isStreaming:
        name = f"quality_{uuid.uuid4().hex[:8]}"
        return df.observe(name, *quality_metrics(df, cols)), name
    obs = Observation(f"quality_{uuid.uuid4().hex[:8]}")
    return df.observe(obs, *quality_metrics(df, cols)), obs


def run_with_metrics(df: DataFrame, cols: list[str] | None = None,
                     action=None) -> dict:
    """Run ``action`` (default: noop write — full execution, no driver
    collect) on a monitored copy of ``df`` and return the metrics dict.

    Batch only: for a streaming DataFrame use ``monitored`` directly and
    read the per-batch metrics from ``StreamingQueryProgress``.
    """
    if df.isStreaming:
        raise ValueError(
            "run_with_metrics is batch-only; use monitored(df) and read "
            "StreamingQueryProgress.observedMetrics[name] per micro-batch")
    mdf, obs = monitored(df, cols)
    if action is None:
        mdf.write.format("noop").mode("overwrite").save()
    else:
        action(mdf)
    return obs.get

"""Structured Streaming sketch operators (beyond the batch-only reference).

The reference approximates streaming with time-bucketed tables (hourly
sketch tables rolled up to daily, README.md:119-124, 191-198). Here the
same pattern is a first-class stream: tumbling/sliding event-time windows
with watermarked late-data handling produce one serialized DDSketch per
(window, keys) — exactly the rows the reference stores — so the batch
``ddsketch_agg`` roll-ups and quantile extraction compose downstream.

Scale notes: the pre-shuffle row is (keys, window, value); the stateful
aggregation is Spark's own windowed agg when using the native binned form
(update = map-side partial), or the pandas grouped-agg per micro-batch via
``foreachBatch`` when wire-format output is required. State size is bounded
by |keys|x|bins| per open window — a few KB — so watermark horizon, not
cardinality, governs memory.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from ..functions.aggregate import sketch_values_agg
from ..sketch import DEFAULT_RELATIVE_ACCURACY

__all__ = ["windowed_sketches", "windowed_sketches_native", "streaming_quantiles"]


def windowed_sketches(
    stream: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value: str,
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
    alpha: float = DEFAULT_RELATIVE_ACCURACY,
) -> DataFrame:
    """Streaming (window, keys) → serialized sketch, via grouped-agg UDAF.

    Output mode should be 'append' (finalized windows only) given the
    watermark. The result schema mirrors the reference's storage tables:
    (window_start, window_end, *keys, sketch BINARY).
    """
    w = F.window(F.col(ts_col), window, slide or window)
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), *keys)
        .agg(sketch_values_agg(F.col(value), alpha).alias("sketch"))
    )
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        *keys,
        "sketch",
    )


def windowed_sketches_native(
    stream: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value: str,
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
    alpha: float = DEFAULT_RELATIVE_ACCURACY,
) -> DataFrame:
    """Streaming binned counts: (window, keys, sign, bin) → cnt.

    Fully native — Spark's streaming state store handles the windowed hash
    aggregate with partial aggregation, no Python in the hot path. Feed the
    result to ``operators.native``-style reassembly or store as the compact
    binned representation directly (it IS the sketch, minus serialization).
    """
    from ..operators.native import gamma_of, value_to_bin_expr

    gamma = gamma_of(alpha)
    v = F.col(value)
    sign = F.when(v > 0, F.lit(1)).when(v < 0, F.lit(-1)).otherwise(F.lit(0))
    bin_col = (
        F.when(v > 0, value_to_bin_expr(v, gamma))
        .when(v < 0, value_to_bin_expr(-v, gamma))
        .otherwise(F.lit(None).cast("int"))
    )
    w = F.window(F.col(ts_col), window, slide or window)
    return (
        stream.where(v.isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), *keys, sign.alias("sign"), bin_col.alias("bin"))
        .agg(F.count("*").cast("double").alias("cnt"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *keys,
            "sign",
            "bin",
            "cnt",
        )
    )


def streaming_quantiles(
    binned_sink: DataFrame,
    keys: Sequence[str],
    alpha: float = DEFAULT_RELATIVE_ACCURACY,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Batch-side quantile extraction over a stored streaming binned sink.

    ``binned_sink`` is the (window_start, window_end, keys, sign, bin, cnt)
    table written by ``windowed_sketches_native``; grouping includes the
    window bounds so each window reports independently.
    """
    from ..operators import native

    keys = ["window_start", "window_end", *keys]
    gamma = native.gamma_of(alpha)
    # reuse the batch quantile machinery over pre-binned rows by expanding
    # each (sign, bin, cnt) into the enriched form sketch_quantile_agg uses
    # representative value strictly inside the bin's interval (gamma^(bin-1),
    # gamma^bin]: exponent bin-0.5 re-bins to the same index without the
    # boundary ambiguity of gamma^bin under fp log round-off
    df = binned_sink.withColumn(
        "v",
        F.when(F.col("sign") == 0, F.lit(0.0)).otherwise(
            F.when(F.col("sign") == 1, F.lit(1.0)).otherwise(F.lit(-1.0))
            * F.pow(F.lit(gamma), F.col("bin").cast("double") - F.lit(0.5))
        ),
    )
    # weight rows by cnt so the aggregate sees the original multiplicities
    return native.sketch_quantile_agg(
        df, keys, "v", alpha, quantiles, weight="cnt"
    )

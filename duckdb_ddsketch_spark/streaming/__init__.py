"""Structured Streaming sketch operators (beyond the batch-only reference).

The reference approximates streaming with time-bucketed tables (hourly
sketch tables rolled up to daily, README.md:119-124, 191-198). Here the same
pattern is a first-class stream.

Design constraint: Spark streaming aggregation rejects grouped-agg pandas
UDFs, so the streaming-state hot path must be native. The layering is:

1. ``windowed_binned_counts`` — watermarked windowed hash aggregate over
   (window, keys, sign, bin): fully native, map-side partial aggregation,
   state = |keys|x|bins| ints per open window (a few KB).
2. ``finalize_window_sketches`` — *batch* reassembly of those rows into
   wire-format sketch rows; run it inside ``foreachBatch`` (append mode
   emits each closed window exactly once) or over the stored binned sink.
   Output matches the reference's storage tables: (window bounds, keys,
   sketch BINARY).
3. ``streaming_quantiles`` — batch quantile extraction straight from a
   binned sink, skipping wire format entirely.
4. ``sessionized_sketches`` — ``applyInPandasWithState`` custom stateful
   operator: one DDSketch per key accumulated across micro-batches, emitted
   as updated wire bytes each batch (the custom-state escape hatch for
   semantics Spark's windowed agg can't express).
"""

from __future__ import annotations

from typing import Iterable, Optional, Sequence, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..sketch import DDSketch, DEFAULT_RELATIVE_ACCURACY

__all__ = [
    "windowed_binned_counts",
    "finalize_window_sketches",
    "streaming_quantiles",
    "sessionized_sketches",
]


def windowed_binned_counts(
    stream: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value: str,
    window: str = "1 hour",
    slide: Optional[str] = None,
    watermark: str = "10 minutes",
    alpha: float = DEFAULT_RELATIVE_ACCURACY,
) -> DataFrame:
    """Streaming (window, keys, sign, bin) → cnt — the native sketch state.

    Spark's streaming state store handles the windowed hash aggregate with
    partial aggregation; no Python in the hot path. Append mode + watermark
    emits each window's rows exactly once when it closes.
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


def finalize_window_sketches(
    binned: DataFrame,
    keys: Sequence[str],
    alpha: float = DEFAULT_RELATIVE_ACCURACY,
) -> DataFrame:
    """Batch reassembly: binned rows → (window bounds, keys, sketch BINARY).

    Use inside ``foreachBatch`` (each closed window arrives complete in one
    batch under append mode) or over a stored binned sink.
    """
    from ..operators import native

    gamma = native.gamma_of(alpha)
    group = ["window_start", "window_end", *keys]
    entry = F.struct(F.col("bin").alias("key"), F.col("cnt").alias("value"))
    assembled = binned.groupBy(*group).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.when(F.col("sign") == 1, entry)))
        ).alias("pos"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.when(F.col("sign") == -1, entry)))
        ).alias("neg"),
        F.sum(F.when(F.col("sign") == 0, F.col("cnt")).otherwise(F.lit(0.0))).alias(
            "zero_count"
        ),
        F.sum("cnt").alias("count"),
    )
    sketch_struct = F.struct(
        F.lit(gamma).alias("gamma"),
        F.lit(0.0).alias("index_offset"),
        F.col("pos"),
        F.col("neg"),
        F.col("zero_count"),
        F.col("count"),
        F.lit(0.0).alias("sum"),  # reconstructed from bins on decode
        F.lit(None).cast("double").alias("min"),
        F.lit(None).cast("double").alias("max"),
    )
    return assembled.select(
        *group, native.struct_to_wire(sketch_struct).alias("sketch")
    )


def streaming_quantiles(
    binned_sink: DataFrame,
    keys: Sequence[str],
    alpha: float = DEFAULT_RELATIVE_ACCURACY,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
) -> DataFrame:
    """Batch quantile extraction over a stored streaming binned sink.

    ``binned_sink`` holds (window_start, window_end, keys, sign, bin, cnt)
    rows written by ``windowed_binned_counts``; each window reports
    independently.
    """
    from ..operators import native

    keys = ["window_start", "window_end", *keys]
    gamma = native.gamma_of(alpha)
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
    return native.sketch_quantile_agg(df, keys, "v", alpha, quantiles, weight="cnt")


def sessionized_sketches(
    stream: DataFrame,
    key_col: str,
    value: str,
    alpha: float = DEFAULT_RELATIVE_ACCURACY,
) -> DataFrame:
    """Per-key running DDSketch via ``applyInPandasWithState``.

    State: the sketch's sparse bins, carried across micro-batches. Each
    batch emits the key's updated serialized sketch + count (update-mode
    semantics). This is the template for custom stateful sketch operators
    (sessionization, decay, alerting) that windowed aggregation can't
    express. State size is the sketch itself: O(bins), independent of rows.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = StructType(
        [
            StructField("key", StringType()),
            StructField("sketch", BinaryType()),
            StructField("count", LongType()),
        ]
    )
    state_schema = StructType([StructField("blob", BinaryType())])

    def update(key: Tuple, pdfs: Iterable[pd.DataFrame], state: GroupState):
        if state.exists:
            (blob,) = state.get
            sketch = DDSketch.decode(bytes(blob))
        else:
            sketch = DDSketch(alpha)
        for pdf in pdfs:
            sketch.extend_array(pdf[value].dropna().to_numpy())
        blob = sketch.encode()
        state.update((blob,))
        yield pd.DataFrame(
            {"key": [key[0]], "sketch": [blob], "count": [int(sketch.count)]}
        )

    return (
        stream.select(F.col(key_col).cast("string").alias("key"), value)
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

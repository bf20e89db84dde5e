"""Mosaic / time-stack aggregation — SURVEY.md §2.4.

The reference reduces a 4-D stack ``(n_rasters, bands, rows, cols)`` of
co-registered acquisitions per request (deprecated/Aggregate.py:56-63,
LandsatPixelPercentile.py:168-190, LandsatMedianImage.py:179,
FindMax.py:66-84, PercentAboveThreshold.py:140-143). The Spark-native
shape: groupBy(tile key) → applyInPandas assembles the stack once and
reduces it with ONE vectorized NumPy call (the reference's per-pixel Python
loops replaced by axis-0 reductions — identical math, SURVEY.md O9).

Decomposable measures (sum/mean/min/max/count) additionally get a pure
Catalyst path via :func:`stack_stats_decomposable` — partial aggregation
(map-side combine) means no stack ever materializes; use it when the
measure allows. Median/percentile need the full stack per group; group size
is bounded by (n_acquisitions × tile bytes) — cap stacks by time-bucketing
upstream if needed (SURVEY.md O13).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .. import codec

_MEASURES: dict[str, Callable] = {
    "sum": lambda s: np.nansum(s, axis=0),
    "mean": lambda s: np.nanmean(s, axis=0),
    "median": lambda s: np.nanmedian(s, axis=0),
    "std": lambda s: np.nanstd(s, axis=0),
    "min": lambda s: np.nanmin(s, axis=0),
    "max": lambda s: np.nanmax(s, axis=0),
}


def _out_schema(group_cols: list[str], df: DataFrame) -> T.StructType:
    return T.StructType([df.schema[c] for c in group_cols] + [
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()), T.StructField("h", T.IntegerType()),
        T.StructField("bands", T.IntegerType()), T.StructField("dtype", T.StringType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("n_rasters", T.IntegerType()),
    ])


def _reduce_group(key, pdf, group_cols, reducer, fmt_out, value_band, qa_band,
                  clear_values, order_col, nodata=None):
    if order_col is not None:
        pdf = pdf.sort_values(order_col)  # time-ordering, SeasonalARIMA.py:162-163
    stack = np.stack([codec.decode(bytes(b)) for b in pdf["bytes"]])  # (n,b,h,w)
    if qa_band is not None:
        # mask non-clear observations to NaN before reducing
        # (LandsatMedianImage.py:25-27,163-177 behavior)
        vals = stack[:, value_band].astype(np.float64)
        clear = np.isin(stack[:, qa_band], np.asarray(clear_values))
        data = np.where(clear, vals, np.nan)[:, None, :, :]
    else:
        data = stack.astype(np.float64)
    with np.errstate(all="ignore"):
        red = reducer(data)          # (bands, h, w)
    if red.ndim == 2:
        red = red[None]
    # never-clear pixels stay INVALID (NaN in the f4 output) — the
    # reference's mask model keeps them out of downstream statistics
    # (Reference.py:100-105,212-216); pass ``nodata`` to substitute an
    # explicit sentinel instead (the pre-round-2 behavior used 0.0, which
    # silently fed fake zeros into downstream stats)
    if nodata is not None:
        red = np.nan_to_num(red, nan=nodata)
    red = red.astype(np.float32)
    row = {c: key[i] for i, c in enumerate(group_cols)}
    row.update({"bytes": codec.encode(red, fmt_out), "w": red.shape[2],
                "h": red.shape[1], "bands": red.shape[0], "dtype": "f4",
                "fmt": fmt_out, "n_rasters": len(pdf)})
    return pd.DataFrame([row])


def stack_composite(df: DataFrame, measure: str, group_cols: list[str] = ["scene_id"],
                    fmt_out: str = "zlib", value_band: int = 0,
                    qa_band: int | None = None,
                    clear_values: tuple[int, ...] = (),
                    order_col: str | None = None,
                    nodata: float | None = None) -> DataFrame:
    """Per-pixel composite across a stack: Aggregate (A1) / LandsatMedianImage
    (A5) / Landsat_Image_Synthesis mean (A6) depending on measure + QA args.
    Never-clear pixels stay NaN (invalid) unless ``nodata`` substitutes a
    sentinel — see _reduce_group."""
    reducer = _MEASURES[measure]
    schema = _out_schema(group_cols, df)
    def _apply(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _reduce_group(key, pdf, group_cols, reducer, fmt_out,
                             value_band, qa_band, clear_values, order_col,
                             nodata)
    return df.groupBy(*group_cols).applyInPandas(_apply, schema=schema)


def stack_percentile(df: DataFrame, q: float, group_cols: list[str] = ["scene_id"],
                     fmt_out: str = "zlib", value_band: int = 0,
                     qa_band: int | None = None,
                     clear_values: tuple[int, ...] = (),
                     nodata: float | None = None) -> DataFrame:
    """Per-pixel percentile across a QA-filtered stack — LandsatPixelPercentile
    (A4), with np.nanpercentile over axis 0 replacing the reference's
    per-pixel loop (LandsatPixelPercentile.py:175-190; same math)."""
    reducer = lambda s: np.nanpercentile(s, q, axis=0)
    schema = _out_schema(group_cols, df)
    def _apply(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _reduce_group(key, pdf, group_cols, reducer, fmt_out,
                             value_band, qa_band, clear_values, None, nodata)
    return df.groupBy(*group_cols).applyInPandas(_apply, schema=schema)


def stack_topk(df: DataFrame, k: int, group_cols: list[str] = ["scene_id"],
               fmt_out: str = "zlib") -> DataFrame:
    """Per-pixel k-th max across the stack — FindMax/FindSecondMax/FindThirdMax
    (A8: np.sort along stack axis, FindSecondMax.py:73)."""
    def reducer(s):
        srt = np.sort(s, axis=0)  # ascending; k-th max = [-k]
        return srt[-k] if s.shape[0] >= k else srt[0]
    schema = _out_schema(group_cols, df)
    def _apply(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _reduce_group(key, pdf, group_cols, reducer, fmt_out,
                             0, None, (), None)
    return df.groupBy(*group_cols).applyInPandas(_apply, schema=schema)


def find_max_k(df: DataFrame, k: int = 1, cap: float = 100.0,
               group_cols: list[str] = ["scene_id"],
               fmt_out: str = "zlib", value_band: int = 0) -> DataFrame:
    """Per-pixel k-th max across the stack with the FindMax family's exact
    validity rule (FindMax.py:66-84, FindSecondMax.py:73,
    FindThirdMax.py:73): values > ``cap`` are invalidated to −1 before the
    sort, and pixels where every member is invalid stay −1. This is the
    math the FindMaxPixel_Mosaic .rft templates bind (the sort-then-index
    over the acquisition axis), vectorized per tile group."""
    def reducer(s):
        v = s.copy()
        v[v > cap] = -1.0
        srt = np.sort(v, axis=0)         # ascending; k-th max = [-k]
        out = srt[-k] if v.shape[0] >= k else srt[0]
        all_invalid = ~(v != -1.0).any(axis=0)
        out = np.where(all_invalid, -1.0, out)
        return out
    schema = _out_schema(group_cols, df)
    def _apply(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _reduce_group(key, pdf, group_cols, reducer, fmt_out,
                             value_band, None, (), None)
    return df.groupBy(*group_cols).applyInPandas(_apply, schema=schema)


def stack_coalesce(df: DataFrame, group_cols: list[str] = ["scene_id"],
                   order_col: str | None = None, nodata: float | None = None,
                   fmt_out: str = "zlib") -> DataFrame:
    """Per-pixel FIRST-valid composite along the ordered stack — the mosaic
    merge operator (MergeRasters.rft.xml) and the Con(IsNull(a), b, a)
    RemoveNoData construction (RemoveNoData.rft.xml) in one primitive:
    walk members in ``order_col`` order and keep the first pixel that is
    not NaN (and not ``nodata`` if given). Pixels invalid in every member
    stay NaN."""
    def reducer(s):
        valid = ~np.isnan(s)
        if nodata is not None:
            valid &= s != nodata
        first = valid.argmax(axis=0)                      # first True index
        any_valid = valid.any(axis=0)
        picked = np.take_along_axis(s, first[None], axis=0)[0]
        return np.where(any_valid, picked, np.nan)
    schema = _out_schema(group_cols, df)
    def _apply(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return _reduce_group(key, pdf, group_cols, reducer, fmt_out,
                             None, None, (), order_col)
    return df.groupBy(*group_cols).applyInPandas(_apply, schema=schema)


def percent_above_threshold(df: DataFrame, threshold: float,
                            group_cols: list[str] = ["scene_id"],
                            value_band: int = 0, above: bool = True,
                            time_col: str | None = None,
                            t_min=None, t_max=None) -> DataFrame:
    """Scalar %-of-stack-pixels beyond a threshold, optionally time-filtered —
    PercentAboveThreshold (A7; date-range filter
    PercentAboveThreshold.py:124-137). Pure Catalyst: the time filter is a
    plain predicate (prunes partitions on a date-partitioned table) and the
    ratio is avg of a boolean — fully decomposable, no stack materialized."""
    d = df
    if time_col is not None and t_min is not None:
        d = d.filter((F.col(time_col) >= t_min) & (F.col(time_col) <= t_max))

    def per_tile(batches):
        for pdf in batches:
            fracs = []
            for b in pdf["bytes"]:
                px = codec.decode(bytes(b))[value_band].astype(np.float64)
                hit = px >= threshold if above else px <= threshold
                fracs.append(float(hit.mean()))
            out = pdf[[c for c in pdf.columns if c != "bytes"]].copy()
            out["frac"] = fracs
            yield out

    schema = T.StructType([f for f in d.schema if f.name != "bytes"]
                          + [T.StructField("frac", T.DoubleType())])
    per = d.mapInPandas(per_tile, schema)
    return (per.groupBy(*group_cols)
            .agg(F.round(F.avg("frac") * 100.0, 6).alias("pct"),
                 F.count("*").alias("n_rasters")))


def stack_stats_decomposable(df: DataFrame, group_cols: list[str],
                             value_band: int = 0) -> DataFrame:
    """Decomposable stack statistics (sum/count/mean/min/max of per-tile
    aggregates) via pure Catalyst hash agg — the partial+final two-phase
    plan Spark gives for free (SURVEY.md A1 note). Use for measures that
    don't need the co-registered per-pixel stack."""
    def per_tile(batches):
        for pdf in batches:
            out = pdf[[c for c in pdf.columns if c != "bytes"]].copy()
            sums, mins, maxs, cnts = [], [], [], []
            for b in pdf["bytes"]:
                px = codec.decode(bytes(b))[value_band].astype(np.float64)
                sums.append(px.sum()); mins.append(px.min())
                maxs.append(px.max()); cnts.append(px.size)
            out["px_sum"] = sums; out["px_min"] = mins
            out["px_max"] = maxs; out["px_n"] = cnts
            yield out
    schema = T.StructType([f for f in df.schema if f.name != "bytes"] + [
        T.StructField("px_sum", T.DoubleType()), T.StructField("px_min", T.DoubleType()),
        T.StructField("px_max", T.DoubleType()), T.StructField("px_n", T.LongType())])
    per = df.mapInPandas(per_tile, schema)
    return (per.groupBy(*group_cols)
            .agg(F.sum("px_sum").alias("sum"), F.min("px_min").alias("min"),
                 F.max("px_max").alias("max"),
                 (F.sum("px_sum") / F.sum("px_n")).alias("mean"),
                 F.count("*").alias("n_rasters")))


def extent_union(df: DataFrame, group_cols: list[str] = []) -> DataFrame:
    """Union of input extents — output-extent negotiation of
    LandsatMedianImage.py:69-114 as a trivial aggregate (U4)."""
    agg = [F.min("xmin").alias("xmin"), F.min("ymin").alias("ymin"),
           F.max("xmax").alias("xmax"), F.max("ymax").alias("ymax")]
    return df.groupBy(*group_cols).agg(*agg) if group_cols else df.agg(*agg)


def scene_regression(df: DataFrame, x_stat: str, y_stat: str,
                     group_cols: list[str] = ["scene_id"]) -> DataFrame:
    """Two-pass scene-level linear regression — TopographicCCorrection's
    global C estimation (A9, TopographicCCorrection.py:139-147) shape:
    per-group regr_slope/intercept over decomposable covariance sums (pure
    Catalyst), to be joined back for the per-pixel correction pass."""
    return (df.groupBy(*group_cols)
            .agg(F.regr_slope(F.col(y_stat), F.col(x_stat)).alias("slope"),
                 F.regr_intercept(F.col(y_stat), F.col(x_stat)).alias("intercept"),
                 F.regr_count(F.col(y_stat), F.col(x_stat)).alias("n")))

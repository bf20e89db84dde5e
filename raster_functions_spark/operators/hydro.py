"""Hydrology / global-DEM operators — SURVEY.md W8 (CompoundTopographicIndex).

Flow accumulation is a GLOBAL computation (every cell's value depends on
the whole upstream graph), the reference's hardest operator class: its
64-bit variant builds a D8 flow graph and solves (I−Mᵀ)a = 1 with
scipy.sparse (CompoundTopographicIndex_64bitScipy.py:80-149). Per
SURVEY.md §7 the engine runs it **per scene** in a single applyInPandas
group (the reference itself forces whole-image processing via
``ProcessFullImage``), with a from-scratch NumPy implementation:
elevation-ordered single-pass accumulation (equivalent to the sparse
solve for an acyclic D8 graph). Distributed-iterative (halo-exchange
relaxation) is the documented scale-up path for scenes that exceed one
executor's memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .. import codec
from .focal import _horn_gradients

# D8 neighbor offsets (E, SE, S, SW, W, NW, N, NE)
_D8 = np.array([(0, 1), (1, 1), (1, 0), (1, -1),
                (0, -1), (-1, -1), (-1, 0), (-1, 1)])
_D8_DIST = np.array([1.0, np.sqrt(2), 1.0, np.sqrt(2)] * 2)


def d8_flow_direction(z: np.ndarray) -> np.ndarray:
    """Steepest-descent D8 direction per cell: index 0..7 into _D8, or -1
    for pits/flats (no lower neighbor). Vectorized via 8 shifted drops."""
    h, w = z.shape
    zp = np.pad(z.astype(np.float64), 1, mode="edge")
    drops = np.full((8, h, w), -np.inf)
    for d, (dy, dx) in enumerate(_D8):
        nb = zp[1 + dy:1 + dy + h, 1 + dx:1 + dx + w]
        drops[d] = (z - nb) / _D8_DIST[d]
    best = drops.argmax(axis=0)
    return np.where(drops.max(axis=0) > 0, best, -1).astype(np.int8)


def flow_accumulation(z: np.ndarray) -> np.ndarray:
    """Number of upstream cells draining through each cell (self included).
    Elevation-descending single pass over the acyclic D8 graph — the exact
    solution of the reference's sparse system (I−Mᵀ)a = 1."""
    h, w = z.shape
    direc = d8_flow_direction(z)
    acc = np.ones(h * w, dtype=np.float64)
    flat_dir = direc.ravel()
    order = np.argsort(z.ravel(), kind="stable")[::-1]  # high → low
    rows, cols = np.divmod(np.arange(h * w), w)
    for i in order:
        d = flat_dir[i]
        if d < 0:
            continue
        r = rows[i] + _D8[d][0]
        c = cols[i] + _D8[d][1]
        if 0 <= r < h and 0 <= c < w:
            acc[r * w + c] += acc[i]
    return acc.reshape(h, w)


def cti_np(z: np.ndarray, cellsize: float = 1.0) -> np.ndarray:
    """Compound topographic (wetness) index:
    ln((flow_acc + 1) * cellsize / tan(slope)) — formula of
    CompoundTopographicIndex.py:78-86, with flow accumulation computed
    from scratch instead of taken as an input band."""
    acc = flow_accumulation(z)
    zp = np.pad(z.astype(np.float64), 1, mode="edge")
    dzdx, dzdy = _horn_gradients(zp, cellsize)
    slope = np.arctan(np.hypot(dzdx, dzdy))
    tan_s = np.maximum(np.tan(slope), 1e-6)
    return np.log(((acc + 1.0) * cellsize) / tan_s).astype(np.float32)


def cti_scene(df: DataFrame, tile: int,
              grid_cols: tuple[str, str, str] = ("scene_id", "tx", "ty"),
              cellsize_col: str = "cell_dx", fmt_out: str = "zlib") -> DataFrame:
    """Per-scene CTI over a tiled DEM table: one applyInPandas group per
    scene assembles the mosaic, computes flow accumulation + CTI globally,
    and re-tiles. Scene size is bounded by executor memory (the
    ProcessFullImage tradeoff, SURVEY.md O13)."""
    scn, txc, tyc = grid_cols
    out_schema = T.StructType([
        df.schema[scn], df.schema[txc], df.schema[tyc],
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()), T.StructField("h", T.IntegerType()),
        T.StructField("bands", T.IntegerType()), T.StructField("dtype", T.StringType()),
        T.StructField("fmt", T.StringType()),
    ])

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        txs = pdf[txc].to_numpy()
        tys = pdf[tyc].to_numpy()
        W = (txs.max() + 1) * tile
        H = (tys.max() + 1) * tile
        full = np.zeros((H, W), dtype=np.float64)
        for i in range(len(pdf)):
            px = codec.decode(bytes(pdf["bytes"].iloc[i]))[0]
            full[tys[i] * tile:(tys[i] + 1) * tile,
                 txs[i] * tile:(txs[i] + 1) * tile] = px
        cs = float(pdf[cellsize_col].iloc[0]) if cellsize_col in pdf else 1.0
        cti = cti_np(full, cs)
        rows = []
        for i in range(len(pdf)):
            t = cti[tys[i] * tile:(tys[i] + 1) * tile,
                    txs[i] * tile:(txs[i] + 1) * tile]
            rows.append({scn: key[0], txc: int(txs[i]), tyc: int(tys[i]),
                         "bytes": codec.encode(np.ascontiguousarray(t)[None], fmt_out),
                         "w": tile, "h": tile, "bands": 1, "dtype": "f4",
                         "fmt": fmt_out})
        return pd.DataFrame(rows)

    return df.groupBy(scn).applyInPandas(run, schema=out_schema)

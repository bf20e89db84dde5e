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
from pyspark.sql import functions as F
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


def _local_acc_with_inflow(z: np.ndarray, direc: np.ndarray,
                           inflow: np.ndarray):
    """One tile-local accumulation pass given fixed boundary inflows:
    acc = 1 + inflow, pushed along D8 directions in descending-z order.
    Returns (acc, outflows) where outflows[d8_dir] maps edge exits →
    (row, col, amount) pushed into the neighbor tile."""
    h, w = z.shape
    acc = 1.0 + inflow.reshape(-1)
    flat_dir = direc.reshape(-1)
    order = np.argsort(z.reshape(-1), kind="stable")[::-1]
    rows, cols = np.divmod(np.arange(h * w), w)
    out: list[tuple[int, int, int, float]] = []  # (dtx, dty, target_flat, amt)
    for i in order:
        d = flat_dir[i]
        if d < 0:
            continue
        r = rows[i] + _D8[d][0]
        c = cols[i] + _D8[d][1]
        if 0 <= r < h and 0 <= c < w:
            acc[r * w + c] += acc[i]
        else:
            dty = -1 if r < 0 else (1 if r >= h else 0)
            dtx = -1 if c < 0 else (1 if c >= w else 0)
            out.append((dtx, dty, (r % h) * w + (c % w), float(acc[i])))
    return acc.reshape(h, w), out


def flow_accumulation_distributed(df: DataFrame, tile: int,
                                  grid_cols: tuple[str, str, str] = ("scene_id", "tx", "ty"),
                                  max_rounds: int = 64,
                                  fmt_out: str = "zlib") -> DataFrame:
    """EXACT distributed flow accumulation over a tiled DEM — no scene ever
    assembled in one task (removes cti_scene's scene-fits-in-memory bound).

    1. D8 directions per tile via the halo exchange (1-px neighbor strips:
       boundary directions identical to the whole-mosaic computation).
    2. Iterate: each tile runs a local descending-elevation pass seeded
       with its current boundary inflows, and emits outflows that exit
       across tile edges; outflows shuffle to their target tiles as next
       round's inflows. Flow is globally acyclic, so inflows increase
       monotonically and stabilize after ≤ (longest flow path in tiles)
       rounds; we stop when the inflow table's checksum is unchanged.

    Each round = one small shuffle of boundary-crossing flow records
    (≤ 4·T per tile), NOT pixel data. Driver-side loop; per-round state is
    localCheckpoint'ed to keep lineage flat.
    """
    from .focal import apply_focal
    from ..raster import TileOp
    scn, txc, tyc = grid_cols

    # 1. directions from haloed z (kernel consumes padded input, crops 1)
    def dir_fn(zp, meta):
        zp2 = zp[0].astype(np.float64)
        h, w = zp2.shape
        drops = np.full((8, h - 2, w - 2), -np.inf)
        core = zp2[1:-1, 1:-1]
        for d, (dy, dx) in enumerate(_D8):
            nb = zp2[1 + dy:h - 1 + dy, 1 + dx:w - 1 + dx]
            drops[d] = (core - nb) / _D8_DIST[d]
        best = drops.argmax(axis=0)
        direc = np.where(drops.max(axis=0) > 0, best, 255).astype(np.uint8)
        # pack z (f4, as u1 view unsafe) — instead emit dir band only;
        # z rides along from the source df
        return direc[None]

    dirs = apply_focal(df, TileOp("d8", dir_fn, padding=1), fmt_out="raw",
                       grid_cols=grid_cols).withColumnRenamed("bytes", "dir_bytes")
    state = (df.select(scn, txc, tyc, F.col("bytes").alias("z_bytes"))
             .join(dirs.select(scn, txc, tyc, "dir_bytes"), [scn, txc, tyc])
             .withColumn("inflow_bytes", F.lit(None).cast("binary"))
             .localCheckpoint())

    spark = df.sparkSession
    out_schema = T.StructType([
        df.schema[scn], df.schema[txc], df.schema[tyc],
        T.StructField("acc_bytes", T.BinaryType()),
        T.StructField("outflows", T.ArrayType(T.StructType([
            T.StructField("ttx", T.IntegerType()), T.StructField("tty", T.IntegerType()),
            T.StructField("cell", T.IntegerType()), T.StructField("amt", T.DoubleType()),
        ]))),
    ])

    def one_round(batches):
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                z = codec.decode(bytes(pdf["z_bytes"].iloc[i]))[0].astype(np.float64)
                direc = codec.decode(bytes(pdf["dir_bytes"].iloc[i]))[0].astype(np.int16)
                direc = np.where(direc == 255, -1, direc)
                ib = pdf["inflow_bytes"].iloc[i]
                inflow = (codec.decode(bytes(ib))[0].astype(np.float64)
                          if ib is not None else np.zeros_like(z))
                acc, outs = _local_acc_with_inflow(z, direc, inflow)
                tx, ty = int(pdf[txc].iloc[i]), int(pdf[tyc].iloc[i])
                rows.append({
                    scn: pdf[scn].iloc[i], txc: tx, tyc: ty,
                    "acc_bytes": codec.encode(acc.astype(np.float32)[None], "raw"),
                    "outflows": [{"ttx": tx + dtx, "tty": ty + dty,
                                  "cell": cell, "amt": amt}
                                 for dtx, dty, cell, amt in outs],
                })
            yield pd.DataFrame(rows, columns=[scn, txc, tyc, "acc_bytes", "outflows"])

    prev_checksum = None
    result = None
    for _round in range(max_rounds):
        result = state.mapInPandas(one_round, schema=out_schema).localCheckpoint()
        flows = (result.select(scn, F.explode("outflows").alias("o"))
                 .select(scn, F.col("o.ttx").alias(txc), F.col("o.tty").alias(tyc),
                         "o.cell", "o.amt"))
        checksum = (flows.agg(F.count("*"), F.round(F.sum("amt"), 6)).first()
                    if flows.head(1) else (0, 0.0))
        checksum = tuple(checksum) if not isinstance(checksum, tuple) else checksum
        if checksum == prev_checksum:
            break
        prev_checksum = checksum

        def build_inflow(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            inflow = np.zeros(tile * tile, dtype=np.float64)
            np.add.at(inflow, pdf["cell"].to_numpy(np.int64),
                      pdf["amt"].to_numpy(np.float64))
            return pd.DataFrame([{scn: key[0], txc: int(key[1]), tyc: int(key[2]),
                                  "inflow_bytes": codec.encode(
                                      inflow.reshape(tile, tile).astype(np.float32)[None],
                                      "raw")}])

        inflow_schema = T.StructType([df.schema[scn], df.schema[txc], df.schema[tyc],
                                      T.StructField("inflow_bytes", T.BinaryType())])
        inflows = (flows.groupBy(scn, txc, tyc)
                   .applyInPandas(build_inflow, schema=inflow_schema))
        state = (state.drop("inflow_bytes")
                 .join(inflows, [scn, txc, tyc], "left")
                 .localCheckpoint())

    return result.select(scn, txc, tyc, F.col("acc_bytes").alias("bytes"))


def cti_distributed(df: DataFrame, tile: int,
                    grid_cols: tuple[str, str, str] = ("scene_id", "tx", "ty"),
                    cellsize: float = 1.0, fmt_out: str = "zlib") -> DataFrame:
    """Fully distributed CTI: exact flow accumulation via boundary-flow
    exchange + halo-computed slope, combined with a tile-key join — no
    whole-scene assembly anywhere (supersedes cti_scene's memory bound)."""
    from .focal import apply_focal, slope as slope_op
    from .multiraster import two_raster_op
    acc = flow_accumulation_distributed(df, tile, grid_cols, fmt_out="raw")
    slp = apply_focal(df, slope_op(cellsize=cellsize), fmt_out="raw",
                      grid_cols=grid_cols)

    def cti_fn(acc_px, slope_px):
        tan_s = np.maximum(np.tan(np.radians(slope_px[0].astype(np.float64))), 1e-6)
        return (np.log(((acc_px[0].astype(np.float64) + 1.0) * cellsize) / tan_s)
                .astype(np.float32))

    return two_raster_op(acc, slp, cti_fn, list(grid_cols), fmt_out=fmt_out,
                         name="cti")


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

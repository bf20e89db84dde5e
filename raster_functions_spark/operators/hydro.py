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


def _d8_targets(direc: np.ndarray) -> np.ndarray:
    """Flat index of each cell's downhill neighbor (-1 for pits and for
    flow exiting the grid). Vectorized."""
    h, w = direc.shape
    flat_dir = direc.ravel().astype(np.int64)
    idx = np.arange(h * w)
    rows, cols = np.divmod(idx, w)
    has = flat_dir >= 0
    d = np.where(has, flat_dir, 0)
    tr = rows + _D8[d, 0]
    tc = cols + _D8[d, 1]
    ok = has & (tr >= 0) & (tr < h) & (tc >= 0) & (tc < w)
    return np.where(ok, tr * w + tc, -1)


def _accumulate(target: np.ndarray, acc: np.ndarray) -> np.ndarray:
    """Exact flow accumulation over the acyclic functional graph
    ``target`` (one out-edge per cell, -1 = none), seeded with ``acc``
    (ones, plus boundary inflow in the distributed variant).

    Vectorized Kahn peeling: cells with in-degree 0 form the frontier;
    their finalized totals scatter-add (np.add.at) into their targets,
    whose in-degrees drop; newly-zero cells join the next frontier. Every
    edge is processed exactly once — O(E) total work in whole-array NumPy
    ops, #rounds = longest flow path. Replaces the per-pixel Python loop
    (1M interpreter iterations on a 1024² scene)."""
    n = acc.size
    valid = target >= 0
    indeg = np.bincount(target[valid], minlength=n)
    frontier = np.nonzero(indeg == 0)[0]
    while frontier.size:
        t = target[frontier]
        has = t >= 0
        ft = t[has]
        np.add.at(acc, ft, acc[frontier[has]])
        # decrement in-degrees by how many frontier edges entered each target
        indeg -= np.bincount(ft, minlength=n)
        cand = np.unique(ft)
        frontier = cand[indeg[cand] == 0]
    return acc


def flow_accumulation(z: np.ndarray) -> np.ndarray:
    """Number of upstream cells draining through each cell (self included).
    Exact solution of the reference's sparse system (I−Mᵀ)a = 1 over the
    acyclic D8 graph, via vectorized in-degree peeling (_accumulate)."""
    h, w = z.shape
    direc = d8_flow_direction(z)
    target = _d8_targets(direc)
    acc = np.ones(h * w, dtype=np.float64)
    return _accumulate(target, acc).reshape(h, w)


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
    acc = 1 + inflow, pushed along D8 directions (vectorized peeling,
    see _accumulate). Returns (acc, outflows) where outflows maps edge
    exits → (dtx, dty, target-cell-in-neighbor, amount).

    NOTE: the (r % h, c % w) outflow-target math assumes every tile in the
    grid has the same h×w shape (validated by the caller); with uniform
    tiles the wrapped coordinate is exactly the entry cell in the adjacent
    tile."""
    h, w = z.shape
    acc = _accumulate(_d8_targets(direc), 1.0 + inflow.reshape(-1).astype(np.float64))
    # boundary exits: direction points off-tile (vectorized collection)
    flat_dir = direc.reshape(-1).astype(np.int64)
    idx = np.arange(h * w)
    rows, cols = np.divmod(idx, w)
    has = flat_dir >= 0
    d = np.where(has, flat_dir, 0)
    r = rows + _D8[d, 0]
    c = cols + _D8[d, 1]
    exits = has & ((r < 0) | (r >= h) | (c < 0) | (c >= w))
    er, ec, ei = r[exits], c[exits], idx[exits]
    dty = np.where(er < 0, -1, np.where(er >= h, 1, 0))
    dtx = np.where(ec < 0, -1, np.where(ec >= w, 1, 0))
    cell = (er % h) * w + (ec % w)
    out = [(int(a), int(b), int(cl), float(acc[i]))
           for a, b, cl, i in zip(dtx, dty, cell, ei)]
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
                if z.shape != (tile, tile):
                    # the cross-tile outflow target math assumes a uniform
                    # tile×tile grid — fail loudly instead of mis-routing
                    raise ValueError(
                        f"flow_accumulation_distributed requires uniform "
                        f"{tile}×{tile} tiles, got {z.shape} at "
                        f"({pdf[txc].iloc[i]}, {pdf[tyc].iloc[i]})")
                direc = codec.decode(bytes(pdf["dir_bytes"].iloc[i]))[0].astype(np.int16)
                direc = np.where(direc == 255, -1, direc)
                ib = pdf["inflow_bytes"].iloc[i]
                inflow = (codec.decode(bytes(ib))[0].astype(np.float64)
                          if ib is not None else np.zeros_like(z))
                acc, outs = _local_acc_with_inflow(z, direc, inflow)
                tx, ty = int(pdf[txc].iloc[i]), int(pdf[tyc].iloc[i])
                rows.append({
                    scn: pdf[scn].iloc[i], txc: tx, tyc: ty,
                    # f8: accumulation COUNTS must stay exact — float32
                    # rounds +1 increments away beyond 2^24 cells, silently
                    # corrupting large basins AND the convergence checksum
                    "acc_bytes": codec.encode(acc.astype(np.float64)[None], "raw"),
                    "outflows": [{"ttx": tx + dtx, "tty": ty + dty,
                                  "cell": cell, "amt": amt}
                                 for dtx, dty, cell, amt in outs],
                })
            yield pd.DataFrame(rows, columns=[scn, txc, tyc, "acc_bytes", "outflows"])

    prev_checksum = None
    result = None
    converged = False
    for _round in range(max_rounds):
        result = state.mapInPandas(one_round, schema=out_schema).localCheckpoint()
        flows = (result.select(scn, F.explode("outflows").alias("o"))
                 .select(scn, F.col("o.ttx").alias(txc), F.col("o.tty").alias(tyc),
                         "o.cell", "o.amt"))
        checksum = (flows.agg(F.count("*"), F.round(F.sum("amt"), 6)).first()
                    if flows.head(1) else (0, 0.0))
        checksum = tuple(checksum) if not isinstance(checksum, tuple) else checksum
        if checksum == prev_checksum:
            converged = True
            break
        prev_checksum = checksum

        def build_inflow(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            inflow = np.zeros(tile * tile, dtype=np.float64)
            np.add.at(inflow, pdf["cell"].to_numpy(np.int64),
                      pdf["amt"].to_numpy(np.float64))
            return pd.DataFrame([{scn: key[0], txc: int(key[1]), tyc: int(key[2]),
                                  "inflow_bytes": codec.encode(
                                      inflow.reshape(tile, tile)[None],
                                      "raw")}])

        inflow_schema = T.StructType([df.schema[scn], df.schema[txc], df.schema[tyc],
                                      T.StructField("inflow_bytes", T.BinaryType())])
        inflows = (flows.groupBy(scn, txc, tyc)
                   .applyInPandas(build_inflow, schema=inflow_schema))
        state = (state.drop("inflow_bytes")
                 .join(inflows, [scn, txc, tyc], "left")
                 .localCheckpoint())

    if not converged:
        # a scene whose longest flow path crosses > max_rounds tiles has
        # not stabilized — returning silently would be inexact (the
        # function's contract is EXACT accumulation)
        raise RuntimeError(
            f"flow_accumulation_distributed: boundary flows did not "
            f"stabilize within max_rounds={max_rounds}; raise max_rounds "
            f"(needed ≈ longest flow path in tiles)")

    final_schema = T.StructType([
        df.schema[scn], df.schema[txc], df.schema[tyc],
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()), T.StructField("h", T.IntegerType()),
        T.StructField("bands", T.IntegerType()),
        T.StructField("dtype", T.StringType()),
        T.StructField("fmt", T.StringType())])

    def finalize(batches):
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                acc = codec.decode(bytes(pdf["acc_bytes"].iloc[i]))
                rows.append({scn: pdf[scn].iloc[i],
                             txc: int(pdf[txc].iloc[i]),
                             tyc: int(pdf[tyc].iloc[i]),
                             "bytes": codec.encode(acc, fmt_out),
                             "w": acc.shape[2], "h": acc.shape[1],
                             "bands": acc.shape[0], "dtype": "f8",
                             "fmt": fmt_out})
            yield pd.DataFrame(rows, columns=[f.name for f in final_schema])

    # rounds iterate on raw (re-encoding per round would be waste); the
    # REQUESTED fmt_out applies to the final product only
    if fmt_out == "raw":
        return result.select(
            scn, txc, tyc, F.col("acc_bytes").alias("bytes"),
            F.lit(tile).alias("w"), F.lit(tile).alias("h"),
            F.lit(1).alias("bands"), F.lit("f8").alias("dtype"),
            F.lit("raw").alias("fmt"))
    return result.select(scn, txc, tyc, "acc_bytes").mapInPandas(
        finalize, schema=final_schema)


def cti_distributed(df: DataFrame, tile: int,
                    grid_cols: tuple[str, str, str] = ("scene_id", "tx", "ty"),
                    cellsize: float = 1.0, fmt_out: str = "zlib") -> DataFrame:
    """Fully distributed CTI: exact flow accumulation via boundary-flow
    exchange + halo-computed slope, combined with a tile-key join — no
    whole-scene assembly anywhere (supersedes cti_scene's memory bound)."""
    from .focal import apply_focal, slope as slope_op
    from .multiraster import two_raster_op
    acc = flow_accumulation_distributed(df, tile, grid_cols, fmt_out="raw")
    # meta_cols=(): the slope op would otherwise override ``cellsize`` with
    # the tile's cell_dx column while the (acc+1)*cellsize term kept the
    # argument — the two factors MUST use the same spacing (cti_scene uses
    # the column for both; here the argument is authoritative for both)
    slp = apply_focal(df, slope_op(cellsize=cellsize), fmt_out="raw",
                      meta_cols=(), grid_cols=grid_cols)

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

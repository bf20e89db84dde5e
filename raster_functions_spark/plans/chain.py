"""Declarative function-chain specs — the engine's answer to .rft.xml.

The reference serializes logical plans as nested RasterFunctionTemplate
XML trees (SURVEY.md §3 entry point 2: VineyardAnalysis.rft.xml composes
a Python operator over nested Slope/Aspect built-ins, with variables at
the leaves). Here a chain is a JSON-able list of operator specs:

    [
      {"op": "stretch", "args": {"in_min": 0, "in_max": 255}},
      {"op": "calculator", "args": {"expression": "Sin(a)*2",
                                    "band_names": {"a": 0}}},
      {"op": "hillshade", "args": {"cellsize": 0.001}},   # focal → halo
    ]

``build_chain`` resolves names against the operator registry and fuses
consecutive zero-padding ops into single mapInPandas passes (SURVEY.md
O11); focal ops split the pipeline at halo-exchange boundaries. The
registry plays the role of the XML ``PythonModule``/``ClassName`` dynamic
binding (deprecated/NDVI.rft.xml:12-27).
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame

from ..raster import TileOp, apply_chain
from ..operators import effects, focal, pointwise

REGISTRY: dict[str, Callable[..., TileOp]] = {
    # pointwise (F-class)
    "ndvi": pointwise.ndvi,
    "nbr": pointwise.nbr,
    "arithmetic": pointwise.band_arithmetic,
    "windchill": pointwise.windchill,
    "heat_index": pointwise.heat_index,
    "fuzzy_membership": pointwise.fuzzy_membership,
    "qa_bitmask": pointwise.qa_bitmask,
    "qa_clear": pointwise.qa_clear,
    "replace_value": pointwise.replace_value,
    "fill_constant": pointwise.fill_constant,
    "mask_apply": pointwise.mask_apply,
    "calculator": pointwise.calculator,
    "latitude": pointwise.latitude_source,
    "random": pointwise.random_source,
    "vineyard": pointwise.vineyard_suitability,
    "fish_habitat": pointwise.fish_habitat_suitability,
    "per_second_to_per_month": pointwise.per_second_to_per_month,
    "stretch": pointwise.stretch,
    "remap": pointwise.remap,
    "colormap": pointwise.colormap,
    "composite_bands": pointwise.composite_bands,
    "vector_field": pointwise.vector_field,
    # focal (W-class; padding > 0 → halo exchange)
    "hillshade": focal.hillshade,
    "multidirectional_hillshade": focal.multidirectional_hillshade,
    "slope": focal.slope,
    "aspect": focal.aspect,
    "aspect_slope_class": focal.aspect_slope_class,
    "rank_filter": focal.rank_filter,
    "mask_erode": focal.mask_erode,
    "focal_statistics": focal.focal_statistics,
    "block_statistics": focal.block_statistics,
    # block effects (F15)
    "cubism": effects.cubism,
    "chuck_close": effects.chuck_close,
}


def register(name: str, builder: Callable[..., TileOp]) -> None:
    """Plugin registration — the UDF-protocol analog (SURVEY.md §2.11)."""
    REGISTRY[name] = builder


def parse_chain(spec) -> list[TileOp]:
    """Spec (list / JSON string) → list of TileOps."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    ops = []
    for node in spec:
        name = node["op"]
        if name not in REGISTRY:
            raise ValueError(f"unknown operator {name!r}; known: {sorted(REGISTRY)}")
        ops.append(REGISTRY[name](**node.get("args", {})))
    return ops


def build_chain(df: DataFrame, spec, fmt_out: str = "zlib",
                meta_cols: tuple[str, ...] = (),
                grid_cols: tuple[str, str, str] = ("scene_id", "tx", "ty")) -> DataFrame:
    """Apply a chain spec to a tile table: consecutive pointwise ops fuse
    into one decode→kernels→encode pass; each focal op becomes a halo
    exchange stage."""
    ops = parse_chain(spec)
    pending: list[TileOp] = []
    out = df
    for op in ops:
        if op.padding == 0:
            pending.append(op)
        else:
            if pending:
                out = apply_chain(out, pending, fmt_out=fmt_out, meta_cols=meta_cols)
                pending = []
            out = focal.apply_focal(out, op, fmt_out=fmt_out, grid_cols=grid_cols)
    if pending:
        out = apply_chain(out, pending, fmt_out=fmt_out, meta_cols=meta_cols)
    return out

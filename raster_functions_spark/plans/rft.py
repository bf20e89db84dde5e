"""Importer for the reference's .rft.xml raster-function templates.

The reference serializes logical plans as nested ``RasterFunctionTemplate``
XML trees (its actual plan IR — SURVEY.md §3 entry point 2). ``load_rft``
parses a template file and compiles it to the engine's chain spec, so the
two templates that ship with the reference execute end to end on Spark:

- ``VineyardAnalysis.rft.xml`` — a PythonAdapterFunction over three inputs
  (elevation + nested Slope + nested Aspect sub-templates of the same base
  raster); compiles to a ``branch_stack`` (each branch re-derives from the
  base tile table, halo exchanges included) followed by the vineyard op.
- ``TerrainRuggednessIndex-Riley-Colormap.rft.xml`` — TableFunction ∘
  RemapFunction ∘ RasterCalculatorFunction with focal calls inside the
  calculator expression (``Focal_Max(DEM,3,3)`` …); the importer lifts
  each focal call into its own branch and rewrites the expression over
  the stacked bands.

Template semantics notes:

- RemapFunction InputRanges are (min, max) pairs, min inclusive / max
  exclusive, matching the engine's half-open ``remap`` intervals;
  unmatched pixels fall to the remap default (the reference's
  AllowUnmatched=false → NoData analog).
- The calculator expression language maps onto the engine calculator's
  restricted NumPy namespace (Sin/Cos/…/Square/SquareRoot).
- Scene-level rendering hints with no pixel semantics (PSPower,
  RemoveEdgeEffect, colormap Alpha) are parsed and ignored.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET

_XSI_TYPE = "{http://www.w3.org/2001/XMLSchema-instance}type"


class _RasterInput:
    """Marker: a dataset variable — the chain's base raster."""

    def __repr__(self) -> str:  # pragma: no cover
        return "<raster input>"


RASTER_INPUT = _RasterInput()


def _xsitype(elem) -> str:
    return (elem.get(_XSI_TYPE) or "").split(":")[-1]


def _text(elem) -> str:
    return (elem.text or "").strip()


def _parse_any(elem):
    t = _xsitype(elem)
    if t == "string":
        return _text(elem)
    if t == "double":
        return float(_text(elem))
    if t in ("int", "long", "short", "unsignedInt"):
        return int(_text(elem))
    if t == "boolean":
        return _text(elem).lower() == "true"
    if t == "ArrayOfDouble":
        return [float(_text(d)) for d in elem]
    if t == "ArrayOfString":
        return [_text(d) for d in elem]
    if t == "ArrayOfInt":
        return [int(_text(d)) for d in elem]
    if t == "ArrayOfArgument":
        return [_parse_any(a) for a in elem]
    if t == "RasterFunctionTemplate":
        return parse_template(elem)
    if t == "RasterFunctionVariable":
        return _parse_variable(elem)
    if t == "RecordSet":
        return _parse_recordset(elem)
    return _text(elem) or None


def _parse_variable(elem):
    val = elem.find("Value")
    isds = elem.find("IsDataset")
    if val is not None and _xsitype(val):
        return _parse_any(val)
    if isds is not None and _text(isds).lower() == "true":
        return RASTER_INPUT
    return _text(val) or None if val is not None else None


def _parse_recordset(elem) -> dict:
    fields = [_text(f.find("Name"))
              for f in elem.find("Fields").find("FieldArray")]
    records = []
    recs = elem.find("Records")
    if recs is not None:
        for rec in recs:
            vals = [_parse_any(v) for v in rec.find("Values")]
            records.append(dict(zip(fields, vals)))
    return {"fields": fields, "records": records}


def parse_template(elem) -> dict:
    """<RasterFunctionTemplate> element → {function, name, args}."""
    func = elem.find("Function")
    args_el = elem.find("Arguments")
    if _xsitype(args_el) == "RasterFunctionVariable":
        args = {"Raster": _parse_variable(args_el)}
    else:
        names = [_text(s) for s in args_el.find("Names")]
        vals = [_parse_any(v) for v in args_el.find("Values")]
        args = dict(zip(names, vals))
    return {"function": _xsitype(func),
            "name": _text(elem.find("Name")), "args": args}


def parse_rft(path: str) -> dict:
    return parse_template(ET.parse(path).getroot())


# ------------------------------------------------------------- compile -----

# PythonAdapterFunction mappings: template class (ClassName, or the
# PythonModule basename when ClassName is blank — many shipped templates
# leave it empty) → registry op + band-kwarg names for multi-raster
# inputs + scalar-argument translations {xml_name: (engine_kwarg, conv)}.
# XML names absent from "scalars" are rendering/host hints with no pixel
# semantics (e.g. RankFilter 'res', Hillshade 'ce'/'cf') and are ignored.

_T_UNITS = {"fahrenheit": "f", "celsius": "c", "kelvin": "k"}
_W_UNITS = {"mph": "mph", "m/s": "m/s", "kph": "kph", "knots": "knots",
            "ft/s": "ft/s"}


def _require_f(v: str) -> str:
    if str(v).lower() != "fahrenheit":
        raise ValueError("engine heat_index implements the Fahrenheit "
                         "Rothfusz regression; convert inputs upstream")
    return "f"


ADAPTER_CLASSES: dict[str, dict] = {
    "VineyardAnalysis": {"op": "vineyard",
                         "bands": ("elev_band", "slope_band", "aspect_band")},
    "BlockStatistics": {"op": "block_statistics", "scalars": {
        "measure": ("measure", lambda v: str(v).lower()),
        "factor": ("factor", int)}},
    "RankFilter": {"op": "rank_filter", "scalars": {
        "measure": ("measure", lambda v: str(v).lower()),
        "size": ("size", int)}},
    "FocalStatistics": {"op": "focal_statistics", "scalars": {
        "factor": ("size", int)}},
    "FillRaster": {"op": "fill_constant", "scalars": {
        "value": ("value", float)}},
    "MaskRaster": {"op": "mask_apply",
                   "bands": ("value_band", "mask_band")},
    "Windchill": {"op": "windchill", "bands": ("temp_band", "wind_band"),
                  "scalars": {
        "tunits": ("t_units", lambda v: _T_UNITS[str(v).lower()]),
        "wunits": ("w_units", lambda v: _W_UNITS[str(v).lower()]),
        "ounits": ("out_units", lambda v: _T_UNITS[str(v).lower()])}},
    "HeatIndex": {"op": "heat_index", "bands": ("temp_band", "rh_band"),
                  "validate": {"units": _require_f, "outunits": _require_f}},
    "NDVI": {"op": "ndvi", "scalars": {
        "red": ("red_band", lambda v: int(v) - 1),     # template bands 1-based
        "ir": ("nir_band", lambda v: int(v) - 1),
        "method": ("scaled", lambda v: {"Raw": False, "Grayscale": True,
                                        "Colormap": True}[str(v)])}},
    "Arithmetic": {"op": "arithmetic",
                   "bands": ("a_band", "b_band"), "scalars": {
        "op": ("op", lambda v: {"Add": "add", "Subtract": "sub",
                                "Multiply": "mul", "Divide": "div"}[str(v)])}},
    "ConvertPerSecondToPerMonth": {"op": "per_second_to_per_month"},
    "Hillshade": {"op": "hillshade", "scalars": {
        "zf": ("z_factor", float)}},
    "MultidirectionalHillshade": {"op": "multidirectional_hillshade"},
    "Random": {"op": "random"},
    "ReplaceNulls": {"op": "replace_value", "scalars": {
        "fill_val": ("fill", float)}, "defaults": {"match": 0.0}},
    "FishHabitatSuitability": {"op": "fish_habitat",
                               "bands": ("temp_band", "salinity_band"),
                               "scalars": {"depth": ("depth", float)},
                               "defaults": {"depth": 0.0}},
    "LinearSpectralUnmixing": {"op": "linear_unmixing", "scalars": {
        # signatures arrive as a JSON dict {endmember: spectrum}; the engine
        # takes the (n_bands, n_endmembers) matrix in declaration order
        "signatures": ("signatures", lambda v: [
            list(col) for col in zip(*__import__("json").loads(str(v)).values())])}},
}

_FOCAL_CALL = re.compile(
    r"Focal_(Max|Min|Mean|Median)\(\s*(\w+)\s*,\s*(\d+)\s*,\s*(\d+)\s*\)")


def _is_raster(v) -> bool:
    return v is RASTER_INPUT or (isinstance(v, dict) and "function" in v)


def _input(args: dict, *names):
    for n in names:
        if n in args and _is_raster(args[n]):
            return args[n]
    # fall back: the single raster-ish argument
    cands = [v for v in args.values() if _is_raster(v)]
    if len(cands) == 1:
        return cands[0]
    raise ValueError(f"cannot locate raster input among {sorted(args)}")


def compile_template(tmpl: dict) -> list:
    """Parsed template → engine chain spec (chain.build_chain input)."""
    return _compile(tmpl)


def _compile(node) -> list:
    if node is RASTER_INPUT:
        return []
    if not isinstance(node, dict) or "function" not in node:
        raise ValueError(f"not a raster node: {node!r}")
    f, a = node["function"], node["args"]
    if f == "SlopeFunction":
        return _compile(_input(a, "DEM", "Raster")) + [
            {"op": "slope", "args": {"z_factor": float(a.get("ZFactor") or 1.0)}}]
    if f == "AspectFunction":
        return _compile(_input(a, "Raster", "DEM")) + [{"op": "aspect"}]
    if f == "HillshadeFunction":
        return _compile(_input(a, "DEM", "Raster")) + [
            {"op": "hillshade", "args": {"z_factor": float(a.get("ZFactor") or 1.0),
                                         "azimuth": float(a.get("Azimuth") or 315.0),
                                         "altitude": float(a.get("Altitude") or 45.0)}}]
    if f == "RemapFunction":
        rngs = a.get("InputRanges") or []
        outs = a.get("OutputValues") or []
        intervals = [(float(rngs[2 * i]), float(rngs[2 * i + 1]), float(outs[i]))
                     for i in range(len(outs))]
        return _compile(_input(a, "Raster")) + [
            {"op": "remap", "args": {"intervals": intervals}}]
    if f == "StretchFunction":
        out_min = float(a.get("Min") or 0.0)
        out_max = float(a.get("Max") or 255.0)
        stype = int(a.get("StretchType") or 0)
        stats = (str(a.get("EstimateStatsHistogram")).lower() == "true"
                 or str(a.get("DRA")).lower() == "true")
        inner = _compile(_input(a, "Raster"))
        if stype == 0 and not stats:
            return inner + [{"op": "stretch",
                             "args": {"out_min": out_min, "out_max": out_max}}]
        if stype == 5:                           # MinMax over dataset stats
            return inner + [{"op": "stats_stretch",
                             "args": {"stretch_type": "minmax",
                                      "out_min": out_min, "out_max": out_max}}]
        if stype == 6:                           # PercentClip from histogram
            return inner + [{"op": "stats_stretch",
                             "args": {"stretch_type": "percent_clip",
                                      "min_percent": float(a.get("MinPercent") or 0.0),
                                      "max_percent": float(a.get("MaxPercent") or 0.0),
                                      "out_min": out_min, "out_max": out_max}}]
        raise ValueError(
            f"StretchFunction type {stype} (stddev/histogram-equalize/"
            "sigmoid) not mapped — MinMax (5) and PercentClip (6) run as "
            "two-pass table-level plans; others are display styling")
    if f == "BandArithmeticFunction":
        if int(a.get("Method") or 0) != 0:
            raise ValueError("BandArithmeticFunction predefined methods are "
                             "template-specific; only Method=0 (user "
                             "expression) maps to the calculator")
        expr = str(a.get("BandIndexes") or "")
        bands = {m: int(m[1:]) - 1 for m in set(re.findall(r"\bB\d+\b", expr))}
        return _compile(_input(a, "Raster")) + [
            {"op": "calculator",
             "args": {"expression": expr, "band_names": bands}}]
    if f == "TableFunction":
        rs = a.get("AttributeTable") or {"records": []}
        cmap = {int(r["Value"]): (int(r["Red"]), int(r["Green"]), int(r["Blue"]))
                for r in rs["records"]}
        return _compile(_input(a, "Raster")) + [
            {"op": "colormap", "args": {"cmap": cmap}}]
    if f == "CompositeBandFunction":
        rasters = a.get("Raster") or a.get("Rasters")
        if isinstance(rasters, list):       # band-per-raster composition
            return [{"op": "branch_stack",
                     "branches": [_compile(r) for r in rasters]},
                    {"op": "composite_bands", "args": {}}]
        if rasters is None:                 # 'Raster[]' array placeholder
            rasters = RASTER_INPUT
        return _compile(rasters) + [{"op": "composite_bands", "args": {}}]
    if f == "ExtractBandFunction":
        ids = a.get("BandIDs") or [0]
        return _compile(_input(a, "Raster")) + [
            {"op": "composite_bands", "args": {"bands": [int(i) for i in ids]}}]
    if f == "VectorFieldFunction":
        out = "uv" if "UV" in str(a.get("OutputDataType") or "MagDir") else "magdir"
        if _is_raster(a.get("Raster1")) and _is_raster(a.get("Raster2")):
            return [{"op": "branch_stack",
                     "branches": [_compile(a["Raster1"]), _compile(a["Raster2"])]},
                    {"op": "vector_field",
                     "args": {"u_band": 0, "v_band": 1, "output": out}}]
        return _compile(_input(a, "Raster")) + [
            {"op": "vector_field", "args": {"output": out}}]
    if f == "ColormapFunction":
        # an explicit value→RGB table maps to the colormap op; a NAMED color
        # scheme/ramp is pure display styling — pass the pixels through
        cm = a.get("Colormap")
        inner = _compile(_input(a, "Raster"))
        if isinstance(cm, dict) and cm.get("records"):
            table = {int(r["Value"]): (int(r["Red"]), int(r["Green"]), int(r["Blue"]))
                     for r in cm["records"]}
            return inner + [{"op": "colormap", "args": {"cmap": table}}]
        return inner
    if f == "ArithmeticFunction":
        ops = {1: "add", 2: "sub", 3: "mul", 4: "div"}
        rasters = a.get("Rasters") or [RASTER_INPUT, RASTER_INPUT]
        return [{"op": "branch_stack",
                 "branches": [_compile(r) for r in rasters]},
                {"op": "arithmetic",
                 "args": {"op": ops[int(a.get("Operation") or 1)],
                          "a_band": 0, "b_band": 1}}]
    if f == "RasterCalculatorFunction":
        return _compile_calculator(a)
    if f == "PythonAdapterFunction":
        return _compile_adapter(a)
    if f == "MergeRastersFunction":
        raise ValueError("MergeRastersFunction merges a raster COLLECTION — "
                         "use the table-level API: union/dedup merge "
                         "(contract query u1_union_dedup)")
    if f == "LocalFunction":
        raise ValueError("LocalFunction cell statistics run across a raster "
                         "COLLECTION — use the table-level API: stack "
                         "composites (query a1) / pointwise mask-replace ops")
    raise ValueError(f"unsupported .rft.xml function type {f!r}")


def _compile_calculator(a: dict) -> list:
    rasters = a.get("Rasters") or [RASTER_INPUT]
    names = a.get("InputNames") or a.get("Names") or ["Raster"]
    expr = a.get("Expression") or ""
    base = {nm: _compile(rasters[i]) for i, nm in enumerate(names)}
    branches: list[list] = []
    band_names: dict[str, int] = {}

    def add_branch(spec) -> str:
        key = f"b{len(branches)}"
        branches.append(spec)
        band_names[key] = len(branches) - 1
        return key

    # lift Focal_*(name, rows, cols) calls into focal branches
    seen: dict[str, str] = {}
    def lift(m: re.Match) -> str:
        meas, nm, rows, cols = m.group(1), m.group(2), m.group(3), m.group(4)
        if rows != cols:
            raise ValueError("non-square focal window in calculator expression")
        if m.group(0) not in seen:
            seen[m.group(0)] = add_branch(
                base[nm] + [{"op": "focal_statistics",
                             "args": {"measure": meas.lower(), "size": int(rows)}}])
        return seen[m.group(0)]

    expr = _FOCAL_CALL.sub(lift, expr)
    # remaining bare input-name references become identity branches
    for nm in names:
        if re.search(rf"\b{re.escape(nm)}\b", expr):
            key = add_branch(base[nm])
            expr = re.sub(rf"\b{re.escape(nm)}\b", key, expr)
    calc = {"op": "calculator",
            "args": {"expression": expr, "band_names": band_names}}
    if len(branches) == 1 and not branches[0]:
        return [calc]                      # plain expression over the base
    return [{"op": "branch_stack", "branches": branches}, calc]


# Classes whose semantics are MOSAIC/COLLECTION-level (they aggregate or
# route across many co-registered rasters of a mosaic dataset): an .rft
# chain is a per-tile plan, so these map to the engine's table-level API
# instead — the error names the exact entry point (and its oracle-checked
# contract query) so template users know where to go.
MOSAIC_LEVEL: dict[str, str] = {
    "FindMax": "stack.find_max_k rollup (contract query a8_topk_per_group)",
    "FindSecondMax": "stack.find_max_k rollup (contract query a8_topk_per_group)",
    "FindThirdMax": "stack.find_max_k rollup (contract query a8_topk_per_group)",
    "LandsatPixelPercentile": "stack QA-masked percentile (queries a4/a5, img_stack_median)",
    "LandsatImageSynthesis": "stack month synthesis (query a6_month_synthesis)",
    "Landsat_Image_Synthesis": "stack month synthesis (query a6_month_synthesis)",
    "PercentAboveThreshold": "stack.percent_above (queries a7, a7_px)",
    "SeasonalARIMA": "ml.sarima_stack_delta / sarima_forecast_by_group (m5_sarima)",
    "Aggregate": "stack aggregate composites (query a1)",
    "StepwiseLocalRadiometricAdjustment": "multiraster.cloud_fill (img_cloud_fill)",
    "TopographicCCorrection": "multiraster.topographic_c_correction (a9_regression)",
    "ZonalRemap": "spatial.zonal_remap_col — zone-table join (queries p9, j2)",
    "SelectByPixelSize": "pyramid resolution routing (query j8_routing)",
}


def _compile_adapter(a: dict) -> list:
    # identity: ClassName, else the PythonModule basename (many shipped
    # templates leave ClassName blank)
    cls = a.get("ClassName") or ""
    if not cls:
        mod = str(a.get("PythonModule") or "")
        cls = mod.replace("\\", "/").rsplit("/", 1)[-1]
    cls = cls.removesuffix(".pyd").removesuffix(".py")
    spec = ADAPTER_CLASSES.get(cls)
    if spec is None:
        if cls in MOSAIC_LEVEL:
            raise ValueError(
                f"{cls} operates across a raster COLLECTION, not per tile — "
                f"use the engine's table-level API: {MOSAIC_LEVEL[cls]}")
        raise ValueError(
            f"PythonAdapterFunction class {cls!r} has no registered engine "
            f"mapping (known: {sorted(ADAPTER_CLASSES)}); register the "
            "operator in chain.REGISTRY and add it to ADAPTER_CLASSES")
    for name, check in (spec.get("validate") or {}).items():
        if a.get(name) is not None:
            check(a[name])
    args: dict = dict(spec.get("defaults") or {})
    for xml_name, (kw, conv) in (spec.get("scalars") or {}).items():
        if a.get(xml_name) is not None:
            args[kw] = conv(a[xml_name])
    raster_ins = [(k, v) for k, v in a.items()
                  if k not in ("PythonModule", "ClassName") and _is_raster(v)]
    branches = [_compile(v) for _, v in raster_ins]
    band_kwargs = spec.get("bands") or ()
    args.update({kw: i for i, kw in enumerate(band_kwargs[:len(branches)])})
    node = {"op": spec["op"], "args": args}
    if len(branches) <= 1:
        return (branches[0] if branches else []) + [node]
    return [{"op": "branch_stack", "branches": branches}, node]


def load_rft(path: str) -> list:
    """Parse + compile an .rft.xml file into an engine chain spec."""
    return compile_template(parse_rft(path))

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


def _num(a: dict, key: str, default):
    """Numeric arg with a None-aware default: ``a.get(key) or d`` swallows
    a legitimate explicit 0/0.0 (e.g. Azimuth=0 = sun due north) and
    silently substitutes the default — only absence may default."""
    v = a.get(key)
    return default if v is None else type(default)(v)


def _compile(node) -> list:
    if node is RASTER_INPUT:
        return []
    if not isinstance(node, dict) or "function" not in node:
        raise ValueError(f"not a raster node: {node!r}")
    f, a = node["function"], node["args"]
    if f == "SlopeFunction":
        return _compile(_input(a, "DEM", "Raster")) + [
            {"op": "slope", "args": {"z_factor": _num(a, "ZFactor", 1.0)}}]
    if f == "AspectFunction":
        return _compile(_input(a, "Raster", "DEM")) + [{"op": "aspect"}]
    if f == "HillshadeFunction":
        return _compile(_input(a, "DEM", "Raster")) + [
            {"op": "hillshade", "args": {"z_factor": _num(a, "ZFactor", 1.0),
                                         "azimuth": _num(a, "Azimuth", 315.0),
                                         "altitude": _num(a, "Altitude", 45.0)}}]
    if f == "RemapFunction":
        rngs = a.get("InputRanges") or []
        outs = a.get("OutputValues") or []
        intervals = [(float(rngs[2 * i]), float(rngs[2 * i + 1]), float(outs[i]))
                     for i in range(len(outs))]
        return _compile(_input(a, "Raster")) + [
            {"op": "remap", "args": {"intervals": intervals}}]
    if f == "StretchFunction":
        out_min = _num(a, "Min", 0.0)
        out_max = _num(a, "Max", 255.0)
        stype = _num(a, "StretchType", 0)
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
                                      "min_percent": _num(a, "MinPercent", 0.0),
                                      "max_percent": _num(a, "MaxPercent", 0.0),
                                      "out_min": out_min, "out_max": out_max}}]
        if stype == 3:                           # StandardDeviation (μ ± nσ)
            return inner + [{"op": "stats_stretch",
                             "args": {"stretch_type": "stddev",
                                      "n_std": _num(
                                          a, "NumberOfStandardDeviation",
                                          2.0),
                                      "out_min": out_min, "out_max": out_max}}]
        if stype == 4:                           # Histogram Equalize (CDF)
            return inner + [{"op": "stats_stretch",
                             "args": {"stretch_type": "hist_equalize",
                                      "out_min": out_min, "out_max": out_max}}]
        raise ValueError(
            f"StretchFunction type {stype} (sigmoid/custom) not mapped — "
            "MinMax (5), PercentClip (6), StdDev (3) and HistogramEqualize "
            "(4) run as two-pass table-level plans; sigmoid is display "
            "styling with no published pixel formula")
    if f == "BandArithmeticFunction":
        if _num(a, "Method", 0) != 0:
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
                 "args": {"op": ops[_num(a, "Operation", 1)],
                          "a_band": 0, "b_band": 1}}]
    if f == "RasterCalculatorFunction":
        return _compile_calculator(a)
    if f == "PythonAdapterFunction":
        return _compile_adapter(a)
    if f == "MergeRastersFunction":
        # mosaic FIRST merge: per-pixel first-valid member along the
        # collection order (deprecated/MergeRasters.rft.xml binds the
        # collection at runtime)
        return [{"op": "mosaic", "kind": "merge_first", "args": {}}]
    if f == "LocalFunction":
        return _compile_local(a)
    raise ValueError(f"unsupported .rft.xml function type {f!r}")


def _compile_local(a: dict) -> list:
    """LocalFunction trees. The only shipped use is RemoveNoData.rft.xml:
    an outer 3-input Local over [Local(op 31)(A), B, A] — structurally
    Con(IsNull(A), B, A), i.e. per-pixel coalesce(A, B) (the op-code
    reading is inferred from the 1-input-inner/3-input-outer shape and the
    template's name; the numeric enum is not publicly documented). That is
    exactly the mosaic first-valid composite."""
    op = _num(a, "Operation", 0)
    rasters = a.get("Rasters") or []
    inner_local = [r for r in rasters if isinstance(r, dict)
                   and r.get("function") == "LocalFunction"]
    if len(rasters) == 3 and len(inner_local) == 1 and op == 78:
        return [{"op": "mosaic", "kind": "merge_first", "args": {}}]
    raise ValueError(
        f"LocalFunction operation {op} over {len(rasters)} rasters has no "
        "engine mapping — general cell statistics across a COLLECTION run "
        "through the table-level API: stack composites (query a1)")


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
    if not branches:
        # constant-only expression (no raster references): a zero-branch
        # branch_stack would IndexError deep in stack_tiles — refuse with
        # the actionable template-level error instead
        raise ValueError(
            f"RasterCalculator expression {expr!r} references none of its "
            f"raster inputs {names} — use a FillRaster/fill_constant node "
            "for constant rasters")
    if len(branches) == 1 and not branches[0]:
        return [calc]                      # plain expression over the base
    return [{"op": "branch_stack", "branches": branches}, calc]


# Classes whose semantics are MOSAIC/COLLECTION-level (they aggregate or
# route across many co-registered rasters of a mosaic dataset —
# `__IsRasterArray__` variables with MatchVariable/UnionDimension
# PropertySets). A per-tile chain can't express them; they compile to a
# {"op": "mosaic", "kind": ..., "args": {...}} node that build_chain routes
# to plans.mosaic.apply_mosaic — a groupBy(tile position) stack reduction
# on the collection's tile table. Each entry: kind + the scalar template
# arguments to forward ({xml_name: conv}).
MOSAIC_CLASSES: dict[str, dict] = {
    "FindMax": {"kind": "find_max_k", "const": {"k": 1}},
    "FindSecondMax": {"kind": "find_max_k", "const": {"k": 2}},
    "FindThirdMax": {"kind": "find_max_k", "const": {"k": 3}},
    "LandsatPixelPercentile": {"kind": "pixel_percentile", "scalars": {
        "sensor": str, "percentile": float, "start_day": int,
        "start_year": int, "end_day": int, "end_year": int}},
    "LandsatImageSynthesis": {"kind": "month_synthesis", "scalars": {
        "sensor": str, "predict_month": str}},
    "Landsat_Image_Synthesis": {"kind": "month_synthesis", "scalars": {
        "predict_month": str}},
    "PercentAboveThreshold": {"kind": "percent_above", "scalars": {
        "threshold": float, "start_date": str, "end_date": str}},
    "SeasonalARIMA": {"kind": "sarima_delta", "scalars": {
        "data_start_year": int, "train_start_year": int,
        "train_end_year": int, "predict_year": int, "predict_month": str,
        "seasonal_order": lambda v: tuple(
            int(x) for x in str(v).split(","))}},
    "Aggregate": {"kind": "aggregate", "scalars": {"method": str}},
    "StepwiseLocalRadiometricAdjustment": {"kind": "stepwise_adjust",
                                           "scalars": {"size_of_window": int}},
    "TopographicCCorrection": {"kind": "topographic_c"},
}


def _compile_mosaic_adapter(cls: str, spec: dict, a: dict) -> list:
    args: dict = dict(spec.get("const") or {})
    for xml_name, conv in (spec.get("scalars") or {}).items():
        if a.get(xml_name) is not None:
            args[xml_name] = conv(a[xml_name])
    node = {"op": "mosaic", "kind": spec["kind"], "args": args}
    # real (non-placeholder) raster inputs become a pre-chain applied to
    # every collection member before the stack reduction
    raster_ins = [(k, v) for k, v in a.items()
                  if k not in ("PythonModule", "ClassName") and _is_raster(v)
                  and v is not RASTER_INPUT]
    if len(raster_ins) > 1:
        # a mosaic-level template binding several real raster inputs needs
        # branch_stack composition — refuse loudly rather than silently
        # dropping all but the first (round-4 ADVICE)
        raise ValueError(
            f"mosaic template {cls} binds {len(raster_ins)} real raster "
            f"inputs ({[k for k, _ in raster_ins]}); only one pre-chain "
            "input is supported — compose the others via branch_stack")
    if raster_ins:
        pre = _compile(raster_ins[0][1])
        return pre + [node]
    return [node]


def _compile_zonal_remap(a: dict) -> list:
    """deprecated/ZonalRemap.rft.xml → the per-pixel zonal_remap TileOp
    over a 2-branch stack (value raster = band 0, zone raster = band 1).
    The template's ztable may carry an inline RecordSet; the shipped file
    leaves it blank (bound at runtime) → a {"$ctx": "zones"} placeholder
    that build_chain resolves from its ctx dict (zones: list of
    {zone_id, zmin, zmax, zval} rows, open ends as None)."""
    zid = str(a.get("zid") or "ZoneID")
    zmin = str(a.get("zmin") or "ZoneMin")
    zmax = str(a.get("zmax") or "ZoneMax")
    zval = str(a.get("zval") or "ZoneValue")
    zt = a.get("ztable")
    if isinstance(zt, dict) and zt.get("records"):
        zones = [{"zone_id": int(r[zid]), "zmin": r.get(zmin),
                  "zmax": r.get(zmax), "zval": r.get(zval)}
                 for r in zt["records"]]
    else:
        zones = {"$ctx": "zones"}
    args = {"zones": zones, "value_band": 0, "zone_band": 1,
            "default": _num(a, "defzval", 255.0),
            "background": _num(a, "background", 0.0)}
    vr = a.get("vraster", RASTER_INPUT)
    zr = a.get("zraster", RASTER_INPUT)
    if not _is_raster(zr):      # zone raster optional (ZonalRemap.py:170)
        raise ValueError("ZonalRemap without a zone raster applies one "
                         "global interval table — use the table-level API: "
                         "pointwise remap (query f14_remap)")
    return [{"op": "branch_stack", "branches": [_compile(vr), _compile(zr)]},
            {"op": "zonal_remap", "args": args}]


def _compile_adapter(a: dict) -> list:
    # identity: ClassName, else the PythonModule basename (many shipped
    # templates leave ClassName blank)
    cls = a.get("ClassName") or ""
    if not cls:
        mod = str(a.get("PythonModule") or "")
        cls = mod.replace("\\", "/").rsplit("/", 1)[-1]
    cls = cls.removesuffix(".pyd").removesuffix(".py")
    if cls in MOSAIC_CLASSES:
        return _compile_mosaic_adapter(cls, MOSAIC_CLASSES[cls], a)
    if cls == "SelectByPixelSize":
        # two real raster inputs routed by request cell size — a structural
        # node build_chain resolves against ctx['request_cellsize'] (or the
        # table's own cell size), matching SelectByPixelSize.py:updatePixels
        return [{"op": "select_by_pixel_size",
                 "args": {"threshold": _num(a, "threshold", 0.0)},
                 "branches": [_compile(_input(a, "r1")),
                              _compile(_input(a, "r2"))]}]
    if cls == "ZonalRemap":
        return _compile_zonal_remap(a)
    spec = ADAPTER_CLASSES.get(cls)
    if spec is None:
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

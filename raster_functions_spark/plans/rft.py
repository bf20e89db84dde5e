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

# PythonAdapterFunction ClassName → (registry op, band-kwarg names in the
# template's declared input order)
ADAPTER_CLASSES: dict[str, tuple[str, tuple[str, ...]]] = {
    "VineyardAnalysis": ("vineyard", ("elev_band", "slope_band", "aspect_band")),
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
        return _compile(_input(a, "Raster")) + [{"op": "stretch", "args": {}}]
    if f == "TableFunction":
        rs = a.get("AttributeTable") or {"records": []}
        cmap = {int(r["Value"]): (int(r["Red"]), int(r["Green"]), int(r["Blue"]))
                for r in rs["records"]}
        return _compile(_input(a, "Raster")) + [
            {"op": "colormap", "args": {"cmap": cmap}}]
    if f == "RasterCalculatorFunction":
        return _compile_calculator(a)
    if f == "PythonAdapterFunction":
        return _compile_adapter(a)
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


def _compile_adapter(a: dict) -> list:
    cls = a.get("ClassName") or ""
    if cls not in ADAPTER_CLASSES:
        raise ValueError(
            f"PythonAdapterFunction class {cls!r} has no registered engine "
            f"mapping (known: {sorted(ADAPTER_CLASSES)}); register the "
            "operator in chain.REGISTRY and add it to ADAPTER_CLASSES")
    op, band_kwargs = ADAPTER_CLASSES[cls]
    raster_ins = [(k, v) for k, v in a.items()
                  if k not in ("PythonModule", "ClassName") and _is_raster(v)]
    branches = [_compile(v) for _, v in raster_ins]
    args = {kw: i for i, kw in enumerate(band_kwargs[:len(branches)])}
    return [{"op": "branch_stack", "branches": branches},
            {"op": op, "args": args}]


def load_rft(path: str) -> list:
    """Parse + compile an .rft.xml file into an engine chain spec."""
    return compile_template(parse_rft(path))

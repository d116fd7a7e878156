"""Discretize — split long links into chains of interpolated nodes.

Reference semantics (src/discretize.rs:5-52): for each link,
``part = trunc(haversine/delta)``; if ``part > 1`` replace the link by
``part-1`` interior nodes at planar interpolation ``i/part`` named
``"{min}-{max}:{i}/{part}"``, chained source→1→…→part-1→target.

This is the cleanest pure-DataFrame operator in the pipeline: every
link is independent (the reference's snapshot loop never interacts
across links), so one narrow pass: join coords → floor → explode
sequence → interpolate → two unions. No iteration, no conflicts; the
only shuffles are the coord joins and the final dedups.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ophois_spark.functions import fmt_f64, interpolate_xy
from ophois_spark.operators.graph import StreetGraph


def discretize(g: StreetGraph, delta: float) -> StreetGraph:
    ewc = g.edges_with_coords().withColumn(
        "part", F.floor(F.col("dist_m") / F.lit(delta))
    )
    split = ewc.filter(F.col("part") > 1)
    kept = ewc.filter((F.col("part") <= 1) | F.col("part").isNull()).select("src", "dst")

    base = F.concat_ws("-", "src", "dst")  # src<dst already canonical = determinist(u,v)

    pts = split.withColumn("i", F.explode(F.sequence(F.lit(1), (F.col("part") - 1).cast("int"))))
    t = F.col("i").cast("double") / F.col("part").cast("double")
    lon_i, lat_i = interpolate_xy(
        F.col("src_lon_d"), F.col("src_lat_d"), F.col("dst_lon_d"), F.col("dst_lat_d"), t
    )
    interior_id = F.concat(base, F.lit(":"), F.col("i"), F.lit("/"), F.col("part"))
    new_nodes = pts.select(
        interior_id.alias("id"),
        fmt_f64(lat_i).alias("lat"),
        fmt_f64(lon_i).alias("lon"),
        lat_i.alias("lat_d"),
        lon_i.alias("lon_d"),
    )
    # insert-if-absent (reference insert_node, src/graph.rs:123-125):
    # existing ids win over freshly minted ones
    new_nodes = new_nodes.dropDuplicates(["id"]).join(
        g.nodes.select("id"), "id", "left_anti"
    )

    # chain edges: segment i connects point i → i+1, endpoints are src/dst
    seg = split.withColumn("i", F.explode(F.sequence(F.lit(0), (F.col("part") - 1).cast("int"))))
    name = lambda i: F.concat(base, F.lit(":"), i, F.lit("/"), F.col("part"))  # noqa: E731
    a = F.when(F.col("i") == 0, F.col("src")).otherwise(name(F.col("i")))
    b = F.when(F.col("i") == F.col("part") - 1, F.col("dst")).otherwise(name(F.col("i") + 1))
    chain = seg.select(F.least(a, b).alias("src"), F.greatest(a, b).alias("dst"))

    edges = kept.unionByName(chain).dropDuplicates(["src", "dst"])
    nodes = g.nodes.unionByName(new_nodes)
    return StreetGraph(nodes, edges)

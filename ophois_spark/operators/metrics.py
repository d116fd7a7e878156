"""Graph metrics as aggregations (reference src/metrics.rs).

Every metric is a tiny shuffle-light aggregation; the reference writes
them as text files (src/metrics.rs:8-24,69-75) — the engine returns
DataFrames so callers compose, and the snapshot layer records them as
per-stage lineage metrics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ophois_spark.functions import bearing_deg
from ophois_spark.operators.graph import StreetGraph


def order_size(g: StreetGraph) -> DataFrame:
    """(n_nodes, n_links) — reference ``"{nodes} {links/2}"``
    (src/metrics.rs:55-57); canonical edges are already the /2 form."""
    n = g.nodes.select(F.count(F.lit(1)).alias("n_nodes"))
    m = g.edges.select(F.count(F.lit(1)).alias("n_links"))
    return n.crossJoin(m)


def degree_distribution(g: StreetGraph) -> DataFrame:
    """degree → node count (src/metrics.rs:26-33), incl. degree 0."""
    return (
        g.degrees()
        .groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
        .orderBy("degree")
    )


def length_distribution(g: StreetGraph) -> DataFrame:
    """floor(metres) → link count over canonical links (src/metrics.rs:35-53)."""
    return (
        g.edges_with_coords()
        .select(F.floor("dist_m").cast("int").alias("length_m"))
        .groupBy("length_m")
        .agg(F.count(F.lit(1)).alias("n_links"))
        .orderBy("length_m")
    )


def distribution_lines(dist: DataFrame, key: str, val: str) -> list[str]:
    """Sorted ``"k v"`` lines (reference sort_and_stringify,
    src/metrics.rs:59-67) — driver-side, distributions are tiny."""
    return [f"{r[key]} {r[val]}" for r in dist.orderBy(key).collect()]


def write_metrics(g: StreetGraph, param: str, directory: str = "./ophois_metrics") -> dict[str, str]:
    """File-sink parity with the reference's ``metrics`` entry point
    (src/metrics.rs:8-24,69-75): writes ``{directory}/order_size_{param}``,
    ``degrees_{param}`` and ``lengths_{param}``.

    ``order_size`` is the single line ``"{nodes} {links}"`` (canonical
    edges already ARE the reference's ``links/2``); the distributions
    are newline-terminated ``"k v"`` lines sorted by key. The
    aggregations run distributed; only the tiny final distributions are
    collected for the driver-side text write (same shape as the
    reference's stdout sink). Returns {file_name: path}.
    """
    import os

    os.makedirs(directory, exist_ok=True)
    n_nodes, n_links = g.counts()
    payloads = {
        f"order_size_{param}": f"{n_nodes} {n_links}",
        f"degrees_{param}": "".join(
            line + "\n"
            for line in distribution_lines(degree_distribution(g), "degree", "n_nodes")
        ),
        f"lengths_{param}": "".join(
            line + "\n"
            for line in distribution_lines(length_distribution(g), "length_m", "n_links")
        ),
    }
    out = {}
    for name, payload in payloads.items():
        path = os.path.join(directory, name)
        with open(path, "w") as f:
            f.write(payload)
        out[name] = path
    return out


def triangle_counts(g: StreetGraph) -> DataFrame:
    """Per-node triangle participation count → (id, n_triangles), all
    nodes (0 for triangle-free). A graph-quality metric the reference's
    analysis layer stops short of (src/metrics.rs has order/degree/
    length only) — closed here with the MapReduce-scalable enumeration.

    Degree-ordered orientation (Suri & Vassilvitskii, WWW'11): each
    canonical edge is directed from its lower (degree, id) endpoint to
    the higher, so every node's OUT-degree is bounded (a hub of degree
    d receives its wedges from low-degree spokes instead of fanning out
    d^2 of them) — the wedge join's skew is capped by design, not by
    AQE rescue. Each triangle has exactly one source node under a total
    order, so it is enumerated once:

      wedges (a->b, a->c) self-join on the source  →  closure check =
      one left-semi equi-join against the oriented edge set.

    Per-node counts then explode each triangle's 3 corners — bounded by
    3x the triangle count, not the wedge count.
    """
    deg = g.degrees()
    e = (
        g.edges.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("degree", "sdeg")
        .join(deg.withColumnRenamed("id", "dst"), "dst")
        .withColumnRenamed("degree", "ddeg")
    )
    skey = F.struct(F.col("sdeg").alias("d"), F.col("src").alias("n"))
    dkey = F.struct(F.col("ddeg").alias("d"), F.col("dst").alias("n"))
    fwd = skey < dkey
    oriented = e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
        F.when(fwd, dkey).otherwise(skey).alias("vkey"),
    ).localCheckpoint(eager=True)

    a = oriented.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("vkey").alias("bkey"))
    c = oriented.select(F.col("u").alias("a"), F.col("v").alias("c"), F.col("vkey").alias("ckey"))
    wedges = (
        a.join(c, "a")
        .filter(F.col("bkey") < F.col("ckey"))
        .select("a", "b", "c")
    )
    tri = wedges.join(
        oriented.select(F.col("u").alias("b"), F.col("v").alias("c")),
        ["b", "c"],
        "left_semi",
    )
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionByName(tri.select(F.col("b").alias("id")))
        .unionByName(tri.select(F.col("c").alias("id")))
    )
    per_node = corners.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))
    return g.nodes.select("id").join(per_node, "id", "left").select(
        "id", F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles")
    )


def clustering_coefficients(g: StreetGraph) -> DataFrame:
    """Per-node local clustering coefficient → (id, degree,
    n_triangles, lcc), all nodes (0.0 when degree < 2).

    lcc(v) = 2·t(v) / (d(v)·(d(v)−1)) — the classic Watts–Strogatz
    local density. Composes the two already-scalable relations
    (`triangle_counts`, `degrees`) with ONE equi-join + a codegen
    projection, so its scale profile is exactly theirs. The quotient's
    operands are exact small integers on both engines, so the double
    division (then round-9) is bit-identical cross-engine — the
    integer-operand discipline from the floored-metre lesson.
    """
    tri = triangle_counts(g)
    deg = g.degrees()
    return tri.join(deg, "id").select(
        "id",
        "degree",
        "n_triangles",
        F.when(F.col("degree") < 2, F.lit(0.0))
        .otherwise(
            F.round(
                F.lit(2.0)
                * F.col("n_triangles")
                / (F.col("degree") * (F.col("degree") - 1)),
                9,
            )
        )
        .alias("lcc"),
    )


def bearing_distribution(g: StreetGraph) -> DataFrame:
    """floor(initial bearing °) → link count over canonical links
    → (bearing_deg int, n_links bigint), the orientation histogram
    (street-grid alignment entropy — Boeing, "Urban spatial order",
    Appl. Netw. Sci. 2019) the reference's metrics layer (order /
    degree / length, src/metrics.rs) stops short of.

    Same shape as `length_distribution`: the bearing is one codegen
    projection over `edges_with_coords` (functions.bearing_deg — pure
    atan2 arithmetic, no UDF), then ONE map-side-combinable groupBy on
    ≤360 keys; at 10^12 edges the shuffle payload is 360 partial
    counts per task. Floored whole degrees are the cross-engine
    contract (trig differs by ~1 ulp between engines; a floor boundary
    hit needs an exactly-integer fractional bearing, and the exact
    cases atan2 produces — 0°/180° — are identical IEEE results).
    """
    return (
        g.edges_with_coords()
        .select(
            F.floor(
                bearing_deg(
                    F.col("src_lon_d"),
                    F.col("src_lat_d"),
                    F.col("dst_lon_d"),
                    F.col("dst_lat_d"),
                )
            )
            .cast("int")
            .alias("bearing_deg")
        )
        .groupBy("bearing_deg")
        .agg(F.count(F.lit(1)).alias("n_links"))
        .orderBy("bearing_deg")
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Newman degree assortativity of an undirected edge list → ONE
    row (m_edges, sum_prod, sum_deg, sum_deg2, assortativity).

    r = (4·M·Σjk − (Σ(j+k))²) / (2·M·Σ(j²+k²) − (Σ(j+k))²), the
    textbook Pearson-over-edges rewritten so every aggregation is an
    INTEGER moment: int64 sums are exact and order-free (no
    accumulation-order float drift across engines/partitionings), and
    the only floating arithmetic is one final expression over a single
    row, identical on both engines. Moments stay under 2^53, so the
    double promotion is lossless at any plausible graph size.

    Scale shape: degree table = one explode + map-side-combinable
    count; two hash equi-joins decorate each edge with endpoint
    degrees (degree table is node-scale, joins shuffle edge-scale rows
    once each); one algebraic 1-row agg. No windows, no collect.
    """
    deg = (
        edges.select(F.explode(F.array("src", "dst")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("deg"))
    )
    m = (
        edges.join(
            deg.select(F.col("id").alias("src"), F.col("deg").alias("du")), "src"
        ).join(deg.select(F.col("id").alias("dst"), F.col("deg").alias("dv")), "dst")
    )
    mom = m.agg(
        F.count(F.lit(1)).cast("long").alias("m_edges"),
        F.sum(F.col("du") * F.col("dv")).cast("long").alias("sum_prod"),
        F.sum(F.col("du") + F.col("dv")).cast("long").alias("sum_deg"),
        F.sum(F.col("du") * F.col("du") + F.col("dv") * F.col("dv"))
        .cast("long")
        .alias("sum_deg2"),
    )
    md, ad, bd, cd = (
        F.col("m_edges").cast("double"),
        F.col("sum_prod").cast("double"),
        F.col("sum_deg").cast("double"),
        F.col("sum_deg2").cast("double"),
    )
    num = F.lit(4.0) * md * ad - bd * bd
    den = F.lit(2.0) * md * cd - bd * bd
    return mom.select(
        "m_edges",
        "sum_prod",
        "sum_deg",
        "sum_deg2",
        F.when(den != 0.0, num / den).alias("assortativity"),
    )

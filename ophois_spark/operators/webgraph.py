"""Link-graph importance scoring for corpus curation.

Common-Crawl-scale corpus builds weight documents by link-graph
centrality (the crawl frontier and quality weighting both consume it).
This module scores an explicit (src, dst) edge relation with PageRank —
implemented in INTEGER arithmetic so the result is bit-identical across
engines and partitionings: floating-point PageRank sums doubles in
shuffle order, which no cross-engine oracle can pin, while 64-bit
integer sums are associative-commutative exactly.

Semantics (scale S = 10^6, damping d = 85/100, iterations unrolled):

    rank_0(v)   = S
    contrib(u)  = rank(u) DIV outdeg(u)          -- truncating division
    rank_i+1(v) = (15*S) DIV 100
                  + (85 * Σ_{u→v} contrib(u)) DIV 100

Truncation loses ≤1 unit per term (1e-6 of a rank) — the ordering it
induces converges to float PageRank's as S grows, and the arithmetic is
exactly replayable in ANSI SQL.

Scale shape at 10^12 edges: the per-iteration cost is ONE shuffle of
the edge relation joined to the (much smaller) rank relation plus one
aggregation on dst — the join is on src, so bucketing/pre-partitioning
the edges by src makes every iteration's join co-located (zero
exchange on the big side, see sources/bucketed.py); out-degrees fold
into the edge relation ONCE before the loop instead of re-joining per
iteration; hot dst nodes (the skew case: everyone links to the hub)
collapse map-side because the dst aggregation is algebraic. Lineage is
truncated per round with localCheckpoint like every iterative operator
here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_SCALE = 1_000_000
PAGERANK_ITERS = 5
DAMPING_NUM = 85
DAMPING_DEN = 100


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
) -> DataFrame:
    """→ (id, rank) integer PageRank after ``iters`` unrolled
    iterations. ``nodes``: (id), ``edges``: (src, dst) — self-loops
    and duplicate edges must already be resolved by the caller."""
    base = (DAMPING_DEN - DAMPING_NUM) * scale // DAMPING_DEN
    # out-degree folds into the edge relation once, outside the loop
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    e = edges.join(outdeg, "src").localCheckpoint(eager=False)
    ranks = nodes.select("id", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        sums = (
            e.join(ranks.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), F.expr("rank div outdeg").alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(sums, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.expr(f"({DAMPING_NUM} * coalesce(s, 0L)) div {DAMPING_DEN}")
                ).cast("long").alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks

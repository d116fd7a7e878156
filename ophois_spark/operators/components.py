"""Connected components + largest-component filter.

The reference runs a sequential BFS from every unvisited node and keeps
the strictly largest component (src/heuristics.rs:10-58; ties broken by
nondeterministic HashMap order — the engine breaks ties on the smallest
component label, and the fixtures have a unique maximum).

Spark-native algorithms (A/B pair, equivalence pinned on random
graphs):

- min-label propagation with pointer jumping (label := label(label)) —
  ~O(log diameter) rounds; the default (measured faster at sf0.1,
  see connected_components).
- large-star/small-star contraction — O(log n) alternations regardless
  of diameter; each round is a handful of shuffles over a shrinking
  edge set. Kept as the comparator / high-diameter option.

Lineage is truncated per round with localCheckpoint in both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ophois_spark.operators.graph import StreetGraph


def connected_components(g: StreetGraph, max_iter: int = 60) -> DataFrame:
    """→ labels DataFrame (id, comp) where comp = min node id in
    component. Default algorithm: min-label propagation with pointer
    jumping — A/B-measured against large-star/small-star contraction at
    sf0.1 (graph cached, interleaved reps): label-prop 8.1-8.6 s vs
    star 11.0-14.0 s. Star converges in one fewer driver round (4 vs 5)
    but each of its rounds rewrites the full edge relation through two
    extra shuffles, while pointer jumping keeps label-prop's round
    count ~O(log diameter) too — so fewer rounds does not buy wall
    time here. ``connected_components_star`` remains available for
    graphs where per-round edge contraction pays (very high diameter
    with rapidly shrinking edge sets); equivalence of the two is pinned
    on random graphs + a long chain by tests."""
    return connected_components_labelprop(g, max_iter=max_iter)


def connected_components_labelprop(g: StreetGraph, max_iter: int = 60) -> DataFrame:
    """Min-label propagation + pointer jumping (O(log diameter) rounds)."""
    labels = g.nodes.select("id", F.col("id").alias("comp")).localCheckpoint(eager=True)
    edges_bi = g.edges.select("src", "dst").unionByName(
        g.edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # 1. neighbor-min: the smallest label among each node's neighbors
        neigh_min = (
            edges_bi.join(
                labels.select(F.col("id").alias("dst"), F.col("comp").alias("ncomp")), "dst"
            )
            .groupBy("src")
            .agg(F.min("ncomp").alias("nmin"))
            .withColumnRenamed("src", "id")
        )
        stepped = labels.join(neigh_min, "id", "left").select(
            "id",
            F.least("comp", F.coalesce("nmin", "comp")).alias("comp"),
            F.col("comp").alias("prev"),
        )
        # 2. pointer jumping: comp := comp(comp) (labels are node ids)
        flat = (
            stepped.alias("s")
            .join(
                labels.select(F.col("id").alias("comp"), F.col("comp").alias("comp2")).alias("m"),
                "comp",
                "left",
            )
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce("comp2", "comp")).alias("comp"),
                "prev",
            )
        )
        flat = flat.localCheckpoint(eager=True)
        changed = flat.filter(F.col("comp") != F.col("prev")).count()
        labels = flat.select("id", "comp")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def connected_components_star(g: StreetGraph, max_iter: int = 40) -> DataFrame:
    """Connected components via alternating large-star / small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the A/B alternative to the label-propagation +
    pointer-jumping loop above.

    large-star(u): every neighbor v > u re-links to m(u) = min(Γ(u) ∪
    {u}); small-star(u): every neighbor v < u, and u itself, links to
    m(u). Both preserve connectivity and node coverage (every edge is
    emitted from exactly one endpoint; a node with no emission of its
    own is re-emitted by a neighbor); at the fixpoint the edge set is a
    forest of stars rooted at each component's minimum id, so the label
    is just the neighbor-min. Convergence is checked with an
    order-independent (count, xor-of-xxhash64) signature of the edge
    set — one cheap aggregate action per round, no set-difference
    shuffle. Expected O(log n) alternations independent of graph
    DIAMETER — the label-prop loop needs O(log diameter) rounds, so on
    high-diameter street chains the star loop converges in fewer driver
    rounds (each round costs more shuffles; bench at your scale).
    """
    e = (
        g.edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count(F.lit(1)).alias("n"), F.bit_xor(F.xxhash64("u", "v")).alias("h")
        ).collect()[0]
        return (row["n"], row["h"])

    def _bidir(df: DataFrame) -> DataFrame:
        return df.unionByName(df.select(F.col("v").alias("u"), F.col("u").alias("v")))

    def _mins(bidir: DataFrame) -> DataFrame:
        return bidir.groupBy("u").agg(
            F.least(F.col("u"), F.min("v")).alias("m")
        )

    sig = _sig(e)
    for _ in range(max_iter):
        # large-star: (u,v) with v > u  →  (v, m(u))
        b = _bidir(e)
        ls = (
            b.filter(F.col("v") > F.col("u"))
            .join(_mins(b), "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: (u,v) with v < u → (v, m(u));  plus (u, m(u))
        b2 = _bidir(ls)
        m2 = _mins(b2)
        ss = (
            b2.filter(F.col("v") < F.col("u"))
            .join(m2, "u")
            .select(F.col("v").alias("u"), "m")
            .unionByName(m2.select("u", "m"))
            .select(F.col("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_sig = _sig(ss)
        e = ss
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"star contraction did not converge in {max_iter} rounds")

    nbr_min = _bidir(e).groupBy("u").agg(F.min("v").alias("mv"))
    return g.nodes.select("id").join(
        nbr_min.withColumnRenamed("u", "id"), "id", "left"
    ).select("id", F.least(F.col("id"), F.coalesce("mv", "id")).alias("comp"))


def component_size_distribution(labels: DataFrame) -> DataFrame:
    """size → number of components (the reference computes and discards
    this, src/heuristics.rs:13,45-47 — the engine keeps it, it's free)."""
    return (
        labels.groupBy("comp")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .orderBy("size")
    )


def largest_component(g: StreetGraph, labels: DataFrame | None = None) -> StreetGraph:
    """Keep the largest component (ties → smallest component label).

    Pass precomputed ``labels`` (id, comp) to reuse a cached
    propagation result; they MUST come from ``connected_components`` on
    the same graph."""
    if labels is None:
        labels = connected_components(g)
    sizes = labels.groupBy("comp").agg(F.count(F.lit(1)).alias("size"))
    winner = sizes.orderBy(F.desc("size"), F.asc("comp")).limit(1).select("comp")
    keep = labels.join(F.broadcast(winner), "comp", "left_semi").select("id")
    nodes = g.nodes.join(keep, "id", "left_semi")
    # edges never cross components: filtering on src suffices
    edges = g.edges.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
    return StreetGraph(nodes, edges)


def kcore(
    nodes: DataFrame, edges: DataFrame, k: int, max_rounds: int = 100
) -> tuple[DataFrame, int]:
    """→ (core_nodes(id), rounds): the k-core of an undirected simple
    graph — the maximal subgraph in which every node has degree ≥ k —
    by parallel peeling (Matula/Beck): each round drops EVERY node
    whose degree in the SURVIVING subgraph is < k at once, then the
    edges incident to dropped nodes; fixpoint when a round drops
    nothing. The classic dense-subgraph / link-spam forensics primitive
    (comment-spam farms live in high cores; trees and chains have no
    2-core at all).

    The peeled set per round is a deterministic function of the
    surviving subgraph (no tie-breaks anywhere), so rounds past the
    fixpoint are exact identities — the same replay contract as the
    H4/H6 contractions, letting a SQL oracle unroll to a pinned round
    count measured at the gate scales (pytest-guarded).

    Scale shape at 10^12 edges: per round ONE algebraic degree count
    over the endpoint union (map-side combined — hub nodes collapse
    per input split) and two left-semi joins filtering the edge
    relation, all on the same src/dst keys (bucketing the edges makes
    them co-located); the edge set only shrinks. One count action per
    round; lineage truncated per round with localCheckpoint.
    """
    e = edges.select("src", "dst").localCheckpoint(eager=False)
    n_prev = None
    rounds = 0
    while True:
        deg = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.filter(F.col("d") >= k).select("id").localCheckpoint(eager=False)
        n = keep.count()  # the round's single action
        if n == n_prev:
            return keep, rounds
        if n == 0:
            return keep, rounds + 1
        n_prev = n
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"k-core did not converge within {max_rounds} rounds")
        e = (
            e.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )


def coreness(
    nodes: DataFrame, edges: DataFrame, k_max: int, max_rounds: int = 100
) -> tuple[DataFrame, dict[int, int]]:
    """→ (labels(id, coreness), rounds_by_k): core decomposition up to
    ``k_max`` — coreness(v) = the largest k ≤ k_max with v in the
    k-core (0 for isolated nodes). Runs the :func:`kcore` peel for
    each k, NESTED: the (k+1)-core of G equals the (k+1)-core of the
    k-core of G, so each peel starts from the previous survivor
    subgraph — the edge relation only ever shrinks across the whole
    decomposition, never resets to the full graph.

    Scale: k_max is a small constant (webgraph forensics uses the low
    cores; degeneracy-order decomposition of the full range is a
    different algorithm); total cost is Σ_k rounds_k peels, each the
    one-agg-two-semijoin round of :func:`kcore`.
    """
    from functools import reduce

    e = edges.select("src", "dst")
    parts = []
    rounds_by_k: dict[int, int] = {}
    for k in range(1, k_max + 1):
        keep, r = kcore(nodes, e, k, max_rounds=max_rounds)
        rounds_by_k[k] = r
        parts.append(keep.select("id", F.lit(k).alias("k")))
        e = (
            e.join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        )
    cores = (
        reduce(DataFrame.unionByName, parts)
        .groupBy("id")
        .agg(F.max("k").alias("coreness"))
    )
    return (
        nodes.join(cores, "id", "left").select(
            "id", F.coalesce("coreness", F.lit(0)).alias("coreness")
        ),
        rounds_by_k,
    )


def _edge_support(e: DataFrame) -> DataFrame:
    """Per-edge triangle support over a CANONICAL (src < dst) simple
    edge relation → (src, dst, support), edges in ≥1 triangle only.
    Under src < dst every triangle a<b<c is generated exactly once by
    the wedge (a,b)+(a,c) closed by (b,c); each triangle then scatters
    to its 3 edges for the algebraic count.
    """
    a = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    c = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = (
        a.join(c, "a")
        .filter(F.col("b") < F.col("c"))
        .join(
            e.select(F.col("src").alias("b"), F.col("dst").alias("c")),
            ["b", "c"],
            "left_semi",
        )
    )
    sides = (
        tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
        .unionByName(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
    )
    return sides.groupBy("src", "dst").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )


def ktruss(edges: DataFrame, k: int, max_rounds: int = 100) -> tuple[DataFrame, int]:
    """→ (truss_edges(src, dst, support), rounds): the k-truss of an
    undirected simple graph — the maximal subgraph where EVERY edge is
    in ≥ k−2 triangles of that subgraph (Cohen '08) — by parallel
    peeling: each round recomputes per-edge support on the surviving
    edges and drops every under-supported edge at once; fixpoint when
    nothing drops. ``support`` is the edge's triangle count in the
    FINAL truss. The cohesion screen one notch stricter than k-core
    (a k-truss is always inside the (k−1)-core but prunes chains and
    stars that survive core peeling) — link-farm and mutual-citation
    forensics read it directly.

    Determinism/replay contract: the dropped set per round is a pure
    function of the surviving subgraph (no tie-breaks), so rounds past
    the fixpoint are identities and a SQL oracle may unroll to any
    pinned count ≥ the measured depth — the kcore/H4/H6 contract.

    Scale shape at 10^12 edges: the wedge join is the cost center; the
    canonical id orientation bounds a wedge source's fan-out by its
    forward-degree (the degree-ordered variant in metrics.triangle_
    counts drops in unchanged if id order correlates with degree —
    with the same output, since support is orientation-free). Each
    round: one wedge equi-join + one left-semi closure + one algebraic
    count + one inner join back, one count action, lineage truncated
    with localCheckpoint; the edge relation only shrinks.
    """
    e = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_prev = None
    rounds = 0
    while True:
        sup = _edge_support(e)
        keep = sup.filter(F.col("support") >= k - 2).localCheckpoint(eager=False)
        n = keep.count()  # the round's single action
        if n == n_prev:
            return keep, rounds
        if n == 0:
            return keep.select("src", "dst", "support"), rounds + 1
        n_prev = n
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"k-truss did not converge within {max_rounds} rounds")
        e = keep.select("src", "dst").localCheckpoint(eager=False)


def lpa_communities(nodes: DataFrame, edges: DataFrame, rounds: int = 4) -> DataFrame:
    """→ (id, label): synchronous label propagation (Raghavan '07) run
    for EXACTLY ``rounds`` rounds over the undirected simple graph —
    init label(v)=v; each round every node adopts the most frequent
    label among its neighbors, ties to the smallest label; isolated
    nodes keep their own. Community detection for link-farm / topic-
    cluster screening one level below connected components (which this
    refines: labels never cross a component boundary).

    Fixed-round semantics ON PURPOSE: async LPA is order-dependent and
    sync LPA can 2-cycle on bipartite-ish regions, so "run to
    convergence" is not a well-defined deterministic contract. "Labels
    after R synchronous min-tie-break rounds" is — bit-replayable on
    any engine, so the oracle unrolls the identical R rounds rather
    than pinning a measured depth (contrast ktruss, where the fixpoint
    IS deterministic).

    Scale shape: per round ONE adjacency→label equi-join, ONE
    map-side-combinable (id, lbl) count, ONE argmax via min(struct) —
    no window over a node's full neighborhood and no skew cliff: a
    celebrity node's million neighbor rows pre-aggregate to its
    distinct incident labels before the reduce. Lineage truncated per
    round; no driver action anywhere (the plan is R unrolled stages).
    """
    sym = (
        edges.select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    adj = sym.unionByName(
        sym.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=False)
    labels = nodes.select(F.col("id"), F.col("id").cast("long").alias("label"))
    for _ in range(rounds):
        nbr = (
            adj.join(
                labels.select(F.col("id").alias("dst"), F.col("label").alias("nlbl")),
                "dst",
            )
            .groupBy(F.col("src").alias("id"), F.col("nlbl"))
            .agg(F.count(F.lit(1)).alias("c"))
        )
        best = nbr.groupBy("id").agg(
            F.min(F.struct((-F.col("c")).alias("nc"), F.col("nlbl").alias("lbl"))).alias("b")
        )
        labels = (
            labels.join(best, "id", "left")
            .select("id", F.coalesce(F.col("b.lbl"), F.col("label")).alias("label"))
            .localCheckpoint(eager=False)
        )
    return labels

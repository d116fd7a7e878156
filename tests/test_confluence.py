"""Confluence: parallel contraction batches == sequential reference semantics.

The reference mutates its graph ONE node/link at a time in randomized
order (SURVEY.md §2.5, reference src/heuristics.rs:80-169); the engine
re-derives each heuristic as deterministic parallel batches and claims
the same fixpoint for ANY processing order. This module pins that claim:

1. ``SeqGraph`` is a pure-Python simulation of the documented sequential
   semantics (re-derived from the spec, with the engine's own float
   kernels for bit parity). Its faithfulness is itself verified by
   reproducing the reference's golden fixtures.
2. Random small graphs run through the sequential simulation under
   several different processing orders. When every order reaches the
   same fixpoint (the confluent case the goldens assert), the Spark
   operator must reach it too.
3. For H6 (link contraction) sampling orders is UNSOUND — a case can
   be order-dependent while a handful of sampled orders coincide
   (seed 3 here splits 50/50 over 500 orders yet 4 samples agreed).
   ``link_fixpoints`` instead exhaustively enumerates EVERY fixpoint
   reachable by contracting live short links one at a time in any
   order — a superset of the reference's sweep orders AND of the
   engine's batch rounds (a vertex-disjoint matching is realizable
   as a sequential prefix: contracting one matching edge never
   changes another's endpoints or distance). A singleton result is a
   proof of order-insensitivity; anything else is out of contract.
"""

import random

import pytest
from pyspark.sql import functions as F

from ophois_spark.kernels.floatfmt import format_f64
from ophois_spark.kernels.geo import haversine, midpoint
from ophois_spark.operators.contraction import (
    remove_degree_two_nodes,
    remove_under_delta_links,
    remove_under_delta_nodes,
)
from ophois_spark.sources.graph_io import graph_from_tuples
from tests.fixtures import (
    DEG2_LINKS,
    DEG2_NODES,
    UNDER_DELTA_LINKS_LINKS,
    UNDER_DELTA_LINKS_NODES,
    UNDER_DELTA_NODES_LINKS,
    UNDER_DELTA_NODES_NODES,
)


class SeqGraph:
    """Sequential-semantics graph: dict nodes + undirected edge set."""

    def __init__(self, nodes, links):
        self.nodes = {i: (lat, lon) for i, lat, lon in nodes}
        self.edges = set()
        for u, v in links:
            if u != v and u in self.nodes and v in self.nodes:
                self.edges.add((min(u, v), max(u, v)))

    def neighbours(self, n):
        out = set()
        for u, v in self.edges:
            if u == n:
                out.add(v)
            elif v == n:
                out.add(u)
        return out

    def dist(self, u, v):
        (lat1, lon1), (lat2, lon2) = self.nodes[u], self.nodes[v]
        return haversine(float(lon1), float(lat1), float(lon2), float(lat2))

    def remove_node(self, n):
        self.nodes.pop(n)
        self.edges = {e for e in self.edges if n not in e}

    def replace_node_by_links(self, victim):
        """Reference replace_node_by_links (src/heuristics.rs:60-78)."""
        nbrs = sorted(self.neighbours(victim))
        self.remove_node(victim)
        for i, a in enumerate(nbrs):
            for b in nbrs[i + 1 :]:
                self.edges.add((min(a, b), max(a, b)))

    def remove_degree_two(self, order_rng):
        """Reference remove_degree_two_nodes (src/heuristics.rs:80-91):
        snapshot of degree-2 nodes, then sequential replacement."""
        snapshot = [n for n in self.nodes if len(self.neighbours(n)) == 2]
        order_rng.shuffle(snapshot)
        for n in snapshot:
            if n in self.nodes:
                self.replace_node_by_links(n)

    def under_delta_nodes(self, delta, order_rng):
        """Reference remove_under_delta_nodes (src/heuristics.rs:93-112):
        shuffled node order, each judged against CURRENT state; remove
        when every incident link <= delta (isolated qualifies)."""
        order = list(self.nodes)
        order_rng.shuffle(order)
        for n in order:
            if n not in self.nodes:
                continue
            if all(self.dist(n, m) <= delta for m in self.neighbours(n)):
                self.replace_node_by_links(n)

    def contract_link(self, u, v):
        """Reference replace_link_by_node (src/heuristics.rs:114-141)."""
        a, b = min(u, v), max(u, v)
        new_id = f"{a}-{b}"
        (lat1, lon1), (lat2, lon2) = self.nodes[a], self.nodes[b]
        mx, my = midpoint(float(lon1), float(lat1), float(lon2), float(lat2))
        nbrs = sorted((self.neighbours(a) | self.neighbours(b)) - {a, b})
        self.remove_node(a)
        self.remove_node(b)
        if new_id not in self.nodes:  # insert-if-absent (src/graph.rs:123-125)
            self.nodes[new_id] = (format_f64(my), format_f64(mx))
        for m in nbrs:
            if m in self.nodes and m != new_id:
                self.edges.add((min(new_id, m), max(new_id, m)))

    def under_delta_links(self, delta, order_rng, max_sweeps=100):
        """Reference remove_under_delta_links (src/heuristics.rs:143-169):
        sweep shuffled link snapshots, contracting live links < delta,
        until none remain."""
        for _ in range(max_sweeps):
            if not any(self.dist(u, v) < delta for u, v in self.edges):
                return
            snapshot = list(self.edges)
            order_rng.shuffle(snapshot)
            for u, v in snapshot:
                if (u, v) in self.edges and self.dist(u, v) < delta:
                    self.contract_link(u, v)
        raise RuntimeError("sequential under_delta_links did not converge")

    def state(self):
        return (
            frozenset((i, lat, lon) for i, (lat, lon) in self.nodes.items()),
            frozenset(self.edges),
        )


def spark_state(g):
    nodes = frozenset(
        (r["id"], r["lat"], r["lon"]) for r in g.nodes.select("id", "lat", "lon").collect()
    )
    edges = frozenset((r["src"], r["dst"]) for r in g.edges.collect())
    return nodes, edges


# ---------------------------------------------------------------------------
# 1. the simulator itself reproduces the reference goldens
# ---------------------------------------------------------------------------


def test_seq_sim_matches_reference_goldens():
    rng = random.Random(0)

    g = SeqGraph(DEG2_NODES, DEG2_LINKS)
    g.remove_degree_two(rng)
    assert len(g.nodes) == 14 and len(g.edges) == 17  # src/heuristics.rs:224-250

    g = SeqGraph(UNDER_DELTA_NODES_NODES, UNDER_DELTA_NODES_LINKS)
    g.under_delta_nodes(10.0, rng)
    assert len(g.nodes) == 9 and len(g.edges) == 12  # src/heuristics.rs:252-273

    g = SeqGraph(UNDER_DELTA_LINKS_NODES, UNDER_DELTA_LINKS_LINKS)
    g.under_delta_links(6.0, rng)  # delta 6.0 per src/heuristics.rs:297
    assert len(g.nodes) == 7 and len(g.edges) == 8  # src/heuristics.rs:294-313
    assert "3761637486-3761637489" in g.nodes
    assert "2576426850-2576426853" in g.nodes


# ---------------------------------------------------------------------------
# 2. random graphs: order-insensitive sequential fixpoint == Spark batch
# ---------------------------------------------------------------------------

N_ORDERS = 4


def random_graph(seed):
    rng = random.Random(seed)
    n = rng.randint(8, 14)
    nodes = []
    for i in range(n):
        lat = 48.8274 + rng.randint(-40, 40) * 1e-6 * rng.randint(1, 9)
        lon = 2.3487 + rng.randint(-40, 40) * 1e-6 * rng.randint(1, 9)
        nodes.append((str(1000 + i), format_f64(lat), format_f64(lon)))
    ids = [x[0] for x in nodes]
    links = set()
    for _ in range(rng.randint(n, 2 * n)):
        u, v = rng.sample(ids, 2)
        links.add((min(u, v), max(u, v)))
    return nodes, sorted(links)


def seq_outcomes(nodes, links, apply_fn):
    outs = set()
    for o in range(N_ORDERS):
        g = SeqGraph(nodes, links)
        apply_fn(g, random.Random(o * 7919 + 13))
        outs.add(g.state())
    return outs


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_degree_two_confluence(spark, seed):
    nodes, links = random_graph(seed)
    outs = seq_outcomes(nodes, links, lambda g, r: g.remove_degree_two(r))
    if len(outs) != 1:
        pytest.skip("order-dependent case (outside the parity contract)")
    got = spark_state(remove_degree_two_nodes(graph_from_tuples(spark, nodes, links)))
    assert got == next(iter(outs))


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_under_delta_nodes_confluence(spark, seed):
    delta = 9.0
    nodes, links = random_graph(seed)
    outs = seq_outcomes(nodes, links, lambda g, r: g.under_delta_nodes(delta, r))
    if len(outs) != 1:
        pytest.skip("order-dependent case (outside the parity contract)")
    got = spark_state(
        remove_under_delta_nodes(graph_from_tuples(spark, nodes, links), delta)
    )
    assert got == next(iter(outs))


class _StateSpaceTooBig(Exception):
    pass


def link_fixpoints(nodes, links, delta, cap=50000):
    """Every fixpoint reachable by contracting live short links in ANY
    order (memoized DFS over the reachable state space — sound, not
    sampled). Node count strictly decreases per contraction, so the
    recursion is acyclic and bounded. Returns None if the space
    exceeds ``cap`` states (then the case is skipped, not asserted).
    """
    memo = {}

    def dfs(state):
        if state in memo:
            return memo[state]
        if len(memo) > cap:
            raise _StateSpaceTooBig
        g = SeqGraph(state[0], state[1])
        shorts = [(u, v) for u, v in sorted(g.edges) if g.dist(u, v) < delta]
        if not shorts:
            memo[state] = frozenset([state])
            return memo[state]
        out = set()
        for u, v in shorts:
            h = SeqGraph(state[0], state[1])
            h.contract_link(u, v)
            out |= dfs(h.state())
        memo[state] = frozenset(out)
        return memo[state]

    try:
        return dfs(SeqGraph(nodes, links).state())
    except _StateSpaceTooBig:
        return None


@pytest.mark.slow
@pytest.mark.parametrize("seed", range(8))
def test_under_delta_links_confluence(spark, seed):
    delta = 8.0
    nodes, links = random_graph(seed)
    fps = link_fixpoints(nodes, links, delta)
    if fps is None:
        pytest.skip("state space over cap")
    # every sampled sequential order must land inside the reachable set
    for out in seq_outcomes(nodes, links, lambda g, r: g.under_delta_links(delta, r)):
        assert out in fps
    if len(fps) != 1:
        pytest.skip("order-dependent case (outside the parity contract)")
    got = spark_state(
        remove_under_delta_links(graph_from_tuples(spark, nodes, links), delta)
    )
    assert got == next(iter(fps))

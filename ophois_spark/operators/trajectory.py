"""Trajectory analytics: trip segmentation and origin-destination flows.

The mobility layer over the engine's spatial/temporal primitives: a
user's event stream becomes TRIPS (maximal runs where consecutive
points are close in time AND space), and trips roll up into the
origin-destination cell matrix a transport/coverage product ships.

``trip_segments`` extends the two-level slab prefix sum of
``temporal.sessionize`` (same decomposition, same scale argument: the
ordered scan runs per (key, time-slab), so a hot key's history shards
across slabs BY CONSTRUCTION) with a SPATIAL cut condition — the slab
carry is the previous slab's last POINT (t, lat, lon), not just its
timestamp, because the cut needs the distance jump too.

Exactness: all keys/ids are int64 (epoch micros, event ids, cell
coords); the only float is the step distance, immediately floored to
integer metres (the A3 length discipline — src/geo.rs haversine,
floored), so path sums are exact int64 min-plus-style arithmetic and
the oracle's window restatement gates bit-for-bit.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ophois_spark.functions import haversine_m


def _prep(
    points: DataFrame, grid_deg: float, key: str, ts: str, tie: str
) -> DataFrame:
    gd = F.lit(grid_deg)
    return points.select(
        F.col(key).alias("_k"),
        F.col(ts).cast("long").alias("_t"),
        F.col(tie).cast("long").alias("_i"),
        F.col("lat_d").alias("_lat"),
        F.col("lon_d").alias("_lon"),
        F.floor(F.col("lon_d") / gd).cast("int").alias("_gx"),
        F.floor(F.col("lat_d") / gd).cast("int").alias("_gy"),
    )


def _finish(seg: DataFrame, key: str) -> DataFrame:
    """(…, trip_id, _cut, _stp) rows → per-trip rollup."""
    o = F.min(F.struct("_t", "_i", "_gx", "_gy"))
    d = F.max(F.struct("_t", "_i", "_gx", "_gy"))
    return (
        seg.groupBy(F.col("_k").alias(key), "trip_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.min("_t").alias("start_us"),
            F.max("_t").alias("end_us"),
            F.coalesce(
                F.sum(F.when(F.col("_cut") == 0, F.col("_stp"))), F.lit(0)
            )
            .cast("long")
            .alias("path_m"),
            o.alias("_o"),
            d.alias("_d"),
        )
        .select(
            key,
            "trip_id",
            "n_points",
            "start_us",
            "end_us",
            "path_m",
            F.col("_o._gx").alias("o_gx"),
            F.col("_o._gy").alias("o_gy"),
            F.col("_d._gx").alias("d_gx"),
            F.col("_d._gy").alias("d_gy"),
        )
    )


def trip_segments_naive(
    points: DataFrame,
    gap_us: int,
    jump_m: int,
    grid_deg: float = 0.001,
    key: str = "user_id",
    ts: str = "t_us",
    tie: str = "event_id",
) -> DataFrame:
    """Textbook trip segmentation — ONE window over each key's entire
    history (the semantics reference and A/B baseline; same hot-key
    single-task trap ``sessionize_naive`` documents)."""
    e = _prep(points, grid_deg, key, ts, tie)
    w = Window.partitionBy("_k").orderBy("_t", "_i")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    loc = (
        e.withColumn("_pt", F.lag("_t").over(w))
        .withColumn("_plat", F.lag("_lat").over(w))
        .withColumn("_plon", F.lag("_lon").over(w))
    )
    step = F.floor(
        haversine_m(F.col("_plon"), F.col("_plat"), F.col("_lon"), F.col("_lat"))
    ).cast("long")
    loc = loc.withColumn(
        "_stp", F.when(F.col("_pt").isNull(), F.lit(None).cast("long")).otherwise(step)
    )
    cut = F.when(
        F.col("_pt").isNull()
        | (F.col("_t") - F.col("_pt") > F.lit(int(gap_us)))
        | (F.col("_stp") > F.lit(int(jump_m))),
        F.lit(1),
    ).otherwise(F.lit(0))
    seg = loc.withColumn("_cut", cut.cast("long")).withColumn(
        "trip_id", F.sum("_cut").over(wc) - F.lit(1)
    )
    return _finish(seg, key)


def trip_segments(
    points: DataFrame,
    gap_us: int,
    jump_m: int,
    slab_us: int,
    grid_deg: float = 0.001,
    key: str = "user_id",
    ts: str = "t_us",
    tie: str = "event_id",
) -> DataFrame:
    """Trip segmentation → (key, trip_id, n_points, start_us, end_us,
    path_m, o_gx, o_gy, d_gx, d_gy): a trip is a maximal run of a
    key's points where each consecutive step is within ``gap_us``
    micros AND ``jump_m`` floored metres; ``trip_id`` is 0-based in
    time order per key; ``path_m`` is the exact int64 sum of in-trip
    step distances; origin/destination are the first/last point's grid
    cell.

    Same output as ``trip_segments_naive`` (pinned in
    tests/test_trajectory.py) via ``temporal.slab_run_ids`` — the
    shared two-level slab prefix sum under ``sessionize`` — with
    (lat, lon) as the carry columns, so every row (slab heads
    included) sees its TRUE predecessor point and the cut can check
    both the time gap and the distance jump. See slab_run_ids for the
    decomposition and the 100 TB argument.
    """
    from ophois_spark.operators.temporal import slab_run_ids

    def _step(p, c):
        return F.floor(
            haversine_m(p["_lon"], p["_lat"], c["_lon"], c["_lat"])
        ).cast("long")

    def _cut(p, c):
        return (c["_t"] - p["_t"] > F.lit(int(gap_us))) | (
            _step(p, c) > F.lit(int(jump_m))
        )

    e = _prep(points, grid_deg, key, ts, tie)
    j = slab_run_ids(e, slab_us, _cut, carry=("_lat", "_lon"), run_col="trip_id")
    prev = {c: F.col(f"_p_{c}") for c in ("_t", "_i", "_lat", "_lon")}
    cur = {c: F.col(c) for c in ("_t", "_i", "_lat", "_lon")}
    seg = j.withColumn(
        "_stp",
        F.when(F.col("_p__t").isNull(), F.lit(None).cast("long")).otherwise(
            _step(prev, cur)
        ),
    )
    return _finish(seg, key)


def od_matrix(trips: DataFrame) -> DataFrame:
    """Origin-destination flow matrix → (o_gx, o_gy, d_gx, d_gy,
    n_trips, total_path_m): trips aggregated by their endpoint cells —
    one map-side-combinable groupBy over the (already tiny relative to
    points) trip relation. The round-trip diagonal (o == d) stays in;
    consumers filter it."""
    return trips.groupBy("o_gx", "o_gy", "d_gx", "d_gy").agg(
        F.count(F.lit(1)).cast("long").alias("n_trips"),
        F.sum("path_m").cast("long").alias("total_path_m"),
    )


def stay_points(trips: DataFrame, min_dwell_us: int = 0) -> DataFrame:
    """Dwell detection → (key, gx, gy, arrive_us, depart_us, dwell_us):
    between two CONSECUTIVE trips of a key whose endpoints agree (the
    previous trip's destination cell == the next trip's origin cell),
    the key dwelt at that cell from the previous trip's end to the
    next trip's start. The stay-point half of the trajectory pair
    (trips = motion, stays = the places in between); emits only dwells
    of at least ``min_dwell_us``. Disagreeing endpoints (the cut was a
    teleport-style jump) produce no stay — the location between those
    trips is unknown, and fabricating one would poison downstream
    visit counts.

    One lead window over the TRIP relation (orders of magnitude below
    the point count; partitions bounded by trips-per-key) — the same
    integer microsecond arithmetic as everything upstream.
    """
    w = Window.partitionBy(trips.columns[0]).orderBy("trip_id")
    key = trips.columns[0]
    t = (
        trips.withColumn("_n_start", F.lead("start_us").over(w))
        .withColumn("_n_ogx", F.lead("o_gx").over(w))
        .withColumn("_n_ogy", F.lead("o_gy").over(w))
    )
    return (
        t.filter(
            F.col("_n_start").isNotNull()
            & (F.col("_n_ogx") == F.col("d_gx"))
            & (F.col("_n_ogy") == F.col("d_gy"))
            & (F.col("_n_start") - F.col("end_us") >= F.lit(int(min_dwell_us)))
        )
        .select(
            key,
            F.col("d_gx").alias("gx"),
            F.col("d_gy").alias("gy"),
            F.col("end_us").alias("arrive_us"),
            F.col("_n_start").alias("depart_us"),
            (F.col("_n_start") - F.col("end_us")).alias("dwell_us"),
        )
    )


def map_match_viterbi(
    points: DataFrame,
    segments: DataFrame,
    radius_m: float = 25.0,
    grid_deg: float = 0.001,
    k: int = 4,
    sigma_m: float = 5.0,
    beta_m: float = 10.0,
) -> DataFrame:
    """HMM map matching → (trace_id, step_idx, edge_id, dist_m): the
    most-likely road-segment sequence for each GPS trace (Newson &
    Krummen-style: Gaussian emission on snap distance, exponential
    transition on |gps step − candidate step|), the inference stage on
    top of ``spatial.snap_points_to_edges``'s candidate stage.

    ``points``: (trace_id, step_idx, lat_d, lon_d); ``segments``:
    (edge_id, alat, alon, blat, blon). Candidate generation is the
    exact grid-cover snap (top-``k`` within ``radius_m``); candidate
    position for the transition term is the segment midpoint (the
    standard cheap proxy — exact projection points would need the
    route distance anyway, which a relational one-pass cannot know).
    Steps with NO candidate within the radius break the trace into
    independent HMM chains (emitting nothing for the uncovered step)
    rather than forcing a match through an impossible gap.

    Execution shape: candidates + per-step GPS context shuffle ONCE on
    trace_id into ``applyInPandas``; the per-trace numpy Viterbi is
    O(steps × k²) with k bounded by the snap's top-k — the classic
    "sequential inner loop, embarrassing outer parallelism" shape
    (render_tiles' discipline). Ties break to the lower edge_id at
    every argmin, so the output is deterministic. Not SQL-expressible
    (a DP over per-trace chains) — pytest-gated against brute-force
    path enumeration, the streaming-twin discipline.
    """
    import pandas as pd

    from ophois_spark.operators.spatial import snap_points_to_edges

    pts = points.select(
        (F.col("trace_id").cast("long") * F.lit(1 << 20) + F.col("step_idx"))
        .alias("qid"),
        "lat_d",
        "lon_d",
    )
    cand = snap_points_to_edges(pts, segments, radius_m, grid_deg, k)
    mids = segments.select(
        "edge_id",
        ((F.col("alat") + F.col("blat")) / 2).alias("mlat"),
        ((F.col("alon") + F.col("blon")) / 2).alias("mlon"),
    )
    rows = (
        cand.join(F.broadcast(mids), "edge_id")
        .select(
            F.expr("qid div 1048576").alias("trace_id"),
            F.pmod(F.col("qid"), F.lit(1 << 20)).cast("long").alias("step_idx"),
            "edge_id",
            "dist_m",
            "mlat",
            "mlon",
        )
        .join(
            points.select(
                F.col("trace_id").cast("long").alias("trace_id"),
                F.col("step_idx").cast("long").alias("step_idx"),
                "lat_d",
                "lon_d",
            ),
            ["trace_id", "step_idx"],
        )
    )

    out_schema = (
        "trace_id long, step_idx long, edge_id long, dist_m double"
    )

    def _viterbi(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["step_idx", "edge_id"]).reset_index(drop=True)
        lat0 = float(pdf["lat_d"].iloc[0])
        kx = math.cos(math.radians(lat0)) * 111195.07973436874
        ky = 111195.07973436874
        steps = []
        for s, g in pdf.groupby("step_idx", sort=True):
            steps.append(
                (
                    int(s),
                    g["edge_id"].to_numpy(),
                    g["dist_m"].to_numpy(),
                    g["mlon"].to_numpy() * kx,
                    g["mlat"].to_numpy() * ky,
                    float(g["lon_d"].iloc[0]) * kx,
                    float(g["lat_d"].iloc[0]) * ky,
                )
            )
        out_idx, out_edge, out_dist = [], [], []
        # chains break where step indices are non-consecutive
        chain = []
        for st in steps:
            if chain and st[0] != chain[-1][0] + 1:
                _solve_chain(chain, out_idx, out_edge, out_dist, sigma_m, beta_m)
                chain = []
            chain.append(st)
        if chain:
            _solve_chain(chain, out_idx, out_edge, out_dist, sigma_m, beta_m)
        tid = int(pdf["trace_id"].iloc[0])
        return pd.DataFrame(
            {
                "trace_id": np.full(len(out_idx), tid, dtype=np.int64),
                "step_idx": np.asarray(out_idx, dtype=np.int64),
                "edge_id": np.asarray(out_edge, dtype=np.int64),
                "dist_m": np.asarray(out_dist, dtype=np.float64),
            }
        )

    return rows.groupBy("trace_id").applyInPandas(_viterbi, out_schema)


def _solve_chain(chain, out_idx, out_edge, out_dist, sigma_m, beta_m):
    """Exact Viterbi over one consecutive-step chain (numpy, float64;
    argmin ties resolve to the lowest edge_id because candidates are
    pre-sorted by edge_id and np.argmin takes the first minimum)."""
    costs = (chain[0][2] / sigma_m) ** 2
    back = []
    for (s0, e0, d0, mx0, my0, gx0, gy0), (
        s1,
        e1,
        d1,
        mx1,
        my1,
        gx1,
        gy1,
    ) in zip(chain, chain[1:]):
        gps_step = math.hypot(gx1 - gx0, gy1 - gy0)
        cand_step = np.hypot(
            mx1[None, :] - mx0[:, None], my1[None, :] - my0[:, None]
        )
        trans = np.abs(cand_step - gps_step) / beta_m
        total = costs[:, None] + trans
        arg = np.argmin(total, axis=0)
        back.append(arg)
        costs = total[arg, np.arange(len(e1))] + (d1 / sigma_m) ** 2
    j = int(np.argmin(costs))
    path = [j]
    for arg in reversed(back):
        j = int(arg[j])
        path.append(j)
    path.reverse()
    for (s, e, d, *_), idx in zip(chain, path):
        out_idx.append(s)
        out_edge.append(int(e[idx]))
        out_dist.append(float(d[idx]))


def place_popularity(stays: DataFrame) -> DataFrame:
    """Place ranking → (gx, gy, n_visits, n_visitors, total_dwell_us):
    the visit-count/dwell rollup over detected stay points (the
    "popular places" layer a coverage or POI product serves). One
    map-side-combinable groupBy; n_visitors is COUNT(DISTINCT key) —
    the standard two-phase expand, keyed by cell so hot cells split
    across the expand's partials."""
    key = stays.columns[0]
    return stays.groupBy("gx", "gy").agg(
        F.count(F.lit(1)).cast("long").alias("n_visits"),
        F.countDistinct(key).cast("long").alias("n_visitors"),
        F.sum("dwell_us").cast("long").alias("total_dwell_us"),
    )


def trip_points(
    points: DataFrame,
    gap_us: int,
    jump_m: int,
    slab_us: int,
    grid_deg: float = 0.001,
    key: str = "user_id",
    ts: str = "t_us",
    tie: str = "event_id",
) -> DataFrame:
    """Per-point trip labels → (key, trip_id, t_us, tie, lat_d, lon_d):
    the pre-rollup rows ``trip_segments`` aggregates (same slab prefix
    sum, same cut rule — shared lineage, pinned equal by the rollup
    identity test), for consumers that need the trip's POINT SET:
    similarity (``trip_hausdorff``), map matching, polyline export.
    """
    from ophois_spark.operators.temporal import slab_run_ids

    def _step(p, c):
        return F.floor(
            haversine_m(p["_lon"], p["_lat"], c["_lon"], c["_lat"])
        ).cast("long")

    def _cut(p, c):
        return (c["_t"] - p["_t"] > F.lit(int(gap_us))) | (
            _step(p, c) > F.lit(int(jump_m))
        )

    e = _prep(points, grid_deg, key, ts, tie)
    j = slab_run_ids(e, slab_us, _cut, carry=("_lat", "_lon"), run_col="trip_id")
    return j.select(
        F.col("_k").alias(key),
        "trip_id",
        F.col("_t").alias("t_us"),
        F.col("_i").alias(tie),
        F.col("_lat").alias("lat_d"),
        F.col("_lon").alias("lon_d"),
    )


def trip_hausdorff(
    labeled: DataFrame, key: str = "user_id", pid: str = "event_id"
) -> DataFrame:
    """Discrete Hausdorff similarity between each trip and the SAME
    key's next trip → (key, trip_a, trip_b, h_ab_m, h_ba_m,
    hausdorff_m): h_ab = max over A's points of the min floored-metre
    distance to B's points (and vice versa; H = max of both) — the
    commute-regularity / route-change detector run after segmentation
    (is today's trip the same route as yesterday's?).

    Candidate pairing is CONSECUTIVE trips per key (trip_b = trip_a+1)
    so the pair count is linear in trips, and each pair's work is
    |A|·|B| with both factors bounded by a single trip's length —
    never a per-key or per-corpus quadratic. Execution: one equi-join
    on (key, trip+1) fans each pair's point cross product, then two
    algebraic min/max cascades (no window, no UDF); distances are
    floored int64 metres (the A3 length discipline), so min/max ties
    are exact and the oracle gate is bit-identical.

    At 100 TB the join keys (key, trip_id) are the partitioning the
    segmentation already produced; a pathological million-point trip
    is the only skew risk and trips are bounded by ``gap_us`` by
    construction (a cap-and-sample guard would go in _prep if real
    traces violated that).
    """
    a = labeled.select(
        F.col(key).alias("_k"),
        F.col("trip_id").alias("trip_a"),
        F.col(pid).alias("_ia"),
        F.col("lat_d").alias("_alat"),
        F.col("lon_d").alias("_alon"),
    )
    b = labeled.select(
        F.col(key).alias("_k"),
        (F.col("trip_id") - 1).alias("trip_a"),
        F.col(pid).alias("_ib"),
        F.col("lat_d").alias("_blat"),
        F.col("lon_d").alias("_blon"),
    )
    joined = a.join(b, ["_k", "trip_a"]).select(
        "_k",
        "trip_a",
        "_ia",
        "_ib",
        F.floor(
            haversine_m(
                F.col("_alon"), F.col("_alat"), F.col("_blon"), F.col("_blat")
            )
        )
        .cast("long")
        .alias("_d"),
    )
    h_ab = (
        joined.groupBy("_k", "trip_a", "_ia")
        .agg(F.min("_d").alias("_m"))
        .groupBy("_k", "trip_a")
        .agg(F.max("_m").cast("long").alias("h_ab_m"))
    )
    h_ba = (
        joined.groupBy("_k", "trip_a", "_ib")
        .agg(F.min("_d").alias("_m"))
        .groupBy("_k", "trip_a")
        .agg(F.max("_m").cast("long").alias("h_ba_m"))
    )
    return (
        h_ab.join(h_ba, ["_k", "trip_a"])
        .select(
            F.col("_k").alias(key),
            "trip_a",
            (F.col("trip_a") + 1).alias("trip_b"),
            "h_ab_m",
            "h_ba_m",
            F.greatest("h_ab_m", "h_ba_m").alias("hausdorff_m"),
        )
    )


def trace_resample(
    points: DataFrame, step_us: int, user_col: str = "user_id"
) -> DataFrame:
    """Fixed-epoch trace resampling → (user, epoch_us, mlat, mlon): the
    user's position linearly interpolated at every epoch boundary
    k·step_us that falls strictly after one ping and at-or-before the
    next — the uniform-time view every trajectory model (stay
    inference, co-location, exposure) wants instead of raw irregular
    pings. Boundaries outside a user's observed span are NOT
    extrapolated.

    Exactness contract: the epoch index range per consecutive pair is
    pure int64 arithmetic (k0 = floor(prev/step)+1, k1 = floor(t/step),
    empty when k1 < k0 — which also silently skips zero-duration
    pairs, no division guard needed); the interpolation itself is the
    fixed IEEE expression lat0 + (lat1−lat0)·((T−t0)/(t1−t0)) whose
    +,−,·,/ round identically on every engine (no libm), and the
    output is floored integer MICRODEGREES so the gate is integer
    (the floored-metre discipline, in degree space — geo.rs:interpolate
    is the same lat/lon-linear rule).

    Scale shape: ONE lag window per user (the sessionize bound), one
    sequence-explode whose fan-out per pair is the pair's own epoch
    count — total output rows ≈ observed-span/step per user, so a
    long-gap pair (the skew case) costs its own rows and nothing
    shuffles twice; the window is the only exchange.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy("t_us", "event_id")
    step = int(step_us)
    l = points.select(
        F.col(user_col).alias("user"),
        "t_us",
        "lat_d",
        "lon_d",
        F.lag("t_us").over(w).alias("pt"),
        F.lag("lat_d").over(w).alias("plat"),
        F.lag("lon_d").over(w).alias("plon"),
    ).filter(F.col("pt").isNotNull())
    k0 = (F.floor(F.col("pt") / step) + 1).cast("long")
    k1 = F.floor(F.col("t_us") / step).cast("long")
    ks = l.select(
        "*",
        F.explode(
            F.when(k1 >= k0, F.sequence(k0, k1)).otherwise(F.array().cast("array<long>"))
        ).alias("k"),
    )
    t = (F.col("k") * F.lit(step)).cast("double")
    f = (t - F.col("pt").cast("double")) / (
        F.col("t_us").cast("double") - F.col("pt").cast("double")
    )
    lat_i = F.col("plat") + (F.col("lat_d") - F.col("plat")) * f
    lon_i = F.col("plon") + (F.col("lon_d") - F.col("plon")) * f
    return ks.select(
        "user",
        (F.col("k") * F.lit(step)).cast("long").alias("epoch_us"),
        F.floor(lat_i * F.lit(1000000.0)).cast("long").alias("mlat"),
        F.floor(lon_i * F.lit(1000000.0)).cast("long").alias("mlon"),
    )

"""Scaling-efficiency evidence for BASELINE.json's north_rule.

The rule requires throughput scaling efficiency >= 0.8 between clusters
of N and 4N executors. No real cluster exists in the sandbox, so the
evidence protocol (BASELINE.md) is: run the IDENTICAL job at two
parallelism levels — ``local[8]`` and ``local[32]`` — on the SAME
pre-generated input, report throughput at both plus

    efficiency = (throughput_4N / throughput_N) / 4

Results land in ``BENCH/BASELINE.md`` and one JSON line on stdout.

The measured job is the engine's throughput-critical path
(BASELINE.json ``metric``: graph-construction pages/sec + edges/sec):

  phase "ingest"  pages parquet → fused XML format+extract (Arrow UDF)
                  → node dedup + canonical-edge dedup (shuffles)
  phase "tiling"  cell indexing (res 11) + same-cell coordinate-hash
                  dedup + per-tile edge assignment (the H3-indexed
                  tiling stage the north_star calls throughput-critical)

Each parallelism level runs in its own subprocess (a JVM cannot change
its ``local[N]`` master after startup); session startup and Python-UDF
worker fork are excluded from the timed window, matching how a
long-lived cluster amortizes them.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

CPUS_LOW = int(os.environ.get("OPHOIS_SCALE_N", "8"))
CPUS_HIGH = int(os.environ.get("OPHOIS_SCALE_4N", "32"))
N_PAGES = int(os.environ.get("OPHOIS_SCALE_PAGES", "24000"))
GRID = 12
INPUT_FILES = 128  # fixed file layout => identical scan splits at both levels


def _child(cpus: int, input_dir: str) -> None:
    """Run the measured job at local[cpus]; print one JSON line."""
    from pyspark.sql import functions as F

    from ophois_spark.functions import cell_expr
    from ophois_spark.operators.extract import graph_from_pages
    from ophois_spark.operators.spatial import tile_assignment
    from ophois_spark.session import get_spark

    spark = get_spark(
        f"ophois-scaling-{cpus}", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages = spark.read.parquet(input_dir)
    # exclude one-time Python worker fork/import from the timed window
    warm = spark.range(cpus * 4).repartition(cpus)
    warm.select(F.pandas_udf(lambda s: s, "long")(warm["id"])).count()

    t0 = time.perf_counter()
    g = graph_from_pages(pages.filter(F.col("lang") == "en"), persist_records=True)
    n_nodes, n_edges = g.counts()
    t_ingest = time.perf_counter() - t0

    t0 = time.perf_counter()
    nodes_c = g.nodes.withColumn("cell", cell_expr(F.col("lon_d"), F.col("lat_d"), 11))
    n_cell_groups = (
        nodes_c.groupBy("cell", "lat", "lon").agg(F.min("id").alias("rep")).count()
    )
    n_tile_edges = tile_assignment(g.edges_with_coords(), 14).count()
    t_tiling = time.perf_counter() - t0

    total = t_ingest + t_tiling
    print(
        json.dumps(
            {
                "cpus": cpus,
                "t_ingest_s": round(t_ingest, 3),
                "t_tiling_s": round(t_tiling, 3),
                "t_total_s": round(total, 3),
                "n_nodes": n_nodes,
                "n_edges": n_edges,
                "n_cell_groups": n_cell_groups,
                "n_tile_edges": n_tile_edges,
            }
        )
    )
    spark.stop()


def _generate_input(input_dir: str) -> int:
    """Write the shared pages input once (fixed file count)."""
    from ophois_spark.session import get_spark
    from ophois_spark.sources.pages import synth_pages

    spark = get_spark("ophois-scaling-gen", master=f"local[{CPUS_HIGH}]")
    spark.sparkContext.setLogLevel("ERROR")
    synth_pages(spark, N_PAGES, grid=GRID).repartition(INPUT_FILES).write.mode(
        "overwrite"
    ).parquet(input_dir)
    n = spark.read.parquet(input_dir).count()
    spark.stop()
    return n


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=CPUS_HIGH)
    ap.add_argument("--input", type=str, default="")
    args = ap.parse_args()

    if args.child:
        _child(args.cpus, args.input)
        return 0

    work = tempfile.mkdtemp(prefix="ophois_scaling_")
    input_dir = os.path.join(work, "pages")
    try:
        n_rows = _generate_input(input_dir)
        results: dict[int, dict] = {}
        for cpus in (CPUS_LOW, CPUS_HIGH):
            out = subprocess.run(
                [sys.executable, __file__, "--child", "--cpus", str(cpus), "--input", input_dir],
                capture_output=True,
                text=True,
                check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            results[cpus] = json.loads(out.stdout.strip().splitlines()[-1])

        lo, hi = results[CPUS_LOW], results[CPUS_HIGH]
        # parity between levels (same job, same input, same answer)
        parity = all(lo[k] == hi[k] for k in ("n_nodes", "n_edges", "n_cell_groups", "n_tile_edges"))
        scale = CPUS_HIGH / CPUS_LOW
        thr_lo = N_PAGES / lo["t_total_s"]
        thr_hi = N_PAGES / hi["t_total_s"]
        efficiency = (thr_hi / thr_lo) / scale
        summary = {
            "metric": "scaling efficiency (N -> 4N parallelism, identical job+input)",
            "value": round(efficiency, 3),
            "unit": "fraction",
            "n_pages": N_PAGES,
            "input_rows": n_rows,
            "low": lo,
            "high": hi,
            "pages_per_sec_low": round(thr_lo, 1),
            "pages_per_sec_high": round(thr_hi, 1),
            "edges_per_sec_low": round(lo["n_edges"] / lo["t_total_s"], 1),
            "edges_per_sec_high": round(hi["n_edges"] / hi["t_total_s"], 1),
            "result_parity": parity,
            "target": 0.8,
        }
        print(json.dumps(summary))
        _write_report(summary)
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _write_report(s: dict) -> None:
    lo, hi = s["low"], s["high"]
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(
            f"""# BENCH/BASELINE — measured scaling evidence

North rule: throughput scaling efficiency >= 0.8 from N to 4N
executors. Sandbox protocol (no real cluster): identical job, identical
pre-generated input ({s['n_pages']} pages, {s['input_rows']} rows,
{INPUT_FILES} parquet files), run at `local[{lo['cpus']}]` and
`local[{hi['cpus']}]` in separate processes; Spark session startup and
one-time Python-UDF worker fork excluded (amortized on a long-lived
cluster).

Job = graph construction (fused Arrow-UDF XML extract -> node dedup ->
canonical edge dedup) + tiling (cell index res 11, same-cell
coordinate-hash dedup, per-tile edge assignment at zoom 14).

| parallelism | ingest s | tiling s | total s | pages/s | edges/s |
|---|---|---|---|---|---|
| local[{lo['cpus']}] (N) | {lo['t_ingest_s']} | {lo['t_tiling_s']} | {lo['t_total_s']} | {s['pages_per_sec_low']} | {s['edges_per_sec_low']} |
| local[{hi['cpus']}] (4N) | {hi['t_ingest_s']} | {hi['t_tiling_s']} | {hi['t_total_s']} | {s['pages_per_sec_high']} | {s['edges_per_sec_high']} |

- speedup N->4N: **{s['pages_per_sec_high'] / s['pages_per_sec_low']:.2f}x** on {hi['cpus'] // lo['cpus']}x cores
- **scaling efficiency: {s['value']:.3f}** (target >= {s['target']})
- identical results at both levels (nodes/edges/cell-groups/tile-edges): **{s['result_parity']}**
  ({lo['n_nodes']} nodes, {lo['n_edges']} edges, {lo['n_cell_groups']} cell groups,
  {lo['n_tile_edges']} tile-edge assignments)

Reproduce: `python bench_scaling.py` (env: OPHOIS_SCALE_PAGES,
OPHOIS_SCALE_N, OPHOIS_SCALE_4N).
"""
        )


if __name__ == "__main__":
    sys.exit(main())

"""Cluster entry point: run the full engine via ``spark-submit --py-files``.

Usage (north_rule packaging contract):

    python jobs/package.py                        # -> dist/ophois_spark.zip
    spark-submit --driver-memory 6g \
        --py-files dist/ophois_spark.zip jobs/build_graph_job.py \
        --pages <parquet-or-iceberg-path> \
        --snapshot-root <checkpoint dir> \
        --delta 10 --discretize-delta 50 \
        [--synth-pages 24000]                     # no input table: synthesize

    NOTE: pass --driver-memory explicitly — spark-submit launches the
    JVM before any session config applies, and its 1g default OOMs in
    local mode where the driver hosts every executor thread's heap
    (localCheckpoint storage, broadcast relations). On a real cluster
    size it like any Spark driver.

The job is resumable: every stage commits an Iceberg-style snapshot
(ophois_spark/plans/snapshots.py) with per-partition lineage + row
counts; re-running with the same --snapshot-root skips completed stages.

On a cluster, do NOT pass a master here — spark-submit supplies it
(YARN/K8s). Locally the session factory defaults to local[$SPARK_GRAFT_CPUS].
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", default="", help="pages table path (parquet dir)")
    ap.add_argument("--synth-pages", type=int, default=0, help="synthesize N pages instead")
    ap.add_argument("--snapshot-root", default="", help="checkpoint/resume dir")
    ap.add_argument("--delta", type=float, default=10.0, help="simplify delta (metres)")
    ap.add_argument("--discretize-delta", type=float, default=0.0, help="discretize delta; 0=skip")
    ap.add_argument("--lang", default="en")
    args = ap.parse_args()

    from ophois_spark.pipeline import discretize_pipeline, ingest, simplify
    from ophois_spark.session import get_spark

    spark = get_spark("ophois-build-graph", master=None)
    snap = args.snapshot_root or None

    if args.pages:
        pages = spark.read.parquet(args.pages)
    elif args.synth_pages:
        from ophois_spark.sources.pages import synth_pages

        pages = synth_pages(spark, args.synth_pages)
    else:
        raise SystemExit("one of --pages / --synth-pages is required")

    g = ingest(spark, pages, snapshot_root=snap, lang=args.lang)
    g, metrics = simplify(spark, g, args.delta, snapshot_root=snap)
    if args.discretize_delta > 0:
        g, metrics = discretize_pipeline(spark, g, args.discretize_delta, snapshot_root=snap)

    print(json.dumps({"order_size": metrics["order_size"], "snapshot_root": snap}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

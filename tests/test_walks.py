"""graph_random_walks: trajectory validity over the site overlay —
every consecutive (step t → t+1) hop must be a real overlay edge,
walks start at their own id, and the md5-argmin choice is
deterministic across reruns."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_walk_trajectories_follow_edges(spark):
    from ophois_spark.queries import QUERIES, _site_graph

    walks = QUERIES["graph_random_walks"](spark, SF_DIR)
    _, edges = _site_graph(spark, SF_DIR)
    starts = walks.filter(F.col("step") == 0)
    assert starts.filter(F.col("walk") != F.col("node")).count() == 0
    hops = (
        walks.alias("a")
        .join(
            walks.alias("b"),
            (F.col("a.walk") == F.col("b.walk"))
            & (F.col("a.step") + 1 == F.col("b.step")),
        )
        .select(F.col("a.node").alias("src"), F.col("b.node").alias("dst"))
    )
    bad = hops.join(edges, ["src", "dst"], "left_anti")
    assert bad.count() == 0
    # deterministic rerun
    again = QUERIES["graph_random_walks"](spark, SF_DIR)
    assert walks.exceptAll(again).count() == 0 and again.exceptAll(walks).count() == 0

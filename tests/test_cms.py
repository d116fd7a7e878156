"""Count-Min Sketch: the overestimate guarantee (est ≥ true for every
candidate, not just the thresholded ones) and the pinned heavy-hitter
surface at sf0.001 (48 hitters, exactly 1 sketch-induced false
positive at W=65536, d=4, T=6)."""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def test_cms_overestimates_every_gram(spark):
    from ophois_spark.operators.sketches import cms_heavy_hitters
    from ophois_spark.queries import _gram_stream

    grams = _gram_stream(spark, SF_DIR)
    # threshold 0 keeps every candidate → checks the invariant globally
    all_est = cms_heavy_hitters(grams, 0)
    viol = all_est.filter(F.col("n_est") < F.col("n_true")).count()
    assert viol == 0


def test_cms_heavy_hitter_surface_pinned(spark):
    from ophois_spark.queries import CMS_HH_THRESHOLD, QUERIES

    hh = QUERIES["cms_heavy_hitters"](spark, SF_DIR).collect()
    assert len(hh) == 48
    fp = [r for r in hh if r["n_true"] < CMS_HH_THRESHOLD]
    assert len(fp) == 1  # one collision-driven overestimate, disclosed

"""Plan assertions for the html/walk/sketch batch: the parse and
sketch pipelines must stay JVM-side (no Python eval operators in the
physical plan — the repo-wide no-per-row-Python invariant), and the
skip-gram self-join must be a plain shuffled equi-join, not a
nested-loop."""

import os

import pytest

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize(
    "name", ["html_outlinks", "anchor_text_rollup", "ngram_cms", "graph_random_walks"]
)
def test_no_python_eval(spark, name):
    from ophois_spark.queries import QUERIES

    plan = _physical(QUERIES[name](spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_skipgram_join_is_hash_join(spark):
    from ophois_spark.queries import QUERIES

    plan = _physical(QUERIES["skipgram_pairs"](spark, SF_DIR))
    assert "NestedLoop" not in plan  # walk-key equi-join with step residual
    assert "Join" in plan

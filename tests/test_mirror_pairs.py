"""Pins for source_mirror_pairs: threshold edge, df-cap, asymmetry."""

from ophois_spark.operators.dedup import source_mirror_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_mirror_threshold_cross_multiplied_edge(spark):
    # a has 3 fps, b shares exactly 1 of them and has 1 own:
    # J = 1/(3+2-1) = 0.25 < 0.5 -> out; c shares 2 of a's 3:
    # J = 2/(3+2-2) = 2/3 >= 0.5 -> in
    rows = [
        (1, "a", "x1"), (2, "a", "x2"), (3, "a", "x3"),
        (4, "b", "x1"), (5, "b", "y1"),
        (6, "c", "x1"), (7, "c", "x2"),
    ]
    out = {(r.source_a, r.source_b): r for r in source_mirror_pairs(_docs(spark, rows)).collect()}
    assert ("a", "b") not in out
    assert out[("a", "c")].n_shared == 2 and out[("a", "c")].jac_pct == 66


def test_mirror_boilerplate_fp_excluded_from_shared(spark):
    # one fp on every source (chrome) must not create pairs
    rows = []
    for s in range(12):
        rows.append((s * 10, f"s{s:02d}", "nav home about"))
        rows.append((s * 10 + 1, f"s{s:02d}", f"unique body {s}"))
    out = source_mirror_pairs(_docs(spark, rows)).collect()
    assert out == []


def test_mirror_whitespace_normalized_fingerprint(spark):
    # same content modulo whitespace -> same fingerprint -> full mirror
    rows = [
        (1, "a", "hello  world\tfoo"),
        (2, "b", "hello world foo"),
    ]
    out = source_mirror_pairs(_docs(spark, rows)).collect()
    assert len(out) == 1 and out[0].jac_pct == 100

"""Ingest stage: pages → records → graph, incl. byte parity per url."""

from pyspark.sql import functions as F

from ophois_spark.kernels.osmxml import extract_records
from ophois_spark.operators.extract import extract_page_records, graph_from_pages
from ophois_spark.operators.metrics import degree_distribution, distribution_lines
from ophois_spark.sources.pages import page_xml, synth_pages

SEP = "␟"


def test_spark_extraction_byte_identical_per_url(spark):
    """The Spark records for a url must byte-equal the kernel's output
    (BASELINE.json input_hint: byte-identical extracted text per url)."""
    xml = page_xml(0, 0, grid=4)
    # golden strings from the reference tests too (src/openstreetmap.rs:93-104)
    ref_node = '<node id="618904" lat="50.6011263" lon="3.2519549"/>'
    ref_way = (
        '<way id="951505353"><nd ref="8807254574"/><nd ref="8807254575"/>'
        '<nd ref="8507963130"/><tag k="highway" v="residential"/></way>'
    )
    pages = spark.createDataFrame(
        [("u1", xml), ("u2", ref_node + "\n" + ref_way)], "url string, text string"
    )
    got = (
        extract_page_records(pages)
        .orderBy("url", "pos")
        .groupBy("url")
        .agg(F.collect_list("line").alias("lines"))
        .collect()
    )
    by_url = {r["url"]: r["lines"] for r in got}
    assert by_url["u1"] == extract_records(xml.splitlines(), SEP)
    assert by_url["u2"] == [
        "618904␟50.6011263␟3.2519549",
        "8807254574␟8807254575",
        "8807254575␟8507963130",
    ]


def test_synth_pages_graph_counts(spark):
    """4 tiles in a 2×2 super-grid of 4×4 grids share boundary nodes."""
    n_pages = 4
    pages = synth_pages(spark, n_pages, grid=4).filter(F.col("lang") == "en")
    g = graph_from_pages(pages)
    # global grid is 7×7 intersections (tiles overlap by one row/col)
    assert g.nodes.count() == 49
    # edges: 7 rows × 6 + 7 cols × 6 = 84 undirected canonical
    assert g.edges.count() == 84
    # interior intersections have degree 4
    dist = dict(
        (r["degree"], r["n_nodes"]) for r in degree_distribution(g).collect()
    )
    assert dist == {2: 4, 3: 20, 4: 25}


def test_synth_pages_deterministic(spark):
    a = synth_pages(spark, 8, grid=3).orderBy("url").collect()
    b = synth_pages(spark, 8, grid=3).orderBy("url").collect()
    assert a == b
    langs = {r["lang"] for r in a}
    assert "en" in langs and len(langs) > 1  # noise pages present


def test_cross_page_dedup_consistent_coords(spark):
    """Shared boundary nodes must dedup to a single row (same coords)."""
    pages = synth_pages(spark, 4, grid=4).filter(F.col("lang") == "en")
    recs = extract_page_records(pages)
    nodes = recs.filter(F.size(F.split("line", SEP)) == 3).select(
        F.split("line", SEP)[0].alias("id"), F.col("line")
    )
    # every duplicated node id must carry an identical full record
    dup_variants = (
        nodes.groupBy("id")
        .agg(F.countDistinct("line").alias("v"), F.count("line").alias("c"))
        .filter((F.col("c") > 1) & (F.col("v") > 1))
    )
    assert dup_variants.count() == 0

from ophois_spark.streaming.ingest_stream import (
    band_key_rows,
    stream_band_registry,
    stream_dedup_nodes,
    stream_doc_registry,
    stream_graph_snapshots,
    stream_node_registry,
    stream_page_records,
    stream_sessionize,
)

__all__ = [
    "band_key_rows",
    "stream_band_registry",
    "stream_page_records",
    "stream_dedup_nodes",
    "stream_doc_registry",
    "stream_graph_snapshots",
    "stream_node_registry",
    "stream_sessionize",
]

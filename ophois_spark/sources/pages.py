"""Deterministic synthetic pages table (Common-Crawl-style).

Schema per BASELINE.json input_hint:
``pages(url: string, warc_ts: timestamp, html: binary, text: string,
lang: string)``.

Each map page embeds an OSM-XML street grid for one tile of a global
super-grid. Tiles OVERLAP by one row/column of intersections, so
adjacent pages re-emit the same node ids with the same coordinates —
the workload that makes cross-page node dedup (and the same-cell join)
non-trivial, mirroring how the same OSM node appears in many
Common-Crawl page snapshots. Every 7th page is non-map noise (different
lang) so lang filtering + parquet pushdown are exercised.

Generation is distributed (``mapInPandas`` over ``spark.range``) and
deterministic in (n_pages, grid): no RNG, jitter is a hash of the
global intersection coordinates. Replaces the reference's network
download stage (src/overpass.rs:4-19), which is unavailable in-sandbox.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"

_NOISE_EVERY = 7


def _jitter(gx: int, gy: int, salt: int) -> int:
    """Deterministic pseudo-jitter in [-10, 10] (no RNG — reproducible)."""
    h = (gx * 2654435761 + gy * 40503 + salt * 97) & 0xFFFFFFFF
    return (h % 21) - 10


def _coord_str(base_nano: int, g: int, jit: int) -> str:
    """Exact decimal coordinate string from integer nano-degrees."""
    nano = base_nano + g * 100_000 + jit * 1_000
    s = f"{nano // 10**9}.{nano % 10**9:09d}".rstrip("0")
    return s + "0" if s.endswith(".") else s


def _node_id(gx: int, gy: int) -> str:
    return str(1_000_000_000 + gx * 100_000 + gy)


def page_xml(tile_x: int, tile_y: int, grid: int) -> str:
    """OSM XML for one tile: grid×grid intersections, row+column ways.

    The last row/column of tile (tx, ty) carries the same global ids and
    coordinates as the first row/column of tiles (tx+1, ty) / (tx, ty+1).
    Ways are emitted multi-line to exercise the format stage; nodes are
    self-closing single lines.
    """
    step = grid - 1
    lines = ['<?xml version="1.0" encoding="UTF-8"?>', '<osm version="0.6">']
    for cx in range(grid):
        for cy in range(grid):
            gx, gy = tile_x * step + cx, tile_y * step + cy
            lat = _coord_str(45_000_000_000, gy, _jitter(gx, gy, 1))
            lon = _coord_str(5_000_000_000, gx, _jitter(gx, gy, 2))
            lines.append(f'  <node id="{_node_id(gx, gy)}" lat="{lat}" lon="{lon}"/>')
    way_id = (tile_x * 1_000_003 + tile_y) * 100
    for cy in range(grid):  # horizontal ways
        lines.append(f'  <way id="{way_id + cy}">')
        for cx in range(grid):
            lines.append(f'    <nd ref="{_node_id(tile_x * step + cx, tile_y * step + cy)}"/>')
        lines.append('    <tag k="highway" v="residential"/>')
        lines.append("  </way>")
    for cx in range(grid):  # vertical ways
        lines.append(f'  <way id="{way_id + grid + cx}">')
        for cy in range(grid):
            lines.append(f'    <nd ref="{_node_id(tile_x * step + cx, tile_y * step + cy)}"/>')
        lines.append('    <tag k="highway" v="residential"/>')
        lines.append("  </way>")
    lines.append("</osm>")
    return "\n".join(lines)


def synth_pages(spark: SparkSession, n_pages: int, grid: int = 12) -> DataFrame:
    """Distributed deterministic pages DataFrame."""
    side = max(1, int(n_pages**0.5))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                url = f"https://maps.example.org/page/{i:09d}"
                ts = pd.Timestamp("2024-01-01") + pd.Timedelta(days=i % 365, minutes=i % 1440)
                if i % _NOISE_EVERY == _NOISE_EVERY - 1:
                    text = f"Lorem ipsum page {i} — no map content here. " * 8
                    lang = "de" if i % 2 else "fr"
                else:
                    text = page_xml(i % side, i // side, grid)
                    lang = "en"
                rows.append((url, ts, text[:64].encode(), text, lang))
            yield pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])

    return spark.range(n_pages).mapInPandas(gen, PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# Valid media payloads for the REAL decode paths (round 5).
#
# Deterministic, closed-form content so a DuckDB oracle can recompute
# every decoded feature from doc_id arithmetic without parsing bytes:
#   BMP  (24-bit, bottom-up, padded rows):
#     width  = 1 + doc_id % 16,  height = 1 + (doc_id * 7) % 12
#     pixel byte k (row-major top-down, BGR in-file) = (doc_id + k) % 256
#   WAV  (PCM16 mono, 8000 Hz):
#     n_samples = 8 + doc_id % 57
#     sample k = ((doc_id * 31 + k * 997) % 65536) - 32768
# ---------------------------------------------------------------------------


def synth_bmp(doc_id: int) -> bytes:
    """One valid uncompressed 24-bit BMP, bottom-up row order."""
    w = 1 + doc_id % 16
    h = 1 + (doc_id * 7) % 12
    row_size = ((3 * w + 3) // 4) * 4
    pix_bytes = row_size * h
    # pixel byte stream in row-major TOP-DOWN order
    stream = bytes((doc_id + k) % 256 for k in range(3 * w * h))
    rows = [
        stream[y * 3 * w : (y + 1) * 3 * w] + b"\x00" * (row_size - 3 * w)
        for y in range(h)
    ]
    pixel_data = b"".join(reversed(rows))  # stored bottom-up
    header = (
        b"BM"
        + (54 + pix_bytes).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")  # pixel offset
        + (40).to_bytes(4, "little")  # BITMAPINFOHEADER size
        + w.to_bytes(4, "little")
        + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # planes
        + (24).to_bytes(2, "little")  # bpp
        + (0).to_bytes(4, "little")  # BI_RGB (uncompressed)
        + pix_bytes.to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2  # 72 dpi
        + (0).to_bytes(4, "little") * 2  # palette
    )
    return header + pixel_data


def synth_wav(doc_id: int) -> bytes:
    """One valid PCM16 mono WAV."""
    n = 8 + doc_id % 57
    samples = b"".join(
        (((doc_id * 31 + k * 997) % 65536) - 32768).to_bytes(
            2, "little", signed=True
        )
        for k in range(n)
    )
    data_size = len(samples)
    rate, block, bits = 8000, 2, 16
    return (
        b"RIFF"
        + (36 + data_size).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")  # PCM
        + (1).to_bytes(2, "little")  # mono
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
        + b"data"
        + data_size.to_bytes(4, "little")
        + samples
    )


def synth_bmp_media(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_type='image', payload=valid BMP).

    Arrow-batched builder; payload bytes are minted executor-side and
    never touch the driver — the same plumbing shape as reading real
    WARC media bytes.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": "image",
                    "payload": [synth_bmp(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, "doc_id long, media_type string, payload binary"
    )


def synth_wav_media(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, media_type='audio', payload=valid WAV)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media_type": "audio",
                    "payload": [synth_wav(int(d)) for d in pdf["doc_id"]],
                }
            )

    return docs.select("doc_id").mapInPandas(
        gen, "doc_id long, media_type string, payload binary"
    )

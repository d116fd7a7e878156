"""OSM-XML format + extract kernels — byte-identical to the reference.

The reference ingests OSM XML in two piped stages
(reference: src/openstreetmap.rs:24-88):

1. ``format_xml`` — a line state machine that emits each ``<node>`` /
   ``<way>`` element on exactly one physical line (self-closing lines
   pass through; multi-line elements are trimmed and concatenated with
   no joiner, closing tag included).
2. ``extract`` — per element line: nodes project ``id␟lat␟lon`` with
   lat/lon copied VERBATIM as strings (no float round-trip,
   src/openstreetmap.rs:59-65); ways project the consecutive-pair edge
   list ``nd[i]␟nd[i+1]`` (src/openstreetmap.rs:67-80). ``<tag>``
   children are ignored.

These kernels are plain Python over ``list[str]`` so they can be unit
tested for byte parity and wrapped in a vectorized pandas UDF
(one call per page, not per line) by ``ophois_spark.operators.extract``.
"""

from __future__ import annotations

import re

_RE_ID = re.compile(r'\bid="([^"]*)"')
_RE_LAT = re.compile(r'\blat="([^"]*)"')
_RE_LON = re.compile(r'\blon="([^"]*)"')
_RE_ND_REF = re.compile(r'<nd[^>]*\bref="([^"]*)"')


def format_lines(lines: list[str]) -> list[str]:
    """Normalize raw XML lines → one line per <node>/<way> element.

    Faithful to the reference state machine (src/openstreetmap.rs:24-57)
    including its quirks: rows are trimmed; while inside an element every
    row (tags, nd refs) is appended with no joiner; a row containing the
    closing tag flushes the buffer.
    """
    out: list[str] = []
    data = ""
    node = False
    way = False
    for raw in lines:
        row = raw.strip()
        if row.startswith("<node") and row.endswith("/>"):
            out.append(row)
        if row.startswith("<way") and row.endswith("/>"):
            out.append(row)
        if row.startswith("<node") and not row.endswith("/>"):
            node = True
            data = ""
        if row.startswith("<way") and not row.endswith("/>"):
            way = True
            data = ""
        if node or way:
            data += row
        if "</node>" in row:
            node = False
            out.append(data)
        if "</way>" in row:
            way = False
            out.append(data)
    return out


def extract_node(line: str, separator: str) -> str:
    """``<node id=… lat=… lon=…/>`` → ``id␟lat␟lon`` (attribute order-insensitive)."""
    m_id = _RE_ID.search(line)
    m_lat = _RE_LAT.search(line)
    m_lon = _RE_LON.search(line)
    if m_id is None or m_lat is None or m_lon is None:
        raise ValueError(f"node element missing id/lat/lon: {line!r}")
    return f"{m_id.group(1)}{separator}{m_lat.group(1)}{separator}{m_lon.group(1)}"


def extract_way_pairs(line: str, separator: str) -> list[str]:
    """``<way>…<nd ref=…/>…</way>`` → consecutive-pair link records.

    A way of n nd refs yields n-1 records ``ref[i]␟ref[i+1]``; tags are
    ignored. A way with <2 refs yields nothing (the reference panics on
    0 refs — src/openstreetmap.rs:71 — the engine filters instead).
    """
    refs = _RE_ND_REF.findall(line)
    return [f"{refs[i]}{separator}{refs[i + 1]}" for i in range(len(refs) - 1)]


def extract_line(line: str, separator: str) -> list[str]:
    """Per-formatted-line extract dispatch (reference ``extract``,
    src/openstreetmap.rs:59-88): node lines project one record, way
    lines their consecutive-pair records, anything else nothing."""
    if line.startswith("<node"):
        return [extract_node(line, separator)]
    if line.startswith("<way"):
        return extract_way_pairs(line, separator)
    return []


def extract_records(lines: list[str], separator: str) -> list[str]:
    """format+extract fused: raw page lines → node/link line records.

    Equivalent to ``ophois format | ophois extract`` per page
    (src/main.rs:60-65); kept fused so byte parity is testable per url.
    """
    out: list[str] = []
    for line in format_lines(lines):
        out.extend(extract_line(line, separator))
    return out

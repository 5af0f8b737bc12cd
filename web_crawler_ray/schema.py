"""Arrow schemas for every stage boundary (SURVEY §1.4).

The reference keeps all of these implicit (JS object shapes); imposing
fixed Arrow schemas is the core semantic tightening of the rebuild.
"""

from __future__ import annotations

import pyarrow as pa

# Span struct — the BASELINE input_hint payload: interleaved text+media
# documents. kind ∈ {text, media}; text empty for media spans; media_ref
# empty for text spans; offset strictly increasing within a row.
SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

DOCUMENTS = pa.schema([
    ("doc_id", pa.string()),
    ("spans", pa.list_(SPAN_STRUCT)),
])

FRONTIER = pa.schema([
    ("url", pa.string()),
    ("url_hash", pa.uint64()),
    ("host", pa.string()),
    ("depth", pa.int32()),
    ("priority", pa.int8()),
    ("discovery_seq", pa.int64()),
    ("parent_url_hash", pa.uint64()),
])

PAGES = pa.schema([
    ("url", pa.string()),
    ("url_hash", pa.uint64()),
    ("host", pa.string()),
    ("status", pa.int16()),
    ("content_type", pa.string()),
    ("html", pa.large_string()),
    ("xhr_json", pa.large_string()),
    ("out_links", pa.list_(pa.string())),
])

ROBOTS = pa.schema([
    ("host", pa.string()),
    ("robots_txt", pa.string()),
])

LOCATIONS_RAW = pa.schema([
    ("source_url", pa.string()),
    ("name", pa.string()),
    ("address", pa.string()),
    ("street", pa.string()),
    ("city", pa.string()),
    ("state", pa.string()),
    ("postal_code", pa.string()),
    ("country", pa.string()),
    ("latitude", pa.string()),     # stringified, as in the reference
    ("longitude", pa.string()),
    ("phone", pa.string()),
    ("email", pa.string()),
    ("activity", pa.string()),
    ("extraction_method", pa.string()),
    ("confidence", pa.float32()),
])

LOCATIONS = pa.schema([
    ("location_name", pa.string()),
    ("location_address", pa.string()),
    ("activity_at_asset", pa.string()),
    ("latitude", pa.string()),
    ("longitude", pa.string()),
    ("country_iso3", pa.string()),
    ("postcode", pa.string()),
    ("state", pa.string()),
    ("street_or_city", pa.string()),
    ("footprint", pa.string()),
    ("height", pa.float32()),
    ("usage_share", pa.string()),
    ("source_url", pa.string()),
    ("source_type", pa.string()),
    ("extraction_method", pa.string()),
    ("confidence", pa.float32()),
    ("quality_score", pa.int8()),
])

SEEN_DELTA = pa.schema([
    ("url_hash", pa.uint64()),
])

METRICS = pa.schema([
    ("round", pa.int32()),
    ("partition_id", pa.int32()),
    ("stage", pa.string()),
    ("rows_in", pa.int64()),
    ("rows_out", pa.int64()),
])


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()

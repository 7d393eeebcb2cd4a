"""Canonical Arrow schemas (SURVEY.md §1.2, FIXTURES.md §1).

The document table is the input_hint shape from BASELINE.json:15 —
``(doc_id:string, spans:list<struct<kind,text,media_ref,offset>>)``.
Input span kinds are ``"text" | "media"``; output span kinds are
``"text" | "exif"``. Offsets are 0-based ordinals within the document and are
the ONLY ordering the engine may rely on (never list order, never execution
order).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),       # input: "text" | "media"; output: "text" | "exif"
        ("text", pa.string()),       # payload for text/exif spans; "" for media input spans
        ("media_ref", pa.string()),  # opaque media reference; "" for pure-text spans
        ("offset", pa.int32()),      # 0-based ordinal of the span within the document
    ]
)

DOC_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
    ]
)

# Intermediate "unit" table: one row per extraction unit (a text span, one
# media *page*, or one media exif block). Produced by stages/explode.py,
# consumed by stages/extract.py (the actor pool). This is the reference's
# work-queue item (SURVEY.md §2.1 S2/S3) as a narrow Arrow row.
UNIT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part_id", pa.int32()),    # hash(doc_id) % num_partitions — reused at reassembly
        ("dup_key", pa.uint64()),   # content hash of the whole doc row (duplicate-doc_id arbitration)
        ("in_offset", pa.int32()),  # offset of the originating input span
        ("unit", pa.string()),      # "text" | "page" | "exif"
        ("page_no", pa.int32()),    # -1 for text units; 0..p-1 for pages; p for the exif unit
        ("media_ref", pa.string()),
        ("psm", pa.int32()),        # page-segmentation mode for page units; -1 otherwise
        ("payload", pa.binary()),   # page/exif: sliced container bytes; text: utf-8 text
    ]
)

# Extracted-unit table: output of the ExtractActor pool, input to reassembly.
EXTRACTED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("part_id", pa.int32()),
        ("dup_key", pa.uint64()),
        ("in_offset", pa.int32()),
        ("page_no", pa.int32()),
        ("sub_no", pa.int32()),     # ordinal within a unit (exif tag index); 0 otherwise
        ("kind", pa.string()),      # "text" | "exif" | "error"
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("status", pa.string()),    # "ok" | "error"
        ("error", pa.string()),
        ("worker_id", pa.string()), # per-file accounting (T7/A3): which worker
        ("elapsed_us", pa.int64()), # approx per-row extraction time (batch/rows)
    ]
)

OUT_SPAN_COLUMNS = ("kind", "text", "media_ref", "offset")

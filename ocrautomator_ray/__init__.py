"""ocrautomator_ray — a from-scratch Ray-Data-native extraction engine.

Capabilities modeled on ``labinnovationdocapost/ocrAutomator`` (a parallel
Tesseract-OCR + exif-metadata pipeline; see SURVEY.md — the reference checkout
was empty, so provenance tags ``[B]``/``[R-*]`` in SURVEY.md §0 are the
citation scheme used throughout this package), re-expressed per the driver's
north rule as a main-content extraction pipeline over Lance/Arrow tables of
interleaved text + media documents:

    ray.data.Dataset → map_batches (explode pages)
                     → repartition (skew)
                     → map_batches(ExtractActor, concurrency=...)  # stateful pool
                     → groupby(part_id).map_groups(reassemble + commit)

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

from ocrautomator_ray.schema import DOC_SCHEMA, SPAN_TYPE

__all__ = ["DOC_SCHEMA", "SPAN_TYPE"]


def _strip_pandas_block_metadata() -> None:
    """Make pandas-origin Arrow blocks metadata-free.

    ``pa.Table.from_pandas`` attaches schema-level pandas metadata, and a
    schema with ANY metadata is unhashable in this pyarrow build — so every
    pandas-format map stage feeding a hash exchange makes the shuffle
    aggregator log 'Failed to hash the schemas (for deduplication):
    unhashable type: dict' per shard merge and lose its schema-dedup fast
    path. The reads already strip source metadata (see
    ``exchange._stripped_schema``); this covers the blocks REGENERATED from
    pandas inside the plan. Installed at package import, which reaches every
    process that runs this package's UDFs — including the fused
    map+shuffle-write tasks that perform the pandas→Arrow conversion."""
    try:
        from ray.data._internal.pandas_block import PandasBlockAccessor
    except Exception:  # pragma: no cover - future Ray layout change
        return
    orig = PandasBlockAccessor.to_arrow
    if getattr(orig, "_oar_metadata_strip", False):
        return

    def to_arrow(self):
        t = orig(self)
        return t.replace_schema_metadata(None) if t.schema.metadata else t

    to_arrow._oar_metadata_strip = True
    PandasBlockAccessor.to_arrow = to_arrow


_strip_pandas_block_metadata()

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

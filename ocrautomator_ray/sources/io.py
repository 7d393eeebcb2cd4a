"""IO seam: Lance-shaped API, Parquet fallback (SURVEY.md §1.2).

BASELINE.json:15 specifies Lance tables; this sandbox has
``ray.data.read_lance`` but no ``lance`` package, so the reader/writer is a
two-line pluggable seam: Lance when the path says so and the package exists,
Parquet (identical schema, one fragment per partition) otherwise. Everything
downstream is format-agnostic Arrow.
"""

from __future__ import annotations

import ray.data as rd


def _lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


def read_docs(uri: str, assert_schema: bool = True, **kwargs) -> rd.Dataset:
    """Read a document table. The schema is DECLARED, not inferred
    (SURVEY.md §1.2): with assert_schema the fragment schema is checked
    against DOC_SCHEMA up front so a wrong input fails at plan time, not
    mid-pipeline."""
    if uri.endswith(".lance") and _lance_available():
        ds = rd.read_lance(uri, **kwargs)
    elif uri.endswith((".jsonl", ".json")):
        ds = rd.read_json(uri, **kwargs)
    else:
        ds = rd.read_parquet(uri, **kwargs)
    if assert_schema:
        from ocrautomator_ray.schema import DOC_SCHEMA

        got = ds.schema()
        names = list(got.names)
        if names != list(DOC_SCHEMA.names):
            raise ValueError(
                f"input at {uri!r} is not a document table: columns {names}, "
                f"expected {list(DOC_SCHEMA.names)}"
            )
    return ds


def write_docs(ds: rd.Dataset, uri: str, **kwargs) -> None:
    if uri.endswith(".lance") and _lance_available():
        ds.write_lance(uri, **kwargs)
    else:
        ds.write_parquet(uri, **kwargs)

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


def read_docs(uri: str, **kwargs) -> rd.Dataset:
    if uri.endswith(".lance") and _lance_available():
        return rd.read_lance(uri, **kwargs)
    return rd.read_parquet(uri, **kwargs)


def write_docs(ds: rd.Dataset, uri: str, **kwargs) -> None:
    if uri.endswith(".lance") and _lance_available():
        ds.write_lance(uri, **kwargs)
    else:
        ds.write_parquet(uri, **kwargs)

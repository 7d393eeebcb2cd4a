"""Explode stage: document rows → extraction-unit rows (SURVEY.md §2.1 S1-S3).

One stateless ``map_batches`` that plays the reference's producer thread: it
enumerates spans per document, resolves ``media_ref`` → container bytes (the
S2 file load), structurally indexes the container, and emits one narrow row
per *unit* — a text span, one media page (sliced bytes only, the S3
rasterizer's per-page work item), or one exif block — so the downstream actor
pool schedules at page granularity and a 1000-page document never pins a
single worker (the skew mandate, BASELINE.json:6).

Per-document Python iteration here is the honest shape: this is structural
enumeration of a nested row (exactly what the reference's enumerator does),
and the per-doc cost is one ref-parse + byte-slice, not per-page decode work.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

from ocrautomator_ray import codec
from ocrautomator_ray.schema import UNIT_SCHEMA
from ocrautomator_ray.state.manifest import partition_ids
from ocrautomator_ray.synth import doc_dup_key


def make_explode(num_partitions: int, out_chunk_rows: int = 1024):
    """Explode UDF. Yields unit-row chunks of ≤ out_chunk_rows so each chunk
    becomes its own output block — this controls the *task granularity* of the
    downstream actor pool (Ray Data does not split blocks into smaller actor
    tasks, so a monolithic explode output block would hand one actor a whole
    input block's pages and leave the rest of the pool idle)."""

    def explode(batch: pa.Table):
        batch = batch.combine_chunks()
        doc_ids = batch["doc_id"].to_pylist()
        spans_rows = batch["spans"].to_pylist()
        pids = partition_ids(batch["doc_id"], num_partitions)

        cols: dict[str, list] = {name: [] for name in UNIT_SCHEMA.names}

        def flush() -> pa.Table:
            nonlocal cols
            out = pa.Table.from_pydict(cols, schema=UNIT_SCHEMA)
            cols = {name: [] for name in UNIT_SCHEMA.names}
            return out

        def emit(did, pid, dkey, in_off, unit, page_no, ref, psm, payload):
            cols["doc_id"].append(did)
            cols["part_id"].append(pid)
            cols["dup_key"].append(dkey)
            cols["in_offset"].append(in_off)
            cols["unit"].append(unit)
            cols["page_no"].append(page_no)
            cols["media_ref"].append(ref)
            cols["psm"].append(psm)
            cols["payload"].append(payload)

        for i, did in enumerate(doc_ids):
            if len(cols["doc_id"]) >= out_chunk_rows:
                yield flush()
            spans = spans_rows[i] or []
            pid = int(pids[i])
            dkey = doc_dup_key(did, spans)
            if not spans:
                emit(did, pid, dkey, -1, "empty", -1, "", -1, b"")
                continue
            for s in sorted(spans, key=lambda s: s["offset"]):
                off = s["offset"]
                if s["kind"] == "text":
                    emit(did, pid, dkey, off, "text", -1, "", -1,
                         (s["text"] or "").encode())
                elif s["kind"] == "media":
                    ref = s["media_ref"] or ""
                    try:
                        data = codec.encode_media(ref)
                        idx = codec.index_container(data)
                    except codec.CodecError as e:
                        emit(did, pid, dkey, off, "poison", -1, ref, -1,
                             str(e).encode())
                        continue
                    for p, (a, b) in enumerate(idx.page_slices):
                        emit(did, pid, dkey, off, "page", p, ref, idx.psm,
                             data[a:b])
                    ea, eb = idx.exif_slice
                    emit(did, pid, dkey, off, "exif", idx.pages, ref, -1,
                         data[ea:eb])
                else:
                    emit(did, pid, dkey, off, "poison", -1, "",
                         -1, f"unknown span kind {s['kind']!r}".encode())

        if len(cols["doc_id"]):
            yield flush()

    return explode


def make_resume_filter(completed: set[int], num_partitions: int) -> Callable[[pa.Table], pa.Table]:
    """Drop documents whose output partition is already committed (S5/J1).

    The completed set is O(partitions) — fragment-level pruning, broadcast by
    closure capture (cloudpickle ships it once per task, not per batch).
    """
    frozen = frozenset(completed)

    def resume_filter(batch: pa.Table) -> pa.Table:
        import numpy as np

        pids = partition_ids(batch["doc_id"], num_partitions)
        mask = ~np.isin(pids, list(frozen))
        return batch.filter(pa.array(mask))

    return resume_filter

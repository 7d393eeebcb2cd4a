"""ExtractActor — the stateful extraction actor pool (SURVEY.md §2.2 T1-T4,
§2.3 ST1, §2.10 U1).

The engine's analogue of the reference's warm-TessBaseAPI worker thread:
``__init__`` builds the expensive decoder state once per actor (model-load
economics), ``__call__`` processes one Arrow batch of unit rows. Passed to
``map_batches(ExtractActor, concurrency=(min,max), num_cpus=1,
batch_format="pyarrow")`` so one warm engine per reserved CPU, exactly the
reference's N-threads-with-warm-engines design.

Extensibility (U1 — the reference's BaseOcr/OcrFactory seam): media decoding
is pluggable via ``decoder_factory``; text-span extraction dispatches through
``stages.extractors.TEXT_EXTRACTORS`` (html / pdftext / plain built-ins), and
``register_text_extractor`` adds new sniffed kinds.

Row-level errors (poison payloads) are captured as status="error" rows (T8):
a bad row never kills a task, so Ray's task retries are reserved for real
faults. Each output row carries worker_id + approximate per-row elapsed time
(T7) — the per-file accounting the reference kept in its status structs;
per-worker breakdowns land in the partition manifests (A3).
"""

from __future__ import annotations

import time
from collections.abc import Callable

import pyarrow as pa

from ocrautomator_ray import codec
from ocrautomator_ray.schema import EXTRACTED_SCHEMA
from ocrautomator_ray.stages.extractors import TEXT_EXTRACTORS, sniff_text_kind


def register_text_extractor(kind: str, fn: Callable[[str], str]) -> None:
    """Register a text-span extractor for a sniffed content kind (U1)."""
    TEXT_EXTRACTORS[kind] = fn


class ExtractActor:
    def __init__(self, work_factor: int = 8,
                 decoder_factory: Callable[[int], object] | None = None,
                 psm_override: int | None = None):
        # psm_override (T2): the reference's run-level --psm CLI flag — forces
        # one segmentation mode for every page, overriding per-ref psm.
        # Warm state: full cipher key schedule (the "loaded .traineddata").
        factory = decoder_factory or (lambda wf: codec.MediaDecoder(work_factor=wf))
        self.decoder = factory(work_factor)
        self.psm_override = psm_override
        self.text_extractors = dict(TEXT_EXTRACTORS)
        try:
            import ray

            self.worker_id = ray.get_runtime_context().get_worker_id()[:12]
        except Exception:
            self.worker_id = "local"

    def _extract_text(self, s: str) -> str:
        return self.text_extractors[sniff_text_kind(s)](s)

    def __call__(self, batch: pa.Table) -> pa.Table:
        t_start = time.perf_counter()
        batch = batch.combine_chunks()
        n = batch.num_rows
        unit = batch["unit"].to_pylist()
        psm = batch["psm"].to_pylist()
        payload = batch["payload"].to_pylist()

        # Per-row python work only where the decode itself is per-row (the
        # honest OCR shape); passthrough key columns are rebuilt with one
        # vectorized take over src_idx instead of per-row appends.
        src_idx: list[int] = []
        sub_no: list[int] = []
        kind: list[str] = []
        text: list[str] = []
        status: list[str] = []
        error: list[str] = []

        def emit(i, sub, k, t, st="ok", err=""):
            src_idx.append(i)
            sub_no.append(sub)
            kind.append(k)
            text.append(t)
            status.append(st)
            error.append(err)

        for i in range(n):
            u = unit[i]
            try:
                if u == "page":
                    emit(i, 0, "text", self.decoder.decode_page(
                        payload[i], self.psm_override or psm[i]))
                elif u == "text":
                    emit(i, 0, "text", self._extract_text(payload[i].decode()))
                elif u == "exif":
                    for j, (k, v) in enumerate(codec.decode_exif_block(payload[i])):
                        emit(i, j, "exif", f"{k}={v}")
                elif u == "empty":
                    emit(i, 0, "empty", "")
                elif u == "poison":
                    emit(i, 0, "error", "", "error", payload[i].decode(errors="replace"))
                else:
                    emit(i, 0, "error", "", "error", f"unknown unit {u!r}")
            except codec.CodecError as e:
                emit(i, 0, "error", "", "error", str(e))

        n_out = len(src_idx)
        idx = pa.array(src_idx, type=pa.int32())
        elapsed_us = int((time.perf_counter() - t_start) * 1e6 / max(1, n_out))
        cols = {
            "doc_id": batch["doc_id"].take(idx),
            "part_id": batch["part_id"].take(idx),
            "dup_key": batch["dup_key"].take(idx),
            "in_offset": batch["in_offset"].take(idx),
            "page_no": batch["page_no"].take(idx),
            "sub_no": pa.array(sub_no, type=pa.int32()),
            "kind": pa.array(kind, type=pa.string()),
            "text": pa.array(text, type=pa.string()),
            "media_ref": batch["media_ref"].take(idx),
            "status": pa.array(status, type=pa.string()),
            "error": pa.array(error, type=pa.string()),
            "worker_id": pa.array([self.worker_id] * n_out, type=pa.string()),
            "elapsed_us": pa.array([elapsed_us] * n_out, type=pa.int64()),
        }
        return pa.Table.from_pydict(cols, schema=EXTRACTED_SCHEMA)

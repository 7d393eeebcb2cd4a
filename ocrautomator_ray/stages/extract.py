"""ExtractActor — the stateful extraction actor pool (SURVEY.md §2.2 T1-T4,
§2.3 ST1).

The engine's analogue of the reference's warm-TessBaseAPI worker thread:
``__init__`` builds the expensive decoder state once per actor (model-load
economics), ``__call__`` processes one Arrow batch of unit rows. Passed to
``map_batches(ExtractActor, concurrency=(min,max), num_cpus=1,
batch_format="pyarrow")`` so one warm engine per reserved CPU, exactly the
reference's N-threads-with-warm-engines design.

Row-level errors (poison payloads) are captured as status="error" rows (T8):
a bad row never kills a task, so Ray's task retries are reserved for real
faults.
"""

from __future__ import annotations

import pyarrow as pa

from ocrautomator_ray import codec
from ocrautomator_ray.schema import EXTRACTED_SCHEMA
from ocrautomator_ray.stages.extractors import extract_text_span


class ExtractActor:
    def __init__(self, work_factor: int = 8):
        # Warm state: full cipher key schedule (the "loaded .traineddata").
        self.decoder = codec.MediaDecoder(work_factor=work_factor)
        try:
            import ray

            self.worker_id = ray.get_runtime_context().get_worker_id()[:12]
        except Exception:
            self.worker_id = "local"

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = batch.combine_chunks()
        n = batch.num_rows
        doc_id = batch["doc_id"].to_pylist()
        part_id = batch["part_id"].to_pylist()
        dup_key = batch["dup_key"].to_pylist()
        in_off = batch["in_offset"].to_pylist()
        unit = batch["unit"].to_pylist()
        page_no = batch["page_no"].to_pylist()
        media_ref = batch["media_ref"].to_pylist()
        psm = batch["psm"].to_pylist()
        payload = batch["payload"].to_pylist()

        cols: dict[str, list] = {name: [] for name in EXTRACTED_SCHEMA.names}

        def emit(i, sub_no, kind, text, status="ok", error=""):
            cols["doc_id"].append(doc_id[i])
            cols["part_id"].append(part_id[i])
            cols["dup_key"].append(dup_key[i])
            cols["in_offset"].append(in_off[i])
            cols["page_no"].append(page_no[i])
            cols["sub_no"].append(sub_no)
            cols["kind"].append(kind)
            cols["text"].append(text)
            cols["media_ref"].append(media_ref[i])
            cols["status"].append(status)
            cols["error"].append(error)

        for i in range(n):
            u = unit[i]
            try:
                if u == "page":
                    emit(i, 0, "text", self.decoder.decode_page(payload[i], psm[i]))
                elif u == "text":
                    emit(i, 0, "text", extract_text_span(payload[i].decode()))
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

        return pa.Table.from_pydict(cols, schema=EXTRACTED_SCHEMA)

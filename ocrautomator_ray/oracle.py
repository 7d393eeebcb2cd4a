"""Single-threaded pure-Python oracle (SURVEY.md §5.1).

Computes each document's expected output span sequence sequentially — the
ground truth every distributed-pipeline test asserts span-sequence equality
``(kind, text, media_ref, offset)`` against (BASELINE.json:15). Shares the
codec and the extractor functions with the engine: what the oracle pins is
the *orchestration* — explode/shuffle/reassembly/ordering/dedup/error
semantics — which is exactly what can go wrong under distribution.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from ocrautomator_ray import codec
from ocrautomator_ray.stages.extractors import extract_text_span
from ocrautomator_ray.synth import doc_dup_key


@dataclass
class OracleCounters:
    docs: int = 0
    pages_ocrd: int = 0
    exif_tags_written: int = 0
    errors: int = 0
    dup_docs_dropped: int = 0
    text_spans: int = 0


@dataclass
class OracleResult:
    spans_by_doc: dict[str, list[tuple[str, str, str, int]]] = field(default_factory=dict)
    counters: OracleCounters = field(default_factory=OracleCounters)


def expected_doc_spans(
    spans: list[dict], counters: OracleCounters | None = None,
    decoder: codec.MediaDecoder | None = None,
    psm_override: int | None = None,
) -> list[tuple[str, str, str, int]]:
    """Input spans (list of dicts) → expected output (kind, text, media_ref, offset).

    Semantics (FIXTURES.md §2):
      - process input spans in ``offset`` order (never list order);
      - text span → one extracted text span (media_ref "");
      - media span → its page texts (in page order) then its exif
        ``Key=Value`` spans (in tag order), all carrying the media_ref;
      - poison media (malformed ref) → contributes nothing, counted as error;
      - output offsets renumbered 0..n-1 over the whole document.
    """
    c = counters or OracleCounters()
    dec = decoder or codec.MediaDecoder(work_factor=0)
    out: list[tuple[str, str, str, int]] = []
    for s in sorted(spans, key=lambda s: s["offset"]):
        if s["kind"] == "text":
            out.append(("text", extract_text_span(s["text"]), ""))
            c.text_spans += 1
        elif s["kind"] == "media":
            try:
                ref = codec.parse_media_ref(s["media_ref"])
                data = codec.encode_media(s["media_ref"])
                idx = codec.index_container(data)
                for p, (a, b) in enumerate(idx.page_slices):
                    out.append(("text",
                                dec.decode_page(data[a:b], psm_override or idx.psm),
                                s["media_ref"]))
                    c.pages_ocrd += 1
                ea, eb = idx.exif_slice
                for k, v in codec.decode_exif_block(data[ea:eb]):
                    out.append(("exif", f"{k}={v}", s["media_ref"]))
                    c.exif_tags_written += 1
                del ref
            except codec.CodecError:
                c.errors += 1
        else:
            c.errors += 1
    return [(k, t, r, i) for i, (k, t, r) in enumerate(out)]


def oracle_table(table: pa.Table, psm_override: int | None = None) -> OracleResult:
    """Whole-table oracle with duplicate-doc_id arbitration (min dup_key wins)."""
    res = OracleResult()
    best: dict[str, tuple[int, list[dict]]] = {}
    for row in table.to_pylist():
        did, spans = row["doc_id"], row["spans"] or []
        key = doc_dup_key(did, spans)
        if did in best:
            res.counters.dup_docs_dropped += 1
            if key < best[did][0]:
                best[did] = (key, spans)
        else:
            best[did] = (key, spans)
    dec = codec.MediaDecoder(work_factor=0)
    for did, (_k, spans) in best.items():
        res.spans_by_doc[did] = expected_doc_spans(spans, res.counters, dec,
                                                    psm_override)
        res.counters.docs += 1
    return res

"""U1 extension surface: pluggable media decoder + registered text extractors."""

import pyarrow as pa

from ocrautomator_ray.schema import UNIT_SCHEMA
from ocrautomator_ray.stages.extract import ExtractActor, register_text_extractor
from ocrautomator_ray.stages.extractors import TEXT_EXTRACTORS


def _unit_row(unit, payload, psm=-1):
    return pa.Table.from_pydict(
        {"doc_id": ["d"], "part_id": [0], "dup_key": [1], "in_offset": [0],
         "unit": [unit], "page_no": [-1], "media_ref": [""], "psm": [psm],
         "payload": [payload]},
        schema=UNIT_SCHEMA,
    )


def test_custom_decoder_factory():
    class FakeEngine:
        def decode_page(self, payload, psm):
            return f"fake:{len(payload)}:{psm}"

    actor = ExtractActor(decoder_factory=lambda wf: FakeEngine())
    out = actor(_unit_row("text", b"  hi there  "))
    assert out["text"][0].as_py() == "hi there"


def test_registered_text_extractor(monkeypatch):
    # register a sniffer-less custom kind by monkeypatching the sniffer chain:
    # extractors dispatch on sniff_text_kind; simulate a new markup kind
    def shouty(s: str) -> str:
        return s.strip().upper()

    register_text_extractor("plain", shouty)  # override the plain path
    try:
        actor = ExtractActor(work_factor=0)
        out = actor(_unit_row("text", b" quiet words "))
        assert out["text"][0].as_py() == "QUIET WORDS"
    finally:
        from ocrautomator_ray.stages.extractors import extract_plain

        register_text_extractor("plain", extract_plain)
    assert TEXT_EXTRACTORS["plain"] is extract_plain


def test_driver_window_composition_is_pinned():
    """ADVICE r4: the driver attests exactly the first 50 queries() entries,
    so the intended window must be CODE (ROUND5_WINDOW), not comment
    arithmetic — every window name leads the dict, in order, and every
    window entry has either a SQL oracle or a documented rows-only status."""
    import __ray_entry__ as e

    q = e.queries()
    w = e.ROUND5_WINDOW
    assert len(w) == len(set(w)), "duplicate names in the window"
    assert len(w) <= 50, "window exceeds the driver's 50-entry sample"
    assert list(q)[: len(w)] == w
    rows_only = {"lsh_ann_topk", "ivf_ann_topk", "ivf_index_topk",
                 "approx_distinct_users_per_type", "extract_pipeline"}
    sql = e.oracle_sql()
    for name in q:
        assert name in sql or name in rows_only, f"{name} has no oracle"

"""Property-based tests (hypothesis) on the pure reassembly kernel and the
codec — fast (no Ray session needed)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from ocrautomator_ray import codec
from ocrautomator_ray.schema import EXTRACTED_SCHEMA
from ocrautomator_ray.stages.reassemble import reassemble_group


def _extracted_table(rows):
    cols = {name: [] for name in EXTRACTED_SCHEMA.names}
    for r in rows:
        for name in EXTRACTED_SCHEMA.names:
            cols[name].append(r[name])
    return pa.Table.from_pydict(cols, schema=EXTRACTED_SCHEMA)


@st.composite
def extracted_rows(draw):
    n_docs = draw(st.integers(1, 5))
    rows = []
    for d in range(n_docs):
        did = f"doc-{d}"
        dkey = draw(st.integers(0, 2**63 - 1))
        n_units = draw(st.integers(0, 6))
        if n_units == 0:
            rows.append(dict(doc_id=did, part_id=0, dup_key=dkey, in_offset=-1,
                             page_no=-1, sub_no=0, kind="empty", text="",
                             media_ref="", status="ok", error="",
                             worker_id="w", elapsed_us=1))
        for u in range(n_units):
            kind = draw(st.sampled_from(["text", "exif", "error"]))
            rows.append(dict(
                doc_id=did, part_id=0, dup_key=dkey, in_offset=u,
                page_no=draw(st.integers(-1, 3)), sub_no=draw(st.integers(0, 2)),
                kind=kind, text=draw(st.text(max_size=8)), media_ref="m",
                status="ok" if kind != "error" else "error", error="",
                worker_id=draw(st.sampled_from(["w1", "w2"])), elapsed_us=1,
            ))
    return rows


@given(extracted_rows(), st.randoms())
@settings(max_examples=50, deadline=None)
def test_reassemble_permutation_invariant(rows, rnd):
    """Output must be a pure function of row *content*, not row order."""
    base, c1 = reassemble_group(_extracted_table(rows))
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    out, c2 = reassemble_group(_extracted_table(shuffled))
    assert base.equals(out)
    assert c1 == c2


@given(extracted_rows())
@settings(max_examples=50, deadline=None)
def test_reassemble_offsets_contiguous(rows):
    out, counters = reassemble_group(_extracted_table(rows))
    total_spans = 0
    for row in out.to_pylist():
        offs = [s["offset"] for s in row["spans"]]
        assert offs == list(range(len(offs)))
        total_spans += len(offs)
    assert counters["out_spans"] == total_spans
    assert out.num_rows == counters["docs"]


@given(st.integers(0, 10**6), st.integers(0, 50), st.sampled_from(codec.VALID_PSMS))
@settings(max_examples=30, deadline=None)
def test_codec_roundtrip_property(seed, pages, psm):
    ref = codec.make_media_ref("d", 0, pages, psm, seed)
    data = codec.encode_media(ref)
    idx = codec.index_container(data)
    assert idx.pages == pages
    dec = codec.MediaDecoder(work_factor=0)
    r = codec.parse_media_ref(ref)
    for p, (a, b) in enumerate(idx.page_slices):
        assert dec.decode_page(data[a:b], psm) == codec.page_text(r, p)
    ea, eb = idx.exif_slice
    assert codec.decode_exif_block(data[ea:eb]) == codec.exif_tags(r)


def test_reassemble_duplicate_content_collapses():
    row = dict(doc_id="d", part_id=0, dup_key=7, in_offset=0, page_no=-1,
               sub_no=0, kind="text", text="x", media_ref="", status="ok",
               error="", worker_id="w", elapsed_us=1)
    out, counters = reassemble_group(_extracted_table([row, dict(row)]))
    assert out.num_rows == 1
    assert len(out["spans"][0]) == 1
    assert counters["dup_rows_dropped"] == 1


def test_reassemble_min_dupkey_wins():
    a = dict(doc_id="d", part_id=0, dup_key=9, in_offset=0, page_no=-1,
             sub_no=0, kind="text", text="loser", media_ref="", status="ok",
             error="", worker_id="w", elapsed_us=1)
    b = dict(a, dup_key=3, text="winner")
    out, _ = reassemble_group(_extracted_table([a, b]))
    assert out["spans"][0][0]["text"].as_py() == "winner"

    rng = np.random.default_rng(0)
    _ = rng  # keep numpy import purposeful

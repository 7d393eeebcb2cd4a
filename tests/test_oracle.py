"""Hand-pinned oracle expectations — the oracle itself is ground truth for
the pipeline, so a few of its outputs are computed by hand here (not derived
from shared code paths)."""

from ocrautomator_ray import codec, oracle, synth


def _spans_of(doc_id):
    t = synth.gen_table("unit")
    return oracle.oracle_table(t).spans_by_doc[doc_id]


def test_text_only_doc_exact():
    assert _spans_of("u-text-only") == [
        ("text", "hello world one", "", 0),
        ("text", "second span here", "", 1),
        ("text", "third little span", "", 2),
    ]


def test_zero_pages_doc_exif_values_by_hand():
    # ref: m://u-zero-pages/0?pages=0&psm=3&seed=5 → no text spans, exif only.
    # seed 5: Make=SynthCam-(5%7)=5, Model=M(5%13)=M05,
    # DateTime=2020:(1+5%12):(1+5%28) (5%24):(5%60):00 = 2020:06:06 05:05:00
    assert _spans_of("u-zero-pages") == [
        ("exif", "Make=SynthCam-5", "m://u-zero-pages/0?pages=0&psm=3&seed=5", 0),
        ("exif", "Model=M05", "m://u-zero-pages/0?pages=0&psm=3&seed=5", 1),
        ("exif", "DateTime=2020:06:06 05:05:00", "m://u-zero-pages/0?pages=0&psm=3&seed=5", 2),
        ("exif", "PageCount=0", "m://u-zero-pages/0?pages=0&psm=3&seed=5", 3),
        ("exif", "Software=ocrautomator-ray/1", "m://u-zero-pages/0?pages=0&psm=3&seed=5", 4),
    ]


def test_pdftext_doc_exact():
    # fragments (300,20,'world') (10,10,'hello') (10,20,'brave')
    # reading order by (y,x): y=10 → hello; y=20 → brave world
    assert _spans_of("u-pdftext") == [("text", "hello\nbrave world", "", 0)]


def test_poison_doc_drops_only_the_poison_span():
    assert _spans_of("u-poison") == [
        ("text", "before poison span", "", 0),
        ("text", "after poison span", "", 1),
    ]


def test_media_span_layout_contract():
    # A media span expands to page texts (page order) then exif tags, all
    # carrying the ref, occupying a contiguous offset run (FIXTURES.md §2).
    spans = _spans_of("u-media-only")
    ref = "m://u-media-only/0?pages=2&psm=3&seed=7"
    kinds = [k for k, _, _, _ in spans]
    assert kinds == ["text", "text"] + ["exif"] * 5
    assert all(r == ref for _, _, r, _ in spans)
    assert [o for _, _, _, o in spans] == list(range(7))
    r = codec.parse_media_ref(ref)
    assert spans[0][1] == codec.page_text(r, 0)
    assert spans[1][1] == codec.page_text(r, 1)

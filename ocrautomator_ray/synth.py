"""Deterministic synthetic interleaved-document tables (FIXTURES.md).

Everything is a pure function of ``(seed, profile)``; per-row randomness comes
from ``random.Random(f"{seed}/{i}")`` (Python's string seeding is sha512-based
and stable across runs/versions — PYTHONHASHSEED does not affect it).

Also provides ``docs_from_documents_parquet`` which deterministically wraps
the driver's ``documents.parquet`` rows into the canonical DOC_SCHEMA so that
``queries()``/``bench.py`` can run the flagship pipeline over driver data
without external inputs.
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa
import pyarrow.parquet as pq

from ocrautomator_ray.codec import VALID_PSMS, VOCAB, make_media_ref
from ocrautomator_ray.schema import DOC_SCHEMA, SPAN_TYPE

_BOILER_LINKS = [
    "Home", "About us", "Contact", "Privacy policy", "Terms", "Login",
    "Sign up", "Careers", "Blog", "Help center",
]


def _words(rng: random.Random, lo: int, hi: int) -> str:
    return " ".join(rng.choice(VOCAB) for _ in range(rng.randint(lo, hi)))


def wrap_html(rng: random.Random, content_paragraphs: list[str]) -> str:
    """Wrap paragraphs in a boilerplate-heavy page.

    The nav/footer/aside chrome and link-farms are what
    ``extract_html_main_content`` must strip; each content paragraph has ≥3
    words so the block heuristic keeps it.
    """
    nav = "".join(f'<a href="/{i}">{rng.choice(_BOILER_LINKS)}</a> ' for i in range(5))
    related = "".join(
        f'<li><a href="/r/{i}">{_words(rng, 2, 4)}</a></li>' for i in range(4)
    )
    paras = "\n".join(f"<p>{p}</p>" for p in content_paragraphs)
    return (
        "<html><head><title>t</title><script>var x=1;</script>"
        "<style>p{color:red}</style></head><body>"
        f"<nav>{nav}</nav><header><h1>site header</h1></header>"
        f'<div id="main"><article>\n{paras}\n</article></div>'
        f"<aside><ul>{related}</ul></aside>"
        f"<footer>© synth {rng.randint(2000, 2024)} · "
        '<a href="/p">Privacy</a> <a href="/t">Terms</a></footer>'
        "</body></html>"
    )


def make_pdf_text(rng: random.Random, n_rows: int) -> str:
    """Synthetic positioned-text PDF dump, fragments emitted out of reading
    order so the layout parse actually has to sort."""
    frags = []
    for r in range(n_rows):
        y = (r + 1) * 10
        for c in range(rng.randint(1, 3)):
            frags.append((rng.randint(0, 500), y, _words(rng, 1, 3)))
    rng.shuffle(frags)
    lines = ["%PDF-TXT"] + [f"{x};{y};{t}" for x, y, t in frags]
    return "\n".join(lines)


def _span(kind: str, text: str, media_ref: str, offset: int) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


def _text_span(rng: random.Random, offset: int) -> dict:
    roll = rng.random()
    if roll < 0.70:
        txt = "  " + _words(rng, 3, 20) + " \n"
    elif roll < 0.90:
        paras = [_words(rng, 4, 12) for _ in range(rng.randint(1, 3))]
        txt = wrap_html(rng, paras)
    else:
        txt = make_pdf_text(rng, rng.randint(1, 4))
    return _span("text", txt, "", offset)


def _media_span(rng: random.Random, doc_id: str, offset: int, max_pages: int,
                skew: bool) -> dict:
    if skew:
        pages = rng.randint(256, 1024)
    else:
        # zipf-ish page counts: mostly 1-4, a tail
        pages = min(max_pages, max(1, int(rng.paretovariate(1.5))))
    psm = rng.choice(VALID_PSMS)
    ref = make_media_ref(doc_id, offset, pages, psm, rng.randint(0, 10**6))
    return _span("media", "", ref, offset)


def _gen_doc(i: int, seed: int, max_pages: int, poison_frac: float,
             skew_frac: float) -> dict:
    rng = random.Random(f"{seed}/{i}")
    doc_id = f"doc-{seed}-{i:08d}"
    roll = rng.random()
    if roll < 0.05:
        kinds = ["text"] * rng.randint(1, 4)          # text-only
    elif roll < 0.10:
        kinds = ["media"] * rng.randint(1, 3)         # media-only
    else:
        kinds = [
            "media" if rng.random() < 0.4 else "text"
            for _ in range(rng.randint(1, 4))
        ]
    spans = []
    for off, k in enumerate(kinds):
        if k == "text":
            spans.append(_text_span(rng, off))
        else:
            if poison_frac and rng.random() < poison_frac:
                bad = rng.choice(
                    ["m://oops", f"m://{doc_id}/{off}?pages=1&psm=99&seed=1", "notaref"]
                )
                spans.append(_span("media", "", bad, off))
            else:
                spans.append(
                    _media_span(rng, doc_id, off, max_pages,
                                skew=rng.random() < skew_frac)
                )
    return {"doc_id": doc_id, "spans": spans}


def _unit_rows(seed: int = 42) -> list[dict]:
    rng = random.Random(f"unit/{seed}")
    rows = [
        {"doc_id": "u-text-only", "spans": [
            _span("text", "  hello world one ", "", 0),
            _span("text", "second span here", "", 1),
            _span("text", "third little span", "", 2),
        ]},
        {"doc_id": "u-media-only", "spans": [
            _span("media", "", make_media_ref("u-media-only", 0, 2, 3, 7), 0),
        ]},
        {"doc_id": "u-mixed", "spans": [
            _span("text", "intro words here", "", 0),
            _span("media", "", make_media_ref("u-mixed", 1, 3, 6, 11), 1),
            _span("text", "middle words go here", "", 2),
            _span("media", "", make_media_ref("u-mixed", 3, 1, 11, 13), 3),
            _span("text", "closing words finally done", "", 4),
        ]},
        {"doc_id": "u-empty", "spans": []},
        {"doc_id": "u-fat", "spans": [
            _span("media", "", make_media_ref("u-fat", 0, 1000, 3, 99), 0),
        ]},
        {"doc_id": "u-poison", "spans": [
            _span("text", "before poison span", "", 0),
            _span("media", "", "m://oops-not-a-ref", 1),
            _span("text", "after poison span", "", 2),
        ]},
        {"doc_id": "u-zero-pages", "spans": [
            _span("media", "", make_media_ref("u-zero-pages", 0, 0, 3, 5), 0),
        ]},
        {"doc_id": "u-dup", "spans": [
            _span("text", "duplicated doc content", "", 0),
        ]},
        {"doc_id": "u-dup", "spans": [
            _span("text", "duplicated doc content", "", 0),
        ]},
        {"doc_id": "u-unicode", "spans": [
            _span("text", " héllo wörld — ünïcode ✓ \t", "", 0),
            _span("text", "\n\n  \t ", "", 1),
        ]},
        {"doc_id": "u-html", "spans": [
            _span("text", wrap_html(rng, ["alpha beta gamma delta",
                                          "keep this paragraph too"]), "", 0),
        ]},
        {"doc_id": "u-pdftext", "spans": [
            _span("text", "%PDF-TXT\n300;20;world\n10;10;hello\n10;20;brave\n", "", 0),
        ]},
    ]
    for j in range(len(rows), 24):
        rows.append(_gen_doc(j, seed, max_pages=8, poison_frac=0.0, skew_frac=0.0))
    return rows


def gen_table(profile: str, seed: int = 42, rows: int | None = None) -> pa.Table:
    """Generate a DOC_SCHEMA table for a FIXTURES.md profile."""
    if profile == "unit":
        data = _unit_rows(seed)
    elif profile == "sf-test":
        n = rows or 2000
        data = [
            _gen_doc(i, seed, max_pages=64, poison_frac=0.01, skew_frac=0.02)
            for i in range(n)
        ]
    elif profile == "bench":
        n = rows or 100_000
        data = [
            _gen_doc(i, seed, max_pages=32, poison_frac=0.0, skew_frac=0.0)
            for i in range(n)
        ]
    else:
        raise ValueError(f"unknown profile {profile!r}")
    return rows_to_table(data)


def rows_to_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=DOC_SCHEMA)


def write_profile(path: str, profile: str, seed: int = 42,
                  rows: int | None = None, row_group_size: int = 4096) -> str:
    pq.write_table(gen_table(profile, seed, rows), path,
                   row_group_size=row_group_size)
    return path


def doc_dup_key(doc_id: str, spans: list[dict]) -> int:
    """uint64 content hash of a whole document row.

    Shared by the pipeline's explode stage and the oracle for duplicate-doc_id
    arbitration (SURVEY.md §2.7 D1): among rows sharing a doc_id, the row with
    the smallest dup_key wins; identical copies collapse.
    """
    h = hashlib.sha1(doc_id.encode())
    for s in sorted(spans, key=lambda s: s["offset"]):
        h.update(
            f"|{s['kind']}\x00{s['text']}\x00{s['media_ref']}\x00{s['offset']}".encode()
        )
    return int.from_bytes(h.digest()[:8], "little")


def docs_batch_from_documents(t: pa.Table, media_every: int = 3,
                              seed: int = 42) -> pa.Table:
    """Wrap one batch of the driver's documents rows into DOC_SCHEMA.

    Row i → doc ``drv-{doc_id}``: one text span (HTML-wrapped for every 4th
    row), plus a media span for every ``media_every``-th row (pages derived
    from n_chars, capped 16). A pure per-row function of the parquet
    contents + seed, so the result is identical under any batching/order —
    this is what lets the flagship synthesize its input inside map_batches
    instead of on the driver.
    """
    out = []
    for did, text, n_chars in zip(
        t["doc_id"].to_pylist(), t["text"].to_pylist(), t["n_chars"].to_pylist()
    ):
        rng = random.Random(f"{seed}/drv/{did}")
        doc_id = f"drv-{did:08d}"
        spans = []
        off = 0
        if did % 4 == 0:
            spans.append(_span("text", wrap_html(rng, [text]), "", off))
        else:
            spans.append(_span("text", text, "", off))
        off += 1
        if did % media_every == 0:
            pages = max(1, min(16, (n_chars or 1) // 32))
            psm = VALID_PSMS[did % len(VALID_PSMS)]
            spans.append(
                _span("media", "", make_media_ref(doc_id, off, pages, psm,
                                                  did % 10**6), off)
            )
        out.append({"doc_id": doc_id, "spans": spans})
    return rows_to_table(out)


def read_driver_docs(sf_dir: str, media_every: int = 3, seed: int = 42):
    """Streaming DOC_SCHEMA dataset derived from the driver's
    documents.parquet — a pruned read + map_batches; never materializes the
    doc table on the driver."""
    import ray.data as rd

    from ocrautomator_ray.functions.exchange import stripped_read

    ds = stripped_read(f"{sf_dir}/documents.parquet",
                       columns=["doc_id", "text", "n_chars"])
    return ds.map_batches(
        lambda t: docs_batch_from_documents(t, media_every, seed),
        batch_format="pyarrow", zero_copy_batch=True,
    )


def docs_from_documents_parquet(sf_dir: str, media_every: int = 3,
                                seed: int = 42) -> pa.Table:
    """Driver-local materialization of read_driver_docs (test oracles only —
    the pipeline path goes through read_driver_docs)."""
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "n_chars"])
    return docs_batch_from_documents(t, media_every, seed)


_ = SPAN_TYPE  # re-export convenience

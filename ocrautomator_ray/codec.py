"""Deterministic synthetic media codec (SURVEY.md §7 "deterministic media codec").

The sandbox has no Tesseract / MuPDF / PIL, so the engine's OCR stage runs on
a self-defined, fully deterministic media format instead: a ``media_ref``
string deterministically *is* the media — ``encode_media(ref)`` produces the
container bytes any environment would fetch from object storage, and
``MediaDecoder`` (the stand-in for a warm ``TessBaseAPI``,
SURVEY.md §2.3 ST1) turns page payloads back into text.

Design goals, in order:

1. **Exactly checkable** — page text and exif tags are pure functions of the
   ref, so the single-threaded oracle (oracle.py) and the distributed pipeline
   must agree bit-for-bit (span-sequence equality, BASELINE.json:15).
2. **Honest warm-actor economics** — ``MediaDecoder.__init__`` deliberately
   builds cipher/decode tables with an iterated-hash key schedule (~tens of
   ms), amortized across batches exactly like a loaded ``.traineddata`` model;
   per-page decode adds a configurable ``work_factor`` of hash rounds standing
   in for LSTM inference compute.
3. **Real bytes in flight** — containers are real binary payloads that the
   explode stage slices per page, so object-store/memory behavior matches an
   image pipeline, just smaller.

Container layout (all integers little-endian)::

    magic   b"SYNM1\\0"
    uint16  pages
    uint8   psm
    uint32  seed
    pages × [uint8 key_id][uint16 clen][clen ciphered utf-8 page text bytes]
    uint8   ntags
    ntags × [uint8 klen][key][uint8 vlen][value]      # exif block, plain

media_ref grammar (FIXTURES.md §1)::

    m://{doc_id}/{offset}?pages={p}&psm={psm}&seed={s}
"""

from __future__ import annotations

import hashlib
import re
import struct
from dataclasses import dataclass

import numpy as np

MAGIC = b"SYNM1\x00"
VALID_PSMS = (1, 3, 6, 11)

# 64-word deterministic vocabulary for synthetic page text.
VOCAB = [
    hashlib.sha256(b"vocab-%d" % i).hexdigest()[:6] for i in range(48)
] + [
    "invoice", "total", "date", "page", "scan", "tesseract", "exif",
    "document", "ocr", "ray", "arrow", "lance", "span", "offset", "batch",
    "actor",
]

_REF_RE = re.compile(
    r"^m://(?P<doc_id>[^/?]+)/(?P<offset>\d+)\?pages=(?P<pages>\d+)"
    r"&psm=(?P<psm>\d+)&seed=(?P<seed>\d+)$"
)


class CodecError(ValueError):
    """Malformed media_ref or corrupt container bytes (the poison path, T8)."""


@dataclass(frozen=True)
class MediaRef:
    doc_id: str
    offset: int
    pages: int
    psm: int
    seed: int


def make_media_ref(doc_id: str, offset: int, pages: int, psm: int, seed: int) -> str:
    return f"m://{doc_id}/{offset}?pages={pages}&psm={psm}&seed={seed}"


def parse_media_ref(ref: str) -> MediaRef:
    m = _REF_RE.match(ref)
    if not m:
        raise CodecError(f"malformed media_ref: {ref!r}")
    psm = int(m.group("psm"))
    if psm not in VALID_PSMS:
        raise CodecError(f"unsupported psm {psm} in media_ref: {ref!r}")
    return MediaRef(
        doc_id=m.group("doc_id"),
        offset=int(m.group("offset")),
        pages=int(m.group("pages")),
        psm=psm,
        seed=int(m.group("seed")),
    )


# ---------------------------------------------------------------------------
# Deterministic text / tag derivation (shared by encoder, decoder tests, oracle)
# ---------------------------------------------------------------------------

def _digest_stream(tag: str, n: int) -> bytes:
    """n deterministic bytes derived from tag via counter-mode sha256."""
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(f"{tag}#{counter}".encode()).digest()
        counter += 1
    return bytes(out[:n])


def page_words(ref: MediaRef, page_no: int) -> list[str]:
    tag = f"{ref.doc_id}/{ref.offset}/{ref.seed}/{page_no}"
    head = _digest_stream(tag, 1)[0]
    n_words = 8 + head % 25
    stream = _digest_stream(tag + "/w", n_words)
    return [VOCAB[b % len(VOCAB)] for b in stream]


def segment_text(words: list[str], psm: int) -> str:
    """Page-segmentation-mode selection (SURVEY.md §2.2 T2).

    The reference exposes Tesseract's ``--psm``; the synthetic analogue maps
    each supported mode to a deterministic layout of the same words:
    1/3 = auto (space-joined), 6 = single block (8-word lines),
    11 = sparse text (one word per line).
    """
    if psm in (1, 3):
        return " ".join(words)
    if psm == 6:
        lines = [" ".join(words[i : i + 8]) for i in range(0, len(words), 8)]
        return "\n".join(lines)
    if psm == 11:
        return "\n".join(words)
    raise CodecError(f"unsupported psm {psm}")


def page_text(ref: MediaRef, page_no: int) -> str:
    return segment_text(page_words(ref, page_no), ref.psm)


def exif_tags(ref: MediaRef) -> list[tuple[str, str]]:
    """Deterministic exif-style tags for a media container (T3/T4).

    Ordered; order is part of the span-sequence contract.
    """
    s = ref.seed
    return [
        ("Make", f"SynthCam-{s % 7}"),
        ("Model", f"M{s % 13:02d}"),
        ("DateTime", f"2020:{1 + s % 12:02d}:{1 + s % 28:02d} {s % 24:02d}:{s % 60:02d}:00"),
        ("PageCount", str(ref.pages)),
        ("Software", "ocrautomator-ray/1"),
    ]


# ---------------------------------------------------------------------------
# Cipher key schedule — the "model weights" of the synthetic OCR engine
# ---------------------------------------------------------------------------

_KEY_ROUNDS = 64  # iterated-hash rounds per keystream table (init cost knob)


def _keystream(key_id: int) -> bytes:
    """256-byte keystream for one key id, via an iterated-hash key schedule."""
    d = hashlib.sha256(b"synm1-key-%d" % key_id).digest()
    for _ in range(_KEY_ROUNDS):
        d = hashlib.sha256(d).digest()
    return _digest_stream(d.hex(), 256)


def _page_key_id(ref: MediaRef, page_no: int) -> int:
    return _digest_stream(f"{ref.seed}/{ref.doc_id}/{page_no}/k", 1)[0]


def encode_media(ref_str: str) -> bytes:
    """media_ref → container bytes (the 'fetch from storage' step, S2).

    Raises CodecError for malformed refs (poison fixture).
    """
    ref = parse_media_ref(ref_str)
    out = bytearray(MAGIC)
    out += struct.pack("<HBI", ref.pages, ref.psm, ref.seed)
    for p in range(ref.pages):
        key_id = _page_key_id(ref, p)
        ks = _keystream(key_id)
        # The ciphered body is the psm-INDEPENDENT raw word stream — the
        # "image". Segmentation (psm) is applied by the decoder, like real OCR.
        plain = " ".join(page_words(ref, p)).encode()
        ciphered = bytes(b ^ ks[i % 256] for i, b in enumerate(plain))
        out += struct.pack("<BH", key_id, len(ciphered))
        out += ciphered
    tags = exif_tags(ref)
    out += struct.pack("<B", len(tags))
    for k, v in tags:
        kb, vb = k.encode(), v.encode()
        out += struct.pack("<B", len(kb)) + kb + struct.pack("<B", len(vb)) + vb
    return bytes(out)


@dataclass(frozen=True)
class ContainerIndex:
    pages: int
    psm: int
    seed: int
    page_slices: list[tuple[int, int]]  # byte ranges incl. the [key_id][clen] header
    exif_slice: tuple[int, int]


def index_container(data: bytes) -> ContainerIndex:
    """Cheap structural scan of a container: page/exif byte ranges for slicing.

    Used by the explode stage so each page row ships only its own bytes
    (SURVEY.md §2.1 S3 — the rasterizer's per-page work items).
    """
    if len(data) < len(MAGIC) + 7 or data[: len(MAGIC)] != MAGIC:
        raise CodecError("bad container magic")
    pos = len(MAGIC)
    pages, psm, seed = struct.unpack_from("<HBI", data, pos)
    pos += 7
    page_slices = []
    for _ in range(pages):
        if pos + 3 > len(data):
            raise CodecError("truncated page header")
        (_, clen) = struct.unpack_from("<BH", data, pos)
        end = pos + 3 + clen
        if end > len(data):
            raise CodecError("truncated page payload")
        page_slices.append((pos, end))
        pos = end
    if pos >= len(data):
        raise CodecError("missing exif block")
    exif_slice = (pos, len(data))
    return ContainerIndex(pages, psm, seed, page_slices, exif_slice)


def decode_exif_block(payload: bytes) -> list[tuple[str, str]]:
    """Every failure mode raises CodecError (T8 containment: the extraction
    actor only catches CodecError, so a corrupt container must never escape
    as IndexError/UnicodeDecodeError and kill the task)."""
    if not payload:
        raise CodecError("empty exif block")
    ntags = payload[0]
    pos = 1
    tags = []
    try:
        for _ in range(ntags):
            if pos >= len(payload):
                raise CodecError("truncated exif key length")
            klen = payload[pos]; pos += 1
            if pos + klen > len(payload):
                raise CodecError("truncated exif key")
            k = payload[pos : pos + klen].decode(); pos += klen
            if pos >= len(payload):
                raise CodecError("truncated exif value length")
            vlen = payload[pos]; pos += 1
            if pos + vlen > len(payload):
                raise CodecError("truncated exif value")
            v = payload[pos : pos + vlen].decode(); pos += vlen
            tags.append((k, v))
    except UnicodeDecodeError as e:
        raise CodecError(f"undecodable exif bytes: {e}") from e
    if pos != len(payload):
        raise CodecError("trailing bytes in exif block")
    return tags


class MediaDecoder:
    """The synthetic 'warm TessBaseAPI' (SURVEY.md §2.3 ST1).

    ``__init__`` runs the full key schedule for all 256 key ids — the
    deliberate model-load cost that actor pools amortize. ``decode_page`` is
    the per-page inference: de-cipher (vectorized numpy XOR) plus
    ``work_factor`` rounds of hashing standing in for LSTM compute.
    """

    def __init__(self, work_factor: int = 8):
        self.work_factor = work_factor
        # Key schedule: 256 keystream tables, iterated-hash derivation.
        self._tables = np.stack(
            [np.frombuffer(_keystream(k), dtype=np.uint8) for k in range(256)]
        )
        self._work_buf = _digest_stream("synm1-workbuf", 4096)

    def decode_page(self, payload: bytes, psm: int = 3) -> str:
        """One page payload (incl. [key_id][clen] header) + psm → page text.

        psm is applied decode-side (T2): the same bytes segment differently
        under different page-segmentation modes, as with real Tesseract.
        """
        if len(payload) < 3:
            raise CodecError("short page payload")
        key_id = payload[0]
        (clen,) = struct.unpack_from("<H", payload, 1)
        body = payload[3 : 3 + clen]
        if len(body) != clen:
            raise CodecError("truncated page body")
        ks = self._tables[key_id]
        arr = np.frombuffer(body, dtype=np.uint8)
        reps = -(-len(arr) // 256)
        plain = (arr ^ np.tile(ks, reps)[: len(arr)]).tobytes()
        # Simulated inference compute — result-independent, cost knob only.
        d = plain
        for _ in range(self.work_factor):
            d = hashlib.sha256(d + self._work_buf).digest()
        try:
            raw = plain.decode()
        except UnicodeDecodeError as e:  # corrupt body
            raise CodecError(f"undecodable page body: {e}") from e
        return segment_text(raw.split(" "), psm)

"""Graded multimodal queries: drive the image/video actor-pool stages
(stages/multimodal.py) end-to-end at sf scale.

Media payloads are synthesized deterministically from doc_ids (the same
codec containers the extraction pipeline decodes), so the pixel codecs'
stub boundary is irrelevant here: what these queries grade is the REAL
Ray-side multimodal plumbing — binary columns through an actor pool with
byte-sized batches, warm per-actor state, typed metadata out, frame
fan-out. Rows-only in the driver check (no SQL expresses an actor pool);
tests/test_multimodal.py pins per-row values against direct actor calls.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ocrautomator_ray.functions.exchange import pruned_read

from ocrautomator_ray import codec
from ocrautomator_ray.stages.multimodal import (
    MEDIA_SCHEMA,
    FrameSampleActor,
    ImageDecodeActor,
    ResizeFeatureActor,
)


def _media_rows(t: pa.Table, mime: str) -> pa.Table:
    """documents batch → MEDIA_SCHEMA batch (deterministic synthetic
    containers keyed by doc_id; pages/psm/seed vary with the id)."""
    ids = t["doc_id"].to_pylist()
    psms = codec.VALID_PSMS
    refs = [f"m://doc{i}/0?pages={1 + i % 5}&psm={psms[i % len(psms)]}"
            f"&seed={i % 16}" for i in ids]
    return pa.Table.from_pydict(
        {"media_ref": refs,
         "bytes": [codec.encode_media(r) for r in refs],
         "mime": [mime] * len(refs)},
        schema=MEDIA_SCHEMA)


def _media_ds(sf_dir: str, mime: str = "image/synm") -> rd.Dataset:
    ds = pruned_read(f"{sf_dir}/documents.parquet", ["doc_id"])
    # small batches: binary payloads are sized by bytes, not rows
    return ds.map_batches(lambda t: _media_rows(t, mime),
                          batch_format="pyarrow", batch_size=64,
                          zero_copy_batch=True)


def media_decode_stats(sf_dir: str) -> rd.Dataset:
    """(media_ref, mime, width, height, n_frames, status, error): the image
    decode actor pool over one synthetic container per document."""
    return _media_ds(sf_dir).map_batches(
        ImageDecodeActor, batch_format="pyarrow", batch_size=32,
        concurrency=(1, 4), num_cpus=1, zero_copy_batch=True)


def media_features(sf_dir: str) -> rd.Dataset:
    """(media_ref, feat_u): first component of the 16-d resize-feature
    vector per container, integerized at 1e-6 for a stable compare."""
    import numpy as np

    feats = _media_ds(sf_dir).map_batches(
        ResizeFeatureActor, batch_format="pyarrow", batch_size=32,
        concurrency=(1, 4), num_cpus=1, zero_copy_batch=True)

    def first_component(t: pa.Table) -> pa.Table:
        f = t["feature"].combine_chunks() if isinstance(t["feature"], pa.ChunkedArray) else t["feature"]
        flat = f.flatten().to_numpy(zero_copy_only=False)
        first = flat.reshape(-1, ResizeFeatureActor.FEAT_DIM)[:, 0].astype(np.float64)
        return pa.table({
            "media_ref": t["media_ref"],
            "feat_u": pa.array(np.floor(first * 1_000_000 + 0.5).astype(np.int64)),
        })

    return feats.map_batches(first_component, batch_format="pyarrow",
                             zero_copy_batch=True)


def media_frame_counts(sf_dir: str) -> rd.Dataset:
    """(media_ref, n_frames_sampled): every-4th-frame sampling over
    video-like containers, counted per container."""
    from ray.data.aggregate import Count

    frames = _media_ds(sf_dir, mime="video/synm").map_batches(
        FrameSampleActor, batch_format="pyarrow", batch_size=32,
        concurrency=(1, 4), num_cpus=1, zero_copy_batch=True)
    return (
        frames.groupby("media_ref", num_partitions=8)
        .aggregate(Count("frame_no", alias_name="n_frames_sampled"))
    )


QUERIES = {
    "media_decode_stats": media_decode_stats,
    "media_features": media_features,
    "media_frame_counts": media_frame_counts,
}

# ALL three media queries are SQL-expressible even though they run real
# binary actor-pool stages: the synthetic container is a deterministic pure
# function of doc_id, and DuckDB 1.0's sha256(varchar) recomputes every text
# digest the codec uses (page word streams, key-id selection, keystream
# expansion) from first principles. Two classes of constants are embedded in
# the SQL, both pure format parameters independent of any input row — the
# same standing as the PSM list: (a) the VOCAB word list, (b) the "model
# weights": the 256 post-key-schedule digests (codec._keystream's iterated
# raw-byte sha256, which a varchar-only sha256 cannot iterate) and the
# feature actor's seeded projection column. The SQL still derives the word
# streams, cipher bytes, byte histogram and projection itself, so the oracle
# independently predicts the actor's exact output — precisely what makes
# these strong plumbing checks.
_PSM_LIST = ", ".join(str(p) for p in codec.VALID_PSMS)
_NPSM = len(codec.VALID_PSMS)
_WLEN_VALUES = ", ".join(f"({i}, {len(w)})" for i, w in enumerate(codec.VOCAB))
_VOCAB_VALUES = ", ".join(f"({i}, '{w}')" for i, w in enumerate(codec.VOCAB))


def _ks_dhex(key_id: int) -> str:
    """Hex of the post-key-schedule digest for one key id — the point where
    codec._keystream switches from raw-byte hash iteration (not expressible
    with a varchar-only sha256) back to TEXT-tagged counter-mode digests
    (fully expressible). Everything after this constant is derived in SQL."""
    import hashlib

    d = hashlib.sha256(b"synm1-key-%d" % key_id).digest()
    for _ in range(codec._KEY_ROUNDS):
        d = hashlib.sha256(d).digest()
    return d.hex()


_KS_MEGA = "".join(_ks_dhex(k) for k in range(256))


def _proj0_values() -> str:
    import numpy as np

    proj0 = np.random.default_rng(0xFEA7).standard_normal(
        (256, ResizeFeatureActor.FEAT_DIM))[:, 0]
    return ", ".join(f"({i}, {float(v)!r})" for i, v in enumerate(proj0))


# Shared CTE prefix: per-doc ref params, then per-page word-count / key-id
# derivation. hexmap decodes sha256's lowercase hex pairs to byte values
# (printf, not to_hex: DuckDB's to_hex is uppercase).
_SQL_MEDIA_COMMON = f"""
hexmap AS (
  SELECT CAST(i AS INT) AS b, printf('%02x', i) AS hx FROM range(256) t(i)
),
docs AS (
  SELECT doc_id,
         CAST(1 + doc_id % 5 AS INT) AS pages,
         ([{_PSM_LIST}])[1 + CAST(doc_id % {_NPSM} AS BIGINT)] AS psm,
         CAST(doc_id % 16 AS INT) AS seed
  FROM documents
),
pg AS (SELECT doc_id, pages, psm, seed, unnest(range(pages)) AS p FROM docs),
ph AS (
  SELECT doc_id, p, seed,
         'doc' || doc_id || '/0/' || seed || '/' || p AS wtag,
         seed || '/doc' || doc_id || '/' || p || '/k' AS ktag
  FROM pg
),
ph2 AS (
  SELECT ph.doc_id, ph.p,
         8 + (hm.b % 25) AS n_words,
         sha256(wtag || '/w#0') AS wh,
         km.b AS key_id
  FROM ph
  JOIN hexmap hm ON hm.hx = substr(sha256(wtag || '#0'), 1, 2)
  JOIN hexmap km ON km.hx = substr(sha256(ktag || '#0'), 1, 2)
)
"""

SQL_MEDIA_FRAME_COUNTS = f"""
SELECT 'm://doc' || doc_id || '/0?pages=' || (1 + doc_id % 5) ||
       '&psm=' || ([{_PSM_LIST}])[1 + CAST(doc_id % {len(codec.VALID_PSMS)}
                                            AS BIGINT)] ||
       '&seed=' || (doc_id % 16) AS media_ref,
       CAST((1 + doc_id % 5 + 3) // 4 AS BIGINT) AS n_frames_sampled
FROM documents
"""

# width = 64 + max(page slice bytes) % 1024, height = 64 + sum % 1024 —
# page slice = 3-byte [key_id][clen] header + clen, clen = Σ word lengths
# + (n_words − 1) separators; word lengths via VOCAB[byte % 64].
SQL_MEDIA_DECODE_STATS = f"""
WITH {_SQL_MEDIA_COMMON},
wlen AS (SELECT CAST(j AS INT) AS widx, CAST(l AS BIGINT) AS l
         FROM (VALUES {_WLEN_VALUES}) t(j, l)),
wb AS (SELECT doc_id, p, n_words, wh, unnest(range(n_words)) AS j FROM ph2),
wl AS (
  SELECT wb.doc_id, wb.p, wb.n_words, vl.l
  FROM wb
  JOIN hexmap hm ON hm.hx = substr(wb.wh, CAST(2*wb.j + 1 AS BIGINT), 2)
  JOIN wlen vl ON vl.widx = hm.b % 64
),
psize AS (
  SELECT doc_id, p, 3 + SUM(l) + ANY_VALUE(n_words) - 1 AS sz
  FROM wl GROUP BY doc_id, p
),
agg AS (
  SELECT doc_id,
         CAST(64 + MAX(sz) % 1024 AS INTEGER) AS width,
         CAST(64 + SUM(sz) % 1024 AS INTEGER) AS height
  FROM psize GROUP BY doc_id
)
SELECT 'm://doc' || d.doc_id || '/0?pages=' || d.pages || '&psm=' || d.psm
       || '&seed=' || d.seed AS media_ref,
       'image/synm' AS mime,
       a.width, a.height,
       CAST(d.pages AS INTEGER) AS n_frames,
       'ok' AS status, '' AS error
FROM docs d JOIN agg a USING (doc_id)
"""

# feat_u = floor(float32(hist · proj₀) · 1e6 + ½): the byte relation is the
# exact container layout (magic + header + per-page [key_id][clen][ciphered
# words] + exif block), ciphered via keystream bytes expanded in SQL from the
# 2048 counter-mode digests of the embedded key-schedule constants.
SQL_MEDIA_FEATURES = f"""
WITH {_SQL_MEDIA_COMMON},
vocab AS (SELECT CAST(j AS INT) AS widx, w FROM (VALUES {_VOCAB_VALUES}) t(j, w)),
proj AS (SELECT CAST(j AS INT) AS b, pv FROM (VALUES {{proj_values}}) t(j, pv)),
ksc AS (
  SELECT CAST(k AS INT) AS key_id, CAST(c AS INT) AS c,
         sha256(substr('{_KS_MEGA}', CAST(k*64 + 1 AS BIGINT), 64)
                || '#' || c) AS h
  FROM range(256) a(k), range(8) b(c)
),
wb AS (SELECT doc_id, p, key_id, wh, unnest(range(n_words)) AS j FROM ph2),
words AS (
  SELECT wb.doc_id, wb.p, wb.key_id, wb.j, v.w
  FROM wb
  JOIN hexmap hm ON hm.hx = substr(wb.wh, CAST(2*wb.j+1 AS BIGINT), 2)
  JOIN vocab v ON v.widx = hm.b % 64
),
plain AS (
  SELECT doc_id, p, key_id, string_agg(w, ' ' ORDER BY j) AS plain
  FROM words GROUP BY doc_id, p, key_id
),
body AS (
  SELECT t.doc_id,
         xor(ascii(substr(t.plain, CAST(t.i+1 AS BIGINT), 1)), bh.b) AS bv
  FROM (SELECT doc_id, key_id, plain, unnest(range(length(plain))) AS i
        FROM plain) t
  JOIN ksc ON ksc.key_id = t.key_id AND ksc.c = (t.i % 256) // 32
  JOIN hexmap bh ON bh.hx = substr(ksc.h,
        CAST(2*((t.i % 256) % 32) + 1 AS BIGINT), 2)
),
hdr AS (
  SELECT doc_id, unnest([83,89,78,77,49,0, pages % 256, pages // 256,
                         psm, seed, 0, 0, 0]) AS bv
  FROM docs
),
phdr AS (
  SELECT doc_id, unnest([key_id, length(plain) % 256, length(plain) // 256]) AS bv
  FROM plain
),
exif_lens AS (
  SELECT doc_id, unnest([5, 4,10, 5,3, 8,19, 9,1, 8,18]) AS bv FROM docs
),
exif_s AS (
  SELECT doc_id,
         'MakeModelDateTimePageCountSoftware'
         || 'SynthCam-' || (seed % 7)
         || 'M' || lpad(CAST(seed % 13 AS VARCHAR), 2, '0')
         || '2020:' || lpad(CAST(1 + seed % 12 AS VARCHAR), 2, '0')
         || ':' || lpad(CAST(1 + seed % 28 AS VARCHAR), 2, '0')
         || ' ' || lpad(CAST(seed % 24 AS VARCHAR), 2, '0')
         || ':' || lpad(CAST(seed % 60 AS VARCHAR), 2, '0') || ':00'
         || pages
         || 'ocrautomator-ray/1' AS s
  FROM docs
),
exif_chars AS (
  SELECT doc_id, ascii(substr(s, CAST(i+1 AS BIGINT), 1)) AS bv
  FROM (SELECT doc_id, s, unnest(range(length(s))) AS i FROM exif_s) t
),
allb AS (
  SELECT doc_id, bv FROM body UNION ALL SELECT doc_id, bv FROM hdr
  UNION ALL SELECT doc_id, bv FROM phdr
  UNION ALL SELECT doc_id, bv FROM exif_lens
  UNION ALL SELECT doc_id, bv FROM exif_chars
),
cnts AS (SELECT doc_id, bv, COUNT(*) AS cnt FROM allb GROUP BY doc_id, bv),
tot AS (SELECT doc_id, SUM(cnt) AS n FROM cnts GROUP BY doc_id),
feat AS (
  SELECT c.doc_id,
         CAST(SUM((CAST(c.cnt AS DOUBLE) / CAST(t.n AS DOUBLE)) * p.pv) AS REAL) AS f
  FROM cnts c JOIN tot t USING (doc_id) JOIN proj p ON p.b = c.bv
  GROUP BY c.doc_id
)
SELECT 'm://doc' || d.doc_id || '/0?pages=' || d.pages || '&psm=' || d.psm
       || '&seed=' || d.seed AS media_ref,
       CAST(FLOOR(CAST(f.f AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS feat_u
FROM docs d JOIN feat f USING (doc_id)
""".replace("{proj_values}", _proj0_values())

SQL: dict[str, str] = {
    "media_frame_counts": SQL_MEDIA_FRAME_COUNTS,
    "media_decode_stats": SQL_MEDIA_DECODE_STATS,
    "media_features": SQL_MEDIA_FEATURES,
}

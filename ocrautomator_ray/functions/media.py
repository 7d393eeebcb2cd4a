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

# media_frame_counts IS SQL-expressible even though it runs a real binary
# actor-pool stage: the synthetic container's frame count is a pure function
# of doc_id (pages = 1 + doc_id % 5; every-4th sampling → ceil(pages/4)), and
# the ref string is reconstructible, so DuckDB can predict the actor's exact
# output — which is precisely what makes it a strong plumbing check. The
# decode/feature queries stay rows-only (outputs depend on payload bytes).
_PSM_LIST = ", ".join(str(p) for p in codec.VALID_PSMS)

SQL_MEDIA_FRAME_COUNTS = f"""
SELECT 'm://doc' || doc_id || '/0?pages=' || (1 + doc_id % 5) ||
       '&psm=' || ([{_PSM_LIST}])[1 + CAST(doc_id % {len(codec.VALID_PSMS)}
                                            AS BIGINT)] ||
       '&seed=' || (doc_id % 16) AS media_ref,
       CAST((1 + doc_id % 5 + 3) // 4 AS BIGINT) AS n_frames_sampled
FROM documents
"""

SQL: dict[str, str] = {"media_frame_counts": SQL_MEDIA_FRAME_COUNTS}

"""Multimodal actor-pool stages: image decode / resize-feature / frame-sample
over opaque binary columns with typed metadata.

The Ray-side plumbing — schemas, actor signatures, batch sizing, output
layout — is real and tested; the pixel/sample codecs are STUBBED because this
environment has no PIL/ffmpeg (see each actor's docstring). Each actor
follows the warm-state pattern: libraries/LUTs load once in ``__init__``
(``map_batches(Cls, concurrency=N, num_cpus=1)``), per-batch work in
``__call__``. Batches of large binary payloads should be sized by BYTES, not
rows — pass small ``batch_size`` (e.g. 16-64) for image columns so
batch × concurrency fits worker heaps.

Expected input schema (the engine's media side-table shape, SURVEY.md §1.2)::

    media_ref: string      # opaque reference
    bytes:     binary      # container payload
    mime:      string      # "image/synm" | "video/synm" | ...
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ocrautomator_ray import codec

MEDIA_SCHEMA = pa.schema(
    [("media_ref", pa.string()), ("bytes", pa.binary()), ("mime", pa.string())]
)

IMAGE_META_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("status", pa.string()),
        ("error", pa.string()),
    ]
)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class ImageDecodeActor:
    """binary image column → typed metadata (+ optionally pixels).

    Real path: PIL decode (used automatically when Pillow is installed).
    Stub path (this sandbox): decodes the deterministic synthetic container
    (codec.index_container) and derives width/height from its page byte
    sizes — a deterministic fake that keeps schema/plumbing identical to the
    PIL branch. Unknown mimes → status="error" rows, never a task failure.
    """

    def __init__(self) -> None:
        self._pil = _try_import_pil()

    def _decode_one(self, data: bytes, mime: str) -> tuple[int, int, int]:
        if self._pil is not None and mime.startswith("image/") and not mime.endswith("synm"):
            import io

            with self._pil.open(io.BytesIO(data)) as im:
                return im.width, im.height, getattr(im, "n_frames", 1)
        # deterministic fake: synthetic container structure → pseudo-dims
        idx = codec.index_container(data)
        sizes = [b - a for a, b in idx.page_slices]
        width = 64 + (max(sizes) if sizes else 0) % 1024
        height = 64 + (sum(sizes) % 1024)
        return width, height, idx.pages

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        mimes = batch["mime"].to_pylist()
        cols = {name: [] for name in IMAGE_META_SCHEMA.names}
        for ref, data, mime in zip(refs, blobs, mimes):
            try:
                w, h, f = self._decode_one(data or b"", mime or "")
                row = (ref, mime, w, h, f, "ok", "")
            except (codec.CodecError, ValueError, OSError) as e:
                row = (ref, mime, -1, -1, -1, "error", str(e))
            for name, v in zip(IMAGE_META_SCHEMA.names, row):
                cols[name].append(v)
        return pa.Table.from_pydict(cols, schema=IMAGE_META_SCHEMA)


class ResizeFeatureActor:
    """image bytes → fixed-size feature vector (list<float32>).

    Real path would be decode → resize(H×W) → normalize → model embed; no
    image libs exist here, so the stub derives a deterministic 16-d feature
    from container byte histograms (same shape/dtype the real path emits).
    Raises NotImplementedError for non-synthetic mimes when PIL is absent —
    the clearly-marked stub boundary.
    """

    FEAT_DIM = 16

    def __init__(self) -> None:
        self._pil = _try_import_pil()
        # "model load": a fixed random projection, seeded (the warm state)
        self._proj = np.random.default_rng(0xFEA7).standard_normal((256, self.FEAT_DIM))

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        mimes = batch["mime"].to_pylist()
        feats = []
        for data, mime in zip(blobs, mimes):
            if self._pil is None and not (mime or "").endswith("synm"):
                raise NotImplementedError(
                    "real image decode requires Pillow; only the synthetic "
                    "'*/synm' mime is supported in this environment"
                )
            hist = np.bincount(
                np.frombuffer(data or b"\x00", dtype=np.uint8), minlength=256
            ).astype(np.float64)
            hist /= max(1.0, hist.sum())
            feats.append((hist @ self._proj).astype(np.float32))
        return pa.table(
            {"media_ref": pa.array(refs, pa.string()),
             "feature": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32(), self.FEAT_DIM))}
        )


class FrameSampleActor:
    """video-like container → every k-th frame as its own row (flat output).

    The synthetic container's pages stand in for frames; a real build swaps
    the slicer for an ffmpeg/pyav keyframe reader with the same row layout:
    (media_ref, frame_no, frame_bytes).
    """

    def __init__(self, every_k: int = 4) -> None:
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        blobs = batch["bytes"].to_pylist()
        out_ref, out_no, out_bytes = [], [], []
        for ref, data in zip(refs, blobs):
            try:
                idx = codec.index_container(data or b"")
            except codec.CodecError:
                continue
            for frame_no in range(0, idx.pages, self.every_k):
                a, b = idx.page_slices[frame_no]
                out_ref.append(ref)
                out_no.append(frame_no)
                out_bytes.append(data[a:b])
        return pa.table(
            {"media_ref": pa.array(out_ref, pa.string()),
             "frame_no": pa.array(out_no, pa.int32()),
             "frame_bytes": pa.array(out_bytes, pa.binary())}
        )


def media_table_from_refs(refs: list[str], mime: str = "image/synm") -> pa.Table:
    """Materialize a MEDIA_SCHEMA table from synthetic refs (test helper)."""
    return pa.Table.from_pydict(
        {"media_ref": refs, "bytes": [codec.encode_media(r) for r in refs],
         "mime": [mime] * len(refs)},
        schema=MEDIA_SCHEMA,
    )

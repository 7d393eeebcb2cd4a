"""Multimodal actor-pool plumbing (stubbed codecs, real Ray wiring)."""

import numpy as np
import pytest
import ray.data as rd

from ocrautomator_ray import codec
from ocrautomator_ray.stages import multimodal as mm


def _refs(n=6, pages=4):
    return [codec.make_media_ref(f"img-{i}", 0, pages, 3, i) for i in range(n)]


def test_image_decode_actor_direct():
    t = mm.media_table_from_refs(_refs())
    out = mm.ImageDecodeActor()(t)
    assert out.schema.equals(mm.IMAGE_META_SCHEMA)
    assert out.num_rows == t.num_rows
    assert all(s == "ok" for s in out["status"].to_pylist())
    assert all(f == 4 for f in out["n_frames"].to_pylist())


def test_image_decode_bad_bytes_is_row_error():
    import pyarrow as pa

    t = pa.Table.from_pydict(
        {"media_ref": ["x"], "bytes": [b"garbage"], "mime": ["image/synm"]},
        schema=mm.MEDIA_SCHEMA,
    )
    out = mm.ImageDecodeActor()(t)
    assert out["status"].to_pylist() == ["error"]


def test_resize_feature_deterministic():
    t = mm.media_table_from_refs(_refs(3))
    a = mm.ResizeFeatureActor()(t)
    b = mm.ResizeFeatureActor()(t)
    assert a.equals(b)
    feats = np.array(a["feature"].to_pylist())
    assert feats.shape == (3, mm.ResizeFeatureActor.FEAT_DIM)


def test_resize_feature_stub_boundary():
    import pyarrow as pa

    t = pa.Table.from_pydict(
        {"media_ref": ["x"], "bytes": [b"\x89PNG fake"], "mime": ["image/png"]},
        schema=mm.MEDIA_SCHEMA,
    )
    actor = mm.ResizeFeatureActor()
    if actor._pil is None:
        with pytest.raises(NotImplementedError):
            actor(t)


def test_frame_sample_every_k():
    t = mm.media_table_from_refs(_refs(2, pages=10), mime="video/synm")
    out = mm.FrameSampleActor(every_k=4)(t)
    assert out["frame_no"].to_pylist() == [0, 4, 8, 0, 4, 8]
    # sampled frame bytes decode to the right page text
    dec = codec.MediaDecoder(work_factor=0)
    ref = codec.parse_media_ref(t["media_ref"][0].as_py())
    got = dec.decode_page(out["frame_bytes"][0].as_py(), 3)
    assert got == codec.page_text(ref, 0)


@pytest.mark.usefixtures("ray_session")
def test_multimodal_as_actor_pool_stage():
    t = mm.media_table_from_refs(_refs(12))
    out = (
        rd.from_arrow(t)
        .map_batches(mm.ImageDecodeActor, batch_format="pyarrow",
                     batch_size=4, concurrency=2, num_cpus=1)
        .to_pandas()
    )
    assert out.shape[0] == 12
    assert set(out["status"]) == {"ok"}


@pytest.mark.usefixtures("ray_session")
def test_resize_and_frame_sample_as_pool_stages():
    t = mm.media_table_from_refs(_refs(8, pages=8), mime="video/synm")
    feats = (
        rd.from_arrow(t)
        .map_batches(mm.ResizeFeatureActor, batch_format="pyarrow",
                     batch_size=4, concurrency=2, num_cpus=1)
        .to_pandas()
    )
    assert feats.shape[0] == 8
    frames = (
        rd.from_arrow(t)
        .map_batches(mm.FrameSampleActor, fn_constructor_kwargs={"every_k": 4},
                     batch_format="pyarrow", batch_size=4, concurrency=2, num_cpus=1)
        .to_pandas()
    )
    assert frames.shape[0] == 8 * 2  # frames 0 and 4 of each 8-page container


@pytest.mark.usefixtures("ray_session")
def test_media_queries_match_direct_actor_calls():
    """The graded media queries reproduce direct (pool-free) actor output."""
    from ocrautomator_ray.functions import media as M
    from ocrautomator_ray.stages.multimodal import ImageDecodeActor

    sf = "/root/testdata/sf0.001"
    got = M.media_decode_stats(sf).to_pandas().set_index("media_ref")
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"])
    direct = ImageDecodeActor()(M._media_rows(ids, "image/synm")).to_pandas() \
        .set_index("media_ref")
    assert len(got) == len(direct) == 500
    for c in ("width", "height", "n_frames", "status"):
        assert (got[c].sort_index() == direct[c].sort_index()).all(), c

    fc = M.media_frame_counts(sf).to_pandas().set_index("media_ref")
    # every-4th-frame count = ceil(pages/4); pages = 1 + doc_id % 5
    for ref, n in fc["n_frames_sampled"].items():
        import re

        pages = int(re.search(r"pages=(\d+)", ref).group(1))
        assert n == -(-pages // 4), ref

    feats = M.media_features(sf).to_pandas()
    assert len(feats) == 500 and feats["feat_u"].abs().max() > 0
    # deterministic across runs
    again = M.media_features(sf).to_pandas()
    assert feats.sort_values("media_ref").reset_index(drop=True) \
        .equals(again.sort_values("media_ref").reset_index(drop=True))

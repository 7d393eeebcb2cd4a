import pytest

from ocrautomator_ray import codec


def test_ref_roundtrip():
    ref = codec.make_media_ref("doc-1", 2, 5, 6, 99)
    r = codec.parse_media_ref(ref)
    assert (r.doc_id, r.offset, r.pages, r.psm, r.seed) == ("doc-1", 2, 5, 6, 99)


@pytest.mark.parametrize("bad", ["", "m://x", "m://d/0?pages=1&psm=2&seed=1",
                                 "http://d/0?pages=1&psm=3&seed=1", "m://d/x?pages=1&psm=3&seed=1"])
def test_bad_refs(bad):
    with pytest.raises(codec.CodecError):
        codec.parse_media_ref(bad)


def test_encode_decode_all_psms():
    dec = codec.MediaDecoder(work_factor=0)
    for psm in codec.VALID_PSMS:
        ref = codec.make_media_ref("d", 0, 3, psm, 42)
        data = codec.encode_media(ref)
        idx = codec.index_container(data)
        assert idx.pages == 3 and idx.psm == psm
        r = codec.parse_media_ref(ref)
        for p, (a, b) in enumerate(idx.page_slices):
            assert dec.decode_page(data[a:b], psm) == codec.page_text(r, p)


def test_psm_applied_at_decode():
    ref = codec.make_media_ref("d", 0, 1, 3, 42)
    data = codec.encode_media(ref)
    idx = codec.index_container(data)
    a, b = idx.page_slices[0]
    dec = codec.MediaDecoder(work_factor=0)
    t3 = dec.decode_page(data[a:b], 3)
    t11 = dec.decode_page(data[a:b], 11)
    assert t3.split(" ") == t11.split("\n")


def test_exif_block():
    ref = codec.make_media_ref("d", 1, 0, 3, 7)
    data = codec.encode_media(ref)
    idx = codec.index_container(data)
    assert idx.page_slices == []
    a, b = idx.exif_slice
    tags = codec.decode_exif_block(data[a:b])
    assert tags == codec.exif_tags(codec.parse_media_ref(ref))
    assert tags[3] == ("PageCount", "0")


def test_corrupt_containers():
    data = codec.encode_media(codec.make_media_ref("d", 0, 2, 3, 1))
    for bad in (b"", data[:5], data[: len(data) // 2], b"XXXX" + data[4:]):
        with pytest.raises(codec.CodecError):
            codec.index_container(bad)


def test_corrupt_exif_blocks_raise_codec_error():
    """T8 containment: truncated/undecodable exif payloads must surface as
    CodecError (the extraction actor catches only CodecError), never
    IndexError/UnicodeDecodeError."""
    ref = codec.make_media_ref("d", 1, 0, 3, 7)
    data = codec.encode_media(ref)
    a, b = codec.index_container(data).exif_slice
    payload = data[a:b]
    corrupt = [
        b"",                       # empty
        payload[:1],               # ntags only, no tag bytes
        payload[:3],               # truncated mid-key
        payload[:-1],              # truncated last value
        bytes([250]) + payload[1:],        # tag count overruns payload
        bytes([1, 2, 0xFF, 0xFE, 1, 118]),  # key bytes aren't UTF-8
        payload + b"\x00",         # trailing bytes
    ]
    for bad in corrupt:
        with pytest.raises(codec.CodecError):
            codec.decode_exif_block(bad)


def test_work_factor_does_not_change_output():
    ref = codec.make_media_ref("d", 0, 1, 3, 5)
    data = codec.encode_media(ref)
    idx = codec.index_container(data)
    a, b = idx.page_slices[0]
    assert codec.MediaDecoder(0).decode_page(data[a:b], 3) == \
        codec.MediaDecoder(32).decode_page(data[a:b], 3)

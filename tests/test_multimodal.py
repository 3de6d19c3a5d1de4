"""Shape/semantics tests for the multimodal binary plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from ast_data_pipeline_spark.operators.multimodal import (
    decode_image,
    extract_features,
    with_multimodal_columns,
)
from ast_data_pipeline_spark.sources.catalog import load


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG", "png")


def test_feature_extraction_shapes(spark, sf_dir):
    docs = with_multimodal_columns(load(spark, sf_dir, "documents"))
    feats = extract_features(docs).toPandas()
    n_docs = load(spark, sf_dir, "documents").count()
    assert len(feats) == n_docs
    assert set(feats["format"]) <= {"png", "jpg", "wav"}
    assert feats["feature_ok"].all()
    # histograms are 8-bin probability vectors
    h = np.stack(feats["histogram8"].to_numpy())
    assert h.shape == (n_docs, 8)
    assert np.allclose(h.sum(axis=1), 1.0, atol=1e-9)
    # payload bytes are ascii text -> mean byte in printable range
    assert (feats["mean_byte"] > 32).all() and (feats["mean_byte"] < 127).all()
    assert (feats["byte_len"] > 0).all()


def test_resize_nearest_neighbor(spark):
    import numpy as np

    from ast_data_pipeline_spark.operators.multimodal import resize_images

    # a 4x4 row-major plane with distinct bytes; nearest-neighbor to 2x2
    # must pick rows/cols 0 and 2 (floor index mapping)
    plane = bytes(range(16))
    df = spark.createDataFrame(
        [(1, plane, {"format": "png", "width": 4, "height": 4, "is_audio": False})],
        "doc_id long, payload binary, media_meta struct<format:string,width:int,height:int,is_audio:boolean>",
    )
    row = resize_images(df, 2, 2).collect()[0]
    got = np.frombuffer(row.payload, dtype=np.uint8).reshape(2, 2)
    assert got.tolist() == [[0, 2], [8, 10]]
    assert (row.width, row.height, row.src_width, row.src_height) == (2, 2, 4, 4)


def test_frame_sampling_shape(spark, sf_dir):
    from ast_data_pipeline_spark.operators.multimodal import (
        sample_frames,
        with_multimodal_columns,
    )
    from ast_data_pipeline_spark.sources.catalog import load

    docs = with_multimodal_columns(load(spark, sf_dir, "documents")).limit(50)
    out = sample_frames(docs, frame_len=64, every=4).toPandas()
    assert len(out) > 0
    # every doc's sampled indices are 0, 4, 8, ... within its n_frames
    for doc_id, g in out.groupby("doc_id"):
        n = g["n_frames"].iat[0]
        assert sorted(g["frame_index"]) == list(range(0, n, 4))
    assert (out["frame_len"] == 64).all()
    assert out["frame_mean_byte"].between(0, 255).all()


def _ppm_bytes(arr: np.ndarray, comment: bool = False) -> bytes:
    h, w, _ = arr.shape
    hdr = b"P6\n" + (b"# synthetic test image\n" if comment else b"")
    hdr += f"{w} {h}\n255\n".encode()
    return hdr + arr.astype(np.uint8).tobytes()


def test_ppm_decode_roundtrip():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(5, 3, 3), dtype=np.uint8)
    got = decode_image(_ppm_bytes(px, comment=True), "ppm")
    assert got.shape == (5, 3, 3)
    assert np.array_equal(got, px)


def test_pgm_decode_gray():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    payload = b"P5\n4 3\n255\n" + gray.tobytes()
    got = decode_image(payload, "pgm")
    assert got.shape == (3, 4)
    assert np.array_equal(got, gray)


def test_ppm_decode_rejects_truncated_and_16bit():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="truncated"):
        decode_image(_ppm_bytes(px)[:-3], "ppm")
    with pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6\n2 2\n65535\n" + bytes(24), "ppm")


def test_ppm_features_end_to_end(spark):
    """A generated PPM flows through extract_features with REAL pixel
    decode (VERDICT r3 next-round #6): mean/histogram computed on the
    decoded raster, not the raw payload bytes (header included)."""
    px = np.full((4, 4, 3), 200, dtype=np.uint8)
    px[:2, :, :] = 40  # half 40s, half 200s
    payload = _ppm_bytes(px, comment=True)
    df = spark.createDataFrame(
        [(1, payload, {"format": "ppm", "width": 4, "height": 4, "is_audio": False})],
        "doc_id long, payload binary, media_meta struct<format:string,width:int,height:int,is_audio:boolean>",
    )
    row = extract_features(df).collect()[0]
    assert row.feature_ok
    assert row.mean_byte == pytest.approx(120.0)  # (40+200)/2 — pixels, not header
    assert row.byte_len == len(payload)
    hist = row.histogram8
    # 40 -> bin 1, 200 -> bin 6, equal mass
    assert hist[1] == pytest.approx(0.5) and hist[6] == pytest.approx(0.5)
    assert sum(hist) == pytest.approx(1.0)


def test_pairwise_ssim_identity_and_bounds(spark):
    """SSIM of an identical pair is exactly 1.0 (integer num == den);
    a structurally-different pair lands strictly below 1."""
    from ast_data_pipeline_spark.operators.multimodal import pairwise_ssim

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    same = _ppm_bytes(px)
    shuffled = _ppm_bytes(px[::-1, :, :].copy())
    schema = (
        "doc_id long, payload_a binary, payload_b binary, "
        "media_meta struct<format:string,width:int,height:int,is_audio:boolean>"
    )
    meta = {"format": "ppm", "width": 4, "height": 4, "is_audio": False}
    df = spark.createDataFrame(
        [(1, same, same, meta), (2, same, shuffled, meta)], schema
    )
    rows = {r.doc_id: r for r in pairwise_ssim(df).collect()}
    assert rows[1].ssim_struct == 1.0  # exact: num == den by construction
    assert rows[1].mean_a == rows[1].mean_b
    assert rows[2].ssim_struct < 1.0
    assert rows[2].mean_a == rows[2].mean_b  # same multiset, reordered


def test_decode_audio_16bit_stereo_roundtrip():
    """The RIFF walker's 16-bit/stereo path (not covered by the 8-bit
    oracle query): signed samples survive the little-endian decode and
    channel reshape; word-aligned odd chunks are skipped correctly."""
    import numpy as np

    from ast_data_pipeline_spark.operators.multimodal import decode_audio

    samples = np.array([[-32768, 32767], [1000, -1000], [0, 7]], dtype="<i2")
    body = samples.tobytes()
    extra = b"LIST" + (3).to_bytes(4, "little") + b"abc" + b"\x00"  # odd, padded
    wav = (
        b"RIFF" + (4 + len(extra) + 24 + 8 + len(body)).to_bytes(4, "little")
        + b"WAVE" + extra
        + b"fmt " + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (2).to_bytes(2, "little")
        + (44100).to_bytes(4, "little") + (176400).to_bytes(4, "little")
        + (4).to_bytes(2, "little") + (16).to_bytes(2, "little")
        + b"data" + len(body).to_bytes(4, "little") + body
    )
    got, rate = decode_audio(wav)
    assert rate == 44100
    assert got.shape == (3, 2)
    assert (got == samples).all()


def test_decode_video_y4m_plane_layout():
    """y4m walker: plane order (Y,U,V), multi-frame split, and header
    parameter parsing, against a hand-built two-frame stream."""
    import numpy as np

    from ast_data_pipeline_spark.operators.multimodal import decode_video

    y0 = np.arange(16, dtype=np.uint8)
    u0 = np.full(16, 100, dtype=np.uint8)
    v0 = np.full(16, 200, dtype=np.uint8)
    f0 = np.concatenate([y0, u0, v0]).tobytes()
    f1 = bytes(reversed(f0))
    stream = (
        b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\n"
        + b"FRAME\n" + f0 + b"FRAME\n" + f1
    )
    frames, w, h = decode_video(stream)
    assert (w, h) == (4, 4) and frames.shape == (2, 3, 4, 4)
    assert (frames[0, 0].ravel() == y0).all()
    assert (frames[0, 1] == 100).all() and (frames[0, 2] == 200).all()
    assert (frames[1].ravel() == np.frombuffer(f1, dtype=np.uint8)).all()


def test_png_roundtrip_all_encoder_filters():
    import numpy as np

    from ast_data_pipeline_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, (5, 9, 3), dtype=np.uint8)
    grey = rng.randint(0, 256, (6, 11), dtype=np.uint8)
    for ft in (0, 1, 2):
        assert (decode_image(encode_png(rgb, ft), "png") == rgb).all()
        assert (decode_image(encode_png(grey, ft), "png") == grey).all()


def test_png_unfilter_average_and_paeth():
    # the encoder never emits filters 3/4; build the filtered raster by
    # hand from the spec's reconstruction equations and check the
    # decoder inverts them
    import struct
    import zlib

    import numpy as np

    from ast_data_pipeline_spark.operators.multimodal import (
        PNG_SIG,
        decode_image,
    )

    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    h, w, bpp = img.shape
    flat = img.reshape(h, w * bpp).astype(int)
    lines = b""
    for y, ft in zip(range(h), (0, 3, 4, 3)):
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * bpp, int)
        out = []
        for x in range(w * bpp):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((int(cur[x]) - pred) % 256)
        lines += bytes([ft]) + bytes(out)

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        PNG_SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )
    assert (decode_image(payload, "png") == img).all()


def test_png_rejects_corruption():
    import numpy as np
    import pytest

    from ast_data_pipeline_spark.operators.multimodal import (
        decode_image,
        encode_png,
    )

    good = bytearray(encode_png(np.zeros((2, 2, 3), np.uint8)))
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside a chunk -> CRC mismatch
    with pytest.raises(ValueError):
        decode_image(bytes(bad), "png")
    # jpg now has a REAL baseline decoder (r8) — a truncated payload is
    # a ValueError, not the old NotImplementedError stub; progressive
    # subsets still raise NotImplementedError (test_codecs_property).
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 jpeg", "jpg")


def test_mulaw_expansion_matches_itu_table_points():
    import numpy as np

    from ast_data_pipeline_spark.operators.multimodal import (
        decode_audio,
        mulaw_expand,
    )

    # canonical G.711 table anchors
    codes = np.array([0x00, 0x7F, 0xFF, 0x80], dtype=np.uint8)
    got = mulaw_expand(codes)
    assert got.tolist() == [-32124, 0, 0, 32124]
    # monotone decreasing magnitude as code moves toward 0x7F/0xFF
    neg = mulaw_expand(np.arange(0x00, 0x80, dtype=np.uint8))
    assert (np.diff(neg) > 0).all() and (neg < 0).sum() == 127
    # a fmt-7 WAV routes through the expansion
    from ast_data_pipeline_spark.queries.multimodal import _mulaw_wav_header

    payload = _mulaw_wav_header(4) + bytes([0x00, 0x7F, 0xFF, 0x80])
    samples, rate = decode_audio(payload)
    assert rate == 8000 and samples.tolist() == [-32124, 0, 0, 32124]


def test_gif_roundtrip_random_and_runs():
    import numpy as np

    from ast_data_pipeline_spark.operators.multimodal import (
        _gif_decode,
        decode_image,
        encode_gif,
    )

    rng = np.random.RandomState(7)
    # random 12x8 (the query shape), 1x1 degenerate, and a 64x70 noise
    # image (4480 px: crosses the 512/1024/2048/4096 width boundaries
    # AND forces a mid-stream table reset at the 4096-entry cap)
    for shape in [(12, 8), (1, 1), (64, 70), (3, 500)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        d = _gif_decode(encode_gif(a))
        assert d.shape == a.shape and (d == a).all(), shape
    # maximal runs exercise deep LZW chains + the KwKwK code case
    a = np.zeros((80, 80), np.uint8)
    assert (_gif_decode(encode_gif(a)) == a).all()
    a = np.tile(np.arange(16, dtype=np.uint8).repeat(13), 40).reshape(40, -1)
    assert (_gif_decode(encode_gif(a)) == a).all()
    # decode_image routes by magic
    a = rng.randint(0, 256, (12, 8)).astype(np.uint8)
    assert (decode_image(encode_gif(a), "gif") == a).all()


def test_gif_decoder_edge_cases():
    import numpy as np
    import pytest

    from ast_data_pipeline_spark.operators.multimodal import (
        _gif_decode,
        _lzw_compress,
        _lzw_decompress,
        encode_gif,
    )

    # small-palette LZW streams (mcs < 8) roundtrip
    rng = np.random.RandomState(11)
    for mcs in (2, 4, 7):
        data = bytes(rng.randint(0, 1 << mcs, size=3000).astype(np.uint8))
        assert _lzw_decompress(_lzw_compress(data, mcs), mcs) == data
    good = bytearray(encode_gif(np.arange(96, dtype=np.uint8).reshape(12, 8)))
    # GIF89a signature + a skippable extension block before the image
    g89 = bytearray(good)
    g89[:6] = b"GIF89a"
    lsd_end = 6 + 7 + 768  # header + logical screen descriptor + 256-grey GCT
    ext = b"\x21\xfe\x05hello\x00"  # comment extension, one sub-block
    g89 = g89[:lsd_end] + ext + g89[lsd_end:]
    assert (
        _gif_decode(bytes(g89)) == np.arange(96, dtype=np.uint8).reshape(12, 8)
    ).all()
    # interlace flag (descriptor packed byte): r8 decodes it for real —
    # the stored rows are treated as the 4-pass order, so flagging
    # sequentially-stored data yields the row-permuted image
    inter = bytearray(good)
    inter[lsd_end + 9] |= 0x40
    arr = np.arange(96, dtype=np.uint8).reshape(12, 8)
    order = np.concatenate(
        [np.arange(s, 12, p) for s, p in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )
    expect = np.empty_like(arr)
    expect[order] = arr
    assert (_gif_decode(bytes(inter)) == expect).all()
    # truncated LZW stream (strip trailer + last sub-block) -> ValueError
    with pytest.raises(ValueError):
        _lzw_decompress(b"", 8)
    # non-grey palette returns RGB
    rgb_gif = bytearray(good)
    rgb_gif[lsd_end - 768 + 1] = 200  # palette entry 0: green channel differs
    out = _gif_decode(bytes(rgb_gif))
    assert out.ndim == 3 and out.shape == (12, 8, 3)


def test_bmp_roundtrip_padding_and_orientation():
    import numpy as np
    import pytest

    from ast_data_pipeline_spark.operators.multimodal import (
        _bmp_decode,
        decode_image,
        encode_bmp,
    )

    rng = np.random.RandomState(3)
    # widths 6/7 force 2- and 3-byte row padding; 8 is 4-aligned
    for shape in [(12, 8), (5, 6), (3, 7), (1, 1)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        d = _bmp_decode(encode_bmp(a))
        assert d.shape == a.shape and (d == a).all(), shape
    rgb = rng.randint(0, 256, (5, 6, 3)).astype(np.uint8)
    assert (_bmp_decode(encode_bmp(rgb)) == rgb).all()
    assert (decode_image(encode_bmp(rgb), "bmp") == rgb).all()
    # orientation: encoder writes bottom-up; flipping to a negative
    # height header must yield the vertically mirrored image
    import struct

    payload = bytearray(encode_bmp(rgb))
    w, h = struct.unpack_from("<ii", payload, 18)
    struct.pack_into("<ii", payload, 18, w, -h)
    flipped = _bmp_decode(bytes(payload))
    assert (flipped == rgb[::-1]).all()
    # unsupported subsets raise, truncation raises
    bad = bytearray(encode_bmp(rgb))
    struct.pack_into("<H", bad, 28, 8)  # bpp = 8
    with pytest.raises(NotImplementedError):
        _bmp_decode(bytes(bad))
    with pytest.raises(ValueError):
        _bmp_decode(encode_bmp(rgb)[:-10])

"""Sink round-trips and multimodal column plumbing."""

import glob
import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openseizuredatabase_spark.functions.multimodal import (
    MEDIA_SCHEMA,
    decode_features,
    frame_sample,
    resize_images,
    _HAS_PIL,
)
from openseizuredatabase_spark.sources.sinks import (
    export_small_json,
    write_csv_index,
    write_events_json,
)


@pytest.fixture(scope="module")
def small_df(spark):
    return spark.createDataFrame(
        [Row(id=i, name=f"n{i}", val=float(i)) for i in range(20)]
    )


def test_write_events_json_roundtrip(spark, small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "events_json")
    write_events_json(small_df, path)
    back = spark.read.json(path)
    assert back.count() == 20
    assert {r.id for r in back.collect()} == set(range(20))


def test_export_small_json_pretty(small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "export.json")
    n = export_small_json(small_df, path, pretty=True)
    assert n == 20
    with open(path) as f:
        data = json.load(f)
    assert len(data) == 20 and data[0].keys() == {"id", "name", "val"}


def test_write_csv_index_sorted_quoted(spark, small_df, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sink") / "index_csv")
    write_csv_index(small_df, path, ["id", "name"], order_by="id")
    files = sorted(glob.glob(os.path.join(path, "part-*.csv")))
    assert files
    first_line = open(files[0]).readlines()[1]
    assert first_line.startswith('"')  # quoteAll
    back = spark.read.option("header", True).csv(path)
    assert back.count() == 20


def _png_bytes(mid):
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import encode_png

    w, h = 8 + mid % 5, 6 + mid % 4
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return encode_png(((x * 7 + y * 13 + mid * 31) % 256).astype(np.uint8))


def _gif_bytes(mid, n_frames):
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import encode_gif

    i = np.arange(256, dtype=np.int64)
    palette = np.stack([i, i, i], axis=1).astype(np.uint8)
    y = np.arange(5)[:, None]
    x = np.arange(6)[None, :]
    frames = [
        ((mid * 31 + f * 97 + y * 13 + x * 7) % 256).astype(np.uint8)
        for f in range(n_frames)
    ]
    return encode_gif(frames, palette)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        Row(
            media_id=i,
            media_type="image",
            content=_png_bytes(i),
            meta=Row(
                width=None, height=None, sample_rate=None,
                n_frames=None, format="png",
            ),
        )
        for i in range(6)
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_features_real_codec_histogram(media):
    """decode_features runs the REAL PNG codec: features are the 16-bin
    normalized pixel histogram, byte-replayable from the pixel formula."""
    import numpy as np

    out = decode_features(media, n_features=16).collect()
    assert len(out) == 6
    for r in out:
        mid = r.media_id
        w, h = 8 + mid % 5, 6 + mid % 4
        x = np.arange(w)[None, :]
        y = np.arange(h)[:, None]
        pix = ((x * 7 + y * 13 + mid * 31) % 256).astype(np.int64).ravel()
        hist = np.bincount(pix * 16 // 256, minlength=16) / len(pix)
        assert r.n_px == w * h
        assert np.array_equal(np.array(r.features), hist)
    # deterministic: same content → same features across runs
    out2 = {r.media_id: r.features for r in decode_features(media, 16).collect()}
    assert out2 == {r.media_id: r.features for r in out}


def test_decode_features_unknown_container_fails_fast(spark):
    df = spark.createDataFrame(
        [Row(media_id=1, media_type="video", content=b"\x00\x00mp4x",
             meta=Row(width=None, height=None, sample_rate=None,
                      n_frames=None, format="mp4"))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|unrecognized"):
        decode_features(df, 16).collect()


def test_frame_sample_real_gif_decode(spark):
    """frame_sample decodes REAL animated GIFs: sampled frame stats
    match the pixel formula; the max_frames cap bites; non-GIF video
    containers fail fast (round-7 ask #5 — no stub on any path)."""
    import numpy as np

    rows = [
        Row(
            media_id=i,
            media_type="video",
            content=_gif_bytes(i, n),
            meta=Row(width=None, height=None, sample_rate=None,
                     n_frames=n, format="gif"),
        )
        for i, n in [(0, 1), (1, 7), (2, 12)]
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = frame_sample(df, every_n=3, max_frames=3).collect()
    got = {(r.media_id, r.frame_idx) for r in out}
    # id 0: frame 0 only; id 1 (7 frames): 0,3,6; id 2 (12): 0,3,6 (cap)
    assert got == {(0, 0), (1, 0), (1, 3), (1, 6), (2, 0), (2, 3), (2, 6)}
    for r in out:
        y = np.arange(5)[:, None]
        x = np.arange(6)[None, :]
        pix = (r.media_id * 31 + r.frame_idx * 97 + y * 13 + x * 7) % 256
        assert (r.width, r.height) == (6, 5)
        assert r.n_frames == [1, 7, 12][r.media_id]
        assert (r.idx_sum, r.idx_min, r.idx_max) == (
            int(pix.sum()), int(pix.min()), int(pix.max())
        )

    mp4 = spark.createDataFrame(
        [Row(media_id=9, media_type="video", content=b"\x00\x00\x00 ftypmp42",
             meta=Row(width=None, height=None, sample_rate=None,
                      n_frames=10, format="mp4"))],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|only GIF"):
        frame_sample(mp4, every_n=3, max_frames=3).collect()


def test_resize_is_real_now(spark):
    """Round 4: resize no longer fail-fasts — the stdlib PNG codec backs
    a working decode → nearest-neighbor → re-encode stage."""
    import numpy as np
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    img = np.arange(8 * 10, dtype=np.uint8).reshape(8, 10)
    df = spark.createDataFrame(
        [Row(media_id=1, content=bytearray(encode_png(img, filters=[3])))]
    )
    out = resize_images(df, width=4, height=4).collect()
    assert len(out) == 1 and (out[0]["width"], out[0]["height"]) == (4, 4)
    small = decode_png(bytes(out[0]["content"]))
    assert small.shape == (4, 4, 1)
    assert small[2, 3, 0] == img[(2 * 8) // 4, (3 * 10) // 4]


def test_png_roundtrip_all_filters():
    """encode→decode is pixel-exact for every PNG filter type and for
    grey/RGB/RGBA, on non-square shapes (the stdlib codec path)."""
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(7)
    for ch in (1, 3, 4):
        img = rng.integers(0, 256, size=(11, 17, ch), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            out = decode_png(encode_png(img, filters=filters))
            assert out.shape == (11, 17, ch)
            assert np.array_equal(out, img), (ch, filters)
    grey = rng.integers(0, 256, size=(5, 9), dtype=np.uint8)
    out = decode_png(encode_png(grey))
    assert np.array_equal(out[:, :, 0], grey)


def test_png_decode_rejects_unsupported():
    import struct
    import zlib

    import numpy as np
    import pytest

    from openseizuredatabase_spark.functions.multimodal import (
        _PNG_SIG,
        decode_png,
        encode_png,
    )

    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    # rewrite a valid PNG's IHDR to claim Adam7 interlace
    img = np.zeros((4, 4), dtype=np.uint8)
    png = bytearray(encode_png(img))
    ihdr_off = len(_PNG_SIG) + 8
    png[ihdr_off + 12] = 1  # interlace byte
    # fix the CRC so the chunk walk stays honest
    crc = zlib.crc32(bytes(png[ihdr_off - 4 : ihdr_off + 13])) & 0xFFFFFFFF
    png[ihdr_off + 13 : ihdr_off + 17] = struct.pack(">I", crc)
    with pytest.raises(NotImplementedError, match="interlace"):
        decode_png(bytes(png))


def test_png_pixel_stats_stage(spark):
    """The mapInPandas decode stage: bytes in, per-image stats out."""
    import numpy as np
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.multimodal import (
        encode_png,
        png_pixel_stats,
    )

    imgs = {
        1: np.full((3, 5), 7, dtype=np.uint8),
        2: np.arange(12, dtype=np.uint8).reshape(3, 4),
    }
    media = spark.createDataFrame(
        [
            Row(media_id=k, content=bytearray(encode_png(v, filters=[4])))
            for k, v in imgs.items()
        ]
    )
    got = {r["media_id"]: r for r in png_pixel_stats(media).collect()}
    assert (got[1]["width"], got[1]["height"]) == (5, 3)
    assert got[1]["px_sum"] == 7 * 15 and got[1]["px_min"] == 7
    assert got[2]["px_sum"] == sum(range(12)) and got[2]["px_max"] == 11


def test_wav_roundtrip():
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    rng = np.random.default_rng(11)
    mono = rng.integers(-30000, 30000, size=200, dtype=np.int64)
    s, rate = decode_wav(encode_wav(mono, 44100))
    assert rate == 44100 and s.shape == (200, 1)
    assert np.array_equal(s[:, 0], mono)
    stereo = rng.integers(-1000, 1000, size=(50, 2), dtype=np.int64)
    s2, rate2 = decode_wav(encode_wav(stereo, 8000))
    assert rate2 == 8000 and s2.shape == (50, 2)
    assert np.array_equal(s2, stereo)


def test_wav_encode_clips_out_of_range():
    """PCM saturation, not modular wraparound: +40000 must land at
    32767, not wrap to -25536."""
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
    )

    hot = np.array([40000, -40000, 32767, -32768, 0], dtype=np.int64)
    s, _ = decode_wav(encode_wav(hot, 8000))
    assert s[:, 0].tolist() == [32767, -32768, 32767, -32768, 0]


def test_wav_decode_rejects_non_pcm():
    import struct

    import pytest

    from openseizuredatabase_spark.functions.multimodal import decode_wav

    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS not a wav")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float32
    bad = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_wav(bad)


def test_resize_nearest_matches_index_math():
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import resize_nearest

    img = np.arange(12 * 16, dtype=np.uint8).reshape(12, 16)[:, :, None]
    out = resize_nearest(img, width=6, height=5)
    assert out.shape == (5, 6, 1)
    for i in range(5):
        for j in range(6):
            assert out[i, j, 0] == img[(i * 12) // 5, (j * 16) // 6, 0]


# --- JPEG baseline codec ----------------------------------------------------


def test_jpeg_idct_matches_direct_cosine_sum():
    """The matrix IDCT must agree with the O(N^4) textbook cosine sum —
    an independent reference for the transform stage."""
    import numpy as np

    from openseizuredatabase_spark.functions import multimodal as mm

    rng = np.random.default_rng(5)
    coef = rng.integers(-200, 200, (8, 8)).astype(np.float64)
    fast = mm._DCT_M.T @ coef @ mm._DCT_M
    direct = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
                    cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            direct[x, y] = s
    assert np.abs(fast - direct).max() < 1e-9


def test_jpeg_uniform_blocks_roundtrip_exact():
    import numpy as np

    from openseizuredatabase_spark.functions import multimodal as mm

    img = np.zeros((16, 24), dtype=np.uint8)
    vals = [0, 17, 100, 128, 200, 255]
    for i, v in enumerate(vals):
        img[(i // 3) * 8 : (i // 3) * 8 + 8, (i % 3) * 8 : (i % 3) * 8 + 8] = v
    dec = mm.decode_jpeg(mm.encode_jpeg(img, quality=100))
    assert dec.shape == (16, 24, 1)
    assert np.array_equal(dec[:, :, 0], img)


def test_jpeg_lossy_roundtrip_bounded_and_oriented():
    import numpy as np

    from openseizuredatabase_spark.functions import multimodal as mm

    rng = np.random.default_rng(7)
    x = rng.integers(0, 256, (24, 33), dtype=np.uint8)  # non-multiple-of-8
    d = mm.decode_jpeg(mm.encode_jpeg(x, quality=90))[:, :, 0].astype(int)
    err = np.abs(d - x.astype(int))
    assert d.shape == x.shape
    assert err.max() <= 40 and err.mean() < 8  # q90 on noise
    # color 4:4:4
    c = rng.integers(0, 256, (17, 19, 3), dtype=np.uint8)
    dc = mm.decode_jpeg(mm.encode_jpeg(c, quality=95)).astype(int)
    assert dc.shape == c.shape
    assert np.abs(dc - c.astype(int)).max() <= 60
    # a horizontal gradient must come back horizontal (pins the
    # within-block orientation that a doubly-transposed DCT/IDCT pair
    # would silently cancel on roundtrip-only checks)
    g = (np.arange(64) * 4).reshape(1, -1).repeat(16, 0).astype(np.uint8)
    dg = mm.decode_jpeg(mm.encode_jpeg(g, quality=90))[:, :, 0].astype(int)
    col_means = dg.mean(axis=0)
    assert col_means[-1] > col_means[0] + 150
    assert dg.std(axis=1).mean() > 10 * dg.std(axis=0).mean()


def test_jpeg_restart_markers_do_not_change_pixels():
    import numpy as np

    from openseizuredatabase_spark.functions import multimodal as mm

    rng = np.random.default_rng(3)
    x = rng.integers(0, 256, (24, 40), dtype=np.uint8)
    plain = mm.decode_jpeg(mm.encode_jpeg(x, quality=85))
    for ri in (1, 2, 5):
        withr = mm.decode_jpeg(
            mm.encode_jpeg(x, quality=85, restart_interval=ri)
        )
        assert np.array_equal(plain, withr)


def test_jpeg_guards_fail_fast():
    import numpy as np
    import pytest as pt

    from openseizuredatabase_spark.functions import multimodal as mm

    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(mm.encode_jpeg(img))
    with pt.raises(ValueError):
        mm.decode_jpeg(b"\x00\x01" + bytes(enc))
    # flip SOF0 -> SOF2 (progressive)
    i = bytes(enc).find(b"\xff\xc0")
    prog = bytes(enc[:i]) + b"\xff\xc2" + bytes(enc[i + 2 :])
    with pt.raises(NotImplementedError):
        mm.decode_jpeg(prog)
    # claim 2x2 subsampling in SOF0 (byte at SOF0 + 2(marker)+2(len)+
    # 6(prec,h,w,nc) + 1(comp id) = sampling byte)
    sub = bytearray(enc)
    sub[i + 11] = 0x22
    with pt.raises(NotImplementedError):
        mm.decode_jpeg(bytes(sub))


# --- GIF LZW codec ----------------------------------------------------------


def test_gif_multiframe_roundtrip_exact():
    import numpy as np

    from openseizuredatabase_spark.functions import multimodal as mm

    rng = np.random.default_rng(11)
    i = np.arange(256, dtype=np.int64)
    pal = np.stack([i, (i * 3) % 256, (i * 7) % 256], axis=1).astype(
        np.uint8
    )
    frames = [rng.integers(0, 256, (13, 21), dtype=np.uint8) for _ in range(3)]
    dec, p2 = mm.decode_gif(mm.encode_gif(frames, pal))
    assert len(dec) == 3
    assert all(np.array_equal(a, b) for a, b in zip(frames, dec))
    assert np.array_equal(pal, p2)


def test_gif_lzw_table_growth_and_clear():
    """A large repetitive frame forces the LZW table past every width
    boundary up to 4096 and through a CLEAR reset — the decoder must
    still be bit-exact (LZW is lossless)."""
    import numpy as np

    from openseizuredatabase_spark.functions import multimodal as mm

    pal = np.zeros((256, 3), dtype=np.uint8)
    big = (np.arange(200 * 300) % 251).reshape(200, 300).astype(np.uint8)
    dec, _ = mm.decode_gif(mm.encode_gif([big], pal))
    assert np.array_equal(dec[0], big)


def test_gif_guards_fail_fast():
    import numpy as np
    import pytest as pt

    from openseizuredatabase_spark.functions import multimodal as mm

    pal = np.zeros((256, 3), dtype=np.uint8)
    img = np.zeros((8, 8), dtype=np.uint8)
    enc = bytearray(mm.encode_gif([img], pal))
    with pt.raises(ValueError):
        mm.decode_gif(b"NOPE" + bytes(enc))
    # set the interlace bit in the image descriptor flags: descriptor
    # starts right after header(6)+LSD(7)+GCT(768), flags at +9
    enc[6 + 7 + 768 + 9] |= 0x40
    with pt.raises(NotImplementedError):
        mm.decode_gif(bytes(enc))


def test_jpeg_extremal_checkerboard_exact_at_q100():
    """The +-128 checkerboard maximizes DCT AC magnitude (~837) — the
    worst case for the AC Huffman size categories (must stay <= 10)
    and, at quality 100 with all-ones quant, still roundtrips with
    small bounded error through the float transform."""
    import numpy as np

    from openseizuredatabase_spark.functions import multimodal as mm

    cb = np.zeros((8, 8), dtype=np.uint8)
    cb[::2, ::2] = 255
    cb[1::2, 1::2] = 255
    dec = mm.decode_jpeg(mm.encode_jpeg(cb, quality=100))
    assert np.abs(dec[:, :, 0].astype(int) - cb.astype(int)).max() <= 1


def test_codec_edge_shapes_roundtrip():
    """Edge geometries (1x1, single row/column, non-multiple-of-8) must
    survive both codecs: JPEG via replicate-padding with the original
    crop back, GIF exactly (LZW is lossless)."""
    import numpy as np

    from openseizuredatabase_spark.functions import multimodal as mm

    rng = np.random.default_rng(1)
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[:, 0] = np.arange(256)
    for shape in [(1, 1), (1, 9), (9, 1), (3, 3), (7, 13), (16, 2)]:
        x = rng.integers(0, 256, shape, dtype=np.uint8)
        d = mm.decode_jpeg(mm.encode_jpeg(x, quality=92))[:, :, 0]
        assert d.shape == x.shape
        assert np.abs(d.astype(int) - x.astype(int)).max() <= 40
        g, _ = mm.decode_gif(mm.encode_gif([x], pal))
        assert np.array_equal(g[0], x)
        c = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
        dc = mm.decode_jpeg(mm.encode_jpeg(c, quality=92))
        assert dc.shape == c.shape


def test_wav_resample_identity_and_downrate(spark):
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import (
        decode_wav,
        encode_wav,
        resample_wav,
    )

    v = ((np.arange(40, dtype=np.int64) * 17 + 5) % 2003) - 1001
    media = spark.createDataFrame(
        [(1, bytearray(encode_wav(v, 8000)))], "media_id long, content binary"
    )
    # dst == src: a/b = 1/1 -> bit-identical passthrough
    same = resample_wav(media, 8000).collect()[0]
    s, rate = decode_wav(bytes(same["content"]))
    assert rate == 8000 and s[:, 0].tolist() == v.tolist()
    # 8k -> 6k: m = (n-1)*3//4 + 1; every 3rd output (r=0) hits a
    # source sample exactly; interior points are the integer lerp
    down = resample_wav(media, 6000).collect()[0]
    s2, rate2 = decode_wav(bytes(down["content"]))
    out = s2[:, 0].astype(np.int64)
    assert rate2 == 6000 and len(out) == (40 - 1) * 3 // 4 + 1
    assert out[0] == v[0] and out[3] == v[4] and out[6] == v[8]
    j = 1  # idx = 1, r = 1 -> floor((v[1]*2 + v[2]*1)/3)
    assert out[j] == (v[1] * 2 + v[2] * 1) // 3
    # tail edge-hold: last grid point at/before the final sample
    assert out[-1] == (
        v[(len(out) - 1) * 4 // 3] * (3 - (len(out) - 1) * 4 % 3)
        + v[min((len(out) - 1) * 4 // 3 + 1, 39)] * ((len(out) - 1) * 4 % 3)
    ) // 3


def test_image_dhash_and_near_dup_pairs(spark):
    """dHash over real decoded PNGs: identical images hash equal, a
    one-pixel edit lands within the Hamming budget, a structurally
    different texture does not pair; the banded join finds exactly the
    engineered pairs."""
    import numpy as np
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.multimodal import (
        dhash_near_dup_pairs,
        encode_png,
        image_dhash,
    )

    x = np.arange(11)[None, :]
    y = np.arange(9)[:, None]
    base = ((x * x * 7 + y * y * 13 + x * y * 5) % 256).astype(np.uint8)
    near = base.copy()
    near[0, 0] = (int(near[0, 0]) + 97) % 256
    other = ((x * x * 11 + y * y * 3 + x * y * 29 + 77) % 256).astype(
        np.uint8
    )
    rows = [
        Row(media_id=1, content=encode_png(base)),
        Row(media_id=2, content=encode_png(base)),  # exact dup of 1
        Row(media_id=3, content=encode_png(near)),  # near dup of 1
        Row(media_id=4, content=encode_png(other)),
    ]
    hashes = image_dhash(spark.createDataFrame(rows))
    by_id = {r.media_id: (r.h0, r.h1) for r in hashes.collect()}
    assert by_id[1] == by_id[2]
    assert all(0 <= v < 2**32 for pair in by_id.values() for v in pair)
    ham13 = bin(by_id[1][0] ^ by_id[3][0]).count("1") + bin(
        by_id[1][1] ^ by_id[3][1]
    ).count("1")
    assert 0 <= ham13 <= 6
    pairs = {
        (r.id_a, r.id_b): (r.hamming, r.is_exact)
        for r in dhash_near_dup_pairs(hashes, max_hamming=6).collect()
    }
    assert pairs[(1, 2)] == (0, True)
    assert (1, 3) in pairs and (2, 3) in pairs
    assert not any(4 in k for k in pairs)


def test_audio_fingerprint_constellation(spark):
    """Constellation fingerprint over real decoded WAV: per-segment
    DFT argmax recovers the tone program, landmark codes pack
    consecutive peaks, and the >=2-agreement join finds exactly the
    engineered duplicate while a different program stays out."""
    import numpy as np
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.multimodal import (
        audio_fingerprint,
        encode_wav,
        fingerprint_match_pairs,
    )

    i = np.arange(64)

    def clip(bins):
        segs = [
            np.round(8000.0 * np.sin(2 * np.pi * b * i / 64.0))
            for b in bins
        ]
        return encode_wav(np.concatenate(segs), rate=8000)

    rows = [
        Row(media_id=1, content=clip([5, 9, 17, 23])),
        Row(media_id=2, content=clip([5, 9, 17, 23])),  # exact dup
        Row(media_id=3, content=clip([5, 9, 30, 2])),  # shares ONE landmark
        Row(media_id=4, content=clip([11, 4, 26, 8])),
    ]
    fps = audio_fingerprint(spark.createDataFrame(rows), window=64)
    by_id = {}
    for r in fps.collect():
        by_id.setdefault(r.media_id, set()).add((r.k, r.code))
    # the peaks are the tone bins: codes = b_k*64 + b_{k+1}
    assert by_id[1] == {(0, 5 * 64 + 9), (1, 9 * 64 + 17), (2, 17 * 64 + 23)}
    assert by_id[1] == by_id[2]
    pairs = {
        (r.id_a, r.id_b): r.n_common
        for r in fingerprint_match_pairs(fps, min_common=2).collect()
    }
    assert pairs == {(1, 2): 3}  # the one-landmark overlap with 3 is out


def test_gif_scene_changes(spark):
    """Scene-change detection over real decoded GIF frames: one-pixel
    within-scene jitter stays under the Hamming threshold, a texture
    cut crosses it; frame 0 is always a boundary; non-GIF fails fast."""
    import numpy as np
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.multimodal import (
        encode_gif,
        gif_scene_changes,
    )

    i = np.arange(256, dtype=np.int64)
    palette = np.stack([i, i, i], axis=1).astype(np.uint8)
    x = np.arange(10)[None, :]
    y = np.arange(9)[:, None]
    frames = []
    for f in range(8):
        s = f // 4
        pix = (x * x * 7 + y * y * 13 + x * y * (s * 17 + 3) + s * 31) % 256
        pix = pix.copy()
        pix[0, 0] = (pix[0, 0] + (f % 4) * 9) % 256
        frames.append(pix.astype(np.uint8))
    df = spark.createDataFrame(
        [Row(media_id=1, content=encode_gif(frames, palette))]
    )
    out = (
        gif_scene_changes(df, threshold=12)
        .toPandas()
        .sort_values("frame_idx")
    )
    assert len(out) == 8
    import pandas as _pd
    assert out.iloc[0].is_boundary and _pd.isna(out.iloc[0].hamming)
    boundaries = [int(r.frame_idx) for _, r in out.iterrows() if r.is_boundary]
    assert boundaries == [0, 4]
    within = [int(r.hamming) for _, r in out.iterrows()
              if r.frame_idx not in (0, 4)]
    assert all(h <= 12 for h in within)

    bad = spark.createDataFrame([Row(media_id=2, content=b"\x00\x00\x00 ftyp")])
    import pytest as _pytest
    with _pytest.raises(Exception, match="NotImplementedError|only GIF"):
        gif_scene_changes(bad).collect()


def test_video_near_dup_pairs(spark):
    """Video-level near-dup matching over real decoded frames: a
    per-frame one-pixel edit copy matches on every frame (>=2 rule
    easily met); a different texture program does not pair."""
    import numpy as np
    from pyspark.sql import Row

    from openseizuredatabase_spark.functions.multimodal import (
        encode_gif,
        gif_frame_dhashes,
        video_near_dup_pairs,
    )

    i = np.arange(256, dtype=np.int64)
    palette = np.stack([i, i, i], axis=1).astype(np.uint8)
    x = np.arange(10)[None, :]
    y = np.arange(9)[:, None]

    def vid(texture_seed, jitter):
        frames = []
        for f in range(6):
            s = f // 3
            pix = (
                x * x * 7 + y * y * 13 + x * y * (texture_seed + s * 17)
                + s * 31
            ) % 256
            pix = pix.copy()
            pix[0, 0] = (int(pix[0, 0]) + (f % 3) * 9 + jitter) % 256
            frames.append(pix.astype(np.uint8))
        return encode_gif(frames, palette)

    rows = [
        Row(media_id=1, content=vid(3, 0)),
        Row(media_id=2, content=vid(3, 13)),  # near-dup of 1
        Row(media_id=3, content=vid(29, 0)),  # different program
    ]
    hashes = gif_frame_dhashes(spark.createDataFrame(rows))
    assert hashes.count() == 18
    pairs = {
        (r.id_a, r.id_b): r.n_frame_matches
        for r in video_near_dup_pairs(hashes).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 6
    assert not any(3 in k for k in pairs)


# --- AVI (RIFF) MJPEG container (round-10: the last video container) --------


def test_avi_mjpeg_roundtrip_exact():
    """Mux uniform-block q100 JPEG frames into a RIFF-AVI, demux via the
    chunk walk, decode through the baseline JPEG decoder — byte-exact
    pixels back (the m34 exactness trick lifted to the container tier)."""
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import (
        decode_avi_mjpeg,
        decode_jpeg,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    frames = []
    for f in range(4):
        img = np.zeros((16, 24), dtype=np.uint8)
        for by in range(2):
            for bx in range(3):
                img[by * 8 :][:8, bx * 8 : bx * 8 + 8] = (
                    f * 41 + by * 47 + bx * 23
                ) % 256
        frames.append(img)
    avi = encode_avi_mjpeg(
        [encode_jpeg(fr, quality=100) for fr in frames], 24, 16
    )
    assert avi[:4] == b"RIFF" and avi[8:12] == b"AVI "
    back = decode_avi_mjpeg(avi)
    assert len(back) == 4
    for fb, fr in zip(back, frames):
        assert np.array_equal(decode_jpeg(fb)[:, :, 0], fr)


def test_avi_mjpeg_rec_lists_and_odd_padding():
    """OpenDML 'rec ' LIST nesting and odd-sized chunk word alignment:
    hand-build a movi whose frames sit inside a rec LIST and whose first
    JPEG has odd length (forcing a pad byte) — the walk must recurse and
    honor the pad."""
    import struct

    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import (
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    img = np.full((8, 8), 99, dtype=np.uint8)
    j = encode_jpeg(img, quality=100)
    j_odd = j + b"\xff\xd9"[:1] if len(j) % 2 == 0 else j  # force odd
    assert len(j_odd) % 2 == 1

    def chunk(cid, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    rec = chunk(b"LIST", b"rec " + chunk(b"00dc", j_odd) + chunk(b"00dc", j))
    movi = chunk(b"LIST", b"movi" + rec + chunk(b"00dc", j))
    body = b"AVI " + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body
    back = decode_avi_mjpeg(avi)
    assert [len(x) for x in back] == [len(j_odd), len(j), len(j)]

    # and the writer's own idx1 offsets point at the chunk fourccs
    good = encode_avi_mjpeg([j, j_odd], 8, 8)
    i = good.index(b"idx1")
    n_entries = struct.unpack("<I", good[i + 4 : i + 8])[0] // 16
    assert n_entries == 2
    movi_fourcc = good.index(b"movi")
    for e in range(n_entries):
        off = struct.unpack(
            "<I", good[i + 8 + e * 16 + 8 : i + 8 + e * 16 + 12]
        )[0]
        assert good[movi_fourcc + off : movi_fourcc + off + 4] == b"00dc"


def test_avi_mjpeg_guards_fail_fast():
    """MP4/ISO-BMFF and non-JPEG stream payloads fail fast with
    NotImplementedError (capability guards, never silent fakes)."""
    import struct

    import pytest

    from openseizuredatabase_spark.functions.multimodal import (
        decode_avi_mjpeg,
    )

    with pytest.raises(NotImplementedError, match="ISO-BMFF"):
        decode_avi_mjpeg(b"\x00\x00\x00 ftypmp42" + b"\x00" * 16)

    def chunk(cid, payload):
        pad = b"\x00" if len(payload) % 2 else b""
        return cid + struct.pack("<I", len(payload)) + payload + pad

    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", b"\x00\x01notjpeg"))
    body = b"AVI " + movi
    with pytest.raises(NotImplementedError, match="not.*JPEG|only MJPEG"):
        decode_avi_mjpeg(b"RIFF" + struct.pack("<I", len(body)) + body)

    with pytest.raises(ValueError, match="no '##dc'"):
        empty = b"AVI " + chunk(b"LIST", b"movi")
        decode_avi_mjpeg(b"RIFF" + struct.pack("<I", len(empty)) + empty)


def test_mjpeg_frame_stats_and_near_dup(spark):
    """mjpeg_frame_stats end-to-end on Spark: per-frame stats + dHash
    halves match a direct decode, and the (h0, h1) columns feed
    video_near_dup_pairs — videos sharing >= 2 byte-exact frames pair."""
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import (
        _dhash_halves,
        encode_avi_mjpeg,
        encode_jpeg,
        mjpeg_frame_stats,
        video_near_dup_pairs,
    )

    def vid(mid, key):
        jpegs = []
        for f in range(4):
            img = np.zeros((16, 16), dtype=np.uint8)
            for by in range(2):
                for bx in range(2):
                    img[by * 8 :][:8, bx * 8 : bx * 8 + 8] = (
                        f * 41 + by * 47 + bx * 23
                        + (key * 13 if f >= 2 else 0)
                    ) % 256
            jpegs.append(encode_jpeg(img, quality=100))
        return (mid, encode_avi_mjpeg(jpegs, 16, 16))

    media = spark.createDataFrame(
        [vid(1, 0), vid(2, 5), vid(3, 9)],  # share frames 0-1 exactly
        "media_id long, content binary",
    )
    stats = mjpeg_frame_stats(media)
    rows = {(r.media_id, r.frame_idx): r for r in stats.collect()}
    assert len(rows) == 12
    img0 = np.zeros((16, 16), dtype=np.int64)
    for by in range(2):
        for bx in range(2):
            img0[by * 8 :][:8, bx * 8 : bx * 8 + 8] = (
                by * 47 + bx * 23
            ) % 256
    r = rows[(1, 0)]
    assert (r.width, r.height, r.n_frames) == (16, 16, 4)
    assert (r.px_sum, r.px_min, r.px_max) == (
        int(img0.sum()), int(img0.min()), int(img0.max())
    )
    assert (r.h0, r.h1) == _dhash_halves(img0)

    pairs = video_near_dup_pairs(
        stats.select("media_id", "frame_idx", "h0", "h1"),
        max_hamming=6,
        min_frame_matches=2,
    )
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert {(1, 2), (1, 3), (2, 3)} <= got


def test_decode_features_handles_mjpeg_avi(spark):
    """The magic-byte dispatch routes RIFF+'AVI ' through the MJPEG
    demux: decode_features' histogram covers every frame's pixels."""
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import (
        decode_features,
        encode_avi_mjpeg,
        encode_jpeg,
    )

    frames = []
    for f in range(3):
        img = np.zeros((8, 16), dtype=np.uint8)
        img[:, :8] = (f * 50 + 10) % 256
        img[:, 8:] = (f * 50 + 200) % 256
        frames.append(img)
    avi = encode_avi_mjpeg(
        [encode_jpeg(fr, quality=100) for fr in frames], 16, 8
    )
    media = spark.createDataFrame(
        [(7, avi)], "media_id long, content binary"
    )
    (row,) = decode_features(media, n_features=8).collect()
    assert row.media_id == 7
    assert row.n_px == 3 * 8 * 16  # all frames decoded
    hist = np.array(row.features)
    assert abs(hist.sum() - 1.0) < 1e-9
    # two uniform half-frames per frame -> mass concentrated in the
    # bins of the six distinct pixel values
    vals = sorted({(f * 50 + 10) % 256 for f in range(3)}
                  | {(f * 50 + 200) % 256 for f in range(3)})
    bins = {v * 8 // 256 for v in vals}
    assert hist[list(bins)].sum() > 0.999


def test_dhash_probe_pairs_cross_codec(spark):
    """Two-sided banded Hamming lookup: a PNG-decoded probe image finds
    its pixel-identical MJPEG-AVI frame (Hamming 0) across codecs, and
    within-radius corpus entries rank by exact popcount."""
    import numpy as np

    from openseizuredatabase_spark.functions.multimodal import (
        dhash_probe_pairs,
        encode_avi_mjpeg,
        encode_jpeg,
        encode_png,
        image_dhash,
        mjpeg_frame_stats,
    )

    def pix(key):
        img = np.zeros((16, 48), dtype=np.uint8)
        for by in range(2):
            for bx in range(6):
                img[by * 8 :][:8, bx * 8 : bx * 8 + 8] = (
                    by * 47 + bx * bx * 23 + bx * key
                ) % 256
        return img

    frames = [pix(3), pix(90), pix(200)]
    avi = encode_avi_mjpeg(
        [encode_jpeg(fr, quality=100) for fr in frames], 48, 16
    )
    corpus = mjpeg_frame_stats(
        spark.createDataFrame([(1, avi)], "media_id long, content binary")
    ).select("media_id", "frame_idx", "h0", "h1")
    probes = image_dhash(
        spark.createDataFrame(
            [(77, encode_png(pix(3)))], "media_id long, content binary"
        )
    ).select("media_id", "h0", "h1")
    got = {
        (r.probe_id, r.corpus_id, r.frame_idx): r.hamming
        for r in dhash_probe_pairs(
            probes, corpus, max_hamming=2, corpus_extra=("frame_idx",)
        ).collect()
    }
    assert got[(77, 1, 0)] == 0  # cross-codec exact frame hit
    assert all(h <= 2 for h in got.values())


def test_offset_consensus_rejects_scattered_hits(spark):
    """The temporal-consensus reducer: hits agreeing on one time delta
    assemble votes; the same number of hits scattered across offsets
    never reach min_votes."""
    from openseizuredatabase_spark.functions.multimodal import (
        offset_consensus_matches,
    )

    rows = [
        # clip 1 vs video 10: 3 frames aligned at offset 2
        (1, 0, 10, 2, 0), (1, 1, 10, 3, 0), (1, 2, 10, 4, 0),
        # clip 1 vs video 11: 3 hits but every one at a different delta
        (1, 0, 11, 0, 1), (1, 1, 11, 3, 1), (1, 2, 11, 1, 2),
        # clip 2 vs video 10: two frames on one diagonal, one off it
        (2, 0, 10, 1, 0), (2, 1, 10, 2, 0), (2, 2, 10, 5, 1),
    ]
    pairs = spark.createDataFrame(
        rows,
        "probe_id long, p_t long, corpus_id long, c_t long, hamming long",
    )
    got = {
        (r.probe_id, r.corpus_id, r.offset): r.votes
        for r in offset_consensus_matches(
            pairs, "p_t", "c_t", min_votes=2
        ).collect()
    }
    assert got == {(1, 10, 2): 3, (2, 10, 1): 2}

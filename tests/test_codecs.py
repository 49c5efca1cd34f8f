"""Real multimodal codecs: BMP/PPM/WAV round-trips, resize kernels."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duckdb_vss_spark.operators.multimodal import (
    _decode_bmp,
    _decode_ppm,
    _resize_kernel,
    decode_audio,
    decode_image,
    encode_bmp,
    encode_ppm,
    encode_wav,
    resize_image,
)


def _grad(h, w, seed=0):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7 + y * 13 + seed) % 256, (x * 3 + y * 5) % 256, (x + y * 11) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_bmp_roundtrip_kernel():
    for h, w in [(5, 7), (8, 8), (1, 1), (3, 2)]:  # odd widths exercise padding
        img = _grad(h, w, 3)
        assert np.array_equal(_decode_bmp(encode_bmp(img)), img), (h, w)


def test_ppm_roundtrip_kernel():
    img = _grad(6, 5)
    assert np.array_equal(_decode_ppm(encode_ppm(img)), img)
    # comment + whitespace variants in the header
    raw = b"P6 # comment\n5 6\n# another\n255\n" + img.tobytes()
    assert np.array_equal(_decode_ppm(raw), img)


def test_decode_image_dataframe(spark):
    rows = [(i, bytearray(encode_bmp(_grad(4 + i, 5, i)))) for i in range(3)]
    rows.append((9, bytearray(encode_ppm(_grad(3, 3, 9)))))
    df = spark.createDataFrame(rows, "id: long, content: binary")
    got = {r["id"]: r for r in decode_image(df, "id").collect()}
    for i in range(3):
        want = _grad(4 + i, 5, i)
        assert (got[i]["width"], got[i]["height"], got[i]["channels"]) == (5, 4 + i, 3)
        assert np.array_equal(
            np.array(got[i]["pixels"]).reshape(4 + i, 5, 3), want.astype(np.float32)
        )
    assert got[9]["width"] == 3 and np.array(got[9]["pixels"]).sum() == _grad(3, 3, 9).sum()


def test_decode_image_rejects_synthetic_and_compressed(spark):
    from duckdb_vss_spark.operators.multimodal import pack_header

    df = spark.createDataFrame(
        [(1, bytearray(pack_header("image", 4, 4) + b"xx"))], "id: long, content: binary"
    )
    with pytest.raises(Exception, match="VSSM synthetic"):
        decode_image(df, "id").collect()
    # JPEG now decodes natively (round 9) — garbage after SOI is a decode
    # error from the baseline parser, not a missing-PIL guard
    jpeg = spark.createDataFrame(
        [(1, bytearray(b"\xff\xd8\xff\xe0notreallyjpeg"))], "id: long, content: binary"
    )
    with pytest.raises(Exception, match="(scan data|struct|unpack|index)"):
        decode_image(jpeg, "id").collect()
    # formats with no native decoder still hit the clearly-marked guard
    webp = spark.createDataFrame(
        [(1, bytearray(b"RIFF\x00\x00\x00\x00WEBPVP8 "))], "id: long, content: binary"
    )
    with pytest.raises(Exception, match="(NotImplementedError|PIL|codec|cannot identify)"):
        decode_image(webp, "id").collect()


def test_wav_roundtrip_dataframe(spark):
    t = np.arange(800)
    mono = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int16)
    stereo = np.stack([mono, -mono], axis=1)
    df = spark.createDataFrame(
        [(1, bytearray(encode_wav(mono, 8000))), (2, bytearray(encode_wav(stereo, 16000)))],
        "id: long, content: binary",
    )
    got = {r["id"]: r for r in decode_audio(df, "id").collect()}
    assert got[1]["sample_rate"] == 8000 and got[1]["n_channels"] == 1
    assert got[1]["n_samples"] == 800
    assert np.allclose(np.array(got[1]["samples"]), mono / 32768.0, atol=1e-6)
    assert got[2]["n_channels"] == 2 and got[2]["n_samples"] == 800
    inter = np.array(got[2]["samples"]).reshape(800, 2)
    assert np.allclose(inter[:, 1], -inter[:, 0], atol=1e-6)


def test_resize_nearest_exact_and_bilinear(spark):
    img = _grad(8, 8, 1)
    df = spark.createDataFrame([(1, bytearray(encode_bmp(img)))], "id: long, content: binary")
    # nearest downscale by 2: picks every other pixel exactly
    got = resize_image(df, "id", 4, 4, method="nearest").collect()[0]
    arr = np.array(got["pixels"]).reshape(4, 4, 3)
    assert np.array_equal(arr, img[::2, ::2, :].astype(np.float32))
    # bilinear identity: same size in == byte-identical out
    same = _resize_kernel(img, 8, 8, "bilinear")
    assert np.allclose(same, img.astype(np.float64))
    # bilinear 2x2 constant image stays constant at any size
    const = np.full((2, 2, 3), 77, dtype=np.uint8)
    up = _resize_kernel(const, 5, 3, "bilinear")
    assert np.allclose(up, 77.0)


def test_resize_bad_method():
    with pytest.raises(ValueError, match="unknown resize method"):
        _resize_kernel(_grad(2, 2), 1, 1, "cubic")


# ---------------------------------------------------------------- PNG


def _png_with_filters(img, ftypes):
    """Hand-encode using a chosen filter type per scanline, to exercise
    every unfilter path in the decoder."""
    import struct
    import zlib

    from duckdb_vss_spark.operators.multimodal import _paeth

    h, w, ch = img.shape
    ctype = {1: 0, 3: 2, 4: 6}[ch]
    flat = img.reshape(h, w * ch).astype(np.int32)
    lines, prev = [], np.zeros(w * ch, np.int32)
    for y, f in zip(range(h), ftypes):
        cur = flat[y]
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur.copy(); filt[ch:] = (cur[ch:] - cur[:-ch]) % 256
        elif f == 2:
            filt = (cur - prev) % 256
        elif f == 3:
            filt = np.array([(cur[i] - (((cur[i-ch] if i >= ch else 0) + prev[i]) >> 1)) % 256
                             for i in range(w * ch)])
        else:
            filt = np.array([(cur[i] - _paeth(int(cur[i-ch] if i >= ch else 0), int(prev[i]),
                                              int(prev[i-ch] if i >= ch else 0))) % 256
                             for i in range(w * ch)])
        lines.append(bytes([f]) + bytes(filt.astype(np.uint8))); prev = cur
    raw = b"".join(lines)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_roundtrip_shapes_and_channels():
    from duckdb_vss_spark.operators.multimodal import _decode_image_bytes, encode_png

    rng = np.random.default_rng(0)
    for shape in [(5, 7, 3), (4, 4, 1), (8, 3, 4), (1, 1, 3), (16, 16, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        dec = _decode_image_bytes(encode_png(img))
        ref = np.repeat(img, 3, axis=2) if shape[2] == 1 else img
        assert dec.shape == ref.shape and (dec == ref).all()


def test_png_all_filter_types_decode():
    from duckdb_vss_spark.operators.multimodal import _decode_png

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
    for ft in [[0, 1, 2, 3, 4, 1], [4] * 6, [3] * 6, [1, 2] * 3]:
        assert (_decode_png(_png_with_filters(img, ft)) == img).all()
    rgba = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    assert (_decode_png(_png_with_filters(rgba, [4, 3, 2, 1])) == rgba).all()


def test_png_palette_and_unsupported():
    import struct
    import zlib

    from duckdb_vss_spark.operators.multimodal import _decode_png

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)

    rng = np.random.default_rng(2)
    plte = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    idx = rng.integers(0, 7, (4, 6), dtype=np.uint8)
    raw = b"".join(bytes([0]) + bytes(idx[y]) for y in range(4))
    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 4, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", plte.tobytes()) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    assert (_decode_png(png) == plte[idx]).all()
    # 16-bit depth is honestly unsupported (interlace decodes since round 9)
    png16 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
             + chunk(b"IDAT", zlib.compress(b"\x00" * 26)) + chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError, match="8-bit"):
        _decode_png(png16)


def test_png_through_decode_image_operator(spark):
    """PNG blobs ride the same mapInPandas decode path as BMP/PPM."""
    from duckdb_vss_spark.operators.multimodal import decode_image, encode_png

    rng = np.random.default_rng(3)
    imgs = {i: rng.integers(0, 256, (4 + i, 5, 3), dtype=np.uint8) for i in range(3)}
    df = spark.createDataFrame(
        [(i, bytearray(encode_png(v))) for i, v in imgs.items()], "id long, content binary"
    )
    out = {r["id"]: r for r in decode_image(df, "id").collect()}
    for i, v in imgs.items():
        assert (out[i]["width"], out[i]["height"], out[i]["channels"]) == (5, 4 + i, 3)
        assert np.array_equal(
            np.array(out[i]["pixels"], dtype=np.uint8).reshape(4 + i, 5, 3), v
        )


# ---- baseline JPEG (round 9, operators/jpeg.py) -----------------------------


def test_jpeg_constant_blocks_lossless_at_q50():
    """An image of constant EVEN-valued 8x8 blocks is LOSSLESS through the
    baseline path at quality 50: DC quant step 16 divides 8*(c-128), all
    AC coefficients are zero, and the orthonormal IDCT reproduces the
    constant exactly — the property the driver's jpegpx gate pins in
    closed form."""
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    img = np.zeros((16, 24), dtype=np.uint8)
    cs = iter([40, 128, 202, 16, 90, 238])
    for by in range(2):
        for bx in range(3):
            img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = next(cs)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    assert out.shape == (16, 24, 3)
    assert np.array_equal(out[:, :, 0], img)
    assert np.array_equal(out[:, :, 0], out[:, :, 1])


def test_jpeg_roundtrip_quality_and_fixture():
    """Smooth content round-trips tightly at high quality; the q75 RGB
    decode is pinned to a stored pixel fixture (sha256), so any change to
    the DCT, quantization rounding, Huffman tables, or color transform is
    machine-visible."""
    import hashlib

    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    sm = (128 + 100 * np.sin(np.mgrid[0:32, 0:32][0] / 10.0)).astype(np.uint8)
    o = decode_jpeg(encode_jpeg(sm, quality=95))
    assert np.abs(o[:, :, 0].astype(int) - sm.astype(int)).max() <= 6

    y, x = np.mgrid[0:64, 0:48]
    rgb = np.stack([(x * 3 + y * 2) % 256, (x * 5 + y * 7) % 256, (x + y) % 256], axis=-1).astype(np.uint8)
    enc = encode_jpeg(rgb, quality=75)
    assert enc == encode_jpeg(rgb, quality=75)  # deterministic bytes
    dec = decode_jpeg(enc)
    assert dec.shape == (64, 48, 3)
    assert (
        hashlib.sha256(dec.tobytes()).hexdigest()
        == "54a5be98e0b11f8d935880b46c21c6f0fb82c89d9ad0fb5ca06d033a274ecd49"
    )
    # AC-path quality floor (regression gate for the round-9 dequant-order
    # bug, which only AC-rich content exposes: mean-abs error was ~36
    # with the zigzag/natural mixup, ~3 when correct)
    rng = np.random.default_rng(0)
    gray = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    dg = decode_jpeg(encode_jpeg(gray, quality=90))
    assert np.abs(dg[:, :, 0].astype(float) - gray.astype(float)).mean() < 6.0
    mse = ((dec.astype(float) - rgb.astype(float)) ** 2).mean()
    assert 10 * np.log10(255**2 / mse) > 25.0  # PSNR floor on the gradient


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    (common in camera output) — the parse must skip them, not misread a
    segment length."""
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    b = bytearray(encode_jpeg(img, quality=50))
    i = b.find(b"\xff\xdb")
    padded = bytes(b[:i]) + b"\xff\xff" + bytes(b[i:])
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(bytes(b)))


def test_jpeg_header_parser_agrees_with_encoder():
    """Cross-check with the INDEPENDENT header-only parser that predates
    the codec (multimodal.parse_jpeg_header): dims parsed from our
    encoder's SOF0 must equal the input dims — the two implementations
    share no code."""
    from duckdb_vss_spark.operators.jpeg import encode_jpeg
    from duckdb_vss_spark.operators.multimodal import parse_jpeg_header

    img = _grad(24, 40)
    w, h, _orient = parse_jpeg_header(encode_jpeg(img, quality=75))
    assert (w, h) == (40, 24)


def test_jpeg_odd_dims_and_grayscale():
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    odd = ((np.mgrid[0:13, 0:11][0] * 17) % 256).astype(np.uint8)
    o = decode_jpeg(encode_jpeg(odd, quality=75))
    assert o.shape == (13, 11, 3)


def test_jpeg_unsupported_processes_raise():
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    good = bytearray(encode_jpeg(np.zeros((8, 8), dtype=np.uint8), quality=50))
    sof = good.find(b"\xff\xc0")
    # progressive (0xC2) is supported since round 9 — arithmetic is not
    arith = bytes(good[:sof]) + b"\xff\xca" + bytes(good[sof + 2 :])
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arith)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_through_decode_image_operator(spark):
    """decode_image dispatches JPEG bytes to the native baseline decoder
    inside the same mapInPandas batches as the other codecs."""
    import pandas as pd

    from duckdb_vss_spark.operators.jpeg import encode_jpeg
    from duckdb_vss_spark.operators.multimodal import decode_image

    def synth(batches):
        for pdf in batches:
            out = []
            for i in pdf["doc_id"]:
                i = int(i)
                img = np.full((8, 8), 16 + 2 * (i % 112), dtype=np.uint8)
                out.append((i, encode_jpeg(img, quality=50)))
            yield pd.DataFrame(out, columns=["doc_id", "content"])

    docs = spark.range(20).withColumnRenamed("id", "doc_id").mapInPandas(
        synth, schema="doc_id long, content binary"
    )
    rows = decode_image(docs, "doc_id").collect()
    assert len(rows) == 20
    for r in rows:
        c = 16 + 2 * (r["doc_id"] % 112)
        assert r["width"] == 8 and r["height"] == 8
        assert all(p == c for p in r["pixels"][:64])


def test_transcode_images_pipeline(spark):
    """decode -> resize -> re-encode JPEG thumbnailing, flag-don't-drop:
    a mixed batch of BMP/PNG/JPEG inputs transcodes to decodable baseline
    JPEGs at the target dims; a corrupt blob lands flagged, not dropped."""
    import pandas as pd

    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from duckdb_vss_spark.operators.multimodal import encode_png, transcode_images

    img = _grad(32, 40)
    rows = [
        (1, bytearray(encode_bmp(img))),
        (2, bytearray(encode_png(img))),
        (3, bytearray(encode_jpeg(img, quality=90))),
        (4, bytearray(b"\xff\xd8garbage")),
    ]
    df = spark.createDataFrame(rows, "id long, content binary")
    out = {r["id"]: r for r in transcode_images(df, "id", 16, 12, quality=85).collect()}
    assert len(out) == 4
    for i in (1, 2, 3):
        r = out[i]
        assert r["ok"] and r["err"] is None
        dec = decode_jpeg(bytes(r["content"]))
        assert dec.shape == (12, 16, 3)
    bad = out[4]
    assert not bad["ok"] and bad["content"] is None and bad["err"]
    # determinism: same input bytes -> same output bytes
    again = {r["id"]: r for r in transcode_images(df, "id", 16, 12, quality=85).collect()}
    assert bytes(again[1]["content"]) == bytes(out[1]["content"])
    import pytest as _pytest
    with _pytest.raises(Exception):
        transcode_images(df, "id", 16, 12, on_error="raise").collect()
    with _pytest.raises(ValueError, match="on_error"):
        transcode_images(df, "id", 16, 12, on_error="bogus")


def test_jpeg_420_subsampling_roundtrip():
    """4:2:0 — the dominant web format — through the encoder's subsampled
    mode: exercises the decoder's multi-block MCU layout, chroma plane
    sizing, and nearest upsampling (dead code until round 9 gave the
    encoder a 4:2:0 mode). Smooth content bounds the chroma loss."""
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:48, 0:40]
    rgb = np.clip(
        np.stack(
            [128 + 80 * np.sin(y / 9.0), 128 + 80 * np.cos(x / 11.0), 128 + 60 * np.sin((x + y) / 13.0)],
            axis=-1,
        ),
        0, 255,
    ).astype(np.uint8)
    b420 = encode_jpeg(rgb, quality=90, subsampling="420")
    b444 = encode_jpeg(rgb, quality=90)
    assert len(b420) < len(b444)  # the point of subsampling
    d420 = decode_jpeg(b420)
    assert d420.shape == (48, 40, 3)
    assert np.abs(d420.astype(float) - rgb.astype(float)).mean() < 4.0
    # non-MCU-multiple dims crop correctly
    odd = rgb[:19, :21]
    do = decode_jpeg(encode_jpeg(odd, quality=85, subsampling="420"))
    assert do.shape == (19, 21, 3)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(rgb, subsampling="422")


def test_jpeg_restart_intervals_decode_identically():
    """DRI/RSTn: the decoder's restart machinery (byte-align, marker skip,
    DC-predictor reset) must reproduce the no-restart pixels exactly, for
    both MCU layouts."""
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        plain = encode_jpeg(img, quality=80, subsampling=sub)
        rst = encode_jpeg(img, quality=80, subsampling=sub, restart_interval=3)
        assert b"\xff\xdd" in rst and rst != plain
        assert np.array_equal(decode_jpeg(rst), decode_jpeg(plain)), sub


def test_jpeg_progressive_equals_baseline_decode():
    """Progressive (SOF2: spectral selection + successive approximation)
    and baseline encodes share the quantizer, so their decodes must be
    pixel-IDENTICAL — any slip in DC/AC first/refinement entropy coding,
    EOB runs, or band bookkeeping breaks exact equality somewhere."""
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    fixtures = [
        ("gradient", np.stack(
            [(np.mgrid[0:40, 0:56][1] * 3 + np.mgrid[0:40, 0:56][0] * 2) % 256,
             (np.mgrid[0:40, 0:56][1] * 5) % 256,
             (np.mgrid[0:40, 0:56][0] * 7) % 256], axis=-1).astype(np.uint8)),
        ("noise", rng.integers(0, 256, (24, 24, 3), dtype=np.int64).astype(np.uint8)),
        ("flat+edge", np.pad(np.full((8, 8, 3), 200, np.uint8),
                             ((0, 16), (0, 16), (0, 0)), constant_values=30)),
    ]
    for name, img in fixtures:
        for q in (50, 75, 90):
            base = decode_jpeg(encode_jpeg(img, quality=q))
            prog = decode_jpeg(encode_jpeg(img, quality=q, progressive=True))
            assert np.array_equal(prog, base), (name, q)


def test_jpeg_progressive_grayscale_and_odd_dims():
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(9)
    g = rng.integers(0, 256, (19, 23), dtype=np.int64).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(g, quality=80))
    prog = decode_jpeg(encode_jpeg(g, quality=80, progressive=True))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_420_subsampled():
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    y, x = np.mgrid[0:34, 0:41]  # non-multiple-of-16 dims: padded MCU grid
    img = np.stack([(x * 7 + y) % 256, (x + y * 5) % 256, (x * 2 + y * 3) % 256],
                   axis=-1).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=75, subsampling="420"))
    prog = decode_jpeg(encode_jpeg(img, quality=75, subsampling="420", progressive=True))
    assert np.array_equal(prog, base)


def test_jpeg_progressive_restart_intervals():
    from duckdb_vss_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (32, 40, 3), dtype=np.int64).astype(np.uint8)
    plain = decode_jpeg(encode_jpeg(img, quality=85, progressive=True))
    with_rst = decode_jpeg(
        encode_jpeg(img, quality=85, progressive=True, restart_interval=3)
    )
    assert np.array_equal(plain, with_rst)


def test_jpeg_progressive_through_decode_image(spark):
    import pandas as pd

    from duckdb_vss_spark.operators.jpeg import encode_jpeg
    from duckdb_vss_spark.operators.multimodal import decode_image

    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([(x * 9) % 256, (y * 9) % 256, (x + y) % 256], axis=-1).astype(np.uint8)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "content": [encode_jpeg(img, quality=90, progressive=True)],
    }))
    r = decode_image(df, "doc_id").collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (16, 16, 3)


def test_png_adam7_interlaced_roundtrip():
    """Adam7 decode equals non-interlaced decode of the same pixels, for
    shapes exercising empty and partial passes (tiny dims skip passes)."""
    from duckdb_vss_spark.operators.multimodal import _decode_png, encode_png

    rng = np.random.default_rng(21)
    for h, w, ch in [(16, 16, 3), (13, 7, 3), (5, 3, 1), (1, 1, 3), (2, 9, 4), (8, 1, 3)]:
        img = rng.integers(0, 256, (h, w, ch), dtype=np.int64).astype(np.uint8)
        plain = _decode_png(encode_png(img))
        inter = _decode_png(encode_png(img, interlace=True))
        assert np.array_equal(inter, plain), (h, w, ch)


def test_png_adam7_through_decode_image(spark):
    import pandas as pd

    from duckdb_vss_spark.operators.multimodal import decode_image, encode_png

    y, x = np.mgrid[0:11, 0:14]
    img = np.stack([(x * 9 + y) % 256, (y * 5) % 256, (x + y * 3) % 256], axis=-1).astype(np.uint8)
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1], "content": [encode_png(img, interlace=True)],
    }))
    r = decode_image(df, "doc_id").collect()[0]
    got = np.asarray(r["pixels"], dtype=np.float32).reshape(11, 14, 3).astype(np.uint8)
    assert np.array_equal(got, img)

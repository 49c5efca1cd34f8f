"""Multimodal (image/audio/video) columns for training-data pipelines
(north-star surface; the reference engine is text/vector-only).

Model: media is an opaque ``binary`` column plus typed metadata columns —
the schema, partitioning, Arrow batch shape, and UDF signatures here are
the real 100 TB-scale plumbing. Codec support is split honestly by what
pure numpy + the stdlib can do: UNCOMPRESSED formats decode for real
(24/32-bit BI_RGB BMP and binary PPM images, RIFF/WAVE PCM audio); 8-bit
PNG decodes for real (stdlib zlib inflate + all five scanline filters,
color types 0/2/3/4/6, non-interlaced; encoder included); baseline JPEG
decodes and encodes for real, baseline AND progressive (:mod:`.jpeg`,
pure-numpy huffman + IDCT; arithmetic/12-bit raise); GIF87a/89a
decodes and encodes for real
(:mod:`.gif`, pure-python LZW, animation frames composited) — round
trips are testable end-to-end with no codec library. Remaining lossy
formats (WEBP/MP3/MP4/AVIF) genuinely need codec libraries this
container doesn't ship and fall through to PIL when present, else a
clearly-marked ``NotImplementedError``. The deterministic synthetic
container below exercises the byte-level plumbing independent of codecs:

``VSSM`` container (16-byte header, big-endian)::

    bytes 0-3   magic b"VSSM"
    byte  4     kind: 1=image, 2=audio, 3=video
    bytes 5-6   width  (uint16)
    bytes 7-8   height (uint16)
    bytes 9-10  n_frames (uint16; 1 for image)
    bytes 11-14 sample_rate (uint32; 0 for image/video)
    byte  15    version (=1)
    bytes 16-   payload

Scale notes:
- every operator is ``mapInPandas`` over Arrow batches: bytes never leave
  the executor, no shuffle, no driver round-trip; output schemas are fixed
  (no inference);
- batch memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — for large blobs set it so batch_rows x avg_blob_size fits the Python
  worker (document, don't guess: a 10 MB blob at the default 10k rows/batch
  is a 100 GB batch — lower it);
- frame sampling EXPLODES output rows; it repartitions downstream by
  (id, frame) naturally via the existing partitioning, no extra shuffle.
"""

from __future__ import annotations

import struct
from functools import lru_cache
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _fan_out

__all__ = [
    "MEDIA_KINDS",
    "pack_header",
    "synthesize_media",
    "decode_media_meta",
    "decode_image",
    "decode_audio",
    "resize_image",
    "encode_bmp",
    "encode_ppm",
    "encode_png",
    "encode_wav",
    "parse_jpeg_header",
    "byte_histogram_features",
    "frame_sample",
    "video_frames",
    "gif_frames",
    "resize_media",
    "transcode_images",
]

MEDIA_KINDS = {"image": 1, "audio": 2, "video": 3}
_KIND_NAMES = {v: k for k, v in MEDIA_KINDS.items()}
MAGIC = b"VSSM"
HEADER_LEN = 16
_HDR = ">4sBHHHIB"  # magic, kind, w, h, n_frames, sample_rate, version


def pack_header(kind: str, width: int = 0, height: int = 0, n_frames: int = 1, sample_rate: int = 0) -> bytes:
    return struct.pack(_HDR, MAGIC, MEDIA_KINDS[kind], width, height, n_frames, sample_rate, 1)


def _unpack_header(b: bytes):
    magic, kind, w, h, nf, sr, ver = struct.unpack(_HDR, bytes(b[:HEADER_LEN]))
    if magic != MAGIC:
        raise ValueError("not a VSSM blob (bad magic)")
    return _KIND_NAMES.get(kind, "unknown"), w, h, nf, sr, ver


def synthesize_media(df: DataFrame, id_col: str, payload_col: str, kind: str = "image") -> DataFrame:
    """Deterministic media blobs from an id + text payload: header fields
    derive from the id (w = 16 + id % 64, h = 16 + 7*id % 64,
    n_frames = 1 + id % 8 for video, sample_rate = 8000 for audio), payload
    is the UTF-8 bytes of ``payload_col``. Output: (id, content BINARY,
    media_type STRING)."""
    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_ids, blobs = [], []
            for i, txt in zip(pdf[id_col], pdf[payload_col]):
                i = int(i)
                w, h = 16 + i % 64, 16 + (7 * i) % 64
                nf = 1 + i % 8 if kind == "video" else 1
                sr = 8000 if kind == "audio" else 0
                payload = ("" if txt is None else str(txt)).encode("utf-8")
                blobs.append(pack_header(kind, w, h, nf, sr) + payload)
                out_ids.append(i)
            yield pd.DataFrame({id_col: out_ids, "content": blobs, "media_type": kind})

    return df.select(id_col, payload_col).mapInPandas(
        gen, schema=f"{id_col} {id_t}, content binary, media_type string"
    )


_JPEG_SOF_MARKERS = frozenset(
    range(0xC0, 0xD0)
) - {0xC4, 0xC8, 0xCC}  # SOF0..SOF15 minus DHT/JPG/DAC (JPEG T.81 §B.2.2)


def parse_jpeg_header(b: bytes) -> tuple[int, int, int]:
    """Header-only JPEG parse — dimensions + EXIF orientation, NO entropy
    decode (so it needs no codec library and reads only the marker
    segments, never the scan data). Returns ``(width, height,
    orientation)`` with orientation 1 when no EXIF tag is present.

    Walks the marker stream (T.81 §B): any SOF0/SOF2/... frame header
    carries (precision, height, width, n_components); an APP1 segment
    starting ``Exif\\0\\0`` is parsed as a TIFF IFD0 for tag 0x0112
    (orientation). Hostile/truncated bytes raise ValueError, never read
    out of bounds."""
    b = bytes(b)
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    w = h = None
    orient = 1
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:  # desync — skip fill bytes defensively
            pos += 1
            continue
        marker = b[pos + 1]
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS: scan data follows
            break
        if 0xD0 <= marker <= 0xD7 or marker in (0x01, 0xFF):  # standalone
            pos += 2
            continue
        (seg_len,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        if seg_len < 2 or pos + 2 + seg_len > len(b):
            raise ValueError("truncated JPEG segment")
        seg = b[pos + 4 : pos + 2 + seg_len]
        if marker in _JPEG_SOF_MARKERS and len(seg) >= 5:
            h, w = struct.unpack(">HH", seg[1:5])
        elif marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
            tiff = seg[6:]
            if len(tiff) >= 8 and tiff[:2] in (b"II", b"MM"):
                endian = "<" if tiff[:2] == b"II" else ">"
                (ifd0,) = struct.unpack(endian + "I", tiff[4:8])
                if ifd0 + 2 <= len(tiff):
                    (n_ent,) = struct.unpack(endian + "H", tiff[ifd0 : ifd0 + 2])
                    for e in range(n_ent):
                        off = ifd0 + 2 + 12 * e
                        if off + 12 > len(tiff):
                            break
                        tag, typ = struct.unpack(endian + "HH", tiff[off : off + 4])
                        if tag == 0x0112 and typ == 3:  # SHORT orientation
                            (orient,) = struct.unpack(
                                endian + "H", tiff[off + 8 : off + 10]
                            )
                            break
        pos += 2 + seg_len
    if w is None:
        raise ValueError("no SOF frame header found (truncated JPEG?)")
    return int(w), int(h), int(orient) if 1 <= orient <= 8 else 1


def decode_media_meta(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """Parse the typed metadata out of the binary container header.
    Output: (id, media_type, width, height, n_frames, sample_rate, n_bytes).
    This is the real executor-side byte path; only the *codec* (pixel/PCM
    decode) is stubbed — see :func:`decode_image`.

    Besides the synthetic VSSM container, real JPEG payloads (the dominant
    format in crawled corpora) are recognized by signature and parsed
    header-only via :func:`parse_jpeg_header`: width/height come from the
    SOF marker, and EXIF orientations 5-8 (90°-rotated display) swap them
    so downstream filters see display dimensions."""
    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = {k: [] for k in (id_col, "media_type", "width", "height", "n_frames", "sample_rate", "n_bytes")}
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                if bytes(blob[:2]) == b"\xff\xd8":
                    w, h, orient = parse_jpeg_header(blob)
                    if orient >= 5:
                        w, h = h, w
                    kind, nf, sr = "image", 1, 0
                elif bytes(blob[:6]) in (b"GIF87a", b"GIF89a"):
                    from .gif import parse_gif_header

                    w, h, nf = parse_gif_header(blob)
                    kind, sr = "image", 0
                elif bytes(blob[:4]) == b"RIFF" and bytes(blob[8:12]) == b"AVI ":
                    from .video import parse_avi_header

                    w, h, nf, fps = parse_avi_header(blob)
                    kind, sr = "video", 0
                else:
                    kind, w, h, nf, sr, _ = _unpack_header(blob)
                rows[id_col].append(i)
                rows["media_type"].append(kind)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(nf)
                rows["sample_rate"].append(sr)
                rows["n_bytes"].append(len(blob))
            yield pd.DataFrame(rows)

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_t}, media_type string, width int, height int, "
            "n_frames int, sample_rate bigint, n_bytes bigint"
        ),
    )


# ---------------------------------------------------------------------------
# Real codecs (pure numpy — no external libraries):
#   images: BMP (24/32-bit uncompressed BI_RGB, top-down or bottom-up) and
#           binary PPM (P6); audio: RIFF/WAVE PCM (8/16/32-bit).
#   8-bit PNG (stdlib zlib inflate + the five scanline filters) decodes
#   and encodes natively too. Lossy formats (JPEG/WEBP/MP3/MP4) genuinely
# require codec libraries this container does not ship — those fall
# through to PIL if present, else a clearly-marked NotImplementedError.
# Encoders for the supported formats are provided so round-trip
# correctness is testable end-to-end.
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit bottom-up BI_RGB BMP bytes."""
    h, w, c = pixels.shape
    assert c == 3, "encode_bmp wants (h, w, 3) RGB"
    row_size = (w * 3 + 3) // 4 * 4
    img = np.zeros((h, row_size), dtype=np.uint8)
    bgr = pixels[::-1, :, ::-1]  # bottom-up rows, BGR channel order
    img[:, : w * 3] = bgr.reshape(h, w * 3)
    data = img.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + data


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.tobytes()


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 PCM -> RIFF/WAVE bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    data = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * n_ch * 2, n_ch * 2, 16
    )
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def _decode_bmp(b: bytes) -> np.ndarray:
    if b[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", b, 10)[0]
    hdr_size = struct.unpack_from("<I", b, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if comp != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    nb = bpp // 8
    row_size = (w * nb + 3) // 4 * 4
    raw = np.frombuffer(b, dtype=np.uint8, count=row_size * h, offset=data_off)
    rows = raw.reshape(h, row_size)[:, : w * nb].reshape(h, w, nb)
    if not top_down:
        rows = rows[::-1]
    return np.ascontiguousarray(rows[:, :, 2::-1])  # BGR(A) -> RGB


def _decode_ppm(b: bytes) -> np.ndarray:
    if b[:2] != b"P6":
        raise ValueError("not a binary PPM")
    # header tokens: P6, width, height, maxval — whitespace/comment separated
    vals, i, n = [], 2, len(b)
    while len(vals) < 3 and i < n:
        while i < n and b[i : i + 1].isspace():
            i += 1
        if b[i : i + 1] == b"#":
            while i < n and b[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not b[j : j + 1].isspace():
            j += 1
        vals.append(int(b[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    w, h, maxv = vals
    if maxv != 255:
        raise NotImplementedError("16-bit PPM not supported")
    return np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)


def _decode_image_bytes(b: bytes) -> np.ndarray:
    b = bytes(b)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:2] == b"P6":
        return _decode_ppm(b)
    if b[:8] == _PNG_SIG:
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        # baseline AND progressive JPEG decode natively (round 9,
        # :mod:`.jpeg`); arithmetic/12-bit raise NotImplementedError inside
        from .jpeg import decode_jpeg

        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        # first composited frame; use gif_frames for the full animation
        from .gif import decode_gif

        return decode_gif(b)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        # first MJPEG frame; use operators.video.avi_frames for the sequence
        from .video import decode_avi_frames_np

        frames = decode_avi_frames_np(b)
        if not frames:
            raise ValueError("AVI contains no video frames")
        return frames[0]
    if b[:4] == MAGIC:
        raise ValueError(
            "VSSM synthetic container holds no pixels; use decode_media_meta"
        )
    try:
        import io

        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(b)).convert("RGB"))
    except ImportError:
        raise NotImplementedError(
            "lossy/esoteric image formats (WEBP/AVIF/...) require PIL/OpenCV, "
            "not present in this environment; BMP, binary PPM, 8-bit PNG and "
            "baseline JPEG decode natively"
        )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


# Adam7 interlace pass geometry (PNG spec §8.2):
# (starting row, starting col, row increment, col increment)
_ADAM7 = (
    (0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
    (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1),
)


def _png_unfilter(raw: bytes, offset: int, w: int, h: int, ch: int) -> tuple[np.ndarray, int]:
    """Un-filter h scanlines of w pixels (ch samples each) starting at
    ``offset``; returns ((h, w*ch) uint8, new offset). Shared by the
    non-interlaced path (one call) and Adam7 (one call per pass)."""
    stride = w * ch
    need = h * (stride + 1)
    if offset + need > len(raw):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        rof = offset + y * (stride + 1)
        f = raw[rof]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=rof + 1).astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:  # up
            cur = (line + prev) & 0xFF
        elif f == 1:  # sub: per-pixel cumulative sum in steps of bpp
            px = line.reshape(w, ch)
            cur = (px.cumsum(axis=0, dtype=np.int64) & 0xFF).astype(np.int32).reshape(-1)
        else:  # average (3) / paeth (4): sequential per pixel along the row
            cur = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                up = prev[i]
                if f == 3:
                    cur[i] = (line[i] + ((a + up) >> 1)) & 0xFF
                elif f == 4:
                    c = prev[i - ch] if i >= ch else 0
                    cur[i] = (line[i] + _paeth(int(a), int(up), int(c))) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out, offset + need


def _decode_png(b: bytes) -> np.ndarray:
    """Native PNG decode — pure numpy + stdlib zlib, no codec library:
    8-bit depth, color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha),
    6 (RGBA), all five scanline filters (PNG spec §9/§13), non-interlaced
    AND Adam7 interlaced (seven sub-image passes, each independently
    filtered). Palette and gray expand to RGB; alpha is preserved as a
    4th channel."""
    import zlib

    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        typ = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise NotImplementedError(f"PNG depth={depth}/compression={comp} not supported (8-bit only)")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    if ctype not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype} not supported")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        out, end = _png_unfilter(raw, 0, w, h, ch)
        if end != len(raw):
            raise ValueError("PNG IDAT length mismatch")
    else:
        out = np.zeros((h, w * ch), dtype=np.uint8)
        off = 0
        for y0, x0, dy, dx in _ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            sub, off = _png_unfilter(raw, off, pw, ph, ch)
            grid = out.reshape(h, w, ch)
            grid[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
        if off != len(raw):
            raise ValueError("PNG IDAT length mismatch")
    px = out.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[px[:, :, 0]]
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:  # gray+alpha -> RGBA
        g, a = px[:, :, 0:1], px[:, :, 1:2]
        return np.concatenate([g, g, g, a], axis=2)
    return px  # 2 (RGB) / 6 (RGBA)


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Encode HxWx{1,3,4} uint8 pixels as a valid 8-bit PNG (filter 0
    scanlines, one zlib IDAT; ``interlace=True`` writes the seven Adam7
    sub-image passes) — stdlib-only, the write-side twin of
    :func:`_decode_png` so round trips are testable without PIL."""
    import zlib

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 3: 2, 4: 6}.get(ch)
    if ctype is None:
        raise ValueError(f"encode_png supports 1/3/4 channels, got {ch}")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1 if interlace else 0)
    if not interlace:
        scan = np.concatenate(
            [np.zeros((h, 1), np.uint8), arr.reshape(h, w * ch)], axis=1
        ).tobytes()
    else:
        parts = []
        for y0, x0, dy, dx in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            ph, pw = sub.shape[:2]
            parts.append(
                np.concatenate(
                    [np.zeros((ph, 1), np.uint8), sub.reshape(ph, pw * ch)], axis=1
                ).tobytes()
            )
        scan = b"".join(parts)
    idat = zlib.compress(scan, 6)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def decode_image(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """Decode image bytes to pixels — REAL for uncompressed formats (24/32-bit
    BI_RGB BMP, binary PPM), via PIL for compressed formats when available,
    ``NotImplementedError`` otherwise (this container ships no codec libs).

    Output: (id, width int, height int, channels int, pixels ARRAY<FLOAT>)
    — row-major RGB, raw 0-255 values (exact in float32). Arrow-batched
    ``mapInPandas``; bytes never leave the executor."""
    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, ws, hs, cs, px = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                arr = _decode_image_bytes(blob)
                h, w, c = arr.shape
                ids.append(i)
                ws.append(w)
                hs.append(h)
                cs.append(c)
                px.append(arr.reshape(-1).astype(np.float32))
            yield pd.DataFrame(
                {id_col: ids, "width": ws, "height": hs, "channels": cs, "pixels": px}
            )

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen,
        schema=f"{id_col} {id_t}, width int, height int, channels int, pixels array<float>",
    )


def decode_audio(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """Decode RIFF/WAVE PCM bytes (8/16/32-bit) to samples — real, pure
    numpy. Output: (id, sample_rate bigint, n_channels int, n_samples
    bigint, samples ARRAY<FLOAT>) — interleaved, normalized to [-1, 1)."""
    id_t = dict(df.dtypes)[id_col]

    def one(b: bytes):
        b = bytes(b)
        if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
            raise ValueError("not a RIFF/WAVE blob")
        i, n = 12, len(b)
        fmt = data = None
        while i + 8 <= n:
            cid = b[i : i + 4]
            size = struct.unpack_from("<I", b, i + 4)[0]
            body = b[i + 8 : i + 8 + size]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            i += 8 + size + (size & 1)
        if fmt is None or data is None:
            raise ValueError("WAV missing fmt/data chunk")
        audio_fmt, n_ch, sr, _, _, bits = fmt
        if audio_fmt != 1:
            raise NotImplementedError(f"non-PCM WAV (format {audio_fmt})")
        if bits == 16:
            s = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 8:
            s = (np.frombuffer(data, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 32:
            s = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        else:
            raise NotImplementedError(f"unsupported PCM width {bits}")
        return sr, n_ch, len(s) // max(1, n_ch), s

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, srs, chs, ns, smp = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                sr, ch, nsamp, s = one(blob)
                ids.append(i)
                srs.append(sr)
                chs.append(ch)
                ns.append(nsamp)
                smp.append(s)
            yield pd.DataFrame(
                {id_col: ids, "sample_rate": srs, "n_channels": chs, "n_samples": ns, "samples": smp}
            )

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_t}, sample_rate bigint, n_channels int, "
            "n_samples bigint, samples array<float>"
        ),
    )


@lru_cache(maxsize=256)
def _bilinear_grid(h: int, w: int, nh: int, nw: int) -> tuple:
    """Index/weight arrays for an align-corners=False bilinear resample,
    cached per (in, out) geometry: a corpus pass resizes millions of
    images through a handful of geometries, and the grid arithmetic was
    ~half of every `_resize_kernel` call."""
    fy = (np.arange(nh) + 0.5) * h / nh - 0.5
    fx = (np.arange(nw) + 0.5) * w / nw - 0.5
    y0 = np.clip(np.floor(fy).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(fx).astype(np.int64), 0, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = np.clip(fy - y0, 0.0, 1.0)[:, None, None]
    wx = np.clip(fx - x0, 0.0, 1.0)[None, :, None]
    return y0[:, None], y1[:, None], x0[None, :], x1[None, :], wy, wx, 1 - wy, 1 - wx


def _resize_kernel(arr: np.ndarray, nw: int, nh: int, method: str) -> np.ndarray:
    h, w, c = arr.shape
    if method == "nearest":
        yi = np.minimum((np.arange(nh) * h) // nh, h - 1)
        xi = np.minimum((np.arange(nw) * w) // nw, w - 1)
        return arr[yi[:, None], xi[None, :], :]
    if method != "bilinear":
        raise ValueError(f"unknown resize method: {method!r}")
    # align-corners=False bilinear (the torchvision/OpenCV convention)
    y0, y1, x0, x1, wy, wx, iwy, iwx = _bilinear_grid(h, w, nh, nw)
    a = arr.astype(np.float64)
    top = a[y0, x0, :] * iwx + a[y0, x1, :] * wx
    bot = a[y1, x0, :] * iwx + a[y1, x1, :] * wx
    return top * iwy + bot * wy


def resize_image(
    df: DataFrame,
    id_col: str,
    new_width: int,
    new_height: int,
    content_col: str = "content",
    method: str = "bilinear",
) -> DataFrame:
    """Real image resize: decode (BMP/PPM, see :func:`decode_image`), resample
    with a numpy bilinear (align-corners=False, the torchvision/OpenCV
    convention) or nearest kernel, emit pixels. Output: (id, width, height,
    channels, pixels ARRAY<FLOAT>). Map-only; one vectorized kernel per
    image, no per-pixel Python."""
    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, px = [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                arr = _decode_image_bytes(blob)
                out = _resize_kernel(arr, new_width, new_height, method)
                ids.append(i)
                px.append(out.reshape(-1).astype(np.float32))
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": [new_width] * len(ids),
                    "height": [new_height] * len(ids),
                    "channels": [3] * len(ids),
                    "pixels": px,
                }
            )

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen,
        schema=f"{id_col} {id_t}, width int, height int, channels int, pixels array<float>",
    )


def byte_histogram_features(df: DataFrame, id_col: str, content_col: str = "content", skip_header: bool = True) -> DataFrame:
    """Codec-free feature extraction: L1-normalized 256-bin byte histogram
    of the payload — a real, deterministic embedding usable by every vector
    operator (topk / knn_join / embedding near-dup). Output:
    (id, features array<float>). numpy ``bincount`` per Arrow batch."""
    id_t = dict(df.dtypes)[id_col]
    off = HEADER_LEN if skip_header else 0

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for blob in pdf[content_col]:
                arr = np.frombuffer(bytes(blob[off:]), dtype=np.uint8)
                hist = np.bincount(arr, minlength=256).astype(np.float64)
                total = hist.sum()
                feats.append((hist / total if total > 0 else hist).astype(np.float32))
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen, schema=f"{id_col} {id_t}, features array<float>"
    )


def frame_sample(df: DataFrame, id_col: str, content_col: str = "content", every_nth: int = 2) -> DataFrame:
    """Deterministic frame sampling for video blobs: the payload divides
    into ``n_frames`` equal byte slices ("frames"); emit every nth frame as
    its own row. Output: (id, frame_idx int, frame binary) — one input row
    explodes into ceil(n_frames / every_nth) output rows."""
    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, frames = [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                _, _, _, nf, _, _ = _unpack_header(blob)
                payload = bytes(blob[HEADER_LEN:])
                if nf <= 0:
                    continue
                flen = max(1, len(payload) // nf)
                for fi in range(0, nf, every_nth):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(payload[fi * flen : (fi + 1) * flen])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen, schema=f"{id_col} {id_t}, frame_idx int, frame binary"
    )


def gif_frames(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    every_nth: int = 1,
) -> DataFrame:
    """Real animated-frame sampling: decode a GIF column's frames
    (composited the way a viewer renders them — disposal/transparency
    applied), keep every nth, and emit one row per kept frame with raw
    pixels. Output: (id, frame_idx int, delay_cs int, width int,
    height int, pixels ARRAY<FLOAT>) — same pixel contract as
    :func:`decode_image`, so each frame feeds resize/transcode/feature
    ops directly. Map-only explode; frame bytes never leave the
    executor."""
    from .gif import decode_gif_frames_np

    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, delays, ws, hs, px = [], [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                for fi, (arr, delay) in enumerate(decode_gif_frames_np(blob)):
                    if fi % every_nth:
                        continue
                    h, w = arr.shape[:2]
                    ids.append(i)
                    idxs.append(fi)
                    delays.append(delay)
                    ws.append(w)
                    hs.append(h)
                    px.append(arr.reshape(-1).astype(np.float32))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "delay_cs": delays,
                 "width": ws, "height": hs, "pixels": px}
            )

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_t}, frame_idx int, delay_cs int, width int, "
            "height int, pixels array<float>"
        ),
    )


def video_frames(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    every_nth: int = 1,
    on_error: str = "flag",
) -> DataFrame:
    """Format-dispatching video frame decode: explode a MIXED video
    column — animated GIFs (LZW) and MJPEG-AVIs (RIFF container + JPEG
    frames), detected per blob by magic bytes — into the shared decoded-
    frame contract ``(id, frame_idx, width, height, pixels)``, keeping
    every ``every_nth`` frame. The one entry point a mixed crawl needs
    before :func:`~.image.frame_phash` /
    :func:`~duckdb_vss_spark.pipelines.video_curate`.

    ``on_error='flag'`` emits undecodable CLIPS as a single row with
    ``frame_idx = -1`` and NULL pixels (flag-don't-drop: the corrupt
    clip stays in the ledger; frame consumers filter
    ``frame_idx >= 0``); ``'raise'`` propagates. Fanned map-only."""
    if on_error not in ("flag", "raise"):
        raise ValueError("on_error must be 'flag' or 'raise'")
    if every_nth < 1:
        # validate driver-side: inside the per-clip try this would read as
        # a decode failure and quarantine EVERY clip under 'flag' (ADVICE r10)
        raise ValueError("every_nth must be >= 1")
    from .gif import decode_gif_frames_np
    from .video import decode_avi_frames_np

    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, ws, hs, px = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    head = bytes(blob[:12])
                    if head[:6] in (b"GIF87a", b"GIF89a"):
                        frames = [a for a, _delay in decode_gif_frames_np(blob)]
                    elif head[:4] == b"RIFF" and head[8:12] == b"AVI ":
                        frames = list(decode_avi_frames_np(blob))
                    else:
                        raise NotImplementedError(
                            f"not a supported video container (magic {head[:4]!r})"
                        )
                    if not frames:
                        raise ValueError("video decoded to zero frames")
                    for fi, arr in enumerate(frames):
                        if fi % every_nth:
                            continue
                        h, w = arr.shape[:2]
                        ids.append(i); idxs.append(fi)
                        ws.append(w); hs.append(h)
                        px.append(arr.reshape(-1).astype(np.float32))
                except Exception:  # noqa: BLE001 - per-clip quarantine
                    if on_error == "raise":
                        raise
                    ids.append(i); idxs.append(-1)
                    ws.append(None); hs.append(None); px.append(None)
            yield pd.DataFrame({
                id_col: ids, "frame_idx": idxs,
                "width": pd.array(ws, dtype="Int32"),
                "height": pd.array(hs, dtype="Int32"),
                "pixels": px,
            })

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_t}, frame_idx int, width int, height int, "
            "pixels array<float>"
        ),
    )


def resize_media(df: DataFrame, id_col: str, new_width: int, new_height: int, content_col: str = "content") -> DataFrame:
    """Deterministic "resize" on the synthetic format: rewrite header
    dimensions and stride-subsample the payload to scale byte count with
    area ratio (a real resize kernel slots in here once codecs exist).
    Output: (id, content binary) with updated header."""
    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, blobs = [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                kind, w, h, nf, sr, _ = _unpack_header(blob)
                payload = bytes(blob[HEADER_LEN:])
                if w * h > 0 and len(payload) > 0:
                    ratio = (new_width * new_height) / float(w * h)
                    keep = max(1, int(len(payload) * min(1.0, ratio)))
                    stride = max(1, len(payload) // keep)
                    payload = payload[::stride][:keep]
                ids.append(i)
                blobs.append(pack_header(kind, new_width, new_height, nf, sr) + payload)
            yield pd.DataFrame({id_col: ids, "content": blobs})

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen, schema=f"{id_col} {id_t}, content binary"
    )


def transcode_images(
    df: DataFrame,
    id_col: str,
    new_width: int,
    new_height: int,
    content_col: str = "content",
    quality: int = 75,
    method: str = "bilinear",
    on_error: str = "flag",
) -> DataFrame:
    """The multimodal curation pipeline's thumbnailing stage, end-to-end
    engine-side (round 9, enabled by the native baseline JPEG codec):
    decode any natively supported format (BMP / PPM / PNG / baseline
    JPEG), resample with :func:`_resize_kernel`, and re-encode as a
    baseline JPEG at ``quality`` — bytes in, bytes out, so the output
    column feeds a parquet sink or a downstream feature extractor
    directly.

    Output: ``(id, content BINARY, width, height, ok BOOLEAN, err
    STRING)``. ``on_error='flag'`` (default) keeps undecodable rows with
    ``ok=false`` and the error text (flag-don't-drop, same cohort
    discipline as the text recipes — a corrupt image must not silently
    vanish from the corpus ledger); ``on_error='raise'`` propagates.

    Scale shape: map-only (one ``mapInPandas`` pass, no shuffle, no
    driver collect); each image is one vectorized decode/resize/encode,
    so throughput scales with executors and the output bytes are a
    deterministic function of the input bytes.
    """
    if on_error not in ("flag", "raise"):
        raise ValueError("on_error must be 'flag' or 'raise'")
    from .jpeg import encode_jpeg

    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, blobs, oks, errs = [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    arr = _decode_image_bytes(blob)
                    out = _resize_kernel(arr, new_width, new_height, method)
                    enc = encode_jpeg(
                        np.clip(np.rint(out), 0, 255).astype(np.uint8), quality=quality
                    )
                    ids.append(i); blobs.append(enc); oks.append(True); errs.append(None)
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    if on_error == "raise":
                        raise
                    ids.append(i); blobs.append(None); oks.append(False)
                    errs.append(f"{type(e).__name__}: {e}"[:200])
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "content": blobs,
                    "width": [new_width] * len(ids),
                    "height": [new_height] * len(ids),
                    "ok": oks,
                    "err": errs,
                }
            )

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_t}, content binary, width int, height int, "
            "ok boolean, err string"
        ),
    )

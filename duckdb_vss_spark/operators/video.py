"""Motion-JPEG AVI container codec (pure python + the :mod:`.jpeg`
codec) — a REAL video format for the multimodal frame ops.

The engine cannot ship H.264/VP9 decoders (no codec libraries in this
container, and they are far outside pure-numpy territory), but
Motion-JPEG in an AVI RIFF container is a genuine, widely produced
format (cameras, microscopy, CCTV, dataset dumps) whose frames are plain
baseline JPEGs — which :mod:`.jpeg` decodes natively. That makes the
whole video path real end-to-end: container parse -> per-frame JPEG
entropy decode -> pixel tensors, with an encoder so round trips are
testable without fixtures.

Format: AVI RIFF (Microsoft "AVI RIFF File Reference"): ``RIFF('AVI '
LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi' 00dc...) idx1)``.
Decode accepts ``00dc``/``00db`` video chunks, skips everything else,
and tolerates a missing ``idx1`` (streaming writers omit it).

Scale shape: identical to the image ops — ``mapInPandas`` over Arrow
batches, bytes never leave the executor, frame explosion is the only
row-count change.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .jpeg import decode_jpeg, encode_jpeg

__all__ = [
    "encode_avi_mjpeg",
    "parse_avi_header",
    "decode_avi_frames_np",
    "avi_frames",
]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(kind: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray] | np.ndarray,
    fps: int = 25,
    quality: int = 75,
) -> bytes:
    """Encode RGB frames (HxWx3 uint8, same size) as a Motion-JPEG AVI:
    each frame is a real baseline JPEG in a ``00dc`` chunk, with the
    standard ``hdrl`` headers and an ``idx1`` keyframe index."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share the same HxWx3 shape")
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    max_sz = max(len(j) for j in jpegs)

    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # usec per frame
        max_sz * fps,      # max bytes/sec (advisory)
        0,                 # padding granularity
        0x10,              # AVIF_HASINDEX
        len(frames), 0, 1, max_sz, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<10I", 0, 0, 0, 1, fps, 0, len(frames), max_sz, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack("<I2i2H", 40, w, h, 1, 24) + b"MJPG" + struct.pack(
        "<I2i2I", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_payload = b""
    idx = b""
    for j in jpegs:
        # idx1 offsets are relative to the start of the 'movi' list data
        # (i.e. the fourcc), per the common convention
        idx += b"00dc" + struct.pack("<3I", 0x10, 4 + len(movi_payload), len(j))
        movi_payload += _chunk(b"00dc", j)
    movi = _list(b"movi", movi_payload)
    body = b"AVI " + hdrl + movi + _chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _iter_riff(b: bytes, pos: int, end: int):
    while pos + 8 <= end:
        fourcc = b[pos : pos + 4]
        (size,) = struct.unpack_from("<I", b, pos + 4)
        payload_start = pos + 8
        yield fourcc, payload_start, size
        pos = payload_start + size + (size & 1)


def parse_avi_header(b: bytes) -> tuple[int, int, int, int]:
    """Header-only metadata: ``(width, height, n_frames, fps)`` from the
    ``avih`` chunk — no frame decode, the meta-only scan path."""
    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' signature missing)")
    for fourcc, start, size in _iter_riff(b, 12, len(b)):
        if fourcc == b"LIST" and b[start : start + 4] == b"hdrl":
            for f2, s2, z2 in _iter_riff(b, start + 4, start + size):
                if f2 == b"avih":
                    vals = struct.unpack_from("<14I", b, s2)
                    usec, n_frames, w, h = vals[0], vals[4], vals[8], vals[9]
                    fps = round(1_000_000 / usec) if usec else 0
                    return w, h, n_frames, fps
    raise ValueError("AVI has no avih header")


def decode_avi_frames_np(b: bytes) -> list[np.ndarray]:
    """Decode every Motion-JPEG frame (``00dc``/``00db`` chunks) to HxWx3
    uint8 arrays via the native JPEG decoder."""
    b = bytes(b)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ' signature missing)")
    frames: list[np.ndarray] = []
    for fourcc, start, size in _iter_riff(b, 12, len(b)):
        if fourcc == b"LIST" and b[start : start + 4] == b"movi":
            for f2, s2, z2 in _iter_riff(b, start + 4, start + size):
                if f2 in (b"00dc", b"00db") and z2 > 0:
                    frames.append(decode_jpeg(b[s2 : s2 + z2]))
    return frames


def avi_frames(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    every_nth: int = 1,
) -> DataFrame:
    """Real video frame sampling: explode an MJPEG-AVI column into one row
    per kept frame with raw pixels — the same output contract as
    :func:`.multimodal.gif_frames` (minus delay), so frames feed
    resize/transcode/feature ops directly. Map-only; bytes never leave
    the executor."""
    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, ws, hs, px = [], [], [], [], []
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                for fi, arr in enumerate(decode_avi_frames_np(blob)):
                    if fi % every_nth:
                        continue
                    h, w = arr.shape[:2]
                    ids.append(i)
                    idxs.append(fi)
                    ws.append(w)
                    hs.append(h)
                    px.append(arr.reshape(-1).astype(np.float32))
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "width": ws, "height": hs, "pixels": px}
            )

    from .dedup import _fan_out

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen,
        schema=f"{id_col} {id_t}, frame_idx int, width int, height int, pixels array<float>",
    )

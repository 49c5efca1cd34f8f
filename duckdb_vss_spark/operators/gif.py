"""Pure-python GIF codec (GIF87a/GIF89a) for the multimodal column
surface — no codec libraries, like the BMP/PPM/PNG/WAV/JPEG codecs in
:mod:`.multimodal` / :mod:`.jpeg`.

GIF is the third real compressed format in crawled corpora (after JPEG
and PNG) and the only ubiquitous *animated* one, which makes it the
natural carrier for the frame-sampling ops: an animated GIF decodes to a
frame sequence that feeds resize / transcode / frame-sample per frame.

Supported on decode: GIF87a + GIF89a, global and local color tables,
interlaced images, LZW with variable code width (9-12 bits, deferred
clear), Graphic Control Extensions (frame delay, transparency index,
disposal methods 0/1 "leave" and 2 "restore to background"), multiple
frames composited onto the logical screen the way a viewer renders them.
Disposal 3 ("restore to previous") raises — it is rare and a decoder
that silently mis-composites is worse than one that refuses.

Supported on encode: one or more RGB frames sharing a single global
palette (<= 256 distinct colors across all frames — synthetic and
screenshot-class content; photographic content should be JPEG), optional
per-frame delay, optional interlacing. Round trips are pixel-exact,
which is what the tests pin.

Format spec: GIF89a specification (CompuServe, 1990) — public document.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_gif", "decode_gif", "decode_gif_frames_np", "parse_gif_header"]

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


# ---------------------------------------------------------------- LZW ------


def _lzw_compress(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width starting at min_code_size+1,
    LSB-first bit packing, clear/end codes, dictionary reset at 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh_dict() -> dict:
        return {(i,): i for i in range(clear)}

    table = fresh_dict()
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    seq: tuple = ()
    for v in indices.tolist():
        cand = seq + (v,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = fresh_dict()
            next_code = end + 1
            width = min_code_size + 1
        seq = (v,)
    if seq:
        emit(table[seq], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decompress(data: bytes, min_code_size: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    width = min_code_size + 1
    base = {i: (i,) for i in range(clear)}
    table = dict(base)
    next_code = end + 1
    out: list = []
    prev: tuple | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return np.asarray(out, dtype=np.int32)  # truncated stream: best effort
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = dict(base)
            next_code = end + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            return np.asarray(out, dtype=np.int32)
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"corrupt LZW stream: code {code} > next {next_code}")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
            next_code += 1
            # width grows when the NEXT code would not fit; at 12 bits the
            # encoder must emit a clear ("deferred clear" streams just stop
            # growing the table)
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry


# ------------------------------------------------------------- encode ------


def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, dict]:
    colors: dict = {}
    for fr in frames:
        for c in {tuple(px) for px in fr.reshape(-1, 3).tolist()}:
            colors.setdefault(c, len(colors))
    if len(colors) > 256:
        raise ValueError(
            f"GIF needs <= 256 distinct colors across frames, got {len(colors)}; "
            "quantize first or use JPEG/PNG"
        )
    pal = np.zeros((256, 3), dtype=np.uint8)
    for c, i in colors.items():
        pal[i] = c
    return pal, colors


def _interlace_order(h: int) -> list[int]:
    order: list[int] = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


def encode_gif(
    frames: np.ndarray | list[np.ndarray],
    delays_cs: list[int] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode RGB frame(s) (HxWx3 uint8, all same size, <= 256 distinct
    colors total) as GIF89a with a global color table. ``delays_cs`` are
    per-frame delays in centiseconds (animated GIFs); a single frame with
    no delay writes no Graphic Control Extension."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share the same HxWx3 shape")
    if delays_cs is not None and len(delays_cs) != len(frames):
        raise ValueError(
            f"delays_cs has {len(delays_cs)} entries for {len(frames)} frames; "
            "provide exactly one centisecond delay per frame"
        )
    pal, colors = _build_palette(frames)
    n_colors = max(2, len(colors))
    pal_bits = max(1, (n_colors - 1).bit_length())
    table_size = 1 << pal_bits
    out = bytearray(b"GIF89a")
    # logical screen descriptor: GCT present, pal_bits colors
    out += struct.pack("<HHBBB", w, h, 0x80 | ((pal_bits - 1) << 4) | (pal_bits - 1), 0, 0)
    out += pal[:table_size].tobytes()
    mcs = max(2, pal_bits)
    for fi, fr in enumerate(frames):
        if delays_cs is not None:
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, 0x04, delays_cs[fi], 0, 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0)
        idx = np.asarray(
            [colors[tuple(px)] for px in fr.reshape(-1, 3).tolist()], dtype=np.int32
        ).reshape(h, w)
        if interlace:
            idx = idx[_interlace_order(h)]
        out.append(mcs)
        comp = _lzw_compress(idx.reshape(-1), mcs)
        for i in range(0, len(comp), 255):
            chunk = comp[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


# ------------------------------------------------------------- decode ------


def _read_subblocks(b: bytes, pos: int) -> tuple[bytes, int]:
    parts = []
    while True:
        size = b[pos]
        pos += 1
        if size == 0:
            return b"".join(parts), pos
        parts.append(b[pos : pos + size])
        pos += size


def parse_gif_header(b: bytes) -> tuple[int, int, int]:
    """Header-only metadata: (width, height, n_frames) without decoding
    pixel data — image-descriptor blocks are counted and their LZW
    sub-blocks skipped by length. The GIF analog of
    :func:`.multimodal.parse_jpeg_header`."""
    b = bytes(b)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, _, _ = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    if flags & 0x80:
        pos += 3 * (2 << (flags & 0x07))
    n_frames = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            _, pos = _read_subblocks(b, pos)
        elif block == 0x2C:
            _, _, _, _, iflags = struct.unpack_from("<HHHHB", b, pos)
            pos += 9
            if iflags & 0x80:
                pos += 3 * (2 << (iflags & 0x07))
            pos += 1  # LZW min code size
            _, pos = _read_subblocks(b, pos)
            n_frames += 1
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    return w, h, n_frames


def decode_gif_frames_np(b: bytes) -> list[tuple[np.ndarray, int]]:
    """Decode every frame, composited onto the logical screen exactly as a
    viewer renders them. Returns ``[(HxWx3 uint8, delay_cs), ...]``."""
    b = bytes(b)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h, flags, bg_idx, _ = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        size = 2 << (flags & 0x07)
        gct = np.frombuffer(b, dtype=np.uint8, count=3 * size, offset=pos).reshape(size, 3)
        pos += 3 * size
    if gct is not None:
        background = np.broadcast_to(gct[bg_idx], (h, w, 3)).copy()
    else:
        background = np.zeros((h, w, 3), dtype=np.uint8)
    canvas = background.copy()
    frames: list[tuple[np.ndarray, int]] = []
    delay = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(b):
        block = b[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            label = b[pos]
            pos += 1
            data, pos = _read_subblocks(b, pos)
            if label == 0xF9 and len(data) >= 4:
                gflags, delay = struct.unpack_from("<BH", data, 0)
                disposal = (gflags >> 2) & 0x07
                transparent = data[3] if gflags & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, iflags = struct.unpack_from("<HHHHB", b, pos)
        pos += 9
        pal = gct
        if iflags & 0x80:
            size = 2 << (iflags & 0x07)
            pal = np.frombuffer(b, dtype=np.uint8, count=3 * size, offset=pos).reshape(size, 3)
            pos += 3 * size
        if pal is None:
            raise ValueError("GIF image with no color table")
        mcs = b[pos]
        pos += 1
        data, pos = _read_subblocks(b, pos)
        idx = _lzw_decompress(data, mcs)
        if len(idx) < fw * fh:
            raise ValueError("GIF frame pixel data truncated")
        idx = idx[: fw * fh].reshape(fh, fw)
        if iflags & 0x40:
            de = np.empty_like(idx)
            de[_interlace_order(fh)] = idx
            idx = de
        region = canvas[top : top + fh, left : left + fw]
        px = pal[np.clip(idx, 0, len(pal) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[..., None]
            px = np.where(mask, px, region)
        canvas[top : top + fh, left : left + fw] = px
        frames.append((canvas.copy(), delay))
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = background[
                top : top + fh, left : left + fw
            ]
        elif disposal == 3:
            raise NotImplementedError(
                "GIF disposal method 3 (restore to previous) is not supported"
            )
        delay = 0
        transparent = None
        disposal = 0
    return frames


def decode_gif(b: bytes) -> np.ndarray:
    """First composited frame as HxWx3 uint8 — the :func:`.multimodal.
    decode_image` contract for animated inputs (a thumbnail pipeline wants
    frame 0; use :func:`decode_gif_frames_np` / the ``gif_frames``
    operator for the full sequence)."""
    frames = decode_gif_frames_np(b)
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames[0][0]

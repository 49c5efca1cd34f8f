"""Multimodal (image/audio/video) columns for training-data pipelines
(north-star surface; the reference engine is text/vector-only).

Model: media is an opaque ``binary`` column plus typed metadata columns —
the schema, partitioning, Arrow batch shape, and UDF signatures here are
the real 100 TB-scale plumbing. Real codec decoding (JPEG/PNG/WAV/MP4)
needs libraries this container doesn't ship, so the *codec* step is stubbed
(clearly marked ``NotImplementedError``) behind a deterministic synthetic
format that exercises the same byte-level round trip:

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
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_KINDS",
    "pack_header",
    "synthesize_media",
    "decode_media_meta",
    "decode_image",
    "byte_histogram_features",
    "frame_sample",
    "resize_media",
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


def decode_media_meta(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """Parse the typed metadata out of the binary container header.
    Output: (id, media_type, width, height, n_frames, sample_rate, n_bytes).
    This is the real executor-side byte path; only the *codec* (pixel/PCM
    decode) is stubbed — see :func:`decode_image`."""
    id_t = dict(df.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            rows = {k: [] for k in (id_col, "media_type", "width", "height", "n_frames", "sample_rate", "n_bytes")}
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                kind, w, h, nf, sr, _ = _unpack_header(blob)
                rows[id_col].append(i)
                rows["media_type"].append(kind)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(nf)
                rows["sample_rate"].append(sr)
                rows["n_bytes"].append(len(blob))
            yield pd.DataFrame(rows)

    return df.select(id_col, content_col).mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_t}, media_type string, width int, height int, "
            "n_frames int, sample_rate bigint, n_bytes bigint"
        ),
    )


def decode_image(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """STUB — real image decoding (JPEG/PNG -> pixel array) requires PIL or
    OpenCV, which this environment does not ship. The Spark-side contract is
    real: input (id, content binary), output (id, pixels array<float>,
    width int, height int) via Arrow-batched mapInPandas."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "decode_image requires a codec library (PIL/OpenCV) not present in "
            "this environment; use decode_media_meta + byte_histogram_features "
            "for codec-free pipelines, or install pillow in production"
        )
    raise NotImplementedError("real codec path not implemented in this build")


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

    return df.select(id_col, content_col).mapInPandas(
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

    return df.select(id_col, content_col).mapInPandas(
        gen, schema=f"{id_col} {id_t}, frame_idx int, frame binary"
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

    return df.select(id_col, content_col).mapInPandas(
        gen, schema=f"{id_col} {id_t}, content binary"
    )

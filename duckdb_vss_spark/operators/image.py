"""Perceptual image hashing and image near-dup detection — the image
analog of the audio fingerprint surface (north-star: LAION-scale image
pipelines dedup across re-encodes, resizes, and format conversions,
where exact byte/pixel dedup finds nothing).

Two standard public hash families (both as implemented by the widely
used ImageHash library and pHash.org, re-derived here from the
published construction, not ported):

- :func:`phash` — DCT perceptual hash: grayscale → bilinear 32x32 →
  2-D orthonormal DCT → top-left 8x8 low-frequency block → bit per
  coefficient vs the block median. Robust to re-encoding, resizing,
  small noise, brightness shifts (median centering).
- :func:`dhash` — difference hash: grayscale → bilinear 9x8 → bit per
  horizontal gradient sign. Cheaper, more sensitive to crops.

Both decode ANY natively supported format first (BMP/PPM/PNG/baseline+
progressive JPEG/GIF/MJPEG-AVI frame 0), so a mixed-format corpus hashes
uniformly — the whole point: the same photo as a PNG and as a q75 JPEG
must collide.

Near-dup matching is :func:`~.dedup.hamming_pairs` — the exact banded
Hamming self-join (pigeonhole over hash chunks), the same machinery as
text SimHash. Compose with
:func:`~duckdb_vss_spark.operators.graph.dedup_clusters` for
one-survivor-per-cluster semantics.

Scale shape: hashing is a fanned map-only Arrow kernel (image bytes
never leave the executor; only one long per image comes out); the match
join moves (band, bucket, id, hash) longs and is exact at any corpus
size. At 100 TB the hash table is ~0.01% of the image bytes.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .multimodal import _decode_image_bytes, _resize_kernel

__all__ = ["phash", "dhash", "phash_kernel", "dhash_kernel", "image_neardup_pairs"]


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal n-point DCT-II matrix (same scaling as the JPEG
    codec's 8-point matrix, generalized)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    c = np.cos((2 * m + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    c[0] *= np.sqrt(0.5)
    return c


_DCT32 = _dct_matrix(32)


def _gray(arr: np.ndarray) -> np.ndarray:
    """Rec.601 luminance (the JPEG codec's Y weights) on float64."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        return a
    if a.shape[2] >= 3:
        return 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    return a[..., 0]


def phash_kernel(arr: np.ndarray) -> int:
    """64-bit DCT perceptual hash of an image array (HxW[x3] uint8):
    bilinear 32x32 grayscale, 2-D DCT, top-left 8x8, bit = coefficient >
    median of those 64 (the ImageHash convention). Deterministic."""
    g = _gray(arr)
    small = _resize_kernel(g[..., None], 32, 32, "bilinear")[..., 0]
    coef = _DCT32 @ small @ _DCT32.T
    low = coef[:8, :8].reshape(-1)
    med = np.median(low)
    bits = (low > med).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum().astype(np.int64))


def dhash_kernel(arr: np.ndarray) -> int:
    """64-bit difference hash: bilinear 9x8 grayscale, bit per horizontal
    gradient sign (px[y, x+1] > px[y, x])."""
    g = _gray(arr)
    small = _resize_kernel(g[..., None], 9, 8, "bilinear")[..., 0]
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1).astype(np.uint64)
    return int((bits << np.arange(64, dtype=np.uint64)).sum().astype(np.int64))


def _hash_op(kernel, out_col):
    def op(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
        from .dedup import _fan_out

        id_t = dict(df.dtypes)[id_col]

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ids, hs = [], []
                for i, blob in zip(pdf[id_col], pdf[content_col]):
                    ids.append(i)
                    hs.append(kernel(_decode_image_bytes(blob)))
                yield pd.DataFrame({id_col: ids, out_col: hs})

        return _fan_out(df.select(id_col, content_col)).mapInPandas(
            gen, schema=f"{id_col} {id_t}, {out_col} long"
        )

    return op


def phash(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """(id, phash LONG) for an image binary column — decodes any natively
    supported format, then :func:`phash_kernel`. Fanned map-only."""
    return _hash_op(phash_kernel, "phash")(df, id_col, content_col)


def dhash(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """(id, dhash LONG) for an image binary column — decodes any natively
    supported format, then :func:`dhash_kernel`. Fanned map-only."""
    return _hash_op(dhash_kernel, "dhash")(df, id_col, content_col)


def image_neardup_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str = "phash",
    max_hamming: int = 10,
    bands: int = 16,
) -> DataFrame:
    """Exact perceptual near-dup pairs over a hash table from
    :func:`phash`/:func:`dhash`: ``(id_a, id_b, hamming)`` with
    ``hamming <= max_hamming`` — the banded Hamming self-join
    (:func:`~.dedup.hamming_pairs`, exact for ``max_hamming < bands``)."""
    from .dedup import hamming_pairs

    return hamming_pairs(hashes, id_col, hash_col, max_hamming, bands)

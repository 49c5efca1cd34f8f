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

__all__ = [
    "phash",
    "dhash",
    "phash_kernel",
    "dhash_kernel",
    "image_quality_stats",
    "hash_transcode_images",
    "frame_phash",
    "fingerprint_videos",
    "video_neardup_pairs",
    "image_neardup_pairs",
]


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal n-point DCT-II matrix (same scaling as the JPEG
    codec's 8-point matrix, generalized)."""
    k = np.arange(n)[:, None]
    m = np.arange(n)[None, :]
    c = np.cos((2 * m + 1) * k * np.pi / (2 * n)) * np.sqrt(2.0 / n)
    c[0] *= np.sqrt(0.5)
    return c


_DCT32 = _dct_matrix(32)
_SHIFTS64 = np.arange(64, dtype=np.uint64)


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
    # median of 64 = mean of the two middle order statistics — same value
    # np.median computes, without its axis/ufunc dispatch overhead
    part = np.partition(low, (31, 32))
    med = (part[31] + part[32]) / 2.0
    bits = (low > med).astype(np.uint64)
    return int((bits << _SHIFTS64).sum().astype(np.int64))


def dhash_kernel(arr: np.ndarray) -> int:
    """64-bit difference hash: bilinear 9x8 grayscale, bit per horizontal
    gradient sign (px[y, x+1] > px[y, x])."""
    g = _gray(arr)
    small = _resize_kernel(g[..., None], 9, 8, "bilinear")[..., 0]
    bits = (small[:, 1:] > small[:, :-1]).reshape(-1).astype(np.uint64)
    return int((bits << _SHIFTS64).sum().astype(np.int64))


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


_STAT_COLS = ("mean_luma", "contrast", "colorfulness", "blur", "entropy")


def _stats_kernel(arr: np.ndarray):
    """(w, h, mean_luma, contrast, colorfulness, blur, entropy) of one
    decoded image array — shared by :func:`image_quality_stats` and the
    fused :func:`hash_transcode_images(with_stats=True)` pass."""
    a = np.asarray(arr, dtype=np.float64)
    if a.ndim == 2:
        a = a[..., None]
    r = a[..., 0]
    g = a[..., 1] if a.shape[2] >= 3 else r
    bch = a[..., 2] if a.shape[2] >= 3 else r
    luma = 0.299 * r + 0.587 * g + 0.114 * bch
    n = luma.size
    mean = float(luma.sum() / n)
    var = float((luma * luma).sum() / n) - mean * mean
    contrast = float(np.sqrt(max(var, 0.0)))
    rg = r - g
    yb = (r + g) / 2.0 - bch
    mrg = float(rg.sum() / n)
    myb = float(yb.sum() / n)
    vrg = float((rg * rg).sum() / n) - mrg * mrg
    vyb = float((yb * yb).sum() / n) - myb * myb
    colorful = float(
        np.sqrt(max(vrg, 0.0) + max(vyb, 0.0))
        + 0.3 * np.sqrt(mrg * mrg + myb * myb)
    )
    h, w = luma.shape
    if h >= 3 and w >= 3:
        lap = (
            4.0 * luma[1:-1, 1:-1]
            - luma[:-2, 1:-1]
            - luma[2:, 1:-1]
            - luma[1:-1, :-2]
            - luma[1:-1, 2:]
        )
        m = lap.size
        lm = float(lap.sum() / m)
        blur = max(float((lap * lap).sum() / m) - lm * lm, 0.0)
    else:
        blur = 0.0
    hist = np.bincount(
        np.clip(np.rint(luma.reshape(-1)), 0, 255).astype(np.int64), minlength=256
    )
    p = hist[hist > 0] / n
    entropy = float(-(p * np.log2(p)).sum())
    return w, h, mean, contrast, colorful, blur, entropy


def image_quality_stats(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    on_error: str = "flag",
) -> DataFrame:
    """Per-image quality signals for curation gates — the LAION-style
    filter set, computed engine-side from decoded pixels (any natively
    supported format), one fanned map-only Arrow pass:

    - ``mean_luma`` — Rec.601 luminance mean (exposure: near-0 = black
      frames, near-255 = blown-out scans).
    - ``contrast`` — population std of luma (flat/blank pages ~0).
    - ``colorfulness`` — Hasler & Süsstrunk 2003:
      ``sqrt(var(rg) + var(yb)) + 0.3 * sqrt(mean(rg)^2 + mean(yb)^2)``
      with ``rg = R - G``, ``yb = (R + G)/2 - B`` (grayscale scans and
      spacer fills score ~0).
    - ``blur`` — variance of the 3x3 Laplacian (``4c - up - down - left
      - right``) over interior luma pixels; the classic
      variance-of-Laplacian sharpness metric — low = defocused/upscaled.
      0 when there is no interior (width or height < 3).
    - ``entropy`` — Shannon entropy (bits) of the 256-bin luma
      histogram; near-0 = synthetic flat fills, high = natural photos.

    All five are doc-local statistics of the pixel tensor: variances via
    exact sum/sum-of-squares in float64 (reproducible closed form — the
    q21 ``iq`` driver leg pins mean/contrast/colorfulness/blur against a
    duckdb recompute from the fixture's pixel formula). Output:
    ``(id, width, height, mean_luma, contrast, colorfulness, blur,
    entropy, ok, err)`` — ``on_error='flag'`` (default) quarantines
    undecodable rows with ``ok=false`` (flag-don't-drop), ``'raise'``
    propagates. Compose with :func:`~duckdb_vss_spark.pipelines.
    image_curate`'s flags for the full gate chain."""
    if on_error not in ("flag", "raise"):
        raise ValueError("on_error must be 'flag' or 'raise'")
    from .dedup import _fan_out

    id_t = dict(df.dtypes)[id_col]

    one = _stats_kernel

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .multimodal import _decode_image_bytes

        for pdf in batches:
            if len(pdf) == 0:
                continue
            cols = {k: [] for k in (
                "id", "w", "h", "ml", "ct", "cf", "bl", "en", "ok", "err")}
            for i, blob in zip(pdf[id_col], pdf[content_col]):
                try:
                    w, h, ml, ct, cf, bl, en = one(_decode_image_bytes(blob))
                    vals = (i, w, h, ml, ct, cf, bl, en, True, None)
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    if on_error == "raise":
                        raise
                    vals = (i, None, None, None, None, None, None, None,
                            False, f"{type(e).__name__}: {e}"[:200])
                for k, v in zip(cols, vals):
                    cols[k].append(v)
            yield pd.DataFrame({
                id_col: cols["id"],
                "width": pd.array(cols["w"], dtype="Int32"),
                "height": pd.array(cols["h"], dtype="Int32"),
                "mean_luma": pd.array(cols["ml"], dtype="float64"),
                "contrast": pd.array(cols["ct"], dtype="float64"),
                "colorfulness": pd.array(cols["cf"], dtype="float64"),
                "blur": pd.array(cols["bl"], dtype="float64"),
                "entropy": pd.array(cols["en"], dtype="float64"),
                "ok": cols["ok"],
                "err": cols["err"],
            })

    return _fan_out(df.select(id_col, content_col)).mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_t}, width int, height int, mean_luma double, "
            "contrast double, colorfulness double, blur double, "
            "entropy double, ok boolean, err string"
        ),
    )


def hash_transcode_images(
    df: DataFrame,
    id_col: str,
    new_width: int,
    new_height: int,
    content_col: str = "content",
    quality: int = 75,
    method: str = "bilinear",
    on_error: str = "flag",
    with_stats: bool = False,
    passthrough: bool = False,
    out_col: str | None = None,
    transcode: bool = True,
) -> DataFrame:
    """Fused decode → pHash + resize + JPEG re-encode in ONE pass over
    the image bytes — the hot loop of
    :func:`~duckdb_vss_spark.pipelines.image_curate`, which needs both
    the perceptual hash (dedup) and the thumbnail (sink) per image.
    Composing :func:`phash` with
    :func:`~.multimodal.transcode_images` decodes every image twice;
    at 100 TB the decode IS the cost, so the fusion halves the pipeline.

    Output: ``(id, phash LONG, content BINARY, width INT, height INT,
    ok BOOLEAN, err STRING)`` — ``width``/``height`` are the ORIGINAL
    dims (the recipe's quality gates want them; the thumbnail's dims are
    the constants the caller passed), ``content`` the re-encoded
    baseline JPEG. ``on_error='flag'`` (default) keeps undecodable rows
    with ``ok=false``, ``phash=NULL`` and the error text
    (flag-don't-drop); ``'raise'`` propagates. Fanned map-only, same
    scale shape as the parents.

    ``with_stats=True`` additionally computes the
    :func:`image_quality_stats` signal set (``mean_luma contrast
    colorfulness blur entropy``) from the SAME decoded pixels — the
    stats are array sums, a rounding error next to the decode, so the
    recipe's quality gates come for free in the one pass.

    ``passthrough=True`` carries EVERY input column (the original
    ``content_col`` bytes included) through the kernel verbatim, with
    the re-encoded thumbnail emitted as ``out_col`` instead of
    replacing ``content`` — one row out per row in, same order. This is
    the shuffle-free way to keep the original bytes next to the derived
    signals: the kernel already holds the bytes in its Arrow batch, so
    emitting them costs serialization only, while the alternative —
    joining this output back to the input on id — sort-merge-exchanges
    the full byte column across the cluster
    (:func:`~duckdb_vss_spark.pipelines.image_curate` round-11 fix).

    ``transcode=False`` skips the resize + JPEG re-encode and emits NULL
    for ``out_col`` (schema unchanged) — for consumers that only need
    the hash/dims/stats signals (the image-text pair ledger never ships
    thumbnails; encoding 10k-per-batch thumbnails nobody reads was ~30%
    of that recipe's kernel CPU — round 12, guide §1.2: don't compute
    what you throw away)."""
    if on_error not in ("flag", "raise"):
        raise ValueError("on_error must be 'flag' or 'raise'")
    from pyspark.sql.types import (
        BinaryType, BooleanType, DoubleType, IntegerType, LongType,
        StringType, StructField, StructType,
    )

    from .dedup import _fan_out
    from .jpeg import encode_jpeg

    if out_col is None:
        # non-passthrough replaces the input bytes in place, whatever the
        # input column is called (round-12 ADVICE fix: a hard 'content'
        # default broke custom content_col without passthrough);
        # passthrough keeps the historical 'content' default, which the
        # freshness check below rejects when it collides
        out_col = "content" if passthrough else content_col
    new_cols = ["phash", out_col, "width", "height", "ok", "err"] + (
        list(_STAT_COLS) if with_stats else []
    )
    if passthrough:
        if out_col in (content_col, id_col):
            raise ValueError(
                f"passthrough=True needs a fresh out_col (got {out_col!r}, "
                f"which collides with an input column)"
            )
        clash = [c for c in df.columns if c != content_col and c in new_cols]
        if clash:
            raise ValueError(
                f"passthrough=True: input columns {clash} collide with the "
                f"kernel's output columns {new_cols}"
            )
        in_df = df
        carry = list(df.columns)
    else:
        if out_col != content_col:
            raise ValueError("out_col is only meaningful with passthrough=True")
        in_df = df.select(id_col, content_col)
        carry = [id_col]
    id_t = dict(df.dtypes)[id_col]  # noqa: F841 - kept for parity with siblings

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            hs, blobs, ws, hts, oks, errs = [], [], [], [], [], []
            stats: dict = {k: [] for k in _STAT_COLS}
            for blob in pdf[content_col]:
                try:
                    arr = _decode_image_bytes(blob)
                    h0, w0 = arr.shape[:2]
                    ph = phash_kernel(arr)
                    if transcode:
                        out = _resize_kernel(arr, new_width, new_height, method)
                        enc = encode_jpeg(
                            np.clip(np.rint(out), 0, 255).astype(np.uint8), quality=quality
                        )
                    else:
                        enc = None
                    if with_stats:
                        for k, v in zip(_STAT_COLS, _stats_kernel(arr)[2:]):
                            stats[k].append(v)
                    hs.append(ph); blobs.append(enc)
                    ws.append(w0); hts.append(h0); oks.append(True); errs.append(None)
                except Exception as e:  # noqa: BLE001 - per-row quarantine
                    if on_error == "raise":
                        raise
                    hs.append(None); blobs.append(None)
                    ws.append(None); hts.append(None); oks.append(False)
                    errs.append(f"{type(e).__name__}: {e}"[:200])
                    if with_stats:
                        for k in _STAT_COLS:
                            stats[k].append(None)
            data: dict = {c: list(pdf[c]) for c in carry}
            data["phash"] = pd.array(hs, dtype="Int64")
            data[out_col] = blobs
            data["width"] = pd.array(ws, dtype="Int32")
            data["height"] = pd.array(hts, dtype="Int32")
            data["ok"] = oks
            data["err"] = errs
            if with_stats:
                for k in _STAT_COLS:
                    data[k] = pd.array(stats[k], dtype="float64")
            yield pd.DataFrame(data)

    fields = {f.name: f for f in df.schema.fields}
    tail = [
        StructField("phash", LongType()),
        StructField(out_col, BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("ok", BooleanType()),
        StructField("err", StringType()),
    ] + ([StructField(k, DoubleType()) for k in _STAT_COLS] if with_stats else [])
    schema = StructType([fields[c] for c in carry if c != out_col] + tail)
    return _fan_out(in_df).mapInPandas(gen, schema=schema)


def frame_phash(
    frames: DataFrame,
    id_col: str,
    frame_col: str = "frame_idx",
    pixels_col: str = "pixels",
    width_col: str = "width",
    height_col: str = "height",
) -> DataFrame:
    """Per-frame perceptual hashes of a decoded frame table (the output
    shape of :func:`~.multimodal.gif_frames` / :func:`~.video.avi_frames`):
    ``(id, t, key)`` with ``key`` the frame's :func:`phash_kernel`.

    That output shape is the shared fingerprint-table contract (same as
    the audio path's), consumed by :func:`video_neardup_pairs`: two clips
    sharing ``min_matches`` near-colliding frame hashes at one temporal
    offset are near-duplicates, with the alignment lag reported —
    re-encoded, re-containered, or time-shifted copies all collide."""
    from .dedup import _fan_out

    id_t = dict(frames.dtypes)[id_col]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, ts, keys = [], [], []
            for i, t, w, h, px in zip(
                pdf[id_col], pdf[frame_col], pdf[width_col], pdf[height_col], pdf[pixels_col]
            ):
                arr = np.asarray(px, dtype=np.float64).reshape(int(h), int(w), -1)
                ids.append(i)
                ts.append(int(t))
                keys.append(phash_kernel(arr))
            yield pd.DataFrame({id_col: ids, "t": ts, "key": keys})

    return _fan_out(
        frames.select(id_col, frame_col, width_col, height_col, pixels_col)
    ).mapInPandas(gen, schema=f"{id_col} {id_t}, t bigint, key bigint")


def video_neardup_pairs(
    keys_df: DataFrame,
    id_col: str,
    t_col: str = "t",
    key_col: str = "key",
    max_hamming: int = 6,
    bands: int = 8,
    min_matches: int = 5,
    max_bucket: int = 1000,
    exact_dup_pairs: str = "all",
) -> DataFrame:
    """Video near-duplicate pairs over a per-frame hash table from
    :func:`frame_phash`: two clips match when ``min_matches`` frame pairs
    within per-frame Hamming distance ``max_hamming`` align at ONE
    temporal offset.

    The audio matcher joins on exact key equality — right for integer
    fingerprints, too brittle for perceptual hashes (a re-encoded frame
    lands at hamming 1-2, not 0). Here the frame join is the banded
    Hamming join (exact for ``max_hamming < bands`` by pigeonhole), then
    the same offset-vote aggregation.

    **Exact-duplicate clips collapse before the frame join** (round 11,
    the :func:`~.dedup.hamming_pairs` discipline): clips whose ENTIRE
    fingerprint table is identical (md5 digest of the sorted ``(t, key)``
    list) reduce to one representative in the banded join, and their
    within-group pairs emit directly — ``(offset 0, n_matches = the
    clip's frame-key count)``, qualifying when that count reaches
    ``min_matches``. A 10^5-copy viral clip therefore cannot flood the
    band buckets, and — the round-10 failure mode — cannot silently
    escape dedup when they overflow. ``exact_dup_pairs='all'`` (default)
    expands duplicate groups to every pair (the exact contract);
    ``'star'`` emits one ``(min_id, member)`` edge per member plus
    representative-level cross pairs — linear, connectivity-equivalent,
    what :func:`~duckdb_vss_spark.pipelines.video_curate` uses.

    Hot (band, bucket)s of the remaining representative frames (black
    frames, test cards shared across a corpus — content that SHOULD not
    vote) are still dropped by ``max_bucket``, but the drop now emits a
    ``RuntimeWarning`` with the dropped fraction (no silent caps).
    Output: ``(id_a, id_b, offset, n_matches)``.
    """
    if max_hamming >= bands:
        raise ValueError("exactness requires max_hamming < bands (pigeonhole)")
    if exact_dup_pairs not in ("all", "star"):
        raise ValueError("exact_dup_pairs must be 'all' or 'star'")
    from pyspark.sql import functions as F

    from .dedup import _shared

    width = 64 // bands
    mask = F.lit((1 << width) - 1)
    # the key table feeds the digest aggregate and the banded join; its
    # upstream is a per-frame pHash over decoded pixels — persist once
    k = _shared(
        keys_df.select(
            F.col(id_col).alias("__id"),
            F.col(t_col).cast("long").alias("__t"),
            F.col(key_col).cast("long").alias("__h"),
        )
    )
    # one row per clip: order-free 128-bit-equivalent digest of the
    # frame-hash multiset (two independent xxhash64 XOR-folds + row
    # count, map-side combinable — collect_list+md5 forced every frame
    # row through its clip's reducer; (t, h) rows are unique within a
    # clip so XOR cancellation cannot occur) + frame-key count
    digests = _shared(
        k.groupBy("__id").agg(
            F.bit_xor(F.xxhash64(F.col("__t"), F.col("__h"))).alias("__d1"),
            F.bit_xor(F.xxhash64(F.lit(1), F.col("__t"), F.col("__h"))).alias("__d2"),
            F.count(F.lit(1)).alias("__nk"),
        )
    )
    _D = ["__d1", "__d2", "__nk"]
    groups = _shared(
        digests.groupBy(*_D).agg(
            F.min("__id").alias("__rep"), F.count(F.lit(1)).alias("__n")
        )
    )
    krep = k.join(groups.select(F.col("__rep").alias("__id")), "__id")
    banded = _shared(
        krep.select(
            "__id",
            "__t",
            "__h",
            F.posexplode(
                F.array(
                    *[
                        F.shiftrightunsigned(F.col("__h"), b * width).bitwiseAND(mask)
                        for b in range(bands)
                    ]
                )
            ).alias("b", "bucket"),
        )
    )
    sizes = _shared(banded.groupBy("b", "bucket").agg(F.count(F.lit(1)).alias("__n")))
    is_hot = F.col("__n") > max_bucket
    # ONE driver action for both decisions: dup-group presence (the
    # expansion gate) and the hot-bucket stats (the warning)
    hot = (
        groups.agg(F.count(F.when(F.col("__n") > 1, 1)).alias("ndup"))
        .crossJoin(
            sizes.agg(
                F.count(F.when(is_hot, 1)).alias("hb"),
                F.coalesce(F.sum(F.when(is_hot, F.col("__n"))), F.lit(0)).alias("hr"),
                F.coalesce(F.sum("__n"), F.lit(0)).alias("total"),
            )
        )
        .collect()[0]
    )
    n_dup_groups = hot["ndup"]
    if hot["hb"] > 0:
        import warnings

        total = hot["total"]
        warnings.warn(
            f"video_neardup_pairs: {hot['hb']} hot (band, bucket) groups over "
            f"max_bucket={max_bucket} dropped {hot['hr']}/{total} banded frame "
            f"rows ({hot['hr'] / total:.1%}); a frame pair loses its vote only "
            f"when EVERY chunk its two hashes agree on is hot (identical-clip "
            f"duplicates are unaffected — they pair via the digest collapse). "
            f"Raise max_bucket if these are not boilerplate frames.",
            RuntimeWarning,
            stacklevel=2,
        )
    cap_filtered = hot["hb"] > 0
    if cap_filtered:
        banded = banded.join(
            sizes.filter(F.col("__n") <= max_bucket).select("b", "bucket"),
            ["b", "bucket"],
        )
    a = banded.select(
        "b", "bucket", F.col("__id").alias("id_a"), F.col("__t").alias("ta"),
        F.col("__h").alias("h_a"),
    )
    b2 = banded.select(
        "b", "bucket", F.col("__id").alias("id_b"), F.col("__t").alias("tb"),
        F.col("__h").alias("h_b"),
    )

    def _chunk(col, b):
        return F.shiftrightunsigned(col, b * width).bitwiseAND(mask)

    frame_pairs = (
        a.join(b2, ["b", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))) <= max_hamming
        )
    )
    if cap_filtered:
        # a frame pair agreeing on multiple bands must vote ONCE; the
        # codegen first-agree pick below is wrong once the cap filtered
        # any band row (a pair whose FIRST agreeing band is hot would
        # only surface on a later agreeing band, where b != first_agree
        # silently dropped its vote — the round-11 verdict defect), so
        # the capped path dedups the candidate frame pairs instead: one
        # bounded Exchange, and a vote is lost only when EVERY agreeing
        # chunk is hot — the warning's contract.
        frame_pairs = frame_pairs.dropDuplicates(["id_a", "ta", "id_b", "tb"])
    else:
        # uncapped: every agreeing band is present, so keep exactly the
        # FIRST agreeing band per frame pair, decided in codegen — no
        # extra Exchange
        first_agree = F.when(_chunk(F.col("h_a"), 0) == _chunk(F.col("h_b"), 0), F.lit(0))
        for bb in range(1, bands):
            first_agree = first_agree.when(
                _chunk(F.col("h_a"), bb) == _chunk(F.col("h_b"), bb), F.lit(bb)
            )
        frame_pairs = frame_pairs.filter(F.col("b") == first_agree)
    votes = frame_pairs.groupBy(
        "id_a", "id_b", (F.col("ta") - F.col("tb")).alias("offset")
    ).agg(F.count(F.lit(1)).alias("n_matches"))
    best = votes.groupBy("id_a", "id_b").agg(
        F.max(F.struct("n_matches", "offset")).alias("__best")
    )
    rep_pairs = best.select(
        "id_a",
        "id_b",
        F.col("__best.offset").alias("offset"),
        F.col("__best.n_matches").alias("n_matches"),
    ).filter(F.col("n_matches") >= min_matches)
    if n_dup_groups == 0:
        return rep_pairs
    # exact-duplicate expansion: a member clip is byte-identical in
    # fingerprint to its representative, so cross pairs inherit the rep
    # pair's offset/votes and within-group pairs sit at offset 0 with
    # every frame key voting
    dmem = digests.join(
        groups.filter(F.col("__n") > 1).select(*_D, "__rep"), _D
    )
    if exact_dup_pairs == "star":
        star = (
            dmem.filter(F.col("__id") != F.col("__rep"))
            .filter(F.col("__nk") >= min_matches)
            .select(
                F.col("__rep").alias("id_a"),
                F.col("__id").alias("id_b"),
                F.lit(0).cast("long").alias("offset"),
                F.col("__nk").cast("long").alias("n_matches"),
            )
        )
        return rep_pairs.unionByName(star)
    dig1 = digests.select("__id", F.struct(*_D).alias("__d"))
    rep_of = dig1.select(F.col("__id").alias("__rid"), F.col("__d").alias("__rd"))
    ma = dig1.select(F.col("__id").alias("ma"), F.col("__d").alias("da"))
    mb = dig1.select(F.col("__id").alias("mb"), F.col("__d").alias("db"))
    cross = (
        rep_pairs.join(
            rep_of.withColumnRenamed("__rid", "id_a").withColumnRenamed("__rd", "da"),
            "id_a",
        )
        .join(
            rep_of.withColumnRenamed("__rid", "id_b").withColumnRenamed("__rd", "db"),
            "id_b",
        )
        .join(ma, "da")
        .join(mb, "db")
        .select(
            F.least(F.col("ma"), F.col("mb")).alias("id_a"),
            F.greatest(F.col("ma"), F.col("mb")).alias("id_b"),
            # the rep pair's offset is t_a - t_b with id_a < id_b at REP
            # level; when the member ids swap that order, the lag flips
            # sign (round-12 ADVICE fix — a member of the higher group
            # with a smaller id was carrying the un-negated offset)
            F.when(F.col("ma") <= F.col("mb"), F.col("offset"))
            .otherwise(-F.col("offset"))
            .alias("offset"),
            "n_matches",
        )
    )
    within = (
        dmem.filter(F.col("__nk") >= min_matches)
        .select(*_D, F.col("__id").alias("id_a"), F.col("__nk").alias("__nka"))
        .join(dmem.select(*_D, F.col("__id").alias("id_b")), _D)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.lit(0).cast("long").alias("offset"),
            F.col("__nka").cast("long").alias("n_matches"),
        )
    )
    return cross.unionByName(within)


def fingerprint_videos(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    every_nth: int = 1,
    on_error: str = "flag",
) -> DataFrame:
    """Fused per-clip container decode → per-frame pHash in ONE pass,
    emitting ONE row per clip with every input column (bytes included)
    carried through map-side plus the per-clip signals:

    ``decode_ok BOOLEAN, n_frames INT, width INT, height INT,
    frame_ts ARRAY<INT>, frame_phashes ARRAY<LONG>, decode_err STRING``

    Container dispatch matches :func:`~.multimodal.video_frames` (GIF /
    MJPEG-AVI by magic bytes; reference parity: duckdb reads blobs as
    opaque BLOB columns, `src/include/duckdb/common/types/blob.hpp`),
    keeping every ``every_nth`` frame; ``width``/``height`` are the
    minimum over sampled frames and ``n_frames`` the SAMPLED frame
    count — the same per-clip aggregates
    :func:`~duckdb_vss_spark.pipelines.video_curate` previously derived
    from the exploded pixel table. The hashes are bit-identical to
    ``frame_phash(video_frames(df))``; exploding ``(frame_ts,
    frame_phashes)`` yields that function's ``(id, t, key)`` contract.

    Why fused (round 11): the exploded-pixel path materialized W*H*4
    bytes per frame into a persisted table and then joined the byte
    column back on id — a sort-merge exchange of the corpus. Here
    pixels die inside the kernel batch (decode → hash → drop), the
    narrow hash arrays ride next to the original bytes shuffle-free,
    and nothing pixel-shaped ever enters a cache or exchange.
    ``on_error='flag'`` quarantines undecodable clips with
    ``decode_ok=false``, empty arrays and the error text
    (flag-don't-drop); ``'raise'`` propagates. Fanned map-only."""
    if on_error not in ("flag", "raise"):
        raise ValueError("on_error must be 'flag' or 'raise'")
    if every_nth < 1:
        raise ValueError("every_nth must be >= 1")
    from pyspark.sql.types import (
        ArrayType, BooleanType, IntegerType, LongType, StringType,
        StructField, StructType,
    )

    from .dedup import _fan_out
    from .gif import decode_gif_frames_np
    from .video import decode_avi_frames_np

    new_cols = ["decode_ok", "n_frames", "width", "height",
                "frame_ts", "frame_phashes", "decode_err"]
    clash = [c for c in df.columns if c in new_cols]
    if clash:
        raise ValueError(
            f"input columns {clash} collide with the kernel's output "
            f"columns {new_cols}"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            oks, nfs, ws, hs, tss, keys, errs = [], [], [], [], [], [], []
            for blob in pdf[content_col]:
                try:
                    head = bytes(blob[:12])
                    if head[:6] in (b"GIF87a", b"GIF89a"):
                        frames = (a for a, _delay in decode_gif_frames_np(blob))
                    elif head[:4] == b"RIFF" and head[8:12] == b"AVI ":
                        frames = decode_avi_frames_np(blob)
                    else:
                        raise NotImplementedError(
                            f"not a supported video container (magic {head[:4]!r})"
                        )
                    ts, ks, w0, h0, n_all = [], [], None, None, 0
                    for fi, arr in enumerate(frames):
                        n_all += 1
                        if fi % every_nth:
                            continue
                        h, w = arr.shape[:2]
                        w0 = w if w0 is None else min(w0, w)
                        h0 = h if h0 is None else min(h0, h)
                        ts.append(fi)
                        ks.append(phash_kernel(arr))
                    if n_all == 0:
                        raise ValueError("video decoded to zero frames")
                    oks.append(True); nfs.append(len(ts))
                    ws.append(w0); hs.append(h0)
                    tss.append(ts); keys.append(ks); errs.append(None)
                except Exception as e:  # noqa: BLE001 - per-clip quarantine
                    if on_error == "raise":
                        raise
                    oks.append(False); nfs.append(0)
                    ws.append(None); hs.append(None)
                    tss.append([]); keys.append([])
                    errs.append(f"{type(e).__name__}: {e}"[:200])
            data: dict = {c: list(pdf[c]) for c in pdf.columns}
            data["decode_ok"] = oks
            data["n_frames"] = pd.array(nfs, dtype="Int32")
            data["width"] = pd.array(ws, dtype="Int32")
            data["height"] = pd.array(hs, dtype="Int32")
            data["frame_ts"] = tss
            data["frame_phashes"] = keys
            data["decode_err"] = errs
            yield pd.DataFrame(data)

    schema = StructType(
        list(df.schema.fields)
        + [
            StructField("decode_ok", BooleanType()),
            StructField("n_frames", IntegerType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("frame_ts", ArrayType(IntegerType())),
            StructField("frame_phashes", ArrayType(LongType())),
            StructField("decode_err", StringType()),
        ]
    )
    return _fan_out(df).mapInPandas(gen, schema=schema)


def image_neardup_pairs(
    hashes: DataFrame,
    id_col: str,
    hash_col: str = "phash",
    max_hamming: int = 10,
    bands: int = 16,
    max_bucket: int | None = 1000,
    combo: int | str = "auto",
    exact_dup_pairs: str = "all",
) -> DataFrame:
    """Perceptual near-dup pairs over a hash table from
    :func:`phash`/:func:`dhash`: ``(id_a, id_b, hamming)`` with
    ``hamming <= max_hamming`` — the banded Hamming self-join
    (:func:`~.dedup.hamming_pairs`). Identical hashes collapse to one
    representative before banding, so exact duplicates never hit the
    ``max_bucket`` cap; the cap drops only pairs of DISTINCT hashes in
    hot buckets (near-identical boilerplate), warning with the dropped
    fraction when it bites. ``combo="auto"`` escalates to pair-of-chunk
    join keys when the distinct-hash count saturates the combo=1 key
    space (see the scale note on :func:`~.dedup.hamming_pairs`); pass
    ``max_bucket=None`` for unconditional exactness, and
    ``exact_dup_pairs="star"`` for the linear connectivity-equivalent
    expansion when the pairs feed
    :func:`~duckdb_vss_spark.operators.graph.dedup_clusters`."""
    from .dedup import hamming_pairs

    return hamming_pairs(
        hashes, id_col, hash_col, max_hamming, bands,
        max_bucket=max_bucket, combo=combo, exact_dup_pairs=exact_dup_pairs,
    )

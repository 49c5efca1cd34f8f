"""Persisted perceptual-image-hash artifact — incremental cross-snapshot
image dedup, the image twin of :class:`.dedup_store.MinHashStore` /
:class:`.audio_store.AudioFingerprintStore`.

The 100 TB image-crawl shape: each new batch of images must near-dedup
against EVERYTHING already accepted (the same photo re-encoded, resized,
format-converted), but re-decoding historical images per batch is
O(history) codec work. This store persists only the 64-bit pHashes,
banded for the Hamming join — (band, bucket, id, h) rows, a few longs
per image regardless of pixel count — so matching a new batch costs one
band-bucket join of the batch's hash table against the stored one: the
historical IMAGE BYTES are never re-read.

Artifact discipline is identical to the sibling stores: append-only
versioned parquet directory, JSON manifest as the atomic commit point,
monotonic ``next_snap_id`` dir allocation (:func:`.fs.alloc_snap_dir` —
dir names are never reused after ``drop_snapshot``), orphan ``snap-*``
dirs ignored by readers, ``vacuum`` retention, any Hadoop filesystem.
The banding parameters live in the manifest — band buckets are only
comparable between identically-banded hashes, so the store owns the
configuration.

Matching is the banded-Hamming contract of
:func:`~duckdb_vss_spark.operators.dedup.hamming_pairs`: candidates
agree on >= 1 band chunk (complete for ``hamming < bands`` by
pigeonhole), verification is ``bit_count(xor)`` computed inside the
join. Hot buckets (boilerplate images — logos, spacers, test cards) are
dropped by a per-(band, bucket) frequency cap computed over store+batch
BEFORE the join, so one viral thumbnail in history cannot turn every
future batch's match quadratic.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fs

__all__ = ["ImageHashStore"]

_MANIFEST = "manifest.json"


class ImageHashStore:
    """Handle on a persisted perceptual-hash dedup artifact. Use
    :meth:`create` / :meth:`open`, not the constructor."""

    def __init__(self, spark: SparkSession, root: str, manifest: dict):
        self.spark = spark
        self.root = root
        self.manifest = manifest

    # -- lifecycle ---------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        bands: int = 16,
        max_hamming: int = 10,
        overwrite: bool = False,
    ) -> "ImageHashStore":
        if max_hamming >= bands:
            raise ValueError("completeness requires max_hamming < bands (pigeonhole)")
        if 64 % bands != 0:
            raise ValueError(f"bands ({bands}) must divide 64")
        if fs.exists(spark, fs.join(root, _MANIFEST)):
            if not overwrite:
                raise ValueError(f"ImageHashStore already exists at {root}")
            fs.delete(spark, root)
        fs.mkdirs(spark, root)
        manifest = {
            "format": "image-hash-store",
            "version": 1,
            "bands": int(bands),
            "max_hamming": int(max_hamming),
            "snapshots": [],
            "n_images": 0,
            "next_snap_id": 0,
        }
        fs.write_json(spark, fs.join(root, _MANIFEST), manifest)
        return cls(spark, root, manifest)

    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "ImageHashStore":
        manifest = fs.read_json(spark, fs.join(root, _MANIFEST))
        if manifest.get("format") != "image-hash-store":
            raise ValueError(f"not an ImageHashStore: {root}")
        return cls(spark, root, manifest)

    # -- hash plumbing -------------------------------------------------------

    def band_rows(
        self,
        df: DataFrame,
        id_col: str,
        content_col: Optional[str] = "content",
        hash_col: Optional[str] = None,
    ) -> DataFrame:
        """(band INT, bucket LONG, id, h LONG) rows for every image — the
        batch-side input of :meth:`match_against` and the stored layout of
        :meth:`append_snapshot`. With ``hash_col`` the caller already has
        pHashes (e.g. :func:`~duckdb_vss_spark.pipelines.image_curate`
        computed them in its fused decode pass) and NO decode happens;
        otherwise ``content_col`` bytes run through the real decoder +
        :func:`~duckdb_vss_spark.operators.image.phash_kernel`."""
        if hash_col is not None:
            hashes = df.select(F.col(id_col).alias("id"), F.col(hash_col).alias("__h"))
        else:
            from ..operators.image import phash

            hashes = phash(df.select(id_col, content_col), id_col).select(
                F.col(id_col).alias("id"), F.col("phash").alias("__h")
            )
        bands = self.manifest["bands"]
        width = 64 // bands
        mask = F.lit((1 << width) - 1)
        return hashes.select(
            F.posexplode(
                F.array(*[
                    F.shiftrightunsigned(F.col("__h"), b * width).bitwiseAND(mask)
                    for b in range(bands)
                ])
            ).alias("band", "bucket"),
            F.col("id"),
            F.col("__h").alias("h"),
        )

    def _store_df(self) -> Optional[DataFrame]:
        snaps = self.manifest["snapshots"]
        key = tuple(s["dir"] for s in snaps if s.get("n_images") != 0)
        if not key:
            return None
        # memoized lazy union on the immutable snapshot-dir tuple with
        # append-only extension — same steady-state-loop discipline as the
        # sibling stores
        cached = getattr(self, "_store_df_memo", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        out, todo = None, key
        if cached is not None and key[: len(cached[0])] == cached[0]:
            out, todo = cached[1], key[len(cached[0]):]
        for dirname in todo:
            df = self.spark.read.parquet(fs.join(self.root, dirname)).select(
                "band", "bucket", "id", "h", "snapshot"
            )
            out = df if out is None else out.unionByName(df)
        self._store_df_memo = (key, out)
        return out

    # -- operations --------------------------------------------------------

    def append_snapshot(
        self,
        df: DataFrame,
        id_col: str,
        snapshot: str,
        content_col: Optional[str] = "content",
        hash_col: Optional[str] = None,
    ) -> dict:
        """Hash ``df``'s images (or take ``hash_col`` verbatim) and commit
        them as ``snapshot`` (typically the batch's KEPT rows). Written
        partitioned by band; manifest overwrite is the atomic commit."""
        if any(s["name"] == snapshot for s in self.manifest["snapshots"]):
            raise ValueError(f"snapshot {snapshot!r} already in store")
        dirname = fs.alloc_snap_dir(self.spark, self.root, self.manifest)
        out = fs.join(self.root, dirname)
        rows = self.band_rows(df, id_col, content_col, hash_col).withColumn(
            "snapshot", F.lit(snapshot)
        )
        rows.write.partitionBy("band").parquet(out, mode="overwrite")
        names = fs.listdir(self.spark, out)
        has_data = any(
            n.startswith("band=") or (n.startswith("part-") and not n.endswith(".crc"))
            for n in names
        )
        n = (
            self.spark.read.parquet(out).select("id").distinct().count()
            if has_data
            else 0
        )
        entry = {"name": snapshot, "dir": dirname, "n_images": n}
        self.manifest["snapshots"].append(entry)
        self.manifest["n_images"] += n
        fs.write_json(self.spark, fs.join(self.root, _MANIFEST), self.manifest)
        return entry

    def match_against(
        self,
        df: DataFrame,
        id_col: str,
        content_col: Optional[str] = "content",
        hash_col: Optional[str] = None,
        max_hamming: Optional[int] = None,
        max_bucket: int = 1000,
    ) -> DataFrame:
        """Near-duplicate matches of ``df``'s images against the stored
        corpus: ``(id, store_id, snapshot, hamming INT)`` with
        ``hamming <= max_hamming`` (default: the store's configured bound;
        a smaller per-call bound is allowed — still complete by
        pigeonhole; a larger one is rejected). The per-(band, bucket)
        frequency cap is computed over store+batch TOGETHER, so
        boilerplate that went viral across history is dropped even if
        rare in this batch. A pair colliding in several bands is emitted
        once (min hamming is a pair constant, so any-band is fine)."""
        bands = self.manifest["bands"]
        bound = self.manifest["max_hamming"] if max_hamming is None else int(max_hamming)
        if bound >= bands:
            raise ValueError(
                f"max_hamming ({bound}) must stay below the store's bands ({bands})"
            )
        store = self._store_df()
        if store is None:
            id_t = dict(df.dtypes)[id_col]
            schema = f"id {id_t}, store_id {id_t}, snapshot string, hamming int"
            return self.spark.createDataFrame([], schema)
        batch = self.band_rows(df, id_col, content_col, hash_col)
        freq = (
            batch.select("band", "bucket")
            .unionByName(store.select("band", "bucket"))
            .groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") <= max_bucket)
            .select("band", "bucket")
        )
        b = batch.join(freq, ["band", "bucket"])
        s = store.join(freq, ["band", "bucket"])
        return (
            b.alias("a")
            .join(
                s.alias("s"),
                (F.col("a.band") == F.col("s.band"))
                & (F.col("a.bucket") == F.col("s.bucket")),
            )
            .select(
                F.col("a.id").alias("id"),
                F.col("s.id").alias("store_id"),
                F.col("s.snapshot").alias("snapshot"),
                F.bit_count(F.col("a.h").bitwiseXOR(F.col("s.h")))
                .cast("int")
                .alias("hamming"),
            )
            .filter(F.col("hamming") <= bound)
            .dropDuplicates(["id", "store_id", "snapshot"])
        )

    def flag_batch(
        self,
        df: DataFrame,
        id_col: str,
        content_col: Optional[str] = "content",
        hash_col: Optional[str] = None,
        max_hamming: Optional[int] = None,
        flag_col: str = "dup_of_store",
    ) -> DataFrame:
        """``df`` plus boolean ``flag_col``: True when the image near-dups
        ANY stored image (flag-don't-drop)."""
        hits = (
            self.match_against(df, id_col, content_col, hash_col, max_hamming)
            .select(F.col("id").alias("__mid"))
            .distinct()
        )
        return (
            df.join(hits, F.col(id_col) == F.col("__mid"), "left")
            .withColumn(flag_col, F.col("__mid").isNotNull())
            .drop("__mid")
        )

    def drop_snapshot(self, snapshot: str) -> None:
        """Retire a snapshot: manifest overwrite commits; the data dir
        becomes a vacuum-able orphan (its name is never reallocated)."""
        snaps = self.manifest["snapshots"]
        entry = next((s for s in snaps if s["name"] == snapshot), None)
        if entry is None:
            raise ValueError(f"snapshot {snapshot!r} not in store")
        self.manifest["snapshots"] = [s for s in snaps if s["name"] != snapshot]
        self.manifest["n_images"] -= entry["n_images"]
        fs.write_json(self.spark, fs.join(self.root, _MANIFEST), self.manifest)

    def vacuum(self) -> list:
        """Delete data dirs not referenced by the manifest."""
        live = {s["dir"] for s in self.manifest["snapshots"]}
        deleted = []
        for name in fs.listdir(self.spark, self.root):
            base = name.rstrip("/").split("/")[-1]
            if base.startswith("snap-") and base not in live:
                fs.delete(self.spark, fs.join(self.root, base))
                deleted.append(base)
        return deleted

    def info(self) -> dict:
        """Manifest snapshot (copy) for pragma-style introspection."""
        return dict(self.manifest)

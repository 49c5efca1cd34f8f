"""Persisted audio-fingerprint artifact — incremental cross-snapshot
audio dedup, the audio twin of :class:`.dedup_store.MinHashStore`.

Same 100 TB crawl-pipeline shape: each new batch of clips must dedup
against EVERYTHING already accepted, but re-decoding the historical
audio per batch is O(history) codec work. This store persists only the
fingerprint keys — ``(key, t, id)`` rows from the Haitsma-Kalker-shaped
block fingerprint (:func:`~duckdb_vss_spark.operators.audio.
block_fingerprint` widened by :func:`~duckdb_vss_spark.operators.audio.
fingerprint_keys`) — a few longs per second of audio regardless of
sample rate, so matching a new batch costs one key join of the batch's
fingerprint table against the stored one: the historical AUDIO is never
re-read.

Artifact discipline is identical to the MinHash store (and the vector
index): an append-only versioned parquet directory, JSON manifest as
the atomic commit point, orphan ``snap-*`` dirs ignored by readers,
``drop_snapshot`` + ``vacuum`` retention, any Hadoop filesystem via
:mod:`.fs`. The fingerprint parameters (frame, blocks, key_frames) live
in the manifest — keys are only comparable between identically-framed
fingerprints, so the store owns the configuration.

Matching is the offset-consistent vote of
:func:`~duckdb_vss_spark.operators.audio.audio_neardup_pairs`: candidate
pairs share a key, votes accumulate per (batch clip, stored clip,
time offset), a pair matches when its best offset collects
``min_matches`` votes. Hot keys (silence, test tones) are dropped by a
frequency cap computed over store+batch BEFORE the join.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import fs

__all__ = ["AudioFingerprintStore"]

_MANIFEST = "manifest.json"
_KB = 64  # key-bucket partitions (layout symmetry with band partitioning)


class AudioFingerprintStore:
    """Handle on a persisted audio-fingerprint dedup artifact. Use
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
        frame: int = 256,
        blocks: int = 8,
        key_frames: int = 4,
        overwrite: bool = False,
    ) -> "AudioFingerprintStore":
        if frame % blocks != 0:
            raise ValueError(f"frame ({frame}) must be a multiple of blocks ({blocks})")
        if fs.exists(spark, fs.join(root, _MANIFEST)):
            if not overwrite:
                raise ValueError(f"AudioFingerprintStore already exists at {root}")
            fs.delete(spark, root)
        fs.mkdirs(spark, root)
        manifest = {
            "format": "audio-fp-store",
            "version": 1,
            "frame": int(frame),
            "blocks": int(blocks),
            "key_frames": int(key_frames),
            "snapshots": [],
            "n_clips": 0,
            "next_snap_id": 0,
        }
        fs.write_json(spark, fs.join(root, _MANIFEST), manifest)
        return cls(spark, root, manifest)

    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "AudioFingerprintStore":
        manifest = fs.read_json(spark, fs.join(root, _MANIFEST))
        if manifest.get("format") != "audio-fp-store":
            raise ValueError(f"not an AudioFingerprintStore: {root}")
        return cls(spark, root, manifest)

    # -- fingerprint plumbing ------------------------------------------------

    def key_rows(self, df: DataFrame, content_col: str, id_col: str) -> DataFrame:
        """(kb INT, key LONG, t LONG, id) fingerprint rows for every clip —
        the batch-side input of :meth:`match_against` and the stored
        layout of :meth:`append_snapshot`. Decodes WAV bytes with the real
        codec and fingerprints with the manifest's parameters."""
        m = self.manifest
        from ..operators.audio import block_fingerprint, fingerprint_keys
        from ..operators.multimodal import decode_audio

        dec = decode_audio(df.select(id_col, content_col), id_col)
        words = block_fingerprint(dec, id_col, frame=m["frame"], blocks=m["blocks"])
        keys = fingerprint_keys(
            words, id_col, key_frames=m["key_frames"], bits_per_word=m["blocks"] - 1
        )
        return keys.select(
            (F.pmod(F.col("key"), F.lit(_KB))).cast("int").alias("kb"),
            F.col("key"),
            F.col("t").cast("long").alias("t"),
            F.col(id_col).alias("id"),
        )

    def _store_df(self) -> Optional[DataFrame]:
        snaps = self.manifest["snapshots"]
        key = tuple(s["dir"] for s in snaps if s.get("n_clips") != 0)
        if not key:
            return None
        # memoized lazy union on the immutable snapshot-dir tuple, with
        # append-only extension — same steady-state-loop discipline as
        # MinHashStore._store_df (round 9)
        cached = getattr(self, "_store_df_memo", None)
        if cached is not None and cached[0] == key:
            return cached[1]
        out, todo = None, key
        if cached is not None and key[: len(cached[0])] == cached[0]:
            out, todo = cached[1], key[len(cached[0]):]
        for dirname in todo:
            df = self.spark.read.parquet(fs.join(self.root, dirname)).select(
                "kb", "key", "t", "id", "snapshot"
            )
            out = df if out is None else out.unionByName(df)
        self._store_df_memo = (key, out)
        return out

    # -- operations --------------------------------------------------------

    def append_snapshot(
        self, df: DataFrame, content_col: str, id_col: str, snapshot: str
    ) -> dict:
        """Fingerprint ``df``'s clips and commit them as ``snapshot``
        (typically the batch's KEPT rows). Write partitioned by key
        bucket; manifest overwrite is the atomic commit point."""
        if any(s["name"] == snapshot for s in self.manifest["snapshots"]):
            raise ValueError(f"snapshot {snapshot!r} already in store")
        dirname = fs.alloc_snap_dir(self.spark, self.root, self.manifest)
        out = fs.join(self.root, dirname)
        rows = self.key_rows(df, content_col, id_col).withColumn(
            "snapshot", F.lit(snapshot)
        )
        # The clip count folds into the WRITE job via the Observation API
        # (the MinHashStore discipline): fingerprint_keys posexplodes key
        # positions, so every clip with >= 1 key emits EXACTLY ONE t == 0
        # row — count_if(t = 0) IS the committed distinct-clip count, and
        # the per-commit read-back (one extra driver action + a full file
        # listing, a cluster barrier per commit at streaming scale) goes.
        from pyspark.sql import Observation

        obs = Observation()
        rows = rows.observe(
            obs,
            F.count(F.lit(1)).alias("rows"),
            F.count_if(F.col("t") == 0).alias("clips"),
        )
        # cluster by (key bucket, id-hash) before the write (the
        # MinHashStore discipline: fewer small files per batch-scale
        # snapshot via AQE coalescing, cluster-width spread for corpus-
        # scale initial builds instead of the distinct-bucket ceiling)
        par = max(1, int(self.spark.sparkContext.defaultParallelism))
        rows = rows.repartition(
            F.col("kb"), F.pmod(F.xxhash64(F.col("id")), F.lit(par))
        )
        rows.write.partitionBy("kb").parquet(out, mode="overwrite")
        try:
            got = obs.get
            n = int(got["clips"])
            if n == 0 and int(got["rows"]) > 0:
                # defensive: key rows without the t==0 marker cannot come
                # from fingerprint_keys, but prove the count from the
                # written snapshot rather than silently committing 0
                n = self.spark.read.parquet(out).select("id").distinct().count()
        except Exception:
            # an EMPTY batch: AQE's empty-relation propagation can
            # eliminate the CollectMetrics node with the rest of the
            # plan, so no metrics row exists — prove emptiness (or not)
            # from the directory listing, as the pre-Observation code did
            names = fs.listdir(self.spark, out)
            has_data = any(
                nm.startswith("kb=")
                or (nm.startswith("part-") and not nm.endswith(".crc"))
                for nm in names
            )
            n = (
                self.spark.read.parquet(out).select("id").distinct().count()
                if has_data
                else 0
            )
        entry = {"name": snapshot, "dir": dirname, "n_clips": n}
        self.manifest["snapshots"].append(entry)
        self.manifest["n_clips"] += n
        fs.write_json(self.spark, fs.join(self.root, _MANIFEST), self.manifest)
        return entry

    def match_against(
        self,
        df: DataFrame,
        content_col: str,
        id_col: str,
        min_matches: int = 8,
        max_key_freq: int = 1000,
    ) -> DataFrame:
        """Near-duplicate matches of ``df``'s clips against the stored
        corpus: ``(id, store_id, snapshot, offset, n_matches)`` with the
        best-offset vote count ``>= min_matches``.

        Round-11 discipline (the in-batch matcher's): batch clips whose
        ENTIRE fingerprint table is identical collapse to one
        representative before the key join — a batch of N copies of one
        clip no longer makes every one of its keys hot — and hits expand
        back to all members afterwards. The frequency cap is computed
        over representative-batch + store keys together, so a key that
        went viral across history is still dropped even if rare in this
        batch, but the drop now emits a ``RuntimeWarning`` with the
        dropped fraction (no silent caps)."""
        store = self._store_df()
        if store is None:
            # empty-store schema must track the caller's id dtype (string
            # clip ids would otherwise change schema between the empty and
            # non-empty paths and force implicit casts in flag_batch joins)
            id_t = dict(df.dtypes)[id_col]
            schema = (
                f"id {id_t}, store_id {id_t}, snapshot string, "
                "offset long, n_matches long"
            )
            return self.spark.createDataFrame([], schema)
        from ..operators.dedup import _shared

        # referenced by the digest aggregate and the join probe side
        # behind the WAV decode + fingerprint chain — persist once
        batch = _shared(self.key_rows(df, content_col, id_col))
        # order-free 128-bit-equivalent digest (two independent xxhash64
        # XOR-folds + row count, map-side combinable; (t, key) rows are
        # unique within a clip so XOR cancellation cannot occur)
        digests = _shared(
            batch.groupBy("id").agg(
                F.bit_xor(F.xxhash64(F.col("t"), F.col("key"))).alias("__d1"),
                F.bit_xor(F.xxhash64(F.lit(1), F.col("t"), F.col("key"))).alias("__d2"),
                F.count(F.lit(1)).alias("__nk"),
            )
        )
        _D = ["__d1", "__d2", "__nk"]
        groups = _shared(
            digests.groupBy(*_D).agg(
                F.min("id").alias("__rep"), F.count(F.lit(1)).alias("__n")
            )
        )
        brep = batch.join(groups.select(F.col("__rep").alias("id")), "id")
        freq = _shared(
            brep.select("key")
            .unionByName(store.select("key"))
            .groupBy("key")
            .agg(F.count(F.lit(1)).alias("__c"))
        )
        is_hot = F.col("__c") > max_key_freq
        # ONE driver action for both decisions (expansion gate + warning)
        hot = (
            groups.agg(F.count(F.when(F.col("__n") > 1, 1)).alias("ndup"))
            .crossJoin(
                freq.agg(
                    F.count(F.when(is_hot, 1)).alias("hk"),
                    F.coalesce(F.sum(F.when(is_hot, F.col("__c"))), F.lit(0)).alias("hr"),
                    F.coalesce(F.sum("__c"), F.lit(0)).alias("total"),
                )
            )
            .collect()[0]
        )
        n_dup_groups = hot["ndup"]
        if hot["hk"] > 0:
            import warnings

            warnings.warn(
                f"AudioFingerprintStore.match_against: {hot['hk']} hot keys "
                f"over max_key_freq={max_key_freq} dropped "
                f"{hot['hr']}/{hot['total']} key rows "
                f"({hot['hr'] / hot['total']:.1%}); votes through those keys "
                f"are lost (identical batch clips still collapse to one "
                f"probe). Raise max_key_freq if these are not degenerate "
                f"keys (silence, test tones).",
                RuntimeWarning,
                stacklevel=2,
            )
        ok_keys = freq.filter(~is_hot).select("key")
        b = brep.join(ok_keys, "key")
        s = store.join(ok_keys, "key")
        votes = (
            b.alias("a")
            .join(s.alias("s"), F.col("a.key") == F.col("s.key"))
            .groupBy(
                F.col("a.id").alias("id"),
                F.col("s.id").alias("store_id"),
                F.col("s.snapshot").alias("snapshot"),
                (F.col("a.t") - F.col("s.t")).alias("offset"),
            )
            .agg(F.count(F.lit(1)).alias("n_matches"))
        )
        best = votes.groupBy("id", "store_id", "snapshot").agg(
            F.max(F.struct("n_matches", "offset")).alias("__best")
        )
        rep_hits = best.select(
            "id",
            "store_id",
            "snapshot",
            F.col("__best.offset").alias("offset"),
            F.col("__best.n_matches").alias("n_matches"),
        ).filter(F.col("n_matches") >= min_matches)
        if n_dup_groups == 0:
            return rep_hits
        # expand: every member of a duplicated batch digest inherits its
        # representative's store matches verbatim
        rep_to_d = groups.select(F.col("__rep").alias("id"), F.struct(*_D).alias("__d"))
        members = digests.select(F.col("id").alias("__mid"), F.struct(*_D).alias("__d"))
        return (
            rep_hits.join(rep_to_d, "id")
            .join(members, "__d")
            .select(
                F.col("__mid").alias("id"),
                "store_id",
                "snapshot",
                "offset",
                "n_matches",
            )
        )

    def flag_batch(
        self,
        df: DataFrame,
        content_col: str,
        id_col: str,
        min_matches: int = 8,
        flag_col: str = "dup_of_store",
    ) -> DataFrame:
        """``df`` plus boolean ``flag_col``: True when the clip near-dups
        ANY stored clip (flag-don't-drop)."""
        hits = (
            self.match_against(df, content_col, id_col, min_matches)
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
        becomes a vacuum-able orphan."""
        snaps = self.manifest["snapshots"]
        entry = next((s for s in snaps if s["name"] == snapshot), None)
        if entry is None:
            raise ValueError(f"snapshot {snapshot!r} not in store")
        self.manifest["snapshots"] = [s for s in snaps if s["name"] != snapshot]
        self.manifest["n_clips"] -= entry["n_clips"]
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

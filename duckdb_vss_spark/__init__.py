"""duckdb_vss_spark — a PySpark-native vector-similarity analytics engine
with the query surface of DuckDB's vss extension (see SURVEY.md), built
Spark-first: declarative DataFrame plans, Arrow-batched numpy kernels where
Python is unavoidable, per-partition immutable index artifacts.
"""

from .functions.distance import (  # noqa: F401
    array_cosine_distance,
    array_cosine_similarity,
    array_distance,
    array_distance_sq,
    array_inner_product,
    array_negative_inner_product,
    distance_expr,
)
from .operators.knn import knn_join, knn_join_flat, knn_match  # noqa: F401
from .operators.topk import grouped_topk, max_by_k, min_by_k, topk  # noqa: F401
from .operators.web import (  # noqa: F401
    extract_html_text,
    extract_image_links,
    filter_domain_blocklist,
    normalize_url,
    parse_url_parts,
    per_domain_budget_cap,
    per_domain_cap,
    registered_domain,
)
from .sources.warc import read_warc  # noqa: F401
from .session import get_spark  # noqa: F401
from .engine import VSSEngine  # noqa: F401
from .index.catalog import BinderException, IndexCatalog  # noqa: F401
from .index.ivf import IVFIndex, build_ivf  # noqa: F401
from .index.dedup_store import MinHashStore  # noqa: F401
from .index.audio_store import AudioFingerprintStore  # noqa: F401
from .index.image_store import ImageHashStore  # noqa: F401
from .index.video_store import VideoFingerprintStore  # noqa: F401
from .sql import SQLFrontend  # noqa: F401
from .operators.dedup import (  # noqa: F401
    duplicated_span_profile,
    hamming_pairs,
    duplicated_spans,
    remove_duplicated_spans,
    line_dedup,
    minhash_per_doc,
    embedding_neardup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    semdedup,
    simhash_pairs,
)
from .operators.skew import salted_agg, salted_join  # noqa: F401
from .operators.sampling import (  # noqa: F401
    chunk_documents,
    dsir_resample,
    dsir_weights,
    hash_split,
    pack_sequences,
    rank_split,
    shuffle_shard,
    stratified_sample,
    temperature_rates,
    temperature_sample,
    write_shuffled_shards,
)
from .operators.profile import corpus_stats, heavy_hitters  # noqa: F401
from .functions.bpe import BPETokenizer, train_bpe  # noqa: F401
from .operators.ranking import bm25_rank, mmr_rerank, rrf_fuse, tfidf_top_terms  # noqa: F401
from .operators.quality import (  # noqa: F401
    classifier_score,
    clean_lines,
    decontaminate,
    gopher_quality_flags,
    ngram_lm_score,
    pii_stats,
    redact_pii,
    repetition_stats,
    stupid_backoff_score,
)
from .operators.graph import connected_components, dedup_clusters, pagerank  # noqa: F401
from .operators.image import (  # noqa: F401
    dhash,
    frame_phash,
    image_neardup_pairs,
    phash,
    video_neardup_pairs,
)
from .operators.audio import (  # noqa: F401
    audio_embedding,
    audio_features,
    audio_neardup_pairs,
    block_fingerprint,
    fingerprint_keys,
    landmark_fingerprint,
    resample_audio,
    split_on_silence,
)
from .pipelines import (  # noqa: F401
    audio_curate,
    image_curate,
    video_curate,
    image_text_pairs,
    image_text_curate,
    c4_clean,
    ccnet_curate,
    refinedweb_curate,
    semantic_curate,
)
from .broadcasts import release_tracked_persists as release_caches  # noqa: F401
from .operators.temporal import asof_join, range_join_banded, sessionize_batch  # noqa: F401
from .operators.vector import (  # noqa: F401
    covariance_matrix,
    group_centroids,
    kmeans_fit,
    kmeans_step,
    nearest_centroid,
    normalize_vectors,
    pca_fit,
    pca_project,
)

__version__ = "0.1.0"

from .knn import knn_join, knn_join_flat, knn_match  # noqa: F401
from .temporal import asof_join, range_join_banded, sessionize_batch  # noqa: F401
from .topk import grouped_topk, max_by_k, min_by_k, topk  # noqa: F401
from .web import (  # noqa: F401
    filter_domain_blocklist,
    normalize_url,
    parse_url_parts,
    per_domain_cap,
    registered_domain,
)
from .vector import group_centroids, nearest_centroid, normalize_vectors  # noqa: F401

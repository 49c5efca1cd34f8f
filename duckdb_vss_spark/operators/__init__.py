from .knn import knn_join, knn_join_flat, knn_match  # noqa: F401
from .topk import max_by_k, min_by_k, topk  # noqa: F401

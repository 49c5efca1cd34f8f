from .catalog import BinderException, IndexCatalog, validate_options  # noqa: F401
from .hnsw import GraphIndex, build_graph  # noqa: F401
from .ivf import IVFIndex, build_ivf, kmeans  # noqa: F401

"""simple_map_reduce_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of MinhPhan8803/simple-map-reduce
(SURVEY.md), plus LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB scale.
"""

from .session import get_session
from .catalog import Catalog
from .engine import MapleJuice
from .operators.dedup import NearDupIndex
from .operators.retrieval import Bm25Index
from .operators.sampling import shuffle_positions, split_assign, stratified_sample
from .operators.similarity import IvfIndex, ivf_capacity
from .operators.spans import span_dedup

__all__ = [
    "get_session",
    "Catalog",
    "MapleJuice",
    "NearDupIndex",
    "IvfIndex",
    "Bm25Index",
    "ivf_capacity",
    "shuffle_positions",
    "split_assign",
    "stratified_sample",
    "span_dedup",
]
__version__ = "0.1.0"

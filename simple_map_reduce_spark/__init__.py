"""simple_map_reduce_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of MinhPhan8803/simple-map-reduce
(SURVEY.md), plus LLM-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) designed for 100 TB scale.
"""

from .session import get_session
from .catalog import Catalog
from .engine import MapleJuice
from .operators.dedup import NearDupIndex

__all__ = ["get_session", "Catalog", "MapleJuice", "NearDupIndex"]
__version__ = "0.1.0"

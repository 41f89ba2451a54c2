"""hangarbay_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference FAA-registry tool, rebuilt
Spark-first (DataFrame/SQL + Catalyst), plus large-scale training-data
pipeline operators (dedup, similarity search, text analysis, multimodal).
"""

from hangarbay_spark.session import get_spark

__version__ = "0.1.0"

__all__ = ["get_spark", "__version__"]

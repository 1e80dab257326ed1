"""aeon_mecha_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of SainsburyWellcomeCentre/aeon_mecha.

Built Spark-first: the reference's DataJoint relational algebra, chunked
time-series loading, incremental populate() pipeline, and domain transforms
are re-expressed as Catalyst-optimizable DataFrame plans over Parquet —
plus large-scale training-data pipeline operators (dedup, similarity
search, multimodal columns, text analysis) designed for 100 TB.

Layout
------
- ``session``    SparkSession factory tuned for the target cluster shape.
- ``catalog``    table registry + testdata loading helpers.
- ``query``      DataJoint-semantics relational algebra over DataFrames
                 (restrict / anti / join / proj / aggr / union / top / U).
- ``functions``  scalar function library (HARP time, hashing, text, vector).
- ``operators``  domain operators (stats, QC, sessionization, interval &
                 as-of joins, regression, IMU merge, position, spikes).
- ``sources``    reader registry + chunked raw-stream load().
- ``pipeline``   incremental orchestrator (tiers, key_source, populate).
- ``streaming``  Structured Streaming equivalents of the chunk pipeline.
- ``datapipe``   LLM-data-pipeline ops: dedup, similarity, text analysis,
                 multimodal column plumbing.
"""

__version__ = "0.1.0"

from aeon_mecha_spark.session import get_spark  # noqa: F401

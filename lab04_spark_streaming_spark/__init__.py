"""lab04_spark_streaming_spark — a PySpark-native analytics engine.

A brand-new, Spark-first re-expression of the capabilities of the reference
repo ``NTHung2034/Lab04-Spark_Streaming`` (a 3-stage Kafka/Structured-
Streaming pipeline computing sliding-window moving statistics and z-scores
over a price tick stream), widened to a general batch/streaming analytics
surface plus LLM-training-data-pipeline operators (dedup, similarity
search, multimodal columns, text analysis).

Design stance (see SURVEY.md §7):
  * DataFrame/SQL everywhere; Catalyst + Tungsten pick physical plans.
  * Operators are composable functions ``DataFrame -> DataFrame`` that are
    mode-agnostic: the same operator body serves batch tests and
    Structured Streaming pipelines.
  * UDFs only where built-ins can't express the semantics, and then
    Arrow-batched (pandas) — never row-at-a-time Python in a hot path.
  * Every operator documents its shuffle/partitioning behavior for the
    100 TB / 1000-executor target.
"""

__version__ = "0.1.0"

from lab04_spark_streaming_spark.session import get_spark  # noqa: F401

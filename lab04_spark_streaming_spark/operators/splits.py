"""Conditional split restoration (r15, from the r14 verdict).

Several CPU-dense pipelines (minhash/simhash/jaccard shingling, the
bootstrap replicate fan-out) read relations that on the local fixtures
arrive as ONE parquet row group = one input split, serializing the
expensive pass on a single task.  r14 fixed that with unconditional
``repartition(defaultParallelism, id)`` calls — correct locally, but at
cluster scale inputs arrive multi-split and the repartition ADDS a full
shuffle of row-proportional payloads (document text) in front of the
pipeline for nothing.

``restore_splits`` applies the repartition only when the relation's
actual partition count cannot feed the session's cores, mirroring the
guard ``plans/reference_parity.py`` uses for the moving-stats union: a
no-op on multi-split cluster inputs, the same plan as before on the
one-row-group local fixture.  The key is hashed DETERMINISTICALLY (the
column itself, never round-robin) so task retries reproduce the same
row placement (guide §2.5 / SPARK-38388) and no sort-before-repartition
is paid.

``df.rdd.getNumPartitions()`` is eager driver-side work at plan-build
time; for the scan(+filter) plans it is applied to here it is a cheap
metadata conversion (r14 ADVICE adjudication — acceptable for classic
PySpark; a Spark Connect port would derive the count from file
metadata instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def restore_splits(df: DataFrame, key: str | Column) -> DataFrame:
    """Hash-repartition ``df`` to the session parallelism on ``key``,
    but only when its scan delivers fewer splits than there are cores."""
    cores = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= cores:
        return df
    return df.repartition(cores, F.col(key) if isinstance(key, str) else key)

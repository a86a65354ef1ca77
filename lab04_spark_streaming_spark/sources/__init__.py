from lab04_spark_streaming_spark.sources.files import load_table, load_tables  # noqa: F401

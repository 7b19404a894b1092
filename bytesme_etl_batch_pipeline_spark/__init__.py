"""bytesme_etl_batch_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the dataflow semantics of the
reference ETL pipeline (``cahoivuotthac/bytesme-etl-batch-pipeline``), extended
with the LLM-training-data operators (dedup, similarity search, multimodal
columns, text analysis) a 100 TB pipeline needs.

Design tenets
-------------
* Every transform is a pure ``DataFrame -> DataFrame`` function, so each is
  composable under Catalyst and reusable under Structured Streaming.
* Built-in ``pyspark.sql.functions`` in hot paths; Arrow-batched pandas UDFs
  only where JVM expressions genuinely cannot express the semantics.
* Determinism is a contract: random ops derive values from
  ``xxhash64(stable_key, seed)``; timestamps are parameters, never
  ``datetime.now()``.
"""

__version__ = "0.1.0"

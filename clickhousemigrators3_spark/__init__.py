"""clickhousemigrators3_spark — a PySpark-native analytics + migration engine.

A ground-up, Spark-first re-expression of the capabilities of the reference
``sxfang32/ClickhouseMigratorS3`` (a ClickHouse local→S3 partition-migration
orchestrator; see SURVEY.md), extended with the operator set a large-scale
LLM-training-data pipeline needs: dedup (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search, text analysis,
event windowing and streaming.

Design stance (100 TB posture):

* Everything is declared with the DataFrame / SQL API so Catalyst handles
  predicate pushdown, column pruning, partition pruning and join planning.
* The driver only ever sees *metadata* (partition lists, counts, checksums) —
  never row data — mirroring the reference's server-side ``INSERT…SELECT``
  property (reference ``migration.py:473-477``).
* Validation is a single distributed grouped-count/checksum join, not N
  per-partition scalar queries (reference ``validator.py:24-34`` does 2
  ``count(*)`` round-trips per partition; we do one job for all partitions).
* Python UDFs are confined to the multimodal stubs; every hot-path operator
  uses built-in JVM expressions (higher-order array functions for cosine,
  ``xxhash64``/``md5`` for sketches).
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

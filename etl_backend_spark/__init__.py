"""etl_backend_spark — a PySpark-native analytics engine with the query
semantics of the Vikashmahto45/etl-backend reference (a Prisma/Postgres
marketplace backend), rebuilt Spark-first for horizontal scale.

Layout
------
- ``session``    : tuned SparkSession factory (AQE, broadcast, Arrow).
- ``sources``    : table catalog (explicit schemas, parquet loaders), JSON and
                   binary-file ingestion.
- ``operators``  : pure ``DataFrame -> DataFrame`` relational operators, one
                   per SURVEY.md §2 ID (scans, filters, joins, aggregates,
                   windows, pagination, set ops).
- ``functions``  : scalar/column functions (§2.7), text analysis, vector math.
- ``plans``      : the dynamic query builder (the reference's Prisma-argument
                   "IR") and the marketplace facade.
- ``etl``        : batch write operators (append/update/delete/upsert/cascade)
                   over immutable parquet with atomic swap (§2.8).
- ``streaming``  : Structured Streaming pipelines (chat ingest, event-time
                   windows) (§2.9).
- ``llm``        : LLM-data-pipeline extensions — dedup (exact/minhash/simhash/
                   ngram), similarity search, text quality, multimodal columns.
- ``registry``   : the oracle-checkable query registry backing
                   ``__spark_entry__.py``.
"""

__version__ = "0.1.0"

"""opensea_datapipeline_spark — a PySpark-native analytics engine.

A brand-new engine providing the query and data-processing capabilities of
the reference repo QingShen1215/OpenSea-DataPipeline (a Polars/DuckDB NFT
marketplace ETL + analytics codebase), re-expressed Spark-first:

- declarative DataFrame / Spark SQL plans (Catalyst optimizes pushdown,
  pruning, join strategy),
- shuffle-conscious operator implementations designed for a multi-executor
  cluster at 100 TB scale (tested locally on small scale factors),
- Structured Streaming for the stream-shaped event log,
- LLM-data-pipeline extensions: dedup (exact/MinHash/SimHash), similarity
  search, text analysis, multimodal column plumbing.

Subpackages
-----------
- ``sources``   : readers/writers (CSV union-by-name, Parquet, JSON, ...)
- ``operators`` : cleaning, aggregates, windows, joins, dedup, similarity,
                  text analysis, validation
- ``functions`` : reusable column expressions (vector math, datetime, text)
- ``streaming`` : Structured Streaming variants of the batch aggregates
- ``plans``     : plan inspection / explain helpers
"""

__version__ = "0.1.0"

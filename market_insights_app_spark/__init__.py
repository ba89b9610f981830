"""market_insights_app_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first implementation of the query and
data-processing capabilities of the reference application
``mrayirebi/market-insights-app`` (FastAPI + SQLite + browser-side JS
analytics), re-expressed as DataFrame / SQL / Structured Streaming
plans, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing)
the reference lacks.

Layout
------
- ``session``    : SparkSession builder tuned for the workload
- ``schemas``    : explicit StructType registry (reference db.py DDL analog)
- ``sources``    : parquet table loaders + HTTP-quote connector parsing
- ``functions``  : scalar/text column-expression library (F1-F19, text ops)
- ``operators``  : relational operators (filters, windows, joins, aggs,
                   dedup, similarity, pagination, multimodal)
- ``streaming``  : Structured Streaming surface (ST1-ST5)
- ``plans``      : the query registry consumed by ``__spark_entry__.py``
"""

__version__ = "0.1.0"

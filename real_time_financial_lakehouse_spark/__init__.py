"""PySpark-native analytics engine with the query and data-processing
capabilities of propaper12/Real-Time-Financial-Lakehouse ("QuantFlow AI").

The reference (at /root/reference/) is a 5-stage real-time financial
lakehouse: Binance trades -> Kafka -> Spark Structured Streaming bronze ->
stateful sliding-window silver with inline ML inference -> dbt/DuckDB gold
rollup -> pandas dashboard indicators.  This package re-expresses that whole
query surface Spark-first (DataFrame/SQL + Structured Streaming), plus the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Layout:
    session    - tuned SparkSession builder (AQE, shuffle partitions, Arrow)
    schemas    - explicit StructType schemas (reference declares schemas
                 explicitly, consumer_lake.py:29-34; we keep that discipline)
    catalog    - fixture-table loaders (/root/testdata/sf*/)
    operators/ - the SURVEY.md section-2 operator inventory as composable
                 DataFrame builders
    functions/ - reusable column-expression builders (indicators, hashing)
    streaming/ - bronze/silver medallion streaming pipelines
    ml/        - VectorAssembler + LinearRegression train/infer pair
"""

__version__ = "0.1.0"

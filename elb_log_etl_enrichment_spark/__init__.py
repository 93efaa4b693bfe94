"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference ELB-log ETL pipeline
(catgempesaw/elb-log-etl-enrichment, surveyed in SURVEY.md), rebuilt
Spark-first: declarative DataFrame/SQL plans optimized by Catalyst,
designed for multi-executor scale (broadcast joins for small dims,
single-shuffle window pipelines, partitioned parquet sinks).

Layout (SURVEY.md §7):
    session     SparkSession factory + engine confs
    sources/    scans: testdata tables, ALB log text parser, geo cache, HTTP geo
    functions/  scalar/column function library (time, UA, text, vectors)
    operators/  relational + extension operators (enrich, windows, dedup,
                similarity, as-of join, aggregates)
    plans/      composed pipelines + the driver-facing query registry
    sinks/      writers (partitioned parquet, csv)
    streaming/  Structured Streaming tier (session windows, tumbling aggs)
"""

__version__ = "0.1.0"

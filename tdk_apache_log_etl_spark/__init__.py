"""tdk_apache_log_etl_spark — a PySpark-native analytics engine.

A brand-new, Spark-first implementation of the query and data-processing
capabilities of the reference repo ``sreedharchalavadi/tdk-apache-log-etl``
(an AWS Lambda + Glue + Oracle Apache-access-log ETL), extended with the
operators a large-scale (100 TB) training-data pipeline needs: dedup
(exact / MinHash-LSH / SimHash / n-gram Jaccard), embedding similarity
search, multimodal binary columns, and text analysis.

Design rules (applied everywhere):
  * DataFrame / Spark SQL only — the logical plan is declared, Catalyst and
    Tungsten pick the physical strategy. No RDDs.
  * No Python UDFs on hot paths: parsing, hashing, aggregation are native
    column expressions (whole-stage-codegen friendly). Pandas UDFs
    (Arrow-batched) only where array/bit manipulation genuinely needs numpy
    (SimHash) or where the op is a stub for an external library (multimodal
    decode).
  * No driver-side collection except final small results.
  * Broadcast joins for dimension tables, AQE for skew, partition-pruned
    reads for the date-partitioned staging table.
"""

__version__ = "0.1.0"

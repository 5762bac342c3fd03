"""file_appender_spark — a PySpark-native analytics engine.

A brand-new engine with the capabilities of the reference CDAP plugin
``file-appender`` (HDFS File Appender Sink, see /root/reference,
FileAppenderSink.java) re-expressed Spark-first, plus a full relational
query surface and LLM-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns), every operator designed
for 100 TB scale.

Layout
------
- ``session``     : SparkSession factory (AQE + Arrow on, UTC).
- ``schema``      : schema loader / validation / Hive-DDL mapping
                    (reference A4-A7 semantics).
- ``serialize``   : record -> delimited-text-line expression builder
                    (reference transform(), FileAppenderSink.java:125-147).
- ``sinks``       : append-text sink with size/age rotation
                    (reference AppendOutputFormat.java), parquet helpers.
- ``sources``     : table catalog over the driver parquet dirs, csv/json
                    readers matching the reference's Explore re-read path.
- ``operators``   : as-of join, top-k, dedup, similarity, text stats,
                    multimodal, sessionize.
- ``queries``     : the declared query inventory (SURVEY.md §2 Part B):
                    every entry is a (spark_fn, oracle_sql) pair checked
                    against DuckDB by the driver.
- ``streaming``   : Structured Streaming ops over the events table.
"""

__version__ = "0.1.0"

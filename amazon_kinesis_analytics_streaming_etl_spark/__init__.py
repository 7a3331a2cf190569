"""PySpark-native streaming ETL + analytics engine.

A brand-new engine with the query and data-processing capabilities of
``aws-samples/amazon-kinesis-analytics-streaming-etl`` (a Flink 1.11
DataStream job), re-expressed Spark-first:

- ``session``    — SparkSession factory (AQE, UTC, arrow, sane shuffle sizing)
- ``schemas``    — declared StructType schemas (TripEvent + TESTDATA tables)
- ``config``     — reference-compatible config resolution (C1)
- ``operators``  — parse/serialize projections, dedup, similarity, text,
                   multimodal column plumbing
- ``functions``  — scalar/vector/text column expression library (JVM-side)
- ``streaming``  — sources (Kinesis/Kafka/file/rate), sinks (partitioned
                   files, Kafka, Kinesis, keyed-upsert, noop), fan-out
- ``plans``      — batch query catalog + streaming pipeline assembly

Reference parity map (SURVEY.md §2A): every reference operator S1-S3,
P1-P3, R1, K1-K8, C1, X1-X2 has a counterpart here; docstrings cite the
reference file:line they mirror.
"""

__version__ = "0.1.0"

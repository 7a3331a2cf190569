"""Sources: streaming (Kinesis/Kafka/file/rate — S1-S3) and batch scans
(parquet/json/csv with declared schemas)."""

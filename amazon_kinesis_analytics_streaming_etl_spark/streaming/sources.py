"""Back-compat shim: streaming sources moved to
``amazon_kinesis_analytics_streaming_etl_spark.sources.streaming``."""

from ..sources.streaming import (  # noqa: F401
    RAW_VALUE_SCHEMA,
    SOURCE_BUILDERS,
    file_source,
    kafka_source,
    kinesis_source,
    rate_source,
    resolve_source,
    synthetic_trip_event_json,
    validate_source_config,
)

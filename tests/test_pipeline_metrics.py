"""Pipeline observability (streaming/metrics.py): per-batch throughput
from progress events + observed valid-row counts -> parse-health and
keep-up rollups (the reference's CloudWatch dashboard analog)."""

from __future__ import annotations

import glob
import json
import time

from amazon_kinesis_analytics_streaming_etl_spark.plans.pipeline import Pipeline
from amazon_kinesis_analytics_streaming_etl_spark.streaming.metrics import (
    PipelineMetricsListener,
)


def _write_events(path, n_valid, n_corrupt):
    base = {
        "vendor_id": 1, "pickup_datetime": "2018-11-23T20:30:14",
        "dropoff_datetime": "2018-11-23T20:41:02", "passenger_count": 1,
        "trip_distance": 2.3, "ratecode_id": 1, "store_and_fwd_flag": "N",
        "pickup_location_id": 5, "dropoff_location_id": 2, "payment_type": 1,
        "fare_amount": 10.5, "extra": 0.5, "mta_tax": 0.5, "tip_amount": 2.0,
        "tolls_amount": 0.0, "improvement_surcharge": 0.3, "total_amount": 14.0,
        "trip_id": 1, "type": "trip", "padding": "",
    }
    with open(path, "w") as f:
        for i in range(n_valid):
            f.write(json.dumps({**base, "trip_id": i}) + "\n")
        for i in range(n_corrupt):
            f.write(f"CORRUPT LINE {i} {{{{\n")


def test_metrics_capture_throughput_and_parse_health(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_events(src / "a.json", n_valid=30, n_corrupt=4)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    pipe = Pipeline.from_config(spark, args=[
        "--InputFilePath", str(src), "--OutputBucket", out,
        "--ParquetConversion", "true", "--CheckpointLocation", ckpt,
    ])
    listener = pipe.attach_metrics()
    try:
        q = pipe.start(available_now=True)
        q.awaitTermination()
        # progress events are delivered asynchronously to listeners
        deadline = time.time() + 20
        while time.time() < deadline and not any(
            b["input_rows"] > 0 and b["valid_rows"] is not None
            for b in listener.batches
        ):
            time.sleep(0.2)

        snap = listener.snapshot()
        assert snap["input_rows"] == 34
        assert snap["valid_rows"] == 30
        assert snap["corrupt_rows"] == 4
        assert snap["batches"] >= 1
        # the sink really wrote exactly the valid rows
        written = spark.read.parquet(glob.glob(f"{out}/job_start=*")[0]).count()
        assert written == 30
    finally:
        spark.streams.removeListener(listener)


def test_keepup_ratio_rollup():
    listener = PipelineMetricsListener()
    listener.batches = [
        {"batch_id": 0, "input_rows": 10, "processed_rows_per_sec": 1e3,
         "trigger_ms": 500, "valid_rows": 10},
        {"batch_id": 1, "input_rows": 10, "processed_rows_per_sec": 1e3,
         "trigger_ms": 1500, "valid_rows": 9},
        {"batch_id": 2, "input_rows": 0, "processed_rows_per_sec": 0.0,
         "trigger_ms": 5, "valid_rows": 0},  # idle batch excluded
    ]
    snap = listener.snapshot(trigger_interval_ms=1000)
    assert snap["batches"] == 2
    assert snap["input_rows"] == 20 and snap["valid_rows"] == 19
    assert snap["corrupt_rows"] == 1
    assert snap["keepup_ratio"] == 0.5

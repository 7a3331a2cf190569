"""Runnable-job entry point — the ``StreamingEtl.main(args)`` analog
(StreamingEtl.java:78-151):

    python -m amazon_kinesis_analytics_streaming_etl_spark \\
        --InputFilePath /data/in --OutputBucket /data/out \\
        --ParquetConversion true --CheckpointLocation /ckpt

Accepts exactly the reference's parameter names (config.py), builds the
session, assembles the fan-out pipeline, attaches the metrics listener
(the dashboard analog), and runs until terminated. ``--AvailableNow
true`` drains the currently-available input and exits (deterministic
batch/backfill mode); otherwise the query runs continuously like the
reference job.
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    args = list(sys.argv[1:] if argv is None else argv)
    from .plans.pipeline import Pipeline
    from .session import get_spark

    spark = get_spark("streaming-etl")
    pipe = Pipeline.from_config(spark, args=args)
    listener = pipe.attach_metrics()
    available_now = pipe.cfg.get_bool("AvailableNow", default=False)
    query = pipe.start(available_now=available_now)
    try:
        query.awaitTermination()
    except KeyboardInterrupt:  # pragma: no cover - interactive stop
        query.stop()
    snap = listener.snapshot()
    print(f"streaming-etl finished: {snap}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

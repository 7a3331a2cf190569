"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}. The final line is fitted to the
driver's ~2000-byte stdout tail capture (section rates + keep-up
booleans inline, full section dicts on the preceding "full_contract"
detail line) so BENCH_r{N}.json always parses whole.

Also measures the streaming keep-up analog (BASELINE.md): synthetic
TripEvent JSON parse -> partition-column derivation -> partitioned
Parquet, reported as records/sec under "etl" (extra key; the required
contract fields are unchanged).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The first 30 entries (through stream_static_enrich) are the COMMON-30:
# the suite as of round 4, unchanged since, and the series every round's
# drift analysis compares against. Later additions append AFTER them (and
# execute after them), and the contract line reports "common30_total"
# separately from the full-suite total so suite growth can never silently
# shift the comparable number (VERDICT r6 #1).
COMMON30_COUNT = 30

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_volume_customer",
    "q21_waiting_orders",
    "join_enrich_events",
    "window_running_sum",
    "topk_global",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "sim_topk_bruteforce",
    "sim_topk_lsh",
    "text_stats",
    "text_langid",
    "asof_join_events",
    "time_bucket_rollup",
    "sessionize_events",
    "window_topk_per_group",
    "curation_sample",
    "text_repetition",
    "decontam_overlap",
    "interval_join_batch",
    "cdc_merge_customers",
    "funnel_stages",
    "gapfill_hourly",
    "stream_tumbling_counts",
    "stream_static_enrich",
    # round 5 additions (cheap; keep earlier entries' series comparable)
    "heavy_hitters_lang",
    "sample_weighted_topn",
    "rolling_window_features",
    "drift_psi",
    "stream_chained_agg",
    # round 6 additions (cheap; the heavy ETL-topology gates — fan-out,
    # connector roundtrips, partition-layout — run in the correctness
    # sweep, not here, to keep the headline series comparable)
    "parse_dead_letter",
    "serialize_projection_contract",
    "sketch_theta_audience",
    "sketch_cms_freq",
    # round 7 additions (cheap; the heavier new ops — alternating-star
    # CC, IVF-PQ with its training, winnowing overlap — run in the
    # correctness sweep, not here, to keep the headline series
    # comparable)
    "dedup_span_coverage",
    "sketch_tdigest_rollup",
    "stream_tdigest_percentiles",
    # late round 7: bloom prefilter gate (cheap); graph_pagerank runs in
    # the correctness sweep, not here (its localCheckpoint supersteps
    # are deliberate multi-job work, not a headline-latency shape)
    "join_bloom_prefilter",
    # late round 7, second wave (cheap single-shuffle analytics; the
    # iterative graph ops — BFS, k-core — and the global-rank equi-depth
    # histogram run in the correctness sweep, not here, same rule as
    # graph_pagerank above)
    "markov_event_transitions",
    "scd2_state_runs",
    "anomaly_mad_robust",
    # round 8 additions (cheap single-pass/bounded-domain shapes; the
    # heavier new ops — hard-negative mining's QxN scan, the hypothesis
    # sessionizer — run in the correctness sweep, not here, same rule
    # as earlier rounds)
    "stats_welch_ttest",
    "ts_theilsen_slope",
    "stats_weighted_median",
    "asof_join_nearest",
    "pipeline_curation_e2e",
    # round 9 additions (cheap single-pass/bounded-domain shapes: the
    # forward as-of direction and the distributional-testing family)
    "asof_join_forward",
    "stats_ks_two_sample",
    "stats_kruskal_wallis",
    "privacy_k_anonymity",
    "dq_freshness_lag",
    "attribution_time_decay",
    "embedding_drift_shift",
    # round 9 late window (cheap codegen/bounded shapes: geo geometry is
    # pure expression work, MMR's greedy is a bounded 30-row grouped-map,
    # Holt folds the calendar-bounded hourly array; the heavier new ops —
    # the 64-replicate bootstrap, DSIR's double token pass, grid DBSCAN's
    # CC rounds, HITS supersteps — run in the correctness sweep, not
    # here, same rule as earlier rounds)
    "geo_grid_hotspots",
    "geo_geohash_hotspots",
    "geo_zone_cell_join",
    "geo_nearest_poi",
    "ts_holt_linear",
    "sim_mmr_rerank",
    "text_token_fertility",
]


def bench_etl_throughput(spark, n_records: int = 200_000) -> dict:
    """Parse -> partition -> parquet throughput on synthetic TripEvent
    JSON (the reference's keep-up criterion: >=16k rec/s sustained,
    BASELINE.md)."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.operators.parse import (
        parse_trip_events,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.sinks import (
        write_file_sink_batch,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.sources import (
        synthetic_trip_event_json,
    )

    out = tempfile.mkdtemp(prefix="bench_etl_")
    warm = tempfile.mkdtemp(prefix="bench_etl_warm_")
    try:
        raw = spark.range(n_records).select(
            synthetic_trip_event_json(
                F.col("id"),
                F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400),
            ).alias("value")
        )
        # Warm the write path (committer + parquet writer init dominate the
        # first partitioned write: ~3s once-off vs ~1.5s steady-state for
        # 200k rows). The keep-up criterion is SUSTAINED throughput, and the
        # streaming measure below already drops its first batch for the same
        # reason — measure the ETL the same way.
        write_file_sink_batch(
            parse_trip_events(raw.limit(1_000)), warm, parquet=True
        )
        t0 = time.time()
        events = parse_trip_events(raw)
        write_file_sink_batch(events, out, parquet=True)
        dt = time.time() - t0
        return {"records": n_records, "sec": round(dt, 3), "recs_per_sec": round(n_records / dt)}
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(warm, ignore_errors=True)


def bench_streaming_keepup(
    spark,
    records_per_batch: int = 200_000,
    n_batches: int = 5,
) -> dict:
    """Real Structured Streaming keep-up run over a BOUNDED pre-generated
    input: TripEvent JSON files -> file-source stream (one file per
    micro-batch) -> parse -> partitioned Parquet, availableNow trigger.

    availableNow drains every file then terminates on its own — no
    mid-batch ``q.stop()``, so teardown cannot abort an in-flight write
    task and spray InterruptedException noise into the driver's captured
    output (the r1 failure mode: BENCH_r01.json "parsed": null).

    Keep-up criterion unchanged from BASELINE.md: sustained processing
    rate >= 16k rec/s (the reference's 16-shard ingest ceiling).

    Batch sizing: 200k records/batch = 12.5 s of ingest at the 16k rec/s
    ceiling — well inside the reference's 60 s checkpoint/commit cadence
    (cdk/lib/streaming-etl.ts:146-151), and large enough that the fixed
    per-micro-batch cost (offset log, committer, 256 partition-dir file
    opens) is amortized the way a production-sized trigger would.
    """
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.operators.parse import (
        parse_trip_events,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.sources.streaming import (
        synthetic_trip_event_json,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.streaming.sinks import (
        file_sink_stream,
    )

    src = tempfile.mkdtemp(prefix="bench_stream_src_")
    out = tempfile.mkdtemp(prefix="bench_stream_")
    ckpt = tempfile.mkdtemp(prefix="bench_stream_ckpt_")
    try:
        n = records_per_batch * n_batches
        (
            spark.range(n)
            .select(
                synthetic_trip_event_json(
                    F.col("id"),
                    F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400),
                ).alias("value")
            )
            .repartition(n_batches)
            .write.mode("overwrite")
            .text(src)
        )
        raw = (
            spark.readStream.format("text")
            .option("maxFilesPerTrigger", 1)
            .load(src)
        )
        events = parse_trip_events(raw)
        q = (
            file_sink_stream(events, out, ckpt, parquet=True)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        batches = [
            p
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0 and p.get("batchDuration") is not None
        ]
        # drop the first batch (JVM/codegen warmup dominates it)
        if len(batches) > 1:
            batches = batches[1:]
        if not batches:
            return {"records_per_batch": records_per_batch, "keepup": False, "batches": 0}
        avg_batch_ms = sum(p["batchDuration"] for p in batches) / len(batches)
        processed = [
            p["processedRowsPerSecond"]
            for p in batches
            if p.get("processedRowsPerSecond")
        ]
        rate = round(sum(processed) / len(processed)) if processed else None
        baseline = 16_000
        keepup = rate is not None and rate >= baseline
        return {
            "records_per_batch": records_per_batch,
            "baseline_rec_per_sec": baseline,
            "avg_batch_ms": round(avg_batch_ms),
            "processed_rows_per_sec": rate,
            "keepup": keepup,
            "batches": len(batches),
        }
    finally:
        for d in (src, out, ckpt):
            shutil.rmtree(d, ignore_errors=True)


def _raw_operator_overrides():
    """The catalog entries for the approximate dedup/ANN queries now gate
    themselves against their exact twins (driver-checkable oracles), which
    roughly doubles their work. The bench times the OPERATOR — candidate
    generation + verification — not the gate harness, keeping the series
    comparable with earlier rounds."""
    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.operators.dedup import (
        minhash_near_dup_pairs,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.operators.similarity import (
        lsh_topk,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.plans.llm import LSH_PLANES
    from amazon_kinesis_analytics_streaming_etl_spark.schemas import read_sf_parquet

    def raw_minhash(spark, sf_dir):
        docs = read_sf_parquet(spark, sf_dir, "documents")
        return minhash_near_dup_pairs(docs, num_hashes=64, bands=16, k=3, threshold=0.5)

    def raw_sim_lsh(spark, sf_dir):
        emb = read_sf_parquet(spark, sf_dir, "embeddings")
        qvec = [
            float(x)
            for x in emb.where(F.col("vec_id") == 0).select("embedding").head()[0]
        ]
        return lsh_topk(emb, qvec, LSH_PLANES, k=10, probe_hamming=1)

    return {"dedup_minhash_lsh": raw_minhash, "sim_topk_lsh": raw_sim_lsh}


def _gen_replay_source(spark, model: str, d: str, n_parts: int, per_part: int) -> None:
    """Write the synthetic shard/partition files once per model — source
    generation is setup, not the thing being measured, so repeats reuse it."""
    import os

    from pyspark.sql import functions as F

    from amazon_kinesis_analytics_streaming_etl_spark.sources.streaming import (
        synthetic_trip_event_json,
    )

    fname = _replay_fname(model)
    total = n_parts * per_part
    rows = spark.range(total).select(
        (F.col("id") % n_parts).alias("part"),
        synthetic_trip_event_json(
            F.col("id"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400),
        ).alias("value"),
    )
    files = [open(os.path.join(d, fname(i)), "w") for i in range(n_parts)]
    for r in rows.toLocalIterator():
        files[r.part].write(r.value + "\n")
    for f in files:
        f.close()


def _replay_fname(model: str):
    return (
        (lambda i: f"shardId-{i:012d}.jsonl")
        if model == "kinesis"
        else (lambda i: f"partition-{i:05d}.jsonl")
    )


def _replay_events(spark, model: str, d: str):
    from amazon_kinesis_analytics_streaming_etl_spark.operators.parse import (
        parse_trip_events,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.sources.kafka_replay import (
        kafka_replay_stream,
    )
    from amazon_kinesis_analytics_streaming_etl_spark.sources.kinesis_replay import (
        kinesis_replay_stream,
    )

    if model == "kinesis":
        return parse_trip_events(kinesis_replay_stream(spark, d), value_col="data")
    return parse_trip_events(kafka_replay_stream(spark, d), value_col="value")


def _bench_replay_keepup(
    spark, model: str, src_dir: str, n_parts: int = 16, per_part: int = 25_000
) -> dict:
    """Keep-up through the engine's own replay Python Data Sources:
    ``model="kinesis"`` (sources/kinesis_replay.py, 16 shards — the
    reference's provisioned stream width, cdk/lib/streaming-etl.ts:69-71)
    or ``model="kafka"`` (sources/kafka_replay.py, 16 topic-partitions —
    the symmetric S2 execution model). Records replay through parse ->
    partitioned Parquet over a PRE-GENERATED ``src_dir``; shows each
    replay path itself clears the 16k rec/s shard-ceiling criterion, not
    just the JVM file source."""
    import os

    from amazon_kinesis_analytics_streaming_etl_spark.streaming.sinks import (
        file_sink_stream,
    )

    out = tempfile.mkdtemp(prefix=f"bench_{model}out_")
    ckpt = tempfile.mkdtemp(prefix=f"bench_{model}ckpt_")
    warm = tempfile.mkdtemp(prefix=f"bench_{model}warm_")
    fname = _replay_fname(model)
    try:
        total = n_parts * per_part
        events = _replay_events(spark, model, src_dir)
        # Warm the replay path before timing: the FIRST Python-data-source
        # stream in a session pays ~7s once-off (Python worker spin-up,
        # Arrow serializer + codegen, streaming committer init) that the
        # second model never sees — measured: whichever model ran first
        # clocked ~27-35k rec/s, whichever ran second ~56-86k, regardless
        # of which. The criterion is SUSTAINED keep-up, so measure
        # steady-state the same way bench_etl_throughput warms its write:
        # a 1k-record replay of shard/partition 0 into throwaway dirs.
        wsrc = os.path.join(warm, "src")
        os.makedirs(wsrc)
        with open(os.path.join(src_dir, fname(0))) as src, open(
            os.path.join(wsrc, fname(0)), "w"
        ) as dst:
            for _ in range(1000):
                dst.write(src.readline())
        wevents = _replay_events(spark, model, wsrc)
        wq = (
            file_sink_stream(wevents, os.path.join(warm, "out"),
                             os.path.join(warm, "ckpt"), parquet=True)
            .trigger(availableNow=True)
            .start()
        )
        wq.awaitTermination()
        t0 = time.time()
        q = (
            file_sink_stream(events, out, ckpt, parquet=True)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dt = time.time() - t0
        rate = round(total / dt)
        return {
            "partitions": n_parts,
            "records": total,
            "sec": round(dt, 3),
            "recs_per_sec": rate,
            "keepup": rate >= 16_000,
        }
    finally:
        for dd in (out, ckpt, warm):
            shutil.rmtree(dd, ignore_errors=True)


def bench_gate_costs(spark, sf_dir: str) -> dict:
    """Gate-cost transparency (VERDICT r4): for the approx queries whose
    catalog entries verify against exact twins in-plan, report the GATED
    timing (full twin) and the SAMPLED-gate timing
    (SPARK_GRAFT_GATE_SAMPLE_MOD=4 — exact twin on the md5 quarter-slice)
    alongside the raw-operator timings already in "queries". Shows gate
    cost is a knob, and keeps the headline series operator-only."""
    import os

    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    out: dict[str, dict] = {}
    for name in ("dedup_minhash_lsh", "sim_topk_lsh"):
        timings = {}
        for label, mod in (("gated_sec", None), ("gated_sampled4_sec", "4")):
            if mod is None:
                os.environ.pop("SPARK_GRAFT_GATE_SAMPLE_MOD", None)
            else:
                os.environ["SPARK_GRAFT_GATE_SAMPLE_MOD"] = mod
            t0 = time.time()
            QUERIES[name](spark, sf_dir).count()
            timings[label] = round(time.time() - t0, 3)
        os.environ.pop("SPARK_GRAFT_GATE_SAMPLE_MOD", None)
        out[name] = timings
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from amazon_kinesis_analytics_streaming_etl_spark.session import get_spark
    from amazon_kinesis_analytics_streaming_etl_spark.plans.catalog import QUERIES

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warmup (not counted).
    spark.read.parquet(f"{sf_dir}/nation.parquet").count()

    # Python-worker-pool warmup (not counted) — measurement fix, r12.
    # The first Arrow/pandas evaluation in a session forks the full
    # local[N] Python worker pool, each worker importing pandas/pyarrow;
    # measured 10-22 s of one-time session setup on a steal-heavy 32-core
    # host, all of it previously charged to whichever query hit the
    # Python boundary first (dedup_minhash_lsh in suite order — its
    # median read ~8 s while its steady-state runs read ~3 s). The JVM
    # warmup line above already established that one-time session setup
    # is not query work; this extends the same rule to the Python side.
    # One trivial pandas_udf over defaultParallelism partitions forks
    # every worker once; queries then measure computation, not forks.
    # (pandas is imported here, not at module top, so the type hints
    # resolve in this module's globals under `from __future__
    # import annotations` without paying the import before argv checks.)
    global pd
    import pandas as pd
    from pyspark.sql import functions as _F

    @_F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    (
        spark.range(spark.sparkContext.defaultParallelism * 1000)
        .repartition(spark.sparkContext.defaultParallelism)
        .select(_warm("id"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    # Each query runs SPARK_GRAFT_BENCH_REPEATS times (default 3) and the
    # MEDIAN is reported: a single-shot number on a shared machine mixes
    # real plan cost with GC pauses and whatever else the host is doing
    # (the r4 artifact showed +50-60% on three queries whose code had not
    # changed — contamination, not regression). Medians make the series
    # comparable round-over-round; per-run spreads go out under "runs" so
    # a noisy host is visible rather than silently absorbed.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    # SPARK_GRAFT_BENCH_SUBSET=common30 runs ONLY the round-4-era suite
    # (drift A/B experiments: common-30 alone vs embedded in the full
    # suite); SPARK_GRAFT_BENCH_QUERIES_ONLY=1 skips the ETL/streaming/
    # replay/gate sections for quick query-only comparisons.
    subset = os.environ.get("SPARK_GRAFT_BENCH_SUBSET", "")
    headline = HEADLINE[:COMMON30_COUNT] if subset == "common30" else HEADLINE
    queries_only = os.environ.get("SPARK_GRAFT_BENCH_QUERIES_ONLY") == "1"
    overrides = _raw_operator_overrides()
    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in headline:
        fn = overrides.get(name) or QUERIES[name]
        runs = []
        for _ in range(repeats):
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count() if not df.isStreaming else -1
            runs.append(time.time() - t0)
            _ = n
        runs.sort()
        timings[name] = round(runs[len(runs) // 2], 3)
        spreads[name] = [round(x, 3) for x in runs]

    gates = {} if queries_only else bench_gate_costs(spark, sf_dir)
    etl = {} if queries_only else bench_etl_throughput(spark)
    streaming = {} if queries_only else bench_streaming_keepup(spark)

    def replay_median(model: str) -> dict:
        # Same median-of-repeats discipline as the headline queries: the
        # 1k-record warm-up doesn't fully warm the partitioned-write path,
        # so a single-shot replay mixes ~20-30% residual cold-start into a
        # SUSTAINED-throughput criterion (measured 85k/118k/109k rec/s
        # across three back-to-back runs). Per-run rates ride along. The
        # source files generate once per model; only the replay is timed.
        src = tempfile.mkdtemp(prefix=f"bench_{model}src_")
        try:
            _gen_replay_source(spark, model, src, 16, 25_000)
            runs = [
                _bench_replay_keepup(spark, model, src) for _ in range(repeats)
            ]
        finally:
            shutil.rmtree(src, ignore_errors=True)
        runs.sort(key=lambda r: r["recs_per_sec"])
        med = dict(runs[len(runs) // 2])
        med["runs_rec_per_sec"] = [r["recs_per_sec"] for r in runs]
        return med

    kinesis_replay = {} if queries_only else replay_median("kinesis")
    kafka_replay = {} if queries_only else replay_median("kafka")

    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    # Teardown BEFORE printing: any executor shutdown noise lands on
    # stderr/stdout now, and the contract JSON is the last line emitted
    # (the driver tail-captures stdout; r1's artifact failed to parse
    # because teardown stack traces followed the JSON).
    spark.sparkContext.setLogLevel("FATAL")
    spark.stop()
    sys.stdout.flush()
    # Detail payloads go out on their OWN lines first: the driver's tail
    # capture is SIZE-BOUNDED (~2000 bytes of final stdout), and for two
    # rounds the full contract line (~5.2 KB with 65 queries + minmax +
    # section dicts) exceeded it, so BENCH_r10/r11.json recorded
    # "parsed": null with a truncated tail (r11 verdict #3). The FINAL
    # line is now a compact summary fitted to a 1900-byte budget; the
    # full sections/spreads/minmax survive on the detail lines and in
    # any locally-saved BENCH_LOCAL_r{N}.json.
    print(json.dumps({"detail": "per_run_spreads", "bench_repeats": repeats, "runs": spreads}))
    print(
        json.dumps(
            {
                "detail": "full_contract",
                "value": round(sum(timings.values()), 3),
                "queries": timings,
                "query_minmax": {n: [r[0], r[-1]] for n, r in spreads.items()},
                "etl": etl,
                "streaming": streaming,
                "kinesis_replay": kinesis_replay,
                "kafka_replay": kafka_replay,
                "gates": gates,
            }
        )
    )
    keepup_flags = {
        "etl": bool(etl) and etl.get("recs_per_sec", 0) >= 16_000,
        "streaming": bool(streaming) and bool(streaming.get("keepup")),
        "kinesis_replay": bool(kinesis_replay) and bool(kinesis_replay.get("keepup")),
        "kafka_replay": bool(kafka_replay) and bool(kafka_replay.get("keepup")),
    }
    summary = {
        "metric": "headline_suite_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "sf": sf_val,
        "queries": timings,
        "common30_total": round(
            sum(timings[n] for n in HEADLINE[:COMMON30_COUNT] if n in timings), 3
        ),
        "etl_recs_per_sec": etl.get("recs_per_sec") if etl else None,
        "streaming_rows_per_sec": (
            streaming.get("processed_rows_per_sec") if streaming else None
        ),
        "kinesis_replay_recs_per_sec": (
            kinesis_replay.get("recs_per_sec") if kinesis_replay else None
        ),
        "kafka_replay_recs_per_sec": (
            kafka_replay.get("recs_per_sec") if kafka_replay else None
        ),
        "keepup_all": all(keepup_flags.values()) if not queries_only else None,
        "bench_repeats": repeats,
    }
    # Fit the final line to the tail-capture budget by degrading query
    # precision, then (only if a future suite outgrows even 1dp) falling
    # back to the common-30 series with an explicit truncation flag —
    # the contract keys (metric/value/unit/queries/sf) are always whole.
    budget = 1900
    for dp in (3, 2, 1):
        summary["queries"] = {n: round(v, dp) for n, v in timings.items()}
        line = json.dumps(summary, separators=(",", ":"))
        if len(line) <= budget:
            break
    else:
        summary["queries"] = {
            n: round(timings[n], 1)
            for n in HEADLINE[:COMMON30_COUNT]
            if n in timings
        }
        summary["queries_truncated_to_common30"] = True
        line = json.dumps(summary, separators=(",", ":"))
    print(line)
    sys.stdout.flush()


if __name__ == "__main__":
    main()

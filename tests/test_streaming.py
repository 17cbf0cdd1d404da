"""Structured Streaming surface: watermark dedup, windowed stats, quality
counters -- exercised end-to-end with a file source + availableNow trigger."""

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from electricity_forecast_pipeline_airflow_k8s_spark.streaming.ingest import (
    dedup_late_data,
    incremental_ingest,
    session_windows,
    stream_quality_counts,
    windowed_stats,
)

SCHEMA = "period timestamp, respondent string, value double"


@pytest.fixture()
def stream_dir(spark, tmp_path):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=10 * i), region, float(100 + i))
        for region in ("CAL", "TEX")
        for i in range(60)
    ]
    # inject duplicates and a negative value
    rows += rows[:5]
    rows.append((base + dt.timedelta(minutes=30), "CAL", -7.0))
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    yield src
    shutil.rmtree(src, ignore_errors=True)


def _run(stream_df, tmp_path, name, output_mode="append"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .start()
    )
    q.awaitTermination(120)
    return stream_df.sparkSession.sql(f"SELECT * FROM {name}")


def test_watermark_dedup(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    out = _run(dedup_late_data(stream), tmp_path, "dedup_out")
    rows = out.collect()
    # 120 unique (region, ts) pairs + 1 extra CAL ts duplicate of an
    # existing minute-30 stamp? (-7 row shares CAL@00:30 with i=3 -> dedup)
    keys = {(r["respondent"], r["period"]) for r in rows}
    assert len(rows) == len(keys) == 120


def test_windowed_stats(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    # complete mode: emit every window each trigger (append mode would only
    # emit the watermark-closed prefix -- also asserted below)
    out = _run(
        windowed_stats(stream, window_duration="1 hour"),
        tmp_path,
        "win_out",
        output_mode="complete",
    )
    rows = {(r["respondent"], r["window_start"]): r for r in out.collect()}
    # 60 samples x 10min = 10h per region -> 10 tumbling windows per region
    assert len([k for k in rows if k[0] == "CAL"]) == 10
    cal0 = rows[("CAL", dt.datetime(2024, 1, 1, 0, 0))]
    assert cal0["n"] == 12  # 6 in-window + 5 duplicate re-arrivals + 1 negative
    assert cal0["min_value"] == -7.0


def test_windowed_stats_append_respects_watermark(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    out = _run(
        windowed_stats(stream, window_duration="1 hour"),
        tmp_path,
        "win_append_out",
        output_mode="append",
    )
    # max event 09:50, watermark 3h -> only windows ending <= 06:50 emitted
    cal = [r for r in out.collect() if r["respondent"] == "CAL"]
    assert len(cal) == 6
    assert max(r["window_end"] for r in cal) == dt.datetime(2024, 1, 1, 6, 0)


def test_session_windows(spark, tmp_path):
    # two bursts separated by 2h -> exactly 2 sessions per region
    base = dt.datetime(2024, 1, 1)
    rows = [
        (base + dt.timedelta(minutes=5 * i), "CAL", 1.0) for i in range(6)
    ] + [
        (base + dt.timedelta(hours=3, minutes=5 * i), "CAL", 1.0) for i in range(4)
    ]
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = _run(
        session_windows(stream, gap="30 minutes"),
        tmp_path,
        "sess_out",
        output_mode="complete",
    )
    sessions = sorted(
        (r["session_start"], r["n_events"]) for r in out.collect()
    )
    assert sessions == [
        (base, 6),
        (base + dt.timedelta(hours=3), 4),
    ]


def test_incremental_ingest_foreachbatch(spark, tmp_path):
    # clean batch -> processed/; batch with negatives -> quarantine/
    base = dt.datetime(2024, 1, 1)
    clean = [(base + dt.timedelta(hours=i), "CAL", 10.0 + i) for i in range(24)]
    src = str(tmp_path / "ing_src")
    spark.createDataFrame(clean, SCHEMA).coalesce(1).write.parquet(src)
    root = f"file://{tmp_path}/lake"
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = incremental_ingest(
        stream, root, checkpoint=str(tmp_path / "ing_ckpt")
    )
    q.awaitTermination(120)
    landed = spark.read.parquet(f"{root}/processed")
    assert landed.count() == 24

    bad = [(base + dt.timedelta(hours=i), "TEX", -5.0) for i in range(6)]
    src2 = str(tmp_path / "ing_src2")
    spark.createDataFrame(bad, SCHEMA).coalesce(1).write.parquet(src2)
    stream2 = spark.readStream.schema(SCHEMA).parquet(src2)
    q2 = incremental_ingest(
        stream2, root, checkpoint=str(tmp_path / "ing_ckpt2")
    )
    q2.awaitTermination(120)
    quarantined = spark.read.parquet(f"{root}/quarantine")
    assert quarantined.count() == 6


def test_stateful_running_anomalies(spark, tmp_path):
    """applyInPandasWithState: Welford state must persist ACROSS
    micro-batches (maxFilesPerTrigger=1 forces one batch per file), and a
    level-shift value must be flagged against the accumulated history."""
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.stateful import (
        running_anomalies,
    )

    base = dt.datetime(2024, 1, 1)
    src = str(tmp_path / "state_src")
    # file 1: 30 calm points; file 2: 9 calm + one 50-sigma spike
    calm = [(base + dt.timedelta(minutes=i), "CAL", 100.0 + (i % 5)) for i in range(30)]
    later = [
        (base + dt.timedelta(minutes=30 + i), "CAL", 100.0 + (i % 5)) for i in range(9)
    ] + [(base + dt.timedelta(minutes=40), "CAL", 500.0)]
    spark.createDataFrame(calm, SCHEMA).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(later, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_anomalies(stream, z_threshold=4.0, min_history=20)
        .writeStream.format("memory")
        .queryName("anom_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "anom_ckpt"))
        .start()
    )
    assert q.awaitTermination(180)
    rows = spark.sql("SELECT * FROM anom_out").collect()
    assert len(rows) == 40
    anomalies = [r for r in rows if r["is_anomaly"]]
    assert [r["value"] for r in anomalies] == [500.0]
    # state crossed the batch boundary: the spike's n_seen counts BOTH files
    assert anomalies[0]["n_seen"] == 39


def test_quality_counts(spark, stream_dir, tmp_path):
    stream = spark.readStream.schema(SCHEMA).parquet(stream_dir)
    out = _run(
        stream_quality_counts(stream), tmp_path, "qc_out", output_mode="complete"
    )
    neg = sum(r["n_negative"] for r in out.collect())
    assert neg == 1


def test_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Restart semantics: a NEW query started on the SAME checkpoint after
    more files landed must process ONLY the new files -- the already-
    committed batch is never re-emitted (file-source offsets + sink commit
    log = exactly-once continuation across restarts/crashes)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "event_id long, value double"

    def run_once():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    batch_a = [(i, float(i)) for i in range(10)]
    spark.createDataFrame(batch_a, schema).coalesce(1).write.mode("append").parquet(src)
    run_once()

    batch_b = [(i, float(i)) for i in range(10, 20)]
    spark.createDataFrame(batch_b, schema).coalesce(1).write.mode("append").parquet(src)
    run_once()

    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert got == list(range(20)), got


def test_transform_with_state_running_stats(spark, sf_dir, tmp_path):
    """Spark 4 transformWithState (arbitrary typed state, the
    applyInPandasWithState successor): per-group ValueState carrying
    (n, cent-exact sum, max) across 4 single-file micro-batches must
    reproduce the batch aggregates exactly. ENV-GATED: the API's driver
    worker needs google.protobuf, absent in this container -- skips like
    the torch parity surfaces (SCALING.md "Environment-gated surfaces")."""
    pytest.importorskip("google.protobuf.descriptor")
    import pyspark.sql.functions as F

    from electricity_forecast_pipeline_airflow_k8s_spark.sources.tables import load_table
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.stateful import (
        running_stats_tws,
    )

    ev = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("value").isNotNull())
        .select("event_type", "value")
    )
    src = str(tmp_path / "src")
    ev.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_stats_tws(stream)
        .writeStream.format("memory")
        .queryName("tws_test_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    assert q.awaitTermination(300)
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.desc("n_seen"))
    final = (
        spark.table("tws_test_out")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_type", "n_seen", "total_value", "max_value")
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    expected = (
        ev.groupBy("event_type")
        .agg(
            F.count("value").alias("n_seen"),
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double")).alias(
                "total_value"
            ),
            F.max("value").alias("max_value"),
        )
        .toPandas()
        .set_index("event_type")
        .sort_index()
    )
    assert (final["n_seen"] == expected["n_seen"]).all()
    assert (final["max_value"] == expected["max_value"]).all()
    assert ((final["total_value"] - expected["total_value"]).abs() < 1e-6).all()


def test_watermark_drop_metric_counts_late_rows(spark, tmp_path):
    """Late-data handling is observable, not just implied: rows arriving
    in a later micro-batch with event time far behind the advanced
    watermark must be counted in numRowsDroppedByWatermark (the metric an
    operator watches to tune the delay at 100 TB/day)."""
    import time

    import pyspark.sql.functions as F

    src = str(tmp_path / "src")
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    fresh = spark.createDataFrame(
        [(base + dt.timedelta(minutes=m), float(m)) for m in range(0, 60, 5)],
        "ts timestamp, value double",
    )
    fresh.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema("ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("win"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_drop_out")
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        # wait until the first batch committed and the watermark advanced
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] >= 1 and p.get("eventTime", {}).get("watermark"):
                break
            time.sleep(0.5)
        else:
            raise TimeoutError("watermark never advanced")
        # rows 2 HOURS behind the fresh data — far past the 10-min delay
        late = spark.createDataFrame(
            [(base - dt.timedelta(hours=2), 1.0), (base - dt.timedelta(hours=3), 2.0)],
            "ts timestamp, value double",
        )
        late.coalesce(1).write.mode("append").parquet(src)
        deadline = time.time() + 120
        dropped = 0
        while time.time() < deadline:
            p = q.lastProgress
            if p:
                for op in p.get("stateOperators", []):
                    dropped = max(dropped, op.get("numRowsDroppedByWatermark", 0))
            if dropped >= 2:
                break
            time.sleep(0.5)
        assert dropped >= 2, f"late rows not counted as dropped (got {dropped})"
    finally:
        q.stop()


def test_idempotent_upsert_sink_survives_replay(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between sink write and
    checkpoint commit replays the batch with the SAME batch_id. The
    upsert sink's overwrite-per-batch layout must make that replay a
    state-level no-op: after manually re-landing the final batch, the
    reconstructed latest-per-key state still equals the batch-mode
    aggregate exactly."""
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.ingest import (
        idempotent_upsert_sink,
        read_upsert_state,
    )

    src = str(tmp_path / "src")
    root = str(tmp_path / "upsert")
    base = dt.datetime(2024, 1, 1)
    # two files -> two micro-batches (maxFilesPerTrigger=1); CAL changes
    # in both batches, TEX only in the first -> the reader must mix
    # latest-batch rows across batch dirs
    f1 = [(base + dt.timedelta(minutes=i), "CAL", 1.0) for i in range(3)] + [
        (base + dt.timedelta(minutes=i), "TEX", 2.0) for i in range(4)
    ]
    f2 = [(base + dt.timedelta(minutes=60 + i), "CAL", 3.0) for i in range(5)]
    spark.createDataFrame(f1, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(f2, SCHEMA).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = stream.groupBy("respondent").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    q, land = idempotent_upsert_sink(
        agg, root, key_cols=["respondent"], checkpoint=str(tmp_path / "ckpt")
    )
    assert q.awaitTermination(120)

    expected = {
        ("CAL", 8, 3 * 1.0 + 5 * 3.0),
        ("TEX", 4, 8.0),
    }

    def state():
        return {
            (r["respondent"], r["n"], r["total"])
            for r in read_upsert_state(spark, root, ["respondent"]).collect()
        }

    assert state() == expected

    # simulate the at-least-once replay: re-land the highest batch with
    # identical content and id (what a restarted query does after a crash
    # post-write / pre-commit)
    import glob
    import os

    last_dir = sorted(
        glob.glob(f"{root}/batch_id=*"),
        key=lambda p: int(p.rsplit("=", 1)[1]),
    )[-1]
    last_id = int(last_dir.rsplit("=", 1)[1])
    # a real replay recomputes the batch from source offsets; here we
    # materialize the identical content first (localCheckpoint cuts the
    # file lineage) so the overwrite isn't reading its own target
    replay = spark.read.parquet(last_dir).localCheckpoint(eager=True)
    land(replay, last_id)
    assert state() == expected, "replayed batch must not change state"
    # and the change log still holds one dir per batch (no duplicate dirs)
    n_dirs = len(glob.glob(f"{root}/batch_id=*"))
    assert n_dirs >= 2 and os.path.isdir(last_dir)


def test_fold_state_replay_idempotent(spark, tmp_path):
    """The at-least-once contract of the shared state-fold scaffold: a
    replayed batch N must re-fold from the newest state STRICTLY BELOW N
    (never its own v=N output), so replaying produces byte-identical
    state and never double-counts -- the review-caught failure mode of
    reading prev_dirs[-1] unconditionally."""
    from pyspark.sql import functions as F

    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.foldstate import (
        land_batch,
    )

    root = str(tmp_path / "state")

    def fold(prev, batch):
        hist = batch.groupBy("k").agg(F.count(F.lit(1)).alias("c"))
        if prev is None:
            return hist
        return prev.unionByName(hist).groupBy("k").agg(F.sum("c").alias("c"))

    b0 = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    b1 = spark.createDataFrame([("a",), ("c",)], "k string")
    land_batch(spark, root, fold, b0, 0)
    land_batch(spark, root, fold, b1, 1)
    first = {r["k"]: r["c"] for r in spark.read.parquet(f"{root}/v=1").collect()}
    assert first == {"a": 3, "b": 1, "c": 1}
    # at-least-once replay of batch 1: state must not change
    land_batch(spark, root, fold, b1, 1)
    replayed = {
        r["k"]: r["c"] for r in spark.read.parquet(f"{root}/v=1").collect()
    }
    assert replayed == first


def test_fold_stream_state_empty_source(spark):
    """An all-empty source lands zero micro-batches; the scaffold must
    return an empty frame with the fold's output schema instead of
    IndexError on the missing v=* dirs (ADVICE r8)."""
    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.foldstate import (
        fold_stream_state,
    )

    empty = spark.createDataFrame([], "k string, v double")

    def fold(prev, batch):
        hist = batch.groupBy("k").agg(F.sum("v").alias("total"))
        if prev is None:
            return hist
        return prev.unionByName(hist).groupBy("k").agg(
            F.sum("total").alias("total")
        )

    out = fold_stream_state(
        spark, empty, fold, lambda st: st.orderBy("k"), n_batches=3
    )
    assert out.columns == ["k", "total"]
    assert out.count() == 0


def test_fold_state_survives_checkpoint_restart(spark, tmp_path):
    """Kill-and-restart property (VERDICT r8 item 7): a stream that dies
    mid-run (foreachBatch raises on batch 2 after committing 0 and 1)
    and restarts FROM THE SAME CHECKPOINT must converge to exactly the
    state an uninterrupted run produces -- the replay-idempotent
    land_batch contract is what makes the resumed (possibly replayed)
    batches safe."""
    import glob as _glob

    from electricity_forecast_pipeline_airflow_k8s_spark.streaming.foldstate import (
        land_batch,
    )

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    schema = "k string, v long"
    rows = [(f"k{i % 3}", i) for i in range(24)]
    spark.createDataFrame(rows, schema).repartition(4).write.parquet(src)

    def fold(prev, batch):
        hist = batch.groupBy("k").agg(
            F.count(F.lit(1)).alias("c"), F.sum("v").alias("s")
        )
        if prev is None:
            return hist
        return (
            prev.unionByName(hist)
            .groupBy("k")
            .agg(F.sum("c").alias("c"), F.sum("s").alias("s"))
        )

    def run(state_root, die_at=None):
        def handle(bdf, bid):
            if die_at is not None and bid >= die_at:
                raise RuntimeError("injected crash before commit")
            land_batch(spark, state_root, fold, bdf, bid)

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(handle)
            .outputMode("append")
            .trigger(availableNow=True)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.awaitTermination(120)
        except Exception:
            pass  # the injected crash surfaces here on the first run

    state_a = str(tmp_path / "state_a")  # interrupted + resumed
    run(state_a, die_at=2)
    committed = {int(p.rsplit("=", 1)[1]) for p in _glob.glob(f"{state_a}/v=*")}
    assert committed == {0, 1}, "crash must land only the pre-crash batches"
    run(state_a)  # restart from the same checkpoint, no crash

    state_b = str(tmp_path / "state_b")  # uninterrupted reference run
    ckpt = str(tmp_path / "ckpt_b")
    run(state_b)

    def final(root):
        last = sorted(
            _glob.glob(f"{root}/v=*"), key=lambda p: int(p.rsplit("=", 1)[1])
        )[-1]
        return {
            r["k"]: (r["c"], r["s"])
            for r in spark.read.parquet(last).collect()
        }

    assert final(state_a) == final(state_b)
    assert sum(c for c, _ in final(state_a).values()) == len(rows)

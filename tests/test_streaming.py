"""Streaming layer tests: file-source stream -> watermarked windows ->
memory sink, checked against the equivalent batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from parquet_export_spark.sources.lake import load_table, table_path
from parquet_export_spark.streaming import incremental as I


@pytest.fixture(scope="module")
def events_dir(sf_dir, tmp_path_factory):
    # file-source streams require a directory; stage the single-file
    # table as a landing dir (what a real ingest bucket looks like)
    d = tmp_path_factory.mktemp("events_landing")
    (d / "events-000.parquet").symlink_to(table_path(sf_dir, "events"))
    return str(d)


@pytest.fixture(scope="module")
def events_stream(spark, events_dir):
    return I.stream_events(spark, events_dir)


def test_hourly_rollup_stream_matches_batch(spark, sf_dir, events_stream):
    got = I.run_to_memory(
        I.hourly_rollup_stream(events_stream), "hourly_test", spark
    )
    batch_events = load_table(spark, sf_dir, "events")
    want = (
        batch_events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(30,6)")).cast("double").alias("total_value"),
        )
    )
    g = {(str(r.hour), r.event_type): (r.n_events, r.total_value) for r in got.collect()}
    w = {(str(r.hour), r.event_type): (r.n_events, r.total_value) for r in want.collect()}
    # availableNow over a bounded source: nothing is late, so the
    # watermarked stream must equal the batch rollup exactly.
    assert g == w


def test_sessionize_stream_runs(spark, events_stream):
    got = I.run_to_memory(
        I.sessionize_stream(events_stream, gap="30 minutes"), "sess_test", spark
    )
    rows = got.collect()
    assert len(rows) > 0
    for r in rows[:50]:
        assert r.session_end > r.session_start
        assert r.n_events >= 1


def test_stream_stream_join_matches_batch(spark, events_dir, sf_dir):
    """Watermarked stream-stream purchase<-click join equals the batch
    range join over the bounded source (events.ts is TimestampType in
    the stream; compare on values)."""
    stream = I.stream_events(spark, events_dir)
    joined = I.purchase_click_join_stream(stream, window_minutes=30)
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.purchase_id, r.click_id)
        for r in spark.table("ssj_test").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("ci"), F.col("ts").alias("ct")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pi"), F.col("ts").alias("pt")
    )
    want = {
        (r.pu, r.pi, r.ci)
        for r in purchases.join(
            clicks,
            (F.col("pu") == F.col("cu"))
            & (F.col("ct") <= F.col("pt"))
            & (F.col("ct") >= F.col("pt") - F.expr("INTERVAL 30 MINUTES")),
        ).collect()
    }
    assert got == want
    assert len(got) > 0


def test_stateful_running_totals(spark, events_dir, sf_dir):
    """applyInPandasWithState lifetime totals equal the batch groupBy
    when the bounded stream is drained in one availableNow run."""
    from parquet_export_spark.streaming.stateful import running_user_totals

    stream = I.stream_events(spark, events_dir)
    # event-time col is TimestampNTZ from stream_events; state op needs
    # pandas datetime64 — it arrives as such via Arrow.
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, round(r.total_value, 6))
        for r in spark.table("state_test").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    want = {
        r.user_id: (r.n, round(r.v, 6))
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.round(F.col("value") * 1_000_000).cast("long")) / 1_000_000
            ).alias("v"),
        )
        .collect()
    }
    assert got == want


def _has_protobuf() -> bool:
    # transformWithState's typed-state server speaks protobuf; the
    # runtime dependency is optional in this container.
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def test_transform_with_state_plan_construction(spark, events_dir):
    """The transformWithStateInPandas operator must build a valid
    streaming plan with the declared output schema (runtime execution
    additionally needs protobuf + RocksDB state store — exercised in
    test_transform_with_state_type_counts when available)."""
    from parquet_export_spark.streaming.stateful import user_event_type_counts

    out = user_event_type_counts(I.stream_events(spark, events_dir))
    assert out.isStreaming
    assert [f.name for f in out.schema.fields] == ["user_id", "event_type", "n"]


@pytest.mark.skipif(
    not _has_protobuf(),
    reason=(
        "environment gate, not a code gap: transformWithStateInPandas "
        "runtime state serialization requires google.protobuf, which "
        "is not installed in this sandbox (and installs are disallowed;"
        " re-verified absent round 4)."
        " Plan construction + output schema are still covered by "
        "test_transform_with_state_plan_construction; runtime parity "
        "vs the batch groupBy runs automatically wherever protobuf "
        "exists. Gate documented in COVERAGE.md §2B.9."
    ),
)
def test_transform_with_state_type_counts(spark, events_dir, sf_dir):
    """transformWithStateInPandas MapState counts equal the batch
    groupBy when the bounded stream drains in one availableNow run."""
    from parquet_export_spark.streaming.stateful import user_event_type_counts

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = I.stream_events(spark, events_dir)
    q = (
        user_event_type_counts(stream)
        .writeStream.format("memory")
        .queryName("tws_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.event_type): r.n for r in spark.table("tws_test").collect()
    }
    batch = load_table(spark, sf_dir, "events")
    want = {
        (r.user_id, r.event_type): r.n
        for r in batch.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want


def test_incremental_export_delta(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    cutoff = events.agg(F.expr("percentile(unix_micros(cast(ts as timestamp)), 0.5)")).collect()[0][0]
    from datetime import datetime, timezone

    wm = datetime.fromtimestamp(cutoff / 1e6, tz=timezone.utc).replace(tzinfo=None)
    delta = I.incremental_export(events, wm, updated_col="ts")
    n_delta = delta.count()
    n_total = events.count()
    assert 0 < n_delta < n_total


def test_streaming_dedup(spark, sf_dir, tmp_path):
    """Duplicate landing files (replayed ingest) -> dedup_stream emits
    each event once."""
    d = tmp_path / "dup_landing"
    d.mkdir()
    src = table_path(sf_dir, "events")
    (d / "events-a.parquet").symlink_to(src)
    (d / "events-b.parquet").symlink_to(src)  # full replay duplicate
    stream = I.dedup_stream(I.stream_events(spark, str(d)))
    q = (
        stream.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_unique = load_table(spark, sf_dir, "events").count()
    got = spark.table("dedup_stream_test")
    assert got.count() == n_unique
    assert got.select("event_id").distinct().count() == n_unique


def test_merge_sink_upsert(spark, events_dir, tmp_path):
    """foreachBatch merge sink: second run with the same checkpoint
    adds nothing; target holds exactly the distinct events."""
    target = str(tmp_path / "events_lake")
    ckpt = str(tmp_path / "ckpt")
    q = I.merge_sink(I.stream_events(spark, events_dir), target, ckpt)
    q.awaitTermination()
    back = spark.read.parquet(target)
    n = back.count()
    assert n == back.select("event_id").distinct().count() > 0
    # replay with same checkpoint: no change
    q2 = I.merge_sink(I.stream_events(spark, events_dir), target, ckpt)
    q2.awaitTermination()
    assert spark.read.parquet(target).count() == n


def test_merge_sink_crash_recovery(spark, events_dir, tmp_path):
    """A crash between 'target -> target.old' and 'staging -> target'
    must not lose the snapshot: the next batch restores target.old and
    merges the replayed micro-batch into the FULL prior snapshot."""
    import os
    import shutil

    target = str(tmp_path / "events_lake")
    q = I.merge_sink(
        I.stream_events(spark, events_dir), target, str(tmp_path / "ckpt1")
    )
    q.awaitTermination()
    n = spark.read.parquet(target).count()
    assert n > 0
    # simulate the torn swap: snapshot moved aside, nothing in its place
    os.replace(target, target + ".old")
    assert not os.path.exists(target)
    # fresh checkpoint -> the whole source replays as one micro-batch
    q2 = I.merge_sink(
        I.stream_events(spark, events_dir), target, str(tmp_path / "ckpt2")
    )
    q2.awaitTermination()
    back = spark.read.parquet(target)
    assert back.count() == n
    assert not os.path.exists(target + ".old")
    assert not os.path.exists(target + ".staging")


def test_stream_to_parquet_sink(spark, events_dir, tmp_path):
    """End-to-end streaming export: file source -> windowed agg ->
    parquet sink with checkpoint (the continuous-lake landing path)."""
    out = str(tmp_path / "rollup_lake")
    ckpt = str(tmp_path / "ckpt")
    stream = I.stream_events(spark, events_dir)
    rollup = I.hourly_rollup_stream(stream)
    q = (
        rollup.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    back = spark.read.parquet(out)
    # append mode emits only watermark-closed windows; with a bounded
    # source every window except the trailing 2h closes
    assert back.count() > 0
    assert {f.name for f in back.schema.fields} == {
        "hour",
        "event_type",
        "n_events",
        "total_value",
    }
    # restart with same checkpoint: no duplicate output (exactly-once)
    n_before = back.count()
    q2 = (
        I.hourly_rollup_stream(I.stream_events(spark, events_dir))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    assert spark.read.parquet(out).count() == n_before


def test_incremental_export_pushdown(spark, sf_dir):
    """On a native timestamp column the delta predicate reaches the
    parquet scan. (events.ts is restored from nanos via a projection,
    so it can't push — that's inherent to the legacy-nanos read path;
    native µs/ms lakes like our own exporter output push fine.)"""
    from datetime import datetime

    orders = load_table(spark, sf_dir, "orders")
    delta = I.incremental_export(orders, datetime(1998, 1, 1), updated_col="o_orderdate")
    assert 0 < delta.count() < orders.count()
    plan = delta._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(o_orderdate" in plan


def test_sliding_rollup_stream_matches_batch(spark, sf_dir, events_stream):
    """The watermarked sliding-window stream over a bounded source must
    equal the batch sliding_rollup exactly (nothing is late under
    availableNow); win_start is compared as a string to bridge the
    stream's TimestampType vs the batch NTZ wall-clock (same UTC
    values by session config)."""
    from parquet_export_spark.operators.advanced import sliding_rollup
    from parquet_export_spark.sources.lake import load_tables

    got = I.run_to_memory(
        I.sliding_rollup_stream(events_stream), "sliding_test", spark
    )
    want = sliding_rollup(load_tables(spark, sf_dir))
    g = {
        (str(r.win_start), r.event_type): (r.n_events, r.total_value)
        for r in got.collect()
    }
    w = {
        (str(r.win_start), r.event_type): (r.n_events, r.total_value)
        for r in want.collect()
    }
    assert g == w
    # every event fans into exactly window/slide = 4 windows
    n_events = load_table(spark, sf_dir, "events").count()
    assert sum(v[0] for v in w.values()) == 4 * n_events


def test_enrich_stream_static_join(spark, sf_dir, events_stream, events_dir):
    """Stream-static enrichment: every stream row carries its user's
    batch-built profile; equals the batch join twin on the bounded
    source, and the plan keeps the static side broadcast."""
    batch_events = load_table(spark, sf_dir, "events")
    profile = I.build_user_profile(batch_events)
    enriched = I.enrich_stream(I.stream_events(spark, events_dir), profile)
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("enrich_test")
    assert got.count() == batch_events.count()
    # no row lost its profile (every user_id has history by construction)
    assert got.filter(F.col("user_events_total").isNull()).count() == 0
    # spot-check one user's totals against the batch profile
    some = got.limit(1).collect()[0]
    want = profile.filter(F.col("user_id") == some.user_id).collect()[0]
    assert (some.user_events_total, some.user_value_total) == (
        want.user_events_total,
        want.user_value_total,
    )


def test_watermark_drops_late_rows_across_batches(spark, tmp_path):
    """Deterministic late-data semantics, driven across two real
    micro-batches: batch 1 advances the watermark far past a window;
    batch 2 delivers a row for that window beyond the allowed lateness
    plus a fresh row. The late row must be dropped BEFORE aggregation,
    so when the window finalizes (append mode) its total reflects only
    the on-time rows — the bounded-state guarantee the docstrings
    claim, which single-batch availableNow runs can never exercise."""
    from datetime import datetime

    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )

    def write_file(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(land)

    collected = []

    def run_once():
        stream = I.hourly_rollup_stream(I.stream_events(spark, land))
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(
                lambda df, _id: collected.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731
    # batch 1: two on-time rows in the 00:00 window + a row at 12:00
    # that advances the watermark to 10:00 (2h allowance)
    write_file(
        [
            (1, t(0, 30), 1, "click", 1.0, "{}"),
            (2, t(0, 40), 2, "click", 2.0, "{}"),
            (3, t(12, 0), 3, "click", 7.0, "{}"),
        ],
        "a",
    )
    run_once()
    # batch 2: a LATE row for the long-closed 00:00 window (watermark
    # is 10:00) plus a fresh 13:00 row that finalizes nothing new late
    write_file(
        [
            (4, t(0, 45), 4, "click", 100.0, "{}"),
            (5, t(13, 0), 5, "click", 9.0, "{}"),
        ],
        "b",
    )
    run_once()
    closed = {
        str(r.hour): (r.n_events, r.total_value) for r in collected
    }
    # the 00:00 window finalized WITHOUT the late 100.0 row
    assert closed["2024-03-01 00:00:00"] == (2, 3.0)


def test_streaming_dedup_across_batches(spark, tmp_path):
    """dropDuplicatesWithinWatermark must suppress a duplicate key
    arriving in a LATER micro-batch (state carried via checkpoint),
    not merely within one batch."""
    from datetime import datetime

    land = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    collected = []

    def run_once():
        stream = I.dedup_stream(I.stream_events(spark, land))
        q = (
            stream.writeStream.outputMode("append")
            .foreachBatch(lambda df, _id: collected.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t = lambda h, m: datetime(2024, 3, 1, h, m)  # noqa: E731
    spark.createDataFrame(
        [(1, t(0, 0), 1, "click", 1.0, "{}"), (2, t(0, 10), 2, "click", 2.0, "{}")],
        schema,
    ).coalesce(1).write.mode("append").parquet(land)
    run_once()
    # replayed event_id=1 in a later batch, still inside the watermark
    spark.createDataFrame(
        [(1, t(0, 20), 1, "click", 1.0, "{}"), (3, t(0, 30), 3, "click", 3.0, "{}")],
        schema,
    ).coalesce(1).write.mode("append").parquet(land)
    run_once()
    ids = sorted(r.event_id for r in collected)
    assert ids == [1, 2, 3]  # the replayed 1 was suppressed cross-batch


def test_neardup_gate_stream_across_batches(spark, tmp_path):
    """Continuous near-dup gate: a batch-2 document near-identical to a
    KEPT batch-1 document must be flagged against the artifact (state
    carried via the parquet artifact, not the checkpoint), batch-
    internal dups must resolve within their own micro-batch, and fresh
    content must pass. Also pins that the artifact holds ONLY kept
    docs' signatures."""
    land = str(tmp_path / "docs_landing")
    art = str(tmp_path / "artifact")
    out = str(tmp_path / "gate_out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "sleepy badgers watch from a mossy log near the quiet river "
        "bend and count passing clouds all afternoon long"
    )
    neardup = base.replace("seventeen", "nineteen")
    other = (
        "completely different content about distributed query engines "
        "partitioning shuffles and broadcast joins at one hundred "
        "terabytes of training data with exactly zero shared shingles"
    )
    fresh = (
        "a third unrelated passage mentioning parquet footers zstd "
        "compression row groups column pruning and predicate pushdown "
        "for the scan layer of a lakehouse"
    )

    def run_once():
        stream = (
            spark.readStream.schema(schema).parquet(land)
        )
        q = I.neardup_gate_stream(stream, art, out, ckpt)
        q.awaitTermination()

    spark.createDataFrame(
        [(10, base), (20, other)], schema
    ).coalesce(1).write.mode("append").parquet(land)
    run_once()
    spark.createDataFrame(
        [(30, neardup), (40, fresh), (50, fresh)], schema
    ).coalesce(1).write.mode("append").parquet(land)
    run_once()

    got = {
        r.doc_id: (r.dup_of_lake, r.lake_match_id, r.dup_in_batch,
                   r.batch_match_id, r.keep)
        for r in I.read_gate_decisions(spark, out).collect()
    }
    assert got[10] == (False, None, False, None, True)
    assert got[20] == (False, None, False, None, True)
    # cross-batch: 30 matches the KEPT doc 10 through the artifact
    assert got[30][0] and got[30][1] == 10 and not got[30][4]
    # batch-internal: 50 is an exact dup of 40 within batch 2
    assert got[40] == (False, None, False, None, True)
    assert got[50][2] and got[50][3] == 40 and not got[50][4]
    # artifact contains exactly the kept docs
    sigs, _bands = I.read_neardup_artifact(spark, art)
    kept_in_artifact = sorted(r.doc_id for r in sigs.collect())
    assert kept_in_artifact == [10, 20, 40]
    # same-checkpoint re-run: no new data -> decisions and artifact
    # unchanged (and a REPLAYED batch would overwrite its own subdir
    # against the pre-batch artifact view — per-batch keyed writes)
    run_once()
    assert I.read_gate_decisions(spark, out).count() == len(got)
    sigs2, _ = I.read_neardup_artifact(spark, art)
    assert sorted(r.doc_id for r in sigs2.collect()) == [10, 20, 40]


def test_cms_sketch_stream_merge_equals_full_sketch(spark, tmp_path):
    """CMS mergeability, continuously: after two micro-batches the
    persisted artifact must be BIT-EQUAL to the sketch computed over
    the concatenated corpus in one shot (merge is exact addition per
    (row_id, bucket)), and point estimates from the artifact must
    upper-bound the exact counts."""
    from parquet_export_spark.operators.stats import cms_sketch_rows

    land = str(tmp_path / "docs_landing")
    art = str(tmp_path / "cms")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string"

    b1 = [(1, "alpha beta alpha gamma"), (2, "beta beta delta")]
    b2 = [(3, "alpha epsilon epsilon"), (4, "gamma alpha beta")]

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.cms_sketch_stream(stream, art, ckpt)
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    got = {
        (r.row_id, r.bucket): r.c
        for r in I.read_cms_sketch(spark, art).collect()
    }
    full_words = spark.createDataFrame(b1 + b2, schema).select(
        F.explode(F.split("text", " ")).alias("word")
    )
    want = {
        (r.row_id, r.bucket): r.c
        for r in cms_sketch_rows(full_words).collect()
    }
    assert got == want
    # point-estimate sanity: min over depth rows upper-bounds exact
    exact = {"alpha": 4, "beta": 4, "gamma": 2, "delta": 1, "epsilon": 2}
    import hashlib

    for word, n in exact.items():
        ests = []
        for row_id in range(3):
            b = hashlib.md5(f"{word}#{row_id}".encode()).hexdigest()[:3]
            ests.append(got.get((row_id, b), 0))
        assert min(ests) >= n


def test_cusum_stream_two_batches_equals_sequential_recursion(
    spark, tmp_path
):
    """Continuous CUSUM: after two micro-batches the carried state and
    the union of per-batch alarm rows must equal the textbook
    sequential recursion run over the CONCATENATED series in plain
    Python — the carry (last prefix sum, running min) is the whole
    history, so the batch boundary must be invisible. The engineered
    series shifts level mid-SECOND-batch, so the alarm run starts
    after the boundary and depends on first-batch state."""
    from datetime import datetime, timedelta

    land = str(tmp_path / "events_landing")
    art = str(tmp_path / "cusum")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    drift, h = 1000, 3000  # cents
    vals = [10.0] * 6 + [9.0] * 4 + [25.0] * 6  # shift inside batch 2
    t0 = datetime(2024, 3, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "probe", v, "{}")
        for i, v in enumerate(vals)
    ]
    b1, b2 = rows[:8], rows[8:]

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.cusum_stream(stream, art, ckpt, drift=drift, h=h)
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    # independent reference: sequential recursion over the FULL series
    cents = [int(v * 100 + 0.5) for v in vals]
    s, pf, minp, path = 0, 0, 0, []
    for x in cents:
        pf += x - drift
        minp = min(minp, pf)
        s = max(0, s + (x - drift))
        path.append(s)
        assert s == pf - min(0, minp)  # closed form == recursion
    want_alarms = {i for i, v in enumerate(path) if v >= h}
    assert want_alarms and min(want_alarms) >= len(b1)  # crosses boundary

    got = {
        r.event_id: r.cusum
        for r in I.read_cusum_alarms(spark, art).collect()
    }
    assert set(got) == want_alarms
    assert got == {i: path[i] for i in want_alarms}
    # final carry == full-series prefix state
    carry = {
        r.event_type: (r.pf, r.minp)
        for r in spark.read.parquet(art + "/carry/batch_1").collect()
    }
    assert carry == {"probe": (pf, minp)}
    # same-checkpoint re-run (no new data): artifact must not change
    run_once()
    assert {
        r.event_id for r in I.read_cusum_alarms(spark, art).collect()
    } == want_alarms
    assert {
        r.event_type: (r.pf, r.minp)
        for r in spark.read.parquet(art + "/carry/batch_1").collect()
    } == carry
    # carry compaction (round-6 advisory): each carry_<id> is a full
    # state copy and only the max-prior one is ever read, so a third
    # batch must prune batch_0 — exactly the two most recent survive
    # (replay of the last uncommitted batch needs one prior carry).
    import os

    b3 = [
        (len(vals), t0 + timedelta(minutes=len(vals)), 1, "probe", 25.0, "{}")
    ]
    spark.createDataFrame(b3, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    dirs = sorted(
        d for d in os.listdir(art + "/carry") if d.startswith("batch_")
    )
    assert dirs == ["batch_1", "batch_2"]
    # the pruned tree still carries the full-series state forward
    pf3, minp3 = pf + (2500 - drift), minp
    assert {
        r.event_type: (r.pf, r.minp)
        for r in spark.read.parquet(art + "/carry/batch_2").collect()
    } == {"probe": (pf3, minp3)}


def test_cc_label_stream_two_batches_equals_full_recompute(spark, tmp_path):
    """Streaming CC maintenance: after two edge micro-batches the label
    table must be BIT-EQUAL to a full doubling-CC recompute over the
    concatenated edge set. The second batch contains an edge that
    MERGES two components formed in the first batch, so correctness
    depends on first-batch state (the batch boundary must be
    invisible), plus a brand-new component (unseen endpoints must
    self-label). Then: same-checkpoint re-run stability, and a third
    batch pruning the label tree to the two most recent copies."""
    import os

    from parquet_export_spark.operators import graph as G

    land = str(tmp_path / "edges_landing")
    art = str(tmp_path / "cc")
    ckpt = str(tmp_path / "ckpt")
    schema = "cust_node long, supp_node long"
    b1 = [(0, 1), (2, 3), (6, 7)]          # components {0,1} {2,3} {6,7}
    b2 = [(0, 3), (4, 5)]                  # merge {0,1}+{2,3}; new {4,5}

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.cc_label_stream(stream, art, ckpt)
        q.awaitTermination()

    def full_recompute(pairs):
        e = spark.createDataFrame(pairs, schema)
        sym = e.select(
            F.col("cust_node").alias("src"), F.col("supp_node").alias("dst")
        ).unionByName(
            e.select(
                F.col("supp_node").alias("src"),
                F.col("cust_node").alias("dst"),
            )
        )
        return {
            (r.node, r.l) for r in G._cc_doubling_core(sym, 4).collect()
        }

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    got1 = {
        (r.node, r.component)
        for r in I.read_cc_labels(spark, art).collect()
    }
    assert got1 == full_recompute(b1)

    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    got2 = {
        (r.node, r.component)
        for r in I.read_cc_labels(spark, art).collect()
    }
    assert got2 == full_recompute(b1 + b2)
    # the cross-boundary merge actually happened: 0..3 share one label
    merged = {c for n, c in got2 if n in (0, 1, 2, 3)}
    assert merged == {0}

    # same-checkpoint re-run (no new data): state unchanged
    run_once()
    assert {
        (r.node, r.component)
        for r in I.read_cc_labels(spark, art).collect()
    } == got2

    # third batch: compaction keeps only the two most recent copies
    b3 = [(8, 9)]
    spark.createDataFrame(b3, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    dirs = sorted(
        d for d in os.listdir(art + "/labels") if d.startswith("batch_")
    )
    assert dirs == ["batch_1", "batch_2"]
    assert {
        (r.node, r.component)
        for r in I.read_cc_labels(spark, art).collect()
    } == full_recompute(b1 + b2 + b3)


def test_ewma_stream_two_batches_equals_batch_operator(spark, tmp_path):
    """Streaming EWMA: after two micro-batches every emitted score must
    equal the batch operator run over the CONCATENATED series — the
    last-K + running-count carry is the whole state, so the batch
    boundary must be invisible. The boundary is placed INSIDE a lag
    window (batch 2 scores depend on batch-1 values through the
    carry), and a second event type exercises per-type carries."""
    from datetime import datetime, timedelta

    from parquet_export_spark.operators import advanced as A

    land = str(tmp_path / "events_landing")
    art = str(tmp_path / "ewma")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 4, 1)
    rows = [
        (i, t0 + timedelta(minutes=i), 1, "probe", 10.0 + (i % 7), "{}")
        for i in range(22)
    ] + [
        (100 + i, t0 + timedelta(minutes=i), 2, "other", 5.0 + i, "{}")
        for i in range(5)
    ]
    # split mid-lag-window for BOTH types
    b1 = [r for r in rows if r[0] in set(range(9)) | {100, 101}]
    b2 = [r for r in rows if r[0] not in {r2[0] for r2 in b1}]

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.ewma_stream(stream, art, ckpt)
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    got = {
        r.event_id: (r.value_cents, r.ewma_cents)
        for r in I.read_ewma_scores(spark, art).collect()
    }
    full = spark.createDataFrame(rows, schema)
    want = {
        r.event_id: (r.value_cents, r.ewma_cents)
        for r in A.ewma_halflife_values({"events": full}).collect()
    }
    assert got == want and len(got) == len(rows)
    # (replay idempotence + compaction now pinned uniformly in
    # test_monitor_replay_idempotence_and_compaction)


def test_ks_drift_stream_two_batches_matches_sequential(spark, tmp_path):
    """Continuous KS drift vs a frozen reference: after each
    micro-batch the emitted ks_ppm must equal a sequential Python
    recomputation over the concatenated stream prefix. Batch 1 draws
    from the reference's distribution (low D); batch 2 shifts the
    level, so the cumulative D must RISE — monotone drift detection
    across the batch boundary."""
    from datetime import datetime, timedelta

    land = str(tmp_path / "events_landing")
    ref_dir = str(tmp_path / "ks_ref")
    art = str(tmp_path / "ksd")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)
    ref_vals = [10.0, 11.0, 12.0, 13.0, 14.0] * 4
    b1_vals = [10.0, 11.0, 12.0, 13.0]          # in-distribution
    b2_vals = [30.0, 31.0, 32.0, 33.0]          # shifted

    def rows(vals, base_id):
        return [
            (base_id + i, t0 + timedelta(minutes=base_id + i), 1,
             "probe", v, "{}")
            for i, v in enumerate(vals)
        ]

    I.write_ks_reference(
        spark.createDataFrame(rows(ref_vals, 1000), schema), ref_dir
    )

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.ks_drift_stream(stream, ref_dir, art, ckpt)
        q.awaitTermination()

    def python_ks(stream_vals):
        import bisect

        xa = sorted(int(v * 100 + 0.5) for v in stream_vals)
        xb = sorted(int(v * 100 + 0.5) for v in ref_vals)
        na, nb = len(xa), len(xb)
        d = max(
            abs(bisect.bisect_right(xa, x) * nb
                - bisect.bisect_right(xb, x) * na)
            for x in set(xa) | set(xb)
        )
        return (d * 1_000_000) // (na * nb)

    spark.createDataFrame(rows(b1_vals, 0), schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(rows(b2_vals, 50), schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    got = {
        (r.batch_id, r.event_type): (r.n_stream, r.ks_ppm)
        for r in I.read_ks_drift(spark, art).collect()
    }
    assert got[(0, "probe")] == (len(b1_vals), python_ks(b1_vals))
    assert got[(1, "probe")] == (
        len(b1_vals) + len(b2_vals),
        python_ks(b1_vals + b2_vals),
    )
    # the shift must raise the cumulative drift
    assert got[(1, "probe")][1] > got[(0, "probe")][1]
    # (replay idempotence + compaction now pinned uniformly in
    # test_monitor_replay_idempotence_and_compaction)


def test_hll_stream_two_batches_merge_consistent(spark, tmp_path):
    """Streaming distinct-user monitor: after each micro-batch the
    cumulative per-type estimate must EQUAL the one-shot batch sketch
    over the concatenated prefix (HLL merge-consistency — the
    hll_rollup_users property, here across the batch boundary), stay
    within HLL error of exact countDistinct, and be unchanged by a
    same-checkpoint replay."""
    from datetime import datetime, timedelta

    land = str(tmp_path / "landing")
    art = str(tmp_path / "hart")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)

    def rows(ids, users, typ):
        return [
            (i, t0 + timedelta(minutes=i), u, typ, 1.0, "{}")
            for i, u in zip(ids, users)
        ]

    # batch 1: click users 1-40; batch 2: click users 21-60 (overlap
    # 21-40 must not double-count) + a type seen only in batch 2
    b1 = rows(range(100), [i % 40 + 1 for i in range(100)], "click")
    b2 = rows(range(100, 200), [i % 40 + 21 for i in range(100)], "click")
    b2 += rows(range(200, 210), range(1, 11), "view")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.hll_stream(stream, art, ckpt)
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    got = {
        (r.batch_id, r.event_type): r.approx_users
        for r in I.read_hll_estimates(spark, art).collect()
    }

    def oneshot(rs):
        return {
            r.event_type: r.approx
            for r in spark.createDataFrame(rs, schema)
            .groupBy("event_type")
            .agg(
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id")
                ).alias("approx")
            )
            .collect()
        }

    # (b) merge-consistency: stream-merged == one-shot over the prefix
    assert got[(0, "click")] == oneshot(b1)["click"]
    full = oneshot(b1 + b2)
    assert got[(1, "click")] == full["click"]
    assert got[(1, "view")] == full["view"]
    # (c) error bound vs exact distinct (40/60/10 true uniques)
    for key, exact in [((0, "click"), 40), ((1, "click"), 60),
                       ((1, "view"), 10)]:
        assert abs(got[key] - exact) <= max(2, 0.05 * exact), (key, got[key])
    # (replay idempotence + compaction now pinned uniformly in
    # test_monitor_replay_idempotence_and_compaction)


def test_apdex_stream_two_batches_exact_twin_parity(spark, tmp_path):
    """Streaming Apdex: after each micro-batch the cumulative per-type
    score must EQUAL the batch apdex_by_type over the concatenated
    prefix EXACTLY (the counters are additive int64 — no error bound),
    and a same-checkpoint replay must change nothing."""
    from datetime import datetime, timedelta

    from parquet_export_spark.operators.stats import apdex_by_type

    land = str(tmp_path / "landing")
    art = str(tmp_path / "aart")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)

    def rows(ids, vals, typ):
        return [
            (i, t0 + timedelta(minutes=i), 1, typ, v, "{}")
            for i, v in zip(ids, vals)
        ]

    # batch 1: clicks spanning all three buckets; batch 2 shifts the
    # mix and adds a type unseen in batch 1
    b1 = rows(range(30), [50.0] * 20 + [250.0] * 8 + [900.0] * 2, "click")
    b2 = rows(range(30, 60), [50.0] * 5 + [250.0] * 20 + [900.0] * 5,
              "click")
    b2 += rows(range(60, 70), [10.0] * 10, "view")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.apdex_stream(stream, art, ckpt)
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    got = {
        (r.batch_id, r.event_type): (
            r.n_events,
            r.n_satisfied,
            r.n_tolerating,
            r.apdex_ppm,
        )
        for r in I.read_apdex_scores(spark, art).collect()
    }

    def batch_twin(rs):
        return {
            r.event_type: (
                r.n_events,
                r.n_satisfied,
                r.n_tolerating,
                r.apdex_ppm,
            )
            for r in apdex_by_type(
                {"events": spark.createDataFrame(rs, schema)}
            ).collect()
        }

    assert got[(0, "click")] == batch_twin(b1)["click"]
    full = batch_twin(b1 + b2)
    assert got[(1, "click")] == full["click"]
    assert got[(1, "view")] == full["view"]
    # the fixture must exercise all three buckets or the parity is weak
    assert got[(1, "click")][2] > 0 and got[(1, "click")][1] > 0
    assert got[(1, "click")][0] > got[(1, "click")][1] + got[(1, "click")][2]
    # (replay idempotence + compaction now pinned uniformly in
    # test_monitor_replay_idempotence_and_compaction)


def test_w1_drift_stream_two_batches_exact(spark, tmp_path):
    """Streaming W1 vs a frozen reference: after each micro-batch the
    emitted (w1_num, w1_cents) must equal a sequential Python
    recomputation over the concatenated prefix, and a replay must
    change nothing (the ks_drift_stream contract, magnitude flavor)."""
    from datetime import datetime, timedelta

    land = str(tmp_path / "landing")
    ref_dir = str(tmp_path / "ref")
    art = str(tmp_path / "wart")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)

    def rows(ids, vals, typ):
        return [
            (i, t0 + timedelta(minutes=i), 1, typ, v, "{}")
            for i, v in zip(ids, vals)
        ]

    ref_rows = rows(range(1000, 1040), [10.0] * 20 + [20.0] * 20, "probe")
    I.write_ks_reference(spark.createDataFrame(ref_rows, schema), ref_dir)
    # batch 1 matches the reference shape; batch 2 shifts mass upward
    b1 = rows(range(20), [10.0] * 10 + [20.0] * 10, "probe")
    b2 = rows(range(20, 50), [30.0] * 30, "probe")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.w1_drift_stream(stream, ref_dir, art, ckpt)
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    def w1_python(stream_rows):
        from collections import Counter

        sa = Counter(int(v * 100 + 0.5) for *_, v, _p in
                     [(r[0], r[1], r[2], r[3], r[4], r[5])
                      for r in stream_rows])
        sb = Counter(int(v * 100 + 0.5) for *_, v, _p in
                     [(r[0], r[1], r[2], r[3], r[4], r[5])
                      for r in ref_rows])
        na, nb = sum(sa.values()), sum(sb.values())
        support = sorted(set(sa) | set(sb))
        cum_a = cum_b = num = 0
        for x, nxt in zip(support, support[1:]):
            cum_a += sa.get(x, 0)
            cum_b += sb.get(x, 0)
            num += abs(cum_a * nb - cum_b * na) * (nxt - x)
        return na, nb, num, round(num / (na * nb), 6)

    got = {
        r.batch_id: (r.n_stream, r.n_ref, r.w1_num, r.w1_cents)
        for r in I.read_w1_drift(spark, art).collect()
    }
    assert got[0] == w1_python(b1)
    assert got[1] == w1_python(b1 + b2)
    # batch 1 matches the reference exactly -> zero drift; batch 2's
    # upward shift must register as positive drift
    assert got[0][2] == 0
    assert got[1][2] > 0
    # (replay idempotence + compaction now pinned uniformly in
    # test_monitor_replay_idempotence_and_compaction)


# ---------------------------------------------------------------------------
# ONE parametrized replay-idempotence + keep-two-compaction pin for all
# TWELVE monitors (round-8 verdict #5; tv_drift, growth-accounting
# and auc_drift joined in round 9; mk_trend in round 10): the shared foreachBatch carry
# recipe promises (a) a re-run against the same checkpoint changes
# nothing, and (b) after a third batch the persisted state tree holds
# only the two most recent copies (replay of the last uncommitted
# batch needs exactly one prior carry). The per-monitor tests above
# keep the MATH parity pins (sequential-Python twins, exact batch-twin
# equality); this test pins the shared lifecycle once, uniformly —
# a ninth monitor added without the recipe fails here, not in a
# forgotten copy of the tail asserts.
# ---------------------------------------------------------------------------

_MON_EVENTS_SCHEMA = (
    "event_id long, ts timestamp_ntz, user_id long,"
    " event_type string, value double, props string"
)


def _mon_rows(lo, hi, val):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 5, 1)
    return [
        (i, t0 + timedelta(minutes=i), i % 3, "probe", float(val), "{}")
        for i in range(lo, hi)
    ]


_NEARDUP_TEXTS = [
    "the quick brown fox jumps over the lazy dog while seventeen "
    "sleepy badgers watch from a mossy log near the quiet river bend",
    "completely different content about distributed query engines "
    "partitioning shuffles and broadcast joins at terabyte scale",
    "a third unrelated passage mentioning parquet footers zstd "
    "compression row groups column pruning and predicate pushdown",
]


def _monitor_spec(name, spark, tmp_path):
    """(schema, batches, start(stream)->query, read()->snapshot,
    state_dir_with_batch_subdirs | None)."""
    land = str(tmp_path / "landing")
    art = str(tmp_path / "art")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ref = str(tmp_path / "ref")
    ev = _MON_EVENTS_SCHEMA
    ev_batches = [
        _mon_rows(0, 20, 10.0) + _mon_rows(100, 108, 250.0),
        _mon_rows(20, 40, 30.0) + _mon_rows(108, 112, 900.0),
        _mon_rows(40, 50, 10.0),
    ]

    def snap(df):
        return sorted(tuple(r) for r in df.collect())

    if name in ("ks_drift", "w1_drift"):
        I.write_ks_reference(
            spark.createDataFrame(
                _mon_rows(1000, 1020, 10.0) + _mon_rows(1020, 1040, 20.0),
                ev,
            ),
            ref,
        )
        fn = I.ks_drift_stream if name == "ks_drift" else I.w1_drift_stream
        rd = I.read_ks_drift if name == "ks_drift" else I.read_w1_drift
        return (
            ev, ev_batches, land, ckpt,
            lambda s: fn(s, ref, art, ckpt),
            lambda: snap(rd(spark, art)),
            art + "/carry",
        )
    if name == "cusum":
        return (
            ev, ev_batches, land, ckpt,
            lambda s: I.cusum_stream(s, art, ckpt, drift=1500),
            lambda: snap(I.read_cusum_alarms(spark, art)),
            art + "/carry",
        )
    if name == "ewma":
        return (
            ev, ev_batches, land, ckpt,
            lambda s: I.ewma_stream(s, art, ckpt),
            lambda: snap(I.read_ewma_scores(spark, art)),
            art + "/carry",
        )
    if name == "hll":
        return (
            ev, ev_batches, land, ckpt,
            lambda s: I.hll_stream(s, art, ckpt),
            lambda: snap(I.read_hll_estimates(spark, art)),
            art + "/carry",
        )
    if name == "apdex":
        return (
            ev, ev_batches, land, ckpt,
            lambda s: I.apdex_stream(s, art, ckpt),
            lambda: snap(I.read_apdex_scores(spark, art)),
            art + "/carry",
        )
    if name == "cc_labels":
        schema = "cust_node long, supp_node long"
        batches = [
            [(0, 1), (2, 3), (6, 7)],
            [(0, 3), (4, 5)],
            [(8, 9)],
        ]
        return (
            schema, batches, land, ckpt,
            lambda s: I.cc_label_stream(s, art, ckpt),
            lambda: snap(I.read_cc_labels(spark, art)),
            art + "/labels",
        )
    if name == "tv_drift":
        I.write_ks_reference(
            spark.createDataFrame(
                _mon_rows(1000, 1020, 10.0) + _mon_rows(1020, 1040, 20.0),
                ev,
            ),
            ref,
        )
        return (
            ev, ev_batches, land, ckpt,
            lambda s: I.tv_drift_stream(s, ref, art, ckpt),
            lambda: snap(I.read_tv_drift(spark, art)),
            art + "/carry",
        )
    if name == "js_drift":
        I.write_ks_reference(
            spark.createDataFrame(
                _mon_rows(1000, 1020, 10.0) + _mon_rows(1020, 1040, 20.0),
                ev,
            ),
            ref,
        )
        return (
            ev, ev_batches, land, ckpt,
            lambda s: I.js_drift_stream(s, ref, art, ckpt),
            lambda: snap(I.read_js_drift(spark, art)),
            art + "/carry",
        )
    if name == "auc_drift":
        I.write_ks_reference(
            spark.createDataFrame(
                _mon_rows(1000, 1020, 10.0) + _mon_rows(1020, 1040, 20.0),
                ev,
            ),
            ref,
        )
        return (
            ev, ev_batches, land, ckpt,
            lambda s: I.auc_drift_stream(s, ref, art, ckpt),
            lambda: snap(I.read_auc_drift(spark, art)),
            art + "/carry",
        )
    if name == "mk_trend":
        return (
            ev, ev_batches, land, ckpt,
            lambda s: I.mk_trend_stream(s, art, ckpt),
            lambda: snap(I.read_mk_trend(spark, art)),
            art + "/carry",
        )
    if name == "changepoint":
        # day-grain series: the scan needs >= 2 days per type, which
        # the minute-grain ev_batches never produce
        from datetime import datetime, timedelta

        t0 = datetime(2024, 5, 1)
        day_batches = [
            [(i, t0 + timedelta(days=i), 1, "probe", 10.0, "{}")
             for i in range(4)],
            [(10 + i, t0 + timedelta(days=4 + i), 1, "probe", 50.0, "{}")
             for i in range(4)],
            [(20 + i, t0 + timedelta(days=8 + i), 1, "probe", 50.0, "{}")
             for i in range(2)],
        ]
        return (
            ev, day_batches, land, ckpt,
            lambda s: I.changepoint_stream(s, art, ckpt),
            lambda: snap(I.read_changepoints(spark, art)),
            art + "/carry",
        )
    if name == "goertzel":
        # day-grain series like changepoint: the scorer needs a
        # multi-day span per type
        from datetime import datetime, timedelta

        t0 = datetime(2024, 5, 1)
        day_batches = [
            [(i, t0 + timedelta(days=i), 1, "probe", 10.0, "{}")
             for i in range(4)],
            [(10 + i, t0 + timedelta(days=4 + i), 1, "probe", 50.0, "{}")
             for i in range(4)],
            [(20 + i, t0 + timedelta(days=8 + i), 1, "probe", 50.0, "{}")
             for i in range(2)],
        ]
        return (
            ev, day_batches, land, ckpt,
            lambda s: I.goertzel_stream(s, art, ckpt),
            lambda: snap(I.read_goertzel(spark, art)),
            art + "/carry",
        )
    if name == "hw_forecast":
        from datetime import datetime, timedelta

        t0 = datetime(2024, 5, 1)
        day_batches = [
            [(i, t0 + timedelta(days=i), 1, "probe", 10.0, "{}")
             for i in range(4)],
            [(10 + i, t0 + timedelta(days=4 + i), 1, "probe", 50.0, "{}")
             for i in range(4)],
            [(20 + i, t0 + timedelta(days=8 + i), 1, "probe", 50.0, "{}")
             for i in range(2)],
        ]
        return (
            ev, day_batches, land, ckpt,
            lambda s: I.hw_forecast_stream(s, art, ckpt),
            lambda: snap(I.read_hw_forecast(spark, art)),
            art + "/carry",
        )
    if name == "growth":
        return (
            ev, ev_batches, land, ckpt,
            lambda s: I.growth_accounting_stream(s, art, ckpt),
            lambda: snap(I.read_growth_accounting(spark, art)),
            art + "/seen",
        )
    if name == "balance":
        from datetime import datetime

        schema = (
            "l_orderkey long, l_linenumber int, l_suppkey long,"
            " l_shipdate timestamp_ntz, l_quantity double,"
            " l_returnflag string"
        )
        batches = [
            [
                (1, 1, 10, datetime(2024, 5, 1), 5.0, "N"),
                (2, 1, 10, datetime(2024, 5, 2), 4.0, "R"),
            ],
            [
                (3, 1, 10, datetime(2024, 5, 2), 5.0, "R"),
                (4, 1, 10, datetime(2024, 5, 3), 3.0, "N"),
            ],
            [(5, 1, 10, datetime(2024, 5, 4), 2.0, "N")],
        ]
        return (
            schema, batches, land, ckpt,
            lambda s: I.balance_stream(s, art, ckpt, supp_mod=1),
            lambda: snap(I.read_balances(spark, art)),
            art + "/carry",
        )
    if name == "neardup_gate":
        schema = "doc_id long, text string"
        batches = [
            [(1, _NEARDUP_TEXTS[0])],
            [(2, _NEARDUP_TEXTS[1])],
            [(3, _NEARDUP_TEXTS[2])],
        ]
        return (
            schema, batches, land, ckpt,
            lambda s: I.neardup_gate_stream(s, art, out, ckpt),
            lambda: snap(I.read_gate_decisions(spark, out)),
            None,  # the artifact IS the per-batch signature log:
            # history accumulates by design, no carry to compact
        )
    raise AssertionError(name)


@pytest.mark.parametrize(
    "name",
    [
        "cusum", "ks_drift", "ewma", "cc_labels",
        "hll", "apdex", "w1_drift", "neardup_gate", "tv_drift",
        "growth", "auc_drift", "mk_trend", "balance", "changepoint",
        "js_drift", "goertzel", "hw_forecast",
    ],
)
def test_monitor_replay_idempotence_and_compaction(spark, tmp_path, name):
    import os

    schema, batches, land, ckpt, start, read, state_dir = _monitor_spec(
        name, spark, tmp_path
    )

    def write(batch):
        spark.createDataFrame(batch, schema).coalesce(1).write.mode(
            "append"
        ).parquet(land)

    def run_once():
        q = start(spark.readStream.schema(schema).parquet(land))
        q.awaitTermination()

    write(batches[0])
    run_once()
    write(batches[1])
    run_once()
    after_two = read()
    assert len(after_two) > 0
    # same-checkpoint re-run with no new data: nothing may change
    run_once()
    assert read() == after_two
    # third batch: outputs advance, and the state tree compacts to the
    # two most recent batch_<id> copies
    write(batches[2])
    run_once()
    after_three = read()
    assert len(after_three) >= len(after_two) or name == "cc_labels"
    if state_dir is not None:
        kept = sorted(
            d for d in os.listdir(state_dir) if d.startswith("batch_")
        )
        assert 1 <= len(kept) <= 2, kept
        # and the survivors are the two MOST RECENT states
        assert kept[-1] == "batch_2", kept


def test_goertzel_stream_equals_batch_twin(spark, tmp_path):
    """After the final micro-batch, the streamed weekly-power row must
    BIT-EQUAL goertzel_from_daily over the concatenated events (one
    scorer, so this pins the carry merge, not the math)."""
    from datetime import datetime, timedelta

    from parquet_export_spark.operators import stats as ST

    land = str(tmp_path / "landing")
    art = str(tmp_path / "gzart")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)
    # 3 weeks with an engineered weekly shape, split mid-week across
    # batches (the carry must stitch days, not restart them)
    rows = []
    eid = 0
    for d in range(21):
        for _ in range(10 + (3 if d % 7 in (5, 6) else 0)):
            rows.append(
                (eid, t0 + timedelta(days=d, minutes=eid % 60), 1,
                 "probe", 1.0, "{}")
            )
            eid += 1
    batches = [rows[: len(rows) // 3], rows[len(rows) // 3 :]]

    def run_once():
        q = I.goertzel_stream(
            spark.readStream.schema(schema).parquet(land), art, ckpt
        )
        q.awaitTermination()

    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(land)
        run_once()

    daily = (
        spark.createDataFrame(rows, schema)
        .selectExpr(
            "event_type",
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS"
            " BIGINT) AS day",
        )
        .groupBy("event_type", "day")
        .count()
        .withColumnRenamed("count", "c")
    )
    expect = {
        r.event_type: (r.n_days, r.mean_c, r.weekly_power,
                       r.weekly_amplitude)
        for r in ST.goertzel_from_daily(daily).collect()
    }
    last = max(r.batch_id for r in I.read_goertzel(spark, art).collect())
    got = {
        r.event_type: (r.n_days, r.mean_c, r.weekly_power,
                       r.weekly_amplitude)
        for r in I.read_goertzel(spark, art).collect()
        if r.batch_id == last
    }
    assert got == expect
    # and the engineered weekend bump is actually detected
    assert got["probe"][3] > 1.0


def test_hw_forecast_stream_equals_batch_twin(spark, tmp_path):
    """After the final micro-batch the streamed horizon table must
    BIT-EQUAL holt_winters_from_daily over the concatenated events
    (one scorer — this pins the carry merge)."""
    from datetime import datetime, timedelta

    from parquet_export_spark.operators import stats as ST

    land = str(tmp_path / "landing")
    art = str(tmp_path / "hwart")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)
    rows = []
    eid = 0
    for d in range(28):
        for _ in range(8 + (4 if d % 7 == 2 else 0)):
            rows.append(
                (eid, t0 + timedelta(days=d, minutes=eid % 60), 1,
                 "probe", 1.0, "{}")
            )
            eid += 1
    batches = [rows[: len(rows) // 2], rows[len(rows) // 2 :]]

    def run_once():
        q = I.hw_forecast_stream(
            spark.readStream.schema(schema).parquet(land), art, ckpt
        )
        q.awaitTermination()

    for b in batches:
        spark.createDataFrame(b, schema).coalesce(1).write.mode(
            "append"
        ).parquet(land)
        run_once()

    daily = (
        spark.createDataFrame(rows, schema)
        .selectExpr(
            "event_type",
            "CAST(datediff(CAST(ts AS DATE), DATE '1970-01-01') AS"
            " BIGINT) AS day",
        )
        .groupBy("event_type", "day")
        .count()
        .withColumnRenamed("count", "c")
    )
    expect = {
        (r.event_type, r.horizon): (r.n_days, r.level, r.trend, r.forecast)
        for r in ST.holt_winters_from_daily(daily).collect()
    }
    all_rows = I.read_hw_forecast(spark, art).collect()
    last = max(r.batch_id for r in all_rows)
    got = {
        (r.event_type, r.horizon): (r.n_days, r.level, r.trend, r.forecast)
        for r in all_rows
        if r.batch_id == last
    }
    assert got == expect


def test_js_drift_stream_two_batches_exact(spark, tmp_path):
    """Streaming JS vs a frozen reference: after each micro-batch the
    emitted jsd_nats must equal a sequential Python recomputation over
    the concatenated prefix (zero divergence on a reference-matching
    prefix, positive and <= ln 2 after a bucket flood)."""
    import math
    from datetime import datetime, timedelta

    land = str(tmp_path / "landing")
    ref_dir = str(tmp_path / "ref")
    art = str(tmp_path / "jsart")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)

    def rows(ids, vals, typ):
        return [
            (i, t0 + timedelta(minutes=i), 1, typ, v, "{}")
            for i, v in zip(ids, vals)
        ]

    ref_rows = rows(range(1000, 1040), [10.0] * 20 + [20.0] * 20, "probe")
    I.write_ks_reference(spark.createDataFrame(ref_rows, schema), ref_dir)
    b1 = rows(range(20), [10.0] * 10 + [20.0] * 10, "probe")
    b2 = rows(range(20, 50), [30.0] * 30, "probe")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.js_drift_stream(stream, ref_dir, art, ckpt)
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    def js_python(stream_rows):
        from collections import Counter

        sa = Counter(int(r[4] * 100 + 0.5) for r in stream_rows)
        sb = Counter(int(r[4] * 100 + 0.5) for r in ref_rows)
        na, nb = sum(sa.values()), sum(sb.values())
        s = 0.0
        for x in sorted(set(sa) | set(sb)):
            p, q = sa.get(x, 0) / na, sb.get(x, 0) / nb
            if p > 0:
                s += p * math.log(2 * p / (p + q))
            if q > 0:
                s += q * math.log(2 * q / (p + q))
        return round(s / 2, 9)

    got = {
        r.batch_id: (r.n_stream, r.n_ref, r.jsd_nats, r.js_distance)
        for r in I.read_js_drift(spark, art).collect()
    }
    assert got[0][:2] == (len(b1), len(ref_rows))
    assert got[0][2] == js_python(b1)
    assert got[1][2] == js_python(b1 + b2)
    # prefix 1 matches the reference pmf exactly -> zero divergence;
    # the flood registers positive and bounded by ln 2
    assert got[0][2] == 0.0
    assert 0.0 < got[1][2] <= math.log(2.0) + 1e-9
    assert abs(got[1][3] - round(math.sqrt(got[1][2]), 9)) < 5e-10


def test_tv_drift_stream_two_batches_exact(spark, tmp_path):
    """Streaming TV vs a frozen reference: after each micro-batch the
    emitted (tv_num, tv_ppm) must equal a sequential Python
    recomputation over the concatenated prefix (the w1_drift_stream
    contract, mass flavor: zero drift on a reference-matching prefix,
    positive after a shifted batch)."""
    from datetime import datetime, timedelta

    land = str(tmp_path / "landing")
    ref_dir = str(tmp_path / "ref")
    art = str(tmp_path / "tvart")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)

    def rows(ids, vals, typ):
        return [
            (i, t0 + timedelta(minutes=i), 1, typ, v, "{}")
            for i, v in zip(ids, vals)
        ]

    ref_rows = rows(range(1000, 1040), [10.0] * 20 + [20.0] * 20, "probe")
    I.write_ks_reference(spark.createDataFrame(ref_rows, schema), ref_dir)
    # batch 1 matches the reference shape; batch 2 floods one bucket
    b1 = rows(range(20), [10.0] * 10 + [20.0] * 10, "probe")
    b2 = rows(range(20, 50), [30.0] * 30, "probe")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.tv_drift_stream(stream, ref_dir, art, ckpt)
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    def tv_python(stream_rows):
        from collections import Counter

        sa = Counter(int(r[4] * 100 + 0.5) for r in stream_rows)
        sb = Counter(int(r[4] * 100 + 0.5) for r in ref_rows)
        na, nb = sum(sa.values()), sum(sb.values())
        num = sum(
            abs(sa.get(x, 0) * nb - sb.get(x, 0) * na)
            for x in set(sa) | set(sb)
        )
        return na, nb, num, num * 10**6 // (2 * na * nb)

    got = {
        r.batch_id: (r.n_stream, r.n_ref, r.tv_num, r.tv_ppm)
        for r in I.read_tv_drift(spark, art).collect()
    }
    assert got[0] == tv_python(b1)
    assert got[1] == tv_python(b1 + b2)
    # prefix 1 matches the reference pmf exactly -> zero drift; the
    # batch-2 bucket flood must register as positive mass drift
    assert got[0][2] == 0
    assert got[1][2] > 0
    # (replay idempotence + compaction pinned uniformly in
    # test_monitor_replay_idempotence_and_compaction)


def test_growth_accounting_stream_two_batches_exact(spark, tmp_path):
    """Exact twin parity: per micro-batch the emitted new/returning
    split must equal the sequential set replay (batch 1 all-new;
    batch 2 a known mix; a user repeating WITHIN a batch counts
    once)."""
    from datetime import datetime, timedelta

    land = str(tmp_path / "landing")
    art = str(tmp_path / "gart")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)

    def rows(ids, users):
        return [
            (i, t0 + timedelta(minutes=i), u, "probe", 1.0, "{}")
            for i, u in zip(ids, users)
        ]

    b1 = rows(range(4), [0, 1, 2, 2])          # users {0,1,2}
    b2 = rows(range(4, 9), [1, 2, 3, 4, 4])    # {1,2,3,4}: new {3,4}

    def run_once():
        q = I.growth_accounting_stream(
            spark.readStream.schema(schema).parquet(land), art, ckpt
        )
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    got = {
        r.batch_id: (r.n_active, r.n_new, r.n_returning, r.new_ppm)
        for r in I.read_growth_accounting(spark, art).collect()
    }
    assert got == {
        0: (3, 3, 0, 1_000_000),
        1: (4, 2, 2, 500_000),
    }
    # the stored seen-set is exactly the union of all batch users
    import os

    seen_base = art + "/seen"
    latest = max(
        int(d.split("_", 1)[1])
        for d in os.listdir(seen_base)
        if d.startswith("batch_")
    )
    seen = {
        r.user_id
        for r in spark.read.parquet(
            f"{seen_base}/batch_{latest}"
        ).collect()
    }
    assert seen == {0, 1, 2, 3, 4}


def test_auc_drift_stream_two_batches_exact(spark, tmp_path):
    """Streaming AUC vs a frozen reference: after each micro-batch the
    emitted (u2, auc_ppm) must equal a sequential Python Mann-Whitney
    over the concatenated prefix vs the reference — 500000 ppm on a
    reference-matching prefix, ABOVE it after an upward-shifted batch
    (the direction no symmetric distance reports)."""
    from datetime import datetime, timedelta

    land = str(tmp_path / "landing")
    ref_dir = str(tmp_path / "ref")
    art = str(tmp_path / "aucart")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)

    def rows(ids, vals, typ):
        return [
            (i, t0 + timedelta(minutes=i), 1, typ, v, "{}")
            for i, v in zip(ids, vals)
        ]

    ref_rows = rows(range(1000, 1040), [10.0] * 20 + [20.0] * 20, "probe")
    I.write_ks_reference(spark.createDataFrame(ref_rows, schema), ref_dir)
    b1 = rows(range(20), [10.0] * 10 + [20.0] * 10, "probe")
    b2 = rows(range(20, 50), [30.0] * 30, "probe")  # upward shift

    def run_once():
        q = I.auc_drift_stream(
            spark.readStream.schema(schema).parquet(land), ref_dir, art, ckpt
        )
        q.awaitTermination()

    def py_auc(stream_vals):
        ref_vals = [10.0] * 20 + [20.0] * 20
        u2 = 0
        for a in stream_vals:
            for b in ref_vals:
                if a > b:
                    u2 += 2
                elif a == b:
                    u2 += 1
        return u2, u2 * 500_000 // (len(stream_vals) * len(ref_vals))

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    got = {
        r.batch_id: (r.n_stream, r.n_ref, r.u2, r.auc_ppm)
        for r in I.read_auc_drift(spark, art).collect()
    }
    v1 = [10.0] * 10 + [20.0] * 10
    u2a, ppma = py_auc(v1)
    u2b, ppmb = py_auc(v1 + [30.0] * 30)
    assert got == {
        0: (20, 40, u2a, ppma),
        1: (50, 40, u2b, ppmb),
    }
    assert ppma == 500_000      # matching prefix: exactly no dominance
    assert ppmb > 500_000       # upward shift: stream dominates


def test_mk_trend_stream_matches_batch_on_prefix(spark, tmp_path):
    """The monitor-family MATH pin for mk_trend_stream: after each
    micro-batch, the emitted scores must EQUAL the batch operator run
    on the concatenated prefix — trivially true by construction (one
    shared scoring function, mk_trend_from_daily), asserted anyway so
    a future fork of either path fails here."""
    from datetime import datetime, timedelta

    from parquet_export_spark.operators import stats as ST

    land = str(tmp_path / "landing")
    art = str(tmp_path / "art")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 5, 1)

    def rows(lo, hi, per_day):
        out = []
        for d in range(lo, hi):
            for k in range(per_day(d)):
                out.append(
                    (
                        d * 100 + k,
                        t0 + timedelta(days=d, minutes=k),
                        k % 5,
                        "probe" if d % 2 == 0 else "other",
                        1.0,
                        "{}",
                    )
                )
        return out

    # batch 1: rising counts; batch 2: extends the series downward
    b1 = rows(0, 6, lambda d: 2 + d)
    b2 = rows(6, 10, lambda d: max(1, 12 - d))

    def run_once():
        q = I.mk_trend_stream(
            spark.readStream.schema(schema).parquet(land), art, ckpt
        )
        q.awaitTermination()

    def batch_scores(prefix):
        df = spark.createDataFrame(prefix, schema)
        return sorted(
            tuple(r)
            for r in ST.mann_kendall_trend_daily({"events": df}).collect()
        )

    def stream_scores(batch_id):
        return sorted(
            tuple(r)[1:]
            for r in I.read_mk_trend(spark, art)
            .filter(F.col("batch_id") == batch_id)
            .collect()
        )

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    assert stream_scores(0) == batch_scores(b1)

    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    assert stream_scores(1) == batch_scores(b1 + b2)
    # and the trend family's monotone story holds: the rising-then-
    # falling "probe" series must have moved its S statistic
    full = {r[0]: r for r in stream_scores(1)}
    assert "probe" in full and "other" in full


def test_balance_stream_two_batches_matches_batch_operator(spark, tmp_path):
    """Streaming ledger: after two micro-batches every (suppkey, day)
    balance must equal the batch operator over the CONCATENATED rows.
    The batch boundary is placed (a) INSIDE a dip — the clamp binds
    across the carry — and (b) INSIDE a calendar day — the open-day
    carry must merge the day's remaining rows before clamping."""
    from datetime import datetime

    from parquet_export_spark.operators import advanced as A

    land = str(tmp_path / "li_landing")
    art = str(tmp_path / "ledger")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "l_orderkey long, l_linenumber int, l_suppkey long,"
        " l_shipdate timestamp_ntz, l_quantity double,"
        " l_returnflag string"
    )

    def d(day):
        return datetime(2024, 5, day)

    # supplier 10: ship 5 on day 1; return 9 on day 2 split ACROSS the
    # batches (4 in b1, 5 in b2 — partial-day clamp would give the
    # wrong answer); ship 3 on day 3. supplier 20: dip below zero
    # entirely inside batch 2.
    b1 = [
        (1, 1, 10, d(1), 5.0, "N"),
        (2, 1, 10, d(2), 4.0, "R"),
        (3, 1, 20, d(1), 2.0, "N"),
    ]
    b2 = [
        (4, 1, 10, d(2), 5.0, "R"),
        (5, 1, 10, d(3), 3.0, "N"),
        (6, 1, 20, d(2), 7.0, "R"),
        (7, 1, 20, d(3), 4.0, "N"),
    ]

    def run_once():
        stream = spark.readStream.schema(schema).parquet(land)
        q = I.balance_stream(stream, art, ckpt, supp_mod=1)
        q.awaitTermination()

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()

    got = {
        (r.suppkey, r.day): (r.net_qty, r.balance)
        for r in I.read_balances(spark, art).collect()
    }
    full = spark.createDataFrame(b1 + b2, schema)
    want = {
        (r.suppkey, r.day): (r.net_qty, r.balance)
        for r in A.clamped_running_balance(
            {"lineitem": full}, supp_mod=1
        ).collect()
    }
    assert got == want and len(got) == 6
    # the engineered shapes actually bound: supplier 10's day-2 net is
    # -9 total (clamp to 0), supplier 20 dips then recovers to 4
    day2 = int(
        (datetime(2024, 5, 2) - datetime(1970, 1, 1)).days
    )
    assert got[(10, day2)] == (-9, 0)
    assert got[(20, day2 + 1)][1] == 4

    # replay with no new input: outputs unchanged (idempotence), and
    # carry compaction keeps at most the two newest trees
    run_once()
    again = {
        (r.suppkey, r.day): (r.net_qty, r.balance)
        for r in I.read_balances(spark, art).collect()
    }
    assert again == got
    import pathlib

    carries = sorted(
        p.name for p in (pathlib.Path(art) / "carry").glob("batch_*")
    )
    assert len(carries) <= 2


def test_changepoint_stream_matches_batch_on_prefix(spark, tmp_path):
    """Monitor-family MATH pin: after each micro-batch the emitted
    gain profile must equal the batch operator over the concatenated
    prefix — exact string/integer lanes, so equality is literal."""
    from datetime import datetime, timedelta

    from parquet_export_spark.operators import stats as ST

    land = str(tmp_path / "events_landing")
    art = str(tmp_path / "cpt")
    ckpt = str(tmp_path / "ckpt")
    schema = (
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string"
    )
    t0 = datetime(2024, 6, 1)
    # engineered level shift: 10 days at ~10, then 10 days at ~50
    rows = [
        (i, t0 + timedelta(days=i, hours=3), 1, "probe",
         10.0 if i < 10 else 50.0, "{}")
        for i in range(20)
    ] + [
        (100 + i, t0 + timedelta(days=i, hours=5), 2, "other",
         5.0 + i, "{}")
        for i in range(6)
    ]
    b1 = [r for r in rows if r[0] in set(range(12)) | {100, 101, 102}]
    b2 = [r for r in rows if r[0] not in {x[0] for x in b1}]

    def run_once():
        q = I.changepoint_stream(
            spark.readStream.schema(schema).parquet(land), art, ckpt
        )
        q.awaitTermination()

    def batch_profile(prefix):
        df = spark.createDataFrame(prefix, schema)
        return sorted(
            tuple(r)
            for r in ST.changepoint_scan_daily({"events": df}).collect()
        )

    def stream_profile(batch_id):
        return sorted(
            tuple(r)[1:]
            for r in I.read_changepoints(spark, art)
            .filter(F.col("batch_id") == batch_id)
            .collect()
        )

    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    assert stream_profile(0) == batch_profile(b1)

    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append"
    ).parquet(land)
    run_once()
    prof = stream_profile(1)
    assert prof == batch_profile(b1 + b2)
    # the engineered shift is FOUND: the exact Fraction argmax for
    # "probe" lands on the last low day (split between day 9 and 10)
    from fractions import Fraction

    probe = [
        (Fraction(int(num), den), day)
        for (et, day, _nl, num, den) in prof
        if et == "probe"
    ]
    best_day = max(probe)[1]
    want_day = (t0 + timedelta(days=9)).date()
    assert best_day == (want_day - datetime(1970, 1, 1).date()).days

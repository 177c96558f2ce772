"""Structured Streaming: windowed sketch aggregation via the monoid sink —
streamed result must equal the batch-computed sketches per window."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from sketchlib import agg, hll, streaming
from sketchlib.config import HLLConfig


@pytest.fixture(scope="module")
def event_data(spark, tmp_path_factory):
    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        Row(ts=base + dt.timedelta(seconds=13 * i % 3600), token=int(i * 37 % 5000))
        for i in range(20_000)
    ]
    path = str(tmp_path_factory.mktemp("events_in"))
    spark.createDataFrame(rows).repartition(4).write.mode("overwrite").parquet(path)
    return path


def test_replayed_micro_batch_is_idempotent(spark, tmp_path_factory):
    """foreachBatch is at-least-once: delivering the same (batch_df, batch_id)
    twice must NOT change the result. CMS is the sensitive sketch (counter-add
    is not idempotent); before the dynamic-partition-overwrite fix a replay
    appended a second partial for part=batch_id and doubled every count."""
    from sketchlib import cms
    from sketchlib.config import CMSConfig

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows1 = [Row(ts=base + dt.timedelta(seconds=i), token=i % 50) for i in range(1000)]
    rows2 = [Row(ts=base + dt.timedelta(seconds=i), token=i % 70) for i in range(500)]
    b1 = spark.createDataFrame(rows1)
    b2 = spark.createDataFrame(rows2)

    specs = [agg.SketchSpec("cms", CMSConfig(eps=0.01, delta=0.01), "token")]
    out_dir = str(tmp_path_factory.mktemp("replay_out"))
    sink = streaming.sketch_sink(specs, out_dir, ts_col="ts", window="60 minutes")

    sink(b1, 0)
    sink(b2, 1)
    sink(b1, 0)  # replay of micro-batch 0

    merged = streaming.read_windowed_sketches(spark, out_dir).collect()
    assert len(merged) == 1  # one 60-min window
    blob = bytes(merged[0]["blob"])
    # token 0 appears 20x in batch 1 and 8x in batch 2 = 28 exactly (CMS
    # overestimates only; at this eps/width the estimate is exact here)
    import numpy as np

    est = int(cms.query_blob(np.array([0]), blob)[0])
    assert est == 28, f"replayed batch double-counted: est={est}, want 28"


def test_streamed_sketches_equal_batch(spark, event_data, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("stream_out"))
    specs = [agg.SketchSpec("hll", HLLConfig(p=12), "token")]

    stream = (
        spark.readStream.schema("ts timestamp, token long")
        .option("maxFilesPerTrigger", "2")
        .parquet(event_data)
    )
    q = streaming.run_stream_to_sketches(
        spark, stream, specs, out_dir, ts_col="ts", window="15 minutes"
    )
    q.awaitTermination(300)

    got = {
        r["group"]: bytes(r["blob"])
        for r in streaming.read_windowed_sketches(spark, out_dir).collect()
    }

    # batch reference: same windowing, direct build
    batch = spark.read.parquet(event_data)
    # reuse the sink's own labeler so the parity property holds whatever the
    # session timezone renders (labels are pinned to UTC wall time)
    windowed = streaming._with_window(batch, "ts", "15 minutes")
    want = agg.collect_blobs(
        agg.build_sketches(windowed, specs, group_by=streaming.WINDOW_COL)
    )
    want = {g: b for (_, g), b in want.items()}

    assert set(got) == set(want) and len(got) == 4  # 1h of data / 15min
    for g in want:
        assert got[g] == want[g], f"window {g}: streamed blob != batch blob"
        est = hll.estimate_blob(got[g])
        exact = (
            windowed.filter(F.col(streaming.WINDOW_COL) == g)
            .agg(F.countDistinct("token").alias("d")).collect()[0]["d"]
        )
        assert abs(est - exact) / exact < 0.1


def test_window_labels_independent_of_session_timezone(spark):
    """A writer and a later backfill/reader with different session zones must
    produce the SAME window label for the same event-time window (labels are
    rendered in UTC), or partials for one window would merge into two rows."""
    base = dt.datetime(2026, 1, 1, 10, 0, 0)
    df = spark.createDataFrame([Row(ts=base, token=1)])
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc_label = streaming._with_window(df, "ts", "10 minutes").collect()[0][
            streaming.WINDOW_COL]
        spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        tokyo_label = streaming._with_window(df, "ts", "10 minutes").collect()[0][
            streaming.WINDOW_COL]
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert utc_label == tokyo_label == "2026-01-01 10:00:00"


def test_null_event_times_dropped_not_mislabeled(spark, tmp_path_factory):
    """Rows with a null event time belong to no window: they must be dropped
    (engine semantics), not silently sketched under a bare group label via
    the null-skipping concat_ws in the sink."""
    from sketchlib import cms
    from sketchlib.config import CMSConfig

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [Row(ts=base, token=1, src="a"),
            Row(ts=None, token=2, src="a"),
            Row(ts=base, token=3, src="b")]
    df = spark.createDataFrame(rows)
    specs = [agg.SketchSpec("cms", CMSConfig(eps=0.01, delta=0.01), "token")]
    out_dir = str(tmp_path_factory.mktemp("nullts_out"))
    sink = streaming.sketch_sink(specs, out_dir, ts_col="ts",
                                 window="60 minutes", group_by="src")
    sink(df, 0)
    merged = streaming.read_windowed_sketches(spark, out_dir).collect()
    labels = sorted(r["group"] for r in merged)
    # only real "<window>|<group>" labels — no bare "a" phantom group
    assert labels == ["2026-01-01 00:00:00|a", "2026-01-01 00:00:00|b"]
    import numpy as np
    by_label = {r["group"]: bytes(r["blob"]) for r in merged}
    est_a = cms.query_blob(np.array([1, 2]), by_label["2026-01-01 00:00:00|a"])
    assert int(est_a[0]) == 1 and int(est_a[1]) == 0  # null-ts token 2 dropped


def test_legacy_layout_keeps_all_partitions(spark, tmp_path_factory):
    """The pre-batch-lineage sink overwrote ``part`` with the micro-batch id,
    so same-key rows are usually DIFFERENT input partitions. Reading a legacy
    dir must keep them all (content dedup), not drop all but one."""
    from sketchlib import cms
    from sketchlib.config import CMSConfig

    base = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [Row(ts=base + dt.timedelta(seconds=i), token=i % 10)
            for i in range(1000)]
    df = spark.createDataFrame(rows).repartition(4)
    specs = [agg.SketchSpec("cms", CMSConfig(eps=0.01, delta=0.01), "token")]
    out_dir = str(tmp_path_factory.mktemp("legacy_out"))
    # reproduce the legacy sink byte-for-byte: build partials, overwrite part
    # with the batch id, plain append (no batch column)
    windowed = streaming._with_window(df, "ts", "60 minutes")
    import os as _os
    partials = agg.build_partials(windowed, specs, group_by=streaming.WINDOW_COL)
    (partials.withColumn("part", F.lit(0).cast("int"))
     .write.mode("append").parquet(_os.path.join(out_dir, "partials")))

    merged = streaming.read_windowed_sketches(spark, out_dir).collect()
    assert len(merged) == 1
    import numpy as np
    est = cms.query_blob(np.array([0]), bytes(merged[0]["blob"]))
    assert int(est[0]) == 100  # all 4 partitions' counts present

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
    windowed = batch.withColumn(
        streaming.WINDOW_COL,
        F.date_format(F.window("ts", "15 minutes")["start"], "yyyy-MM-dd HH:mm:ss"),
    )
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

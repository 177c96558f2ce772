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

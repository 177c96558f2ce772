"""Structured Streaming integration: windowed sketch aggregation.

The sketches are streaming-ready by construction — every one is a commutative
monoid, so per-micro-batch partials merge exactly, and late data is just
another partial for an existing window (no rollback needed, unlike
non-mergeable aggregates).

``sketch_sink`` returns a ``foreachBatch`` function that builds per-partition
partials for each (event-time window[, group]) in the micro-batch and appends
them to a partials parquet — the same durable layout as ``sketchlib.job``
checkpoints. ``read_windowed_sketches`` tree-merges that parquet into one
blob per (sketch, window[, group]) at read time; estimates are computed with
the usual blob functions.

This is deliberately the Kappa shape (append monoid partials, merge on read):
at 100 TB/day the partials table is tiny (P blobs per window), the stream
never shuffles, and replays/backfills are idempotent appends. A
``transformWithStateInPandas`` operator could keep merged state inside the
stream instead; the monoid contract is what makes either correct.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from sketchlib import agg
from sketchlib.agg import SketchSpec


WINDOW_COL = "_sk_window"


def _with_window(df: DataFrame, ts_col: str, window: str) -> DataFrame:
    w = F.window(F.col(ts_col), window)
    return df.withColumn(
        WINDOW_COL, F.date_format(w["start"], "yyyy-MM-dd HH:mm:ss")
    )


def sketch_sink(
    specs: list[SketchSpec],
    out_dir: str,
    ts_col: str,
    window: str = "10 minutes",
    group_by: str | None = None,
):
    """``foreachBatch`` function: micro-batch -> windowed partials parquet.

    The window label is folded into the partial's ``group`` column as
    ``"<window start>|<group>"`` so the whole agg/merge machinery applies
    unchanged; ``part`` is the micro-batch id (lineage: which batch
    contributed which partial)."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        windowed = _with_window(batch_df, ts_col, window)
        if group_by is not None:
            windowed = windowed.withColumn(
                WINDOW_COL, F.concat_ws("|", F.col(WINDOW_COL), F.col(group_by))
            )
        partials = agg.build_partials(windowed, specs, group_by=WINDOW_COL)
        # foreachBatch is at-least-once: a replayed micro-batch re-delivers the
        # same batch_id with the same source offsets, so its partials are
        # byte-identical — writing partitionBy(batch=batch_id) with DYNAMIC
        # partition overwrite makes the replay idempotent (it replaces its own
        # directory instead of appending duplicates that would double-count
        # the non-idempotent sketches: CMS counters, KLL/t-digest weights).
        # ``part`` keeps the per-partition partial id (a micro-batch emits one
        # partial per input partition); ``batch`` is the lineage key.
        (partials.withColumn("batch", F.lit(batch_id).cast("long"))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch")
         .parquet(os.path.join(out_dir, "partials")))

    return sink


def read_windowed_sketches(spark: SparkSession, out_dir: str) -> DataFrame:
    """Merge the streamed partials into one row per (sketch, window[, group]).
    The ``group`` column carries the window label written by the sink.

    Defense-in-depth against duplicate partials (e.g. a legacy append-mode
    layout, or a sink crash between partition commits): partials for the same
    (sketch, group, batch, part) are byte-identical by determinism (same
    source offsets => same data), so keeping one row per key is exact —
    never double-counted."""
    partials = spark.read.parquet(os.path.join(out_dir, "partials"))
    if "batch" in partials.columns:
        partials = partials.dropDuplicates(["sketch", "group", "batch", "part"]).drop("batch")
    else:
        # legacy append-mode layout (pre-batch-lineage sink): partials were
        # keyed by part only; same-key rows are byte-identical by determinism
        partials = partials.dropDuplicates(["sketch", "group", "part"])
    return agg.merge_partials(partials, fanout=64, levels=2)


def stateful_windowed_sketch(
    stream_df: DataFrame,
    spec: SketchSpec,
    ts_col: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """True stateful streaming: one sketch blob of state per event-time
    window, merged across micro-batches inside the engine's state store
    (``applyInPandasWithState``), emitted when the watermark passes the
    window (EventTimeTimeout). Late data within the watermark merges into
    the live state; the emitted blob is final.

    Output schema: ``win_start timestamp, blob binary, rows bigint``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from sketchlib import blob as blobmod
    from sketchlib.config import _Cfg

    cfg_json = spec.cfg.to_json()
    sketch_kind = spec.sketch
    col = spec.col

    def fn(key, pdf_iter, state: GroupState):
        from sketchlib.agg import MODULES

        cfg = _Cfg.from_json(cfg_json)
        module = MODULES[sketch_kind]
        if state.hasTimedOut:
            blob_bytes, rows = state.get
            state.remove()
            yield pd.DataFrame(
                {"win_start": [key[0]], "blob": [blob_bytes], "rows": [rows]}
            )
            return
        import numpy as np

        builder = module.new_builder(cfg)
        rows = 0
        for pdf in pdf_iter:
            vals = pdf[col]
            if len(vals) == 0:
                continue
            first = vals.iloc[0]
            if hasattr(first, "__len__") and not isinstance(first, (str, bytes)):
                flat = np.concatenate([np.asarray(v) for v in vals])
            else:
                flat = vals.to_numpy()
            builder.update(flat)
            rows += len(pdf)
        new_blob = blobmod.pack(sketch_kind, cfg, builder.to_payload())
        if state.exists:
            old_blob, old_rows = state.get
            new_blob = module.merge_blobs(bytes(old_blob), new_blob)
            rows += old_rows
        state.update((new_blob, rows))
        # emit once the watermark passes the window end
        state.setTimeoutTimestamp(int(key[1].timestamp() * 1000))

    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("_win", F.window(F.col(ts_col), window))
        .withColumn("_ws", F.col("_win.start"))
        .withColumn("_we", F.col("_win.end"))
        .drop("_win")
    )
    return (
        keyed.groupBy("_ws", "_we")
        .applyInPandasWithState(
            fn,
            outputStructType="win_start timestamp, blob binary, rows bigint",
            stateStructType="blob binary, rows bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def tws_windowed_sketch(
    stream_df: DataFrame,
    spec: SketchSpec,
    ts_col: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
):
    """Same contract as ``stateful_windowed_sketch`` on Spark 4's newer
    ``transformWithStateInPandas`` engine: one sketch blob of ValueState per
    event-time window, merged across micro-batches, emitted by an explicit
    EVENT-TIME TIMER registered at the window end (fires when the watermark
    passes it). The newer API adds composable state variables and timers —
    the sketch monoid drops in unchanged.

    Runtime dependency note: the TWS state-server protocol requires
    ``google.protobuf`` on the driver/workers (ships with real Spark
    deployments; absent in this offline dev container, where the
    ``applyInPandasWithState`` variant above covers the stateful path).

    Output schema: ``win_start timestamp, blob binary, rows bigint``.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle,
    )

    cfg_json = spec.cfg.to_json()
    sketch_kind = spec.sketch
    col = spec.col

    class SketchProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._state = handle.getValueState("sk", "blob binary, rows bigint")

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np

            from sketchlib import blob as blobmod
            from sketchlib.agg import MODULES
            from sketchlib.config import _Cfg

            cfg = _Cfg.from_json(cfg_json)
            module = MODULES[sketch_kind]
            builder = module.new_builder(cfg)
            n = 0
            for pdf in rows:
                vals = pdf[col]
                if len(vals) == 0:
                    continue
                first = vals.iloc[0]
                if hasattr(first, "__len__") and not isinstance(first, (str, bytes)):
                    flat = np.concatenate([np.asarray(v) for v in vals])
                else:
                    flat = vals.to_numpy()
                builder.update(flat)
                n += len(pdf)
            new_blob = blobmod.pack(sketch_kind, cfg, builder.to_payload())
            cur = self._state.get()
            if cur is not None:
                new_blob = module.merge_blobs(bytes(cur[0]), new_blob)
                n += int(cur[1])
            self._state.update((new_blob, n))
            # emit when the watermark passes the window end (idempotent
            # re-registration across micro-batches)
            self._handle.registerTimer(int(key[1].timestamp() * 1000))
            return iter(())

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            cur = self._state.get()
            self._state.clear()
            if cur is None:
                return
            yield pd.DataFrame(
                {"win_start": [key[0]], "blob": [bytes(cur[0])], "rows": [int(cur[1])]}
            )

        def close(self) -> None:
            pass

    keyed = (
        stream_df.withWatermark(ts_col, watermark)
        .withColumn("_win", F.window(F.col(ts_col), window))
        .withColumn("_ws", F.col("_win.start"))
        .withColumn("_we", F.col("_win.end"))
        .drop("_win")
    )
    return keyed.groupBy("_ws", "_we").transformWithStateInPandas(
        SketchProcessor(),
        outputStructType="win_start timestamp, blob binary, rows bigint",
        outputMode="append",
        timeMode="eventTime",
    )


def run_stream_to_sketches(
    spark: SparkSession,
    stream_df: DataFrame,
    specs: list[SketchSpec],
    out_dir: str,
    ts_col: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    group_by: str | None = None,
    checkpoint_dir: str | None = None,
):
    """Wire a streaming DataFrame to the sketch sink (availableNow-friendly).
    Watermarking bounds state the engine keeps for the windowing column; the
    monoid sink itself accepts arbitrarily late partials."""
    q = (
        stream_df.withWatermark(ts_col, watermark)
        .writeStream.foreachBatch(sketch_sink(specs, out_dir, ts_col, window, group_by))
        .option("checkpointLocation", checkpoint_dir or os.path.join(out_dir, "_chk"))
        .trigger(availableNow=True)
        .start()
    )
    return q

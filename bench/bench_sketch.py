#!/usr/bin/env python
"""Scaling-protocol benchmark (BASELINE.md part 2): build the full sketch
family over the deterministic bench corpus at a given parallelism and print
one JSON line with tokens/sec. Run via::

    spark-submit --py-files sketchlib.zip bench/bench_sketch.py \
        --master local[8]  --n-docs 200000
    spark-submit --py-files sketchlib.zip bench/bench_sketch.py \
        --master local[32] --n-docs 200000

The two-cluster-size criterion (north rule: N vs 4N executors, efficiency
>= 0.8) is evidenced in-sandbox by the local[8] vs local[32] pair on
identical input/seed/configs — see bench/run_scaling.py which automates the
pair and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local[32]")
    ap.add_argument("--n-docs", type=int, default=400_000)
    ap.add_argument("--cache-dir", default=None)
    ap.add_argument("--partitions", type=int, default=256)
    ap.add_argument("--m-bits", type=int, default=1 << 21)
    ap.add_argument("--engine", choices=("df", "arrow"), default="df",
                    help="df = DataFrame scan (r1/r2 ladder continuity); "
                         "arrow = pyarrow file-scan fast path (round 3)")
    args = ap.parse_args()

    cores = int(args.master.split("[")[1].rstrip("]")) if "[" in args.master else 32
    cache_dir = args.cache_dir or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache"
    )

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(args.master)
        .appName(f"sketch-scaling-{args.master}")
        .config("spark.sql.shuffle.partitions", str(2 * cores))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # one task per corpus file: the cache is written as many small files,
        # and the default 128 MB packing would leave ~1 task per core (bad
        # wave packing). At scale this is the usual maxPartitionBytes tuning.
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4m")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sketchlib import agg, datagen
    from sketchlib.config import (
        BloomConfig, CMSConfig, HLLConfig, KLLConfig, TDigestConfig,
    )

    corpus_path = datagen.corpus_parquet(
        spark, args.n_docs, cache_dir, partitions=args.partitions
    )
    corpus = spark.read.parquet(corpus_path)
    total_tokens = int(corpus.agg(F.sum("n_tok")).collect()[0][0])

    specs = [
        agg.SketchSpec("bloom", BloomConfig(m_bits=args.m_bits, k=8, word_bits=64,
                                            words_per_block=8, sectors=8), "tokens"),
        agg.SketchSpec("hll", HLLConfig(p=14), "tokens"),
        agg.SketchSpec("cms", CMSConfig(eps=0.0005, delta=0.01), "tokens"),
        agg.SketchSpec("kll", KLLConfig(k=200), "n_tok"),
        agg.SketchSpec("tdigest", TDigestConfig(compression=100), "n_tok"),
    ]

    def _cpu_times() -> list[int]:
        with open("/proc/stat") as fh:
            return list(map(int, fh.readline().split()[1:9]))

    if args.engine == "arrow":
        build = lambda ss: agg.collect_blobs(  # noqa: E731
            agg.build_sketches_files(spark, corpus_path, ss))
    else:
        build = lambda ss: agg.collect_blobs(agg.build_sketches(corpus, ss))  # noqa: E731

    # warm-up (JVM + python workers + page cache), then measured run.
    # /proc/stat is snapshotted around EXACTLY the measured section so noise
    # (hypervisor steal, external busy cores) is attributed to the timed
    # window, not to JVM startup or warm-up.
    build(specs[:1])
    c0 = _cpu_times()
    t0 = time.perf_counter()
    blobs = build(specs)
    wall = time.perf_counter() - t0
    c1 = _cpu_times()
    d = [y - x for x, y in zip(c0, c1)]
    tot = max(sum(d), 1)
    measured_steal = 100.0 * d[7] / tot
    measured_busy = (tot - d[3] - d[4]) / tot * (os.cpu_count() or 32)

    print(json.dumps({
        "master": args.master,
        "cores": cores,
        "engine": args.engine,
        "n_docs": args.n_docs,
        "total_tokens": total_tokens,
        "wall_s": round(wall, 3),
        "tokens_per_sec": round(total_tokens / wall, 0),
        "sketches": sorted(k[0] for k in blobs),
        "measured_steal_pct": round(measured_steal, 1),
        "measured_busy_cores": round(measured_busy, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()

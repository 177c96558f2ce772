#!/usr/bin/env python
"""Driver benchmark contract: runs the headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line.

Headline = the north-rule pipeline: build all five mergeable sketches over a
deterministic tokenized corpus sized to the SF (FIXTURES.md F1; cached as
parquet under .cache so generation cost is excluded), probe the Bloom filter,
plus representative exact-side and dedup/ANN queries over the SF tables.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import numpy as np

    # --- noise instrumentation -------------------------------------------------
    # This sandbox shares its 32 cores with bursty external tenants (loadavg
    # 6-13 with zero local processes; identical builds have measured 4M and
    # 37M tokens/s minutes apart). Two defenses:
    # 1. a bounded launch gate on loadavg;
    # 2. a CALIBRATION SPIN — a fixed single-core NumPy sort timed before and
    #    after every query. loadavg decays over a minute and counts our own
    #    executors, but the spin directly measures how much CPU an external
    #    tenant is stealing *right now*. A query whose after-spin is slow ran
    #    in a contaminated window and is retried once (min kept).
    _calib = np.random.default_rng(0).integers(0, 1 << 30, 1_500_000, dtype=np.int64)

    def spin_ms() -> float:
        t0 = time.perf_counter()
        np.sort(_calib)
        return (time.perf_counter() - t0) * 1000.0

    t_wait = time.time()
    while time.time() - t_wait < 180 and os.getloadavg()[0] > 2.5:
        time.sleep(5)
    calib_ref = min(spin_ms() for _ in range(7))

    def wait_for_quiet_spin(max_s: float = 90.0) -> float:
        t0 = time.time()
        while time.time() - t0 < max_s:
            s = spin_ms()
            if s < 1.6 * calib_ref:
                return s
            time.sleep(3)
        return spin_ms()

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sketchlib-bench")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # split the many-small-file corpus cache into ~one task per file so
        # waves pack evenly across cores (default 128 MB packing leaves ~1
        # task per core and a straggler tail)
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.files.openCostInBytes", "4m")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sketchlib import agg, datagen, probe
    from sketchlib.config import (
        BloomConfig, CMSConfig, HLLConfig, KLLConfig, TDigestConfig,
    )

    n_docs = max(2_000, int(2_000_000 * sf))
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    corpus_path = datagen.corpus_parquet(spark, n_docs, cache_dir, partitions=4 * cpus)
    corpus = spark.read.parquet(corpus_path)
    total_tokens = corpus.agg(F.sum("n_tok")).collect()[0][0]

    specs = [
        agg.SketchSpec("bloom", BloomConfig(m_bits=1 << 21, k=8, word_bits=64,
                                            words_per_block=8, sectors=8), "tokens"),
        agg.SketchSpec("hll", HLLConfig(p=14), "tokens"),
        agg.SketchSpec("cms", CMSConfig(eps=0.0005, delta=0.01), "tokens"),
        agg.SketchSpec("kll", KLLConfig(k=200), "n_tok"),
        agg.SketchSpec("tdigest", TDigestConfig(compression=100), "n_tok"),
    ]

    queries: dict[str, float] = {}
    query_noise: dict[str, dict] = {}
    extra: dict = {}

    def timed(name: str, fn, retries: int = 1):
        best_dt, best_out, best_meta = None, None, None
        for attempt in range(retries + 1):
            pre = wait_for_quiet_spin()
            t0 = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t0
            post = spin_ms()
            meta = {
                "spin_pre": round(pre / calib_ref, 2),
                "spin_post": round(post / calib_ref, 2),
                "attempts": attempt + 1,
            }
            if best_dt is None or dt < best_dt:
                best_dt, best_out, best_meta = dt, out, meta
            if post < 1.6 * calib_ref:
                break  # clean window: trust this measurement
        best_meta["attempts"] = attempt + 1
        queries[name] = round(best_dt, 3)
        query_noise[name] = best_meta
        return best_out

    # headline: full five-sketch distributed build (scan + partials + merge)
    blobs = timed(
        "q_sketch_build_all",
        lambda: agg.collect_blobs(agg.build_sketches(corpus, specs)),
    )
    extra["sketch_build_tokens_per_sec"] = round(total_tokens / queries["q_sketch_build_all"], 0)
    extra["total_tokens"] = int(total_tokens)

    # bloom-only build (the reference's benchmarked operation, A17)
    timed(
        "q_bloom_build",
        lambda: agg.collect_blobs(agg.build_sketches(corpus, specs[:1])),
    )
    extra["bloom_build_tokens_per_sec"] = round(total_tokens / queries["q_bloom_build"], 0)

    # bloom probe: 5M scalar probes against the merged blob
    bloom_blob = blobs[("bloom", "")]
    probes = spark.range(5_000_000).select(
        (F.col("id") % (1 << 18)).cast("int").alias("t")
    )
    timed(
        "q_bloom_probe_5m",
        lambda: probe.with_bloom_membership(probes, bloom_blob, "t")
        .filter("member").count(),
    )
    extra["bloom_probe_keys_per_sec"] = round(5_000_000 / queries["q_bloom_probe_5m"], 0)

    # grouped HLL (group skew path)
    timed(
        "q_hll_grouped",
        lambda: agg.build_sketches(
            corpus, [agg.SketchSpec("hll_g", HLLConfig(p=12), "tokens")], group_by="source"
        ).count(),
    )

    # exact-side representative queries on the SF tables
    import __spark_entry__ as entrymod

    timed("q01_pricing_summary", lambda: entrymod.q01_pricing_summary(spark, sf_dir).collect())
    timed("q15_orders_by_segment", lambda: entrymod.q15_orders_by_segment(spark, sf_dir).collect())
    timed("q_minhash_near_dups", lambda: entrymod.sk_minhash_near_dups(spark, sf_dir).count())
    timed("q_ann_cosine_topk", lambda: entrymod.sk_ann_cosine_topk(spark, sf_dir).collect())

    # measured per-geometry probe costs (ns/key, min-of-reps) — the live
    # input for advisor.suggest_config_cost's performance-optimal selection
    from sketchlib import advisor

    probe_ns = {}
    for label, geom, k in (
        ("reg64_k4", dict(word_bits=64, words_per_block=1, sectors=1), 4),
        ("cl512_k4", dict(word_bits=64, words_per_block=8, sectors=1), 4),
        ("cl512s8_k8", dict(word_bits=64, words_per_block=8, sectors=8), 8),
        ("cl512s8z2_k8", dict(word_bits=64, words_per_block=8, sectors=8, zones=2), 8),
    ):
        cfg = BloomConfig(m_bits=1 << 21, k=k, **geom)
        probe_ns[label] = round(advisor.measure_probe_ns(cfg, reps=3), 1)
    extra["probe_ns_per_key"] = probe_ns

    total = round(sum(queries.values()), 3)
    print(json.dumps({
        "metric": "sketchlib headline (5-sketch distributed build + probe + exact/dedup/ANN)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
        "query_noise": query_noise,
        "calib_spin_ms": round(calib_ref, 2),
        "loadavg_at_exit": round(os.getloadavg()[0], 2),
        **extra,
    }))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

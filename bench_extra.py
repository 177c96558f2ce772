#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1): times each bench row in
isolation with a fresh-ish session identical in config to bench.py, using the
noop sink where a DataFrame is produced, and captures .explain("formatted")
into plans/r06/. Does NOT replace bench.py (frozen contract) — numbers cited
in OPTIMIZATION_r06.md come from here plus full bench.py runs.

Usage:
  python bench_extra.py [--plans suffix] [--reps N] [q_name ...]
With --plans, writes plans/r06/<query>_<suffix>.txt for every selected query.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = [a for a in sys.argv[1:]]
    plans_suffix = None
    reps = 3
    if "--plans" in args:
        i = args.index("--plans")
        plans_suffix = args[i + 1]
        del args[i : i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    selected = set(args)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench"))
    import noise

    calib_ref = min(noise.spin_ms() for _ in range(5))

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sketchlib-bench-extra")
        .config("spark.sql.shuffle.partitions", str(2 * cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
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

    m = __import__("re").search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_docs = max(2_000, int(2_000_000 * sf))
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".cache")
    corpus_path = datagen.corpus_parquet(spark, n_docs, cache_dir, partitions=4 * cpus)
    corpus = spark.read.parquet(corpus_path)

    specs = [
        agg.SketchSpec("bloom", BloomConfig(m_bits=1 << 21, k=8, word_bits=64,
                                            words_per_block=8, sectors=8), "tokens"),
        agg.SketchSpec("hll", HLLConfig(p=14), "tokens"),
        agg.SketchSpec("cms", CMSConfig(eps=0.0005, delta=0.01), "tokens"),
        agg.SketchSpec("kll", KLLConfig(k=200), "n_tok"),
        agg.SketchSpec("tdigest", TDigestConfig(compression=100), "n_tok"),
    ]

    import __spark_entry__ as entrymod

    # warm-ups, mirroring bench.py
    entrymod.q01_pricing_summary(spark, sf_dir).collect()
    blobs = agg.collect_blobs(agg.build_sketches_files(spark, corpus_path, specs))
    agg.collect_blobs(agg.build_sketches(corpus, specs))
    bloom_blob = blobs[("bloom", "")]
    probes = spark.range(5_000_000).select((F.col("id") % (1 << 18)).cast("int").alias("t"))
    probes20 = spark.range(20_000_000).select((F.col("id") % (1 << 18)).cast("int").alias("t"))
    probe.with_bloom_membership(probes, bloom_blob, "t").filter("member").count()

    # (name, action_fn, plan_df_fn or None)
    rows = {
        "q01_pricing_summary": (
            lambda: entrymod.q01_pricing_summary(spark, sf_dir).collect(),
            lambda: entrymod.q01_pricing_summary(spark, sf_dir)),
        "q15_orders_by_segment": (
            lambda: entrymod.q15_orders_by_segment(spark, sf_dir).collect(),
            lambda: entrymod.q15_orders_by_segment(spark, sf_dir)),
        "q_minhash_near_dups": (
            lambda: entrymod.sk_minhash_near_dups(spark, sf_dir).count(),
            lambda: entrymod.sk_minhash_near_dups(spark, sf_dir)),
        "q_ann_cosine_topk": (
            lambda: entrymod.sk_ann_cosine_topk(spark, sf_dir).collect(),
            lambda: entrymod.sk_ann_cosine_topk(spark, sf_dir)),
        "q_sketch_build_all": (
            lambda: agg.collect_blobs(agg.build_sketches_files(spark, corpus_path, specs)),
            lambda: agg.build_sketches_files(spark, corpus_path, specs)),
        "q_sketch_build_df": (
            lambda: agg.collect_blobs(agg.build_sketches(corpus, specs)),
            lambda: agg.build_sketches(corpus, specs)),
        "q_bloom_build": (
            lambda: agg.collect_blobs(agg.build_sketches_files(spark, corpus_path, specs[:1])),
            lambda: agg.build_sketches_files(spark, corpus_path, specs[:1])),
        "q_bloom_probe_5m": (
            lambda: probe.with_bloom_membership(probes, bloom_blob, "t").filter("member").count(),
            lambda: probe.with_bloom_membership(probes, bloom_blob, "t").filter("member")),
        "q_bloom_probe_20m": (
            lambda: probe.with_bloom_membership(probes20, bloom_blob, "t").filter("member").count(),
            lambda: probe.with_bloom_membership(probes20, bloom_blob, "t").filter("member")),
        "q_bloom_probe_array": (
            lambda: probe.with_bloom_membership(
                corpus.select("tokens"), bloom_blob, "tokens", array_mode="all"
            ).filter("member").count(),
            lambda: probe.with_bloom_membership(
                corpus.select("tokens"), bloom_blob, "tokens", array_mode="all"
            ).filter("member")),
        "q_hll_global": (
            lambda: agg.collect_blobs(agg.build_sketches_files(
                spark, corpus_path, [agg.SketchSpec("hll12", HLLConfig(p=12), "tokens")])),
            lambda: agg.build_sketches_files(
                spark, corpus_path, [agg.SketchSpec("hll12", HLLConfig(p=12), "tokens")])),
        "q_hll_grouped": (
            lambda: agg.build_sketches_files(
                spark, corpus_path,
                [agg.SketchSpec("hll_g", HLLConfig(p=12), "tokens")], group_by="source"
            ).count(),
            lambda: agg.build_sketches_files(
                spark, corpus_path,
                [agg.SketchSpec("hll_g", HLLConfig(p=12), "tokens")], group_by="source")),
    }

    out = {}
    plans_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)
    for name, (action, plan_fn) in rows.items():
        if selected and name not in selected:
            continue
        if plans_suffix and plan_fn is not None:
            try:
                ptxt = plan_fn()._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            except Exception:
                import io
                from contextlib import redirect_stdout
                buf = io.StringIO()
                with redirect_stdout(buf):
                    plan_fn().explain("formatted")
                ptxt = buf.getvalue()
            with open(os.path.join(plans_dir, f"{name}_{plans_suffix}.txt"), "w") as fh:
                fh.write(ptxt)
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        samples = []
        spins = []
        for _ in range(reps):
            spins.append(round(min(noise.spin_ms() for _ in range(2)) / calib_ref, 2))
            t0 = time.perf_counter()
            action()
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples, "spin_ratio": spins}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps({"summary": {k: v["min"] for k, v in out.items()},
                      "calib_spin_ms": round(calib_ref, 2)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

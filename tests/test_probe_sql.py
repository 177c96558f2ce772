"""JVM-native SQL Bloom probe: exact parity with the NumPy kernel across the
geometry grid, null/range contracts, and a plan with zero Python workers."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib import bloom, probe
from sketchlib.config import BloomConfig, SketchConfigError

GRID = [
    BloomConfig(m_bits=1 << 16, k=4),
    BloomConfig(m_bits=1 << 16, k=8, word_bits=64, words_per_block=8, sectors=8),
    BloomConfig(m_bits=1 << 16, k=8, word_bits=64, words_per_block=8, sectors=8, zones=2),
    BloomConfig(m_bits=3 << 14, k=4, word_bits=64, words_per_block=8, addressing="magic"),
    BloomConfig(m_bits=1 << 16, k=6, word_bits=32, words_per_block=2, sectors=2, hash_seed=7),
]


@pytest.mark.parametrize("cfg", GRID, ids=lambda c: f"k{c.k}s{c.sectors}z{c.zones}{c.addressing}")
def test_sql_probe_matches_kernel(spark, cfg):
    rng = np.random.default_rng(42)
    present = rng.integers(0, 1 << 32, 4_000, dtype=np.uint64)
    absent = rng.integers(0, 1 << 32, 4_000, dtype=np.uint64)
    blob = bloom.build(present, cfg)

    keys = np.concatenate([present[:2_000], absent]).astype(np.int64)
    df = spark.createDataFrame([(int(k),) for k in keys], "key long")
    got = (
        probe.with_bloom_membership_sql(df, blob, "key", "m_sql")
        .select("key", "m_sql").toPandas().set_index("key")["m_sql"]
    )
    want = bloom.contains_blob(keys.astype(np.uint64), blob)
    for k, w in zip(keys, want):
        assert got[int(k)] == bool(w), f"key {k}: sql={got[int(k)]} kernel={w}"


def test_sql_probe_null_and_range_contracts(spark):
    cfg = BloomConfig(m_bits=1 << 14, k=4)
    blob = bloom.build(np.arange(100, dtype=np.uint64), cfg)
    df = spark.createDataFrame([(5,), (None,), (99,)], "key long")
    rows = {r["key"]: r["m"] for r in
            probe.with_bloom_membership_sql(df, blob, "key", "m").collect()}
    assert rows[5] is True and rows[99] is True
    assert rows[None] is None
    # out-of-range keys raise (same contract as the kernel's _as_keys)
    bad = spark.createDataFrame([(1 << 33,)], "key long")
    with pytest.raises(Exception, match="uint32 range"):
        probe.with_bloom_membership_sql(bad, blob, "key", "m").collect()
    neg = spark.createDataFrame([(-3,)], "key long")
    with pytest.raises(Exception, match="uint32 range"):
        probe.with_bloom_membership_sql(neg, blob, "key", "m").collect()


def test_sql_probe_rejects_mix_family_and_huge_filters(spark):
    df = spark.range(1).select(F.col("id").alias("key"))
    mix = bloom.build(np.arange(10, dtype=np.uint64),
                      BloomConfig(m_bits=1 << 14, k=4, hash_family="mix"))
    with pytest.raises(SketchConfigError, match="mul"):
        probe.with_bloom_membership_sql(df, mix, "key")
    assert probe._SQL_PROBE_MAX_BITS == 1 << 27
    # exercise the ceiling guard with a REAL over-ceiling blob: pack an
    # m_bits=2**28 config with a zero payload (the guard fires before the
    # payload is touched, so it need not be populated)
    from sketchlib import blob as blobmod

    big_cfg = BloomConfig(m_bits=1 << 28, k=4, addressing="magic")
    big_blob = blobmod.pack("bloom", big_cfg, b"\x00" * 16)
    with pytest.raises(SketchConfigError, match="m_bits"):
        probe.with_bloom_membership_sql(df, big_blob, "key")


def test_sql_probe_rejects_non_integral_key_column(spark):
    """A double key would silently truncate through cast('long') before the
    range guard (5.7 probing as 5) — rejected up front instead."""
    cfg = BloomConfig(m_bits=1 << 14, k=4)
    blob = bloom.build(np.arange(100, dtype=np.uint64), cfg)
    df = spark.range(10).select((F.col("id") + 0.5).alias("key"))
    with pytest.raises(SketchConfigError, match="integral"):
        probe.with_bloom_membership_sql(df, blob, "key")
    ints = spark.range(10).select(F.col("id").cast("int").alias("key"))
    assert probe.with_bloom_membership_sql(ints, blob, "key").count() == 10


def test_sql_probe_plan_has_no_python_worker(spark):
    """The point of the SQL probe: the plan must contain no ArrowEvalPython /
    BatchEvalPython node — everything stays in JVM codegen."""
    cfg = BloomConfig(m_bits=1 << 14, k=4)
    blob = bloom.build(np.arange(1000, dtype=np.uint64), cfg)
    df = spark.range(10_000).select(F.col("id").alias("key"))
    res = probe.with_bloom_membership_sql(df, blob, "key", "m")
    plan = res._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # and it actually computes: inserted keys all true
    assert res.where("key < 1000").where("NOT m").count() == 0

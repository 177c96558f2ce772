"""HLL set-operation estimators and probe array-mode semantics."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from sketchlib import bloom, fpr, hll, probe
from sketchlib.config import HLLConfig

RNG = np.random.default_rng(42)


def test_hll_union_intersection_jaccard():
    cfg = HLLConfig(p=14)
    a = np.arange(0, 200_000, dtype=np.int64)
    b = np.arange(100_000, 300_000, dtype=np.int64)  # 50% overlap of each
    A, B = hll.build_blob(a, cfg), hll.build_blob(b, cfg)
    u = hll.estimate_union(A, B)
    i = hll.estimate_intersection(A, B)
    j = hll.estimate_jaccard(A, B)
    assert abs(u - 300_000) / 300_000 < 0.05
    assert abs(i - 100_000) / 100_000 < 0.15  # looser: inclusion-exclusion variance
    assert abs(j - 1 / 3) < 0.05


def test_hll_intersection_never_negative():
    cfg = HLLConfig(p=10)
    A = hll.build_blob(np.arange(0, 1000, dtype=np.int64), cfg)
    B = hll.build_blob(np.arange(50_000, 51_000, dtype=np.int64), cfg)
    assert hll.estimate_intersection(A, B) >= 0.0
    assert 0.0 <= hll.estimate_jaccard(A, B) <= 1.0


def test_probe_array_any_vs_all(spark):
    keys = np.array([1, 2, 3], dtype=np.int32)
    blob = bloom.build(keys, fpr.suggest_config(100, 1e-4))
    df = spark.createDataFrame(
        [
            Row(doc_id=1, tokens=[1, 2]),       # all members
            Row(doc_id=2, tokens=[1, 900_000]), # one member
            Row(doc_id=3, tokens=[800_000]),    # none
        ],
        "doc_id int, tokens array<int>",
    )
    got_all = {r["doc_id"]: r["member"] for r in
               probe.with_bloom_membership(df, blob, "tokens", array_mode="all").collect()}
    got_any = {r["doc_id"]: r["member"] for r in
               probe.with_bloom_membership(df, blob, "tokens", array_mode="any").collect()}
    assert got_all == {1: True, 2: False, 3: False}
    assert got_any == {1: True, 2: True, 3: False}

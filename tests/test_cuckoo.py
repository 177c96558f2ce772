"""Cuckoo filter (reference A13): insert/contains/delete round-trips, FPR,
blob round-trip, merge semantics."""

from __future__ import annotations

import re

import numpy as np
import pytest

from sketchlib.config import SketchConfigError
from sketchlib.cuckoo import CuckooConfig, CuckooFilter, analytic_fpr

RNG = np.random.default_rng(42)


def test_insert_contains_no_false_negatives():
    cfg = CuckooConfig(n_buckets=1 << 15, bucket_size=4, bits_per_tag=12)
    keys = np.unique(RNG.integers(0, 2**31, 100_000, dtype=np.int64))
    f = CuckooFilter(cfg)
    f.insert(keys)  # ~76% load
    assert f.contains(keys).all()


def test_fpr_matches_analytic():
    cfg = CuckooConfig(n_buckets=1 << 15, bucket_size=4, bits_per_tag=12)
    keys = np.unique(RNG.integers(0, 2**30, 110_000, dtype=np.int64))
    f = CuckooFilter(cfg)
    f.insert(keys)
    probes = RNG.integers(2**30, 2**31, 400_000, dtype=np.int64)
    emp = float(f.contains(probes).mean())
    bound = analytic_fpr(cfg)
    assert emp <= bound * 1.3
    assert emp >= bound * 0.05  # sanity: not trivially zero


def test_delete_roundtrip():
    cfg = CuckooConfig(n_buckets=1 << 12, bucket_size=4, bits_per_tag=16)
    keys = np.arange(5_000, dtype=np.int64)
    f = CuckooFilter(cfg)
    f.insert(keys)
    victims = keys[::10]
    assert f.delete(victims).all()
    # deleted keys (mostly) gone; kept keys all present — the cuckoo contract
    assert f.contains(np.setdiff1d(keys, victims)).all()
    resurrect = f.contains(victims).mean()
    assert resurrect < 0.05  # only tag collisions remain


def test_overfill_raises():
    cfg = CuckooConfig(n_buckets=1 << 6, bucket_size=4, bits_per_tag=12)
    with pytest.raises(SketchConfigError, match="occupied=") as ei:
        CuckooFilter(cfg).insert(np.arange(400, dtype=np.int64))  # >100% load
    # the error must report the table's REAL occupancy at failure (self.n is
    # bumped only after insert returns, so it used to read 0 here)
    occ = int(re.search(r"occupied=(\d+)", str(ei.value)).group(1))
    assert occ > 0.8 * cfg.capacity


def test_blob_roundtrip_and_merge():
    cfg = CuckooConfig(n_buckets=1 << 13, bucket_size=4, bits_per_tag=12)
    a_keys = np.arange(0, 8_000, dtype=np.int64)
    b_keys = np.arange(8_000, 16_000, dtype=np.int64)
    fa, fb = CuckooFilter(cfg), CuckooFilter(cfg)
    fa.insert(a_keys)
    fb.insert(b_keys)
    fa2 = CuckooFilter.from_blob(fa.to_blob())
    assert np.array_equal(fa2.table, fa.table) and fa2.n == fa.n
    merged = fa.merge(fb)
    assert merged.contains(a_keys).all() and merged.contains(b_keys).all()


def test_merge_capacity_exceeded_raises():
    cfg = CuckooConfig(n_buckets=1 << 6, bucket_size=4, bits_per_tag=12)
    fa, fb = CuckooFilter(cfg), CuckooFilter(cfg)
    fa.insert(np.arange(0, 150, dtype=np.int64))
    fb.insert(np.arange(1000, 1150, dtype=np.int64))
    with pytest.raises(SketchConfigError):
        fa.merge(fb)  # 300 tags into capacity 256


def test_merge_is_set_union_not_multiset():
    """Overlapping key sets must not inflate load: the same key inserted on
    both sides contributes ONE tag after the merge — the property that makes
    the distributed build feasible (P partitions seeing the same Zipf head
    would otherwise overflow any fixed capacity)."""
    cfg = CuckooConfig(n_buckets=1 << 12, bucket_size=4, bits_per_tag=12)
    keys = np.arange(10_000, dtype=np.int64)
    fa, fb = CuckooFilter(cfg), CuckooFilter(cfg)
    fa.insert(keys)
    fb.insert(keys)  # identical key set, ~61% load each
    merged = fa.merge(fb)  # multiset semantics would need 122% load -> raise
    assert merged.contains(keys).all()
    occupied = int((merged.table != 0).sum())
    assert occupied <= int((fa.table != 0).sum()) + 50  # only tag-collision slack


def test_distributed_build_zero_fn_and_fpr(spark):
    """Distributed build over duplicated keys spread across partitions:
    zero FN on the key set, FPR within the [FAN14] bound, and final load ~
    distinct keys (set semantics survived partials + merge tree)."""
    from pyspark.sql import functions as F
    from sketchlib import cuckoo

    n_distinct = 50_000
    # id % n guarantees every key is actually present (a hash-mod draw would
    # miss ~n*e^(-rows/n) values by coupon-collector and fake FNs)
    df = (spark.range(400_000)
          .select((F.col("id") % n_distinct).alias("t"))
          .repartition(8))
    blob = cuckoo.build_distributed(df, "t", n_distinct)
    f = CuckooFilter.from_blob(blob)
    keys = np.arange(n_distinct, dtype=np.uint64)
    assert f.contains(keys).all(), "false negatives after distributed build"
    probes = np.arange(10**7, 10**7 + 300_000, dtype=np.uint64)
    emp = float(f.contains(probes).mean())
    assert emp <= analytic_fpr(f.cfg) * 1.3
    # load tracks distinct keys, not the 400k input rows
    assert f.n <= n_distinct * 1.01


def test_distributed_build_retries_on_capacity(spark):
    """Understated n_expected sizes the table too small; the build must fall
    back to a doubled table and succeed (pre-size + rebuild-at-2x path)."""
    from pyspark.sql import functions as F
    from sketchlib import cuckoo

    n_distinct = 10_000
    df = (spark.range(40_000)
          .select((F.col("id") % n_distinct).alias("t"))
          .repartition(4))
    blob = cuckoo.build_distributed(df, "t", 6_000)  # capacity 8192 < 10k distinct
    f = CuckooFilter.from_blob(blob)
    assert f.cfg.capacity >= n_distinct  # doubled at least once
    keys = np.arange(n_distinct, dtype=np.uint64)
    assert f.contains(keys).all()

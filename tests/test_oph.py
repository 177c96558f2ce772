"""One-permutation MinHash (OPH) with densification: estimator quality vs
exact Jaccard, determinism, and speed sanity vs k-perm."""

from __future__ import annotations

import math

import numpy as np
import pytest

from sketchlib import minhash as mh
from sketchlib.config import MinHashConfig

RNG = np.random.default_rng(42)


def _sig_pair(a: np.ndarray, b: np.ndarray, cfg: MinHashConfig):
    flat = np.concatenate([a, b]).astype(np.uint64)
    starts = np.array([0, a.size], dtype=np.int64)
    sigs = mh.signatures_segmented_oph(flat, starts, cfg)
    return sigs[0], sigs[1]


@pytest.mark.parametrize("overlap", [0.1, 0.5, 0.9])
def test_oph_jaccard_estimate(overlap):
    cfg = MinHashConfig(num_perm=256)
    n = 40_000
    cut = int(n * overlap)
    a = np.arange(0, n, dtype=np.int64)
    b = np.concatenate([a[:cut], np.arange(10**7, 10**7 + (n - cut), dtype=np.int64)])
    true_j = cut / (2 * n - cut)
    sa, sb = _sig_pair(a, b, cfg)
    est = float(np.mean(sa == sb))
    assert abs(est - true_j) <= 5 / math.sqrt(cfg.num_perm), (est, true_j)


def test_oph_identical_sets_identical_sigs():
    cfg = MinHashConfig(num_perm=64)
    a = RNG.integers(0, 10**6, 500).astype(np.int64)
    sa, sb = _sig_pair(a, a.copy(), cfg)
    assert np.array_equal(sa, sb)
    assert (sa != np.uint64(0xFFFFFFFFFFFFFFFF)).all()  # densified: no empties


def test_oph_small_and_empty_docs():
    cfg = MinHashConfig(num_perm=64)
    flat = np.array([7, 8], dtype=np.uint64)
    starts = np.array([0, 1, 2], dtype=np.int64)  # docs: [7], [8], []
    sigs = mh.signatures_segmented_oph(flat, starts, cfg)
    assert sigs.shape == (3, 64)
    # single-item docs densify fully to that item's slot value everywhere
    assert len(np.unique(sigs[0])) == 1
    assert (sigs[2] == np.uint64(0xFFFFFFFFFFFFFFFF)).all()  # truly empty doc


def test_oph_densification_full_coverage_every_seed():
    """The densification stride is forced odd (coprime to the power-of-two
    bucket count), so every walk must visit all buckets regardless of seed —
    a single-item doc (P-1 empty buckets) is the worst case. Before the fix
    this guarantee was per-seed luck."""
    for seed in range(64):
        cfg = MinHashConfig(num_perm=64, hash_seed=seed)
        sigs = mh.signatures_segmented_oph(
            np.array([123456789], dtype=np.uint64), np.array([0], dtype=np.int64), cfg
        )
        assert (sigs != np.uint64(0xFFFFFFFFFFFFFFFF)).all(), f"seed {seed} stranded empties"


def test_oph_batch_size_guard():
    cfg = MinHashConfig(num_perm=4096)
    n_docs = (1 << 32) // 4096  # exactly at the limit
    starts = np.zeros(n_docs, dtype=np.int64)  # never reaches the big alloc
    with pytest.raises(ValueError, match="OPH batch too large"):
        mh.signatures_segmented_oph(np.array([1], dtype=np.uint64), starts, cfg)


def test_oph_deterministic():
    cfg = MinHashConfig(num_perm=128)
    a = RNG.integers(0, 10**6, 2_000).astype(np.int64)
    b = RNG.integers(0, 10**6, 2_000).astype(np.int64)
    s1 = _sig_pair(a, b, cfg)
    s2 = _sig_pair(a, b, cfg)
    assert np.array_equal(s1[0], s2[0]) and np.array_equal(s1[1], s2[1])

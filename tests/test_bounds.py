"""T3 — published error bounds per sketch, against exact references, and
T4 — merge-algebra permutation tests (byte-identical for the idempotent/
additive monoids, estimate-identical for the quantile sketches)."""

from __future__ import annotations

import math
from functools import reduce

import numpy as np
import pytest

from sketchlib import bloom, cms, hll, kll, minhash, tdigest
from sketchlib.config import (
    BloomConfig, CMSConfig, HLLConfig, KLLConfig, MinHashConfig, TDigestConfig,
)

RNG = np.random.default_rng(42)
QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


# ---------- T3: error bounds -----------------------------------------------------

@pytest.mark.parametrize("p", [12, 14])
def test_hll_within_4_sigma(p):
    cfg = HLLConfig(p=p)
    vals = RNG.integers(0, 2**40, 1_500_000, dtype=np.int64)
    exact = len(np.unique(vals))
    est = hll.estimate_blob(hll.build_blob(vals, cfg))
    rel = abs(est - exact) / exact
    assert rel <= 4 * 1.04 / math.sqrt(2**p)


def test_hll_linear_counting_small_range():
    cfg = HLLConfig(p=14)
    for n in (10, 500, 5_000):
        est = hll.estimate_blob(hll.build_blob(np.arange(n, dtype=np.int64), cfg))
        assert abs(est - n) / n < 0.05 or abs(est - n) <= 3


def test_cms_guarantees():
    cfg = CMSConfig(eps=0.0005, delta=0.01)
    vals = RNG.zipf(1.3, 800_000)
    vals = vals[vals < 10**6].astype(np.int64)
    blob = cms.build_blob(vals, cfg)
    uniq, counts = np.unique(vals, return_counts=True)
    # heavy + random rare tokens (FIXTURES.md F3)
    order = np.argsort(-counts)
    q_idx = np.r_[order[:1000], RNG.choice(len(uniq), 1000)]
    est = cms.query_blob(uniq[q_idx], blob)
    true = counts[q_idx]
    assert (est >= true).all(), "CMS must never underestimate"
    n = vals.size
    assert cms.total_blob(blob) == n
    viol = float((est > true + cfg.eps * n).mean())
    assert viol <= cfg.delta


def test_cms_conservative_update():
    """CU-CMS (Estan & Varghese 2002; PAPERS.md): still overcount-only,
    never looser than the plain-update sketch at the same config, and
    strictly tighter in aggregate on a Zipf stream. Merge and distributed
    build must refuse CU configs (CU is single-pass/query-path only)."""
    cfg = CMSConfig(eps=0.005, delta=0.01, conservative=True)
    plain_cfg = CMSConfig(eps=0.005, delta=0.01)
    vals = RNG.zipf(1.3, 400_000)
    vals = vals[vals < 10**6].astype(np.int64)
    uniq, counts = np.unique(vals, return_counts=True)
    blob_cu = cms.build_blob(vals, cfg)
    blob_pl = cms.build_blob(vals, plain_cfg)
    est_cu = cms.query_blob(uniq, blob_cu)
    est_pl = cms.query_blob(uniq, blob_pl)
    assert (est_cu >= counts).all(), "CU-CMS must never underestimate"
    assert (est_cu <= est_pl).all(), "CU must never be looser than plain CMS"
    err_cu = float((est_cu - counts).sum())
    err_pl = float((est_pl - counts).sum())
    assert err_cu < err_pl, (err_cu, err_pl)
    # batched CU stays overcount-only across incremental updates too
    b = cms.new_builder(cfg)
    for part in np.array_split(vals, 7):
        b.update(part)
    from sketchlib import blob as blobmod
    est_inc = cms.query_blob(
        uniq, blobmod.pack("cms", cfg, b.to_payload()))
    assert (est_inc >= counts).all()
    # not mergeable: blob-level and distributed-build-level rejection
    from sketchlib.config import SketchConfigError
    with pytest.raises(SketchConfigError, match="not mergeable"):
        cms.merge_blobs(blob_cu, blob_cu)
    from sketchlib import agg
    with pytest.raises(SketchConfigError, match="not mergeable"):
        agg._build_partials_fn(
            [agg.SketchSpec("cms_cu", cfg, "l_partkey")], None, None)


@pytest.mark.parametrize("dist", ["normal", "lognormal", "uniform_int"])
def test_kll_rank_error(dist):
    cfg = KLLConfig(k=200)
    n = 400_000
    if dist == "normal":
        data = RNG.normal(0, 1, n)
    elif dist == "lognormal":
        data = RNG.lognormal(0, 2, n)
    else:
        data = RNG.integers(0, 1000, n).astype(np.float64)
    blob = reduce(kll.merge_blobs, [kll.build_blob(p, cfg) for p in np.array_split(data, 16)])
    est = kll.quantiles_blob(blob, QS)
    sorted_d = np.sort(data)
    for e, q in zip(est, QS):
        r_lo = np.searchsorted(sorted_d, e, "left") / n
        r_hi = np.searchsorted(sorted_d, e, "right") / n
        err = 0.0 if r_lo <= q <= r_hi else min(abs(r_lo - q), abs(r_hi - q))
        assert err <= 0.02, f"q={q}: rank err {err}"


def test_tdigest_quantile_error():
    cfg = TDigestConfig(compression=100)
    n = 400_000
    data = RNG.normal(0, 1, n)
    blob = reduce(
        tdigest.merge_blobs, [tdigest.build_blob(p, cfg) for p in np.array_split(data, 16)]
    )
    est = tdigest.quantiles_blob(blob, QS)
    sorted_d = np.sort(data)
    for e, q in zip(est, QS):
        r = np.searchsorted(sorted_d, e) / n
        tol = max(0.005, 4 * q * (1 - q) / cfg.compression * 4)
        assert abs(r - q) <= tol, f"q={q}: rank {r}"


def test_minhash_jaccard_error():
    cfg = MinHashConfig(num_perm=256)
    a = np.arange(0, 60_000, dtype=np.int64)
    for overlap in (0.1, 0.5, 0.9):
        cut = int(60_000 * overlap)
        b = np.r_[a[:cut], np.arange(10**6, 10**6 + (60_000 - cut), dtype=np.int64)]
        true_j = cut / (2 * 60_000 - cut)
        est = minhash.jaccard_blobs(minhash.build_blob(a, cfg), minhash.build_blob(b, cfg))
        assert abs(est - true_j) <= 4 / math.sqrt(cfg.num_perm)


# ---------- T4: merge algebra under permutation -----------------------------------

def _parts(n_parts=16, n=200_000):
    vals = RNG.integers(0, 2**24, n, dtype=np.int64)
    return np.array_split(vals, n_parts)


def _tree_merge(blobs, merge, shape_seed):
    """Merge in a random tree shape (not just left fold)."""
    rng = np.random.default_rng(shape_seed)
    work = list(blobs)
    while len(work) > 1:
        i = int(rng.integers(0, len(work) - 1))
        a = work.pop(i)
        b = work.pop(int(rng.integers(0, len(work))))
        work.append(merge(a, b))
    return work[0]


@pytest.mark.parametrize(
    "module,cfg",
    [
        (bloom, BloomConfig(m_bits=1 << 20, k=8, word_bits=64, words_per_block=8, sectors=8)),
        (hll, HLLConfig(p=12)),
        (cms, CMSConfig(eps=0.01, delta=0.05)),
        (minhash, MinHashConfig(num_perm=64)),
    ],
    ids=["bloom", "hll", "cms", "minhash"],
)
def test_byte_identical_merge_permutation(module, cfg):
    parts = _parts()
    if module is bloom:
        parts = [p.astype(np.int32) for p in parts]
    blobs = [module.build_blob(p, cfg) for p in parts]
    ref = reduce(module.merge_blobs, blobs)
    for seed in range(5):
        perm = np.random.default_rng(seed).permutation(len(blobs))
        assert reduce(module.merge_blobs, [blobs[i] for i in perm]) == ref
        assert _tree_merge(blobs, module.merge_blobs, seed) == ref


@pytest.mark.parametrize("module,cfg", [(kll, KLLConfig(k=200)), (tdigest, TDigestConfig())],
                         ids=["kll", "tdigest"])
def test_estimate_identical_merge_permutation(module, cfg):
    parts = [p.astype(np.float64) for p in _parts()]
    blobs = [module.build_blob(p, cfg) for p in parts]
    ref = module.quantiles_blob(reduce(module.merge_blobs, blobs), QS)
    for seed in range(5):
        perm = np.random.default_rng(seed).permutation(len(blobs))
        got = module.quantiles_blob(reduce(module.merge_blobs, [blobs[i] for i in perm]), QS)
        assert np.array_equal(got, ref)
        got_tree = module.quantiles_blob(_tree_merge(blobs, module.merge_blobs, seed), QS)
        assert np.array_equal(got_tree, ref)


def test_partition_count_independence():
    """Same data split 1/2/7/16/64 ways -> byte-identical merged blobs for the
    idempotent monoids (FIXTURES.md F5)."""
    vals = RNG.integers(0, 2**24, 100_000, dtype=np.int64)
    for module, cfg in [
        (bloom, BloomConfig(m_bits=1 << 18, k=4)),
        (hll, HLLConfig(p=10)),
        (cms, CMSConfig(eps=0.01, delta=0.1)),
        (minhash, MinHashConfig(num_perm=32)),
    ]:
        v = vals.astype(np.int32) if module is bloom else vals
        ref = module.build_blob(v, cfg)
        for n_parts in (2, 7, 16, 64):
            blobs = [module.build_blob(p, cfg) for p in np.array_split(v, n_parts)]
            assert reduce(module.merge_blobs, blobs) == ref, (module.__name__, n_parts)

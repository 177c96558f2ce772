"""Property-based tests (hypothesis): the algebraic laws every sketch must
satisfy for Spark partial/final aggregation to be exact — identity,
commutativity, associativity, idempotence (where applicable) — on arbitrary
inputs, not just fixture data."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from sketchlib import bloom, cms, hll, kll, minhash, tdigest
from sketchlib.config import (
    BloomConfig, CMSConfig, HLLConfig, KLLConfig, MinHashConfig, TDigestConfig,
)

BLOOM_CFG = BloomConfig(m_bits=1 << 14, k=4, word_bits=64, words_per_block=8, sectors=4)
HLL_CFG = HLLConfig(p=8)
CMS_CFG = CMSConfig(eps=0.01, delta=0.1)
MH_CFG = MinHashConfig(num_perm=16)
KLL_CFG = KLLConfig(k=32)
TD_CFG = TDigestConfig(compression=20)

tokens = st.lists(st.integers(min_value=0, max_value=2**31 - 1), max_size=300)


def _arr(xs, dtype=np.int64):
    return np.asarray(xs, dtype=dtype)


@settings(max_examples=50, deadline=None)
@given(a=tokens, b=tokens, c=tokens)
def test_bloom_monoid_laws(a, b, c):
    A = bloom.build_blob(_arr(a, np.int32), BLOOM_CFG)
    B = bloom.build_blob(_arr(b, np.int32), BLOOM_CFG)
    C = bloom.build_blob(_arr(c, np.int32), BLOOM_CFG)
    E = bloom.build_blob(_arr([], np.int32), BLOOM_CFG)
    assert bloom.merge_blobs(A, E) == A                     # identity
    assert bloom.merge_blobs(A, B) == bloom.merge_blobs(B, A)  # commutative
    assert bloom.merge_blobs(bloom.merge_blobs(A, B), C) == bloom.merge_blobs(
        A, bloom.merge_blobs(B, C))                          # associative
    assert bloom.merge_blobs(A, A) == A                      # idempotent
    # merge == union build
    assert bloom.merge_blobs(A, B) == bloom.build_blob(_arr(a + b, np.int32), BLOOM_CFG)


@settings(max_examples=50, deadline=None)
@given(a=tokens, b=tokens, c=tokens)
def test_hll_minhash_monoid_laws(a, b, c):
    for mod, cfg in ((hll, HLL_CFG), (minhash, MH_CFG)):
        A = mod.build_blob(_arr(a), cfg)
        B = mod.build_blob(_arr(b), cfg)
        C = mod.build_blob(_arr(c), cfg)
        E = mod.build_blob(_arr([]), cfg)
        assert mod.merge_blobs(A, E) == A
        assert mod.merge_blobs(A, B) == mod.merge_blobs(B, A)
        assert mod.merge_blobs(mod.merge_blobs(A, B), C) == mod.merge_blobs(
            A, mod.merge_blobs(B, C))
        assert mod.merge_blobs(A, A) == A
        assert mod.merge_blobs(A, B) == mod.build_blob(_arr(a + b), cfg)


@settings(max_examples=50, deadline=None)
@given(a=tokens, b=tokens, c=tokens)
def test_cms_monoid_laws(a, b, c):
    A = cms.build_blob(_arr(a), CMS_CFG)
    B = cms.build_blob(_arr(b), CMS_CFG)
    C = cms.build_blob(_arr(c), CMS_CFG)
    E = cms.build_blob(_arr([]), CMS_CFG)
    assert cms.merge_blobs(A, E) == A
    assert cms.merge_blobs(A, B) == cms.merge_blobs(B, A)
    assert cms.merge_blobs(cms.merge_blobs(A, B), C) == cms.merge_blobs(
        A, cms.merge_blobs(B, C))
    # counting monoid (NOT idempotent): merge == concat build
    assert cms.merge_blobs(A, B) == cms.build_blob(_arr(a + b), CMS_CFG)


values = st.lists(st.floats(min_value=-1e9, max_value=1e9,
                            allow_nan=False, allow_infinity=False), max_size=300)


@settings(max_examples=30, deadline=None)
@given(a=values, b=values, c=values)
def test_quantile_sketch_estimate_laws(a, b, c):
    qs = [0.1, 0.5, 0.9]
    for mod, cfg in ((kll, KLL_CFG), (tdigest, TD_CFG)):
        A = mod.build_blob(_arr(a, np.float64), cfg)
        B = mod.build_blob(_arr(b, np.float64), cfg)
        C = mod.build_blob(_arr(c, np.float64), cfg)
        ab_c = mod.merge_blobs(mod.merge_blobs(A, B), C)
        a_bc = mod.merge_blobs(A, mod.merge_blobs(B, C))
        ba_c = mod.merge_blobs(mod.merge_blobs(B, A), C)
        est = [mod.quantiles_blob(x, qs) for x in (ab_c, a_bc, ba_c)]
        assert np.array_equal(est[0], est[1], equal_nan=True)
        assert np.array_equal(est[0], est[2], equal_nan=True)
        # estimates within data range
        data = a + b + c
        if data:
            e = est[0]
            assert (e >= min(data)).all() and (e <= max(data)).all()


@settings(max_examples=50, deadline=None)
@given(a=tokens)
def test_bloom_never_false_negative_property(a):
    arr = _arr(a, np.int32)
    blob = bloom.build_blob(arr, BLOOM_CFG)
    if arr.size:
        assert bloom.contains_blob(arr, blob).all()


@settings(max_examples=50, deadline=None)
@given(a=tokens)
def test_cms_never_underestimates_property(a):
    arr = _arr(a)
    blob = cms.build_blob(arr, CMS_CFG)
    if arr.size:
        uniq, counts = np.unique(arr, return_counts=True)
        assert (cms.query_blob(uniq, blob) >= counts).all()


# ---------- parser fuzz: corrupt bytes never leak raw exceptions ------------

@given(st.binary(max_size=256))
@settings(max_examples=300, deadline=None)
def test_blob_unpack_total_on_arbitrary_bytes(data):
    """blob.unpack over ANY byte string either succeeds or raises
    SketchConfigError — never struct.error / UnicodeDecodeError /
    json.JSONDecodeError (blobs cross executor/driver and checkpoint
    boundaries, so the error contract must be total)."""
    from sketchlib import blob as blobmod
    from sketchlib.config import SketchConfigError
    try:
        blobmod.unpack(data)
    except SketchConfigError:
        pass


@given(st.binary(max_size=128))
@settings(max_examples=300, deadline=None)
def test_quantile_from_payload_total_on_arbitrary_bytes(data):
    """KLL/TDigest.from_payload on arbitrary payload bytes: parse or
    SketchConfigError, nothing else."""
    from sketchlib import kll as kllmod, tdigest as tdmod
    from sketchlib.config import KLLConfig, SketchConfigError, TDigestConfig
    for cls, cfg in ((kllmod.KLL, KLLConfig()), (tdmod.TDigest, TDigestConfig())):
        try:
            cls.from_payload(cfg, data)
        except SketchConfigError:
            pass

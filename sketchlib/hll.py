"""HyperLogLog — dense, bias-corrected — NumPy kernels.

Not present in the reference (bloomfilter-bsd is a membership-filter library);
mandated by the north rule (BASELINE.json:14) as part of the mergeable-sketch
family. Algorithm: Flajolet, Fuchs, Gandouet, Meunier 2007, with the classic
linear-counting small-range correction (the recipe Spark's own HLL++ refines).

Payload: ``2**p`` uint8 registers. Merge = elementwise max (commutative
monoid → byte-identical blobs under any merge order/shape, tested in T4).
Standard error = 1.04 / sqrt(2**p).

Hashing: splitmix64 finalizer (NOT multiplicative — token ids are dense
integers, the adversarial case for mul-hash; SURVEY.md §2.A A9).
"""

from __future__ import annotations

import math

import numpy as np

from sketchlib import blob as blobmod
from sketchlib.config import HLLConfig, SketchConfigError
from sketchlib.hashing import bit_length64, splitmix64

_CHUNK = 1 << 22


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def empty(cfg: HLLConfig) -> np.ndarray:
    return np.zeros(cfg.m, dtype=np.uint8)


def insert(regs: np.ndarray, values: np.ndarray, cfg: HLLConfig) -> None:
    """Update registers in place with a batch of int-like values."""
    p = cfg.p
    low_bits = 64 - p
    low_mask = np.uint64((1 << low_bits) - 1)
    for lo in range(0, values.shape[0], _CHUNK):
        h = splitmix64(values[lo : lo + _CHUNK], seed=cfg.hash_seed)
        idx = (h >> np.uint64(low_bits)).astype(np.int64)
        w = h & low_mask
        # rank = leading zeros of w within low_bits, + 1 = low_bits - bit_length(w) + 1
        rank = (low_bits + 1 - bit_length64(w)).astype(np.uint8)
        # per-register max via sort trick: maximum.at is slow; sort the
        # combined (idx << 6 | rank) key and take the last entry per idx.
        combined = np.sort((idx.astype(np.uint64) << np.uint64(6)) | rank.astype(np.uint64))
        si = (combined >> np.uint64(6)).astype(np.int64)
        last = np.flatnonzero(np.r_[si[1:] != si[:-1], True])
        ui = si[last]
        ur = (combined[last] & np.uint64(63)).astype(np.uint8)
        regs[ui] = np.maximum(regs[ui], ur)


class HLLBuilder:
    __slots__ = ("cfg", "regs")
    supports_unique = True  # idempotent in the value

    def __init__(self, cfg: HLLConfig):
        self.cfg = cfg
        self.regs = empty(cfg)

    def update(self, values: np.ndarray) -> None:
        insert(self.regs, values, self.cfg)

    def update_unique(self, uniq: np.ndarray, counts: np.ndarray) -> None:
        insert(self.regs, uniq, self.cfg)

    def to_payload(self) -> bytes:
        return self.regs.tobytes()


def new_builder(cfg: HLLConfig) -> HLLBuilder:
    return HLLBuilder(cfg)


def merge_payloads(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def estimate_registers(regs: np.ndarray, p: int) -> float:
    m = 1 << p
    inv = np.ldexp(1.0, -regs.astype(np.int64))
    raw = _alpha(m) * m * m / float(inv.sum())
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)  # linear counting
    return raw


def build_blob(values: np.ndarray, cfg: HLLConfig) -> bytes:
    regs = empty(cfg)
    insert(regs, values, cfg)
    return blobmod.pack("hll", cfg, regs.tobytes())


def merge_blobs(a: bytes, b: bytes) -> bytes:
    na, ca, pa = blobmod.unpack(a)
    nb, cb, pb = blobmod.unpack(b)
    if na != "hll" or nb != "hll":
        raise SketchConfigError("merge_blobs: not hll blobs")
    ca.require_same(cb)
    merged = merge_payloads(
        np.frombuffer(pa, dtype=np.uint8), np.frombuffer(pb, dtype=np.uint8)
    )
    return blobmod.pack("hll", ca, merged.tobytes())


def estimate_blob(blob: bytes) -> float:
    name, cfg, payload = blobmod.unpack(blob)
    if name != "hll":
        raise SketchConfigError("estimate_blob: not an hll blob")
    return estimate_registers(np.frombuffer(payload, dtype=np.uint8), cfg.p)


def standard_error(cfg: HLLConfig) -> float:
    return 1.04 / math.sqrt(cfg.m)


def estimate_union(a: bytes, b: bytes) -> float:
    """|A ∪ B| — exact HLL semantics (register max), same error as a single
    sketch of the union."""
    return estimate_blob(merge_blobs(a, b))


def estimate_intersection(a: bytes, b: bytes) -> float:
    """|A ∩ B| via inclusion-exclusion. Published caveat (SURVEY.md §2.B):
    the variance scales with |A ∪ B|, not the intersection — relative error
    explodes for small overlaps. Flagged, not bounded; use MinHash Jaccard
    when a bounded estimate is needed."""
    return max(0.0, estimate_blob(a) + estimate_blob(b) - estimate_union(a, b))


def estimate_jaccard(a: bytes, b: bytes) -> float:
    """Jaccard via inclusion-exclusion — same unbounded-variance caveat."""
    u = estimate_union(a, b)
    if u <= 0:
        return 0.0
    return max(0.0, min(1.0, estimate_intersection(a, b) / u))

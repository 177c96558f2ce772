"""MinHash signatures — NumPy kernels.

Broder 1997. Not in the reference; included because a slot-wise-min signature
is a mergeable sketch in exactly the same monoid family as Bloom/HLL/CMS
(merge = elementwise min → byte-identical under merge permutation), and it is
the primitive behind MinHash-LSH near-duplicate detection (sketchlib.textops).

Permutation j of value x: ``splitmix64(x) * C_j`` with fixed odd 64-bit
constants — one multiply per element per permutation after a single
finalizer pass, so a 128-perm signature over an Arrow batch stays vectorized.

Estimate: Jaccard(A, B) ~= mean(sig_A == sig_B), SE = 1/sqrt(num_perm).

Payload: ``num_perm`` uint64 slot minima.
"""

from __future__ import annotations

import numpy as np

from sketchlib import blob as blobmod
from sketchlib.config import MinHashConfig, SketchConfigError
from sketchlib.hashing import splitmix64

_U64MAX = np.uint64(0xFFFFFFFFFFFFFFFF)


def _perm_constants(num_perm: int, seed: int) -> np.ndarray:
    base = splitmix64(np.arange(num_perm, dtype=np.uint64), seed=seed ^ 0x5EED)
    return base | np.uint64(1)  # odd multipliers


def empty(cfg: MinHashConfig) -> np.ndarray:
    return np.full(cfg.num_perm, _U64MAX, dtype=np.uint64)


def insert(sig: np.ndarray, values: np.ndarray, cfg: MinHashConfig) -> None:
    if values.size == 0:
        return
    h = splitmix64(values, seed=cfg.hash_seed)
    consts = _perm_constants(cfg.num_perm, cfg.hash_seed)
    with np.errstate(over="ignore"):
        for j in range(cfg.num_perm):
            sig[j] = min(sig[j], (h * consts[j]).min())


def signatures_segmented(
    flat_values: np.ndarray, starts: np.ndarray, cfg: MinHashConfig
) -> np.ndarray:
    """Per-document signatures: (n_docs, num_perm) uint64 from a flat value
    array segmented at ``starts`` (np.minimum.reduceat per permutation).
    Empty segments get U64MAX slots."""
    n_docs = starts.size
    out = np.full((n_docs, cfg.num_perm), _U64MAX, dtype=np.uint64)
    if flat_values.size == 0 or n_docs == 0:
        return out
    h = splitmix64(flat_values, seed=cfg.hash_seed)
    consts = _perm_constants(cfg.num_perm, cfg.hash_seed)
    # reduceat quirk: empty segments (starts[i] == starts[i+1]) return the
    # element at starts[i]; mask them back to U64MAX afterwards.
    seg_len = np.diff(np.r_[starts, flat_values.size])
    empty_seg = seg_len == 0
    safe_starts = np.minimum(starts, flat_values.size - 1)
    with np.errstate(over="ignore"):
        for j in range(cfg.num_perm):
            mins = np.minimum.reduceat(h * consts[j], safe_starts)
            mins[empty_seg] = _U64MAX
            out[:, j] = mins
    return out


class MinHashBuilder:
    __slots__ = ("cfg", "sig")
    supports_unique = True  # set semantics

    def __init__(self, cfg: MinHashConfig):
        self.cfg = cfg
        self.sig = empty(cfg)

    def update(self, values: np.ndarray) -> None:
        insert(self.sig, values, self.cfg)

    def update_unique(self, uniq: np.ndarray, counts: np.ndarray) -> None:
        insert(self.sig, uniq, self.cfg)

    def to_payload(self) -> bytes:
        return self.sig.tobytes()


def new_builder(cfg: MinHashConfig) -> MinHashBuilder:
    return MinHashBuilder(cfg)


def merge_payloads(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.minimum(a, b)


def jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


def build_blob(values: np.ndarray, cfg: MinHashConfig) -> bytes:
    sig = empty(cfg)
    insert(sig, values, cfg)
    return blobmod.pack("minhash", cfg, sig.tobytes())


def merge_blobs(a: bytes, b: bytes) -> bytes:
    na, ca, pa = blobmod.unpack(a)
    nb, cb, pb = blobmod.unpack(b)
    if na != "minhash" or nb != "minhash":
        raise SketchConfigError("merge_blobs: not minhash blobs")
    ca.require_same(cb)
    merged = np.minimum(
        np.frombuffer(pa, dtype=np.uint64), np.frombuffer(pb, dtype=np.uint64)
    )
    return blobmod.pack("minhash", ca, merged.tobytes())


def jaccard_blobs(a: bytes, b: bytes) -> float:
    na, ca, pa = blobmod.unpack(a)
    nb, cb, pb = blobmod.unpack(b)
    ca.require_same(cb)
    return jaccard(np.frombuffer(pa, dtype=np.uint64), np.frombuffer(pb, dtype=np.uint64))

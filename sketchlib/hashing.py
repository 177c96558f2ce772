"""Vectorized hash families.

Two families, mirroring the reference's choices (bloomfilter-bsd
``src/dtl/hash.hpp`` [path-level, unverified — SURVEY.md §0]):

- **Multiplicative (Knuth) hashing** — ``h_i(x) = (x * C_i) mod 2**32`` with
  fixed distinct odd 32-bit constants; the *top* bits are the well-mixed ones.
  This is the Bloom-filter default, matching the reference design so FPR math
  lines up.
- **Finalizer hashing** (splitmix64 mix) — a full-avalanche 64-bit hash used
  for HLL / CMS / KLL-value hashing / MinHash, where adversarially dense
  integer token ids would break plain multiplicative hashing.

All functions are NumPy-vectorized over whole arrays; everything is
deterministic given the seed (permutation/byte-equality tests rely on this).
"""

from __future__ import annotations

import numpy as np

# Fixed odd 32-bit multiplicative constants. C[0] is Knuth's golden-ratio
# constant (floor(2^32 / phi) | 1); the rest are derived deterministically via
# splitmix and forced odd. Existing constants never change — blobs depend on
# them (the generator is a running stream, so extending the table appends new
# entries without touching old indices). The Bloom kernel's highest index is
# 1 + k + (zones - 1) <= 33 at the config caps (k <= 16, zones <= 16): the
# table must be at least that long, or the zone-choice hash silently aliases
# a bit hash via the modulo in mul_hash32 and the zoned FPR model breaks.
_N_CONST = 40


def _gen_constants() -> np.ndarray:
    out = np.empty(_N_CONST, dtype=np.uint64)
    mask = (1 << 64) - 1
    x = 0x9E3779B97F4A7C15
    state = 0x243F6A8885A308D3  # pi digits
    for i in range(_N_CONST):
        state = (state + x) & mask
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        z = z ^ (z >> 31)
        out[i] = np.uint64(z)
    out[0] = np.uint64(0x9E3779B97F4A7C15)
    return out


_CONST64 = _gen_constants()
MUL_CONSTANTS_32 = (_CONST64 & np.uint64(0xFFFFFFFF)).astype(np.uint32) | np.uint32(1)
MUL_CONSTANTS_32[0] = np.uint32(0x9E3779B9) | np.uint32(1)


def mul_hash32(keys: np.ndarray, idx: int, seed: int = 0) -> np.ndarray:
    """Multiplicative hash: ``(key * C[idx]) mod 2**32`` (uint32, top bits mixed).

    ``seed`` rotates the constant table so independent filters can use
    independent hash families.
    """
    c = MUL_CONSTANTS_32[(idx + seed) % len(MUL_CONSTANTS_32)]
    with np.errstate(over="ignore"):
        return keys.astype(np.uint32, copy=False) * c


def splitmix64(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Full-avalanche 64-bit finalizer hash (splitmix64 mix function)."""
    z = keys.astype(np.uint64, copy=False) + np.uint64((seed * 0x9E3779B97F4A7C15 + 0x243F6A8885A308D3) & (2**64 - 1))
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def popcount64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized popcount for uint64 arrays (SWAR)."""
    x = x.astype(np.uint64, copy=True)
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    h01 = np.uint64(0x0101010101010101)
    x -= (x >> np.uint64(1)) & m1
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    with np.errstate(over="ignore"):
        x *= h01
    return (x >> np.uint64(56)).astype(np.int64)


def bit_length64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length (position of highest set bit; 0 for 0)."""
    x = x.astype(np.uint64, copy=True)
    for s in (1, 2, 4, 8, 16, 32):
        x |= x >> np.uint64(s)
    return popcount64(x)

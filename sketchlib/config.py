"""Sketch configuration dataclasses.

Each config is plain data (JSON-serializable) — it replaces the reference's
compile-time template parameters ``(word type, words/block, sectors, zones, k)``
(bloomfilter-bsd ``blocked_bloomfilter_logic.hpp`` [path-level, unverified —
SURVEY.md §0]) with runtime data driving one generic NumPy kernel.

Merging two sketches with different configs is an error
(:class:`SketchConfigError`), mirroring the reference's same-config-only
OR-merge contract.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass


class SketchConfigError(ValueError):
    """Raised when sketch configs are invalid or mismatched at merge time."""


def _is_pow2(x: int) -> bool:
    return x > 0 and (x & (x - 1)) == 0


@dataclass(frozen=True)
class _Cfg:
    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["_cls"] = type(self).__name__
        return json.dumps(d, sort_keys=True, separators=(",", ":"))

    @staticmethod
    def from_json(s: str) -> "_Cfg":
        d = json.loads(s)
        cls_name = d.pop("_cls")
        cls = _CFG_CLASSES.get(cls_name)
        if cls is None and cls_name == "CuckooConfig":
            # CuckooConfig lives in (and self-registers from) sketchlib.cuckoo;
            # unpacking a cuckoo blob must not depend on who imported it first
            import sketchlib.cuckoo  # noqa: F401
            cls = _CFG_CLASSES.get(cls_name)
        if cls is None:
            raise SketchConfigError(f"unknown config class {cls_name!r}")
        return cls(**d)

    def require_same(self, other: "_Cfg") -> None:
        if self != other:
            raise SketchConfigError(
                f"cannot merge sketches with mismatched configs: {self} != {other}"
            )


@dataclass(frozen=True)
class BloomConfig(_Cfg):
    """Blocked/sectorized Bloom filter configuration.

    Layout follows bloomfilter-bsd / [SIGMOD19] §3:

    - the filter is ``m_bits`` total, divided into blocks of
      ``B = word_bits * words_per_block`` bits;
    - a key selects one block. ``addressing="pow2"`` (default, reference
      ``block_addressing::POWER_OF_TWO``): m_bits must be a power of two and
      the block index is the top hash bits. ``addressing="magic"`` (reference
      ``block_addressing::MAGIC``): any m_bits that is a whole number of
      blocks, block index via Lemire fastrange ``(h * n_blocks) >> 32`` — no
      division, arbitrary memory budgets;
    - the block is split into ``sectors`` equal sectors; hash function i sets
      one bit in sector ``i % sectors`` (sectorization);
    - ``zones`` > 1 picks, per key, ``zones`` word-groups inside the block and
      distributes k over them (cache-sectorization / zoned blocks).

    ``word_bits``/``words_per_block`` define the *logical* block geometry used
    by the FPR math; the payload is stored as little-endian bytes (bit i of
    the filter = byte ``i>>3``, bit ``i&7``) so storage is endian-free.

    ``hash_family`` picks the per-probe hash: ``"mul"`` (default) is the
    reference's multiplicative (Knuth) family (A8) — one 32-bit multiply per
    probe, FPR-parity with the published formulas on well-distributed keys.
    ``"mix"`` is the splitmix64 finalizer family (A9-class): full avalanche,
    robust when key sets carry structure the linear multiply preserves
    (arithmetic progressions, low-entropy low bits) at ~3x the hash ALU cost.
    Same analytic FPR model (both are treated as uniform); blobs from
    different families never merge (config identity differs).
    """

    m_bits: int = 1 << 20
    k: int = 4
    word_bits: int = 32
    words_per_block: int = 1
    sectors: int = 1
    zones: int = 1
    hash_seed: int = 0
    addressing: str = "pow2"
    hash_family: str = "mul"

    def __post_init__(self) -> None:
        B = self.block_bits
        if self.addressing not in ("pow2", "magic"):
            raise SketchConfigError(
                f"addressing must be 'pow2' or 'magic', got {self.addressing!r}"
            )
        if self.hash_family not in ("mul", "mix"):
            raise SketchConfigError(
                f"hash_family must be 'mul' or 'mix', got {self.hash_family!r}"
            )
        if self.addressing == "pow2" and not _is_pow2(self.m_bits):
            raise SketchConfigError(
                f"m_bits must be a power of two under pow2 addressing, got {self.m_bits} "
                "(use addressing='magic' for arbitrary sizes)"
            )
        if self.m_bits % B:
            raise SketchConfigError("m_bits must be a whole number of blocks")
        if self.word_bits not in (32, 64):
            raise SketchConfigError("word_bits must be 32 or 64")
        if not _is_pow2(self.words_per_block):
            raise SketchConfigError("words_per_block must be a power of two")
        if not _is_pow2(self.sectors) or self.sectors > B:
            raise SketchConfigError("sectors must be a power of two <= block bits")
        if B % self.sectors:
            raise SketchConfigError("sectors must divide block bits")
        if not _is_pow2(self.zones) or self.zones > self.sectors:
            raise SketchConfigError("zones must be a power of two <= sectors")
        if self.k < 1 or self.k > 16:
            raise SketchConfigError("k must be in [1, 16]")
        if self.k % self.zones:
            raise SketchConfigError("zones must divide k")
        if self.k % self.sectors:
            # each sector must receive exactly k/s bits, else the sectorized
            # FPR formula ([SIGMOD19] §3.2) does not describe the layout
            raise SketchConfigError("sectors must divide k")
        if self.m_bits < B:
            raise SketchConfigError("m_bits must be >= one block")

    @property
    def block_bits(self) -> int:
        return self.word_bits * self.words_per_block

    @property
    def n_blocks(self) -> int:
        return self.m_bits // self.block_bits

    @property
    def sector_bits(self) -> int:
        return self.block_bits // self.sectors

    @property
    def n_bytes(self) -> int:
        return self.m_bits // 8


@dataclass(frozen=True)
class HLLConfig(_Cfg):
    """HyperLogLog: ``2**p`` uint8 registers, 64-bit hashed input."""

    p: int = 14
    hash_seed: int = 0

    def __post_init__(self) -> None:
        if not (4 <= self.p <= 18):
            raise SketchConfigError(f"p must be in [4, 18], got {self.p}")

    @property
    def m(self) -> int:
        return 1 << self.p


@dataclass(frozen=True)
class CMSConfig(_Cfg):
    """Count-min sketch: ``d x w`` counters; w=ceil(e/eps), d=ceil(ln 1/delta).

    ``counter_bits`` (8/16/32/64, default 64) picks the stored counter width
    — the variable-width-counter memory win (e.g. 16-bit counters = 4x less
    state/shuffle at equal eps when per-cell loads stay below 65,535;
    PAPERS.md, VLDB 2023). Narrow counters SATURATE at their max instead of
    wrapping, so the one-sided guarantee degrades gracefully to
    ``est >= min(true, counter_max)``; merges saturate the same way and stay
    commutative/associative. The default keeps the classic int64 exact
    overcount-only contract."""

    eps: float = 0.0005
    delta: float = 0.01
    hash_seed: int = 0
    counter_bits: int = 64
    # conservative update (Estan & Varghese, SIGCOMM 2002): each update
    # raises only the cells at the current minimum, tightening overestimates
    # on skewed streams while keeping est >= true. NOT mergeable — CU's
    # tightness does not survive partial addition, so the distributed build
    # path rejects it and merge_blobs raises; single-pass/query-path only
    # (cms.build_blob). Off by default: the merged pipeline contract and
    # cross-engine byte parity both require the plain-update sketch.
    conservative: bool = False

    def __post_init__(self) -> None:
        if not (0 < self.eps < 1) or not (0 < self.delta < 1):
            raise SketchConfigError("eps and delta must be in (0, 1)")
        if self.counter_bits not in (8, 16, 32, 64):
            raise SketchConfigError("counter_bits must be one of 8, 16, 32, 64")

    @property
    def counter_max(self) -> int:
        """Saturation cap (int64 counters never saturate in practice)."""
        return (1 << 63) - 1 if self.counter_bits == 64 else (1 << self.counter_bits) - 1

    @property
    def width(self) -> int:
        import math

        return int(math.ceil(math.e / self.eps))

    @property
    def depth(self) -> int:
        import math

        return int(math.ceil(math.log(1.0 / self.delta)))


@dataclass(frozen=True)
class KLLConfig(_Cfg):
    """KLL quantile sketch (Karnin-Lang-Liberty FOCS'16) over float64 values.

    ``lazy_factor``: merge is pure level-wise concatenation (order-insensitive,
    hence estimate-identical under merge permutation) until a level exceeds
    ``lazy_factor * capacity``, at which point a deterministic, content-seeded
    compaction bounds memory for 1000-partition merges.
    """

    k: int = 200
    lazy_factor: int = 32

    def __post_init__(self) -> None:
        if self.k < 8:
            raise SketchConfigError("k must be >= 8")
        if self.lazy_factor < 2:
            raise SketchConfigError("lazy_factor must be >= 2")


@dataclass(frozen=True)
class TDigestConfig(_Cfg):
    """t-digest (Dunning-Ertl) with k1 scale function.

    Merge concatenates centroid lists (order-insensitive); compression happens
    per-partition at build and once, on sorted centroids, at estimate time —
    so estimates are identical under merge-order permutation. ``max_centroids``
    bounds blob growth on very wide merges.
    """

    compression: float = 100.0
    max_centroids: int = 10_000

    def __post_init__(self) -> None:
        if self.compression < 10:
            raise SketchConfigError("compression must be >= 10")


@dataclass(frozen=True)
class MinHashConfig(_Cfg):
    """MinHash signature over a set of int64-hashable items: ``num_perm`` slot-min."""

    num_perm: int = 128
    hash_seed: int = 0

    def __post_init__(self) -> None:
        if not (8 <= self.num_perm <= 4096):
            raise SketchConfigError("num_perm must be in [8, 4096]")


_CFG_CLASSES = {
    c.__name__: c
    for c in (BloomConfig, HLLConfig, CMSConfig, KLLConfig, TDigestConfig, MinHashConfig)
}

"""Analytic false-positive-rate oracle for blocked/sectorized/zoned Bloom
filters — the correctness contract (SURVEY.md Appendix A).

Published sources: [PSS07] Putze, Sanders, Singler, "Cache-, Hash- and
Space-Efficient Bloom Filters" (WEA 2007) §4 — blocked Poisson mixture;
[SIGMOD19] Lang, Neumann, Kemper, Boncz §3 — sectorized / cache-sectorized.
This module replaces the reference's hardware cost model (A14-A16 in
SURVEY.md §2.A) with a pure-analytic config advisor: no hardware timing,
just FPR/size math.
"""

from __future__ import annotations

import math

from sketchlib.config import BloomConfig


def fpr_standard(m: int, n: int, k: int) -> float:
    """Classic Bloom: (1 - (1 - 1/m)^(k n))^k."""
    if n == 0:
        return 0.0
    return (1.0 - (1.0 - 1.0 / m) ** (k * n)) ** k


def _poisson_terms(lam: float, tail_sigmas: float = 10.0):
    """Yield (i, P(Pois(lam) = i)) until the tail is negligible."""
    hi = int(lam + tail_sigmas * math.sqrt(lam) + 25)
    logp = -lam
    for i in range(0, hi + 1):
        yield i, math.exp(logp)
        logp += math.log(lam) - math.log(i + 1)


def _sector_pass(B: int, i: int, k: int, s: int) -> float:
    """P(one probe passes | block holds i keys), sectorized block.

    Each inserted key puts k/s bits per sector (round-robin over s sectors of
    B/s bits). A probed bit in a given sector is missed by one placement with
    prob (1 - s/B); i keys place i*k/s bits in that sector.
    """
    if i == 0:
        return 0.0
    p_set = 1.0 - (1.0 - s / B) ** (i * k / s)
    return p_set**k


def fpr_blocked(cfg: BloomConfig, n: int) -> float:
    """Poisson-mixture FPR for a blocked (optionally sectorized / zoned)
    Bloom filter holding n keys. Register-blocked = B in {32, 64}, s = 1."""
    if n == 0:
        return 0.0
    B = cfg.block_bits
    lam = B * n / cfg.m_bits  # expected keys per block
    s, k, z = cfg.sectors, cfg.k, cfg.zones

    if z == 1:
        return sum(p * _sector_pass(B, i, k, s) for i, p in _poisson_terms(lam))

    # zoned ([SIGMOD19] §3.3): block split into z zones of B/z bits, s/z
    # sectors each; each key sends z hash-chosen groups of k/z bits. Zone
    # group-arrivals given block load i are Bin(z*i, 1/z) ~= Pois(i); a probe
    # passes iff each of its z groups finds its k/z bits set (independence
    # approximation across the probe's zones — validated empirically in T2).
    kpz, spz, Bz = k // z, s // z, B // z

    def zone_pass(i: int) -> float:
        # P(one probe group passes | block load i); group-arrivals a ~ Pois(i)
        if i == 0:
            return 0.0
        tot = 0.0
        for a, p in _poisson_terms(float(i)):
            if a == 0:
                continue
            p_set = 1.0 - (1.0 - spz / Bz) ** (a * kpz / spz)
            tot += p * p_set**kpz
        return tot

    return sum(p * zone_pass(i) ** z for i, p in _poisson_terms(lam))


def fpr(cfg: BloomConfig, n: int) -> float:
    """Analytic FPR for cfg holding n keys (dispatches on geometry)."""
    if cfg.block_bits == cfg.m_bits and cfg.sectors == 1 and cfg.zones == 1:
        return fpr_standard(cfg.m_bits, n, cfg.k)
    return fpr_blocked(cfg, n)


def suggest_config(
    n: int,
    target_fpr: float,
    block_bits: int = 512,
    sectors: int = 8,
    zones: int = 1,
    max_m_bits: int = 1 << 34,
) -> BloomConfig:
    """Pick (m, k) for a target FPR — the analytic reduction of the
    reference's performance-optimal 'skyline' selector (A16): probe cost is
    not modeled (network/shuffle dominates at our tier), only FPR and size.

    Doubles m (power-of-two addressing) and scans k in [1, 16] until the
    analytic blocked FPR meets the target.
    """
    if not (0.0 < target_fpr < 1.0):
        raise ValueError("target_fpr must be in (0,1)")
    word_bits = 64 if block_bits >= 64 else 32
    words_per_block = max(1, block_bits // word_bits)
    m = 1 << max(int(math.ceil(math.log2(max(n, 1) * 2))), int(math.log2(block_bits)))
    while m <= max_m_bits:
        best_k, best_f = None, 1.0
        for k in range(1, 17):
            if k % zones or k % sectors:
                continue
            try:
                cfg = BloomConfig(
                    m_bits=m, k=k, word_bits=word_bits,
                    words_per_block=words_per_block, sectors=sectors, zones=zones,
                )
            except Exception:
                continue
            f = fpr(cfg, n)
            if f < best_f:
                best_f, best_k = f, k
        if best_k is not None and best_f <= target_fpr:
            return BloomConfig(
                m_bits=m, k=best_k, word_bits=word_bits,
                words_per_block=words_per_block, sectors=sectors, zones=zones,
            )
        m <<= 1
    raise ValueError(f"cannot reach FPR {target_fpr} within max_m_bits={max_m_bits}")

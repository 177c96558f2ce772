"""Cuckoo filter — partial-key cuckoo hashing (Fan, Andersen, Kaminsky,
Mitzenmacher, CoNEXT 2014), the reference's FPR-efficient alternative to
blocked Bloom (bloomfilter-bsd ``src/dtl/filter/cuckoofilter/`` [path-level,
unverified — SURVEY.md §0]; [SIGMOD19] §4 benchmarks it as the
low-FPR/low-throughput end of the skyline).

Supports what Bloom cannot: **delete**. The cost: inserts can fail at high
load (capacity is probabilistic), and the structure is not a simple
commutative monoid — ``merge`` re-inserts the other filter's tags and raises
if capacity is exceeded, mirroring the reference's semantics. For the
distributed path this means cuckoo partials must be sized for the *merged*
key count (the library warns via ``SketchConfigError``), which is why the
north rule keys on Bloom for the 10^12-scale build and cuckoo stays a
single-blob/probe-side structure.

Layout: ``n_buckets`` (power of two) buckets x ``bucket_size`` tags of
``bits_per_tag`` bits, stored as a uint16 array (tag 0 = empty; tags are
forced non-zero). Alternate bucket: ``b2 = b1 XOR hash(tag)`` (partial-key
displacement).

Batch insert is wave-vectorized: each wave tries bucket-1 then bucket-2 free
slots for all pending keys at once (NumPy); only keys needing displacement
fall back to the bounded eviction loop.
"""

from __future__ import annotations

import dataclasses
import json

import numpy as np

from sketchlib.config import SketchConfigError, _Cfg
from sketchlib.hashing import splitmix64

_EMPTY = np.uint16(0)


@dataclasses.dataclass(frozen=True)
class CuckooConfig(_Cfg):
    n_buckets: int = 1 << 16   # power of two
    bucket_size: int = 4
    bits_per_tag: int = 12     # <= 16
    hash_seed: int = 0
    max_kicks: int = 500

    def __post_init__(self) -> None:
        if self.n_buckets & (self.n_buckets - 1):
            raise SketchConfigError("n_buckets must be a power of two")
        if not (1 <= self.bucket_size <= 8):
            raise SketchConfigError("bucket_size must be in [1, 8]")
        if not (4 <= self.bits_per_tag <= 16):
            raise SketchConfigError("bits_per_tag must be in [4, 16]")

    @property
    def capacity(self) -> int:
        return self.n_buckets * self.bucket_size


# registered for blob round-trips
from sketchlib import config as _cfgmod  # noqa: E402

_cfgmod._CFG_CLASSES["CuckooConfig"] = CuckooConfig


class CuckooFilter:
    __slots__ = ("cfg", "table", "n")

    def __init__(self, cfg: CuckooConfig):
        self.cfg = cfg
        self.table = np.zeros((cfg.n_buckets, cfg.bucket_size), dtype=np.uint16)
        self.n = 0

    # -- hashing -----------------------------------------------------------------

    def _tag_and_bucket(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        h = splitmix64(keys.astype(np.uint64, copy=False), seed=self.cfg.hash_seed)
        mask = np.uint64(self.cfg.n_buckets - 1)
        b1 = (h & mask).astype(np.int64)
        tag_bits = np.uint64(self.cfg.bits_per_tag)
        tag = ((h >> np.uint64(32)) & ((np.uint64(1) << tag_bits) - np.uint64(1))).astype(np.uint16)
        tag = np.where(tag == 0, np.uint16(1), tag)  # 0 marks empty slots
        return tag, b1

    def _alt_bucket(self, bucket: np.ndarray, tag: np.ndarray) -> np.ndarray:
        th = splitmix64(tag.astype(np.uint64), seed=self.cfg.hash_seed ^ 0xA5A5)
        return (bucket ^ (th & np.uint64(self.cfg.n_buckets - 1)).astype(np.int64)) & (
            self.cfg.n_buckets - 1
        )

    # -- operations ----------------------------------------------------------------

    def _try_place_wave(self, tags: np.ndarray, buckets: np.ndarray) -> np.ndarray:
        """Vectorized: place each (tag, bucket) into a free slot if any;
        returns boolean placed-mask. Duplicate buckets within a wave are
        serialized via first-occurrence masking."""
        placed = np.zeros(tags.shape[0], dtype=bool)
        for _ in range(self.cfg.bucket_size):
            free_slot = (self.table[buckets] == _EMPTY).argmax(axis=1)
            has_free = self.table[buckets, free_slot] == _EMPTY
            cand = np.flatnonzero(~placed & has_free)
            if cand.size == 0:
                break
            # keep only the first claimant of each bucket this round
            _, first_idx = np.unique(buckets[cand], return_index=True)
            winners = cand[first_idx]
            self.table[buckets[winners], free_slot[winners]] = tags[winners]
            placed[winners] = True
        return placed

    def insert(self, keys: np.ndarray) -> None:
        tags, b1 = self._tag_and_bucket(keys)
        self._insert_tags(tags, b1)
        self.n += int(keys.shape[0])

    def _insert_tags(self, tags: np.ndarray, b1: np.ndarray) -> None:
        placed = self._try_place_wave(tags, b1)
        if not placed.all():
            rest = ~placed
            b2 = self._alt_bucket(b1[rest], tags[rest])
            placed2 = self._try_place_wave(tags[rest], b2)
            # bounded scalar eviction loop for the stragglers
            pend_tags = tags[rest][~placed2]
            pend_buckets = b2[~placed2]
            rng = np.random.default_rng(self.cfg.hash_seed + 1)
            for t, b in zip(pend_tags.tolist(), pend_buckets.tolist()):
                cur_tag, cur_b = np.uint16(t), int(b)
                ok = False
                for _ in range(self.cfg.max_kicks):
                    row = self.table[cur_b]
                    free = np.flatnonzero(row == _EMPTY)
                    if free.size:
                        self.table[cur_b, free[0]] = cur_tag
                        ok = True
                        break
                    slot = int(rng.integers(0, self.cfg.bucket_size))
                    cur_tag, self.table[cur_b, slot] = self.table[cur_b, slot], cur_tag
                    cur_b = int(
                        self._alt_bucket(np.array([cur_b]), np.array([cur_tag], np.uint16))[0]
                    )
                if not ok:
                    raise SketchConfigError(
                        f"cuckoo filter full (n={self.n}, capacity={self.cfg.capacity})"
                    )

    def contains(self, keys: np.ndarray) -> np.ndarray:
        tags, b1 = self._tag_and_bucket(keys)
        b2 = self._alt_bucket(b1, tags)
        t = tags[:, None]
        return ((self.table[b1] == t) | (self.table[b2] == t)).any(axis=1)

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one copy of each key's tag; returns per-key success. Scalar
        loop (deletes are rare, administrative operations)."""
        tags, b1 = self._tag_and_bucket(keys)
        b2 = self._alt_bucket(b1, tags)
        out = np.zeros(keys.shape[0], dtype=bool)
        for i in range(keys.shape[0]):
            for b in (int(b1[i]), int(b2[i])):
                slots = np.flatnonzero(self.table[b] == tags[i])
                if slots.size:
                    self.table[b, slots[0]] = _EMPTY
                    out[i] = True
                    self.n -= 1
                    break
        return out

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Union by re-inserting the other filter's tags (the reference's
        semantics: same-config only; raises if combined load exceeds
        capacity). NOT order-insensitive at the byte level — estimates
        (membership) are what is preserved."""
        self.cfg.require_same(other.cfg)
        out = CuckooFilter(self.cfg)
        out.table = self.table.copy()
        out.n = self.n
        occupied = np.flatnonzero(other.table.ravel() != _EMPTY)
        tags = other.table.ravel()[occupied]
        buckets = (occupied // self.cfg.bucket_size).astype(np.int64)
        try:
            out._insert_tags(tags, buckets)
        except SketchConfigError as e:
            raise SketchConfigError(f"cuckoo merge exceeded capacity: {e}") from e
        out.n += int(tags.size)
        return out

    # -- blob ------------------------------------------------------------------------

    def to_blob(self) -> bytes:
        from sketchlib import blob as blobmod

        head = json.dumps({"n": self.n}).encode()
        payload = len(head).to_bytes(4, "little") + head + self.table.tobytes()
        # reuse the SKB1 container with a dedicated id
        blobmod.SKETCH_IDS.setdefault("cuckoo", 7)
        blobmod.ID_TO_NAME[7] = "cuckoo"
        return blobmod.pack("cuckoo", self.cfg, payload)

    @classmethod
    def from_blob(cls, blob: bytes) -> "CuckooFilter":
        from sketchlib import blob as blobmod

        blobmod.SKETCH_IDS.setdefault("cuckoo", 7)
        blobmod.ID_TO_NAME[7] = "cuckoo"
        name, cfg, payload = blobmod.unpack(blob)
        if name != "cuckoo":
            raise SketchConfigError("not a cuckoo blob")
        hlen = int.from_bytes(payload[:4], "little")
        meta = json.loads(payload[4 : 4 + hlen])
        out = cls(cfg)
        out.table = (
            np.frombuffer(payload[4 + hlen :], dtype=np.uint16)
            .reshape(cfg.n_buckets, cfg.bucket_size).copy()
        )
        out.n = meta["n"]
        return out


def analytic_fpr(cfg: CuckooConfig) -> float:
    """~ 2 * bucket_size / 2**bits_per_tag ([FAN14] §3.1, full-ish load)."""
    return 2.0 * cfg.bucket_size / (1 << cfg.bits_per_tag)

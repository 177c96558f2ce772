"""Distributed sketch aggregation — the Spark-native partial/final pipeline.

This is the structural heart of the graft (SURVEY.md §3.2): the reference
builds thread-private filters and OR-merges them (bloomfilter-bsd benchmark
harness, A18 [path-level, unverified]); we build *partition*-private sketches
inside ``mapInArrow`` (one Python worker per partition, whole Arrow batches,
no per-row Python) and merge them with a B-ary ``applyInPandas`` tree —
manually mirroring Spark's own partial→final hash-aggregation physical plan,
because PySpark exposes no Python UDAF (SURVEY.md §3.3).

Scale notes (the 100 TB story):
- the only shuffles are the optional salted repartition and the merge tree;
  partials are tiny (KB–MB blobs), so the merge shuffle moves ~P blobs, not
  data;
- merge is B-ary (default 64): 1,000,000 partitions → 3 levels; each level is
  a groupBy over (sketch, group, bucket) — no skew possible since bucket ids
  are uniform by construction;
- token-frequency skew (Zipf corpora) cannot skew the *build* because
  partials are per-partition regardless of key values; salting
  (``salt_repartition``) equalizes *partition sizes* when upstream layout is
  skewed (e.g. one giant file).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from functools import reduce
from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from sketchlib import arrowutil, blob as blobmod, bloom, cms, hll, kll, minhash, tdigest
from sketchlib.config import (
    BloomConfig, CMSConfig, HLLConfig, KLLConfig, MinHashConfig, SketchConfigError, TDigestConfig, _Cfg,
)

MODULES = {
    "bloom": bloom,
    "hll": hll,
    "cms": cms,
    "kll": kll,
    "tdigest": tdigest,
    "minhash": minhash,
}

_CFG_TO_SKETCH = {
    BloomConfig: "bloom",
    HLLConfig: "hll",
    CMSConfig: "cms",
    KLLConfig: "kll",
    TDigestConfig: "tdigest",
    MinHashConfig: "minhash",
}


@dataclass(frozen=True)
class SketchSpec:
    """One sketch to build: ``name`` labels the output row; ``col`` is the
    input column (``array<int>`` list columns are flattened, numeric scalar
    columns used as-is)."""

    name: str
    cfg: _Cfg
    col: str

    @property
    def sketch(self) -> str:
        return _CFG_TO_SKETCH[type(self.cfg)]


PARTIAL_SCHEMA = (
    "sketch string, group string, part int, blob binary, "
    "rows bigint, items bigint, t_ms double"
)

_GLOBAL = ""  # group label when group_by is None


def salt_repartition(df: DataFrame, num_partitions: int, keys: list[str], salt: int = 0) -> DataFrame:
    """Spread rows uniformly over ``num_partitions`` by hashing keys + salt —
    the explicit skew-handling mandated by the north rule. Hash-based (not
    round-robin) so layout is deterministic given (input, salt)."""
    cols = [F.col(c) for c in keys] + [F.lit(salt)]
    return df.repartition(num_partitions, F.xxhash64(*cols))


def _build_partials_fn(specs: list[SketchSpec], group_by: str | None, part_col: str | None = None):
    """``part_col``: if given, the logical partition id is read from that
    column (deterministic, data-derived — the checkpoint/resume path keys
    lineage on it); otherwise the physical Spark partition id is used."""
    spec_list = [(s.name, s.sketch, s.cfg.to_json(), s.col) for s in specs]

    def fn(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        part_id = TaskContext.get().partitionId() if TaskContext.get() else -1
        t0 = time.perf_counter()
        _dedup_off: dict[str, bool] = {}
        # state[(spec_name, group, pid)] -> (module, cfg, state_obj, rows, items)
        state: dict[tuple[str, str, int], list] = {}
        specs_rt = [
            (name, MODULES[sk], _Cfg.from_json(cj), col) for name, sk, cj, col in spec_list
        ]

        mem_used = [0]

        def _builder_mem(cfg) -> int:
            # rough per-builder working set (SURVEY.md §7 hard part e):
            # Bloom = bool scratch (m bits -> m bytes); HLL = 2^p; CMS = d*w*8
            if isinstance(cfg, BloomConfig):
                return cfg.m_bits if cfg.m_bits <= (1 << 28) else cfg.n_bytes
            if isinstance(cfg, HLLConfig):
                return cfg.m
            if isinstance(cfg, CMSConfig):
                return cfg.depth * cfg.width * 8
            return 1 << 16  # KLL/tdigest/minhash: KBs

        def _get(name, module, cfg, group, pid):
            key = (name, group, pid)
            st = state.get(key)
            if st is None:
                mem_used[0] += _builder_mem(cfg)
                if mem_used[0] > (4 << 30):
                    raise SketchConfigError(
                        "per-partition sketch state would exceed 4 GiB "
                        f"({len(state)} group-sketch builders so far) — cap the "
                        "group count, shrink m_bits, or build groups in passes"
                    )
                st = state[key] = [module, cfg, module.new_builder(cfg), 0, 0]
            return st

        def _update(st, values):
            st[2].update(values)
            st[4] += int(values.size)

        for batch in batches:
            if batch.num_rows == 0:
                continue
            # segments: (group_label, pid, row_indices-or-None)
            if group_by is None and part_col is None:
                segments = [(_GLOBAL, part_id, None)]
            else:
                n = batch.num_rows
                if group_by is not None:
                    gcol = batch.column(group_by).to_numpy(zero_copy_only=False).astype(object)
                else:
                    gcol = np.full(n, _GLOBAL, dtype=object)
                if part_col is not None:
                    pcol = batch.column(part_col).to_numpy(zero_copy_only=False).astype(np.int64)
                else:
                    pcol = np.full(n, part_id, dtype=np.int64)
                segments = []
                for g in np.unique(gcol):
                    gmask = gcol == g
                    for p in np.unique(pcol[gmask]):
                        segments.append((str(g), int(p), np.flatnonzero(gmask & (pcol == p))))
            # one flatten per column, one dedup per (column, segment) shared by
            # every spec that is idempotent/weighted in the value — on Zipf
            # token streams this collapses per-token work to per-distinct work
            by_col: dict[str, list] = {}
            for spec in specs_rt:
                by_col.setdefault(spec[3], []).append(spec)
            for col, col_specs in by_col.items():
                arr = batch.column(col)
                for gval, pid, rows_idx in segments:
                    sub = arr if rows_idx is None else arr.take(pa.array(rows_idx))
                    values = arrowutil.sketch_values(sub)
                    n_rows = batch.num_rows if rows_idx is None else int(rows_idx.size)
                    uniq = counts = None
                    want_unique = (
                        values.dtype.kind in "iu"
                        and not _dedup_off.get(col, False)
                        and any(
                            getattr(_get(nm, m, c, gval, pid)[2], "supports_unique", False)
                            for nm, m, c, _ in col_specs
                        )
                    )
                    if want_unique:
                        vmax = int(values.max()) if values.size else 0
                        vmin = int(values.min()) if values.size else 0
                        if 0 <= vmin and vmax < (1 << 22):
                            # bounded domain (token ids <= vocab): O(n) histogram
                            # beats the O(n log n) sort and stays cache-resident
                            hist = np.bincount(values, minlength=0)
                            uniq = np.flatnonzero(hist)
                            counts = hist[uniq]
                            uniq = uniq.astype(values.dtype, copy=False)
                        else:
                            uniq, counts = np.unique(values, return_counts=True)
                        if values.size and uniq.size > 0.5 * values.size:
                            _dedup_off[col] = True  # low duplication: not worth it
                    for name, module, cfg, _ in col_specs:
                        st = _get(name, module, cfg, gval, pid)
                        builder = st[2]
                        if uniq is not None and getattr(builder, "supports_unique", False):
                            builder.update_unique(uniq, counts)
                            st[4] += int(values.size)
                        else:
                            _update(st, values)
                        st[3] += n_rows

        t_ms = (time.perf_counter() - t0) * 1000.0
        out = {"sketch": [], "group": [], "part": [], "blob": [], "rows": [], "items": [], "t_ms": []}
        for (name, group, pid), (module, cfg, obj, rows, items) in sorted(state.items()):
            payload = obj.to_payload()
            sketch_kind = _CFG_TO_SKETCH[type(cfg)]
            out["sketch"].append(name)
            out["group"].append(group)
            out["part"].append(pid)
            out["blob"].append(blobmod.pack(sketch_kind, cfg, payload))
            out["rows"].append(rows)
            out["items"].append(items)
            out["t_ms"].append(t_ms)
        if out["sketch"]:
            yield pa.RecordBatch.from_pydict(
                out,
                schema=pa.schema(
                    [
                        ("sketch", pa.string()),
                        ("group", pa.string()),
                        ("part", pa.int32()),
                        ("blob", pa.binary()),
                        ("rows", pa.int64()),
                        ("items", pa.int64()),
                        ("t_ms", pa.float64()),
                    ]
                ),
            )

    return fn


def build_partials(
    df: DataFrame,
    specs: list[SketchSpec],
    group_by: str | None = None,
    num_partitions: int | None = None,
    salt: int = 0,
    salt_keys: list[str] | None = None,
    part_col: str | None = None,
) -> DataFrame:
    """Per-partition partial sketches. Column-prunes to exactly the needed
    columns (so the parquet scan reads only them), optionally salt-repartitions
    for skewed upstream layouts. With ``part_col``, partials are keyed by that
    deterministic logical partition id instead of the physical Spark partition
    (the checkpoint/resume path)."""
    if not specs:
        raise SketchConfigError("no sketch specs given")
    names = [s.name for s in specs]
    if len(set(names)) != len(names):
        raise SketchConfigError("duplicate spec names")
    cols = sorted(
        {s.col for s in specs}
        | ({group_by} if group_by else set())
        | ({part_col} if part_col else set())
    )
    pruned = df.select(*cols)
    if num_partitions:
        if part_col:
            pruned = pruned.repartition(num_partitions, F.col(part_col))
        elif salt_keys:
            pruned = salt_repartition(pruned, num_partitions, salt_keys, salt)
        else:
            pruned = pruned.repartition(num_partitions)
    return pruned.mapInArrow(_build_partials_fn(specs, group_by, part_col), PARTIAL_SCHEMA)


def _merge_group(pdf):
    """Merge one (sketch, group[, bucket]) frame of partials into one row.
    Deterministic: sorted by part id before the fold."""
    import pandas as pd

    pdf = pdf.sort_values("part", kind="stable")
    blobs = list(pdf["blob"])
    name, cfg, _ = blobmod.unpack(blobs[0])
    module = MODULES[name]
    merged = reduce(module.merge_blobs, blobs)
    return pd.DataFrame(
        {
            "sketch": [pdf["sketch"].iloc[0]],
            "group": [pdf["group"].iloc[0]],
            "part": [int(pdf["part"].min())],
            "blob": [merged],
            "rows": [int(pdf["rows"].sum())],
            "items": [int(pdf["items"].sum())],
            "t_ms": [float(pdf["t_ms"].sum())],
        }
    )


def merge_partials(partials: DataFrame, fanout: int = 64, levels: int = 1) -> DataFrame:
    """B-ary tree merge. ``levels`` is ceil(log_fanout(P)) — 1 for P <= 64,
    2 for P <= 4096, 3 covers a million partitions. Each level shuffles only
    blob rows."""
    df = partials
    for lvl in range(levels - 1):
        bucketed = df.withColumn("bucket", F.pmod(F.col("part"), F.lit(fanout ** (levels - 1 - lvl))))
        df = (
            bucketed.groupBy("sketch", "group", "bucket")
            .applyInPandas(
                lambda pdf: _merge_group(pdf.drop(columns=["bucket"])), PARTIAL_SCHEMA
            )
        )
    return df.groupBy("sketch", "group").applyInPandas(_merge_group, PARTIAL_SCHEMA)


def build_sketches(
    df: DataFrame,
    specs: list[SketchSpec],
    group_by: str | None = None,
    num_partitions: int | None = None,
    salt: int = 0,
    salt_keys: list[str] | None = None,
    fanout: int = 64,
) -> DataFrame:
    """End-to-end: partials → tree merge → one row per (sketch, group)."""
    partials = build_partials(df, specs, group_by, num_partitions, salt, salt_keys)
    n_parts = num_partitions or df.rdd.getNumPartitions()
    levels = 1
    while fanout**levels < n_parts:
        levels += 1
    return merge_partials(partials, fanout=fanout, levels=levels)


def collect_blobs(final: DataFrame) -> dict[tuple[str, str], bytes]:
    """{(spec_name, group): blob} — final blobs are KB–MB, safe to collect."""
    return {(r["sketch"], r["group"]): bytes(r["blob"]) for r in final.collect()}

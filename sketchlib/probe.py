"""Probe-side operators: turn a finished sketch blob into a DataFrame column.

The reference's ``batch_contains`` emits a selection vector of matching probe
positions (bloomfilter-bsd ``blocked_bloomfilter.hpp`` [path-level,
unverified]); the Spark idiom is a boolean membership column — Catalyst turns
``df.filter(col)`` back into a selection, and the column composes with
any downstream plan (semi-join pruning, sideways information passing).

Blobs are shipped via ``SparkContext.broadcast`` (one copy per executor, not
per task) and probed with vectorized kernels inside a scalar Arrow UDF over
ONLY the key column: the plan's ``ArrowEvalPython`` exchange transfers just
that column to the Python worker and the JVM zips the result column back in.
(The previous ``mapInArrow`` formulation round-tripped the ENTIRE input
schema through Python — harmless on a one-column probe table, a scale-killer
when probing a wide 100 TB corpus table.)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from sketchlib import arrowutil, blob as blobmod, bloom, cms, cuckoo, kll
from sketchlib.config import SketchConfigError


def _append_col_map(df: DataFrame, blob: bytes, col: str, out: str, kernel, out_type,
                    array_mode: str = "all"):
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(blob)

    def probe(arr: pa.Array) -> pa.Array:
        payload_blob = bc.value
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        # null inputs -> null outputs (sketch inputs are non-null by
        # contract; masked rather than dropped so row alignment holds)
        mask = None
        if arr.null_count:
            mask = np.invert(arr.is_valid().to_numpy(zero_copy_only=False))
        if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
            flat, starts = arrowutil.list_to_flat(arr)
            res_flat = kernel(flat, payload_blob)
            if res_flat.dtype != bool:
                raise SketchConfigError("array-column probe only supports boolean kernels")
            # per-row semantics for array columns: 'all' tokens present /
            # 'any' token present (empty rows: all=True, any=False)
            seg_len = np.diff(np.r_[starts, flat.shape[0]])
            csum = np.r_[0, np.cumsum(res_flat.astype(np.int64))]
            hits = csum[np.r_[starts, flat.shape[0]][1:]] - csum[starts]
            res = hits == seg_len if array_mode == "all" else hits > 0
        elif mask is not None:
            # drop-and-reinsert instead of fill_null(sentinel): works for any
            # key type (fill_null(0) raises ArrowTypeError on string keys)
            vals = arr.drop_null().to_numpy(zero_copy_only=False)
            res_valid = kernel(vals, payload_blob)
            res = np.zeros(len(arr), dtype=res_valid.dtype)
            res[~mask] = res_valid
        else:
            res = kernel(arr.to_numpy(zero_copy_only=False), payload_blob)
        return pa.array(res, type=out_type, mask=mask)

    type_str = {pa.bool_(): "boolean", pa.int64(): "bigint", pa.float64(): "double"}[out_type]
    probe_udf = F.arrow_udf(probe, type_str)
    return df.withColumn(out, probe_udf(F.col(col)))


def with_bloom_membership(df: DataFrame, blob: bytes, col: str, out: str = "member",
                          array_mode: str = "all") -> DataFrame:
    """Boolean membership column. Guarantee: never false for inserted keys
    (zero false negatives); true-rate on absent keys = the analytic FPR.
    For array columns ``array_mode`` picks ALL-tokens vs ANY-token semantics."""
    name, _, _ = blobmod.unpack(blob)
    if name != "bloom":
        raise SketchConfigError("expected a bloom blob")
    if array_mode not in ("all", "any"):
        raise SketchConfigError("array_mode must be 'all' or 'any'")
    return _append_col_map(df, blob, col, out, bloom.contains_blob, pa.bool_(), array_mode)


def with_cuckoo_membership(df: DataFrame, blob: bytes, col: str, out: str = "member",
                           array_mode: str = "all") -> DataFrame:
    """Boolean membership column against a cuckoo filter blob — zero false
    negatives for inserted keys, FPR ~ 2*bucket_size/2^bits_per_tag
    ([FAN14] §3.1). Same column semantics as the Bloom probe."""
    name, _, _ = blobmod.unpack(blob)
    if name != "cuckoo":
        raise SketchConfigError("expected a cuckoo blob")
    if array_mode not in ("all", "any"):
        raise SketchConfigError("array_mode must be 'all' or 'any'")
    return _append_col_map(df, blob, col, out, cuckoo.contains_blob, pa.bool_(), array_mode)


def with_cms_count(df: DataFrame, blob: bytes, col: str, out: str = "est_count") -> DataFrame:
    """Point-estimate count column (est >= true; est <= true + eps*N w.p. 1-delta)."""
    name, _, _ = blobmod.unpack(blob)
    if name != "cms":
        raise SketchConfigError("expected a cms blob")
    return _append_col_map(df, blob, col, out, cms.query_blob, pa.int64())


def with_kll_rank(df: DataFrame, blob: bytes, col: str, out: str = "est_rank") -> DataFrame:
    """Estimated normalized rank of each value under the sketched distribution."""
    name, cfg, payload = blobmod.unpack(blob)
    if name != "kll":
        raise SketchConfigError("expected a kll blob")

    def kernel(values, b):
        n2, c2, p2 = blobmod.unpack(b)
        return kll.KLL.from_payload(c2, p2).rank(values)

    return _append_col_map(df, blob, col, out, kernel, pa.float64())


def bloom_prune_join(
    left: DataFrame, right: DataFrame, left_key: str, right_blob: bytes, how: str = "inner",
    right_key: str | None = None,
) -> DataFrame:
    """Sideways-information-passing demo: pre-filter ``left`` by a Bloom blob
    built over ``right``'s keys before the actual join — the classic use the
    reference library was built for inside MPP engines ([SIGMOD19] §1).
    Rows surviving the probe are exact-joined, so the result is exact (the
    filter only prunes; FPs are removed by the join itself).

    Only join types that drop unmatched LEFT rows anyway are accepted
    (inner / left-semi / right-outer): pruning the left side of a
    left/full-outer join would lose rows that should be null-extended, and
    pruning before a left-anti join would invert it (only Bloom FALSE
    POSITIVES would survive). Those are rejected, not silently wrong."""
    normalized = how.lower().replace("_", "")
    if normalized not in ("inner", "semi", "leftsemi", "right", "rightouter"):
        raise SketchConfigError(
            f"bloom_prune_join: how={how!r} is unsound with a left-side Bloom "
            "pre-filter (unmatched left rows are dropped before the join); "
            "use inner/left_semi/right, or join without pruning")
    pruned = with_bloom_membership(left, right_blob, left_key, "_bf_member")
    pruned = pruned.filter("_bf_member").drop("_bf_member")
    if right_key is None:
        right_key = left_key
    return pruned.join(right, pruned[left_key] == right[right_key], how)

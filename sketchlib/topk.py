"""Approximate top-k / heavy hitters (SURVEY.md §2.B sorts/limits row).

Strategy (classic two-sided): per-partition candidate generation (exact local
top-c by count — any global top-k item is a local top-c item in at least one
partition when c >= k) + a global CMS for scoring. Merge = union candidate
sets, score each with the merged CMS (est >= true), keep the k best.

Guarantees: the returned counts are CMS estimates (never underestimates, over
by <= eps*N w.p. 1-delta each). The candidate union can only miss a true
top-k item if it is not in any partition's local top-c — take c a few times k
(default 4x) to make that practically impossible under any skew that matters
(a true heavy hitter is heavy somewhere).

Everything rides the existing machinery: candidates are tiny (c rows per
partition) and the CMS is the usual mergeable blob — one mapInArrow pass,
one blob-merge, no data shuffle.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from pyspark.sql import DataFrame, functions as F

from sketchlib import agg, arrowutil, cms
from sketchlib.config import CMSConfig


def approx_topk(
    df: DataFrame,
    col: str,
    k: int = 20,
    candidates_per_partition: int | None = None,
    cms_cfg: CMSConfig | None = None,
) -> list[tuple[int, int]]:
    """[(value, est_count)] for the approximate top-k of ``col`` (scalar int
    column or array<int> column, flattened)."""
    c = candidates_per_partition or max(4 * k, 64)
    cfg = cms_cfg or CMSConfig(eps=0.0005, delta=0.01)

    def local_candidates(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        counts: dict[int, int] = {}
        agg_arrays = []
        for batch in batches:
            agg_arrays.append(arrowutil.sketch_values(batch.column(col)))
        if agg_arrays:
            flat = np.concatenate(agg_arrays)
            uniq, cnt = np.unique(flat, return_counts=True)
            if uniq.size > c:
                top = np.argpartition(-cnt, c - 1)[:c]
                uniq, cnt = uniq[top], cnt[top]
            yield pa.RecordBatch.from_pydict(
                {"value": uniq.astype(np.int64), "cnt": cnt.astype(np.int64)},
                schema=pa.schema([("value", pa.int64()), ("cnt", pa.int64())]),
            )

    cand = (
        df.select(col)
        .mapInArrow(local_candidates, "value bigint, cnt bigint")
        .groupBy("value").agg(F.sum("cnt").alias("cnt"))
        .orderBy(F.desc("cnt"), "value")
        .limit(4 * c)
    )
    cand_vals = np.array([r["value"] for r in cand.collect()], dtype=np.int64)
    if cand_vals.size == 0:
        return []

    blob = agg.collect_blobs(
        agg.build_sketches(df, [agg.SketchSpec("cms", cfg, col)])
    )[("cms", "")]
    est = cms.query_blob(cand_vals, blob)
    order = np.lexsort((cand_vals, -est))[:k]
    return [(int(cand_vals[i]), int(est[i])) for i in order]

"""Token-array-native near-dup (the pre-tokenized corpus pipeline op) and the
per-partition group-memory guardrail."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from sketchlib import agg, textops
from sketchlib.config import BloomConfig, SketchConfigError


def test_token_near_duplicates(spark):
    rng = np.random.default_rng(5)
    rows = []
    for i in range(200):
        toks = rng.integers(0, 50_000, 120).tolist()
        rows.append(Row(doc_id=f"d{i:04d}", tokens=[int(t) for t in toks]))
    # exact dup of d0000 and a near dup (3 tokens changed)
    rows.append(Row(doc_id="dup_exact", tokens=list(rows[0].tokens)))
    nd = list(rows[0].tokens)
    nd[10], nd[50], nd[90] = 1, 2, 3
    rows.append(Row(doc_id="dup_near", tokens=nd))
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")

    pairs = textops.token_near_duplicates(df, num_perm=128, bands=32, threshold=0.5)
    found = {(r["a"], r["b"]): r["jaccard_est"] for r in pairs.collect()}
    assert ("d0000", "dup_exact") in found and found[("d0000", "dup_exact")] == 1.0
    assert ("d0000", "dup_near") in found
    # unrelated random docs must not pair
    assert all("dup" in a or "dup" in b or a == "d0000" or b == "d0000"
               for a, b in found), found


def test_group_memory_guardrail(spark):
    """Huge bloom per group x high group cardinality must fail fast with an
    actionable error, not OOM an executor."""
    df = spark.range(2_000).select(
        F.col("id").cast("int").alias("tok"),
        (F.col("id") % 600).cast("string").alias("grp"),
    ).coalesce(1)
    spec = [agg.SketchSpec(
        "bloom", BloomConfig(m_bits=1 << 26, k=4, word_bits=64, words_per_block=8, sectors=4),
        "tok",
    )]
    with pytest.raises(Exception) as exc:
        agg.build_partials(df, spec, group_by="grp").collect()
    assert "4 GiB" in str(exc.value) or "SketchConfigError" in str(exc.value)

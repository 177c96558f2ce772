"""Approximate top-k: must recover the exact top-k set on Zipf-skewed data
with CMS-accurate counts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib import datagen, topk


def test_approx_topk_matches_exact(spark):
    corpus = datagen.corpus_df(spark, 2_000, partitions=4).cache()
    corpus.count()
    got = topk.approx_topk(corpus, "tokens", k=15)
    exact = (
        corpus.select(F.explode("tokens").alias("t"))
        .groupBy("t").count().orderBy(F.desc("count"), "t").limit(15).collect()
    )
    exact_pairs = [(r["t"], r["count"]) for r in exact]
    # same top-15 value set (Zipf head is unambiguous)
    assert {v for v, _ in got} == {v for v, _ in exact_pairs}
    # CMS estimates: never under, within eps*N over
    n = corpus.agg(F.sum("n_tok")).collect()[0][0]
    exact_map = dict(exact_pairs)
    for v, est in got:
        assert est >= exact_map[v]
        assert est <= exact_map[v] + 0.0005 * n
    corpus.unpersist()


def test_approx_topk_scalar_column(spark):
    df = spark.range(10_000).select((F.col("id") % 7).cast("int").alias("v"))
    got = topk.approx_topk(df, "v", k=3)
    assert len(got) == 3
    for v, est in got:
        assert abs(est - (1429 if v < 3 else 1428)) <= 10

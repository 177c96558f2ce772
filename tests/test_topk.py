"""Approximate top-k: must recover the exact top-k set on Zipf-skewed data
with CMS-accurate counts."""

from __future__ import annotations

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


def test_approx_topk_scores_full_candidate_union(spark):
    """The true global #1 can rank LAST in the candidate union by summed
    local top-c counts (locally light everywhere but one partition, globally
    heavy via sub-top-c occurrences the sums never see). A driver-side
    limit on that ranking used to cut it before CMS scoring; the full union
    must be scored."""
    sc = spark.sparkContext
    X = 999
    slices = []
    for p in range(8):
        # partition 0 has only 3 fillers so X lands in ITS local top-4;
        # everywhere else 4 heavier fillers keep X out of the local top-c
        fillers = [10_000 + 10 * p + j for j in range(3 if p == 0 else 4)]
        part = [f for f in fillers for _ in range(20)]  # local top-4, 20 each
        part += [X] * (10 if p == 0 else 9)  # X: top-c ONLY in partition 0
        slices.append(part)
    rdd = sc.parallelize(range(8), 8).flatMap(lambda p: slices[p])
    df = rdd.map(lambda v: (v,)).toDF(["value"])
    assert df.rdd.getNumPartitions() == 8
    # X true count = 10 + 7*9 = 73 > every filler's 20; its summed local
    # top-c count is 10 — dead last among 32+ candidates (old limit 4*c=16)
    got = topk.approx_topk(df, "value", k=1, candidates_per_partition=4)
    assert got[0][0] == X, got
    assert got[0][1] >= 73  # CMS never underestimates


def test_approx_topk_refuses_cu_config_before_scan(spark):
    """CU partials are not mergeable; the refusal must fire BEFORE the input
    scan (same up-front policy as agg._build_partials_fn), not inside
    merge_partials after a full pass over the data."""
    from sketchlib.config import CMSConfig, SketchConfigError

    df = spark.range(10).select(F.col("id").cast("int").alias("v"))
    with pytest.raises(SketchConfigError, match="conservative"):
        topk.approx_topk(df, "v", k=3,
                         cms_cfg=CMSConfig(eps=0.01, delta=0.1,
                                           conservative=True))


def test_fused_pass_uint64_histogram_branch():
    """Direct-Arrow callers can feed uint64 columns (Spark never does); the
    bounded-domain histogram fast path must cast before np.bincount, which
    refuses uint64 ('cannot cast to int64 by rule safe')."""
    import pyarrow as pa
    from sketchlib.config import CMSConfig

    vals = [5, 5, 5, 2, 2, 9]
    batch = pa.RecordBatch.from_pydict({"v": pa.array(vals, pa.uint64())})
    lp = topk._make_local_pass("v", 4, CMSConfig(eps=0.01, delta=0.1).to_json())
    out = list(lp(iter([batch])))
    assert len(out) == 1
    tbl = out[0].to_pydict()
    cand = {v: c for v, c in zip(tbl["value"], tbl["cnt"]) if v is not None}
    assert cand == {5: 3, 2: 2, 9: 1}


def test_fused_pass_uint64_above_int63_refused():
    """uint64 values >= 2**63 cannot fit the int64-keyed pipeline; the
    unique fallback must refuse loudly instead of wrapping to negatives."""
    import pyarrow as pa
    from sketchlib.config import CMSConfig

    batch = pa.RecordBatch.from_pydict(
        {"v": pa.array([2**63, 7], pa.uint64())})
    lp = topk._make_local_pass("v", 4, CMSConfig(eps=0.01, delta=0.1).to_json())
    with pytest.raises(ValueError, match="2\\*\\*63"):
        list(lp(iter([batch])))


def test_approx_topk_empty_input(spark):
    """The top-k of an empty input is [] — no partials exist, so the blob
    lookup must not KeyError after the merge returns nothing."""
    df = spark.range(0).select(F.col("id").cast("int").alias("v"))
    assert topk.approx_topk(df, "v", k=5) == []

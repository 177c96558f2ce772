"""Bucketed, co-located joins — the shuffle-elimination pattern the 100 TB
deployment uses for repeated joins on the same key (SURVEY.md §4 / README
scale notes). Both sides bucketed by the join key -> SortMergeJoin with NO
Exchange in the plan."""

from __future__ import annotations



def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_bucketed_join_has_no_exchange(spark, tmp_path_factory):
    # tables land in ./spark-warehouse (gitignored); dropped in finally
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    pt = spark.read.parquet("/root/testdata/sf0.001/part.parquet")
    (li.write.mode("overwrite").bucketBy(8, "l_partkey").sortBy("l_partkey")
       .saveAsTable("li_bucketed"))
    (pt.write.mode("overwrite").bucketBy(8, "p_partkey").sortBy("p_partkey")
       .saveAsTable("part_bucketed"))
    try:
        a = spark.table("li_bucketed")
        b = spark.table("part_bucketed")
        # disable broadcast so the co-location is what saves the shuffle
        with_conf = spark.conf
        old = with_conf.get("spark.sql.autoBroadcastJoinThreshold")
        with_conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            import re

            def exchange_ids(plan: str) -> set[str]:
                return set(re.findall(r"\bExchange \(\d+\)", plan))

            joined = a.join(b, a.l_partkey == b.p_partkey).groupBy("p_brand").count()
            plan = _plan(joined)
            assert "SortMergeJoin" in plan
            # co-located buckets: only the groupBy above the join shuffles
            assert len(exchange_ids(plan)) == 1, plan

            # control: the same join on plain parquet shuffles both sides
            plain = (
                li.join(pt, li.l_partkey == pt.p_partkey).groupBy("p_brand").count()
            )
            assert len(exchange_ids(_plan(plain))) == 3

            assert joined.count() > 0
        finally:
            with_conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS part_bucketed")

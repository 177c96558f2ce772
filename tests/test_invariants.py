"""Per-row invariant (BASELINE.json:15): token-array equality — the pipeline
(salted repartition, part-id derivation, checkpoint write/read) must never
reorder within or corrupt a document's token array."""

from __future__ import annotations

from pyspark.sql import functions as F

from sketchlib import datagen, job


def _rows_by_doc(df):
    return {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in df.collect()
    }


def test_token_arrays_survive_repartition_and_checkpoint(spark, tmp_path):
    corpus = datagen.corpus_df(spark, 1_000, partitions=3)
    want = _rows_by_doc(corpus)

    j = job.JobSpec(specs=(), num_partitions=7, salt=3, salt_keys=("doc_id",))
    staged = job.with_part_id(corpus, j).repartition(7, F.col(job.PART_COL))
    got = _rows_by_doc(staged.drop(job.PART_COL))
    assert got == want

    path = str(tmp_path / "roundtrip")
    staged.write.parquet(path)
    back = _rows_by_doc(spark.read.parquet(path).drop(job.PART_COL))
    assert back == want

    # salted layout is still a partition (no row lost/duplicated)
    assert staged.count() == 1_000
    # n_tok == size(tokens) everywhere after the trip
    assert spark.read.parquet(path).filter(F.size("tokens") != F.col("n_tok")).count() == 0

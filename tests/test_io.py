"""I/O seam: parquet path, iceberg detection (absent in sandbox)."""

from __future__ import annotations

from sketchlib import datagen, io


def test_parquet_roundtrip(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("io")) + "/corpus"
    df = datagen.corpus_df(spark, 200, partitions=1)
    io.write_table(df, p)
    back = io.read_corpus(spark, p)
    assert back.count() == 200
    assert set(back.columns) == {"doc_id", "tokens", "n_tok", "source"}
    io.write_table(df.limit(10), p, mode="append")
    assert io.read_corpus(spark, p).count() == 210


def test_iceberg_absent_in_sandbox(spark):
    assert io.iceberg_available(spark) is False

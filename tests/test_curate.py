"""Composed corpus-curation pipeline: stage invariants + plan shape."""

from __future__ import annotations

from etl_pack_spark.plans.curate import curate_corpus
from etl_pack_spark.sources.reader import read_table


def test_curate_invariants(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = curate_corpus(docs).collect()
    ids = [r["doc_id"] for r in out]
    assert len(ids) == len(set(ids))  # dedup: unique survivors
    assert 0 < len(ids) < docs.count()  # filters actually filter
    langs = {r["lang"] for r in out}
    assert "zh" not in langs  # unverifiable language excluded
    assert {r["split"] for r in out} <= {"train", "val", "test"}


def test_curate_single_scan_single_shuffle(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    plan = curate_corpus(docs)._jdf.queryExecution().executedPlan().toString()
    # one scan of the corpus and one exchange (the dedup group-by)
    assert plan.count("FileScan parquet") == 1
    assert plan.count("Exchange") == 1

"""End-to-end pretraining pipeline: stage contracts, determinism,
and scale-shape checks over the documents fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pack_spark.plans.pretrain import prepare_pretraining_corpus
from etl_pack_spark.sources.reader import read_table

WEIGHTS = {"src1": 0.5, "src2": 0.3, "src3": 0.2}


def _docs(spark, sf_dir):
    return read_table(spark, sf_dir, "documents")


def test_pipeline_end_to_end(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    evald = docs.where(F.col("doc_id") % 10 == 7).select("doc_id", "text")
    out = prepare_pretraining_corpus(docs, eval_df=evald, weights=WEIGHTS).cache()
    try:
        n = out.count()
        assert n > 0
        # contract columns present
        assert {"doc_id", "lang", "split", "source", "copy_n",
                "n_tokens", "pack_id", "oversize"} <= set(out.columns)
        # train split only, listed domains only
        assert out.where(F.col("split") != "train").count() == 0
        assert out.where(~F.col("source").isin(*WEIGHTS)).count() == 0
        # packing respects the budget for non-oversize packs
        over = (
            out.where(~F.col("oversize"))
            .groupBy("pack_id").agg(F.sum("n_tokens").alias("s"))
            .where(F.col("s") > 2048).count()
        )
        assert over == 0
        # each (doc, copy) appears exactly once
        dup = (
            out.groupBy("doc_id", "copy_n").count()
            .where(F.col("count") > 1).count()
        )
        assert dup == 0
    finally:
        out.unpersist()


def test_pipeline_stages_monotone_and_effective(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    evald = docs.where(F.col("doc_id") % 10 == 7).select("doc_id", "text")
    base = prepare_pretraining_corpus(docs)
    decon = prepare_pretraining_corpus(docs, eval_df=evald)
    base_ids = {r["doc_id"] for r in base.select("doc_id").distinct().collect()}
    decon_ids = {r["doc_id"] for r in decon.select("doc_id").distinct().collect()}
    # decontamination only removes docs, and removes at least one
    # (the fixture's near-dups straddle the doc_id % 10 == 7 split)
    assert decon_ids < base_ids


def test_pipeline_deterministic_under_repartition(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = prepare_pretraining_corpus(docs, weights=WEIGHTS)
    b = prepare_pretraining_corpus(docs.repartition(13), weights=WEIGHTS)
    ka = sorted(map(tuple, a.select("doc_id", "copy_n", "n_tokens").collect()))
    kb = sorted(map(tuple, b.select("doc_id", "copy_n", "n_tokens").collect()))
    assert ka == kb

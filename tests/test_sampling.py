"""Deterministic sampling: stability under repartitioning, split
completeness, fraction accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_pack_spark.operators import sampling
from etl_pack_spark.sources.reader import read_table


def test_sample_stable_under_repartition(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    frac = {"en": 0.25, "de": 1.0, "es": 1.0, "fr": 1.0, "zh": 0.5}
    a = {r["doc_id"] for r in sampling.stratified_sample(docs, "doc_id", "lang", frac).collect()}
    b = {
        r["doc_id"]
        for r in sampling.stratified_sample(
            docs.repartition(7, "lang"), "doc_id", "lang", frac
        ).collect()
    }
    assert a == b and len(a) > 0


def test_sample_fraction_roughly_holds(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    n_en = docs.where("lang = 'en'").count()
    got = sampling.stratified_sample(docs, "doc_id", "lang", {"en": 0.25}).count()
    assert 0.10 * n_en <= got <= 0.45 * n_en  # loose: 28-bit hash, small n


def test_split_partitions_every_row_once(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = sampling.split_assign(docs, "doc_id")
    n = docs.count()
    counts = {r["split"]: r["c"] for r in out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert sum(counts.values()) == n
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)


def test_split_assignment_is_append_stable(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    full = {r["doc_id"]: r["split"] for r in sampling.split_assign(docs, "doc_id").collect()}
    half = {
        r["doc_id"]: r["split"]
        for r in sampling.split_assign(docs.where("doc_id % 2 = 0"), "doc_id").collect()
    }
    # a row's split depends only on its key: subsetting never moves it
    assert all(full[k] == v for k, v in half.items())

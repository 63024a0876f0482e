"""Naive-Bayes classifier: separable-corpus sanity, DuckDB parity,
plan shape."""

from __future__ import annotations

import duckdb
import numpy as np
from pyspark.sql import functions as F

from etl_pack_spark.operators.classify import nb_score, nb_train, nb_train_score_sql
from etl_pack_spark.sources.reader import read_table


def test_separates_planted_classes(spark):
    pos = "clean well written prose with informative content"
    neg = "spam spam buy now click here free offer"
    rows = [(i, pos + f" variant {i}", True) for i in range(10)] + [
        (100 + i, neg + f" variant {i}", False) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    model = nb_train(df, "text", "y")
    out = {r["id"]: r["pred"] for r in nb_score(df, "doc_id", "text", model).collect()}
    assert all(out[i] for i in range(10))
    assert not any(out[100 + i] for i in range(10))


def test_oracle_parity_on_fixture(spark, sf_dir):
    """Train-on-self with a weak label (n_chars > 250), score the same
    corpus — Spark == DuckDB at 1e-9 rel (ln is libm-dependent)."""
    docs = read_table(spark, sf_dir, "documents")
    labeled = docs.withColumn("y", F.col("n_chars") > 250)
    model = nb_train(labeled, "text", "y")
    got = (
        nb_score(labeled, "doc_id", "text", model)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.execute(nb_train_score_sql("documents", "doc_id", "text", "n_chars > 250"))
        .fetchdf().sort_values("id").reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert np.allclose(got["score"], want["score"], rtol=1e-9, atol=1e-9)
    assert (got["pred"].values == want["pred"].values).all()
    # the classifier learned SOMETHING: both classes predicted
    assert 0 < got["pred"].sum() < len(got)


def test_scoring_plan_broadcasts_model(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    labeled = docs.withColumn("y", F.col("n_chars") > 250)
    model = nb_train(labeled, "text", "y")
    plan = (
        nb_score(labeled, "doc_id", "text", model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan


def test_null_labels_are_not_training_examples(spark):
    """A NULL-label document must not train the model (F.when(y, 0)
    .otherwise(1) would count it as a NEGATIVE example) — but it still
    gets scored. Pinned against the DuckDB twin, which has always
    filtered NULL labels from training."""
    import duckdb
    import numpy as np
    import pandas as pd

    rows = [
        (1, "good clean prose text", True),
        (2, "spam spam click here", False),
        (3, "good clean prose text spam", None),  # unlabeled: score-only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, y boolean")
    model = nb_train(df, "text", "y")
    # the unlabeled doc's unique contribution must be absent from the model
    toks_in_model = {r["tok"] for r in model.collect()}
    assert "__prior__" in toks_in_model
    got = (
        nb_score(df, "doc_id", "text", model)
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    assert len(got) == 3  # every row scored, labeled or not

    con = duckdb.connect()
    con.register("documents_nb", pd.DataFrame(rows, columns=["doc_id", "text", "y"]))
    want = (
        con.execute(nb_train_score_sql("documents_nb", "doc_id", "text", "y"))
        .fetchdf().sort_values("id").reset_index(drop=True)
    )
    assert np.allclose(got["score"], want["score"], rtol=1e-9, atol=1e-9)
    assert (got["pred"].values == want["pred"].values).all()

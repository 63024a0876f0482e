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


# ---------------------------------------------------------------------------
# Trained language ID (r14, round-13 VERDICT #7)

_LANG_WORDS = {
    "en": ["the", "and", "with", "house", "water", "friend", "morning",
           "beautiful", "quickly", "children", "street", "because",
           "thought", "together", "little", "garden"],
    "de": ["und", "der", "mit", "haus", "wasser", "freund", "morgen",
           "schön", "schnell", "kinder", "straße", "weil", "gedanke",
           "zusammen", "klein", "garten"],
    "es": ["y", "el", "con", "casa", "agua", "amigo", "mañana", "hermoso",
           "rápido", "niños", "calle", "porque", "pensamiento", "juntos",
           "pequeño", "jardín"],
    "fr": ["et", "le", "avec", "maison", "eau", "ami", "matin", "beau",
           "vite", "enfants", "rue", "parce", "pensée", "ensemble",
           "petit", "jardin"],
    # the heuristic has NO italian markers: covering it at all is part
    # of what the trained model buys
    "it": ["e", "il", "con", "casa", "acqua", "amico", "mattina", "bello",
           "veloce", "bambini", "strada", "perché", "pensiero", "insieme",
           "piccolo", "giardino"],
}


def _planted_sentences(lang: str, n: int, offset: int = 0) -> list[str]:
    """Deterministic synthetic sentences from the language's word pool
    (offset picks a disjoint combination stream for held-out rows)."""
    words = _LANG_WORDS[lang]
    out = []
    for i in range(n):
        j = i + offset
        out.append(" ".join(
            words[(j * 3 + k * (j % 5 + 1)) % len(words)] for k in range(8)
        ))
    return out


def _langid_fixture(spark, n_train=40, n_test=10):
    train = [(lang, s) for lang in sorted(_LANG_WORDS)
             for s in _planted_sentences(lang, n_train)]
    test = [(i, lang, s) for i, (lang, s) in enumerate(
        (lang, s) for lang in sorted(_LANG_WORDS)
        for s in _planted_sentences(lang, n_test, offset=1000))]
    return (
        spark.createDataFrame(train, "lang string, text string"),
        spark.createDataFrame(test, "doc_id long, lang string, text string"),
    )


def test_nb_langid_beats_heuristic_on_held_out(spark):
    """round-13 VERDICT #7 done-condition: the trained model beats the
    marker heuristic on a held-out planted multilingual fixture (the
    heuristic cannot even name italian, and confuses the romance
    languages on marker-free sentences)."""
    from etl_pack_spark.operators.classify import (
        nb_langid_score,
        nb_langid_train,
    )
    from etl_pack_spark.operators.textops import language_id

    train, test = _langid_fixture(spark)
    grams, meta = nb_langid_train(train, "text", "lang")
    model_pred = nb_langid_score(test, "doc_id", "text", grams, meta) \
        .join(test.select("doc_id", "lang"), "doc_id")
    model_acc = model_pred.agg(F.avg(
        (F.col("lang_pred") == F.col("lang")).cast("double"))).first()[0]
    heur_pred = language_id(test, "doc_id", "text") \
        .join(test.select("doc_id", "lang"), "doc_id")
    heur_acc = heur_pred.agg(F.avg(
        (F.col("lang_pred") == F.col("lang")).cast("double"))).first()[0]
    assert model_acc > heur_acc, (model_acc, heur_acc)
    assert model_acc >= 0.95  # near-perfect on in-domain planted text
    assert heur_acc <= 0.8    # it-blind by construction


def test_nb_langid_duckdb_twin(spark, tmp_path):
    """Scoring-pass parity: same decomposition, rounding, and
    alphabetical tie-break in both engines (scores at 1e-9 rel tol —
    ln is libm-dependent; predictions exact)."""
    from etl_pack_spark.operators.classify import (
        nb_langid_score,
        nb_langid_score_sql,
        nb_langid_train,
    )

    train, test = _langid_fixture(spark, n_train=20, n_test=6)
    # a NULL text scores priors-only — both engines must agree there too
    test = test.unionByName(spark.createDataFrame(
        [(9999, None, None)], "doc_id long, lang string, text string"))
    grams, meta = nb_langid_train(train, "text", "lang")
    mine = {r["doc_id"]: (r["lang_pred"], r["lang_score"])
            for r in nb_langid_score(test, "doc_id", "text", grams, meta)
            .collect()}
    gp, mp, tp = (str(tmp_path / x) for x in ("g.parquet", "m.parquet",
                                              "t.parquet"))
    grams.toPandas().to_parquet(gp)
    meta.toPandas().to_parquet(mp)
    test.toPandas().to_parquet(tp)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW t AS SELECT * FROM '{tp}'")
    con.sql(f"CREATE VIEW mg AS SELECT * FROM '{gp}'")
    con.sql(f"CREATE VIEW mm AS SELECT * FROM '{mp}'")
    oracle = {r[0]: (r[1], r[2]) for r in con.sql(
        nb_langid_score_sql("t", "mg", "mm", "doc_id", "text")).fetchall()}
    assert set(mine) == set(oracle)
    for k in mine:
        assert mine[k][0] == oracle[k][0], (k, mine[k], oracle[k])
        assert abs(mine[k][1] - oracle[k][1]) <= 1e-9 * max(
            1.0, abs(oracle[k][1]))


def test_langid_model_store_and_fallback(spark, tmp_path):
    """Save -> load -> score matches in-memory; missing store falls
    back to the heuristic with the source surfaced; a manifest-less
    dir is loud."""
    import pytest

    from etl_pack_spark.operators.classify import (
        langid_model_load,
        langid_model_save,
        language_id_trained,
        nb_langid_score,
        nb_langid_train,
    )

    train, test = _langid_fixture(spark, n_train=20, n_test=4)
    grams, meta = nb_langid_train(train, "text", "lang")
    path = str(tmp_path / "model")
    langid_model_save(spark, grams, meta, path)
    g2, m2, n2 = langid_model_load(spark, path)
    direct = {r["doc_id"]: r["lang_pred"] for r in
              nb_langid_score(test, "doc_id", "text", grams, meta).collect()}
    stored = {r["doc_id"]: r["lang_pred"] for r in
              nb_langid_score(test, "doc_id", "text", g2, m2, n2).collect()}
    assert direct == stored
    out = language_id_trained(test, "doc_id", "text", path)
    assert {r["lang_source"] for r in out.collect()} == {"model"}
    fb = language_id_trained(test, "doc_id", "text", str(tmp_path / "nope"))
    assert {r["lang_source"] for r in fb.collect()} == {"heuristic"}
    bad = str(tmp_path / "bad")
    test.write.parquet(bad)
    with pytest.raises(ValueError, match="_langid_manifest"):
        language_id_trained(test, "doc_id", "text", bad)


def test_datacard_uses_trained_model(spark, tmp_path):
    """round-13 VERDICT #7 datacard integration: with a model store,
    lang_match_frac scores declared-vs-MODEL-predicted; the heuristic
    card cannot see an italian slice at all."""
    from etl_pack_spark.operators.classify import (
        langid_model_save,
        nb_langid_train,
    )
    from etl_pack_spark.operators.quality import corpus_datacard

    train, test = _langid_fixture(spark)
    grams, meta = nb_langid_train(train, "text", "lang")
    path = str(tmp_path / "model")
    langid_model_save(spark, grams, meta, path)
    docs = test  # declared lang == truth: a perfect-labeling corpus
    with_model = {
        (r["lang"], r["is_total"]): r["lang_match_frac"]
        for r in corpus_datacard(
            docs, "doc_id", "text", langid_model_path=path,
            accuracy=None).collect()
    }
    heuristic = {
        (r["lang"], r["is_total"]): r["lang_match_frac"]
        for r in corpus_datacard(docs, "doc_id", "text",
                                 accuracy=None).collect()
    }
    # the model recognizes the italian slice; the heuristic cannot
    assert with_model[("it", 0)] >= 0.9
    assert heuristic[("it", 0)] == 0.0
    assert with_model[(None, 1)] > heuristic[(None, 1)]  # grand total
    # a missing model path keeps the heuristic numbers bit-identical
    fallback = {
        (r["lang"], r["is_total"]): r["lang_match_frac"]
        for r in corpus_datacard(
            docs, "doc_id", "text",
            langid_model_path=str(tmp_path / "absent"),
            accuracy=None).collect()
    }
    assert fallback == heuristic

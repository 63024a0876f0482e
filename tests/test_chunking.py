"""Document chunking: handcrafted window semantics, DuckDB parity,
coverage invariants, map-only plan."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_pack_spark.operators.chunking import chunk_documents, chunk_documents_sql
from etl_pack_spark.sources.reader import read_table


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_arithmetic_handcrafted(spark):
    # 10 tokens, chunk 4, overlap 1 -> stride 3: starts 0,3,6 cover all
    text = " ".join(f"t{i}" for i in range(10))
    out = sorted(
        (r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"])
        for r in chunk_documents(_df(spark, [(1, text)]), "doc_id", "text", 4, 1).collect()
    )
    assert out == [
        (0, 4, "t0 t1 t2 t3"),
        (1, 4, "t3 t4 t5 t6"),
        (2, 4, "t6 t7 t8 t9"),
    ]


def test_short_final_and_exact_fit(spark):
    # n == chunk: exactly one window; n == chunk+1: second short window
    t64 = " ".join(f"w{i}" for i in range(64))
    t65 = t64 + " extra"
    out = chunk_documents(
        _df(spark, [(1, t64), (2, t65), (3, ""), (4, None)]), "doc_id", "text"
    )
    got = {(r["doc_id"], r["chunk_idx"]): r["n_chunk_tokens"] for r in out.collect()}
    assert got == {(1, 0): 64, (2, 0): 64, (2, 1): 17}  # empty/null emit nothing


def test_every_token_covered_no_empty_chunks(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, "doc_id", "text", 32, 8)
    stats = chunks.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").alias("sum_t"),
        F.min("n_chunk_tokens").alias("min_t"),
        F.count("*").alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
    ).collect()
    from etl_pack_spark.operators.tokenize import tokens

    n_tok = {r["doc_id"]: r["n"] for r in
             docs.select("doc_id", F.size(tokens("text")).alias("n")).collect()}
    for r in stats:
        n = n_tok[r["doc_id"]]
        # overlap accounting: sum of chunk sizes = n + overlap*(chunks-1)
        assert r["sum_t"] == n + 8 * (r["n_chunks"] - 1), r
        assert r["min_t"] > 0
        assert r["max_idx"] == r["n_chunks"] - 1


def test_oracle_parity_on_fixture(spark, sf_dir):
    got = sorted(map(tuple, chunk_documents(
        read_table(spark, sf_dir, "documents"), "doc_id", "text", 32, 8
    ).collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        chunk_documents_sql("documents", "doc_id", "text", 32, 8)
    ).fetchall()))
    assert len(got) == len(want) > 0
    assert got == want


def test_rejects_bad_overlap(spark):
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(_df(spark, [(1, "a b")]), "doc_id", "text", 8, 8)


def test_map_only_plan(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    plan = (
        chunk_documents(docs, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan

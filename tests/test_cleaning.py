"""C4-style cleaning: line filters, document gates, oracle parity."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from etl_pack_spark.operators.cleaning import c4_clean, c4_clean_sql
from etl_pack_spark.sources.reader import read_table

_GOOD = "this is a perfectly reasonable sentence with many words."
_SHORT = "too short."
_NO_PUNCT = "this line has plenty of words but no terminal punctuation"
_JS = "please enable javascript to view this perfectly long content."


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_line_filters(spark):
    doc = "\n".join([_GOOD, _SHORT, _NO_PUNCT, _JS, _GOOD, _GOOD])
    out = c4_clean(_df(spark, [(1, doc)]), "doc_id", "text").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_lines"] == 6 and r["n_kept"] == 3
    assert r["text_clean"] == "\n".join([_GOOD, _GOOD, _GOOD])


def test_document_gates(spark):
    rows = [
        (1, "\n".join([_GOOD] * 3)),              # survives
        (2, "\n".join([_GOOD] * 2)),              # < min_lines kept
        (3, "\n".join([_GOOD] * 3) + " {"),       # curly brace → code page
        (4, ("lorem ipsum dolor sit amet. " + _GOOD + "\n") + "\n".join([_GOOD] * 3)),
    ]
    kept = {r["id"] for r in c4_clean(_df(spark, rows), "doc_id", "text").collect()}
    assert kept == {1}


def test_badword_gate(spark):
    rows = [(1, "\n".join([_GOOD] * 3)),
            (2, "\n".join([_GOOD] * 3) + "\nthe gruntle word appears in this long sentence here.")]
    kept = {
        r["id"]
        for r in c4_clean(
            _df(spark, rows), "doc_id", "text", badwords=["gruntle"]
        ).collect()
    }
    assert kept == {1}


def test_oracle_parity(spark, sf_dir):
    """Break fixture docs into lines at sentence boundaries on BOTH
    engines, then compare the full cleaned output exactly."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("concat(replace(text, ' data ', '.\\n'), '.')").alias("text"),
    )
    got = sorted(
        map(tuple, c4_clean(docs, "doc_id", "text", min_words=4, min_lines=2).collect())
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents_raw AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, "
        "replace(text, ' data ', '.' || chr(10)) || '.' AS text FROM documents_raw"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                c4_clean_sql("documents", "doc_id", "text", min_words=4, min_lines=2)
            ).fetchall(),
        )
    )
    assert len(got) == len(want) > 0
    assert got == want


def test_map_only_plan(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    plan = (
        c4_clean(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # cleaning must not shuffle

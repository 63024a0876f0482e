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


# ---------------------------------------------------------------------------
# Gopher quality gates
# ---------------------------------------------------------------------------

def test_gopher_gates_planted_docs(spark):
    from etl_pack_spark.operators.cleaning import gopher_signals

    prose = ("the cat and the dog have come to sit with us by the fire and "
             "that is fine because we have time to spare today " * 3)
    symbols = "# " * 60 + "the and of to be that have with more words here"
    numbers = " ".join(str(i) for i in range(80))
    short = "the end."
    df = _df(spark, [(1, prose), (2, symbols), (3, numbers), (4, short), (5, None)])
    out = {r["doc_id"]: r for r in
           gopher_signals(df, "doc_id", "text").collect()}
    assert out[1]["keep"] is True
    assert out[2]["keep"] is False  # symbol ratio
    assert out[3]["keep"] is False  # no alphabetic words / no stopwords
    assert out[4]["keep"] is False  # too few words
    assert out[5]["keep"] is False  # null text
    assert out[1]["stop_hits"] >= 2 and out[1]["n_words"] >= 50


def test_gopher_oracle_parity(spark, sf_dir):
    from etl_pack_spark.operators.cleaning import gopher_signals, gopher_signals_sql

    # paper defaults stay in the operator; the fixture is keyword text,
    # so the framing lowers the stopword/word-count gates to values that
    # split this corpus (parity must hold for ANY thresholds)
    kw = dict(min_words=40, min_stop_hits=1)
    docs = read_table(spark, sf_dir, "documents")
    got = (
        gopher_signals(docs, "doc_id", "text", **kw)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.execute(gopher_signals_sql("documents", "doc_id", "text", **kw))
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    for c in ["n_words", "stop_hits", "keep"]:
        assert (got[c].values == want[c].values).all(), c
    for c in ["mean_word_len", "symbol_ratio", "alpha_word_ratio"]:
        a, b = got[c].astype(float), want[c].astype(float)
        assert ((a == b) | (a.isna() & b.isna())).all(), c
    # the gate must actually discriminate on this corpus
    assert 0 < got["keep"].sum() < len(got)


def test_gopher_map_only_plan(spark, sf_dir):
    from etl_pack_spark.operators.cleaning import gopher_signals

    docs = read_table(spark, sf_dir, "documents")
    plan = (
        gopher_signals(docs, "doc_id", "text")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# Corpus-wide duplicate-line removal
# ---------------------------------------------------------------------------

BOILER = "follow us on social media for more updates"


def test_dedup_lines_keeps_first_occurrence(spark):
    from etl_pack_spark.operators.cleaning import dedup_lines

    df = _df(spark, [
        (1, f"unique one\n{BOILER}"),
        (2, f"{BOILER}\nunique two"),
        (3, BOILER),
    ])
    out = {r["id"]: r for r in dedup_lines(df, "doc_id", "text").collect()}
    assert out[1]["text_clean"] == f"unique one\n{BOILER}"  # first occurrence kept
    assert out[2]["text_clean"] == "unique two"
    assert out[3]["text_clean"] == "" and out[3]["n_kept"] == 0
    assert out[3]["n_lines"] == 1


def test_dedup_lines_drop_all_mode(spark):
    from etl_pack_spark.operators.cleaning import dedup_lines

    df = _df(spark, [(1, f"a\n{BOILER}"), (2, f"{BOILER}\nb")])
    out = {r["id"]: r["text_clean"] for r in
           dedup_lines(df, "doc_id", "text", keep_first=False).collect()}
    assert out == {1: "a", 2: "b"}


def test_dedup_lines_oracle_parity(spark):
    import duckdb
    import pandas as pd

    from etl_pack_spark.operators.cleaning import dedup_lines, dedup_lines_sql

    rows = []
    for i in range(40):
        body = f"document body number {i} with its own wording"
        lines = [body]
        if i % 3 == 0:
            lines.append(BOILER)
        if i % 5 == 0:
            lines = [BOILER, body, "subscribe to our newsletter today"]
        rows.append((i, "\n".join(lines)))
    df = _df(spark, rows)
    got = (
        dedup_lines(df, "doc_id", "text")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("corpus", pd.DataFrame(rows, columns=["doc_id", "text"]))
    want = (
        con.execute(dedup_lines_sql("corpus", "doc_id", "text"))
        .fetchdf().sort_values("id").reset_index(drop=True)
    )
    assert len(got) == len(want) == 40
    for c in ["text_clean", "n_lines", "n_kept"]:
        assert (got[c].values == want[c].values).all(), c


class TestHtmlStrip:
    HTML_DOCS = [
        (1, "<html><head><style>p {color:red}</style></head>"
            "<body><h1>Title</h1><p>First   paragraph &amp; more.</p>"
            "<p>Second&nbsp;one</p><script>var x = '<p>';</script>"
            "<!-- a comment --><div>tail</div></body></html>"),
        (2, "plain text, no markup"),
        (3, "<ul><li>a</li><li>b</li></ul><br/>c &lt;tag&gt; &quot;q&quot; &#39;s&#39;"),
        (4, ""),
        (5, None),
        (6, "<SCRIPT TYPE='text/js'>nested <b>bold</b></SCRIPT>after"),
    ]

    def _frames(self, spark):
        import pandas as pd

        pdf = pd.DataFrame(self.HTML_DOCS, columns=["doc_id", "text"])
        sdf = spark.createDataFrame(pdf.astype(object).where(pd.notnull(pdf), None),
                                    "doc_id long, text string")
        return pdf, sdf

    def test_oracle_parity_on_synthetic_html(self, spark):
        import duckdb

        from etl_pack_spark.operators.cleaning import html_strip, html_strip_sql

        pdf, sdf = self._frames(spark)
        got = sorted(map(tuple, html_strip(sdf, "doc_id", "text").collect()))
        con = duckdb.connect()
        con.register("html_docs", pdf)
        want = sorted(map(tuple, con.execute(
            html_strip_sql("html_docs", "doc_id", "text")).fetchall()))
        assert got == want

    def test_extraction_semantics(self, spark):
        from etl_pack_spark.operators.cleaning import html_strip

        _, sdf = self._frames(spark)
        out = {r["id"]: (r["text_clean"], r["n_lines"])
               for r in html_strip(sdf, "doc_id", "text").collect()}
        assert out[1] == ("Title\nFirst paragraph & more.\nSecond one\ntail", 4)
        assert out[2] == ("plain text, no markup", 1)
        assert out[3] == ("a\nb\nc <tag> \"q\" 's'", 3)
        assert out[4] == ("", 0)
        assert out[5] == (None, None)          # NULL passes through
        assert out[6] == ("after", 1)          # case-insensitive script drop

    def test_fixture_docs_are_nop(self, spark, sf_dir):
        """The fixture corpus has no markup: stripping == whitespace
        collapse, so every doc survives with its token content."""
        from etl_pack_spark.operators.cleaning import html_strip
        from etl_pack_spark.sources.reader import read_table

        docs = read_table(spark, sf_dir, "documents")
        out = html_strip(docs, "doc_id", "text")
        assert out.count() == docs.count()

    def test_map_only_plan(self, spark, sf_dir):
        from etl_pack_spark.operators.cleaning import html_strip
        from etl_pack_spark.sources.reader import read_table

        docs = read_table(spark, sf_dir, "documents")
        plan = html_strip(docs, "doc_id", "text")._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan


class TestHtmlStripEdgeCases:
    """Review-pass regressions: escaped entities, engine-divergent
    whitespace classes, comment-opens inside scripts."""

    def _run_both(self, spark, rows):
        import duckdb
        import pandas as pd

        from etl_pack_spark.operators.cleaning import html_strip, html_strip_sql

        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        sdf = spark.createDataFrame(pdf, "doc_id long, text string")
        got = sorted(map(tuple, html_strip(sdf, "doc_id", "text").collect()))
        con = duckdb.connect()
        con.register("t", pdf)
        want = sorted(map(tuple, con.execute(
            html_strip_sql("t", "doc_id", "text")).fetchall()))
        return got, want

    def test_escaped_entities_decode_once(self, spark):
        rows = [(1, "<p>use &amp;lt; to write a less-than sign</p>"),
                (2, "&amp;nbsp; stays literal too")]
        got, want = self._run_both(spark, rows)
        assert got == want
        out = dict((r[0], r[1]) for r in got)
        assert out[1] == "use &lt; to write a less-than sign"
        assert out[2] == "&nbsp; stays literal too"

    def test_vertical_tab_in_tag_is_engine_identical(self, spark):
        # Java \s matches \x0b, RE2 \s does not — the explicit
        # whitespace class keeps both engines on the generic tag strip
        rows = [(1, "a<br" + chr(11) + ">b"), (2, "c<br >d<br\t/>e")]
        got, want = self._run_both(spark, rows)
        assert got == want
        out = dict((r[0], (r[1], r[2])) for r in got)
        assert out[2] == ("c\nd\ne", 3)   # real whitespace still a break

    def test_comment_open_inside_script_does_not_leak_code(self, spark):
        rows = [(1, "<script>if(a<!--b){x()}</script><p>t-->u</p>")]
        got, want = self._run_both(spark, rows)
        assert got == want
        text = got[0][1]
        assert "if(a" not in text and "x()" not in text
        assert "u" in text


def test_normalize_strips_c1_mojibake(spark):
    from etl_pack_spark.operators.textops import normalize_text, normalize_text_sql
    import duckdb
    import pandas as pd

    rows = [(1, "a" + chr(0x85) + "b" + chr(0x92) + "c"), (2, "café")]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    sdf = spark.createDataFrame(pdf, "doc_id long, text string")
    got = sorted(map(tuple, normalize_text(sdf, "doc_id", "text").collect()))
    con = duckdb.connect()
    con.register("t", pdf)
    want = sorted(map(tuple, con.execute(
        normalize_text_sql("t", "doc_id", "text")).fetchall()))
    assert got == want
    out = dict(got)
    assert out[1] == "abc"          # C1 strays removed
    assert out[2] == "café"         # multi-byte text untouched


class TestDisposition:
    """r10: per-doc disposition + funnel (the curation-audit grain)."""

    _DOCS = [
        (1, "good line with many words here\nanother fine line of text"),
        (2, "lorem ipsum filler page"),            # doc blocklist
        (3, "short"),                              # every line fails -> min_lines
        (4, "code page { body }"),                 # curly brace -> blocklist
        (5, None),                                 # NULL text
    ]

    def _dispo(self, spark):
        from etl_pack_spark.operators.cleaning import c4_disposition

        df = spark.createDataFrame(self._DOCS, "doc_id long, text string")
        return c4_disposition(
            df, "doc_id", "text", min_words=3, min_lines=1,
            require_terminal=False,
        )

    def test_stages_and_survivor_slice(self, spark):
        from etl_pack_spark.operators.cleaning import c4_clean

        got = {r["id"]: r for r in self._dispo(spark).collect()}
        assert got[1]["drop_stage"] is None and got[1]["n_kept"] == 2
        assert got[2]["drop_stage"] == "doc_blocklist"
        assert got[3]["drop_stage"] == "min_lines"
        assert got[4]["drop_stage"] == "doc_blocklist"  # blocklist wins
        # dropped docs carry NULL text_clean; kept matches c4_clean
        assert got[2]["text_clean"] is None
        df = spark.createDataFrame(self._DOCS, "doc_id long, text string")
        survivors = {
            r["id"]: r["text_clean"]
            for r in c4_clean(
                df, "doc_id", "text", min_words=3, min_lines=1,
                require_terminal=False,
            ).collect()
        }
        assert survivors == {
            r["id"]: r["text_clean"]
            for r in self._dispo(spark).where(
                F.col("drop_stage").isNull()
            ).collect()
        }

    def test_funnel_counts(self, spark):
        from etl_pack_spark.operators.cleaning import curation_funnel

        got = {
            r["stage"]: r["n_docs"]
            for r in curation_funnel(self._dispo(spark)).collect()
        }
        assert got == {"kept": 1, "doc_blocklist": 2, "min_lines": 2}
        assert sum(got.values()) == len(self._DOCS)

    def test_disposition_oracle_parity(self, spark, sf_dir):
        from etl_pack_spark.operators.cleaning import (
            c4_disposition,
            c4_disposition_sql,
            curation_funnel,
            curation_funnel_sql,
        )

        docs = read_table(spark, sf_dir, "documents")
        got = (
            c4_disposition(docs, "doc_id", "text", min_words=10,
                           min_lines=1, require_terminal=False)
            .orderBy("id").collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        dsql = c4_disposition_sql(
            "documents", "doc_id", "text", min_words=10, min_lines=1,
            require_terminal=False,
        )
        want = con.sql(dsql + " ORDER BY id").fetchall()
        assert [tuple(r) for r in got] == want
        got_f = {
            (r["stage"], r["n_docs"])
            for r in curation_funnel(
                c4_disposition(docs, "doc_id", "text", min_words=10,
                               min_lines=1, require_terminal=False)
            ).collect()
        }
        assert got_f == set(con.sql(curation_funnel_sql(dsql)).fetchall())

    def test_disposition_map_only_plan(self, spark, sf_dir):
        from etl_pack_spark.operators.cleaning import c4_disposition

        docs = read_table(spark, sf_dir, "documents")
        plan = (
            c4_disposition(docs, "doc_id", "text")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan and "BatchEvalPython" not in plan


class TestGopherDropReason:
    """r10 rider: drop_reason = first failing gate; keep == NULL reason."""

    def test_reasons_and_invariant(self, spark):
        from etl_pack_spark.operators.cleaning import gopher_signals

        docs = spark.createDataFrame(
            [
                (1, " ".join(["the", "and", "that"] * 20)),  # kept-ish
                (2, "too short"),                            # word_count
                (3, " ".join(["a"] * 60)),                   # word_length (mean 1)
                (4, " ".join(["####why", "#", "#"] * 20)),   # symbols
                (5, None),                                   # empty -> word_count
            ],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in gopher_signals(docs, "doc_id", "text").collect()}
        assert got[2]["drop_reason"] == "word_count"
        assert got[3]["drop_reason"] == "word_length"
        assert got[5]["drop_reason"] == "word_count"
        for r in got.values():
            assert r["keep"] == (r["drop_reason"] is None)

    def test_reason_oracle_parity(self, spark, sf_dir):
        from etl_pack_spark.operators.cleaning import (
            gopher_signals,
            gopher_signals_sql,
        )

        docs = read_table(spark, sf_dir, "documents")
        got = sorted(
            (r["doc_id"], r["keep"], r["drop_reason"])
            for r in gopher_signals(docs, "doc_id", "text").collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        want = sorted(
            (r[0], r[1], r[2])
            for r in con.sql(
                "SELECT doc_id, keep, drop_reason FROM ("
                + gopher_signals_sql("documents", "doc_id", "text")
                + ")"
            ).fetchall()
        )
        assert got == want


def test_badwords_that_cannot_match_are_rejected(spark):
    """r10: tokens are lowercase [a-z0-9]+ runs, and badwords are
    interpolated into generated expressions — a word that can never
    match (or would break the expression) fails loudly in BOTH the
    DataFrame op and the SQL twin."""
    import pytest as _pytest

    from etl_pack_spark.operators.cleaning import (
        c4_clean,
        c4_disposition_sql,
    )

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    for bad in ["Upper", "two words", "don't", "", "naïve"]:
        with _pytest.raises(ValueError, match="never match"):
            c4_clean(df, "doc_id", "text", badwords=[bad])
        with _pytest.raises(ValueError, match="never match"):
            c4_disposition_sql("t", "doc_id", "text", badwords=[bad])
    c4_clean(df, "doc_id", "text", badwords=["slow", "x99"])  # fine

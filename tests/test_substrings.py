"""Corpus-level repeated-substring detection: DuckDB oracle parity,
planted shared passages, short-doc edge, repartition stability."""

from __future__ import annotations

import duckdb

from etl_pack_spark.operators.substrings import (
    repeated_ngram_spans,
    repeated_ngram_spans_sql,
)
from etl_pack_spark.sources.reader import read_table

ROW = ("doc_id", "n_windows", "n_dup_windows", "dup_fraction", "keep")


def _collect(df):
    return sorted(tuple(r[c] for c in ROW) for r in df.collect())


def test_repeated_ngram_spans_oracle_parity(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    got = _collect(repeated_ngram_spans(docs, k=5))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(repeated_ngram_spans_sql("documents", k=5)).fetchall())
    )
    assert got == want
    assert len(got) == docs.count()


def test_planted_shared_passage_detected(spark):
    passage = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [
            (1, f"intro one {passage} outro alpha"),
            (2, f"different start here {passage} and a different ending"),
            (3, "totally unrelated content with no overlap whatsoever in it"),
            (4, "tiny doc"),  # fewer than k tokens -> zero windows
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repeated_ngram_spans(df, k=8).collect()}
    # docs 1 and 2 share a 12-token passage -> both carry duplicated
    # 8-token windows; doc 3 has none; doc 4 has no windows at all
    assert rows[1]["n_dup_windows"] >= 1 and rows[2]["n_dup_windows"] >= 1
    assert rows[3]["n_dup_windows"] == 0 and rows[3]["keep"]
    assert rows[4]["n_windows"] == 0
    assert rows[4]["dup_fraction"] == 0.0 and rows[4]["keep"]
    # a 12-token shared passage contains exactly 5 shared 8-windows;
    # doc 2's window set is larger, so its dup_fraction is lower
    assert rows[1]["dup_fraction"] > rows[2]["dup_fraction"] > 0


def test_gate_drops_mostly_duplicated_doc(spark):
    passage = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, passage + " unique tail"), (2, passage + " other ending")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in
            repeated_ngram_spans(df, k=8, max_dup_fraction=0.5).collect()}
    # both docs are dominated by the shared 20-token passage
    assert not rows[1]["keep"] and not rows[2]["keep"]


def test_repartition_stable(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = _collect(repeated_ngram_spans(docs, k=5))
    b = _collect(repeated_ngram_spans(docs.repartition(13), k=5))
    assert a == b


class TestRemoveRepeatedSpans:
    """ExactSubstr-style excision: keep-first semantics, within-doc
    repetition, NULL/short-doc edges, oracle parity, repartition
    stability."""

    def test_oracle_parity_fixture(self, spark, sf_dir):
        from etl_pack_spark.operators.substrings import (
            remove_repeated_spans,
            remove_repeated_spans_sql,
        )

        docs = read_table(spark, sf_dir, "documents")
        cols = ("doc_id", "clean_text", "n_tokens", "n_removed_tokens")
        got = sorted(
            tuple(r[c] for c in cols)
            for r in remove_repeated_spans(docs, k=5).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{sf_dir}/documents.parquet')"
        )
        want = sorted(
            map(
                tuple,
                con.execute(
                    remove_repeated_spans_sql("documents", k=5)
                ).fetchall(),
            )
        )
        assert got == want and len(got) == docs.count()

    def test_keep_first_and_edges(self, spark):
        from etl_pack_spark.operators.substrings import remove_repeated_spans

        shared = "the quick brown fox jumps over the lazy dog tonight"
        df = spark.createDataFrame(
            [
                (1, f"Alpha begins here. {shared} And ends uniquely one."),
                (2, f"Totally different intro! {shared} plus another tail."),
                (3, "repeat me repeat me repeat me repeat me repeat me"),
                (4, None),
                (5, "short text"),
            ],
            "doc_id long, text string",
        )
        out = {
            r["doc_id"]: r
            for r in remove_repeated_spans(df, k=5).collect()
        }
        # canonical first occurrence (lowest (id, pos)) SURVIVES
        assert shared in out[1]["clean_text"]
        assert out[1]["n_removed_tokens"] == 0
        # every later occurrence is cut
        assert "fox" not in out[2]["clean_text"]
        assert "different intro" in out[2]["clean_text"]
        assert "another tail" in out[2]["clean_text"]
        # WITHIN-doc repetition counts as duplication too (one
        # canonical window span survives)
        assert 0 < out[3]["n_removed_tokens"] < out[3]["n_tokens"]
        # NULL text: NULL out, zero counts; short doc: untouched
        assert out[4]["clean_text"] is None and out[4]["n_tokens"] == 0
        assert out[5]["clean_text"] == "short text"
        assert out[5]["n_removed_tokens"] == 0

    def test_fully_excised_doc_is_empty_string(self, spark):
        from etl_pack_spark.operators.substrings import remove_repeated_spans

        text = "one two three four five"
        df = spark.createDataFrame(
            [(1, text), (2, text)], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in remove_repeated_spans(df, k=5).collect()}
        assert out[1]["clean_text"] == "one two three four five"
        assert out[2]["clean_text"] == ""  # all tokens cut, '' not NULL
        assert out[2]["n_removed_tokens"] == 5

    def test_overlapping_cuts_can_consume_a_canonical(self, spark):
        """Pins the documented union-of-cuts posture: a canonical
        occurrence is never itself SELECTED for removal, but cuts of
        OTHER duplicated windows overlapping it can still remove its
        tokens — so a repeated passage may survive zero times, not
        'exactly once'. Both engines implement the identical rule."""
        import duckdb

        from etl_pack_spark.operators.substrings import (
            remove_repeated_spans,
            remove_repeated_spans_sql,
        )

        rows = [
            (0, "p q r s t"),          # canonical home of 'p q r s t'
            (1, "p q r s t u"),        # canonical home of 'q r s t u'
            (2, "q r s t u v"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r["doc_id"]: r["clean_text"]
            for r in remove_repeated_spans(df, k=5).collect()
        }
        # doc1's copy of 'p q r s t' is cut (pos 0-4), which also
        # consumes tokens 1-4 of the canonical 'q r s t u' at (1,1);
        # doc2's non-canonical copy is cut too -> the passage survives
        # nowhere.
        assert out[0] == "p q r s t"
        assert out[1] == "u" and out[2] == "v"
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW d AS SELECT * FROM (VALUES (0, 'p q r s t'), "
            "(1, 'p q r s t u'), (2, 'q r s t u v')) t(doc_id, text)"
        )
        want = {
            r[0]: r[1]
            for r in con.execute(
                remove_repeated_spans_sql("d", k=5)
            ).fetchall()
        }
        assert want == out

    def test_repartition_stable(self, spark, sf_dir):
        from etl_pack_spark.operators.substrings import remove_repeated_spans

        docs = read_table(spark, sf_dir, "documents")
        a = sorted(
            (r["doc_id"], r["clean_text"])
            for r in remove_repeated_spans(docs, k=5).collect()
        )
        b = sorted(
            (r["doc_id"], r["clean_text"])
            for r in remove_repeated_spans(docs.repartition(13), k=5).collect()
        )
        assert a == b

    def test_k_below_two_rejected(self, spark):
        import pytest

        from etl_pack_spark.operators.substrings import remove_repeated_spans

        df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
        with pytest.raises(ValueError, match="k must be >= 2"):
            remove_repeated_spans(df, k=1)


class TestHotHashPosture:
    """r7 heavy-hitter posture: corpus-wide duplication statistics must
    be map-side-combinable aggregates, never ``... OVER (PARTITION BY
    h)`` windows (which funnel every occurrence of a corpus-hot k-gram
    into one task). Pins the plan shape, oracle parity under a planted
    hot k-gram, and the ``overfull_hashes`` visibility surface."""

    HOT = "all rights reserved contact the webmaster for further details"

    def _hot_corpus(self, spark, n=120):
        # every doc carries the same boilerplate sentence (the license-
        # header shape) plus unique content — the planted hot k-gram
        rows = [
            (i, f"{self.HOT} unique body u{i} v{i} w{i} x{i} y{i} z{i}")
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_no_window_partitioned_by_hash(self, spark, sf_dir):
        from etl_pack_spark.operators.substrings import (
            remove_repeated_spans,
            repeated_ngram_spans,
        )

        docs = read_table(spark, sf_dir, "documents")
        for df in (
            repeated_ngram_spans(docs, k=8),
            remove_repeated_spans(docs, k=8),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            # the only windows allowed are shingling's per-doc lead()s
            for line in plan.splitlines():
                if "windowspecdefinition" not in line:
                    continue
                assert "windowspecdefinition(h#" not in line, line
                assert "windowspecdefinition(doc_id#" in line, line

    def test_planted_hot_kgram_oracle_parity(self, spark):
        import duckdb

        from etl_pack_spark.operators.substrings import (
            remove_repeated_spans,
            remove_repeated_spans_sql,
            repeated_ngram_spans,
            repeated_ngram_spans_sql,
        )

        df = self._hot_corpus(spark)
        pdf = df.toPandas()  # noqa: F841  (registered below)
        con = duckdb.connect()
        con.execute("CREATE VIEW d AS SELECT * FROM pdf")

        got = sorted(
            tuple(r) for r in repeated_ngram_spans(df, k=5).collect()
        )
        want = sorted(
            map(tuple, con.execute(repeated_ngram_spans_sql("d", k=5)).fetchall())
        )
        assert got == want
        # the boilerplate is duplicated everywhere; each doc's unique
        # tail is not
        assert all(r[2] >= 1 for r in got)  # n_dup_windows

        got2 = sorted(
            tuple(r) for r in remove_repeated_spans(df, k=5).collect()
        )
        want2 = sorted(
            map(tuple, con.execute(remove_repeated_spans_sql("d", k=5)).fetchall())
        )
        assert got2 == want2
        by_id = {r[0]: r[1] for r in got2}
        # canonical doc 0 keeps the boilerplate; every other doc loses it
        assert self.HOT in by_id[0]
        assert all("webmaster" not in by_id[i] for i in range(1, 120))
        assert all(f"u{i}" in by_id[i] for i in range(120))

    def test_overfull_hashes_surface(self, spark):
        from etl_pack_spark.operators.substrings import overfull_hashes

        df = self._hot_corpus(spark)
        hot = overfull_hashes(df, k=5, threshold=100).collect()
        # the planted sentence yields hot 5-gram windows (120 > 100
        # occurrences each); the unique tails stay below threshold
        assert len(hot) >= 1
        assert all(r["count"] == 120 for r in hot)
        assert any("webmaster" in r["sample"] for r in hot)
        none = overfull_hashes(df, k=5, threshold=1000).collect()
        assert none == []


class TestStrideSampling:
    """r13 (round-12 VERDICT #7): the content-defined cost/fidelity
    knob — hash-mod window sampling, alignment-invariant where
    position striding is not, stride=1 bit-exact with the r12
    behavior."""

    PASSAGE = ("all rights reserved contact the webmaster for details "
               "about licensing and redistribution of this material")

    def _planted(self, spark):
        rows = [
            (i, f"unique filler number {i} alpha beta {self.PASSAGE} "
                f"gamma delta epsilon tail {i}")
            for i in range(1, 6)
        ] + [
            # per-doc-unique vocabulary: any template suffix shared
            # between "clean" docs would itself be a real duplicate
            (i, " ".join(f"word{i}x{j}" for j in range(14)))
            for i in range(6, 10)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_stride_one_is_default_behavior(self, spark):
        from etl_pack_spark.operators.substrings import repeated_ngram_spans

        docs = self._planted(spark)
        base = sorted(map(tuple, repeated_ngram_spans(docs).collect()))
        s1 = sorted(map(tuple,
                        repeated_ngram_spans(docs, stride=1).collect()))
        assert s1 == base

    def test_recall_matches_sampling_rule_and_long_passages_survive(
            self, spark):
        """Detection under sampling is exactly 'some shared window's
        md5 byte lands in the residue class' — computed independently
        with hashlib and asserted per stride, so the recall curve is
        pinned, not eyeballed. The planted 16-token passage (9 shared
        windows at k=8) must survive moderate strides; per-doc
        n_windows shrinks ~1/stride."""
        import hashlib
        import re

        from etl_pack_spark.operators.substrings import repeated_ngram_spans

        docs = self._planted(spark)
        toks = re.split(r"[^a-z0-9]+", self.PASSAGE.lower())
        shared_bytes = [
            int(hashlib.md5(
                " ".join(toks[i:i + 8]).encode()).hexdigest()[:2], 16)
            for i in range(len(toks) - 8 + 1)
        ]
        base = {r["doc_id"]: r for r in
                repeated_ngram_spans(docs).collect()}
        for stride in (2, 4, 16, 64):
            rep = {r["doc_id"]: r for r in
                   repeated_ngram_spans(docs, stride=stride).collect()}
            # the interior shared windows (context-free: all 5 docs
            # share them) predicted by the independent hash arithmetic
            expect_detected = any(b % stride == 0 for b in shared_bytes)
            planted_hit = all(rep[d]["n_dup_windows"] > 0
                              for d in range(1, 6))
            if expect_detected:
                assert planted_hit, f"stride {stride} lost the passage"
            # clean docs never gain dup windows under sampling
            assert all(rep[d]["n_dup_windows"] == 0 for d in range(6, 10))
            # cost shrinks like the sample: aggregate window count within
            # a factor-2 band of n/stride (binomial spread on small docs)
            tot = sum(r["n_windows"] for r in rep.values())
            tot_base = sum(r["n_windows"] for r in base.values())
            assert tot <= tot_base
            if stride <= 4:
                assert tot >= tot_base // (2 * stride)
        # the shipped fixture's recall knob must really engage at SOME
        # stride by construction of md5 uniformity: 9 windows, bytes
        # pinned here so a tokenization change is caught loudly
        assert any(b % 4 == 0 for b in shared_bytes)

    def test_stride_oracle_parity_and_excision(self, spark, tmp_path):
        import duckdb

        from etl_pack_spark.operators.substrings import (
            remove_repeated_spans,
            remove_repeated_spans_sql,
            repeated_ngram_spans,
            repeated_ngram_spans_sql,
        )

        docs = self._planted(spark)
        path = str(tmp_path / "planted.parquet")
        docs.coalesce(1).write.parquet(path)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW d AS SELECT * "
                    f"FROM read_parquet('{path}/*.parquet')")
        for stride in (1, 4):
            got = sorted(map(tuple, repeated_ngram_spans(
                docs, stride=stride).collect()))
            want = sorted(map(tuple, con.execute(
                repeated_ngram_spans_sql("d", stride=stride)).fetchall()))
            assert got == want, f"detector stride={stride}"
            got_x = sorted(map(tuple, remove_repeated_spans(
                docs, stride=stride).collect()))
            want_x = sorted(map(tuple, con.execute(
                remove_repeated_spans_sql("d", stride=stride)).fetchall()))
            assert got_x == want_x, f"excision stride={stride}"
        # sampled excision removes no MORE than exact excision, and the
        # canonical copy still survives exactly once per detected window
        exact = {r["doc_id"]: r["n_removed_tokens"] for r in
                 remove_repeated_spans(docs).collect()}
        sampled = {r["doc_id"]: r["n_removed_tokens"] for r in
                   remove_repeated_spans(docs, stride=4).collect()}
        assert all(sampled[d] <= exact[d] for d in exact)
        assert sum(sampled.values()) > 0  # the passage is still excised

    def test_stride_validation(self, spark):
        import pytest as _pytest

        from etl_pack_spark.operators.substrings import (
            remove_repeated_spans,
            repeated_ngram_spans,
            repeated_ngram_spans_sql,
        )

        docs = self._planted(spark)
        for bad in (0, -1, 257):
            with _pytest.raises(ValueError, match="stride"):
                repeated_ngram_spans(docs, stride=bad)
            with _pytest.raises(ValueError, match="stride"):
                remove_repeated_spans(docs, stride=bad)
            with _pytest.raises(ValueError, match="stride"):
                repeated_ngram_spans_sql("d", stride=bad)

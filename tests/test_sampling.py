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


class TestMixtureResample:
    WEIGHTS = {"en": 0.5, "fr": 0.3, "de": 0.2}

    def _docs(self, spark, sf_dir):
        from etl_pack_spark.sources.reader import read_table

        return read_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    def test_proportions_and_total(self, spark, sf_dir):
        from etl_pack_spark.operators.sampling import mixture_resample

        docs = self._docs(spark, sf_dir)
        out = mixture_resample(docs, "doc_id", "lang", self.WEIGHTS)
        n = docs.count()
        got = {r["lang"]: r["cnt"] for r in
               out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
        assert set(got) <= set(self.WEIGHTS)
        total = sum(got.values())
        assert abs(total - n) / n < 0.1
        for d, w in self.WEIGHTS.items():
            assert abs(got[d] / total - w) < 0.05, (d, got[d] / total, w)

    def test_deterministic_under_repartition(self, spark, sf_dir):
        from etl_pack_spark.operators.sampling import mixture_resample

        docs = self._docs(spark, sf_dir)
        a = sorted(map(tuple, mixture_resample(docs, "doc_id", "lang", self.WEIGHTS)
                       .select("doc_id", "copy_n").collect()))
        b = sorted(map(tuple, mixture_resample(docs.repartition(13), "doc_id", "lang",
                                               self.WEIGHTS)
                       .select("doc_id", "copy_n").collect()))
        assert a == b

    def test_oracle_parity(self, spark, sf_dir):
        import duckdb

        from etl_pack_spark.operators.sampling import (
            mixture_resample,
            mixture_resample_sql,
        )

        docs = self._docs(spark, sf_dir)
        got = sorted(map(tuple, mixture_resample(docs, "doc_id", "lang", self.WEIGHTS,
                                                 target_total=800)
                         .select("doc_id", "copy_n").collect()))
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * "
            f"FROM read_parquet('{sf_dir}/documents.parquet')"
        )
        want = sorted(map(tuple, con.execute(mixture_resample_sql(
            "documents", "doc_id", "lang", self.WEIGHTS, target_total=800,
            select="doc_id",
        )).fetchall()))
        assert got == want and len(got) > 0

    def test_unlisted_domain_dropped(self, spark):
        from etl_pack_spark.operators.sampling import mixture_resample

        df = spark.createDataFrame(
            [(1, "en"), (2, "xx"), (3, "en")], "doc_id long, lang string"
        )
        out = mixture_resample(df, "doc_id", "lang", {"en": 1.0})
        assert {r["lang"] for r in out.collect()} == {"en"}


def test_budget_select_oracle_parity(spark, sf_dir):
    """Distributed bucketed prefix-sum == DuckDB's naive global window,
    bit-exact (long weights)."""
    import duckdb

    from etl_pack_spark.operators.sampling import budget_select, budget_select_sql
    from etl_pack_spark.sources.reader import read_table

    docs = read_table(spark, sf_dir, "documents")
    total = docs.agg(F.sum("n_chars")).collect()[0][0]
    budget = int(total * 0.3)
    got = sorted(map(tuple, budget_select(
        docs, budget, score_col="n_chars", weight_col="n_chars").collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(budget_select_sql(
        "documents", budget, score_col="n_chars", weight_col="n_chars")).fetchall()))
    assert got == want
    assert 0 < len(got) < docs.count()
    assert max(r[3] for r in got) <= budget


def test_budget_select_bucket_count_invariant(spark, sf_dir):
    """The quantile cuts only affect load balance, never the result:
    1 bucket (plain global window) == 32 buckets (distributed path)."""
    from etl_pack_spark.operators.sampling import budget_select
    from etl_pack_spark.sources.reader import read_table

    docs = read_table(spark, sf_dir, "documents")
    a = sorted(map(tuple, budget_select(
        docs, 50_000, "n_chars", "n_chars", buckets=1).collect()))
    b = sorted(map(tuple, budget_select(
        docs, 50_000, "n_chars", "n_chars", buckets=32).collect()))
    c = sorted(map(tuple, budget_select(
        docs.repartition(9), 50_000, "n_chars", "n_chars", buckets=32).collect()))
    assert a == b == c and len(a) > 0


def test_budget_select_exact_boundary(spark):
    """Prefix semantics at the boundary: a row whose cumulative weight
    EQUALS the budget is kept; the next is cut; NULL score excluded."""
    from etl_pack_spark.operators.sampling import budget_select

    df = spark.createDataFrame(
        [(1, 9.0, 10), (2, 8.0, 10), (3, 7.0, 10), (4, 6.0, 10), (5, None, 10)],
        "doc_id long, quality double, n_tokens long",
    )
    got = sorted(r["doc_id"] for r in budget_select(df, 30, "quality", "n_tokens").collect())
    assert got == [1, 2, 3]
    # ties broken by id: same score -> lower id wins the budget
    df2 = spark.createDataFrame(
        [(10, 5.0, 10), (11, 5.0, 10), (12, 5.0, 10)],
        "doc_id long, quality double, n_tokens long",
    )
    got2 = sorted(r["doc_id"] for r in budget_select(df2, 20, "quality", "n_tokens").collect())
    assert got2 == [10, 11]

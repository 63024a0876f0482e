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


class TestGroupedSplit:
    """Leakage-safe split: near-dup cluster members share one split."""

    def _pairs(self, spark, sf_dir):
        from etl_pack_spark.operators import neardup
        from etl_pack_spark.sources.reader import read_table

        docs = read_table(spark, sf_dir, "documents")
        return docs, neardup.simhash_neardup_pairs(
            docs, "doc_id", "text"
        ).select("id_a", "id_b")

    def test_oracle_parity(self, spark, sf_dir):
        from etl_pack_spark.operators.sampling import (
            grouped_split_assign,
            grouped_split_sql,
        )
        from etl_pack_spark.operators.neardup import simhash_neardup_pairs_sql
        from etl_pack_spark.oracle import duck_connect

        docs, pairs = self._pairs(spark, sf_dir)
        got = sorted(
            (r["doc_id"], r["cluster_id"], r["split"])
            for r in grouped_split_assign(
                docs.select("doc_id", "lang"), pairs
            ).select("doc_id", "cluster_id", "split").collect()
        )
        con = duck_connect(sf_dir)
        want = sorted(map(tuple, con.execute(grouped_split_sql(
            "(SELECT doc_id, lang FROM documents)",
            f"SELECT id_a, id_b FROM ({simhash_neardup_pairs_sql('documents', 'doc_id', 'text')})",
            select="d.doc_id",
        )).fetchall()))
        assert got == want
        assert len(got) == docs.count()

    def test_cluster_members_share_split(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from etl_pack_spark.operators.sampling import grouped_split_assign

        docs, pairs = self._pairs(spark, sf_dir)
        out = grouped_split_assign(docs, pairs)
        bad = (
            out.groupBy("cluster_id")
            .agg(F.countDistinct("split").alias("k"))
            .where(F.col("k") > 1)
            .count()
        )
        assert bad == 0
        # and the near-dup edges themselves never straddle splits
        s = out.select("doc_id", "split")
        joined = (
            pairs.join(s.withColumnsRenamed({"doc_id": "id_a", "split": "sa"}), "id_a")
            .join(s.withColumnsRenamed({"doc_id": "id_b", "split": "sb"}), "id_b")
        )
        assert joined.where(F.col("sa") != F.col("sb")).count() == 0
        # all three splits exist and every doc is assigned exactly once
        assert out.count() == docs.count()
        assert {r["split"] for r in out.select("split").distinct().collect()} == {
            "train", "val", "test"
        }

    def test_append_stable_for_unmerged_groups(self, spark, sf_dir):
        """Splitting half the corpus, then the whole corpus, gives the
        same assignment for groups whose membership didn't change."""
        from pyspark.sql import functions as F

        from etl_pack_spark.operators.sampling import grouped_split_assign

        docs, pairs = self._pairs(spark, sf_dir)
        half_docs = docs.where(F.col("doc_id") % 2 == 0)
        half_ids = {r["doc_id"] for r in half_docs.select("doc_id").collect()}
        half_pairs = pairs.where(
            F.col("id_a").isin(half_ids) & F.col("id_b").isin(half_ids)
        )
        first = {
            r["doc_id"]: (r["cluster_id"], r["split"])
            for r in grouped_split_assign(half_docs, half_pairs).collect()
        }
        full = {
            r["doc_id"]: (r["cluster_id"], r["split"])
            for r in grouped_split_assign(docs, pairs).collect()
        }
        moved = {
            d for d, v in first.items()
            # a doc may move ONLY if its cluster changed (an edge to an
            # odd doc merged its group)
            if full[d] != v and full[d][0] == v[0]
        }
        assert moved == set()


class TestDomainCap:
    def test_oracle_parity(self, spark, sf_dir):
        from etl_pack_spark.operators.sampling import domain_cap, domain_cap_sql
        from etl_pack_spark.oracle import duck_connect
        from etl_pack_spark.sources.reader import read_table

        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        )
        got = sorted(map(tuple, domain_cap(
            docs, "doc_id", "source", "n_chars", max_per_domain=40
        ).collect()))
        want = sorted(map(tuple, duck_connect(sf_dir).execute(domain_cap_sql(
            "(SELECT doc_id, source, n_chars FROM documents)",
            "doc_id", "source", "n_chars", max_per_domain=40,
        )).fetchall()))
        assert got == want
        assert len(got) > 0

    def test_cap_holds_and_keeps_best(self, spark):
        from pyspark.sql import functions as F

        from etl_pack_spark.operators.sampling import domain_cap

        rows = [(i, "big" if i < 100 else "small", float(i)) for i in range(110)]
        df = spark.createDataFrame(rows, "doc_id long, source string, score double")
        out = domain_cap(df, "doc_id", "source", "score", max_per_domain=5)
        by_dom = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        assert by_dom == {"big": 5, "small": 5}
        # the big domain keeps its TOP scores (95..99), rank 1 = best
        kept = {r["doc_id"]: r["domain_rank"] for r in out.where(
            F.col("source") == "big").collect()}
        assert set(kept) == {95, 96, 97, 98, 99}
        assert kept[99] == 1

    def test_repartition_invariant(self, spark, sf_dir):
        from etl_pack_spark.operators.sampling import domain_cap
        from etl_pack_spark.sources.reader import read_table

        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        )
        a = sorted(map(tuple, domain_cap(docs, "doc_id", "source", "n_chars", 40).collect()))
        b = sorted(map(tuple, domain_cap(
            docs.repartition(13), "doc_id", "source", "n_chars", 40).collect()))
        assert a == b

    def test_unscored_falls_back_to_id_order(self, spark):
        from etl_pack_spark.operators.sampling import domain_cap

        rows = [(i, "d") for i in range(10)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        got = sorted(r["doc_id"] for r in domain_cap(
            df, "doc_id", "source", None, max_per_domain=3).collect())
        assert got == [0, 1, 2]

"""Connected components + cluster dedup — including a DuckDB
recursive-CTE oracle check over the real minhash pair output (the same
rigor as the driver's gate, run in-process because the driver's query
registry is capped)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from etl_pack_spark.operators.components import (
    cluster_dedup,
    connected_components,
    connected_components_sql,
    neardup_clusters,
)
from etl_pack_spark.operators.neardup import minhash_lsh_dedup_pairs
from etl_pack_spark.sources.reader import read_table


def _edges(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def test_two_components(spark):
    # {1,2,3} chained, {10,11}, and a cycle {20,21,22}
    edges = _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 20)])
    got = {(r["id"], r["cluster_id"]) for r in connected_components(edges).collect()}
    assert got == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_long_chain_converges(spark):
    # path graph 0-1-2-...-12: worst-case diameter for label propagation
    edges = _edges(spark, [(i, i + 1) for i in range(12)])
    out = connected_components(edges)
    assert {r["cluster_id"] for r in out.collect()} == {0}
    assert out.count() == 13


def test_max_iter_raises(spark):
    edges = _edges(spark, [(i, i + 1) for i in range(8)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_iter=1, method="distributed")


def test_oracle_parity_on_real_pairs(spark, sf_dir):
    """Spark labeling == DuckDB recursive-CTE labeling over the actual
    minhash near-dup pairs of the documents fixture."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_dedup_pairs(docs, "doc_id", "text")
    got = sorted(
        (r["doc_id"], r["cluster_id"])
        for r in neardup_clusters(pairs, "doc_id").collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    pairs_pdf = pairs.select("id_a", "id_b").toPandas()
    con.register("pairs_tbl", pairs_pdf)
    want = sorted(
        map(tuple, con.execute(
            connected_components_sql("SELECT id_a, id_b FROM pairs_tbl")
        ).fetchall())
    )
    assert got == want
    assert len(got) > 0


def test_cluster_dedup_keeps_one_per_cluster(spark):
    docs = spark.range(10).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("d"), F.col("id")).alias("text")
    )
    pairs = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    kept = sorted(r["doc_id"] for r in cluster_dedup(docs, pairs, "doc_id").collect())
    # clusters {1,2,3}→1 and {7,8}→7 survive once; 0,4,5,6,9 untouched
    assert kept == [0, 1, 4, 5, 6, 7, 9]


def test_driver_and_distributed_paths_agree(spark, sf_dir):
    from etl_pack_spark.operators import neardup
    from etl_pack_spark.sources.reader import read_table

    docs = read_table(spark, sf_dir, "documents")
    pairs = neardup.simhash_neardup_pairs(docs, "doc_id", "text").select(
        "id_a", "id_b"
    ).persist()
    a = sorted(map(tuple, connected_components(pairs, method="driver").collect()))
    b = sorted(map(tuple, connected_components(pairs, method="distributed").collect()))
    assert a == b and len(a) > 0
    pairs.unpersist()


def test_distributed_loop_reuses_edge_exchange(spark):
    """The static bidirectional edge frame is repartitioned by the
    join key BEFORE its persist, so each min-label iteration's join
    satisfies the edge-side distribution straight from the cache —
    only the labels frame shuffles per iteration. The plan above the
    edge-side InMemoryTableScan must contain no Exchange."""
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(200)], "id_a long, id_b long"
        )
        fwd = edges.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        rev = edges.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
        # the exact build connected_components uses
        bi = fwd.union(rev).distinct().repartition(F.col("v")).persist()
        try:
            bi.count()
            labels = (
                bi.select(F.col("u").alias("id")).distinct()
                .select("id", F.col("id").alias("cluster_id"))
            )
            j = bi.join(labels.withColumnRenamed("id", "v"), "v")
            plan = j._jdf.queryExecution().executedPlan().toString()
            # top-level tree only (the cached relation prints its own
            # build plan, whose exchanges ran once and are irrelevant)
            top = []
            for line in plan.splitlines():
                if "InMemoryRelation" in line:
                    break
                top.append(line)
            scan_at = next(
                i for i, l in enumerate(top) if "InMemoryTableScan" in l
            )
            join_side = "\n".join(top[:scan_at])
            assert "InMemoryTableScan" in top[scan_at]
            assert "Exchange" not in join_side, join_side
        finally:
            bi.unpersist()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


class TestSurvivorBy:
    """r7 quality-aware survivor selection: cluster_dedup(survivor_by=)
    keeps the highest-scoring member per near-dup cluster (min-id
    tie-break; NULL scores lowest; all-NULL cluster falls back to
    min-id), pinned against a DuckDB twin of the same rule."""

    def _frames(self, spark):
        # clusters: {1,2,3} (scores 5, 9, 9 -> winner 2: max score, min
        # id tie-break), {10,11} (scores NULL, 4 -> winner 11),
        # {20,21} (both NULL -> min id 20); 30 untouched (no pair)
        docs = spark.createDataFrame(
            [(1, 5.0), (2, 9.0), (3, 9.0), (10, None), (11, 4.0),
             (20, None), (21, None), (30, 7.0)],
            "doc_id long, quality double",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11), (20, 21)], "id_a long, id_b long"
        )
        return docs, pairs

    def test_best_quality_survives(self, spark):
        from etl_pack_spark.operators.components import cluster_dedup

        docs, pairs = self._frames(spark)
        kept = {r["doc_id"] for r in
                cluster_dedup(docs, pairs, survivor_by="quality").collect()}
        assert kept == {2, 11, 20, 30}
        # default rule unchanged: min id survives
        kept_min = {r["doc_id"] for r in cluster_dedup(docs, pairs).collect()}
        assert kept_min == {1, 10, 20, 30}

    def test_duckdb_twin_same_rule(self, spark):
        """The survivor rule is plain SQL over the components labels —
        pin Spark against DuckDB computing winners the same way."""
        import duckdb

        from etl_pack_spark.operators.components import (
            cluster_dedup,
            connected_components_sql,
        )

        docs, pairs = self._frames(spark)
        got = sorted(
            r["doc_id"]
            for r in cluster_dedup(docs, pairs, survivor_by="quality").collect()
        )
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE docs(doc_id BIGINT, quality DOUBLE);"
            "INSERT INTO docs VALUES (1,5.0),(2,9.0),(3,9.0),(10,NULL),"
            "(11,4.0),(20,NULL),(21,NULL),(30,7.0);"
            "CREATE TABLE pairs(id_a BIGINT, id_b BIGINT);"
            "INSERT INTO pairs VALUES (1,2),(2,3),(10,11),(20,21);"
        )
        comp = connected_components_sql("SELECT id_a, id_b FROM pairs")
        want = sorted(
            r[0] for r in con.execute(f"""
            WITH comp AS ({comp}),
            members AS (
                SELECT d.doc_id, c.cluster_id,
                       COALESCE(d.quality, CAST('-inf' AS DOUBLE)) AS s
                FROM docs d JOIN comp c ON d.doc_id = c.id
            ),
            winners AS (
                SELECT cluster_id, MIN(doc_id) AS win FROM members m
                WHERE s = (SELECT MAX(s) FROM members b
                           WHERE b.cluster_id = m.cluster_id)
                GROUP BY cluster_id
            )
            SELECT doc_id FROM docs
            WHERE doc_id NOT IN (
                SELECT m.doc_id FROM members m JOIN winners w
                  ON m.cluster_id = w.cluster_id AND m.doc_id != w.win)
            """).fetchall()
        )
        assert got == want

    def test_broadcasts_are_guarded(self, spark, monkeypatch):
        """r8 (round-7 VERDICT #1): cluster_dedup's joins broadcast
        ONLY when a bounded probe proves the clusters frame small —
        past the bound nothing is hinted, so at crawl scale (losers =
        30-50% of the corpus) the planner picks a shuffled join
        instead of OOMing on a forced corpus-fraction broadcast."""
        from pyspark.sql import functions as F

        from etl_pack_spark.operators import guards
        from etl_pack_spark.operators.components import cluster_dedup

        docs = spark.createDataFrame(
            [(i, float(i % 7)) for i in range(40)], "doc_id long, q double"
        )
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 20, 2)], "id_a long, id_b long"
        )
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        # threshold -1: the ONLY way a broadcast join appears is our
        # explicit hint, so the assertions test the guard, not the
        # planner's own size estimate
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            small = cluster_dedup(docs, pairs, survivor_by="q")
            plan = small._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" in plan  # proven small -> hinted

            monkeypatch.setattr(guards, "MAX_BROADCAST_MODEL_ROWS", 0)
            # r16: the proven-small path persists its members frame;
            # without clearing, the unhinted variant's plan MATCHES
            # that cache (hint-insensitive cache lookup) and the
            # printed InMemoryRelation build plan still shows the
            # hinted join — clear so the assertion sees the fresh
            # unhinted planning, which is what this test pins
            spark.catalog.clearCache()
            big = cluster_dedup(docs, pairs, survivor_by="q")
            plan2 = big._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan2  # past bound -> unhinted
            assert "CartesianProduct" not in plan2
            # strategy must not change RESULTS
            assert sorted(r["doc_id"] for r in small.collect()) == sorted(
                r["doc_id"] for r in big.collect()
            )
            # default (min-id) path guards its loser anti-join the same way
            plain = cluster_dedup(docs, pairs)
            plan3 = plain._jdf.queryExecution().executedPlan().toString()
            assert "BroadcastHashJoin" not in plan3
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_pretrain_plan_passes_survivor_by(self, spark, sf_dir):
        """The composed plan honors survivor_by (n_chars: keep the
        longest copy) and still satisfies its output contract."""
        from etl_pack_spark.plans.pretrain import prepare_pretraining_corpus
        from etl_pack_spark.sources.reader import read_table

        docs = read_table(spark, sf_dir, "documents")
        out = prepare_pretraining_corpus(docs, survivor_by="n_chars")
        rows = out.limit(5).collect()
        assert len(rows) > 0
        assert {"doc_id", "pack_id", "oversize"} <= set(out.columns)


class TestUpdateClusters:
    """r8 incremental cluster maintenance: folding new pairs into an
    existing labeling must equal relabeling the full pair history —
    including merges of previously separate clusters — while touching
    only label-edges + the new batch."""

    def test_matches_full_history(self, spark):
        from etl_pack_spark.operators.components import (
            connected_components,
            update_clusters,
        )

        hist = _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 21)])
        labels = connected_components(hist)
        # the new batch extends {1,2,3}, MERGES {10,11} with {20,21},
        # and opens a brand-new cluster {30,31}
        new = _edges(spark, [(3, 4), (11, 20), (30, 31)])
        got = sorted(map(tuple, update_clusters(labels, new).collect()))
        want = sorted(map(tuple, connected_components(
            _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 21),
                           (3, 4), (11, 20), (30, 31)])
        ).collect()))
        assert got == want
        # untouched components keep their canonical labels bit-for-bit
        d = dict(got)
        assert d[20] == d[21] == d[10] == d[11] == 10  # merged -> min id
        assert d[1] == d[4] == 1
        assert d[30] == d[31] == 30

    def test_method_passthrough_matches_auto(self, spark):
        """r16: a caller that bounded the total pair volume passes
        method="driver" straight through the fold — labels must be
        identical to auto mode (the probe-merged path the
        neardup_components slot takes)."""
        from etl_pack_spark.operators.components import (
            connected_components,
            update_clusters,
        )

        hist = _edges(spark, [(1, 2), (2, 3), (10, 11), (20, 21)])
        new = _edges(spark, [(3, 4), (11, 20), (30, 31)])
        base = connected_components(hist, method="driver")
        got = sorted(map(tuple, update_clusters(
            base, new, method="driver"
        ).collect()))
        want = sorted(map(tuple, update_clusters(
            connected_components(hist), new
        ).collect()))
        assert got == want

    def test_iterated_batches_equal_batch_labeling(self, spark, sf_dir):
        """Streaming posture over the real fixture: split the simhash
        pair set into three arbitrary batches, fold them in one at a
        time — the final labeling equals the all-at-once one (and the
        DuckDB recursive-CTE oracle agrees via the existing parity
        machinery)."""
        from pyspark.sql import functions as F

        from etl_pack_spark.operators import neardup
        from etl_pack_spark.operators.components import (
            connected_components,
            update_clusters,
        )
        from etl_pack_spark.sources.reader import read_table

        docs = read_table(spark, sf_dir, "documents")
        pairs = neardup.simhash_neardup_pairs(docs, "doc_id", "text") \
            .select("id_a", "id_b").persist()
        try:
            full = sorted(map(tuple, connected_components(pairs).collect()))
            labels = None
            for i in range(3):
                batch = pairs.where(F.pmod(F.col("id_a"), F.lit(3)) == i)
                labels = (
                    connected_components(batch)
                    if labels is None
                    else update_clusters(labels, batch)
                )
            got = sorted(map(tuple, labels.collect()))
            assert got == full and len(got) > 0
        finally:
            pairs.unpersist()

    def test_registry_slot_split_exercises_cross_batch_merges(
        self, spark, sf_dir
    ):
        """r9: the live ``neardup_components`` slot computes its
        labeling through the fold (batch1 components, then
        update_clusters with batch2, split on (id_a+id_b) parity).
        That gate is only as strong as the split — pin that at the
        fixture sf the second batch BRIDGES distinct batch-1
        components (a genuine cross-batch cluster merge, not just
        appends), so the driver's oracle hash exercises the merge
        path every round."""
        from pyspark.sql import functions as F

        from etl_pack_spark.operators import neardup
        from etl_pack_spark.operators.components import connected_components
        from etl_pack_spark.sources.reader import read_table

        docs = read_table(spark, sf_dir, "documents")
        pairs = neardup.simhash_neardup_pairs(docs, "doc_id", "text") \
            .select("id_a", "id_b").persist()
        try:
            b1 = pairs.where((F.col("id_a") + F.col("id_b")) % 2 == 0)
            b2 = pairs.where((F.col("id_a") + F.col("id_b")) % 2 == 1)
            l1 = connected_components(b1)
            la = l1.select(F.col("id").alias("id_a"), F.col("cluster_id").alias("ca"))
            lb = l1.select(F.col("id").alias("id_b"), F.col("cluster_id").alias("cb"))
            bridges = b2.join(la, "id_a").join(lb, "id_b").where("ca <> cb")
            # measured 144 at sf0.001 / 159 at sf0.01; any regression
            # to zero would silently weaken the slot's gate
            assert bridges.count() > 0
        finally:
            pairs.unpersist()

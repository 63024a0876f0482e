"""Train/eval contamination detection — synthetic leaks plus a DuckDB
oracle parity check on the documents fixture."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from etl_pack_spark.operators.contamination import (
    contamination_report,
    contamination_report_sql,
    decontaminate,
)
from etl_pack_spark.sources.reader import read_table


def _df(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


LEAK = "the quick brown fox jumps over the lazy dog today"


def test_detects_planted_leak(spark):
    train = _df(spark, [
        (1, f"intro text {LEAK} and more filler words here"),
        (2, "completely unrelated content about spark partitions and shuffles"),
        (3, f"{LEAK} {LEAK}"),  # repeated leak still counts distinct grams
    ])
    evald = _df(spark, [(100, f"benchmark question: {LEAK}")])
    rep = {r["doc_id"]: r["hits"] for r in
           contamination_report(train, evald, n=8).collect()}
    assert 1 in rep and 3 in rep and 2 not in rep
    # doc 3 repeats the leak: distinct-gram hits, so <= doc 1's span count
    assert rep[3] <= rep[1] + 3


def test_decontaminate_drops_flagged(spark):
    train = _df(spark, [
        (1, f"padding {LEAK} padding"),
        (2, "clean document with its own original phrasing throughout"),
    ])
    evald = _df(spark, [(100, LEAK)])
    kept = [r["doc_id"] for r in decontaminate(train, evald, n=8).collect()]
    assert kept == [2]


def test_short_docs_no_grams(spark):
    train = _df(spark, [(1, "too short"), (2, "")])
    evald = _df(spark, [(100, "also short")])
    assert contamination_report(train, evald, n=8).count() == 0


def test_oracle_parity_on_fixture(spark, sf_dir):
    """Self-contamination of the documents fixture against its own
    first 20 docs — guaranteed hits (every doc overlaps itself), checked
    row-for-row against the DuckDB twin."""
    docs = read_table(spark, sf_dir, "documents")
    evald = docs.where(F.col("doc_id") < 20).select("doc_id", "text")
    got = sorted(
        (r["doc_id"], r["hits"])
        for r in contamination_report(docs, evald, n=8).collect()
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * "
        f"FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    con.execute(
        "CREATE VIEW ev AS SELECT doc_id, text FROM documents WHERE doc_id < 20"
    )
    want = sorted(map(tuple, con.execute(
        contamination_report_sql("documents", "ev", n=8)
    ).fetchall()))
    assert got == want
    assert len(got) >= 20  # at minimum the eval docs themselves


def test_decontaminate_broadcast_guarded(spark, monkeypatch):
    """r8 broadcast sweep: the flagged-id anti-join build side grows
    with corpus size for a fixed eval set (a contaminated mirror-crawl
    flags a large corpus fraction), so it routes through
    guards.maybe_broadcast — hinted below the bound, unhinted (AQE
    decides) past it, identical survivors either way."""
    from etl_pack_spark.operators import guards
    from etl_pack_spark.operators.contamination import decontaminate

    train = _df(
        spark,
        [(i, "alpha beta gamma delta epsilon zeta eta theta iota") for i in range(6)]
        + [(100 + i, f"unique text {i} with no overlap at all here ok") for i in range(4)],
    )
    evald = _df(spark, [(999, "alpha beta gamma delta epsilon zeta eta theta iota")])
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        def anti_is_broadcast(df) -> bool:
            # the eval-set SEMI join stays broadcast by construction in
            # both cases; the guarded join is the flagged-id LeftAnti
            plan = df._jdf.queryExecution().executedPlan().toString()
            return any(
                "BroadcastHashJoin" in line and "LeftAnti" in line
                for line in plan.splitlines()
            )

        small = decontaminate(train, evald, n=8)
        assert anti_is_broadcast(small)

        monkeypatch.setattr(guards, "MAX_BROADCAST_MODEL_ROWS", 0)
        big = decontaminate(train, evald, n=8)
        assert not anti_is_broadcast(big)
        assert sorted(r["doc_id"] for r in small.collect()) == sorted(
            r["doc_id"] for r in big.collect()
        ) == [100, 101, 102, 103]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_eval_contamination_per_item(spark):
    """Eval-item grain (r9): a fully-leaked eval item approaches frac 1,
    a clean item reports frac 0 (PRESENT — a rate needs clean rows),
    and n_hit counts distinct grams shared with ANY train doc."""
    from etl_pack_spark.operators.contamination import eval_contamination

    train = _df(spark, [
        (1, f"intro text {LEAK} and more filler words here"),
        (2, "completely unrelated content about spark partitions and shuffles"),
    ])
    evald = _df(spark, [
        (100, LEAK),  # 10 tokens -> 3 distinct 8-grams, all in train doc 1
        (101, "pristine benchmark item with nine unusual zebra xylophone tokens"),
    ])
    rows = {r["doc_id"]: r for r in
            eval_contamination(train, evald, n=8).collect()}
    assert rows[100]["n_grams"] == 3 and rows[100]["n_hit"] == 3
    assert rows[100]["contaminated_frac"] == 1.0
    assert rows[101]["n_hit"] == 0 and rows[101]["contaminated_frac"] == 0.0
    # partial leak: only the grams covering the leaked span hit
    evald2 = _df(spark, [(200, f"{LEAK} with an uncontaminated trailing clause here")])
    r = eval_contamination(train, evald2, n=8).collect()[0]
    assert 0 < r["n_hit"] < r["n_grams"]
    assert 0 < r["contaminated_frac"] < 1


def test_eval_contamination_oracle_parity(spark, sf_dir):
    from etl_pack_spark.operators.contamination import (
        eval_contamination,
        eval_contamination_sql,
    )

    docs = read_table(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 10 != 7)
    evald = docs.where(F.col("doc_id") % 10 == 7)
    got = sorted(map(tuple,
        eval_contamination(train, evald, n=8)
        .select("doc_id", "n_grams", "n_hit", "contaminated_frac").collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(
        "SELECT doc_id, n_grams, n_hit, contaminated_frac FROM ("
        + eval_contamination_sql(
            "(SELECT * FROM documents WHERE doc_id % 10 <> 7)",
            "(SELECT * FROM documents WHERE doc_id % 10 = 7)",
            n=8,
        ) + ")"
    ).fetchall()))
    assert got == want and len(got) > 0
    # every eval doc with >= 1 gram is present (clean ones at frac 0)
    n_eval_with_grams = evald.where(
        F.size(F.split(F.lower("text"), "[^a-z0-9]+")) >= 8
    ).count()
    assert len(got) >= n_eval_with_grams // 2  # loose lower bound

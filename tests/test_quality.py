"""Data-quality expectations + PII redaction + repetition signal."""

from __future__ import annotations

from etl_pack_spark.operators import textops
from etl_pack_spark.operators.quality import (
    expect,
    expect_between,
    expect_no_nulls,
    expect_unique,
    profile,
)
from etl_pack_spark.sources.reader import read_table


def test_expectations_one_pass(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    res = expect(orders, {
        "key_unique": expect_unique("o_orderkey"),
        "key_not_null": expect_no_nulls("o_orderkey"),
        "price_positive": expect_between("o_totalprice", 0, 10_000_000),
        "price_tiny": expect_between("o_totalprice", 0, 10),  # should fail
    })
    assert res["key_unique"] and res["key_not_null"] and res["price_positive"]
    assert not res["price_tiny"]


def test_profile_shape(spark, sf_dir):
    p = profile(read_table(spark, sf_dir, "orders"), ["o_custkey"], ["o_totalprice"]).first()
    assert p["n_rows"] == p["nn_o_custkey"]  # no nulls in fixture
    assert p["min_o_totalprice"] > 0 < p["max_o_totalprice"]


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567"),
         (2, "card 4242-4242-4242-4242 expires soon"),
         (3, "nothing sensitive here")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in textops.redact_pii(df, "doc_id", "text").collect()}
    assert rows[1]["n_email"] == 1 and "<email>" in rows[1]["redacted"]
    assert rows[1]["n_phone"] >= 1 and "<phone>" in rows[1]["redacted"]
    assert rows[2]["n_card"] == 1 and "<card>" in rows[2]["redacted"]
    assert "4242" not in rows[2]["redacted"]
    assert rows[3]["redacted"] == "nothing sensitive here"


def test_repetition_ratio(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam spam spam"),
         (2, "eight totally different words appear right here now")],
        "doc_id int, text string",
    )
    rows = {r["doc_id"]: r for r in
            textops.repetition_ratio(df, "doc_id", "text").collect()}
    assert rows[1]["repetition"] > 0.8   # 6 identical 3-grams
    assert rows[2]["repetition"] == 0.0  # all 3-grams unique

"""Pins of the driver contract itself: registry size (the correctness
driver records only the first 50 entries), oracle-key discipline, and
schema sanity of the entry point."""

from __future__ import annotations

from etl_pack_spark import suite


def test_registry_is_exactly_fifty():
    # >50 would silently drop entries from the correctness gate;
    # <50 wastes driver-checked slots
    assert len(suite.QUERIES) == 50


def test_every_oracle_has_a_query():
    missing = set(suite.ORACLES) - set(suite.QUERIES)
    assert not missing, f"oracles without queries: {missing}"


def test_rows_only_set_is_intentional():
    # r4: every registry entry is oracle-checked — cluster_embeddings'
    # slot upgraded to semantic_dedup, and ann_lsh_neardup gained a
    # bit-exact twin (md5 hyperplanes are deterministic; "approximate"
    # only means sub-unit recall vs brute force)
    rows_only = set(suite.QUERIES) - set(suite.ORACLES)
    assert rows_only == set(), rows_only


def test_no_duplicate_output_aliases(spark, sf_dir):
    """The driver sorts columns by name before hashing — duplicate
    column names in one query's output would corrupt the compare."""
    for name, fn in suite.QUERIES.items():
        cols = fn(spark, sf_dir).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"

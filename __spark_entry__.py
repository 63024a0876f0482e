"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship incremental-dedup load on sf0.001;
``queries()``/``oracle_sql()`` expose the full operator suite from
``etl_pack_spark.suite`` for the DuckDB correctness gate.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from etl_pack_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's
    incremental dedup load (SURVEY §3.4/§7.1) — windowed lineitem scan,
    canonical row hash, anti-join against the target's hash snapshot."""
    return suite.q_x4_incremental_load(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ engine
    extensions). Each callable takes (spark, sf_dir) → DataFrame."""
    return dict(suite.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query key. Keys absent
    here (non-SQL-expressible ops) get the driver's rows-only check."""
    return dict(suite.ORACLES)

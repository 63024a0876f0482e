"""Shared fixture plumbing for local simulations of the driver's
correctness gate: the table list + DuckDB view registration used by
both ``tools/check_oracle.py`` (repr-exact fingerprint, closest to the
real driver) and ``tests/test_registry_merges.py`` (via
:func:`canon_frame`, a 9-dp-rounded compare that surfaces float parity
drift BEFORE the driver's stricter repr compare would). The two
compares are intentionally different strictness levels of the same
gate, sharing the fixture setup so the table universe can't diverge.
"""

from __future__ import annotations

import math

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_connect(sf_dir: str):
    """DuckDB connection with the fixture tables registered as views
    (same names the driver pre-registers)."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon_frame(df, float_dp: int = 9) -> list[tuple]:
    """Driver-style canonicalization of a pandas frame: columns sorted
    by name, floats rounded to ``float_dp`` (tighter than the driver's
    repr compare, so parity failures surface locally first), rows in a
    NULL-safe total order (NULLs first per column)."""
    df = df[sorted(df.columns)]

    def cell(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return round(v, float_dp)
        return v

    rows = [
        tuple(cell(v) for v in row) for row in df.itertuples(index=False, name=None)
    ]
    return sorted(rows, key=lambda r: tuple((v is not None, str(v)) for v in r))

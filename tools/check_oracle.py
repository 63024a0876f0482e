"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and an order-insensitive value fingerprint. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry_mod  # noqa: E402
from etl_pack_spark.oracle import duck_connect  # noqa: E402
from etl_pack_spark.session import get_spark  # noqa: E402


def _fingerprint(df: pd.DataFrame) -> tuple:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical per-cell rendering, then order-insensitive row digest
    def render(v):
        if pd.isna(v):
            return "∅"
        if isinstance(v, float):
            return repr(v)
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return "[" + ",".join(render(x) for x in v) + "]"
        return str(v)

    rows = sorted("|".join(render(v) for v in rec) for rec in df.itertuples(index=False))
    import hashlib

    h = hashlib.md5()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return len(df), tuple(sorted(df.columns)), h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("check_oracle")
    con = duck_connect(sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for unknown in sorted(only - set(queries)):
        print(f"FAIL  {unknown}: no such query key")
        failures += 1
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows (no oracle — rows-only)")
            continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:160]}")
            failures += 1
            continue
        g, e_ = _fingerprint(got), _fingerprint(exp)
        if g == e_:
            print(f"ok    {name}: {g[0]} rows hash={g[2][:12]}")
        else:
            failures += 1
            print(f"FAIL  {name}: spark(rows={g[0]}, cols={g[1]}, h={g[2][:12]}) "
                  f"vs duck(rows={e_[0]}, cols={e_[1]}, h={e_[2][:12]})")
            if g[0] == e_[0] and g[1] == e_[1]:
                merged = pd.concat(
                    [got.reindex(sorted(got.columns), axis=1).head(3),
                     exp.reindex(sorted(exp.columns), axis=1).head(3)]
                )
                print(merged.to_string(max_colwidth=40))
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

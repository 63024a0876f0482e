"""Local simulation of the driver's correctness gate: run a registry
query on Spark and its oracle on DuckDB at the given sf_dir, compare
row count, schema (sorted column names), and canonicalized values
(compare logic shared with tests/test_registry_merges.py via
etl_pack_spark.oracle).

Usage: python tools/driver_sim.py [sf_dir] [key ...]  (default: all)
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from etl_pack_spark import suite
    from etl_pack_spark.oracle import canon_frame, duck_connect
    from etl_pack_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    keys = sys.argv[2:] or [k for k in suite.QUERIES if k in suite.ORACLES]

    spark = get_spark("driver_sim")
    con = duck_connect(sf_dir)

    failures = 0
    for k in keys:
        try:
            got = suite.QUERIES[k](spark, sf_dir).toPandas()
            want = con.execute(suite.ORACLES[k]).fetchdf()
            schema_ok = sorted(c.lower() for c in got.columns) == sorted(
                c.lower() for c in want.columns
            )
            got.columns = [c.lower() for c in got.columns]
            want.columns = [c.lower() for c in want.columns]
            rows_ok = len(got) == len(want)
            vals_ok = canon_frame(got) == canon_frame(want) if schema_ok else False
            status = "OK" if (schema_ok and rows_ok and vals_ok) else "FAIL"
            if status == "FAIL":
                failures += 1
            print(
                f"{status} {k}: rows {len(got)}/{len(want)} "
                f"schema={schema_ok} vals={vals_ok}"
            )
            if not schema_ok:
                print(f"   spark cols: {sorted(got.columns)}")
                print(f"   duck  cols: {sorted(want.columns)}")
            elif not vals_ok:
                a, b = canon_frame(got), canon_frame(want)
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"   first diffs: {diff}")
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"ERR {k}: {type(e).__name__}: {str(e)[:300]}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

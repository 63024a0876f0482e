"""Interleaved ABBA A/B for the two r9 slot riders, run at bench scale.

Attribution harness (bench-discipline rule: any perf claim needs an
INTERLEAVED A/B in one process, cold cache per leg, n>=4): the r9
registry changes put NEW work under two headline slots —
``neardup_components`` now computes its labeling through the
incremental fold, and ``bm25_search`` became the hybrid sparse⊕dense
pipeline. Cross-round diffs of those slots therefore measure the new
semantics, not a regression of the old; this records the same-session
old-vs-new delta so SCALE.md can attribute the move exactly like r8
did for the survivor rider.

Usage: python tools/ab_riders_r9.py [sf_dir] — prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_pack_spark import suite  # noqa: E402
from etl_pack_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("ab_riders_r9")

    def run(fn) -> float:
        spark.catalog.clearCache()
        from etl_pack_spark.operators.cache import _POOL

        for _, d in list(_POOL.items()):
            d.unpersist(False)
        _POOL.clear()
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    pairs = {
        "neardup_components": (
            suite.RETIRED_QUERIES["neardup_components_oneshot"],
            suite.QUERIES["neardup_components"],
        ),
        "bm25_search": (
            suite.RETIRED_QUERIES["bm25_search_plain"],
            suite.QUERIES["bm25_search"],
        ),
    }
    out = {}
    for name, (old, new) in pairs.items():
        # warm both legs once (codegen), then interleave ABBA ABBA
        run(old), run(new)
        olds, news = [], []
        for _ in range(2):
            olds.append(run(old))
            news.append(run(new))
            news.append(run(new))
            olds.append(run(old))
        out[name] = {
            "old_min": round(min(olds), 3),
            "new_min": round(min(news), 3),
            "old_all": [round(x, 3) for x in olds],
            "new_all": [round(x, 3) for x in news],
            "n": len(olds),
        }
    print(json.dumps({"sf_dir": sf_dir, "ab": out}))


if __name__ == "__main__":
    main()

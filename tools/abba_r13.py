"""Interleaved two-tree ABBA: r13 HEAD vs the r12 end state (39a17fd).

The house attribution protocol (SCALE.md r11/r12): both benches' record
numbers this round and last ran on degraded scratch volumes of
DIFFERENT severity, so the 32.5s -> 25.6s headline move is not
interpretable from the records alone. Interleaving fresh-process legs
of the two CODE trees on the SAME box at the SAME time isolates the
code delta from the box: A B B A A B B A, one process per leg, each
leg timing the probe queries once, cold cache, noop sink.

    python tools/abba_r13.py [sf_dir] [n_legs_per_arm]

Writes tools/abba_r13.json with every raw leg sample.
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

QUERIES = ["p2_window", "corpus_curate", "neardup_components",
           "text_signals"]

LEG_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from etl_pack_spark.session import get_spark
from etl_pack_spark import suite
spark = get_spark("abba_leg")
out = {}
for name in %s:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    suite.QUERIES[name](spark, sys.argv[2]).write.format("noop") \
        .mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 3)
print("LEG_RESULT " + json.dumps(out))
""" % json.dumps(QUERIES)


def run_leg(tree: str, sf_dir: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(LEG_SCRIPT)
        script = f.name
    r = subprocess.run(
        [sys.executable, script, tree, sf_dir],
        capture_output=True, text=True, timeout=1200,
    )
    for line in r.stdout.splitlines():
        if line.startswith("LEG_RESULT "):
            return json.loads(line[len("LEG_RESULT "):])
    raise RuntimeError(f"leg failed for {tree}:\n{r.stderr[-2000:]}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    a_tree = str(Path(__file__).resolve().parent.parent)  # r13 HEAD
    b_tree = "/tmp/r12tree"                               # r12 end state
    legs: list[dict] = []
    # A B B A repeated: adjacent pairs see the same ambient window twice
    order = ("A" + "BBAA" * n)[: 2 * n]
    for i, arm in enumerate(order):
        tree = a_tree if arm == "A" else b_tree
        res = run_leg(tree, sf_dir)
        legs.append({"i": i, "arm": arm, **res})
        print(json.dumps(legs[-1]))
    summary = {}
    for q in QUERIES:
        a = [r[q] for r in legs if r["arm"] == "A"]
        b = [r[q] for r in legs if r["arm"] == "B"]
        summary[q] = {
            "A_r13": sorted(a), "B_r12": sorted(b),
            "median_ratio_A_over_B": round(
                statistics.median(a) / statistics.median(b), 3),
        }
    out = {"order": order, "sf_dir": sf_dir, "queries": QUERIES,
           "legs": legs, "summary": summary}
    Path(__file__).with_name("abba_r13.json").write_text(
        json.dumps(out, indent=1) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

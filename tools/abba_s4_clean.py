"""Clean-box interleaved two-tree ABBA (r15 session 4).

Same protocol as tools/abba.py (A=HEAD, B=the r14-verdict tree,
ABBAABBA, one fresh process per leg, cold cache, noop sink) but over
ALL the round's changed headline rows plus the p2_window control —
the round's earlier ABBAs (abba_r15_opt1 / abba_r15_suspects) ran on
ambient-contended windows, so this is the first attribution artifact
of the round taken on a clean box.

Deliberately excluded: ``ann_lsh_neardup`` (265 s/leg in the B tree —
the 0.092x contended ABBA plus the codegen-failure evidence in
OPTIMIZATION_r15.md change 1 already attribute it structurally) and
``dedup_ngram_jaccard`` (never finishes in the B tree; killed at
25 min in the before profile — change 6).

    python tools/abba_s4_clean.py /tmp/r14tree
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

QUERIES = [
    "p2_window",            # control (untouched this round)
    "neardup_components",   # largest row; probe family left alone
    "dedup_simhash_pairs",  # left alone
    "dedup_minhash_lsh",    # left alone
    "bm25_search",          # change 4 (stats ride the postings scan)
    "ann_ivf_topk",         # changes 2/8 (kernel assign, shared coarse)
    "x4_incremental_load",  # change 9 adjudication (H3 probe cost)
    "h3_anti_join",         # change 9 adjudication
    "text_signals",         # change 7 (spread)
    "corpus_curate",        # change 7
    "neardup_embedding",    # change 10 (single-block spread)
]

LEG_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, sys.argv[1])
from etl_pack_spark.session import get_spark
from etl_pack_spark import suite
spark = get_spark("abba_leg")
out = {}
for name in json.loads(sys.argv[3]):
    retired = getattr(suite, "RETIRED_QUERIES", {})
    if name not in suite.QUERIES and name not in retired:
        out[name] = None
        continue
    fn = suite.QUERIES.get(name) or retired[name]
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    fn(spark, sys.argv[2]).write.format("noop").mode("overwrite").save()
    out[name] = round(time.perf_counter() - t0, 3)
print("LEG_RESULT " + json.dumps(out))
"""


def run_leg(tree: str, sf_dir: str, queries: list[str]) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(LEG_SCRIPT)
        script = f.name
    r = subprocess.run(
        [sys.executable, script, tree, sf_dir, json.dumps(queries)],
        capture_output=True, text=True, timeout=1800,
    )
    for line in r.stdout.splitlines():
        if line.startswith("LEG_RESULT "):
            return json.loads(line[len("LEG_RESULT "):])
    raise RuntimeError(f"leg failed for {tree}:\n{r.stderr[-2000:]}")


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    b_tree = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    out_name = sys.argv[4] if len(sys.argv) > 4 else "abba_r15_s4_clean.json"
    a_tree = str(Path(__file__).resolve().parent.parent)
    legs: list[dict] = []
    # counterbalanced at any n (r15 ADVICE: "A" + "BBAA"*n degenerated
    # to plain "AB" at n=1)
    order = ("ABBA" * ((n + 1) // 2))[: 2 * n]
    for i, arm in enumerate(order):
        tree = a_tree if arm == "A" else b_tree
        res = run_leg(tree, sf_dir, QUERIES)
        legs.append({"i": i, "arm": arm, **res})
        print(json.dumps(legs[-1]), flush=True)
    summary = {}
    for q in QUERIES:
        a = [r[q] for r in legs if r["arm"] == "A" and r.get(q) is not None]
        b = [r[q] for r in legs if r["arm"] == "B" and r.get(q) is not None]
        summary[q] = {
            "A_head": sorted(a), "B_base": sorted(b),
            "median_ratio_A_over_B": (
                round(statistics.median(a) / statistics.median(b), 3)
                if a and b else None
            ),
        }
    out = {"order": order, "sf_dir": sf_dir, "a_tree": a_tree,
           "b_tree": b_tree, "queries": QUERIES, "legs": legs,
           "summary": summary}
    Path(__file__).with_name(out_name).write_text(
        json.dumps(out, indent=1) + "\n")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

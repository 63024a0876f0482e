"""Generate PLANS.md: the formatted physical plan of each headline
query with a one-paragraph audit note. Regenerate after plan-shaping
changes:

    python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from etl_pack_spark.session import get_spark  # noqa: E402
from etl_pack_spark import suite  # noqa: E402

# query -> what a reviewer should see in the plan
NOTES = {
    "p2_window": (
        "Projection and the BETWEEN window both reach the parquet scan: "
        "`PushedFilters` carries the range predicate and `ReadSchema` is "
        "pruned to the four projected columns. On a date-partitioned lake "
        "the same predicate prunes partitions before I/O."
    ),
    "h1_row_hash": (
        "The canonical row hash is a single codegen'd projection over the "
        "scan — hashing N TB is a map-only pass, no shuffle, no Python."
    ),
    "x4_incremental_load": (
        "The incremental load: pushed window filter on the source scan, "
        "snapshot hashes reduced by a partial-aggregated distinct, then ONE "
        "left-anti join that AQE converts to broadcast when the snapshot "
        "side is small (the typical day-increment case)."
    ),
    "agg_pricing_summary": (
        "TPC-H Q1 shape: two HashAggregate nodes (map-side partial + "
        "final) so the exchange carries constant-size aggregation state, "
        "not raw rows; money math in DECIMAL inside the aggregate."
    ),
    "join_revenue_by_nation": (
        "Star join: every dimension side is BroadcastHashJoin — the fact "
        "table never shuffles for the joins, only for the final group-by."
    ),
    "dedup_minhash_lsh": (
        "Signatures are one codegen'd hash-aggregate over exploded "
        "shingle rows (map-side-combined min per hash function — the "
        "exchange carries 16 longs per doc). The LSH band self-join is an "
        "equi-join on (band, key); exact-Jaccard verification re-shingles "
        "only candidate docs via a broadcast semi-join."
    ),
    "cdc_scd2": (
        "Dedup-per-(key, ts) and the lead() history window share ONE hash "
        "exchange on the business key: the dedup runs as a lag over the "
        "same partitioning, and its (ts, rest) sort satisfies the lead "
        "window's ts-prefix ordering, so no second sort either. The r5 "
        "snapshot-diff rider derives BOTH reconciliation snapshots from "
        "one conditional aggregate (the four metrics live in one struct "
        "so per-branch pruning cannot split the subtree) and joins the "
        "per-key I/U/D map back by broadcast — never a shuffled "
        "self-join of the event stream."
    ),
    "bm25_search": (
        "r9: the HYBRID pipeline. Sparse arm: postings semi-join down to "
        "the query batch's term union BEFORE any scoring join (r10: the "
        "semi-joined postings persist once — unpersisted, the idf agg "
        "and the scoring join each re-executed the full corpus "
        "tokenize+explode+shuffle), and the "
        "query-term/idf sides (bounded by the batch) ride maybe_broadcast; "
        "per-query ranking is a q_id-partitioned window. Dense arm: the "
        "cosine block kernel (Arrow mapInPandas — MapInPandas/cogroup "
        "nodes, never BatchEvalPython). Fusion: union + ONE combinable "
        "groupBy on (q_id, doc_id) — no join between arms, so an added "
        "arm costs a scan, not a shuffle stage."
    ),
    "c4_clean": (
        "r10: the slot carries the full per-doc DISPOSITION (drop_stage "
        "names the first gate that dropped each doc; c4_clean is the "
        "NULL-stage slice of the same projection). Still one map-only "
        "pass — the audit grain costs no extra scan and no Exchange; "
        "the only non-codegen node is the NFC normalize Arrow UDF "
        "riding the survivors."
    ),
    "contamination_eval": (
        "r9: eval-item grain. The eval-set gram hashes broadcast into "
        "the corpus-side semi-join (train scanned once, never "
        "shuffled); what returns — the train∩eval gram set — is "
        "bounded by the eval set and broadcasts back onto the "
        "per-item left join, so both directions stay benchmark-sized."
    ),
    "text_signals": (
        "Every per-doc text signal in one scan and one WholeStageCodegen "
        "projection chain — zero Exchange nodes, exactly one FileScan."
    ),
    "mixture_resample": (
        "Per-domain counts (map-side-combined over a handful of groups) "
        "broadcast back; the resample is a map-only expression + explode "
        "of sequence(1, copies). The corpus itself never shuffles."
    ),
    "corpus_curate": (
        "r11: the slot is the full per-document disposition grain. One "
        "URL-winner exchange (groupBy min + join over the persisted "
        "canonicalize lineage), then the curate gates fold into one slim "
        "persisted projection (id/lang/verdict/hash — text dropped before "
        "the fan-out) feeding the dropped slice, the exact-dedup "
        "aggregate, and the winner join; every doc exits exactly once."
    ),
    "dedup_simhash_pairs": (
        "Term-frequency weighting runs count-then-weight: md5 and the 64 "
        "bit extractions evaluate once per DISTINCT doc token; the "
        "(id, tok) groupBy reuses the id hash partitioning so it adds NO "
        "extra exchange. Candidate blocks equi-join; hamming verification "
        "touches candidates only."
    ),
    "ann_ivf_topk": (
        "IVF: 16 sampled centroids broadcast (the whitelisted BNLJ is the "
        "deliberate tiny-side cross: 16 rows x corpus); cell assignment is "
        "a map-side struct-max, probe search is a broadcast join on cell "
        "id — the corpus never shuffles for the search."
    ),
    "sessionize": (
        "Session windows: one hash exchange on user_id shared by the "
        "gap-detection lag() and the session aggregation — the classic "
        "sessionization shape with no second shuffle."
    ),
    "lib_unigram_logprob": (
        "The LM is a vocabulary-sized aggregate broadcast back onto the "
        "exploded tokens; both aggregates are map-side combinable — the "
        "corpus-sized flows are map-only."
    ),
    "lib_nb_classifier": (
        "Train and score in one lazy plan: the (token, label) count "
        "aggregate becomes a broadcast model (guarded: past "
        "MAX_BROADCAST_MODEL_ROWS the hint is dropped and AQE plans the "
        "join); scoring is a broadcast join + combinable per-doc sum. No "
        "iterations anywhere in the plan."
    ),
    "lib_dedup_lines": (
        "Line stats are ONE map-side-combinable aggregate keyed by line "
        "md5 (text never rides a shuffle twice); keep-decision is an "
        "equi-join on the hash; reassembly one groupBy(id)."
    ),
    "lib_rolling_aggregate": (
        "One hash exchange on the key + in-partition sort; the RANGE "
        "frame is a streaming pass over the sorted partition."
    ),
    "gopher_signals": (
        "Map-only: every Gopher metric is a higher-order array function "
        "over one projection — zero Exchange at any corpus size."
    ),
    "lib_semantic_dedup": (
        "SemDeDup: nlist centroid rows broadcast for assignment (the "
        "struct-max reduction emits one row per vector map-side), then "
        "ONE hash exchange on cid fans clusters to FlatMapGroupsInPandas "
        "tasks — each vector ships once per cluster, never once per pair."
    ),
    "lib_repeated_ngram_spans": (
        "Duplicated-window detection with NO self-join: shingles stream "
        "through posexplode+lead codegen, md5 to 16 bytes before the "
        "hash-partition window that counts docs per window; the per-doc "
        "rollup partial-combines. The exchange carries hashes, not text."
    ),
    "lib_remove_spans": (
        "Span EXCISION (the REMOVE variant): one hash exchange total for "
        "the duplication analysis — occurrence rows (id, pos, 16-byte "
        "md5) flow into window COUNT + min(struct) OVER (PARTITION BY "
        "h), no groupBy-plus-join-back and no second occurrence scan; "
        "removal positions roll up per doc and the cut itself is codegen "
        "array_except. Text never shuffles except in the final per-doc "
        "join of covered positions back to the corpus."
    ),
    "lib_budget_select": (
        "Exact global running sum with no single-partition window: the "
        "plan shows per-range windows partitioned by the quantile bucket "
        "column plus a tiny buckets-row aggregate — the only global "
        "object is the cuts list, never the data."
    ),
    "split_documents": (
        "Leakage-safe split: the near-dup cluster map (only docs with "
        "edges) joins to the corpus via the bounded broadcast guard; "
        "split assignment is a map-only hash-range CASE — the heavy "
        "stage is the upstream simhash pair pass the pipeline runs "
        "anyway."
    ),
    "chunk_documents": (
        "Map-only: window starts are a sequence() array, windows a "
        "posexplode + slice over one projection — zero Exchange; chunk "
        "rows never carry the full document text, only their slice."
    ),
    "shard_assign": (
        "Map-only md5 arithmetic: shard and order key are pure "
        "functions of the row id — zero Exchange until the writer's "
        "partitionBy(shard) exchange, which is the intended ONE "
        "shuffle of the export."
    ),
    "minhash_match_incremental": (
        "New-batch signatures band-join the (store ∪ new) banding on "
        "(band, key): the exchanges carry 16-long signatures and "
        "16-byte band keys, never document text; the store side reads "
        "pre-computed signatures."
    ),
    "lib_html_strip": (
        "One whole-stage-codegen projection: regex chain + entity "
        "replaces + array line ops — zero Exchange, zero Python."
    ),
    "lib_domain_cap": (
        "Two-phase top-N: window over (domain, input partition) then "
        "over domain — the second exchange carries at most "
        "cap × n_partitions rows per domain, so a megadomain never "
        "funnels its full row count through one task."
    ),
    "lib_normalize_text": (
        "Newline/control steps in codegen; ONE ArrowEvalPython stage "
        "for the NFC composition (no Spark expression exists) — "
        "map-only, no BatchEvalPython, no shuffle."
    ),
    "neardup_components": (
        "Simhash pairs → min-label components → the r8 survivor rider "
        "(`cluster_dedup(survivor_by=)`); r9: the labeling is computed "
        "THROUGH the incremental update_clusters fold (batch-1 "
        "components, batch 2 folded over label-edges ∪ pairs), so the "
        "slot's oracle hash gates the fold. The components loop persists "
        "the bidirectional edge frame repartitioned on the join key, "
        "so each iteration shuffles only the labels; the survivor "
        "joins are hinted ONLY after a bounded probe proves the "
        "clusters frame small (guards posture) — past the bound AQE "
        "plans shuffled joins, so a 30-50%%-dup crawl can never OOM a "
        "forced corpus-fraction broadcast. No CartesianProduct, no "
        "row-at-a-time Python."
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("dump_plans")
    out = [
        "# PLANS — physical-plan audit of the headline queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}` "
        "(regenerate after plan-shaping changes). Each section: what the "
        "plan must show for the operator to hold up at 100 TB, then the "
        "actual `explain(formatted)` output at the fixture scale.",
        "",
    ]
    import contextlib
    import io

    from bench import LIB_QUERIES  # noqa: E402

    for name, note in NOTES.items():
        fn = LIB_QUERIES.get(name) or suite.QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        plan = buf.getvalue()
        out.append(f"## {name}\n")
        out.append(note + "\n")
        out.append("```\n" + plan.strip() + "\n```\n")
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(out)
    )
    print(f"PLANS.md written ({len(NOTES)} queries)")


if __name__ == "__main__":
    main()

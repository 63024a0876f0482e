"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS]. The LAST stdout line is a compact JSON
record (metric/value/unit + headline per-query mins) sized to survive
the driver's tail capture — the r5 full-record line outgrew it and
truncated the headline; the full record (spreads, secondary suite,
probes) is printed on an earlier line AND written to BENCH_FULL.json.

Each query executes fully through the noop sink (no collect cost, no
column-pruning shortcut a count() would allow). First run of the first
query includes JVM/codegen warmup, which mirrors how the driver sees a
cold engine; a warmup toggle exists for local iteration.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from etl_pack_spark.session import get_spark  # noqa: E402
from etl_pack_spark import suite  # noqa: E402

BENCH_QUERIES = [
    "x4_incremental_load",     # flagship: hash + anti-join incremental load
    "h1_row_hash",             # canonical-hash throughput
    "p2_window",               # pushed-down range scan
    # r13 (round-12 VERDICT #1b): moved from LAST to the front third —
    # it is the suite's most persist/scratch-dependent query, and two
    # rounds running its record landed on the degraded tail of a
    # mid-run disk collapse (r12: 9.26s on a 10 MB/s scratch vs the
    # 2.3s clean band), making the number unfalsifiable from the
    # artifact. Early placement puts it under the calibration_pre /
    # third-1 marker band.
    "neardup_components",      # simhash pairs -> transitive clusters (iterative)
    "agg_pricing_summary",     # TPC-H Q1-shaped aggregation
    "join_revenue_by_nation",  # star join + agg
    "window_topk_orders",      # window function
    "stream_window_counts",    # tumbling-window event agg (batch mode)
    "sessionize",              # session windows per user
    "tpch_q5_like",            # 5-way star join
    "text_redact_pii",         # regex scrub pass
    "dedup_minhash_lsh",       # minhash LSH near-dup end-to-end
    "dedup_simhash_pairs",     # simhash signatures + block-match pairs
    "neardup_embedding",       # all-pairs cosine near-dup
    "ann_cosine_topk",         # brute-force cosine top-k
    "ann_ivf_topk",            # IVF-flat ANN (nprobe scale path)
    "text_sentiment",          # broadcast-lexicon sentiment join
    "text_signals",            # ALL per-doc text signals, one scan (was text_quality + text_fingerprint)
    "corpus_curate",           # composed curation pipeline (1 scan, 1 shuffle)
    "bm25_search",             # hybrid retrieval: batch BM25 ⊕ cosine, RRF-fused (r9)
    "cdc_scd2",                # SCD-2 history build (window shuffle)
    "c4_clean",                # C4-recipe cleaning, map-only
]

# Pinned CLEAN-BOX calibration reference (round-12 VERDICT #1a): the
# r11 driver run's marker band — matmul 0.077-0.093s, pyloop
# 0.144-0.177s, disk write 190-452 MB/s (BENCH_r11.json, all seven
# stamps). A marker past ~2x its reference (disk: under a quarter —
# its clean band is wide, its degraded mode is 10-42 MB/s, r12) means
# the box, not the code, is the story: the record carries
# degraded:true and the headline suite re-runs once after a cooldown
# so at least one leg lands on whatever clean window exists.
CALIB_REF = {"matmul_sec": 0.08, "pyloop_sec": 0.16, "disk_write_mbps": 200.0}


def degraded_markers(calib: dict, scratch_ram: bool = False) -> list[str]:
    """The calibration markers outside the pinned clean band — empty
    means this stamp is a clean-box stamp. ``scratch_ram=True`` (r14,
    round-13 VERDICT #1): when the suite being judged runs its Spark
    scratch on a RAM-backed dir, the DISK write marker is box context
    (still recorded beside the number) but no longer a degradation of
    that suite — only the CPU markers can degrade a RAM-scratch run."""
    bad = []
    if calib["matmul_sec"] > 2 * CALIB_REF["matmul_sec"]:
        bad.append("matmul_sec")
    if calib["pyloop_sec"] > 2 * CALIB_REF["pyloop_sec"]:
        bad.append("pyloop_sec")
    if not scratch_ram and calib["disk_write_mbps"] < CALIB_REF["disk_write_mbps"] / 4:
        bad.append("disk_write_mbps")
    return bad


def pick_attempt(attempts: list[dict]) -> dict:
    """Degraded-rerun leg selection (r13 headline, r14 probe2): the leg
    with clean markers wins; when neither or both legs are clean, the
    faster total does. Both legs always ride in the artifact."""
    clean = [a for a in attempts if not a["degraded"]]
    return clean[0] if len(clean) == 1 else min(
        attempts, key=lambda a: a["value"]
    )


# ---- guaranteed-emission machinery (r15, round-14 VERDICT #1) ----
# BENCH_r14.json was rc=124 / parsed:null: the script printed its compact
# record only after EVERY stage (probes + retry legs + cooldowns)
# finished, and the r14 retry ladder pushed the worst-case wall time past
# the driver's budget. Three guarantees now hold by construction:
#   (a) SIGTERM/SIGINT and interpreter exit emit the CURRENT compact
#       record immediately — a record with stages_skipped beats none;
#   (b) an internal deadline (SPARK_GRAFT_BENCH_DEADLINE_SEC, default
#       900s; <=0 disables) is checked between stages, and remaining
#       optional stages are skipped and named in stages_skipped;
#   (c) past half-deadline the retry ladder collapses to at most ONE
#       retry total across headline + probe families, and a retry is
#       never started without wall-clock room for it (its own first
#       leg's measured cost + cooldown + the finalize reserve).

_LIVE: dict = {
    "out": None,          # the record under construction (mutated in place)
    "full_name": "BENCH_FULL.json",
    "emitted": False,
    "stage": "init",      # stage currently executing
    "pending": [],        # stages declared but not yet started/skipped
    "ram_scratch": None,  # tmpfs tree to reap on signal-exit
}


def _emit_compact(reason: str) -> None:
    """Print the compact tail record from the current live state. Called
    exactly once per process: by finalize on success, by the SIGTERM/
    SIGINT handler on a driver kill, or by atexit on an unexpected exit
    path — whichever happens first wins, later calls are no-ops."""
    if _LIVE["emitted"] or _LIVE["out"] is None:
        return
    _LIVE["emitted"] = True
    out = _LIVE["out"]
    if reason != "complete":
        skipped = list(out.get("stages_skipped", []))
        skipped += [s for s in _LIVE["pending"] if s not in skipped]
        cur = _LIVE["stage"]
        if cur not in ("init", "finalize"):
            skipped.append(f"interrupted:{cur}")
        if skipped:
            out["stages_skipped"] = skipped
        # best-effort sidecar for post-mortem — ONLY when main() armed a
        # path (unit tests drive the emitter in-process and must never
        # overwrite the repo's shipped record)
        full = _LIVE.get("full_path")
        if full:
            try:
                Path(full).write_text(json.dumps(out, indent=1) + "\n")
            except OSError:
                pass
    try:
        print(json.dumps(compact_record(out, _LIVE["full_name"])), flush=True)
    except Exception:
        pass  # a broken pipe at kill time must not mask the exit


def _signal_emit(signum, frame):
    """Driver-kill path: emit the record, reap the tmpfs scratch (atexit
    does not run after os._exit), and die promptly. Exiting 124 keeps
    the observable rc identical to a timeout(1) kill — the contract
    delta is purely that stdout now ends with a parseable record."""
    _emit_compact(f"signal:{signum}")
    rs = _LIVE.get("ram_scratch")
    if rs:
        import shutil as _shutil

        _shutil.rmtree(rs, ignore_errors=True)
    try:
        sys.stdout.flush()
    except Exception:
        pass
    os._exit(124)


def _ram_scratch_dir() -> str | None:
    """RAM-backed Spark scratch root for the headline/lib/secondary
    suites (r14, round-13 VERDICT #1): three consecutive rounds lost
    the clean-box headline to a chronically degraded scratch VOLUME,
    not code — and at sf0.1 on a 128 GiB box the suite's shuffle +
    persist footprint fits in memory many times over, so the headline
    number should not depend on the disk at all. Returns a writable
    tmpfs dir with comfortable headroom (>= 24 GB free), else None
    (fall back to the r13 disk-scratch behavior, disk marker armed).
    The deliberately disk-bound probe stages keep real-disk scratch:
    the bench restarts the Spark context on the default local dir
    before them. Override the root with SPARK_GRAFT_BENCH_RAM_SCRATCH
    (a path, or "0" to disable)."""
    import shutil as _shutil

    env = os.environ.get("SPARK_GRAFT_BENCH_RAM_SCRATCH", "")
    if env == "0":
        return None
    root = env or "/dev/shm"
    try:
        if not os.path.isdir(root) or not os.access(root, os.W_OK):
            return None
        if _shutil.disk_usage(root).free < 24e9:
            return None
    except OSError:
        return None
    return root


def _scaled_docs(spark, sf_dir, factor):
    """The documents corpus replicated ``factor``× with remapped unique
    doc_ids — the scaling probe for the text/near-dup family (the
    fixture corpus only grows 10× across the shipped scale factors, so
    extrapolation claims need a third, larger point). Replication is
    the realistic hard case for dedup: every doc gains ``factor-1``
    exact near-duplicates, so candidate volume scales superlinearly
    while signature work scales linearly."""
    from pyspark.sql import functions as F

    from etl_pack_spark.sources.reader import read_table

    docs = read_table(spark, sf_dir, "documents")
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__copy")
    return docs.select("*", copies).select(
        (F.col("doc_id") * factor + F.col("__copy")).alias("doc_id"),
        *[c for c in docs.columns if c != "doc_id"],
    )


def _scale_probe_queries():
    from pyspark.sql import functions as F

    from etl_pack_spark.operators import neardup, substrings, textops
    from etl_pack_spark.operators.components import neardup_clusters

    return {
        "dedup_minhash_lsh": lambda d: neardup.minhash_lsh_dedup_pairs(
            d, "doc_id", "text"
        ),
        "dedup_simhash_pairs": lambda d: neardup.simhash_neardup_pairs(
            d, "doc_id", "text"
        ),
        "neardup_components": lambda d: neardup_clusters(
            neardup.simhash_neardup_pairs(d, "doc_id", "text").select("id_a", "id_b"),
            "doc_id",
        ),
        "text_signals": lambda d: textops.text_signals(d, "doc_id", "text"),
        # the excision op claims LINEAR-in-occurrences scaling (no pair
        # semantics, so no heavy-hitter exposure) — replication is its
        # worst case too (every window duplicated factor×, so ~all
        # occurrences become removal rows) and the probe records the
        # evidence in-artifact
        "remove_spans": lambda d: substrings.remove_repeated_spans(
            d, "doc_id", "text", k=8
        ),
        # r13: the content-defined sampling knob at replication scale —
        # stride=4 must show ~1/4 the exact variant's cost on the same
        # scaled corpus (the knob's standing in-artifact evidence; its
        # correctness contract is the hashlib-pinned recall test)
        "remove_spans_s4": lambda d: substrings.remove_repeated_spans(
            d, "doc_id", "text", k=8, stride=4
        ),
        # planted-hot-k-gram variant (r7): ONE boilerplate sentence
        # prefixed onto every document, so a single hash's occurrence
        # count equals the corpus size — the license-header shape that
        # a PARTITION BY h window would funnel into one task. Bounded
        # growth here is the evidence the combinable-aggregate + AQE-
        # splittable-join formulation holds under maximal key skew.
        "remove_spans_hot": lambda d: substrings.remove_repeated_spans(
            d.select(
                "doc_id",
                F.concat(
                    F.lit(
                        "all rights reserved contact the webmaster "
                        "for further details "
                    ),
                    F.coalesce(F.col("text"), F.lit("")),
                ).alias("text"),
            ),
            "doc_id",
            "text",
            k=8,
        ),
        # planted-hot-bucket simhash variant (r8, round-7 VERDICT #6):
        # the same boilerplate prefix on every document drags short
        # docs toward near-identical signatures, so single block values
        # reach corpus-scale occupancy and the heavy-hitter cap ENGAGES
        # — the standing in-artifact probe of the engaged-cap path
        # (r7's evidence lived only in SCALE.md prose; a regression in
        # the engaged path now shows up by artifact diffing).
        "dedup_simhash_hot": lambda d: neardup.simhash_neardup_pairs(
            d.select(
                "doc_id",
                F.concat(
                    F.lit(
                        "all rights reserved contact the webmaster "
                        "for further details "
                    ),
                    F.coalesce(F.col("text"), F.lit("")),
                ).alias("text"),
            ),
            "doc_id",
            "text",
        ),
        # batch BM25 query-by-example (r10: the retrieval family had
        # never joined a replication probe). Fixed 8-query batch over
        # the scaled corpus: postings build grows linearly with the
        # corpus while per-query candidate sets grow with term
        # frequency — replication is the worst case (every query term's
        # postings list gains factor-1 copies). The persisted `hits`
        # frame (r10) keeps the corpus tokenize+explode single-pass.
        "bm25_batch": _bm25_probe,
        # the composed end-to-end curation plan (curate -> near-dup ->
        # excision -> pack -> splits): single ops scaling well does not
        # prove their COMPOSITION does (shared pooled persists, caps
        # engaging mid-pipeline, excision->simhash husk interaction) —
        # this point records the composed growth in-artifact.
        "pretrain_e2e": _pretrain_probe,
        # the whole-pipeline audit funnel (r11): recomputes each
        # stage's survivor set, so its scaling rides the same near-dup
        # pair graph as the pipeline itself — replication is its worst
        # case too (every doc gains factor-1 near-dups; the disposition
        # must still emit exactly one verdict per doc)
        "pretrain_funnel": _funnel_probe,
    }


def _funnel_probe(d):
    from etl_pack_spark.plans.pretrain import pretrain_funnel

    return pretrain_funnel(d)


def _pretrain_probe(d):
    from etl_pack_spark.plans.pretrain import prepare_pretraining_corpus

    return prepare_pretraining_corpus(d, leakage_safe_split=True)


def _bm25_probe(d):
    from pyspark.sql import functions as F

    from etl_pack_spark.operators.retrieval import bm25_topk_batch

    # a constant 8-query batch regardless of replication factor
    # (TakeOrdered — no shuffle), so growth isolates the corpus side
    q = d.orderBy("doc_id").limit(8).select(
        F.col("doc_id").alias("q_id"), "text"
    )
    return bm25_topk_batch(d, q, "doc_id", "text", k=10, exclude_self=True)


def _scaled_events(spark, sf_dir, factor):
    """The events table replicated ``factor``× with a PLANTED HOT USER
    (r9, round-8 VERDICT #8): copy 0 keeps original user ids; copies
    ≥1 remap each user into a fresh id space EXCEPT the lowest user
    id, which keeps its id in EVERY copy — so one user owns factor×
    any other user's events while the corpus grows factor×. That is
    the realistic skewed-key case for PARTITION BY user window
    functions (one power user / bot account): a naive single-task hot
    partition shows up as superlinear growth here. Timestamps are
    jittered per copy so replicated rows are not byte-identical."""
    from pyspark.sql import functions as F

    from etl_pack_spark.sources.reader import read_table

    events = read_table(spark, sf_dir, "events")
    hot = events.agg(F.min("user_id")).first()[0]
    copies = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("__copy")
    rep = events.select("*", copies)
    return rep.select(
        F.when(
            (F.col("__copy") == 0) | (F.col("user_id") == F.lit(hot)),
            F.col("user_id"),
        ).otherwise(
            F.col("user_id") + F.col("__copy") * F.lit(10_000_000)
        ).alias("user_id"),
        F.timestamp_add("SECOND", F.col("__copy"), F.col("ts")).alias("ts"),
        "value",
        "event_type",
    )


def _events_probe_queries():
    """The two window-function shapes over the hot-user scaled events
    (r9): session windows and per-user top-k — the same PARTITION BY
    user plans as the headline sessionize / window_topk_orders
    queries, measured where a single key owns factor× the rows."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def _sessionize(d):
        return (
            d.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)"))
                .cast("double").alias("sum_value"),
            )
            .select("user_id", F.col("w.start").alias("sess_start"), "n_events")
        )

    def _topk(d):
        w = Window.partitionBy("user_id").orderBy(
            F.col("value").desc(), F.col("ts")
        )
        return (
            d.withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= 3)
            .select("user_id", "ts", "value", "rk")
        )

    return {"sessionize_hotuser": _sessionize, "window_topk_hotuser": _topk}


def _maintenance_probe(spark, sf_dir, factor, n_reps):
    """Ingest→fold→compact cycle cost over a GROWING clusters store
    (r9, round-8 VERDICT #3): three maintenance firings fold three
    equal-size stamped match batches into one persisted clusters
    store, then the shared compactor rewrites it. Flat-ish fold times
    across b1→b3 are the standing in-artifact evidence that the
    fold's input is O(labeled nodes + batch), not O(pair history);
    the compact point prices the store rewrite. Fresh store per rep
    (min over reps is the estimator, like every probe)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from etl_pack_spark.operators import neardup
    from etl_pack_spark.streaming.incremental import (
        compact_signature_store,
        update_cluster_store,
    )

    docs = _scaled_docs(spark, sf_dir, factor).persist()
    pairs = neardup.simhash_neardup_pairs(docs, "doc_id", "text") \
        .select("id_a", "id_b").persist()
    n_pairs = pairs.count()
    docs.unpersist()
    samples: dict[str, list[float]] = {
        "cluster_fold_b1": [], "cluster_fold_b2": [], "cluster_fold_b3": [],
        "cluster_store_compact": [],
    }
    for _ in range(n_reps):
        root = tempfile.mkdtemp(prefix="bench_maint_")
        try:
            clusters = os.path.join(root, "clusters")
            matches = os.path.join(root, "m")
            for i in range(3):
                pairs.where(
                    F.pmod(F.col("id_a") + F.col("id_b"), F.lit(3)) == i
                ).withColumn(
                    "__batch", F.lit(i + 1).cast("long")
                ).write.mode("append").parquet(matches)
                t0 = time.perf_counter()
                update_cluster_store(spark, clusters, matches)
                samples[f"cluster_fold_b{i + 1}"].append(
                    time.perf_counter() - t0
                )
            t0 = time.perf_counter()
            compact_signature_store(spark, clusters, "id")
            samples["cluster_store_compact"].append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(root, ignore_errors=True)
    pairs.unpersist()
    t = {k: round(min(xs), 3) for k, xs in samples.items()}
    s = {k: {"min": round(min(xs), 3), "n": len(xs)} for k, xs in samples.items()}
    return n_pairs, t, s


def _postings_store_probe(spark, sf_dir, n_reps):
    """Query-time postings reuse (r14, round-13 VERDICT #5): three
    standing rows — the one-time postings build+save, the store-backed
    batch BM25 query, and the rebuild-path batch BM25 query over the
    same corpus and queries. The store row beating the rebuild row is
    the in-artifact evidence that a persisted postings store amortizes
    the corpus tokenize+explode+groupBy across firings (at 100 TB the
    rebuild is a full corpus scan per query batch)."""
    import shutil
    import tempfile

    from etl_pack_spark.operators.cache import _POOL
    from etl_pack_spark.operators.postings_store import (
        bm25_topk_batch_store,
        postings_save,
    )
    from etl_pack_spark.operators.retrieval import bm25_topk_batch
    from etl_pack_spark.sources.reader import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    queries = docs.limit(8).select(
        docs.doc_id.alias("q_id"), "text"
    )  # query-by-example: the hybrid arm's shape
    samples: dict[str, list[float]] = {
        "postings_build_save": [], "bm25_query_store": [],
        "bm25_query_rebuild": [],
    }

    def _drop_pool():
        for (_, d) in list(_POOL.items()):
            d.unpersist(False)
        _POOL.clear()

    root = tempfile.mkdtemp(prefix="bench_postings_")
    try:
        store = os.path.join(root, "postings")
        for _ in range(n_reps):
            spark.catalog.clearCache()
            shutil.rmtree(store, ignore_errors=True)
            t0 = time.perf_counter()
            postings_save(spark, docs, store)
            samples["postings_build_save"].append(time.perf_counter() - t0)
            _drop_pool()
            t0 = time.perf_counter()
            bm25_topk_batch_store(spark, store, queries, k=10) \
                .write.format("noop").mode("overwrite").save()
            samples["bm25_query_store"].append(time.perf_counter() - t0)
            _drop_pool()
            t0 = time.perf_counter()
            bm25_topk_batch(docs, queries, "doc_id", "text", k=10) \
                .write.format("noop").mode("overwrite").save()
            samples["bm25_query_rebuild"].append(time.perf_counter() - t0)
            _drop_pool()
    finally:
        shutil.rmtree(root, ignore_errors=True)
    t = {k: round(min(xs), 3) for k, xs in samples.items()}
    s = {k: {"min": round(min(xs), 3), "n": len(xs)} for k, xs in samples.items()}
    return t, s


# round-3 library operators — driver-gated registry entries since r4,
# timed separately so the headline total stays comparable across rounds
LIB_QUERIES = {
    name: suite.QUERIES[name]
    for name in [
        "lib_unigram_logprob",
        "lib_nb_classifier",
        "lib_dedup_lines",
        "lib_rolling_aggregate",
        "gopher_signals",
    ]
}


def _pdf_payload_maker():
    """Factory (shipped by value into executor tasks) that renders a
    document's text into a deterministic multi-page Flate-compressed
    PDF — the lib_pdf_text bench row's corpus-scale payload synth
    (r15, round-14 VERDICT #5: the r14 PDF extractor had no standing
    bench number)."""
    import zlib

    def esc(t: bytes) -> bytes:
        return t.replace(b"\\", b"\\\\") \
                .replace(b"(", b"\\(").replace(b")", b"\\)")

    def make(text, pages: int = 3) -> bytes:
        txt = (text or "").encode("latin-1", "replace") or b"empty"
        step = max(1, -(-len(txt) // pages))
        chunks = [txt[i:i + step] for i in range(0, len(txt), step)]
        chunks += [b"pad"] * (pages - len(chunks))
        objs: dict[int, bytes] = {1: b"<< /Type /Catalog /Pages 2 0 R >>"}
        kids = b" ".join(b"%d 0 R" % (3 + 2 * i) for i in range(pages))
        objs[2] = b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids, pages)
        for i, ch in enumerate(chunks):
            pg, ct = 3 + 2 * i, 4 + 2 * i
            objs[pg] = b"<< /Type /Page /Parent 2 0 R /Contents %d 0 R >>" % ct
            body = zlib.compress(b"BT (%s) Tj ET" % esc(ch))
            objs[ct] = (b"<< /Length %d /Filter /FlateDecode >>"
                        b"\nstream\n%s\nendstream" % (len(body), body))
        out = bytearray(b"%PDF-1.4\n")
        for num in sorted(objs):
            out += b"%d 0 obj\n" % num + objs[num] + b"\nendobj\n"
        out += b"trailer\n<< /Size %d /Root 1 0 R >>\n%%%%EOF\n" % (len(objs) + 1)
        return bytes(out)

    return make


def _lib_extra_queries():
    """Round-4 library operators at bench-scaled framings (the
    registry entries for these ops — driver-gated since r4 wave 2 —
    use fixture-fixed framings; these variants scale nlist/k/budget
    with the bench corpus)."""
    from pyspark.sql import functions as F

    from etl_pack_spark.operators.sampling import budget_select
    from etl_pack_spark.operators.similarity import semantic_dedup
    from etl_pack_spark.operators.substrings import repeated_ngram_spans
    from etl_pack_spark.sources.reader import read_table

    def _semdedup(spark, sf_dir):
        emb = read_table(spark, sf_dir, "embeddings")
        # nlist scaled so clusters stay ~500 rows at any bench sf
        n = emb.count()
        return semantic_dedup(emb, nlist=max(16, n // 500), threshold=0.4)

    def _spans(spark, sf_dir):
        return repeated_ngram_spans(read_table(spark, sf_dir, "documents"), k=8)

    def _remove_spans(spark, sf_dir):
        from etl_pack_spark.operators.substrings import remove_repeated_spans

        return remove_repeated_spans(
            read_table(spark, sf_dir, "documents"), k=8
        )

    def _budget(spark, sf_dir):
        docs = read_table(spark, sf_dir, "documents")
        total = docs.agg(F.sum("n_chars")).collect()[0][0] or 0
        return budget_select(docs, int(total * 0.3), "n_chars", "n_chars")

    def _html(spark, sf_dir):
        from etl_pack_spark.operators.cleaning import html_strip

        return html_strip(read_table(spark, sf_dir, "documents"), "doc_id", "text")

    def _cap(spark, sf_dir):
        from etl_pack_spark.operators.sampling import domain_cap

        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "n_chars"
        )
        return domain_cap(docs, "doc_id", "source", "n_chars", max_per_domain=40)

    def _norm(spark, sf_dir):
        from etl_pack_spark.operators.textops import normalize_text

        return normalize_text(read_table(spark, sf_dir, "documents"), "doc_id", "text")

    def _pretrain(spark, sf_dir):
        # the flagship composition end-to-end: curate -> cluster dedup
        # -> pack, with leakage-safe splits — tracked so regressions in
        # any stage's plan show up in ONE per-round number
        from etl_pack_spark.plans.pretrain import prepare_pretraining_corpus

        docs = read_table(spark, sf_dir, "documents")
        return prepare_pretraining_corpus(docs, leakage_safe_split=True)

    def _url_dedup(spark, sf_dir):
        # the fixture has no URL column; synthesize deterministic
        # crawl-ish URLs (with tracking noise and dup-generating path
        # collisions) so the operator's cost is measured at corpus scale
        from etl_pack_spark.operators.urls import dedup_by_url

        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id", "source",
            F.concat(
                F.lit("http://WWW."), F.col("source"), F.lit(".example.com/p/"),
                (F.col("doc_id") % 500).cast("string"),
                F.lit("/?utm_source=crawl&utm_medium=bot&id="),
                (F.col("doc_id") % 7).cast("string"),
            ).alias("url"),
        )
        return dedup_by_url(docs, "url", "doc_id")

    def _ivf_pq(spark, sf_dir):
        from etl_pack_spark.operators.quantize import ivf_pq_index, ivf_pq_topk
        from etl_pack_spark.sources.reader import read_table as rt

        emb = rt(spark, sf_dir, "embeddings")
        dims = len(emb.select("embedding").first()[0])
        cids, C, books, enc = ivf_pq_index(emb, dims, nlist=16, m=8, k=16)
        return ivf_pq_topk(
            enc, emb.where("vec_id < 50"), cids, C, books, k=5, nprobe=4
        )

    def _bm25_sparse_only(spark, sf_dir):
        # stage decomposition of the hybrid bm25_search slot (r10
        # VERDICT #3): the headline's costliest query fuses three
        # stages (batch BM25, dense cosine, RRF); a regression there
        # is unattributable without per-stage numbers. SAME framing as
        # q_bm25_search's sparse arm — seed docs doc_id < 3, k=20,
        # exclude_self.
        from pyspark.sql import functions as F

        from etl_pack_spark.operators.retrieval import bm25_topk_batch
        from etl_pack_spark.suite import HYBRID_K_EACH

        docs = read_table(spark, sf_dir, "documents")
        q_text = docs.where(F.col("doc_id") < 3).select(
            F.col("doc_id").alias("q_id"), "text"
        )
        return bm25_topk_batch(
            docs, q_text, "doc_id", "text",
            k=HYBRID_K_EACH, exclude_self=True,
        )

    def _dense_only(spark, sf_dir):
        # the hybrid slot's dense arm, same framing as q_bm25_search
        from pyspark.sql import functions as F

        from etl_pack_spark.operators import similarity
        from etl_pack_spark.suite import HYBRID_K_EACH

        emb = read_table(spark, sf_dir, "embeddings")
        q_vec = emb.where(F.col("vec_id") < 3)
        return similarity.cosine_topk(emb, q_vec, k=HYBRID_K_EACH)

    def _datacard(spark, sf_dir):
        # r12: the one-pass dataset-card report at its scale default
        # (sketch quantiles) — scan -> map -> one grouped aggregate
        from etl_pack_spark.operators.quality import corpus_datacard

        return corpus_datacard(read_table(spark, sf_dir, "documents"))

    def _eval_registry_report(spark, sf_dir):
        # r12: registry decontamination report — two benchmark slices
        # registered into a fresh store, whole corpus checked in one
        # scan against both
        import tempfile

        from etl_pack_spark.operators.contamination import (
            register_eval_set,
            registry_contamination_report,
        )

        docs = read_table(spark, sf_dir, "documents")
        store = tempfile.mkdtemp(prefix="bench_evalreg_") + "/reg"
        register_eval_set(spark, docs.where("doc_id % 10 = 7"), store, "s7")
        register_eval_set(spark, docs.where("doc_id % 10 = 3"), store, "s3")
        return registry_contamination_report(spark, docs, store)

    def _pdf_text_corpus(spark, sf_dir):
        # r15 (round-14 VERDICT #5): the r14 PDF extractor's standing
        # row — every document rendered into a 3-page Flate PDF and
        # extracted back, end-to-end through the mapInPandas posture;
        # the synth and the extract ride in ONE map-only plan, so the
        # row prices the extractor at corpus scale with zero exchanges
        import pandas as _pd

        from etl_pack_spark.operators.multimodal import pdf_text

        make = _pdf_payload_maker()
        docs = read_table(spark, sf_dir, "documents")

        def synth(batches):
            for pdf in batches:
                yield _pd.DataFrame({
                    "media_id": pdf["doc_id"],
                    "content": [make(t) for t in pdf["text"]],
                })

        media = docs.select("doc_id", "text").mapInPandas(
            synth, "media_id long, content binary")
        return pdf_text(media)

    _langid = {"path": None}

    def _nb_langid_score(spark, sf_dir):
        # r15 (round-14 VERDICT #5): score the corpus against a planted
        # persisted NB langid model. The model is trained+saved on the
        # FIRST invocation only (closure-cached path), so warmup plants
        # it and the best-of-N row prices store-load + broadcast-join
        # scoring alone — the per-firing cost a deployed classifier pays
        import tempfile

        from etl_pack_spark.operators.classify import (
            langid_model_save,
            language_id_trained,
            nb_langid_train,
        )

        docs = read_table(spark, sf_dir, "documents")
        if _langid["path"] is None:
            path = tempfile.mkdtemp(prefix="bench_langid_") + "/model"
            grams, meta = nb_langid_train(docs, "text", "lang")
            langid_model_save(spark, grams, meta, path)
            _langid["path"] = path
        return language_id_trained(
            docs, "doc_id", "text", _langid["path"])

    def _ngram_jaccard(spark, sf_dir):
        # r15 bench row: the exact-Jaccard baseline's shared-shingle
        # candidate rewrite (the sf0.1 all-pairs BNLJ ran 20+ min
        # single-task before it) — a lib row so the fix trends
        # round-over-round without touching the headline sum
        return suite.QUERIES["dedup_ngram_jaccard"](spark, sf_dir)

    return {
        "lib_ngram_jaccard_exact": _ngram_jaccard,
        "lib_semantic_dedup": _semdedup,
        "lib_repeated_ngram_spans": _spans,
        "lib_pdf_text": _pdf_text_corpus,
        "lib_nb_langid_score": _nb_langid_score,
        "lib_bm25_sparse_only": _bm25_sparse_only,
        "lib_dense_only": _dense_only,
        "lib_remove_spans": _remove_spans,
        "lib_budget_select": _budget,
        "lib_html_strip": _html,
        "lib_domain_cap": _cap,
        "lib_normalize_text": _norm,
        "lib_pretrain_e2e": _pretrain,
        "lib_url_dedup": _url_dedup,
        "lib_ivf_pq_topk": _ivf_pq,
        "lib_corpus_datacard": _datacard,
        "lib_eval_registry_report": _eval_registry_report,
    }


LIB_QUERIES.update(_lib_extra_queries())


def _calibrate() -> dict:
    """Fixed-work ambient-load marker (r7, VERDICT #3): the r6 driver
    snapshot and the builder's same-day best-of-3 disagreed by ~15% —
    more than the documented ±10% ambient band — with no way to tell
    code regression from machine load FROM THE ARTIFACT. This runs two
    deterministic microbenchmarks whose cost is independent of the
    repo's code: a BLAS matmul (contends on all cores, like local[32]
    stages) and a pure-Python loop (single-core contention). Recorded
    before AND after the suite; compare across rounds — a slower suite
    WITH slower calibration is machine load, not code."""
    import numpy as np

    # untimed warmup (r13): the FIRST matmul of a process pays BLAS
    # thread-pool spinup + page faults — r13's local runs showed a cold
    # first stamp 3x the steady-state value, which would trip the
    # degraded detector on a healthy box. Best-of-2 on the CPU markers
    # for the same reason: the stamp measures box health, and a single
    # scheduler hiccup is not box health.
    w = np.random.default_rng(0).random((1024, 1024))
    w = w @ w
    matmul = float("inf")
    for _ in range(2):
        a = np.random.default_rng(0).random((1024, 1024))
        t0 = time.perf_counter()
        for _ in range(8):
            a = a @ a
            a /= np.abs(a).max()
        matmul = min(matmul, time.perf_counter() - t0)
    pyloop = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        s = 0
        for i in range(4_000_000):
            s += i & 7
        pyloop = min(pyloop, time.perf_counter() - t0)
    # disk health: shuffle spills crawl when the scratch volume is
    # near-full or slow, and a CPU-only marker cannot see it (learned
    # the hard way: 74 GB of stale oracle spill files once took the
    # machine to 94% full and tripled the 30x probes). Free space +
    # a small fsync'd write throughput sample attribute that directly.
    import shutil as _shutil
    import tempfile

    free_gb = _shutil.disk_usage(tempfile.gettempdir()).free / 1e9
    blob = b"\xab" * (8 << 20)
    t0 = time.perf_counter()
    with tempfile.NamedTemporaryFile(dir=tempfile.gettempdir()) as f:
        for _ in range(8):  # 64 MB
            f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    wsec = time.perf_counter() - t0
    return {
        "matmul_sec": round(matmul, 3),
        "pyloop_sec": round(pyloop, 3),
        "disk_free_gb": round(free_gb, 1),
        "disk_write_mbps": round(64 / wsec, 0),
    }


def _sweep_scratch() -> dict:
    """Pre-bench scratch hygiene (r8, round-7 VERDICT #7): stale Spark
    scratch dirs from dead JVMs (``spark-*``, ``blockmgr-*``) accumulate
    on the shared volume — 74 GB of stale spills once took the machine
    to 94% full and tripled the 30× probes, and r7's calibration showed
    write throughput collapsing 539→147 MB/s across the suite. Deletes
    only trees whose NEWEST mtime (checked recursively — a live
    session's top-level dir can look old while its shuffle subdirs are
    hot) is over an hour old AND that the current user owns (r9,
    ADVICE: the mtime rule alone could rmtree a concurrent OTHER
    user's live-but-idle session's block-manager dirs and fail its
    tasks mid-run; same-uid dirs idle >1h on this bench box are our
    own dead sessions — a live bench run touches its scratch far more
    often). Opt out entirely with SPARK_GRAFT_SWEEP_SCRATCH=0 when a
    same-user long-idle session must survive. Returns counts for the
    artifact."""
    import glob
    import shutil as _shutil
    import tempfile

    if os.environ.get("SPARK_GRAFT_SWEEP_SCRATCH", "1") == "0":
        return {"dirs_removed": 0, "freed_gb": 0.0, "disabled": True}
    uid = os.getuid()
    root = tempfile.gettempdir()
    cutoff = time.time() - 3600
    freed, n = 0, 0
    # r14: also reap crashed runs' RAM-scratch trees — tmpfs "leaks"
    # are RAM until reboot, worse than disk ones
    patterns = [os.path.join(root, p) for p in ("spark-*", "blockmgr-*")]
    patterns.append("/dev/shm/bench_ram_scratch_*")
    # r15: the bench's own temp stores (langid model, eval registry,
    # postings) leak when a run is killed mid-stage — same-uid,
    # >1h-idle trees are ours to reap
    patterns.append(os.path.join(root, "bench_*"))
    for pat in patterns:
        for p in glob.glob(pat):
            if not os.path.isdir(p):
                continue
            try:
                if os.stat(p).st_uid != uid:
                    continue  # never touch another user's scratch
                newest, nbytes = os.path.getmtime(p), 0
                for r, _dirs, files in os.walk(p):
                    newest = max(newest, os.path.getmtime(r))
                    for f in files:
                        fp = os.path.join(r, f)
                        try:
                            st = os.stat(fp)
                        except OSError:
                            continue
                        newest = max(newest, st.st_mtime)
                        nbytes += st.st_size
                if newest >= cutoff:
                    continue
                _shutil.rmtree(p, ignore_errors=True)
                freed += nbytes
                n += 1
            except OSError:
                continue
    return {"dirs_removed": n, "freed_gb": round(freed / 1e9, 2)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    warmup = os.environ.get("SPARK_GRAFT_BENCH_WARMUP", "1") == "1"

    # deadline + live-record bootstrap (r15, round-14 VERDICT #1): the
    # record skeleton exists BEFORE any Spark work so a kill at any
    # point yields a parseable tail line. "partial" rides in the head
    # until the first full headline leg lands.
    import atexit
    import signal

    start_ts = time.monotonic()
    deadline = float(os.environ.get("SPARK_GRAFT_BENCH_DEADLINE_SEC", "900"))
    if deadline <= 0:
        deadline = float("inf")
    RESERVE = 45.0  # room to stamp calibration_post + write/print records

    def time_left() -> float:
        return deadline - (time.monotonic() - start_ts)

    out: dict = {"metric": "headline_suite_wall_sec", "value": None,
                 "unit": "sec", "queries": {}, "sf": sf, "partial": True}
    _LIVE["out"] = out
    _LIVE["full_path"] = str(
        os.environ.get("SPARK_GRAFT_BENCH_FULL_PATH")
        or Path(__file__).resolve().parent / "BENCH_FULL.json")
    _LIVE["full_name"] = Path(_LIVE["full_path"]).name
    _LIVE["emitted"] = False
    _LIVE["stage"] = "init"
    _LIVE["pending"] = [
        "sweep", "calibrate", "warmup", "headline", "lib", "secondary",
        "probe10x", "probe_events", "probe_maintenance", "probe_postings",
        "probe30x", "finalize",
    ]
    signal.signal(signal.SIGTERM, _signal_emit)
    signal.signal(signal.SIGINT, _signal_emit)
    atexit.register(_emit_compact, "atexit")

    def stage_begin(name: str) -> None:
        _LIVE["stage"] = name
        if name in _LIVE["pending"]:
            _LIVE["pending"].remove(name)
        print(f"# bench stage: {name} (t+{time.monotonic() - start_ts:.0f}s)",
              file=sys.stderr, flush=True)

    def stage_ok(name: str, need_sec: float) -> bool:
        """Deadline gate for an optional stage: start it only with
        ``need_sec`` (a conservative stage-cost floor) plus the finalize
        reserve still on the clock; otherwise record the skip."""
        if time_left() >= need_sec + RESERVE:
            stage_begin(name)
            return True
        if name in _LIVE["pending"]:
            _LIVE["pending"].remove(name)
        out.setdefault("stages_skipped", []).append(name)
        print(f"# bench stage SKIPPED (deadline): {name} "
              f"(t+{time.monotonic() - start_ts:.0f}s)",
              file=sys.stderr, flush=True)
        return False

    # (c) retry-ladder bound: every retry leg must fit the remaining
    # clock, and past half-deadline at most one retry fires in total.
    retry_state = {"used": 0}

    def retry_ok(est_leg_sec: float, cooldown_sec: float) -> bool:
        if time_left() < est_leg_sec + max(cooldown_sec, 0) + RESERVE:
            return False
        if (time.monotonic() - start_ts) > deadline / 2 \
                and retry_state["used"] >= 1:
            return False
        return True

    stage_begin("sweep")
    sweep = _sweep_scratch()
    stage_begin("calibrate")
    calib_pre = _calibrate()

    # box-independent headline (r14, round-13 VERDICT #1): the headline
    # / lib / secondary suites run with spark.local.dir on tmpfs when
    # available, so a degraded scratch volume cannot eat the record; the
    # disk stamp is still taken beside every third (it measures the real
    # disk the probes will use) but no longer degrades THIS suite.
    import shutil as _shutil
    import tempfile as _tempfile

    ram_root = _ram_scratch_dir()
    ram_scratch = (
        _tempfile.mkdtemp(prefix="bench_ram_scratch_", dir=ram_root)
        if ram_root else None
    )
    _LIVE["ram_scratch"] = ram_scratch
    spark = get_spark(
        "etl_pack_spark_bench",
        extra_conf={"spark.local.dir": ram_scratch} if ram_scratch else None,
    )

    def run(name: str) -> float:
        # cold-cache per query: operators may persist() intermediates
        # for intra-query lineage reuse, and leaving those resident
        # distorts every LATER query (storage squeezes execution
        # memory) while making repeats of the SAME query artificially
        # warm. Clearing between runs makes each timing the honest
        # standalone cost of that query.
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        # RETIRED fallback: retired registry entries (e.g. text_sentiment,
        # r4) stay in the headline list so the total remains comparable
        # across rounds
        fn = (
            LIB_QUERIES.get(name)
            or suite.QUERIES.get(name)
            or suite.RETIRED_QUERIES[name]
        )
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    if warmup:
        # full warmup pass: timings then reflect steady-state execution
        # (codegen compiled, JVM warm) rather than first-run JIT costs
        stage_begin("warmup")
        for name in BENCH_QUERIES:
            run(name)
    elif "warmup" in _LIVE["pending"]:
        _LIVE["pending"].remove("warmup")

    # best-of-N: ambient load on a shared host inflates single-shot
    # wall times by up to ~2x; the minimum over repeats is the standard
    # low-noise estimator of a query's actual cost. N=3 since r4: the
    # r3 dedup_simhash_pairs A/B showed best-of-2 still catching the
    # JIT-warming tail of codegen-heavy queries (SCALE.md).
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))

    def _median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    def time_query(run_fn, name: str, n: int = repeats):
        xs = [run_fn(name) for _ in range(n)]
        # {min, median, n} per query (r5): the min is the estimator of
        # record, the min↔median gap is the recorded ambient-noise band
        # so sub-1.5x round-over-round moves are classifiable from the
        # artifact without a manual A/B
        return round(min(xs), 3), {
            "min": round(min(xs), 3),
            "median": round(_median(xs), 3),
            "n": n,
        }

    def run_headline(pre: dict | None = None) -> dict:
        """One full headline pass with per-suite-third ambient markers
        (round-12 VERDICT #1a): thirds[0] stamps the start (reusing a
        stamp taken seconds earlier when the caller has one — the
        marker itself writes 64 MB to the scratch volume whose health
        it measures), [1]/[2] the interior boundaries, [3] the end — a
        query's band is the stamps bracketing its third, so a mid-run
        collapse (r12: disk 291→10 MB/s) is attributable PER QUERY
        from the artifact."""
        t_: dict[str, float] = {}
        s_: dict[str, dict] = {}
        thirds = [pre if pre is not None else _calibrate()]
        cut1, cut2 = len(BENCH_QUERIES) // 3, 2 * len(BENCH_QUERIES) // 3
        truncated = False
        for i, name in enumerate(BENCH_QUERIES):
            # deadline truncation INSIDE the mandatory stage (r15: a
            # budget smaller than one headline leg must still yield a
            # measured partial record, not a 124 kill with no tail
            # line). At least the first query always runs — a record
            # with one real number beats an empty one — and the tail
            # line carries partial:true + headline:partial so the
            # driver can tell a truncated leg from a complete one.
            if i > 0 and time_left() < RESERVE:
                truncated = True
                out.setdefault("stages_skipped", []).append(
                    "headline:partial")
                print(f"# bench headline TRUNCATED (deadline) after "
                      f"{i}/{len(BENCH_QUERIES)} queries "
                      f"(t+{time.monotonic() - start_ts:.0f}s)",
                      file=sys.stderr, flush=True)
                break
            if i in (cut1, cut2):
                thirds.append(_calibrate())
            t_[name], s_[name] = time_query(run, name)
            # live partial (r15): until the FIRST full leg lands, a kill
            # mid-headline still reports every completed query's min and
            # their running total (marked partial:true in the tail line)
            if out.get("partial"):
                out["queries"] = dict(t_)
                out["value"] = round(sum(t_.values()), 3)
        thirds.append(_calibrate())
        bad = sorted({
            m for c in thirds
            for m in degraded_markers(c, scratch_ram=bool(ram_scratch))
        })
        return {
            "value": round(sum(t_.values()), 3),
            "truncated": truncated,
            "queries": t_, "queries_stats": s_,
            "calibration_thirds": thirds,
            "degraded": bool(bad), "degraded_markers": bad,
            # r14: SUB-threshold sustained CPU contention annotation —
            # the r14 local record lost 1.5x to a window where every
            # mid-run matmul stamp sat at 1.3-1.8x ref (below the 2x
            # degraded band, which must stay loose so CPU jitter alone
            # cannot force spurious reruns). Two or more elevated
            # interior stamps mean the whole suite ran under load;
            # annotation only, not a degraded flag.
            "cpu_contended": sum(
                1 for c in thirds
                if c["matmul_sec"] > 1.3 * CALIB_REF["matmul_sec"]
            ) >= 2,
        }

    stage_begin("headline")
    t_leg0 = time.monotonic()
    attempt = run_headline(pre=calib_pre)
    headline_leg_wall = time.monotonic() - t_leg0
    # first full leg is in: the live record stops being partial and any
    # later kill reports this complete leg, never a retry leg's fragment
    out["queries"] = attempt["queries"]
    out["value"] = attempt["value"]
    if not attempt["truncated"]:
        out.pop("partial", None)
    attempts = [attempt]
    # degraded-box rerun (round-12 VERDICT #1c): when any suite-third
    # marker trips, cool down and run the headline suite once more —
    # the record then carries BOTH legs, and the headline is the leg
    # with clean markers (or the faster one when neither/both are
    # clean). Opt out with SPARK_GRAFT_BENCH_COOLDOWN_SEC=-1.
    # r15: the retry must also FIT — measured first-leg wall + cooldown
    # against the deadline, and the global one-retry-past-half bound.
    cooldown = float(os.environ.get("SPARK_GRAFT_BENCH_COOLDOWN_SEC", "60"))
    if attempt["degraded"] and cooldown >= 0 \
            and retry_ok(headline_leg_wall, cooldown):
        retry_state["used"] += 1
        time.sleep(cooldown)
        attempts.append(run_headline())
        attempt = pick_attempt(attempts)
        out["queries"] = attempt["queries"]
        out["value"] = attempt["value"]

    # library operators outside the capped registry: timed and reported
    # separately so the headline total stays comparable across rounds
    lib_timings: dict[str, float] = {}
    lib_stats: dict[str, dict] = {}
    if stage_ok("lib", 60):
        for name in LIB_QUERIES:
            if time_left() < RESERVE:
                out.setdefault("stages_skipped", []).append("lib:partial")
                break
            lib_timings[name], lib_stats[name] = time_query(run, name)

    out.update({
        "metric": "headline_suite_wall_sec",
        "value": attempt["value"],
        "unit": "sec",
        "queries": attempt["queries"],
        "queries_stats": attempt["queries_stats"],
        "queries_lib": lib_timings,
        "queries_lib_stats": lib_stats,
        "sf": sf,
        "calibration_pre": calib_pre,
        "calibration_ref": CALIB_REF,
        "calibration_thirds": attempt["calibration_thirds"],
        "degraded": attempt["degraded"],
        "degraded_markers": attempt["degraded_markers"],
        "cpu_contended": attempt.get("cpu_contended", False),
        "scratch_sweep": sweep,
        # r14: which scratch the headline/lib/secondary suites ran on —
        # "ram" means the disk stamps beside the number are box context
        # for the probe stages, not a lever on the headline
        "headline_scratch": "ram" if ram_scratch else "disk",
    })
    if len(attempts) > 1:
        out["headline_attempts"] = [
            {"value": a["value"], "degraded": a["degraded"],
             "degraded_markers": a["degraded_markers"],
             "queries": a["queries"],
             "calibration_thirds": a["calibration_thirds"]}
            for a in attempts
        ]
        out["value_first_attempt"] = attempts[0]["value"]
    # mid-suite calibration (r8, round-7 VERDICT #7): the headline and
    # lib suites themselves degrade the scratch volume; the probe-stage
    # numbers need their OWN ambient marker, not just the endpoints.
    # (Kept alongside calibration_thirds for cross-round comparability:
    # r8-r12 artifacts carry this exact key.)
    out["calibration_mid"] = _calibrate()

    # scaling curve: the same suite at a second (smaller) scale factor,
    # so per-round records show how each query scales with data size
    # rather than a single point. Disable with SPARK_GRAFT_BENCH_SF2=.
    sf2_dir = os.environ.get("SPARK_GRAFT_BENCH_SF2", "/root/testdata/sf0.01")
    sec_enabled = bool(sf2_dir) and Path(sf2_dir).is_dir() and sf2_dir != sf_dir
    if not sec_enabled and "secondary" in _LIVE["pending"]:
        _LIVE["pending"].remove("secondary")  # disabled, not skipped
    if sec_enabled and stage_ok("secondary", 60):
        m2 = re.search(r"sf([0-9.]+)", sf2_dir)
        def run2(name: str) -> float:
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn = suite.QUERIES.get(name) or suite.RETIRED_QUERIES[name]
            fn(spark, sf2_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        t2: dict[str, float] = {}
        s2: dict[str, dict] = {}
        for name in BENCH_QUERIES:
            if time_left() < RESERVE:
                out.setdefault("stages_skipped", []).append(
                    "secondary:partial")
                break
            t2[name], s2[name] = time_query(run2, name)
        out["sf_secondary"] = float(m2.group(1)) if m2 else -1.0
        out["queries_secondary"] = t2
        out["queries_secondary_stats"] = s2
        out["value_secondary"] = round(sum(t2.values()), 3)

    # probe stages run on REAL-DISK scratch (r14): the 10x/30x
    # replication probes and the maintenance probe are deliberately
    # shuffle/write-bound — moving them to tmpfs would un-measure the
    # very path they exist to price. Restart the Spark context on the
    # default local dir and release the tmpfs tree.
    if ram_scratch:
        from etl_pack_spark.operators.cache import _POOL

        _POOL.clear()  # persisted handles die with the context
        spark.stop()
        # the restarted context INHERITS the stopped one's conf in this
        # JVM, so spark.local.dir must be explicitly pointed back at
        # real disk — without this the probes silently ran on tmpfs
        # (caught in the r14 smoke: Spark recreated the ram dir after
        # the restart). Verified empirically for THIS pyspark: the new
        # context's BlockManager (shuffle/spill — what the probes
        # price) honors the new conf, but the JVM-wide driver-files
        # root (SparkFiles/addPyFile) stays under the FIRST local.dir
        # for the life of the process — so the tmpfs tree must outlive
        # the swap (rmtree here broke the probe session's package
        # shipping with NoSuchFileException). Removal is deferred to
        # process exit; crashed runs are reaped by _sweep_scratch.
        import atexit

        atexit.register(_shutil.rmtree, ram_scratch, ignore_errors=True)
        spark = get_spark(
            "etl_pack_spark_bench_probes",
            extra_conf={"spark.local.dir": _tempfile.gettempdir()},
        )

    # third scaling point for the text/near-dup family: the corpus
    # replicated 10x with unique ids (see _scaled_docs). Headline and
    # secondary numbers are untouched; this section exists so SCALE.md's
    # extrapolation claims rest on three points, not two.
    def _pool_items():
        from etl_pack_spark.operators.cache import _POOL

        items = list(_POOL.items())
        _POOL.clear()
        return items

    def probe_at(factor: int, n_reps: int, only: set[str] | None = None,
                 stage: str | None = None):
        scaled = _scaled_docs(spark, sf_dir, factor).persist()
        n_docs = scaled.count()  # materialize once; probe queries re-scan

        def run3(fn) -> float:
            t0 = time.perf_counter()
            df = fn(scaled)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            # drop operator-internal pooled persists, keep the corpus
            for (_, d) in list(_pool_items()):
                d.unpersist(False)
            return dt

        t3: dict[str, float] = {}
        s3: dict[str, dict] = {}
        for name, fn in _scale_probe_queries().items():
            if only is not None and name not in only:
                continue
            # r15 deadline: a probe family already running stops cleanly
            # at the clock instead of blowing through the reserve
            if stage is not None and time_left() < RESERVE:
                out.setdefault("stages_skipped", []).append(
                    f"{stage}:partial")
                break
            xs = [run3(fn) for _ in range(n_reps)]
            t3[name] = round(min(xs), 3)
            s3[name] = {"min": round(min(xs), 3), "n": n_reps}
        scaled.unpersist()
        return n_docs, t3, s3

    factor = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_FACTOR", "10"))
    if factor <= 1:
        for nm in ("probe10x", "probe_events", "probe_maintenance",
                   "probe_postings", "probe30x"):
            if nm in _LIVE["pending"]:
                _LIVE["pending"].remove(nm)  # disabled, not skipped
    t3: dict[str, float] = {}
    s3: dict[str, dict] = {}
    if factor > 1 and stage_ok("probe10x", 120):
        # per-probe-family ambient markers (r9, round-8 VERDICT #4):
        # the probe stage runs late enough that the suite itself has
        # degraded the scratch volume; each family gets its own stamp
        # so cross-round diffs can attribute a probe move to ambient
        # without a manual A/B. Policy (SCALE.md): judge probe-stage
        # regressions by the ENGAGED-CAP probes (dedup_simhash_hot,
        # remove_spans_hot) against their own family marker — the
        # unplanted numbers swing with co-tenant load by design.
        out["calibration_probe_text"] = _calibrate()
        n_docs, tt, st = probe_at(factor, repeats, stage="probe10x")
        t3.update(tt)
        s3.update(st)
        out["scale_probe_factor"] = factor
        out["scale_probe_docs"] = n_docs

    if factor > 1 and stage_ok("probe_events", 90):
        # window-function probes over hot-user scaled events (r9,
        # round-8 VERDICT #8): PARTITION BY user with one user owning
        # factor× everyone else's rows
        out["calibration_probe_events"] = _calibrate()
        ev = _scaled_events(spark, sf_dir, factor).persist()
        out["scale_probe_events_rows"] = ev.count()

        def run_ev(fn) -> float:
            t0 = time.perf_counter()
            fn(ev).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0

        for name, fn in _events_probe_queries().items():
            if time_left() < RESERVE:
                out.setdefault("stages_skipped", []).append(
                    "probe_events:partial")
                break
            xs = [run_ev(fn) for _ in range(repeats)]
            t3[name] = round(min(xs), 3)
            s3[name] = {"min": round(min(xs), 3), "n": repeats}
        ev.unpersist()

    maint_reps = int(os.environ.get("SPARK_GRAFT_BENCH_MAINT_REPEATS", "2"))
    if factor > 1 and stage_ok("probe_maintenance", 120):
        # maintenance-cycle probe (r9, round-8 VERDICT #3): fold cost
        # across three firings over a growing store + compact cost
        out["calibration_probe_maintenance"] = _calibrate()
        n_pairs, tm, sm = _maintenance_probe(spark, sf_dir, factor, maint_reps)
        out["maintenance_probe_pairs"] = n_pairs
        t3.update(tm)
        s3.update(sm)
        for (_, d) in list(_pool_items()):
            d.unpersist(False)

    if factor > 1 and stage_ok("probe_postings", 90):
        # postings-store lifecycle probe (r14, round-13 VERDICT #5):
        # build+save vs store-query vs rebuild-query, unscaled corpus
        out["calibration_probe_postings"] = _calibrate()
        tp, sp = _postings_store_probe(spark, sf_dir, maint_reps)
        t3.update(tp)
        s3.update(sp)

    if t3:
        out["queries_scale_probe"] = t3
        out["queries_scale_probe_stats"] = s3

    # fourth point: a best-of-2 probe at a larger replication so the
    # extrapolation curve is recorded from the artifact itself. A
    # two-query subset (one pair-emitting, one scan-bound) keeps the
    # bench's wall-time budget; n=2 (r6, was single-shot) so the
    # round's main scale claim rests on a repeated measurement.
    factor2 = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_FACTOR2", "30"))
    reps2 = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE2_REPEATS", "2"))
    if not (factor > 1 and factor2 > factor) and "probe30x" in _LIVE["pending"]:
        _LIVE["pending"].remove("probe30x")  # disabled, not skipped
    # factor<=1 disables ALL probes; the 30x stage needs real clock room
    if factor > 1 and factor2 > factor and stage_ok("probe30x", 240):
        # simhash joined the subset in r6: it held the one superlinear
        # point (hot-block fan-out), and the now-default heavy-hitter
        # cap engages exactly at this replication level — the probe is
        # the evidence the cap bounds it
        probe2_subset = {
            "dedup_minhash_lsh", "dedup_simhash_pairs", "text_signals",
            # r8: the planted-hot-bucket variant joins the 30x
            # subset — this is the replication level where the cap
            # engages, so the engaged path gets a standing number
            "dedup_simhash_hot",
            # r9: the OTHER judged engaged-cap signal (SCALE.md
            # probe policy) gets its 30x point too
            "remove_spans_hot",
        }

        # degraded-box legs for the 30x probes (r14, round-13 VERDICT
        # #2): r13's dedup_minhash_lsh 130s / text_signals 94s rows ran
        # on a 34 MB/s stamp with no retry — unfalsifiable from the
        # artifact, exactly the headline's r12 disease. Same treatment:
        # pre+post marker stamps per leg, one cooldown retry when a
        # stamp is out of band, both legs recorded, clean-or-faster leg
        # is the record (pick_attempt).
        def probe2_leg() -> dict:
            pre = _calibrate()
            n_docs2, t4, s4 = probe_at(factor2, reps2, only=probe2_subset,
                                       stage="probe30x")
            post = _calibrate()
            bad = sorted({
                m for c in (pre, post) for m in degraded_markers(c)
            })
            return {
                "value": round(sum(t4.values()), 3),
                "docs": n_docs2, "queries": t4, "stats": s4,
                "calibration_pre": pre, "calibration_post": post,
                "degraded": bool(bad), "degraded_markers": bad,
            }

        t_p2 = time.monotonic()
        legs = [probe2_leg()]
        probe2_leg_wall = time.monotonic() - t_p2
        # r15: same retry bound as the headline — the r14 driver timeout
        # was exactly this ladder (228s leg + 60s cooldown + 140s retry)
        # running with no deadline awareness
        if legs[0]["degraded"] and cooldown >= 0 \
                and retry_ok(probe2_leg_wall, cooldown):
            retry_state["used"] += 1
            time.sleep(cooldown)
            legs.append(probe2_leg())
        leg = pick_attempt(legs)
        # legacy key kept for cross-round artifact comparability
        out["calibration_probe30x"] = leg["calibration_pre"]
        out["calibration_probe30x_post"] = leg["calibration_post"]
        out["scale_probe2_factor"] = factor2
        out["scale_probe2_docs"] = leg["docs"]
        out["queries_scale_probe2"] = leg["queries"]
        out["queries_scale_probe2_stats"] = leg["stats"]
        out["probe2_degraded"] = leg["degraded"]
        out["probe2_degraded_markers"] = leg["degraded_markers"]
        if len(legs) > 1:
            out["probe2_attempts"] = legs
            out["probe2_value_first_attempt"] = legs[0]["value"]

    # Artifact layout (r6 — the r5 artifact was truncated): the FULL
    # record (per-query {min,median,n} spreads, secondary suite,
    # probes) goes to a sidecar file and to an early stdout line; the
    # LAST stdout line is a compact JSON record capped at what a tail
    # capture always retains — metric/value/unit + the headline
    # per-query mins + one-number summaries of every other section.
    stage_begin("finalize")
    out["calibration_post"] = _calibrate()
    # sidecar path resolved once at bootstrap (env-overridable so the
    # emission-pin subprocess tests never clobber the shipped record)
    full_path = Path(_LIVE["full_path"])
    try:
        full_path.write_text(json.dumps(out, indent=1) + "\n")
    except OSError:
        pass  # read-only checkout: the early stdout line still has it
    print(json.dumps(out))
    # the compact tail line goes through the same single-shot emitter the
    # SIGTERM/atexit paths use — whoever fires first wins, others no-op
    _emit_compact("complete")


# The driver's artifact keeps only a bounded TAIL of bench stdout; r9-r11
# shipped a compact line that had silently regrown past that capture (the
# r5 failure mode all over again), so three rounds of BENCH_r*.json carried
# parsed:null. Guarantees, enforced by tests/test_bench_record.py:
#   * serialized size stays under COMPACT_BUDGET bytes, by construction:
#     optional sections are admitted smallest-first until the budget is hit
#   * metric/value/queries serialize LAST, so even a mid-JSON tail cut
#     leaves the headline readable by a human (and greppable)
#   * everything dropped here is duplicated in BENCH_FULL.json and in the
#     full-record stdout line printed just above
COMPACT_BUDGET = 1500  # bytes; driver tail capture is 2000

# never dropped: the headline contract (metric/value/unit/sf/queries)
_COMPACT_TAIL_KEYS = ("metric", "value", "queries")
# dropped as needed, largest-first, to stay under budget
_COMPACT_OPTIONAL_KEYS = (
    "sf_secondary", "value_secondary",
    "scale_probe_factor", "scale_probe_docs",
    "scale_probe_events_rows", "maintenance_probe_pairs",
    "scale_probe2_factor", "scale_probe2_docs",
    "queries_scale_probe2",
    # r13: the sick-box escape hatch — when markers tripped and the
    # suite re-ran, the first leg's total rides along so BOTH numbers
    # are readable from the tail line alone
    "degraded_markers", "value_first_attempt",
    # r14: the 30x probes' own box-health bit + retry escape hatch,
    # and the sub-threshold CPU-contention annotation
    "probe2_degraded", "probe2_value_first_attempt", "cpu_contended",
)


def compact_record(out: dict, full_name: str) -> dict:
    """The LAST-stdout-line record: headline contract + one-number probe
    summaries, sized under COMPACT_BUDGET with the contract keys last.
    ``degraded`` (r13) is mandatory: a headline number without its
    box-health bit is exactly the unfalsifiable artifact round-12's
    VERDICT #1 flagged."""
    head = {"unit": out["unit"], "sf": out["sf"], "full_record": full_name,
            "degraded": bool(out.get("degraded", False)),
            # r14: which scratch carried the headline — a RAM-scratch
            # record is box-independent by construction
            "scratch": out.get("headline_scratch", "disk")}
    # r15 (round-14 VERDICT #1): a deadline-truncated or signal-killed
    # run must SAY so in the tail line — these keys are mandatory when
    # present, capped at 8 entries so they can never blow the budget
    if out.get("stages_skipped"):
        head["stages_skipped"] = out["stages_skipped"][:8]
    if out.get("partial"):
        head["partial"] = True
    tail = {k: out[k] for k in _COMPACT_TAIL_KEYS}
    base_len = len(json.dumps({**head, **tail}))
    budget = COMPACT_BUDGET - base_len
    opts: dict = {}
    # admit optional keys smallest-first so scalars survive even if a
    # future probe table balloons
    present = [(len(json.dumps({k: out[k]})), k)
               for k in _COMPACT_OPTIONAL_KEYS if k in out]
    for size, key in sorted(present):
        # +1 for the joining comma
        if size + 1 <= budget:
            opts[key] = out[key]
            budget -= size + 1
    return {**head, **opts, **tail}


if __name__ == "__main__":
    main()

"""CLI transfer runner, format-agnostic sources, stateful streaming."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

# r16 two-tier suite (round-15 VERDICT #1): subprocess CLI pins: most tests boot a fresh Spark JVM per invocation.
# Deselected by the default `-m "not slow"` profile (pytest.ini)
# so the driver's verify completes in budget; the full gate
# (`pytest tests/ -m ""`) still runs this module.
pytestmark = pytest.mark.slow

from etl_pack_spark.sources.formats import read_source


def test_cli_batch_transfer(sf_dir, tmp_path):
    """Drive the CLI as a user would: incremental windowed load, twice
    — second run appends nothing."""
    cmd = [
        sys.executable, "-m", "etl_pack_spark.cli",
        "--source-dir", sf_dir, "--table", "lineitem",
        "--target", str(tmp_path / "tgt"),
        "--window", "l_shipdate:1996-01-01:1996-12-31",
        "--increment",
    ]
    out1 = json.loads(subprocess.run(cmd, capture_output=True, text=True,
                                     cwd="/root/repo", check=True).stdout.strip().splitlines()[-1])
    out2 = json.loads(subprocess.run(cmd, capture_output=True, text=True,
                                     cwd="/root/repo", check=True).stdout.strip().splitlines()[-1])
    assert out1["rows"] > 0
    assert out2["rows"] == 0


def test_cli_bad_window_flag():
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--source-dir", "/x", "--table", "t", "--target", "/y",
         "--window", "not-a-window"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 2
    assert "column:from:to" in res.stderr


def test_read_source_csv_json_roundtrip(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.write.option("header", "true").csv(str(tmp_path / "nation_csv"))
    nation.write.json(str(tmp_path / "nation_json"))

    csv_df = read_source(
        spark, str(tmp_path / "nation_csv"), "csv",
        schema_tags={"n_nationkey": "int32", "n_name": "string", "n_regionkey": "int32"},
    )
    json_df = read_source(spark, str(tmp_path / "nation_json"), "json")
    assert csv_df.count() == nation.count()
    assert {r["n_name"] for r in json_df.collect()} == {r["n_name"] for r in nation.collect()}
    assert csv_df.schema["n_nationkey"].dataType.simpleString() == "int"


def test_read_source_rejects_unknown_format(spark):
    with pytest.raises(ValueError, match="unsupported format"):
        read_source(spark, "/tmp/x", "avrox")


def test_stateful_running_totals(spark, sf_dir, tmp_path):
    """applyInPandasWithState over a real stream: totals accumulate
    across micro-batches and equal the batch ground truth."""
    from pyspark.sql import functions as F

    from etl_pack_spark.streaming.incremental import _events_stream
    from etl_pack_spark.streaming.stateful import running_user_totals

    src = f"{sf_dir}/events.parquet"
    stream = _events_stream(spark, src)
    q = (
        # no eviction: bounded replay should drain and terminate (the
        # timer path is covered by test_stateful_idle_timeout_evicts_state)
        running_user_totals(stream, idle_timeout_ms=None)
        .writeStream.outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .format("memory").queryName("totals")
        .start()
    )
    q.awaitTermination()
    got = {r["user_id"]: (r["n_events"], round(r["sum_value"], 2))
           for r in spark.sql(
               "SELECT user_id, n_events, sum_value FROM ("
               "  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id "
               "                               ORDER BY n_events DESC) AS rk FROM totals"
               ") WHERE rk = 1"
           ).collect()}
    events = spark.read.parquet(src)
    expect = {r["user_id"]: (r["n"], round(r["s"], 2))
              for r in events.groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s")).collect()}
    assert got == expect


def test_read_source_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.write.orc(str(tmp_path / "nation_orc"))
    orc_df = read_source(spark, str(tmp_path / "nation_orc"), "orc")
    assert sorted(tuple(r) for r in orc_df.collect()) == sorted(tuple(r) for r in nation.collect())
    # columnar source: projection+filter reach the ORC scan like parquet
    plan = (
        orc_df.where("n_regionkey = 1").select("n_name")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "n_regionkey" in plan.split("PushedFilters")[1][:80]


def test_cli_compact_zorder(sf_dir, tmp_path):
    import json
    import subprocess
    import sys

    src = str(tmp_path / "src")
    # stage a small table to compact
    subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--source-dir", sf_dir, "--table", "events",
         "--target", src],
        check=True, capture_output=True, text=True, cwd="/root/repo",
    )
    out = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--compact", src, "--target", str(tmp_path / "z"),
         "--zorder-by", "user_id,value", "--target-file-mb", "0.01"],
        check=True, capture_output=True, text=True, cwd="/root/repo",
    )
    res = json.loads(out.stdout.strip().splitlines()[-1])
    assert res["mode"] == "compact" and res["out_files"] >= 1


def test_cli_transfer_still_requires_source(tmp_path):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--target", str(tmp_path / "t")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 2
    assert "source-dir" in r.stderr


def test_cli_compact_rejects_transfer_flags_fast(tmp_path):
    import subprocess
    import sys
    import time

    t0 = time.perf_counter()
    r = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--compact", str(tmp_path), "--target", str(tmp_path / "o"),
         "--increment"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    took = time.perf_counter() - t0
    assert r.returncode == 2 and "--increment" in r.stderr
    assert took < 10   # validated before JVM startup, not after


def test_cli_zorder_auto_bits_many_cols(spark, sf_dir, tmp_path):
    """4+ z-order columns auto-clamp bits (16*4 > 63 used to crash
    after JVM startup); in-process main() reuses the test session."""
    from etl_pack_spark.cli import main

    src = str(tmp_path / "src4")
    spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "value", "ts"
    ).write.parquet(src)
    rc = main([
        "--compact", src, "--target", str(tmp_path / "z4"),
        "--zorder-by", "event_id,user_id,value,ts",
        "--target-file-mb", "0.05",
    ])
    assert rc == 0
    assert spark.read.parquet(str(tmp_path / "z4")).count() == \
        spark.read.parquet(src).count()


def test_cli_zorder_explicit_bits_over_budget_fails_fast(tmp_path):
    from etl_pack_spark.cli import main

    rc = main([
        "--compact", str(tmp_path), "--target", str(tmp_path / "o"),
        "--zorder-by", "a,b,c,d", "--zorder-bits", "16",
    ])
    assert rc == 2


def test_cli_compact_in_place_requires_flag(tmp_path):
    from etl_pack_spark.cli import main

    rc = main(["--compact", str(tmp_path / "t"), "--target", str(tmp_path / "t")])
    assert rc == 2


def test_cli_compact_in_place_and_crash_recovery(spark, sf_dir, tmp_path):
    """--in-place self-rewrite: staged write + backup + rename; a
    simulated crash mid-swap (backup exists, target gone) is recovered
    on the next firing — mirrors the streaming CDC swap test."""
    import os
    import shutil

    from etl_pack_spark.cli import main
    from etl_pack_spark.sinks.atomic import backup_path

    tgt = str(tmp_path / "table")
    spark.read.parquet(f"{sf_dir}/nation.parquet").repartition(6).write.parquet(tgt)
    n = spark.read.parquet(tgt).count()

    rc = main(["--compact", tgt, "--target", tgt, "--in-place",
               "--cluster-by", "n_nationkey"])
    assert rc == 0
    assert spark.read.parquet(tgt).count() == n
    assert not os.path.exists(backup_path(tgt))
    assert len([f for f in os.listdir(tgt) if f.endswith(".parquet")]) == 1

    # simulate a crash between the two renames: the pre-swap table
    # lives at .bak, the target path is gone
    os.replace(tgt, backup_path(tgt))
    rc = main(["--compact", tgt, "--target", tgt, "--in-place"])
    assert rc == 0
    assert spark.read.parquet(tgt).count() == n
    assert not os.path.exists(backup_path(tgt))

    # stale backup next to an intact target is discarded, not restored
    shutil.copytree(tgt, backup_path(tgt))
    rc = main(["--compact", tgt, "--target", tgt, "--in-place"])
    assert rc == 0
    assert spark.read.parquet(tgt).count() == n
    assert not os.path.exists(backup_path(tgt))


def test_cli_compact_partitions(spark, sf_dir, tmp_path):
    import json as _json

    from etl_pack_spark.cli import main

    root = str(tmp_path / "ptab")
    spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderstatus"
    ).repartition(6).write.partitionBy("o_orderstatus").parquet(root)
    n = spark.read.parquet(root).count()
    rc = main(["--compact-partitions", root])
    assert rc == 0
    assert spark.read.parquet(root).count() == n
    import os
    for leaf in os.listdir(root):
        if not leaf.startswith(("_", ".")):
            files = [f for f in os.listdir(os.path.join(root, leaf))
                     if f.endswith(".parquet")]
            assert len(files) == 1
    # flags from other modes are rejected fast
    assert main(["--compact-partitions", root, "--target", "x"]) == 2
    assert main(["--compact-partitions", root, "--compact", "y"]) == 2


def test_cli_compact_sigstore(spark, tmp_path):
    """--compact-sigstore: the maintenance firing for the incremental
    stores — end-to-end through main(), plus fast flag validation."""
    from pyspark.sql import functions as F

    from etl_pack_spark.cli import main

    store = str(tmp_path / "store")
    base = spark.range(5).select(
        F.col("id").alias("doc_id"), (F.col("id") * 10).alias("mh_0")
    )
    base.withColumn("__batch", F.lit(0).cast("long")).write.parquet(store)
    # rewrite of doc 3 in a later batch — compaction must keep batch 1
    spark.createDataFrame([(3, 999, 1)], "doc_id long, mh_0 long, __batch long") \
        .write.mode("append").parquet(store)
    rc = main(["--compact-sigstore", store])
    assert rc == 0
    rows = {r["doc_id"]: r["mh_0"] for r in spark.read.parquet(store).collect()}
    assert rows == {0: 0, 1: 10, 2: 20, 3: 999, 4: 40}
    # r8: the maintenance firing publishes the compaction watermark, so
    # subsequent reads take the merge-on-read fast path
    from etl_pack_spark.streaming.incremental import compaction_watermark

    assert compaction_watermark(spark, store) == 1
    # exclusive with the other maintenance modes; foreign flags rejected
    assert main(["--compact-sigstore", store, "--compact", store,
                 "--target", store]) == 2
    assert main(["--compact-sigstore", store, "--streaming"]) == 2


def test_cli_funnel_report(sf_dir):
    """r10: the curation-audit firing — per-gate funnel JSON over a
    parquet docs path, stages summing to the corpus size."""
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--funnel", f"{sf_dir}/documents.parquet",
         "--min-words", "10", "--min-lines", "1"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["mode"] == "funnel"
    assert out["total"] == sum(out["stages"].values()) > 0
    assert set(out["stages"]) <= {"kept", "doc_blocklist", "min_lines"}


def test_cli_funnel_curate_gates(sf_dir):
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--funnel", f"{sf_dir}/documents.parquet",
         "--funnel-gates", "curate"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["gates"] == "curate"
    assert out["total"] == sum(out["stages"].values()) > 0
    assert set(out["stages"]) <= {
        "kept", "token_count", "avg_token_len", "lang_mismatch", "exact_dup"
    }


def test_cli_funnel_curate_gates_reject_tuning_flags():
    """r10 ADVICE: curate_disposition hardcodes doc_id/text/lang and
    its own thresholds, so gate-tuning flags combined with
    --funnel-gates curate must error out (return 2) instead of
    printing a report computed with different gates than requested."""
    for flags in (["--min-words", "10"], ["--min-lines", "1"],
                  ["--text-col", "body"], ["--id-col", "id"]):
        res = subprocess.run(
            [sys.executable, "-m", "etl_pack_spark.cli",
             "--funnel", "/x", "--funnel-gates", "curate", *flags],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert res.returncode == 2, flags
        assert "do not apply to --funnel-gates curate" in res.stderr


def test_cli_funnel_is_exclusive_and_fast(tmp_path):
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--funnel", "/x", "--store-stats", "/y"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert res.returncode == 2
    assert "exclusive" in res.stderr


def test_cli_drift_report(sf_dir, tmp_path):
    """r11: the quality-drift firing — PSI JSON between a baseline and
    an ingest batch; identical corpora read stable."""
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--drift", f"{sf_dir}/documents.parquet",
         "--drift-batch", f"{sf_dir}/documents.parquet"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["mode"] == "drift" and out["max_psi"] == 0.0
    assert all(v["verdict"] == "stable" for v in out["signals"].values())
    # exclusivity + pairing validation (fast, pre-Spark)
    r2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--drift", "/x"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 2 and "exactly one of" in r2.stderr
    r3 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--drift", "/x", "--drift-batch", "/y", "--funnel", "/z"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r3.returncode == 2 and "exclusive" in r3.stderr


def test_cli_report_history_store(spark, sf_dir, tmp_path):
    """r11: --report-out appends each --funnel/--drift firing's rows
    to one shared-schema parquet history store — two firings, two
    fired_at_ms groups, trend-queryable."""
    store = str(tmp_path / "reports")
    docs = f"{sf_dir}/documents.parquet"
    for args in (
        ["--funnel", docs, "--report-out", store],
        ["--drift", docs, "--drift-batch", docs, "--report-out", store],
    ):
        subprocess.run(
            [sys.executable, "-m", "etl_pack_spark.cli", *args],
            capture_output=True, text=True, cwd="/root/repo", check=True,
        )
    hist = spark.read.parquet(store)
    assert set(hist.columns) == {"fired_at_ms", "mode", "subject",
                                 "detail", "metric", "value", "verdict"}
    firings = hist.select("fired_at_ms", "mode").distinct().collect()
    assert len(firings) == 2
    assert {r["mode"] for r in firings} == {"funnel", "drift"}
    # funnel rows conserve the corpus; drift rows carry verdicts
    from pyspark.sql import functions as F

    n_docs = spark.read.parquet(docs).count()
    fun_sum = hist.where("mode = 'funnel'").agg(F.sum("value")).first()[0]
    assert int(fun_sum) == n_docs
    assert hist.where(
        "mode = 'drift' AND verdict IS NULL"
    ).count() == 0
    # rejected outside funnel/drift firings
    r = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--store-stats", "/x", "--report-out", store],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 2 and "--report-out" in r.stderr


def test_cli_drift_rejects_funnel_flags():
    """r11 self-review: --min-words/--min-lines/--funnel-gates with
    --drift are meaningless and must exit 2, not be silently ignored;
    --funnel-gates outside --funnel likewise."""
    for flags in (["--min-words", "10"], ["--min-lines", "2"],
                  ["--funnel-gates", "curate"]):
        r = subprocess.run(
            [sys.executable, "-m", "etl_pack_spark.cli",
             "--drift", "/x", "--drift-batch", "/y", *flags],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 2, flags
        assert "do not apply to --drift" in r.stderr
    r = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--store-stats", "/x", "--funnel-gates", "c4"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 2 and "--funnel-gates" in r.stderr

def test_cli_drift_saved_baseline_roundtrip(spark, sf_dir, tmp_path):
    """r12 (r11 VERDICT #2 / ADVICE): --drift-save-baseline persists
    the baseline histogram once; a later firing passes the HISTOGRAM
    as --drift and never touches the baseline docs — proven black-box
    by DELETING the docs copy between save and firing."""
    import os
    import shutil

    src = f"{sf_dir}/documents.parquet"
    docs = str(tmp_path / "docs.parquet")
    (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, docs)
    hist = str(tmp_path / "baseline_hist")
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--drift", docs, "--drift-save-baseline", hist],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["mode"] == "drift_save_baseline" and out["buckets"] > 0
    assert "lang_pred" in out["signals"] and "n_tokens" in out["signals"]
    # the saved artifact IS a signal_histogram frame + its config
    hdf = spark.read.parquet(hist)
    assert set(hdf.columns) == {"signal", "bucket", "n", "p"}
    assert os.path.exists(f"{hist}/_drift_config.json")
    # the firing must not need the baseline docs at all
    (shutil.rmtree if os.path.isdir(docs) else os.remove)(docs)
    batch = f"{sf_dir}/documents.parquet"
    res2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--drift", hist, "--drift-batch", batch],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out2 = json.loads(res2.stdout.strip().splitlines()[-1])
    # saved-vs-recomputed over the same corpus: identical histograms
    assert out2["mode"] == "drift" and out2["max_psi"] == 0.0
    assert all(v["verdict"] == "stable" for v in out2["signals"].values())
    # pairing validation: both targets at once is a config error
    r3 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--drift", hist, "--drift-batch", batch,
         "--drift-save-baseline", str(tmp_path / "h2")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r3.returncode == 2 and "exactly one of" in r3.stderr


def test_cli_drift_config_knobs(sf_dir, tmp_path):
    """r12 (r11 VERDICT #8): --drift-config replaces the bucket spec;
    invalid configs fail pre-JVM with the offending value named; a
    firing against a saved baseline rejects a contradictory config."""
    docs = f"{sf_dir}/documents.parquet"
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps(
        {"edges": {"n_tokens": [50, 200]},
         "categories": {"lang_pred": ["en", "de"]}}
    ))
    hist = str(tmp_path / "hist")
    subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--drift", docs, "--drift-save-baseline", hist,
         "--drift-config", str(cfg)],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    # firing WITHOUT the flag reuses the stored config (only the two
    # configured signals appear)
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--drift", hist, "--drift-batch", docs],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert set(out["signals"]) == {"n_tokens", "lang_pred"}
    assert out["max_psi"] == 0.0
    # a contradictory explicit config is rejected loudly
    cfg2 = tmp_path / "cfg2.json"
    cfg2.write_text(json.dumps({"edges": {"n_tokens": [10, 99]}}))
    r2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--drift", hist, "--drift-batch", docs,
         "--drift-config", str(cfg2)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 2 and "contradicts" in r2.stderr
    # validation failures are fast (no Spark) and name the problem
    for payload, msg in [
        ('{"edges": {"n_tokens": [200, 50]}}', "strictly increasing"),
        ('{"edges": {"bad name": [1, 2]}}', "plain identifier"),
        ('{"categories": {"lang_pred": ["o\'brien"]}}', "plain token"),
        ('{"edges": {}}', "no signals"),
        ('{"unknown": 1}', "edges"),
        ("not json", "--drift-config"),
    ]:
        bad = tmp_path / "bad.json"
        bad.write_text(payload)
        r = subprocess.run(
            [sys.executable, "-m", "etl_pack_spark.cli",
             "--drift", docs, "--drift-batch", docs,
             "--drift-config", str(bad)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 2 and msg in r.stderr, (payload, r.stderr)
    # scoped to --drift
    r3 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--funnel", docs, "--drift-config", str(cfg)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r3.returncode == 2 and "only apply to --drift" in r3.stderr


def test_cli_report_trend(spark, sf_dir, tmp_path):
    """r12 (r11 VERDICT #6): --report-trend answers "when did drift
    start" over a multi-firing --report-out store without hand-written
    SQL: per (mode, metric) the firing count, last value/verdict, and
    first major-shift timestamp."""
    store = str(tmp_path / "reports")
    docs = f"{sf_dir}/documents.parquet"
    # firing 1: stable (identical corpora); firing 2: planted major
    # shift (truncated batch)
    trunc = str(tmp_path / "trunc.parquet")
    spark.read.parquet(docs).selectExpr(
        "doc_id", "substr(text, 1, 40) AS text"
    ).write.parquet(trunc)
    for batch in (docs, trunc):
        subprocess.run(
            [sys.executable, "-m", "etl_pack_spark.cli",
             "--drift", docs, "--drift-batch", batch,
             "--report-out", store],
            capture_output=True, text=True, cwd="/root/repo", check=True,
        )
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--report-trend", store],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["mode"] == "report_trend"
    rows = {r["metric"]: r for r in out["metrics"]}
    assert rows and all(r["n_firings"] == 2 for r in rows.values())
    nt = rows["n_tokens"]
    assert nt["last_verdict"] == "major" and nt["last_value"] > 0.25
    # the major shift started at the SECOND firing, and its timestamp
    # is the latest one
    assert nt["first_major_ms"] == nt["last_fired_at_ms"]
    assert all(r["last_verdict"] in ("stable", "moderate", "major")
               for r in rows.values())
    # exclusive with other modes
    r2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--report-trend", store, "--funnel", docs],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 2 and "exclusive" in r2.stderr


def test_cli_register_eval(sf_dir, tmp_path):
    """r12: the eval-registry firing — register two benchmarks, retry
    idempotently, width contradiction is a loud config error, flags
    scoped."""
    docs = f"{sf_dir}/documents.parquet"
    store = str(tmp_path / "evalreg")
    cmd = [sys.executable, "-m", "etl_pack_spark.cli",
           "--register-eval", docs, "--eval-store", store,
           "--eval-set", "bench_a"]
    out = json.loads(subprocess.run(
        cmd, capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout.strip().splitlines()[-1])
    assert out["mode"] == "register_eval" and out["appended"] > 0
    assert out["registered_sets"] == {"bench_a": out["appended"]}
    # retried firing appends nothing
    out2 = json.loads(subprocess.run(
        cmd, capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout.strip().splitlines()[-1])
    assert out2["appended"] == 0
    # a NEW set at another width in the same store: the supported
    # mixed-suite case since the per-set width upgrade (r13)
    out3 = json.loads(subprocess.run(
        [*cmd[:-1], "bench_b", "--eval-ngram", "5"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    ).stdout.strip().splitlines()[-1])
    assert out3["appended"] > 0
    assert set(out3["registered_sets"]) == {"bench_a", "bench_b"}
    # contradicting an EXISTING set's width: loud exit-2, store untouched
    r = subprocess.run(
        [*cmd, "--eval-ngram", "5"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 2 and "8-gram" in r.stderr
    # flag scoping
    r2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--eval-store", store],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 2 and "--register-eval" in r2.stderr
    r3 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--register-eval", docs],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r3.returncode == 2 and "--eval-store" in r3.stderr


def test_cli_report_trend_funnel_shift(spark, sf_dir, tmp_path):
    """r12: --report-trend prices funnel-mix drift — PSI between the
    earliest and latest funnel firing per subject, same statistic and
    thresholds as the drift monitor. Two firings over corpora with
    different gate mixes must show a shift; a single-firing subject is
    skipped."""
    store = str(tmp_path / "reports")
    docs = f"{sf_dir}/documents.parquet"
    # second firing over a corpus whose texts are truncated: the
    # token_count gate fires for far more docs -> stage mix shifts
    trunc = str(tmp_path / "trunc.parquet")
    spark.read.parquet(docs).selectExpr(
        "doc_id", "substr(text, 1, 30) AS text", "lang"
    ).write.parquet(trunc)
    # the subject must be the SAME path both firings (the cron shape:
    # one path, evolving data), so stage the corpora through it
    subject = str(tmp_path / "docs_live.parquet")
    import shutil

    shutil.copytree(trunc, subject, dirs_exist_ok=True)
    # firing 1: truncated corpus
    subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--funnel", subject, "--funnel-gates", "curate",
         "--report-out", store],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    # firing 2: the real corpus at the same path (the cron shape: one
    # path, evolving data)
    shutil.rmtree(subject)
    spark.read.parquet(docs).select("doc_id", "text", "lang") \
        .write.parquet(subject)
    subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--funnel", subject, "--funnel-gates", "curate",
         "--report-out", store],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--report-trend", store],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert len(out["funnel_shift"]) == 1
    shift = out["funnel_shift"][0]
    assert shift["subject"] == subject
    assert shift["psi"] > 0.25 and shift["verdict"] == "major"
    assert shift["first_fired_at_ms"] < shift["last_fired_at_ms"]


def test_cli_datacard(sf_dir, tmp_path):
    """r12: the dataset-card firing — per-group + total rows as JSON,
    group validation fast, flags scoped."""
    docs = f"{sf_dir}/documents.parquet"
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--datacard", docs],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["mode"] == "datacard" and out["groups"] == ["lang"]
    totals = [r for r in out["rows"] if r["is_total"] == 1]
    assert len(totals) == 1 and totals[0]["n_docs"] > 0
    assert sum(r["n_docs"] for r in out["rows"]
               if r["is_total"] == 0) == totals[0]["n_docs"]
    assert all("lang_match_frac" in r for r in out["rows"])
    # custom groups
    res2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--datacard", docs,
         "--datacard-groups", "lang,source"],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out2 = json.loads(res2.stdout.strip().splitlines()[-1])
    assert out2["groups"] == ["lang", "source"]
    assert all(("lang" in r and "source" in r) for r in out2["rows"])
    # missing group column is a loud config error
    r3 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--datacard", docs,
         "--datacard-groups", "nope"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r3.returncode == 2 and "nope" in r3.stderr
    # scoped flag
    r4 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--funnel", docs, "--datacard-groups", "lang"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r4.returncode == 2 and "--datacard" in r4.stderr


def test_cli_new_modes_missing_paths_fail_cleanly(tmp_path):
    """r12 polish: a missing store/docs path is a config error (exit 2
    with the path named), not a Spark traceback."""
    r = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--report-trend", str(tmp_path / "nope")],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 2 and "no report store" in r.stderr
    r2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--register-eval", str(tmp_path / "nope2"),
         "--eval-store", str(tmp_path / "s"), "--eval-set", "b"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 2 and "no eval docs" in r2.stderr


def test_cli_datacard_trend_roundtrip(spark, sf_dir, tmp_path):
    """r13 (round-12 VERDICT #4): the datacard is the corpus-composition
    report, so it trends — two firings with --report-out over
    differently-mixed corpora, then --report-trend PSIs the per-group
    token mix like it already does funnel stages, and the grand-total
    metrics trend as ordinary (mode, metric) rows."""
    store = str(tmp_path / "reports")
    subject = str(tmp_path / "docs.parquet")
    base = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base.write.mode("overwrite").parquet(subject)
    fire = [sys.executable, "-m", "etl_pack_spark.cli",
            "--datacard", subject, "--report-out", store]
    subprocess.run(fire, capture_output=True, text=True,
                   cwd="/root/repo", check=True)
    # second firing: one language slice dropped -> the token mix shifts
    langs = [r["lang"] for r in base.groupBy("lang").count()
             .orderBy("count", ascending=False).collect()]
    base.where(f"lang <> '{langs[0]}'").write.mode("overwrite") \
        .parquet(subject)
    subprocess.run(fire, capture_output=True, text=True,
                   cwd="/root/repo", check=True)
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--report-trend", store],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    metrics = {(m["mode"], m["metric"]): m for m in out["metrics"]}
    assert metrics[("datacard", "n_docs")]["n_firings"] == 2
    assert metrics[("datacard", "tokens_p50")]["last_value"] is not None
    shifts = out["datacard_shift"]
    assert len(shifts) == 1 and shifts[0]["subject"] == subject
    assert shifts[0]["psi"] > 0
    # no decontamination firings in this store: present and empty
    assert out["decontamination_shift"] == []


def test_cli_datacard_group_edge_cases(sf_dir):
    """r13 (ADVICE): separators-only --datacard-groups and group
    columns named like a signal output are loud exit-2 config errors,
    not duplicate-column surprises or tracebacks."""
    docs = f"{sf_dir}/documents.parquet"
    r = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--datacard", docs,
         "--datacard-groups", ","],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 2 and "no columns" in r.stderr
    # n_chars exists in the fixture AND is a text_signals output name
    r2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--datacard", docs,
         "--datacard-groups", "n_chars"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 2 and "carry_cols" in r2.stderr
    assert "Traceback" not in r2.stderr


def test_cli_decontaminate_check(spark, sf_dir, tmp_path):
    """r13 (round-12 VERDICT #8): the registry read firing — a corpus
    checked against every registered set from the CLI, clean sets
    reported at zero, counts appended to the history store."""
    docs = f"{sf_dir}/documents.parquet"
    store = str(tmp_path / "reg")
    reports = str(tmp_path / "reports")
    clean = str(tmp_path / "clean.parquet")
    spark.createDataFrame(
        [(1, "zq wv xj qk vv bb nn mm pp rr totally disjoint "
             "gibberish benchmark line")],
        "doc_id long, text string",
    ).write.parquet(clean)
    for src, name in ((docs, "s7"), (clean, "never_hit")):
        subprocess.run(
            [sys.executable, "-m", "etl_pack_spark.cli",
             "--register-eval", src, "--eval-store", store,
             "--eval-set", name],
            capture_output=True, text=True, cwd="/root/repo", check=True,
        )
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--decontaminate-check", docs, "--eval-store", store,
         "--report-out", reports],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["mode"] == "decontaminate_check"
    assert out["docs_total"] > 0
    # the corpus IS eval set s7's source, so every doc with >= 8 tokens
    # is flagged; the disjoint set reports zero instead of vanishing
    assert out["sets"]["s7"]["docs_flagged"] > 0
    assert out["sets"]["never_hit"] == {"docs_flagged": 0,
                                        "hits_total": 0}
    appended = spark.read.parquet(reports)
    assert appended.where("mode = 'decontamination'").count() == 2
    # flag scoping: the check needs a store, rejects register-only flags
    r2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--decontaminate-check", docs],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 2 and "--eval-store" in r2.stderr
    r3 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--decontaminate-check", docs, "--eval-store", store,
         "--eval-set", "x"],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r3.returncode == 2 and "--register-eval" in r3.stderr


def test_cli_drift_histogram_missing_config_is_loud(sf_dir, tmp_path):
    """r13 (ADVICE): a saved histogram whose _drift_config.json sidecar
    vanished (tampered/partially-copied store) must NOT silently fall
    back to the built-in buckets — PSI between differently-bucketed
    histograms is meaningless."""
    import os

    docs = f"{sf_dir}/documents.parquet"
    hist = str(tmp_path / "hist")
    subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--drift", docs,
         "--drift-save-baseline", hist],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    os.remove(os.path.join(hist, "_drift_config.json"))
    r = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--drift", hist,
         "--drift-batch", docs],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 2 and "_drift_config.json" in r.stderr


def test_cli_drift_stream(spark, sf_dir, tmp_path):
    """r13: the resident drift monitor from the CLI — save a baseline,
    stream two doc slices through --drift-stream, verdicts trend in the
    report store; flag scoping is loud."""
    docs = f"{sf_dir}/documents.parquet"
    hist = str(tmp_path / "hist")
    src = str(tmp_path / "src")
    reports = str(tmp_path / "reports")
    ckpt = str(tmp_path / "ckpt")
    subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--drift", docs,
         "--drift-save-baseline", hist],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    spark.read.parquet(docs).select("doc_id", "text") \
        .coalesce(1).write.parquet(src)
    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--drift", hist,
         "--drift-stream", src, "--checkpoint", ckpt,
         "--report-out", reports],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["mode"] == "drift_stream" and out["micro_batches"] >= 1
    rows = spark.read.parquet(reports).where("mode = 'drift_stream'")
    assert rows.count() > 0
    assert {r["verdict"] for r in rows.collect()} == {"stable"}
    # scoping: the resident mode needs checkpoint + report-out
    r2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--drift", hist,
         "--drift-stream", src],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r2.returncode == 2 and "--checkpoint" in r2.stderr
    r3 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--drift-stream", src],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r3.returncode == 2 and "--drift" in r3.stderr


def test_cli_datacard_mix_keys_unambiguous(spark, tmp_path):
    """r14 (ADVICE): datacard_mix bucket keys are JSON-encoded group
    tuples — raw '|'.join aliased ('a|b','c') with ('a','b|c') into one
    PSI bucket, silently skewing datacard_shift."""
    subject = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "alpha beta gamma", "a|b", "c"),
         (2, "delta epsilon zeta", "a", "b|c")],
        "doc_id long, text string, lang string, source string",
    ).write.parquet(subject)
    store = str(tmp_path / "reports")
    subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--datacard", subject, "--datacard-groups", "lang,source",
         "--report-out", store],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    mix = spark.read.parquet(store).where("mode = 'datacard_mix'")
    keys = {r["metric"] for r in mix.select("metric").collect()}
    assert keys == {json.dumps(["a|b", "c"]), json.dumps(["a", "b|c"])}


def test_cli_datacard_langid_model(spark, tmp_path):
    """r14 (round-13 VERDICT #7): --langid-model routes the datacard's
    declared-vs-predicted column through the trained NB model; the flag
    without --datacard is an exit-2 config error."""
    from etl_pack_spark.operators.classify import (
        langid_model_save,
        nb_langid_train,
    )

    train = spark.createDataFrame(
        [("it", "la rapida volpe marrone salta sopra il cane pigro"),
         ("it", "questa è una frase con molte parole comuni"),
         ("en", "the quick brown fox jumps over the lazy dog"),
         ("en", "this is a sentence with many common words")],
        "lang string, text string")
    grams, meta = nb_langid_train(train, "text", "lang")
    model = str(tmp_path / "model")
    langid_model_save(spark, grams, meta, model)
    subject = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(1, "la volpe marrone salta sopra il cane", "it"),
         (2, "the brown fox jumps over the dog", "en")],
        "doc_id long, text string, lang string").write.parquet(subject)
    r = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--datacard", subject,
         "--langid-model", model],
        capture_output=True, text=True, cwd="/root/repo", check=True)
    out = json.loads(r.stdout.strip().splitlines()[-1])
    total = next(row for row in out["rows"] if row["is_total"] == 1)
    assert total["lang_match_frac"] == 1.0  # heuristic would miss 'it'
    r2 = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli", "--langid-model", model,
         "--funnel", subject],
        capture_output=True, text=True, cwd="/root/repo")
    assert r2.returncode == 2 and "--langid-model" in r2.stderr


def test_cli_datacard_shift_bridges_legacy_mix_keys(spark, tmp_path):
    """r15 (r14 ADVICE): a history store with a pre-r14 '|'.join-keyed
    datacard_mix firing followed by an r14+ json.dumps-keyed one holds
    the SAME mix — datacard_shift must canonicalize both formats to
    common buckets and report no shift, not compare disjoint bucket
    sets and cry major."""
    import time

    from etl_pack_spark.operators.quality import append_report_rows

    store = str(tmp_path / "reports")
    # firing 1, legacy keys; firing 2 (later stamp), JSON keys; same mix
    append_report_rows(spark, store, [
        {"metric": "web|en", "value": 600.0, "verdict": None},
        {"metric": "web|de", "value": 400.0, "verdict": None},
    ], mode="datacard_mix", subject="corpus", detail="source,lang")
    time.sleep(0.01)  # distinct fired_at_ms
    append_report_rows(spark, store, [
        {"metric": json.dumps(["web", "en"]), "value": 600.0,
         "verdict": None},
        {"metric": json.dumps(["web", "de"]), "value": 400.0,
         "verdict": None},
    ], mode="datacard_mix", subject="corpus", detail="source,lang")

    res = subprocess.run(
        [sys.executable, "-m", "etl_pack_spark.cli",
         "--report-trend", store],
        capture_output=True, text=True, cwd="/root/repo", check=True,
    )
    out = json.loads(res.stdout.strip().splitlines()[-1])
    shifts = out["datacard_shift"]
    assert len(shifts) == 1
    # identical mixes across the format break: PSI ~ 0, no shift called
    assert shifts[0]["psi"] < 0.01
    assert shifts[0]["verdict"] in ("stable", "minor")

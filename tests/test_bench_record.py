"""The bench stdout contract: the LAST line must survive the driver's
2,000-byte tail capture. BENCH_r09/r10/r11.json all carried parsed:null
because the compact line silently regrew to 3.4 KB (round-11 VERDICT #1);
these tests pin the fix so it cannot regress a third time.
"""

import pytest

# r16 two-tier suite (round-15 VERDICT #1): the subprocess pins here
# boot a bench subprocess (own Spark JVM) per test. Deselected by the
# default `-m "not slow"` profile (pytest.ini) so the driver's verify
# completes in budget; the full gate (`pytest tests/ -m ""`) still
# runs this module.
pytestmark = pytest.mark.slow

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402


def _representative_out():
    """The real artifact when present (the strongest pin: the exact dict
    the last driver run produced), else a synthetic one at headline scale."""
    full = REPO / "BENCH_FULL.json"
    if full.exists():
        return json.loads(full.read_text())
    out = {
        "metric": "bench_total", "value": 12.345, "unit": "sec", "sf": 0.1,
        "queries": {q: 1.234 for q in bench.BENCH_QUERIES},
        "sf_secondary": 0.01, "value_secondary": 9.876,
        "scale_probe_factor": 10, "scale_probe_docs": 50000,
        "scale_probe_events_rows": 1000000, "maintenance_probe_pairs": 4943600,
        "scale_probe2_factor": 30, "scale_probe2_docs": 150000,
        "queries_scale_probe2": {f"q{i}": 12.345 for i in range(5)},
    }
    return out


def test_compact_record_fits_tail_capture():
    line = json.dumps(bench.compact_record(_representative_out(), "BENCH_FULL.json"))
    assert len(line) < bench.COMPACT_BUDGET, (
        f"compact bench line is {len(line)} bytes; the driver tail capture "
        f"keeps 2000 — trim _COMPACT_OPTIONAL_KEYS or the headline set"
    )


def test_compact_record_headline_serializes_last():
    rec = bench.compact_record(_representative_out(), "BENCH_FULL.json")
    # json.dumps preserves dict insertion order: a tail cut eats the FRONT
    # of the line, so the contract keys must be the last three
    assert list(rec)[-3:] == ["metric", "value", "queries"]
    for key in ("metric", "value", "unit", "sf", "queries", "degraded"):
        assert key in rec


def test_compact_record_carries_degraded_flag_and_rerun_value():
    """r13 (round-12 VERDICT #1): a degraded-box headline must say so in
    the tail line, and when the suite re-ran, the first leg's total must
    survive the compact budget too."""
    out = dict(_representative_out())
    out["degraded"] = True
    out["degraded_markers"] = ["disk_write_mbps"]
    out["value_first_attempt"] = 32.506
    rec = bench.compact_record(out, "BENCH_FULL.json")
    assert rec["degraded"] is True
    assert rec["value_first_attempt"] == 32.506
    assert rec["degraded_markers"] == ["disk_write_mbps"]
    assert len(json.dumps(rec)) < bench.COMPACT_BUDGET

    out["degraded"] = False
    rec2 = bench.compact_record(out, "BENCH_FULL.json")
    assert rec2["degraded"] is False


def test_degraded_marker_bands():
    """The pinned clean band accepts r11's driver stamps and rejects
    r12's degraded ones (the two rounds the detector exists to tell
    apart)."""
    r11_stamp = {"matmul_sec": 0.091, "pyloop_sec": 0.171,
                 "disk_free_gb": 84.9, "disk_write_mbps": 452.0}
    r11_slow_disk = {"matmul_sec": 0.077, "pyloop_sec": 0.149,
                     "disk_free_gb": 78.7, "disk_write_mbps": 193.0}
    r12_mid = {"matmul_sec": 0.119, "pyloop_sec": 0.162,
               "disk_free_gb": 60.0, "disk_write_mbps": 10.0}
    r12_post = {"matmul_sec": 0.084, "pyloop_sec": 0.158,
                "disk_free_gb": 60.0, "disk_write_mbps": 42.0}
    assert bench.degraded_markers(r11_stamp) == []
    assert bench.degraded_markers(r11_slow_disk) == []
    # the disk collapse is the flag; matmul at 0.119 (1.5x ref) stays
    # inside the 2x band on purpose — CPU jitter alone must not force
    # a spurious rerun when the disk marker is clean
    assert "disk_write_mbps" in bench.degraded_markers(r12_mid)
    assert bench.degraded_markers(r12_post) == ["disk_write_mbps"]


def test_neardup_components_runs_in_front_third():
    """round-12 VERDICT #1b: the suite's most scratch-dependent query
    must run under the front-third marker band, not last."""
    idx = bench.BENCH_QUERIES.index("neardup_components")
    assert idx < len(bench.BENCH_QUERIES) // 3


def test_compact_record_sheds_oversized_sections():
    out = _representative_out()
    out = dict(out)
    # a future probe table ballooning must not push the line past budget
    out["queries_scale_probe2"] = {f"very_long_query_name_{i}": 123.456
                                   for i in range(200)}
    rec = bench.compact_record(out, "BENCH_FULL.json")
    line = json.dumps(rec)
    assert len(line) < bench.COMPACT_BUDGET
    assert "queries_scale_probe2" not in rec  # shed, not truncated
    # scalars still admitted (smallest-first admission)
    assert "scale_probe_factor" not in out or "scale_probe_factor" in rec
    assert rec["metric"] == out["metric"] and rec["value"] == out["value"]


def test_headline_contract_alone_fits_budget():
    """If the mandatory head+tail ever outgrow the budget on their own,
    no shedding can save the line — fail loudly here first."""
    out = _representative_out()
    base = {"unit": out["unit"], "sf": out["sf"],
            "full_record": "BENCH_FULL.json",
            **{k: out[k] for k in ("metric", "value", "queries")}}
    assert len(json.dumps(base)) < bench.COMPACT_BUDGET - 200, (
        "headline per-query table leaves <200 bytes of slack; prune "
        "BENCH_QUERIES or raise the driver-side capture"
    )


def test_degraded_markers_ram_scratch_ignores_disk():
    """r14 (round-13 VERDICT #1): a RAM-scratch suite cannot be degraded
    by the disk marker — only CPU markers can trip it — while the same
    stamp still degrades a disk-scratch suite."""
    r12_mid = {"matmul_sec": 0.119, "pyloop_sec": 0.162,
               "disk_free_gb": 60.0, "disk_write_mbps": 10.0}
    assert "disk_write_mbps" in bench.degraded_markers(r12_mid)
    assert bench.degraded_markers(r12_mid, scratch_ram=True) == []
    cpu_sick = {"matmul_sec": 0.3, "pyloop_sec": 0.162,
                "disk_free_gb": 60.0, "disk_write_mbps": 10.0}
    assert bench.degraded_markers(cpu_sick, scratch_ram=True) == ["matmul_sec"]


def test_pick_attempt_prefers_clean_leg():
    """r14: shared leg selection for headline AND probe2 reruns — a
    single clean leg wins even when slower; no/two clean legs -> faster."""
    slow_clean = {"value": 40.0, "degraded": False}
    fast_degraded = {"value": 25.0, "degraded": True}
    assert bench.pick_attempt([fast_degraded, slow_clean]) is slow_clean
    assert bench.pick_attempt([slow_clean, fast_degraded]) is slow_clean
    both_deg = [{"value": 30.0, "degraded": True},
                {"value": 28.0, "degraded": True}]
    assert bench.pick_attempt(both_deg) is both_deg[1]
    both_clean = [{"value": 30.0, "degraded": False},
                  {"value": 28.0, "degraded": False}]
    assert bench.pick_attempt(both_clean) is both_clean[1]


def test_ram_scratch_dir_env_contract(monkeypatch, tmp_path):
    """r14: '0' disables, an explicit path wins when usable, and a
    missing root falls back to None (disk-scratch behavior)."""
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RAM_SCRATCH", "0")
    assert bench._ram_scratch_dir() is None
    monkeypatch.setenv("SPARK_GRAFT_BENCH_RAM_SCRATCH",
                       str(tmp_path / "nope"))
    assert bench._ram_scratch_dir() is None
    monkeypatch.delenv("SPARK_GRAFT_BENCH_RAM_SCRATCH")
    got = bench._ram_scratch_dir()
    import os as _os
    import shutil as _shutil
    if got is not None:  # box-dependent: only pin the invariants
        assert _os.path.isdir(got) and _os.access(got, _os.W_OK)
        assert _shutil.disk_usage(got).free >= 24e9


def test_compact_record_carries_scratch_and_probe2_health():
    """r14 (round-13 VERDICT #1/#2): the tail line says which scratch
    carried the headline and whether the 30x probes ran degraded, and
    the probe2 retry value survives the budget."""
    out = dict(_representative_out())
    out["headline_scratch"] = "ram"
    out["probe2_degraded"] = True
    out["probe2_value_first_attempt"] = 224.3
    rec = bench.compact_record(out, "BENCH_FULL.json")
    assert rec["scratch"] == "ram"
    assert rec["probe2_degraded"] is True
    assert rec["probe2_value_first_attempt"] == 224.3
    assert len(json.dumps(rec)) < bench.COMPACT_BUDGET
    # absent -> disk default (pre-r14 artifacts)
    out2 = dict(_representative_out())
    out2.pop("headline_scratch", None)
    assert bench.compact_record(out2, "BENCH_FULL.json")["scratch"] == "disk"


def test_probe2_attempts_shape_in_full_record():
    """r14: when the shipped BENCH_FULL.json carries a probe2 retry, each
    leg must hold its own stamps + marker verdict (the headline_attempts
    pattern applied to queries_scale_probe2)."""
    full = REPO / "BENCH_FULL.json"
    if not full.exists():
        return
    out = json.loads(full.read_text())
    for leg in out.get("probe2_attempts", []):
        for key in ("value", "queries", "calibration_pre",
                    "calibration_post", "degraded", "degraded_markers"):
            assert key in leg
    if "queries_scale_probe2" in out and "probe2_degraded" in out:
        assert isinstance(out["probe2_degraded"], bool)
        assert "calibration_probe30x" in out


def test_standing_abba_probe_set_covers_swing_rows():
    """r14 (round-13 VERDICT #8): the standing ABBA tool must carry the
    r13 driver-record swing rows so future cross-round attribution is
    one artifact away, and every probe resolves in the live registry."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "abba", REPO / "tools" / "abba.py")
    abba = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(abba)
    assert {"tpch_q5_like", "sessionize"} <= set(abba.QUERIES)
    assert {"p2_window", "corpus_curate", "neardup_components",
            "text_signals"} <= set(abba.QUERIES)
    from etl_pack_spark import suite
    for q in abba.QUERIES:
        assert q in suite.QUERIES or q in suite.RETIRED_QUERIES


def test_cpu_contended_annotation_survives_compact_budget():
    """r14: sub-threshold sustained CPU contention must be readable
    from the tail line (annotation, not a degraded flag — the 2x band
    stays loose on purpose)."""
    out = dict(_representative_out())
    out["cpu_contended"] = True
    rec = bench.compact_record(out, "BENCH_FULL.json")
    assert rec["cpu_contended"] is True
    assert len(json.dumps(rec)) < bench.COMPACT_BUDGET


# ---- r15 (round-14 VERDICT #1): guaranteed emission under any wall clock ----


def _fresh_live(out, stage, pending):
    saved = dict(bench._LIVE)
    bench._LIVE.update({"out": out, "emitted": False, "stage": stage,
                        "pending": list(pending), "ram_scratch": None})
    return saved


def test_emit_compact_is_single_shot_and_names_skips(capsys):
    """The emitter prints the compact line exactly once; an interrupt
    reason folds the not-yet-run stages plus the interrupted stage into
    stages_skipped on the record itself."""
    out = {"metric": "headline_suite_wall_sec", "value": 3.2, "unit": "sec",
           "sf": 0.001, "queries": {"a": 1.1, "b": 2.1}, "partial": True}
    saved = _fresh_live(out, "probe10x", ["probe_events", "probe30x"])
    try:
        bench._emit_compact("signal:15")
        bench._emit_compact("signal:15")  # second call must be a no-op
        lines = [ln for ln in capsys.readouterr().out.splitlines() if ln]
        assert len(lines) == 1
        rec = json.loads(lines[0])
        assert rec["stages_skipped"] == [
            "probe_events", "probe30x", "interrupted:probe10x"]
        assert rec["partial"] is True
        assert rec["value"] == 3.2 and rec["queries"] == {"a": 1.1, "b": 2.1}
        assert list(rec)[-3:] == ["metric", "value", "queries"]
    finally:
        bench._LIVE.update(saved)


def test_emit_compact_complete_path_keeps_deadline_skips(capsys):
    """On the normal finalize path, stages skipped BY THE DEADLINE (already
    recorded in out) ride in the tail line; nothing is added."""
    out = {"metric": "headline_suite_wall_sec", "value": 9.9, "unit": "sec",
           "sf": 0.1, "queries": {"a": 9.9}, "stages_skipped": ["probe30x"]}
    saved = _fresh_live(out, "finalize", [])
    try:
        bench._emit_compact("complete")
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["stages_skipped"] == ["probe30x"]
        assert "partial" not in rec
    finally:
        bench._LIVE.update(saved)


def test_compact_record_stages_skipped_capped_and_in_budget():
    out = dict(_representative_out())
    out["stages_skipped"] = [f"stage_{i}" for i in range(40)]
    rec = bench.compact_record(out, "BENCH_FULL.json")
    assert len(rec["stages_skipped"]) == 8  # capped, cannot blow the budget
    assert len(json.dumps(rec)) < bench.COMPACT_BUDGET


def _bench_env(tmp_path, **extra):
    env = dict(__import__("os").environ)
    env.update({
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_BENCH_WARMUP": "0",
        "SPARK_GRAFT_BENCH_REPEATS": "1",
        "SPARK_GRAFT_BENCH_SF2": "",          # secondary suite off
        "SPARK_GRAFT_BENCH_RAM_SCRATCH": "0",  # no tmpfs juggling in tests
        "SPARK_GRAFT_SWEEP_SCRATCH": "0",
        "SPARK_GRAFT_CPUS": "4",
        # keep the bench's store/scratch writes inside the test sandbox
        "HOME": str(tmp_path),
        "TMPDIR": str(tmp_path),
        # and its sidecar OUT of the repo: the shipped BENCH_FULL.json is
        # the round's record, not a test scratch file
        "SPARK_GRAFT_BENCH_FULL_PATH": str(tmp_path / "BENCH_FULL.json"),
    })
    env.update(extra)
    return env


def test_bench_deadline_truncates_but_emits(tmp_path):
    """A deadline far too small even for ONE full headline leg must still
    produce a parseable last-stdout-line record (round-14 VERDICT #1b):
    the headline truncates after at least one measured query, the record
    is marked partial, and every optional stage names its skip. (The
    pre-r15 contract — full headline always runs — made the worst case
    unbounded: a budget under one leg reproduced the r14 rc=124/no-tail
    failure exactly.)"""
    import subprocess
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=_bench_env(tmp_path, SPARK_GRAFT_BENCH_DEADLINE_SEC="1"),
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, f"no stdout; stderr tail: {proc.stderr[-2000:]}"
    rec = json.loads(lines[-1])
    assert rec["metric"] == "headline_suite_wall_sec"
    assert isinstance(rec["value"], float) and rec["value"] > 0
    # at least the first query ran and was measured; nothing invented
    qs = set(rec["queries"])
    assert qs and qs <= set(bench.BENCH_QUERIES)
    assert rec["partial"] is True
    assert "headline:partial" in rec["stages_skipped"]
    # every optional stage was out of clock and must say so
    assert "lib" in rec["stages_skipped"]
    assert "probe10x" in rec["stages_skipped"]
    assert "probe30x" in rec["stages_skipped"]
    assert len(lines[-1]) < 2000  # the driver tail capture
    assert proc.returncode == 0


def test_bench_sigterm_post_headline_emits_compact_line(tmp_path):
    """The round-14 failure mode, pinned: a driver kill AFTER the
    headline completes but mid-way through later stages must leave the
    COMPLETE headline record as the last stdout line (round-14 VERDICT
    #1a). Watches the stderr stage log and SIGTERMs at the lib stage —
    the same signal-handler machinery the r14 mid-probe kill needed,
    pinned one stage earlier because reaching probe10x costs the full
    headline+lib suites cold (>540s on a loaded box; the lib stage
    arrives in headline-time). The stronger assertion holds here: the
    record must carry the FULL headline query set, not a partial."""
    import signal
    import subprocess
    import threading
    import time as _time

    proc = subprocess.Popen(
        [sys.executable, str(REPO / "bench.py")],
        env=_bench_env(tmp_path, SPARK_GRAFT_BENCH_DEADLINE_SEC="0"),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(tmp_path),
    )
    out_buf: list[str] = []
    t = threading.Thread(
        target=lambda: out_buf.append(proc.stdout.read()), daemon=True)
    t.start()
    saw_stage = False
    t0 = _time.monotonic()
    try:
        for line in proc.stderr:
            if "# bench stage: lib" in line:
                saw_stage = True
                _time.sleep(1.0)  # land INSIDE the stage, not at its door
                proc.send_signal(signal.SIGTERM)
                break
            if _time.monotonic() - t0 > 540:
                break
        rc = proc.wait(timeout=60)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait(timeout=30)
    t.join(timeout=30)
    assert saw_stage, "bench never reached the lib stage in 540s"
    assert rc == 124  # the handler preserves the timeout-kill rc
    lines = [ln for ln in "".join(out_buf).splitlines() if ln.strip()]
    assert lines, "SIGTERM produced no stdout record"
    rec = json.loads(lines[-1])
    assert rec["metric"] == "headline_suite_wall_sec"
    assert isinstance(rec["value"], float) and rec["value"] > 0
    # the first full headline leg landed before the kill — the record
    # must be that complete leg, never a fragment
    assert set(rec["queries"]) == set(bench.BENCH_QUERIES)
    assert "partial" not in rec
    assert any(s.startswith("interrupted:") for s in rec["stages_skipped"])
    # the never-started probe stages are named
    assert "probe10x" in rec["stages_skipped"]
    assert "probe30x" in rec["stages_skipped"]
    assert "probe30x" in rec["stages_skipped"]
    assert len(lines[-1]) < 2000


def test_r14_ops_have_standing_lib_bench_rows(spark):
    """r15 (round-14 VERDICT #5): the r14 PDF extractor and trained
    langid must trend round-over-round — both carry lib bench rows, and
    both callables run clean at fixture scale."""
    assert "lib_pdf_text" in bench.LIB_QUERIES
    assert "lib_nb_langid_score" in bench.LIB_QUERIES
    sf = "/root/testdata/sf0.001"

    pdfed = bench.LIB_QUERIES["lib_pdf_text"](spark, sf)
    from etl_pack_spark.sources.reader import read_table
    n_docs = read_table(spark, sf, "documents").count()
    ok = pdfed.where("status = 'ok' AND n_pages = 3").count()
    assert ok == n_docs  # every synthesized payload extracts cleanly

    lid = bench.LIB_QUERIES["lib_nb_langid_score"](spark, sf)
    rows = lid.groupBy("lang_source").count().collect()
    got = {r["lang_source"]: r["count"] for r in rows}
    # the planted model answered (not the heuristic fallback)
    assert got == {"model": n_docs}


def test_emitter_never_writes_sidecar_without_armed_path(tmp_path, capsys):
    """The interrupt emitter writes the full-record sidecar ONLY when
    main() armed a path — in-process emitter tests must never overwrite
    the repo's shipped BENCH_FULL.json."""
    import os

    full = REPO / "BENCH_FULL.json"
    before = full.stat().st_mtime_ns if full.exists() else None
    out = {"metric": "headline_suite_wall_sec", "value": 1.0,
           "unit": "sec", "sf": 0.001, "queries": {"a": 1.0}}
    saved = _fresh_live(out, "probe10x", [])
    saved_path = bench._LIVE.get("full_path")
    bench._LIVE["full_path"] = None
    try:
        bench._emit_compact("signal:15")
        capsys.readouterr()
        after = full.stat().st_mtime_ns if full.exists() else None
        assert before == after
        # an armed path DOES get the sidecar
        bench._LIVE.update({"emitted": False,
                            "full_path": str(tmp_path / "side.json")})
        bench._emit_compact("signal:15")
        capsys.readouterr()
        assert (tmp_path / "side.json").exists()
    finally:
        bench._LIVE.update(saved)
        bench._LIVE["full_path"] = saved_path

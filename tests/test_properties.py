"""Property-based tests (hypothesis) for the canonical hash and the
incremental filter — the invariants the reference's golden vectors
sample, stated as laws over arbitrary data."""

from __future__ import annotations

import hashlib
import random

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_pack_spark.operators.dedup import incremental_filter, snapshot_hashes
from etl_pack_spark.operators.hashing import row_hash

# Latin range incl. accents/quotes: exercises case folding and byte-order
# sorting without straying into codepoints where JVM and CPython lowercase
# tables disagree (the engine contract is JVM semantics).
cell = st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x24F),
    min_size=0, max_size=20,
)
rows3 = st.lists(st.tuples(cell, cell, cell), min_size=1, max_size=8)

SETTINGS = dict(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _reference_hash(cells: list[str]) -> str:
    """The reference algorithm (etl.go:59-68) in pure Python: the
    independent model our Spark expression must equal."""
    rendered = sorted(c.lower() for c in cells)
    return hashlib.md5("".join(rendered).encode()).hexdigest()


@given(rows=rows3)
@settings(**SETTINGS)
def test_row_hash_matches_reference_model(spark, rows):
    df = spark.createDataFrame(rows, "a string, b string, c string")
    got = [r["h"] for r in df.select(row_hash(["a", "b", "c"]).alias("h")).collect()]
    expect = [_reference_hash(list(t)) for t in rows]
    assert sorted(got) == sorted(expect)


@given(rows=rows3, seed=st.integers(0, 2**16))
@settings(**SETTINGS)
def test_row_hash_column_order_invariant(spark, rows, seed):
    df = spark.createDataFrame(rows, "a string, b string, c string")
    cols = ["a", "b", "c"]
    random.Random(seed).shuffle(cols)
    h1 = sorted(r[0] for r in df.select(row_hash(["a", "b", "c"])).collect())
    h2 = sorted(r[0] for r in df.select(row_hash(cols)).collect())
    assert h1 == h2


@given(rows=rows3, mask=st.lists(st.booleans(), min_size=8, max_size=8))
@settings(**SETTINGS)
def test_incremental_filter_partition_law(spark, rows, mask):
    """filter(src, hashes(subset)) keeps exactly the rows whose hash is
    NOT in the subset's hash set — i.e. output ∪ subset covers src by
    hash, and output ∩ subset is empty by hash."""
    df = spark.createDataFrame(rows, "a string, b string, c string")
    keep = [row for row, m in zip(rows, mask) if m]
    if keep:
        tgt = spark.createDataFrame(keep, "a string, b string, c string")
        snap = snapshot_hashes(tgt)
    else:
        snap = None
    out = incremental_filter(df, snap)
    out_h = {_reference_hash(list(r)) for r in
             ((x["a"], x["b"], x["c"]) for x in out.collect())}
    src_h = {_reference_hash(list(t)) for t in rows}
    tgt_h = {_reference_hash(list(t)) for t in keep}
    assert out_h == src_h - tgt_h


# ---------------------------------------------------------------------------
# Cleaning / CDC idempotence laws
# ---------------------------------------------------------------------------

texts = st.lists(
    st.text(alphabet="ab \n", min_size=0, max_size=30), min_size=1, max_size=8
)


@given(docs=texts)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dedup_lines_idempotent(spark, docs):
    """Applying corpus line-dedup to its own output (minus the docs it
    fully emptied — ``split('') == ['']`` would re-enter as an artifact
    empty LINE and collide across emptied docs; hypothesis found that,
    and a real pipeline drops empty docs between passes) is the
    identity."""
    from pyspark.sql import functions as F

    from etl_pack_spark.operators.cleaning import dedup_lines

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    once = dedup_lines(df, "doc_id", "text").where(F.col("n_kept") > 0).select(
        "id", "text_clean"
    )
    twice = dedup_lines(
        once.withColumnRenamed("text_clean", "text"), "id", "text"
    ).select("id", "text_clean")
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


@given(rows=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 5), st.text("xy", max_size=2)),
    min_size=1, max_size=12,
))
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_scd2_build_idempotent_on_own_versions(spark, rows):
    """Rebuilding SCD-2 from the surviving (key, ts, val) versions
    reproduces the identical history."""
    import datetime as dt

    from etl_pack_spark.plans.merge import scd2_build

    data = [(k, dt.datetime(2024, 1, 1 + t), v) for k, t, v in rows]
    df = spark.createDataFrame(data, "k long, ts timestamp, val string")
    hist = scd2_build(df, ["k"], "ts")
    again = scd2_build(hist.select("k", "ts", "val"), ["k"], "ts")
    a = sorted(map(tuple, hist.collect()))
    b = sorted(map(tuple, again.collect()))
    assert a == b


# ---------------------------------------------------------------------------
# Randomized cross-engine parity: hypothesis-generated corpora must
# match the DuckDB twins exactly (not just the fixed fixture)
# ---------------------------------------------------------------------------

corpus = st.lists(
    st.text(alphabet="abc .\n", min_size=0, max_size=40),
    min_size=1, max_size=10,
)


def _duck_with(rows):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("corpus", pd.DataFrame(rows, columns=["doc_id", "text"]))
    return con


@given(docs=corpus)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_text_signals_matches_duckdb_on_random_corpus(spark, docs):
    from etl_pack_spark.operators.textops import text_signals, text_signals_sql

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        text_signals(df, "doc_id", "text")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        _duck_with(rows).execute(text_signals_sql("corpus", "doc_id", "text"))
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c], want[c]
        same = (a == b) | (a.isna() & b.isna())
        assert same.all(), (c, a[~same].head(), b[~same].head())


@given(docs=corpus)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_dedup_lines_matches_duckdb_on_random_corpus(spark, docs):
    from etl_pack_spark.operators.cleaning import dedup_lines, dedup_lines_sql

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        dedup_lines(df, "doc_id", "text")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    want = (
        _duck_with(rows).execute(dedup_lines_sql("corpus", "doc_id", "text"))
        .fetchdf().sort_values("id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["text_clean", "n_lines", "n_kept"]:
        assert (got[c].values == want[c].values).all(), c


@given(docs=corpus)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_gopher_matches_duckdb_on_random_corpus(spark, docs):
    from etl_pack_spark.operators.cleaning import gopher_signals, gopher_signals_sql

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        gopher_signals(df, "doc_id", "text")
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        _duck_with(rows).execute(gopher_signals_sql("corpus", "doc_id", "text"))
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["n_words", "stop_hits", "keep", "mean_word_len",
              "symbol_ratio", "alpha_word_ratio", "drop_reason"]:
        a, b = got[c], want[c]
        same = (a == b) | (a.isna() & b.isna())
        assert same.all(), c
    # the r10 audit invariant: keep == (drop_reason IS NULL), per row
    assert (got["keep"] == got["drop_reason"].isna()).all()


@given(
    docs=st.lists(
        st.text(alphabet="ab c", min_size=0, max_size=40), min_size=1, max_size=6
    ),
    chunk=st.integers(2, 6),
    overlap=st.integers(0, 4),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_chunking_matches_duckdb_on_random_corpus(spark, docs, chunk, overlap):
    """Chunk windows are bit-identical cross-engine for arbitrary text
    and any legal (chunk, overlap); every token is covered exactly
    once plus `overlap` per extra chunk."""
    import duckdb
    import pandas as pd
    from hypothesis import assume

    from etl_pack_spark.operators.chunking import chunk_documents, chunk_documents_sql

    assume(overlap < chunk)
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = sorted(map(tuple, chunk_documents(df, "doc_id", "text", chunk, overlap).collect()))
    con = duckdb.connect()
    con.register("corpus", pd.DataFrame(enumerate(docs), columns=["doc_id", "text"]))
    want = sorted(map(tuple, con.execute(
        chunk_documents_sql("corpus", "doc_id", "text", chunk, overlap)
    ).fetchall()))
    assert got == want


@given(
    changes=st.lists(
        st.tuples(
            st.integers(0, 2),            # key
            st.integers(0, 5),            # ts day offset
            st.sampled_from(["I", "U", "D"]),
        ),
        min_size=1, max_size=10,
    ),
    split_at=st.integers(0, 5),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_apply_cdc_in_order_batches_equal_one_shot(spark, changes, split_at):
    """Folding a change stream as two IN-ORDER batches (ordered by ts,
    ties kept in one batch — what a checkpointed file stream delivers)
    equals one-shot application. This is the exact contract
    stream_cdc_apply relies on, stated as a law."""
    import datetime as dt

    from hypothesis import assume

    from etl_pack_spark.plans.merge import apply_cdc

    # duplicate (key, ts) tie-break is caller-owned per the merge.py
    # contract ("a caller-supplied total order") — exclude it from the law
    assume(len({(k, ts) for (k, ts, _) in changes}) == len(changes))
    rows = [
        (k, dt.datetime(2024, 1, 1 + ts), f"v{k}_{ts}", op)
        for (k, ts, op) in changes
    ]
    schema = "k long, ts timestamp, val string, op string"
    target = spark.createDataFrame([], "k long, ts timestamp, val string")

    one_shot = apply_cdc(target, spark.createDataFrame(rows, schema), ["k"], "ts")

    cut_day = dt.datetime(2024, 1, 1) + dt.timedelta(days=split_at)
    early = [r for r in rows if r[1] <= cut_day]
    late = [r for r in rows if r[1] > cut_day]
    folded = target
    for part in (early, late):
        if part:
            folded = apply_cdc(
                folded, spark.createDataFrame(part, schema), ["k"], "ts"
            )
    assert sorted(map(tuple, folded.collect())) == sorted(map(tuple, one_shot.collect()))


@given(docs=corpus, k=st.integers(2, 5))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_repeated_ngram_spans_matches_duckdb_on_random_corpus(spark, docs, k):
    from etl_pack_spark.operators.substrings import (
        repeated_ngram_spans,
        repeated_ngram_spans_sql,
    )

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        repeated_ngram_spans(df, k=k)
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    want = (
        _duck_with(rows).execute(repeated_ngram_spans_sql("corpus", k=k))
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["n_windows", "n_dup_windows", "dup_fraction", "keep"]:
        assert (got[c].values == want[c].values).all(), c


def _excise_model(rows, k):
    """remove_repeated_spans in pure Python — an INDEPENDENT third
    implementation (beside Spark and the DuckDB twin): every k-window
    occurring >= 2 times corpus-wide is cut at every occurrence except
    the lowest (id, pos); cuts are a token-wise union."""
    import re

    toks = {
        i: [t for t in re.split(r"[^a-z0-9]+", txt.lower()) if t]
        for i, txt in rows
    }
    occ: dict[str, list[tuple[int, int]]] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - k + 1):
            occ.setdefault(" ".join(ts[p:p + k]), []).append((i, p))
    cov: dict[int, set[int]] = {i: set() for i, _ in rows}
    for window_occs in occ.values():
        if len(window_occs) >= 2:
            canon = min(window_occs)
            for (i, p) in window_occs:
                if (i, p) != canon:
                    cov[i].update(range(p, p + k))
    return {
        i: (
            " ".join(t for j, t in enumerate(toks[i]) if j not in cov[i]),
            len(toks[i]),
            len(cov[i]),
        )
        for i, _ in rows
    }


@given(docs=corpus, k=st.integers(2, 5))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_remove_repeated_spans_matches_python_model(spark, docs, k):
    from etl_pack_spark.operators.substrings import remove_repeated_spans

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed_tokens"])
        for r in remove_repeated_spans(df, k=k).collect()
    }
    assert got == _excise_model(rows, k)


@given(
    rows=st.lists(
        st.tuples(st.floats(-100, 100, allow_nan=False), st.integers(0, 50)),
        min_size=1, max_size=30,
    ),
    frac=st.floats(0.1, 0.9),
    buckets=st.integers(1, 8),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_budget_select_matches_duckdb_on_random_weights(spark, rows, frac, buckets):
    """The distributed bucketed prefix sum equals the naive global
    window for ANY scores/weights/budget/bucket count — including
    duplicate scores (id tie-break) and zero weights."""
    import duckdb
    import pandas as pd

    from etl_pack_spark.operators.sampling import budget_select, budget_select_sql

    data = [(i, s, w) for i, (s, w) in enumerate(rows)]
    budget = max(1, int(sum(w for _, _, w in data) * frac))
    df = spark.createDataFrame(data, "doc_id long, quality double, n_tokens long")
    got = sorted(
        map(tuple, budget_select(
            df, budget, "quality", "n_tokens", buckets=buckets).collect())
    )
    con = duckdb.connect()
    con.register("t", pd.DataFrame(data, columns=["doc_id", "quality", "n_tokens"]))
    want = sorted(map(tuple, con.execute(
        budget_select_sql("t", budget, "quality", "n_tokens")).fetchall()))
    assert got == want


# tag soup: angle brackets, slashes, entity fragments, whitespace forms
# (incl. vertical tab — the Java-vs-RE2 \s divergence caught in review)
html_corpus = st.lists(
    st.text(
        alphabet="<>/!&;#ab ps-tyler\"'=.\n\t\x0b\r0123456789",
        min_size=0, max_size=60,
    ),
    min_size=1, max_size=8,
)


@given(docs=html_corpus)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_html_strip_matches_duckdb_on_tag_soup(spark, docs):
    from etl_pack_spark.operators.cleaning import html_strip, html_strip_sql

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        html_strip(df, "doc_id", "text")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    want = (
        _duck_with(rows).execute(html_strip_sql("corpus", "doc_id", "text"))
        .fetchdf().sort_values("id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    for c in ["text_clean", "n_lines"]:
        assert (got[c].values == want[c].values).all(), (c, docs)


# accents + combining marks + C0/C1 controls + newline forms
norm_corpus = st.lists(
    st.text(
        alphabet=st.sampled_from(
            list("ae \n\t\r") + ["́", "é", "\x85", "\x92", "\x07", "\x0b"]
        ),
        min_size=0, max_size=40,
    ),
    min_size=1, max_size=8,
)


@given(docs=norm_corpus)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_normalize_text_matches_duckdb_on_random_unicode(spark, docs):
    from etl_pack_spark.operators.textops import normalize_text, normalize_text_sql

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        normalize_text(df, "doc_id", "text")
        .toPandas().sort_values("id").reset_index(drop=True)
    )
    want = (
        _duck_with(rows).execute(normalize_text_sql("corpus", "doc_id", "text"))
        .fetchdf().sort_values("id").reset_index(drop=True)
    )
    assert len(got) == len(want)
    a, b = got["text_norm"], want["text_norm"]
    same = (a == b) | (a.isna() & b.isna())
    assert same.all(), (docs, a[~same].head(), b[~same].head())


@given(
    cut=st.integers(min_value=0, max_value=655),
    mutations=st.lists(
        st.tuples(st.integers(0, 654), st.integers(0, 255)), min_size=0, max_size=8
    ),
)
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_jpeg_decoder_never_raises_on_mutated_input(spark, cut, mutations):
    """Quarantine contract under fuzzing: truncate and byte-flip a
    real JPEG arbitrarily — decode() must return None or a valid
    (w, h, ch, bytes) tuple, never raise (a corrupt web-crawl image
    must not abort a Spark stage)."""
    from etl_pack_spark.operators.multimodal import jpeg_decode

    data = bytearray(_reference_jpeg(spark))
    for pos, val in mutations:
        if pos < len(data):
            data[pos] = val
    data = bytes(data[: max(4, cut)])
    out = jpeg_decode(data)
    if out is not None:
        w, h, ch, pix = out
        assert len(pix) == w * h * ch


_JPEG_CACHE = {}


def _reference_jpeg(spark):
    if "jpg" not in _JPEG_CACHE:
        jvm = spark.sparkContext._jvm
        BI = jvm.java.awt.image.BufferedImage
        img = BI(24, 16, BI.TYPE_INT_RGB)
        for y in range(16):
            for x in range(24):
                img.setRGB(x, y, ((x * 10 & 255) << 16) | ((y * 15 & 255) << 8) | 60)
        baos = jvm.java.io.ByteArrayOutputStream()
        jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
        _JPEG_CACHE["jpg"] = bytes(baos.toByteArray())
    return _JPEG_CACHE["jpg"]


@given(blob=st.binary(min_size=0, max_size=300))
@settings(max_examples=40, deadline=None)
def test_binary_parsers_never_raise_on_arbitrary_bytes(blob):
    """wav_decode / mp4_meta / jpeg_decode / png_decode on arbitrary
    bytes: None or a well-formed tuple, never an exception."""
    from etl_pack_spark.operators.multimodal import (
        jpeg_decode,
        mp4_meta,
        png_decode,
        wav_decode,
    )

    for fn in (jpeg_decode, mp4_meta, png_decode, wav_decode):
        fn(blob)  # must not raise

    # and a RIFF/ftyp-prefixed variant to get past the magic checks
    wav_decode(b"RIFF\x00\x00\x00\x00WAVE" + blob)
    mp4_meta(b"\x00\x00\x00\x10ftypisom\x00\x00\x02\x00" + blob)
    jpeg_decode(b"\xff\xd8" + blob)
    png_decode(b"\x89PNG\r\n\x1a\n" + blob)


# random small graphs: node ids from a tight range so merges/cliques
# are common, batches split arbitrarily
_edge = st.tuples(st.integers(0, 24), st.integers(0, 24)).filter(
    lambda e: e[0] != e[1]
)
_edges = st.lists(_edge, min_size=1, max_size=30)


def _uf_model(edges):
    """Pure-Python union-find: the independent model."""
    parent = {}

    def find(x):
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return sorted((n, find(n)) for n in nodes)


@given(edges=_edges, cut=st.integers(0, 30))
@settings(**SETTINGS)
def test_update_clusters_equals_full_history(spark, edges, cut):
    """LAW (r8 incremental cluster maintenance): for ANY pair history
    and ANY split point, folding the second batch into the first
    batch's labeling equals labeling the whole history at once — and
    both equal a pure-Python union-find model."""
    from etl_pack_spark.operators.components import (
        connected_components,
        update_clusters,
    )

    cut = min(cut, len(edges))
    first, second = edges[:cut], edges[cut:]

    def df_of(rows):
        return spark.createDataFrame(rows, "id_a long, id_b long")

    if first and second:
        labels = connected_components(df_of(first))
        out = update_clusters(labels, df_of(second))
    else:
        out = connected_components(df_of(edges))
    got = sorted(map(tuple, out.collect()))
    assert got == _uf_model(edges)


def _survivor_model(edges, scores):
    """Pure-Python survivor rule: per transitive cluster keep the
    max-score member (NULL counts as -inf), min-id tie-break; docs in
    no pair always pass through. The independent model of
    cluster_dedup(survivor_by=)."""
    comp = dict(_uf_model(edges))
    clusters: dict = {}
    for n, r in comp.items():
        clusters.setdefault(r, []).append(n)
    kept = {n for n in scores if n not in comp}  # pass-through docs

    def rank(n):
        s = scores[n]
        return (-(float("-inf") if s is None else float(s)), n)

    for members in clusters.values():
        kept.add(min(members, key=rank))
    return sorted(kept)


@given(
    edges=_edges,
    raw_scores=st.lists(
        st.one_of(st.none(), st.integers(-3, 3)), min_size=36, max_size=36
    ),
    parts=st.integers(1, 5),
)
@settings(**SETTINGS)
def test_cluster_dedup_survivor_matches_model(spark, edges, raw_scores, parts):
    """LAW (r8 verdict #7): for ANY pair graph and ANY score column —
    including NULLs, ties, and all-NULL clusters — cluster_dedup's
    quality-aware survivor pick equals the pure per-cluster argmax
    model (max score, NULL = -inf, min-id tie-break; pass-through for
    unclustered docs), and the kept set is invariant under
    repartitioning."""
    from pyspark.sql import functions as F

    from etl_pack_spark.operators.components import cluster_dedup

    nodes = sorted({n for e in edges for n in e})
    # every clustered node gets a score slot; ids 31-35 are extra
    # never-paired docs that must pass through untouched
    scores = {n: raw_scores[n] for n in nodes}
    for extra in (31, 32, 33):
        scores[extra] = raw_scores[extra]
    df = spark.createDataFrame(
        [(n, None if s is None else float(s)) for n, s in scores.items()],
        "doc_id long, score double",
    ).repartition(parts)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    kept = sorted(
        r["doc_id"]
        for r in cluster_dedup(df, pairs, "doc_id", survivor_by="score")
        .select("doc_id").collect()
    )
    assert kept == _survivor_model(edges, scores)
    # score column untouched by the operator: kept rows keep their rows
    out = cluster_dedup(df, pairs, "doc_id", survivor_by="score")
    got_rows = {(r["doc_id"], r["score"]) for r in out.collect()}
    want_rows = {
        (n, None if scores[n] is None else float(scores[n]))
        for n in _survivor_model(edges, scores)
    }
    assert got_rows == want_rows


# ---------------------------------------------------------------------------
# r9: hybrid retrieval laws
# ---------------------------------------------------------------------------

_WORDS = ["cat", "dog", "fox", "mat", "sat", "run", "big", "sky"]
_doc_text = st.lists(
    st.sampled_from(_WORDS), min_size=1, max_size=10
).map(" ".join)
_corpus = st.lists(_doc_text, min_size=2, max_size=6)
_query_words = st.lists(
    st.sampled_from(_WORDS), min_size=1, max_size=4
).map(" ".join)


@given(texts=_corpus, q1=_query_words, q2=_query_words)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_bm25_batch_equals_single_query_law(spark, texts, q1, q2):
    """LAW: for ANY corpus and ANY two queries, the batch operator's
    per-query slice equals the single-query operator (same scores,
    same ranking) — batching is a plan transformation, never a
    semantics change."""
    from etl_pack_spark.operators.retrieval import bm25_topk, bm25_topk_batch

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    qdf = spark.createDataFrame(
        [(0, q1), (1, q2)], "q_id long, text string"
    )
    batch = bm25_topk_batch(df, qdf, "doc_id", "text", k=10).collect()
    for qid, q in ((0, q1), (1, q2)):
        single = bm25_topk(df, "doc_id", "text", q, k=10).collect()
        mine = sorted(
            (r for r in batch if r["q_id"] == qid), key=lambda r: r["rk"]
        )
        assert [r["id"] for r in mine] == [r["id"] for r in single]
        for m, s in zip(mine, single):
            assert abs(m["score"] - s["score"]) <= 1e-12 * max(
                1.0, abs(s["score"])
            )


def _rrf_model(arms, k, rrf_k=60):
    """Pure-Python RRF: the independent model."""
    from collections import defaultdict

    score = defaultdict(float)
    per_arm = defaultdict(dict)
    for name, rows in arms.items():
        for q, d, rk in rows:
            score[(q, d)] += 1.0 / (rrf_k + rk)
            per_arm[(q, d)][name] = rk
    out = defaultdict(list)
    for (q, d), s in score.items():
        out[q].append((round(s, 9), d))
    result = []
    for q, items in out.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        for rk, (s, d) in enumerate(items[:k], start=1):
            result.append((
                q, d,
                per_arm[(q, d)].get("a"),
                per_arm[(q, d)].get("b"),
                s, rk,
            ))
    return sorted(result, key=lambda t: (t[0], t[5]))


_arm = st.lists(
    st.tuples(st.integers(0, 1), st.integers(0, 5)), min_size=0, max_size=8,
    unique=True,
).map(lambda pairs: [
    (q, d, rk)
    for q in (0, 1)
    for rk, (qq, d) in enumerate(
        [p for p in pairs if p[0] == q], start=1
    )
])


@given(a=_arm, b=_arm, k=st.integers(1, 6))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_rrf_fuse_matches_model(spark, a, b, k):
    """LAW: rrf_fuse over ANY two ranked arms equals the pure-Python
    fusion model — scores, per-arm rank columns (NULL when absent),
    membership, and the (rrf DESC, doc) ranking."""
    from etl_pack_spark.operators.retrieval import rrf_fuse

    if not a and not b:
        return
    def df_of(rows):
        return spark.createDataFrame(
            rows, "q_id long, doc_id long, rk int"
        ) if rows else spark.createDataFrame([], "q_id long, doc_id long, rk int")

    got = sorted(
        map(tuple, rrf_fuse({"a": df_of(a), "b": df_of(b)}, k=k).collect()),
        key=lambda t: (t[0], t[5]),
    )
    want = _rrf_model({"a": a, "b": b}, k)
    assert [
        (q, d, ra, rb, s, rk) for q, d, ra, rb, s, rk in got
    ] == want


def _c4_model(text, min_words, min_lines, badwords):
    """Pure-Python model of the C4 disposition (require_terminal=False):
    the independent re-derivation the Spark expressions must equal."""
    import re

    from etl_pack_spark.operators.cleaning import (
        DOC_BLOCKLIST,
        LINE_BLOCKLIST,
        STAGE_DOC_BLOCKLIST,
        STAGE_MIN_LINES,
    )

    t = text if text is not None else ""
    lower = t.lower()
    blocked = any(s in lower for s in DOC_BLOCKLIST) or any(
        w in [x for x in re.split("[^a-z0-9]+", lower) if x] for w in badwords
    )
    lines = t.split("\n")
    kept = [
        l for l in lines
        if len([w for w in re.split(r"\s+", l.strip()) if w]) >= min_words
        and not any(s in l.lower() for s in LINE_BLOCKLIST)
    ]
    if blocked:
        return STAGE_DOC_BLOCKLIST, None, len(lines), len(kept)
    if len(kept) < min_lines:
        return STAGE_MIN_LINES, None, len(lines), len(kept)
    return None, "\n".join(kept), len(lines), len(kept)


@given(
    docs=st.lists(
        st.one_of(
            st.none(),
            st.text(alphabet="ab cookie{policy\nlorem ipsum.", max_size=60),
        ),
        min_size=1, max_size=8,
    ),
    min_words=st.integers(0, 4),
    min_lines=st.integers(0, 3),
)
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_c4_disposition_matches_python_model(spark, docs, min_words, min_lines):
    """r10: disposition over arbitrary text (incl. NULLs, blocklist
    fragments, newlines) equals an independent pure-Python model, and
    c4_clean is exactly its kept slice."""
    from pyspark.sql import functions as F

    from etl_pack_spark.operators.cleaning import c4_clean, c4_disposition

    rows = list(enumerate(docs))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kw = dict(min_words=min_words, min_lines=min_lines,
              badwords=["lorem"], require_terminal=False)
    got = {
        r["id"]: (r["drop_stage"], r["text_clean"], r["n_lines"], r["n_kept"])
        for r in c4_disposition(df, "doc_id", "text", **kw).collect()
    }
    want = {
        i: _c4_model(t, min_words, min_lines, ["lorem"]) for i, t in rows
    }
    assert got == want
    survivors = {
        r["id"]: r["text_clean"]
        for r in c4_clean(df, "doc_id", "text", **kw).collect()
    }
    assert survivors == {
        i: tc for i, (stage, tc, _, _) in want.items() if stage is None
    }


# r12: datacard conservation laws over arbitrary corpora — the card's
# grand-total row must account for every document and every token the
# group rows report, for any text (incl. NULLs) and any label mix.
doc_text = st.one_of(st.none(), st.text(
    alphabet=st.characters(min_codepoint=0x20, max_codepoint=0x24F),
    min_size=0, max_size=40,
))
doc_lang = st.sampled_from(["en", "de", "es", "fr", None])
doc_rows = st.lists(
    st.tuples(doc_text, doc_lang), min_size=1, max_size=12,
)


@given(rows=doc_rows)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow,
                                 HealthCheck.function_scoped_fixture])
def test_datacard_conservation_laws(spark, rows):
    from etl_pack_spark.operators.quality import corpus_datacard

    docs = spark.createDataFrame(
        [(i, t, g) for i, (t, g) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )
    card = corpus_datacard(docs, accuracy=None).collect()
    totals = [r for r in card if r["is_total"] == 1]
    groups = [r for r in card if r["is_total"] == 0]
    assert len(totals) == 1
    tot = totals[0]
    assert tot["n_docs"] == len(rows)
    assert sum(g["n_docs"] for g in groups) == tot["n_docs"]
    assert sum(g["n_tokens_total"] for g in groups) == tot["n_tokens_total"]
    assert sum(g["n_chars_total"] for g in groups) == tot["n_chars_total"]
    assert sum(g["n_null_text"] for g in groups) == tot["n_null_text"]
    assert tot["n_null_text"] == sum(1 for t, _ in rows if t is None)
    # exactly one group row per distinct label (NULL label is a group)
    assert len(groups) == len({g for _, g in rows})


word = st.text(alphabet="abcdefgh", min_size=1, max_size=4)
stride_docs = st.lists(
    st.lists(word, min_size=0, max_size=24).map(lambda ws: " ".join(ws)),
    min_size=1, max_size=6,
)


@given(docs=stride_docs, stride=st.sampled_from([2, 4, 16]))
@settings(**SETTINGS)
def test_stride_sampling_law_matches_hashlib_model(spark, docs, stride):
    """r13 stride law, model-checked: the sampled window set of a doc
    is EXACTLY its distinct k-gram windows whose md5 first byte falls
    in the residue class — computed independently in pure Python —
    and stride=1 reproduces the full set. Pins both the engine's
    sampling arithmetic and its tokenization against an independent
    model."""
    import re as _re

    from etl_pack_spark.operators.substrings import repeated_ngram_spans

    k = 3
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string")

    def model_windows(text: str) -> set[str]:
        toks = [t for t in _re.split(r"[^a-z0-9]+", text.lower()) if t]
        return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}

    def sampled(wins: set[str], s: int) -> set[str]:
        return {
            w for w in wins
            if int(hashlib.md5(w.encode()).hexdigest()[:2], 16) % s == 0
        }

    full = {r["doc_id"]: r["n_windows"] for r in
            repeated_ngram_spans(df, k=k, stride=1).collect()}
    samp = {r["doc_id"]: r["n_windows"] for r in
            repeated_ngram_spans(df, k=k, stride=stride).collect()}
    for i, text in enumerate(docs):
        wins = model_windows(text)
        assert full[i] == len(wins)
        assert samp[i] == len(sampled(wins, stride))

"""Corpus-level repeated-substring detection (exact-substring dedup,
approximated at fixed window length).

Lee et al. 2022, "Deduplicating Training Data Makes Language Models
Better" (arXiv:2107.06499) remove any ≥50-token substring that appears
verbatim more than once in the corpus, found with a suffix array — a
global sorted structure that does not distribute. The standard
distributed approximation (used here) slides a fixed ``k``-token window
over every document and flags windows whose text occurs in more than
one document: any verbatim overlap of length ≥ k contains at least one
shared window, so window-level detection is exact for overlaps ≥ k
(shorter overlaps are invisible — the approximation).

This complements the doc-level near-dup family (`neardup.py`: whole-doc
MinHash/SimHash) and the line-level `cleaning.dedup_lines`: it catches
long shared PASSAGES buried inside otherwise-distinct documents
(boilerplate licenses, quoted articles, templated sections).

Scale shape: windows are the posexplode+lead shingle stream (codegen,
no per-doc arrays), hashed to 16-byte md5 before any shuffle so the
exchange carries hashes, not text. Corpus-wide duplication statistics
are map-side-COMBINABLE ``groupBy(h)`` aggregates (count / min), never
``... OVER (PARTITION BY h)`` windows: a window aggregate funnels every
occurrence of one hash into a single task, so a corpus-hot k-gram (a
license header in 10^8 documents of a 100 TB crawl) becomes a straggler
or a spill-crawl. With partial aggregation the hot hash costs one
partial row per map partition, and the only place occurrences meet
their hash's statistics is an equi-join — which AQE's skew-join
splitting can divide across tasks, unlike a window partition. Nothing
collects; the duplicated-window set is never materialized driver-side.
:func:`overfull_hashes` reports corpus-hot k-grams (the analogue of
``neardup.overfull_buckets``) — purely diagnostic here, because unlike
the candidate-pair joins there is no quadratic blowup to cap: work is
linear in occurrences under every formulation in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_pack_spark.operators.cache import pooled_persist
from etl_pack_spark.operators.tokenize import (
    shingle_rows,
    shingles_sql,
    tokens,
    tokens_sql,
)

# --------------------------------------------------------------------------
# Cost/fidelity knob (r13, round-12 VERDICT #7): content-defined window
# sampling. The windows here already slide at position stride 1 (every
# token offset), so detection is EXACT for overlaps >= k at stride=1 —
# the tunable honest gap vs Lee et al.'s suffix arrays is k itself.
# What a 100 TB run may still want is a COST dial: process only a 1/s
# sample of windows. Position-based striding (keep every s-th offset)
# is wrong for that — two documents share a passage at DIFFERENT
# offsets, so their sampled windows have different phases and never
# align. Hash-mod sampling is alignment-invariant: a window is kept iff
# a byte of its md5 (a content hash both engines already compute)
# falls in the selected residue class, so every occurrence of the same
# window text is kept or dropped TOGETHER. Cost scales ~1/s; a
# duplicated passage of length L (>= k) contains L-k+1 distinct
# windows and is detected unless every one of them is sampled out —
# miss probability ~(1-1/s)^(L-k+1), i.e. long boilerplate is still
# caught with near-certainty while short overlaps degrade gracefully.
# stride=1 (default) keeps the exact behavior bit-for-bit.
#
# EXCISION coverage is a second, distinct effect (r14): only SAMPLED
# windows can be cut, and consecutive sampled windows inside one
# duplicated passage sit ~s positions apart while each cut covers k
# tokens. For s <= k adjacent cuts overlap and tile the passage (a
# detected passage is excised end-to-end, the same guarantee as
# s=1); for s > k the cuts leave gaps — duplicated fragments of
# expected length ~s-k survive INSIDE passages the detection model
# counts as "excised". Use stride <= k when the goal is removal;
# stride > k is a detection/report dial only.

_HEX = "0123456789abcdef"


def _check_stride(stride: int) -> None:
    if not 1 <= stride <= 256:
        raise ValueError(
            f"stride must be in [1, 256] (one md5 byte drives the "
            f"content-defined sample), got {stride}"
        )


def _sampled(h) -> "F.Column":
    """The sampling value of a window hash: its first md5 byte, 0..255
    (identical arithmetic in the SQL twin)."""
    return F.conv(F.substring(h, 1, 2), 16, 10).cast("int")


def _sampled_sql(h: str) -> str:
    return (
        f"((strpos('{_HEX}', substr({h}, 1, 1)) - 1) * 16"
        f" + (strpos('{_HEX}', substr({h}, 2, 1)) - 1))"
    )


def overfull_hashes(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    threshold: int = 100_000,
    distinct: bool = False,
) -> DataFrame:
    """The k-gram window hashes occurring more than ``threshold`` times
    corpus-wide, with their counts and one sample text — the skew
    VISIBILITY surface for this module (mirror of
    ``neardup.overfull_buckets``). One map-side-combinable aggregate.

    Unlike the near-dup candidate joins there is nothing to CAP here:
    both operators below are linear in occurrences and keep hot hashes
    off single tasks by construction (combinable aggregates + AQE-
    splittable equi-joins), so a hot k-gram is a cost observation, not
    a correctness/stability hazard. ``distinct=True`` counts distinct
    documents per window (the detector's grain) instead of raw
    occurrences (the excision op's grain)."""
    rows = shingle_rows(df, id_col, text_col, k=k, distinct=distinct)
    return (
        rows.groupBy(F.md5(F.col("s")).alias("h"))
        .agg(F.count(F.lit(1)).alias("count"), F.min("s").alias("sample"))
        .where(F.col("count") > threshold)
    )


def repeated_ngram_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_dup_fraction: float = 0.5,
    stride: int = 1,
) -> DataFrame:
    """Per-document repeated-substring report over the whole corpus.

    A *window* is a distinct ``k``-token shingle of a document; a window
    is *duplicated* when its exact text also occurs in at least one
    OTHER document. Output per input row:

    - ``n_windows``      distinct k-token windows in the doc
    - ``n_dup_windows``  of those, how many occur in ≥ 2 docs
    - ``dup_fraction``   n_dup_windows / n_windows (0.0 when the doc
      has fewer than k tokens)
    - ``keep``           dup_fraction ≤ ``max_dup_fraction`` — the
      filter gate (Lee et al. REMOVE the spans; at corpus-curation
      level the practical gate is dropping documents that are mostly
      duplicated material, the posture RefinedWeb/FineWeb take)

    Hot-key posture (r7): duplication used to be ``COUNT OVER
    (PARTITION BY h)``, which lands every occurrence of one hash on a
    single task — a corpus-hot boilerplate k-gram makes that task the
    job. It is now the arithmetic identity ``n_dup_windows =
    n_windows − n_unique_windows``: a window is UNIQUE iff its hash
    has corpus count 1, and a count-1 hash names its sole document via
    ``min(id)``, so everything reduces to map-side-combinable
    ``groupBy`` aggregates (count/min) — a hash seen 10^8 times costs
    one partial row per map partition. Bit-identical to the window
    form (and to the SQL twin, which keeps the window formulation —
    DuckDB is the oracle, not the scale path). The two branches share
    the pooled-persisted distinct-(id, window) stream, so the corpus
    is scanned and tokenized once (filter-pushdown asymmetry between
    the branches defeats plan-level exchange reuse; the persist is the
    reliable sharing mechanism, disk-backed at scale and exactly the
    volume the old window form shuffled anyway).
    ``stride`` (r13) is the content-defined sampling knob (module
    note above): >1 processes only windows whose hash byte falls in
    the residue class, cutting shuffle volume ~1/stride. The report's
    counts then cover SAMPLED windows only — ``dup_fraction`` stays an
    unbiased estimate of the true duplicated fraction (every
    occurrence of a window is kept or dropped together), and overlaps
    of length L are visible with miss probability
    ~(1-1/stride)^(L-k+1). stride=1 is bit-exact with r12.
    """
    _check_stride(stride)
    wins = shingle_rows(df, id_col, text_col, k=k, distinct=True).select(
        F.col(id_col), F.md5(F.col("s")).alias("h")
    )
    if stride > 1:
        wins = wins.where(_sampled(F.col("h")) % stride == 0)
    wins = pooled_persist(wins)
    # distinct (doc, window) rows → per-hash count == number of
    # distinct docs containing the window; min(id) names the sole doc
    # when that count is 1 (combinable: count + min)
    uniq_per_doc = (
        wins.groupBy("h")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min(id_col).alias("solo"))
        .where(F.col("cnt") == 1)
        .groupBy(F.col("solo").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_uniq"))
    )
    per_doc = wins.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_windows"))
    out = (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .join(uniq_per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_windows", F.lit(0)).alias("n_windows"),
            (
                F.coalesce("n_windows", F.lit(0))
                - F.coalesce("n_uniq", F.lit(0))
            ).alias("n_dup_windows"),
        )
    )
    frac = F.when(
        F.col("n_windows") > 0,
        F.col("n_dup_windows").cast("double") / F.col("n_windows").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col, "n_windows", "n_dup_windows", frac.alias("dup_fraction")
    ).withColumn("keep", F.col("dup_fraction") <= F.lit(max_dup_fraction))


def repeated_ngram_spans_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    max_dup_fraction: float = 0.5,
    stride: int = 1,
) -> str:
    """Oracle twin of :func:`repeated_ngram_spans` — same tokenization,
    same distinct-window set, same ≥2-docs rule, same arithmetic, same
    md5-byte content-defined sample at ``stride`` > 1."""
    _check_stride(stride)
    sample = (
        f"WHERE {_sampled_sql('h')} % {stride} = 0" if stride > 1 else ""
    )
    return f"""
    WITH toks AS (
        SELECT {id_col}, {tokens_sql(text_col)} AS t FROM {table}
    ),
    wins AS (
        SELECT {id_col}, h FROM (
            SELECT DISTINCT {id_col}, md5(s) AS h
            FROM (SELECT {id_col}, unnest({shingles_sql('t', k)}) AS s
                  FROM toks)
        ) {sample}
    ),
    flagged AS (
        SELECT {id_col}, (COUNT(*) OVER (PARTITION BY h)) >= 2 AS is_dup
        FROM wins
    ),
    per_doc AS (
        SELECT {id_col}, COUNT(*) AS n_windows,
               SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS n_dup_windows
        FROM flagged GROUP BY {id_col}
    )
    SELECT d.{id_col},
           CAST(COALESCE(p.n_windows, 0) AS BIGINT) AS n_windows,
           -- SUM(BIGINT) is HUGEINT in DuckDB → pandas float64; the
           -- driver's frame compare needs the engine's BIGINT
           CAST(COALESCE(p.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
           CASE WHEN COALESCE(p.n_windows, 0) > 0
                THEN CAST(p.n_dup_windows AS DOUBLE) / CAST(p.n_windows AS DOUBLE)
                ELSE 0.0 END AS dup_fraction,
           (CASE WHEN COALESCE(p.n_windows, 0) > 0
                 THEN CAST(p.n_dup_windows AS DOUBLE) / CAST(p.n_windows AS DOUBLE)
                 ELSE 0.0 END) <= {max_dup_fraction} AS keep
    FROM {table} d LEFT JOIN per_doc p ON d.{id_col} = p.{id_col}
    """


def remove_repeated_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    stride: int = 1,
) -> DataFrame:
    """ExactSubstr-style span EXCISION (Lee et al. 2022 §3 dedup by
    removing the duplicated substrings themselves, not whole
    documents): every ``k``-token window whose text occurs MORE THAN
    ONCE corpus-wide (all occurrences counted — cross-document AND
    within-document) is cut from every occurrence except the canonical
    first (lowest ``(id, pos)``). Returns
    ``(id_col, clean_text, n_tokens, n_removed_tokens)``.

    Guarantee, stated precisely: the canonical occurrence is never
    itself SELECTED for removal, but its tokens can still be cut by
    the removal of a DIFFERENT duplicated window that overlaps it
    (cuts are a token-wise union). So "each repeated passage survives
    exactly once" holds when flagged windows don't overlap a canonical
    one; where they do, content may drop entirely — the same
    over-removal posture as suffix-array ExactSubstr, which also cuts
    span unions without protecting canonical copies from neighbors.
    Both engines (this and the SQL twin) implement the identical rule.

    ``clean_text`` is TOKEN-NORMALIZED (the module's shared lowercase
    token algebra — the same text the detector and the oracle see;
    single-space joined). Overlaps resolve token-wise: a token is cut
    iff ANY non-canonical duplicated window covers it, so the merged
    cut spans are exactly the union of flagged windows. Documents
    shorter than ``k`` tokens pass through untouched (normalized).

    ``stride`` caveat (r14): at ``stride > k`` the sampled cuts no
    longer tile a detected passage — duplicated fragments of expected
    length ~``stride - k`` survive between adjacent sampled windows
    even inside passages the recall model counts as excised. Keep
    ``stride <= k`` when the goal is removal; larger strides are a
    detection-cost dial for the report op, not for excision.

    Complements :func:`repeated_ngram_spans` (the detect/gate report):
    the gate DROPS mostly-duplicated documents; this op KEEPS every
    document and removes the duplicated passages, the choice Lee et
    al. show trains better than document-level dropping alone.

    Scale shape (r7 hot-key posture): occurrences shuffle as 16-byte
    hashes + positions, never text. Duplication counts and the
    canonical pick used to be ``COUNT`` / ``min(struct)`` OVER
    ``PARTITION BY h`` — one exchange, but every occurrence of one
    hash funneled into a single task's window partition, so a
    boilerplate k-gram repeated 10^8 times in a real crawl made that
    task the job (window aggregates are not map-side combinable and
    AQE cannot split a window partition). They are now a
    map-side-COMBINABLE ``groupBy("h")`` aggregate (count +
    min(struct) — a hot hash costs one partial row per map partition)
    kept only where ``cnt >= 2``, equi-joined back onto the occurrence
    stream to pick the non-canonical occurrences. The join is the one
    place occurrences meet their hash's statistics, and an equi-join
    IS skew-splittable: AQE divides an oversized hash partition across
    tasks, replicating the single matching stats row — and at small
    scale AQE broadcasts the stats side outright, so the occurrence
    stream is never re-shuffled at all. Bit-identical to the window
    form and to the SQL twin (which keeps the window formulation —
    DuckDB is the oracle, not the scale path). Downstream, removed
    positions roll up per document (partition key = doc id, fan-in
    bounded by doc length) and the excision itself is pure codegen
    array algebra (``array_except`` of position sets, O(tokens) per
    document) — no UDF anywhere.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    _check_stride(stride)
    # pooled persist: the stats build and the join probe both consume
    # the occurrence stream; persisting it (disk-backed at scale — the
    # same volume the old window form shuffled) keeps the corpus scan
    # + tokenize single-pass. stride > 1 (r13): the content-defined
    # sample (module note) — only sampled windows can be DETECTED and
    # therefore cut, so excision recall follows the same
    # ~(1-1/stride)^(L-k+1) model per duplicated passage; a detected
    # window is still excised from EVERY non-canonical occurrence
    # (kept-or-dropped-together sampling), and stride=1 is bit-exact
    # with r12. Coverage caveat (r14, module note): sampled cuts tile
    # a detected passage only when stride <= k — at stride > k,
    # duplicated fragments of expected length ~stride-k survive
    # between cuts, so keep stride <= k when the goal is removal.
    occ = shingle_rows(
        df, id_col, text_col, k=k, distinct=False, positions=True
    ).select(F.col(id_col), F.col("pos"), F.md5(F.col("s")).alias("h"))
    if stride > 1:
        occ = occ.where(_sampled(F.col("h")) % stride == 0)
    occ = pooled_persist(occ)
    dup_stats = (
        occ.groupBy("h")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min(
                F.struct(F.col(id_col).alias("i"), F.col("pos").alias("p"))
            ).alias("keep"),
        )
        .where(F.col("cnt") >= 2)
    )
    rem = (
        occ.join(dup_stats, "h")
        .where(
            ~(
                (F.col(id_col) == F.col("keep.i"))
                & (F.col("pos") == F.col("keep.p"))
            )
        )
        .select(id_col, "pos")
    )
    cov = rem.groupBy(id_col).agg(
        F.array_sort(
            F.array_distinct(
                F.flatten(
                    F.collect_list(
                        F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
                    )
                )
            )
        ).alias("__cov")
    )
    empty_int = F.array().cast("array<int>")
    base = df.join(cov, id_col, "left").select(
        F.col(id_col),
        # NULL text stays NULL in clean_text (counts read 0) — the
        # same NULL posture as the detector's report
        F.col(text_col).isNull().alias("__isnull"),
        F.coalesce(tokens(text_col), F.array().cast("array<string>")).alias(
            "__t"
        ),
        F.coalesce(F.col("__cov"), empty_int).alias("__cov"),
    )
    kept_idx = F.array_sort(
        F.array_except(
            F.when(
                F.size("__t") > 0, F.sequence(F.lit(0), F.size("__t") - 1)
            ).otherwise(empty_int),
            F.col("__cov"),
        )
    )
    return base.select(
        F.col(id_col),
        F.when(F.col("__isnull"), F.lit(None).cast("string"))
        .otherwise(
            F.array_join(
                F.transform(
                    kept_idx, lambda j: F.element_at(F.col("__t"), j + 1)
                ),
                " ",
            )
        )
        .alias("clean_text"),
        F.size("__t").cast("long").alias("n_tokens"),
        F.size("__cov").cast("long").alias("n_removed_tokens"),
    )


def remove_repeated_spans_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    stride: int = 1,
) -> str:
    """Oracle twin of :func:`remove_repeated_spans` — same tokenization,
    same every-occurrence counting, same lowest-``(id, pos)`` canonical
    survivor, same token-wise cut union, same md5-byte content-defined
    sample at ``stride`` > 1."""
    _check_stride(stride)
    sample = (
        f"WHERE {_sampled_sql('h')} % {stride} = 0" if stride > 1 else ""
    )
    return f"""
    WITH toks AS (
        SELECT {id_col}, {text_col} IS NULL AS isnull,
               COALESCE({tokens_sql(text_col)}, []) AS t
        FROM {table}
    ),
    occ AS (
        SELECT {id_col}, pos, h FROM (
            SELECT {id_col}, r['pos'] AS pos, r['h'] AS h FROM (
                SELECT {id_col}, unnest(
                    CASE WHEN len(t) >= {k} THEN
                      list_transform(generate_series(1, len(t) - {k} + 1),
                        i -> {{'pos': i - 1,
                               'h': md5(array_to_string(t[i:i+{k - 1}], ' '))}})
                    ELSE [] END) AS r
                FROM toks)
        ) {sample}
    ),
    ranked AS (
        SELECT {id_col}, pos,
               COUNT(*) OVER (PARTITION BY h) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY h ORDER BY {id_col}, pos) AS rk
        FROM occ
    ),
    cov AS (
        SELECT {id_col},
               list_sort(list_distinct(flatten(list(sp)))) AS covered
        FROM (SELECT {id_col}, generate_series(pos, pos + {k - 1}) AS sp
              FROM ranked WHERE cnt >= 2 AND rk > 1)
        GROUP BY {id_col}
    )
    SELECT d.{id_col},
           CASE WHEN d.isnull THEN NULL ELSE
               -- COALESCE: DuckDB's array_to_string([]) is NULL where
               -- Spark's array_join([]) is '' (fully-excised docs)
               COALESCE(array_to_string(list_transform(
                   list_sort(list_filter(
                       CASE WHEN len(d.t) > 0
                            THEN generate_series(0, len(d.t) - 1) ELSE [] END,
                       x -> NOT list_contains(COALESCE(c.covered, []), x))),
                   j -> d.t[j + 1]), ' '), '')
           END AS clean_text,
           CAST(len(d.t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(len(c.covered), 0) AS BIGINT) AS n_removed_tokens
    FROM toks d LEFT JOIN cov c ON d.{id_col} = c.{id_col}
    """

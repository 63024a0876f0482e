"""C4-style corpus cleaning: line-level boilerplate removal plus
document-level gates, as pure Catalyst expressions.

The heuristics are the public C4 recipe (Raffel et al. 2020, "Exploring
the Limits of Transfer Learning", Appendix — the cleaning rules behind
the C4 corpus):

  * keep only lines that end in a terminal punctuation mark,
  * keep only lines with at least ``min_words`` words,
  * drop lines mentioning javascript / cookie / privacy-policy
    boilerplate,
  * drop whole documents containing "lorem ipsum", a curly brace
    (code), or any bad-word token,
  * drop documents with fewer than ``min_lines`` surviving lines.

Scale design: everything is a map-only projection over the text column
— higher-order array functions (``filter`` / ``transform`` /
``exists``) on the split lines, no explode, no shuffle, no Python. A
100 TB cleaning pass is therefore a single scan whose cost is the
regex work itself, and it composes with the curation pipeline
(`plans/curate.py`) without adding a stage. All predicates are exact
string/integer logic with DuckDB SQL twins, so the oracle comparison
is hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Terminal punctuation per C4: sentence-enders plus closing quote.
TERMINAL_RE = '[.!?"’”]$'
# Lowercased substrings that mark a boilerplate line.
LINE_BLOCKLIST = ["javascript", "cookie policy", "privacy policy", "terms of use"]
# Lowercased substrings that disqualify the whole document.
DOC_BLOCKLIST = ["lorem ipsum", "{"]

_WORDS = "size(filter(split(trim({l}), '\\\\s+'), w -> w != ''))"


def _line_keep_pred(var: str, min_words: int, require_terminal: bool = True) -> str:
    """SQL predicate (Spark dialect) deciding whether line ``var`` survives.

    ``require_terminal=False`` disables the sentence-ender rule — the
    C4 paper's filter targets web prose; corpora of titles, code docs,
    or keyword text would be emptied by it."""
    blocked = " OR ".join(
        f"contains(lower({var}), '{s}')" for s in LINE_BLOCKLIST
    )
    terminal = f"AND trim({var}) rlike '{TERMINAL_RE}' " if require_terminal else ""
    return (
        f"{_WORDS.format(l=var)} >= {min_words} "
        f"{terminal}"
        f"AND NOT ({blocked})"
    )


def _line_keep_pred_duck(var: str, min_words: int, require_terminal: bool = True) -> str:
    blocked = " OR ".join(
        f"contains(lower({var}), '{s}')" for s in LINE_BLOCKLIST
    )
    terminal = (
        f"AND regexp_matches(trim({var}), '{TERMINAL_RE}') " if require_terminal else ""
    )
    return (
        f"len(list_filter(string_split_regex(trim({var}), '\\s+'), w -> w != '')) >= {min_words} "
        f"{terminal}"
        f"AND NOT ({blocked})"
    )


# Disposition stage labels, in decision order (the document blocklist
# fires first — a blocked doc is dropped regardless of line survivors).
STAGE_DOC_BLOCKLIST = "doc_blocklist"
STAGE_MIN_LINES = "min_lines"


def _check_badwords(badwords: list[str]) -> None:
    """Badwords are matched against tokens split on ``[^a-z0-9]+`` AND
    interpolated into generated Spark/DuckDB expressions — a word with
    any other character (uppercase, space, quote) can never match a
    token and a quote breaks the expression, so reject loudly instead
    of silently filtering nothing (r10, same posture as the rrf
    arm-name validation)."""
    import re

    for w in badwords:
        if not re.fullmatch(r"[a-z0-9]+", w or ""):
            raise ValueError(
                f"badword {w!r} can never match: tokens are lowercase "
                "[a-z0-9]+ runs — pass lowercase alphanumeric words"
            )


def _doc_blocked_pred(text_col: str, badwords: list[str]) -> str:
    pred = " OR ".join(
        f"contains(lower({text_col}), '{s}')" for s in DOC_BLOCKLIST
    )
    if badwords:
        toks = ", ".join(f"'{w}'" for w in badwords)
        pred += (
            f" OR exists(split(lower({text_col}), '[^a-z0-9]+'), "
            f"t -> array_contains(array({toks}), t))"
        )
    return pred


def c4_disposition(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_lines: int = 3,
    badwords: list[str] | None = None,
    require_terminal: bool = True,
) -> DataFrame:
    """Per-document C4 cleaning DISPOSITION over ALL documents (r10):
    ``(id, drop_stage, text_clean, n_lines, n_kept)`` where
    ``drop_stage`` names the first gate that dropped the doc
    (``doc_blocklist`` | ``min_lines``) and is NULL for survivors —
    whose ``text_clean`` matches :func:`c4_clean` exactly (dropped
    docs carry NULL ``text_clean``).

    Production corpus pipelines always report their FUNNEL — how many
    documents each gate removed — and an auditor needs the per-doc
    attribution, not just the survivor set. Same single map-only
    projection as :func:`c4_clean` (which is now the
    ``drop_stage IS NULL`` slice of this op): the audit costs no extra
    scan, no shuffle, no Python. Aggregate with
    :func:`curation_funnel` for the report.
    """
    badwords = badwords if badwords is not None else []
    _check_badwords(badwords)
    # NULL text is an EMPTY document (no line can survive -> the
    # min_lines gate names the drop); without the coalesce the
    # three-valued predicates leave NULL-text docs unclassified
    txt = f"coalesce({text_col}, '')"
    lines = f"split({txt}, '\\n')"
    kept = f"filter({lines}, l -> {_line_keep_pred('l', min_words, require_terminal)})"
    doc_blocked = _doc_blocked_pred(txt, badwords)
    return df.select(
        F.col(id_col).alias("id"),
        F.expr(f"size({lines})").alias("n_lines"),
        F.expr(kept).alias("__kept"),
        F.expr(f"({doc_blocked})").alias("__blocked"),
    ).select(
        "id",
        F.when(F.col("__blocked"), F.lit(STAGE_DOC_BLOCKLIST))
        .when(F.size("__kept") < min_lines, F.lit(STAGE_MIN_LINES))
        .alias("drop_stage"),
        F.when(
            ~F.col("__blocked") & (F.size("__kept") >= min_lines),
            F.array_join("__kept", "\n"),
        ).alias("text_clean"),
        "n_lines",
        F.size("__kept").alias("n_kept"),
    )


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_lines: int = 3,
    badwords: list[str] | None = None,
    require_terminal: bool = True,
) -> DataFrame:
    """Clean ``text_col`` with the C4 recipe.

    Returns ``(id, text_clean, n_lines, n_kept)`` for the documents
    that survive the document-level gates; ``text_clean`` is the
    surviving lines re-joined with newlines. Map-only — no shuffle.
    (The survivor slice of :func:`c4_disposition` — one shared
    implementation, r10.)
    """
    return (
        c4_disposition(
            df, id_col, text_col, min_words, min_lines, badwords,
            require_terminal,
        )
        .where(F.col("drop_stage").isNull())
        .select("id", "text_clean", "n_lines", "n_kept")
    )


def curation_funnel(disposition: DataFrame) -> DataFrame:
    """The funnel report over a :func:`c4_disposition` frame:
    ``(stage, n_docs)`` with survivors under stage ``'kept'``. One
    combinable groupBy over a handful of stage values — report-sized
    output at any corpus size."""
    return disposition.groupBy(
        F.coalesce(F.col("drop_stage"), F.lit("kept")).alias("stage")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def _doc_blocked_pred_duck(text_col: str, badwords: list[str]) -> str:
    pred = " OR ".join(
        f"contains(lower({text_col}), '{s}')" for s in DOC_BLOCKLIST
    )
    if badwords:
        toks = ", ".join(f"'{w}'" for w in badwords)
        pred += (
            f" OR len(list_filter(list_filter(string_split_regex(lower({text_col}), "
            f"'[^a-z0-9]+'), t -> t != ''), t -> list_contains([{toks}], t))) > 0"
        )
    return pred


def c4_disposition_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_lines: int = 3,
    badwords: list[str] | None = None,
    require_terminal: bool = True,
) -> str:
    """DuckDB oracle twin of :func:`c4_disposition` (exact semantics)."""
    badwords = badwords if badwords is not None else []
    _check_badwords(badwords)
    txt = f"coalesce({text_col}, '')"
    lines = f"string_split({txt}, chr(10))"
    kept = f"list_filter({lines}, l -> {_line_keep_pred_duck('l', min_words, require_terminal)})"
    doc_blocked = _doc_blocked_pred_duck(txt, badwords)
    return f"""
    WITH c AS (
        SELECT {id_col} AS id,
               len({lines}) AS n_lines,
               {kept} AS kept,
               ({doc_blocked}) AS blocked
        FROM {table}
    )
    SELECT id,
           CASE WHEN blocked THEN '{STAGE_DOC_BLOCKLIST}'
                WHEN len(kept) < {min_lines} THEN '{STAGE_MIN_LINES}'
           END AS drop_stage,
           CASE WHEN NOT blocked AND len(kept) >= {min_lines}
                THEN array_to_string(kept, chr(10))
           END AS text_clean,
           n_lines, len(kept) AS n_kept
    FROM c
    """


def c4_clean_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    min_lines: int = 3,
    badwords: list[str] | None = None,
    require_terminal: bool = True,
) -> str:
    """DuckDB oracle twin of :func:`c4_clean` (exact semantics; the
    survivor slice of :func:`c4_disposition_sql`)."""
    dispo = c4_disposition_sql(
        table, id_col, text_col, min_words, min_lines, badwords,
        require_terminal,
    )
    return f"""
    SELECT id, text_clean, n_lines, n_kept FROM ({dispo})
    WHERE drop_stage IS NULL
    """


def curation_funnel_sql(disposition_sql: str) -> str:
    """DuckDB twin of :func:`curation_funnel`."""
    return f"""
    SELECT COALESCE(drop_stage, 'kept') AS stage,
           count(*) AS n_docs
    FROM ({disposition_sql}) GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Gopher-style document quality gates (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", Appendix A1.1 — public filtering rules)
# ---------------------------------------------------------------------------

# ≥ `gopher_min_stop_hits` distinct members must appear for a doc to
# look like running English text (the paper uses a small stop list).
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_signals(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Per-document Gopher quality metrics + the composed ``keep`` gate.

    Map-only (one projection, no shuffle, no Python) like
    :func:`c4_clean`; where C4 filters LINES, Gopher gates DOCUMENTS on
    corpus statistics. Returns every doc with its metrics so callers can
    re-threshold without re-scanning; ``keep`` applies the paper's
    defaults.
    """
    words = f"filter(split(trim({text_col}), '\\\\s+'), w -> w != '')"
    n_words = F.expr(f"size({words})")
    mean_wl = F.when(
        n_words > 0,
        F.expr(f"aggregate(transform({words}, w -> length(w)), 0, (a, v) -> a + v)")
        .cast("double") / n_words.cast("double"),
    )
    # '#' or '...' occurrences per word (Gopher's symbol-to-word ratio)
    n_symbols = (
        F.expr(f"size(split({text_col}, '#')) - 1")
        + F.expr(f"size(split({text_col}, '\\\\.\\\\.\\\\.')) - 1")
    )
    symbol_ratio = F.when(n_words > 0, n_symbols.cast("double") / n_words.cast("double"))
    alpha_ratio = F.when(
        n_words > 0,
        F.expr(f"size(filter({words}, w -> w rlike '[a-zA-Z]'))").cast("double")
        / n_words.cast("double"),
    )
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    stop_hits = F.expr(
        f"size(array_intersect(transform({words}, w -> lower(w)), array({stops})))"
    )
    out = df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_word_ratio"),
        stop_hits.alias("stop_hits"),
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("symbol_ratio") < max_symbol_ratio)
        & (F.col("alpha_word_ratio") > min_alpha_word_ratio)
        & (F.col("stop_hits") >= min_stop_hits)
    )
    # Audit rider (r10, same posture as c4_disposition): the FIRST
    # failing rule, in the keep conjunction's order; NULL = kept. A
    # NULL metric fails its rule (keep's coalesce-false semantics), so
    # keep == (drop_reason IS NULL) holds for every row by construction.
    def fails(cond):
        return ~F.coalesce(cond, F.lit(False))

    reason = (
        F.when(
            fails(F.col("n_words").between(min_words, max_words)),
            F.lit("word_count"),
        )
        .when(
            fails(
                F.col("mean_word_len").between(
                    min_mean_word_len, max_mean_word_len
                )
            ),
            F.lit("word_length"),
        )
        .when(fails(F.col("symbol_ratio") < max_symbol_ratio),
              F.lit("symbol_ratio"))
        .when(fails(F.col("alpha_word_ratio") > min_alpha_word_ratio),
              F.lit("alpha_ratio"))
        .when(fails(F.col("stop_hits") >= min_stop_hits),
              F.lit("stopwords"))
    )
    return out.withColumn("keep", F.coalesce(keep, F.lit(False))).withColumn(
        "drop_reason", reason
    )


def gopher_signals_sql(
    table: str,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> str:
    """DuckDB oracle twin of :func:`gopher_signals` (same int/int
    double arithmetic → bit-identical ratios)."""
    stops = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""
    WITH w AS (
        SELECT {id_col},
               list_filter(string_split_regex(trim({text_col}), '\\s+'), x -> x != '') AS ws,
               len(string_split({text_col}, '#')) - 1
                 + len(string_split({text_col}, '...')) - 1 AS n_symbols
        FROM {table}
    ),
    m AS (
        SELECT {id_col},
               len(ws) AS n_words,
               CASE WHEN len(ws) > 0 THEN
                   CAST(list_reduce(list_prepend(0, list_transform(ws, x -> length(x))),
                                    (a, v) -> a + v) AS DOUBLE) / CAST(len(ws) AS DOUBLE)
               END AS mean_word_len,
               CASE WHEN len(ws) > 0 THEN
                   CAST(n_symbols AS DOUBLE) / CAST(len(ws) AS DOUBLE)
               END AS symbol_ratio,
               CASE WHEN len(ws) > 0 THEN
                   CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
                       / CAST(len(ws) AS DOUBLE)
               END AS alpha_word_ratio,
               len(list_intersect(list_transform(ws, x -> lower(x)), [{stops}])) AS stop_hits
        FROM w
    )
    SELECT *,
           coalesce(
               n_words BETWEEN {min_words} AND {max_words}
               AND mean_word_len BETWEEN {min_mean_word_len} AND {max_mean_word_len}
               AND symbol_ratio < {max_symbol_ratio}
               AND alpha_word_ratio > {min_alpha_word_ratio}
               AND stop_hits >= {min_stop_hits}, false) AS keep,
           CASE
             WHEN NOT coalesce(n_words BETWEEN {min_words} AND {max_words}, false)
               THEN 'word_count'
             WHEN NOT coalesce(mean_word_len BETWEEN {min_mean_word_len}
                               AND {max_mean_word_len}, false)
               THEN 'word_length'
             WHEN NOT coalesce(symbol_ratio < {max_symbol_ratio}, false)
               THEN 'symbol_ratio'
             WHEN NOT coalesce(alpha_word_ratio > {min_alpha_word_ratio}, false)
               THEN 'alpha_ratio'
             WHEN NOT coalesce(stop_hits >= {min_stop_hits}, false)
               THEN 'stopwords'
           END AS drop_reason
    FROM m
    """


# ---------------------------------------------------------------------------
# Corpus-wide duplicate-line removal (the C4 "three-sentence span" /
# RefinedWeb line-dedup idea at line granularity): boilerplate lines
# repeat across thousands of documents; remove repeats corpus-wide,
# optionally keeping the first occurrence.
# ---------------------------------------------------------------------------

def dedup_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_occurrences: int = 1,
    keep_first: bool = True,
) -> DataFrame:
    """Remove lines that occur in the corpus more than
    ``max_occurrences`` times; with ``keep_first`` the single earliest
    occurrence (min ``(id, pos)``) survives. Returns
    ``(id, text_clean, n_lines, n_kept)`` for EVERY input document
    (fully-boilerplate docs come back with an empty ``text_clean``).

    Scale shape: explode to (id, pos, line-hash) rows; per-line stats
    are ONE map-side-combinable aggregate (count + min(struct(id,pos))
    — constant state per distinct line); the keep-decision is an
    equi-join on the line hash; reassembly is one groupBy(id). Line
    TEXT never rides a shuffle twice — stats and join both carry the
    md5 only. No driver-side state.
    """
    lines = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lh", F.md5("line"))
    stats = lines.groupBy("lh").agg(
        F.count("*").alias("cnt"),
        F.min(F.struct("id", "pos")).alias("first"),
    )
    kept = (
        lines.join(stats, "lh")
        .where(
            (F.col("cnt") <= max_occurrences)
            | (
                F.lit(keep_first)
                & (F.struct("id", "pos") == F.col("first"))
            )
        )
        .select("id", "pos", "line")
    )
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(pos, line))), x -> x.line)"),
            "\n",
        ).alias("text_clean"),
        F.count("*").alias("n_kept"),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.size(F.split(F.col(text_col), "\n")).alias("n_lines"),
    )
    return (
        base.join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


def dedup_lines_sql(
    table: str,
    id_col: str,
    text_col: str,
    max_occurrences: int = 1,
    keep_first: bool = True,
) -> str:
    """DuckDB oracle twin of :func:`dedup_lines` (window-function
    formulation — same survivors)."""
    keep = "TRUE" if keep_first else "FALSE"
    return f"""
    WITH lines AS (
        SELECT {id_col} AS id, u.pos - 1 AS pos, u.line
        FROM {table},
             LATERAL (SELECT unnest(string_split({text_col}, chr(10))) AS line,
                             generate_subscripts(string_split({text_col}, chr(10)), 1) AS pos) u
    ),
    flagged AS (
        SELECT id, pos, line,
               count(*) OVER (PARTITION BY line) AS cnt,
               row_number() OVER (PARTITION BY line ORDER BY id, pos) AS rn
        FROM lines
    ),
    kept AS (
        SELECT id, pos, line FROM flagged
        WHERE cnt <= {max_occurrences} OR ({keep} AND rn = 1)
    ),
    rebuilt AS (
        SELECT id, string_agg(line, chr(10) ORDER BY pos) AS text_clean,
               count(*) AS n_kept
        FROM kept GROUP BY id
    )
    SELECT b.id,
           coalesce(r.text_clean, '') AS text_clean,
           len(string_split(b.{text_col}, chr(10))) AS n_lines,
           CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept
    FROM (SELECT {id_col} AS id, {text_col} FROM {table}) b
    LEFT JOIN rebuilt r ON r.id = b.id
    """


# ---------------------------------------------------------------------------
# HTML stripping (web-corpus prep: CommonCrawl-style WET extraction —
# the step BEFORE the C4 line/doc gates)
# ---------------------------------------------------------------------------

# block-level closers become newlines BEFORE tag stripping so the line
# structure the C4 gates operate on survives extraction. Whitespace is
# the EXPLICIT class [ \t\n\f\r], not \s: Java's \s matches vertical
# tab where RE2's does not, so \s would silently break oracle parity
_HTML_WS = r"[ \t\n\f\r]"
_HTML_BLOCK_RE = rf"(?i)<(?:br{_HTML_WS}*/?|/p|/div|/li|/tr|/h[1-6]|/blockquote)>"
# no backreference (RE2 has none): a crossed pair like
# <script>…</style> closes at the FIRST closer on both engines —
# identical, and close enough for tag soup
_HTML_DROP_RE = rf"(?is)<(?:script|style)[^>]*>.*?</(?:script|style){_HTML_WS}*>"
_HTML_TAG_RE = r"(?s)<[^>]*>"
_HTML_COMMENT_RE = r"(?s)<!--.*?-->"
# the handful of entities that dominate real HTML; a full entity table
# is a locale/library concern, not an engine one. '&amp;' MUST decode
# LAST: decoding it first would turn author-escaped '&amp;lt;' into
# '&lt;' and then (wrongly) into '<' — double-decoding
_ENTITIES = [
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&"),
]


def html_clean_lines(text_col) -> "F.Column":
    """The extracted-lines array as a standalone Column expression
    (array<string> of non-empty trimmed lines) — composable into any
    projection without a join. See :func:`html_strip` for semantics."""
    x = F.col(text_col) if isinstance(text_col, str) else text_col
    # script/style BEFORE comments: a comment-open inside a script
    # ('if(a<!--b)') would otherwise swallow the </script> closer and
    # leak script code into the extracted text
    x = F.regexp_replace(x, _HTML_DROP_RE, " ")
    x = F.regexp_replace(x, _HTML_COMMENT_RE, " ")
    x = F.regexp_replace(x, _HTML_BLOCK_RE, "\n")
    x = F.regexp_replace(x, _HTML_TAG_RE, " ")
    for src, dst in _ENTITIES:
        x = F.replace(x, F.lit(src), F.lit(dst))
    # per-line: collapse runs of spaces/tabs, trim, drop empty lines
    x = F.regexp_replace(x, r"[ \t\x0b\f\r]+", " ")
    return F.filter(
        F.transform(F.split(x, "\n"), lambda line: F.trim(line)),
        lambda line: line != "",
    )


def html_strip(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Extract readable text from HTML: drop script/style/comment
    blocks, turn block-level tag boundaries into newlines, strip the
    remaining tags (as spaces, preserving word boundaries), decode the
    common entities, collapse horizontal whitespace per line, and drop
    blank lines. Returns ``(id, text_clean, n_lines)``.

    Map-only — a chain of ``regexp_replace``/``replace`` expressions
    inside whole-stage codegen; no shuffle, no Python. Regexes stay in
    the Java∩RE2 common subset so the DuckDB twin is exact.
    """
    lines = html_clean_lines(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        F.array_join(lines, "\n").alias("text_clean"),
        F.size(lines).alias("n_lines"),
    )


def html_clean_lines_sql(text_expr: str) -> str:
    """DuckDB expression twin of :func:`html_clean_lines` — the
    non-empty-trimmed-lines list over any SQL string expression,
    composable into a larger SELECT (same regex chain in the
    Java∩RE2 common subset, same entity order)."""
    x = text_expr
    x = f"regexp_replace({x}, '{_HTML_DROP_RE}', ' ', 'g')"
    x = f"regexp_replace({x}, '{_HTML_COMMENT_RE}', ' ', 'g')"
    x = f"regexp_replace({x}, '{_HTML_BLOCK_RE}', chr(10), 'g')"
    x = f"regexp_replace({x}, '{_HTML_TAG_RE}', ' ', 'g')"
    for src, dst in _ENTITIES:
        d = dst.replace("'", "''")
        x = f"replace({x}, '{src}', '{d}')"
    x = f"regexp_replace({x}, '[ \\t\\x0b\\f\\r]+', ' ', 'g')"
    return f"list_filter(list_transform(string_split({x}, chr(10)), l -> trim(l)), l -> l != '')"


def html_strip_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB oracle twin of :func:`html_strip` — same regex chain
    (RE2 'g' flag == Spark's replace-all default), same entity list,
    same line collapse."""
    lines = html_clean_lines_sql(text_col)
    return f"""
    SELECT {id_col} AS id,
           -- DuckDB array_to_string([]) is NULL where Spark's
           -- array_join is '' — restore '' for non-NULL input
           COALESCE(array_to_string({lines}, chr(10)),
                    CASE WHEN {text_col} IS NULL THEN NULL ELSE '' END
           ) AS text_clean,
           len({lines}) AS n_lines
    FROM {table}
    """

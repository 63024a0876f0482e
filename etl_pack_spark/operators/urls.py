"""URL canonicalization + URL-keyed dedup for web corpora.

Crawl pipelines dedup by URL BEFORE any content hashing (C4 keeps one
page per URL; CCNet dedups per-shard by URL): the same page fetched
twice differs in ads/timestamps, so content-level near-dup is the
expensive fallback, not the first line. That only works if URLs are
canonical — ``http://WWW.Site.com:80/a/b/?utm_source=x&id=1#frag`` and
``https://site.com/a/b?id=1`` should collide.

Everything here is a map-only Column expression chain (Spark's
``try_parse_url`` + regex/array built-ins, whole-stage codegen — no UDF,
no shuffle); the dedup itself is the standard two-phase keep-first.
Canonicalization rules (the common subset of crawler canonicalizers,
pinned by tests/test_urls.py vectors):

  * scheme + host lowercase; scheme collapsed to https (fetch-protocol
    noise, not identity); leading ``www.`` stripped
  * default ports (``:80``, ``:443``) stripped
  * fragment dropped
  * tracking params dropped (``utm_*``, ``fbclid``, ``gclid``,
    ``msclkid`` — see ``TRACKING_PARAMS``), remaining query params
    SORTED (order is transport noise)
  * trailing ``/`` stripped from non-root paths; empty path → ``/``

Precision/recall trade-off of the tracking list: every name on it
merges URLs that differ only in that param — correct for pure
click-attribution noise (``utm_*``, ``fbclid``), but a name that ANY
site uses as content routing would merge genuinely distinct pages and
``dedup_by_url`` would then silently delete the losers. That is why
``ref`` is NOT on the default list (VCS branch refs, forum thread
refs, ``ref=<page>`` routers are content-identifying), even though
some crawlers drop it as Amazon-style referral noise: a kept
duplicate costs one near-dup pass downstream, a merged distinct page
is unrecoverable. Callers who know their corpus can pass their own
``tracking_params`` (regex alternatives, anchored ``^(...)=``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Default tracking-param names (regex alternatives). Deliberately
# conservative — see the module docstring's trade-off note.
TRACKING_PARAMS: tuple[str, ...] = ("utm_[a-z]+", "fbclid", "gclid", "msclkid")


def _tracking_re(params: Sequence[str]) -> str:
    return r"^(" + "|".join(params) + r")="


TRACKING_PARAM_RE = _tracking_re(TRACKING_PARAMS)


def canonical_url_col(
    url, tracking_params: Sequence[str] = TRACKING_PARAMS
) -> Column:
    """The canonical form of ``url`` as a pure Column expression.
    NULL/unparseable inputs (no host) yield NULL. ``tracking_params``
    is the drop-list of query-param name patterns (regex
    alternatives); see the module docstring for the default's
    rationale."""
    u = F.col(url) if isinstance(url, str) else url
    host = F.lower(F.try_parse_url(u, F.lit("HOST")))
    # ALL leading www. labels (single-application would make the
    # canonicalization non-idempotent on www.www.*)
    host = F.regexp_replace(host, r"^(www\.)+", "")
    # port: from the AUTHORITY with userinfo stripped and the match
    # ANCHORED at the end — a greedy scan over the whole authority
    # would backtrack into numeric passwords (user:123@host) and IPv6
    # literals ([2001:db8::1]) and fabricate a port
    hostport = F.regexp_replace(
        F.coalesce(F.try_parse_url(u, F.lit("AUTHORITY")), F.lit("")),
        r"^.*@", "",
    )
    raw_port = F.regexp_extract(hostport, r":(\d+)$", 1)
    port = F.when(raw_port.isin("", "80", "443"), F.lit("")).otherwise(
        F.concat(F.lit(":"), raw_port)
    )
    path = F.coalesce(F.try_parse_url(u, F.lit("PATH")), F.lit(""))
    # ALL trailing slashes (one-at-a-time would be non-idempotent on
    # '/x//'); a fully-stripped path re-roots to '/'
    path = F.regexp_replace(path, r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.try_parse_url(u, F.lit("QUERY"))
    kept = F.filter(
        F.split(F.coalesce(q, F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(_tracking_re(tracking_params)),
    )
    query = F.array_join(F.array_sort(kept), "&")
    tail = F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query))
    return F.when(
        host.isNull() | (host == ""), F.lit(None).cast("string")
    ).otherwise(F.concat(F.lit("https://"), host, port, path, tail))


def dedup_by_url(
    df: DataFrame,
    url_col: str,
    id_col: str,
    keep: str = "min",
    tracking_params: Sequence[str] = TRACKING_PARAMS,
) -> DataFrame:
    """ONE row per canonical URL — the crawl-level first-line dedup.
    Winner per URL is the ``min`` (default) or ``max`` ``id_col``
    (deterministic; with ingest-ordered ids min = first-fetched).
    Rows with a NULL canonical URL (unparseable) are KEPT — dropping
    them would silently delete every malformed-URL doc as "duplicates
    of NULL". Returns the input + ``canonical_url``.

    Scale shape: the same two-phase top-1 as ``domain_cap`` — phase 1
    ranks within (url, input partition) so a mega-duplicated URL never
    funnels through one task; phase 2's shuffle carries at most one
    row per (url, partition).
    """
    if keep not in ("min", "max"):
        raise ValueError(f"keep must be 'min' or 'max', got {keep!r}")
    order = F.col(id_col).asc() if keep == "min" else F.col(id_col).desc()
    with_url = df.withColumn(
        "canonical_url", canonical_url_col(url_col, tracking_params)
    )
    w_local = Window.partitionBy(
        "canonical_url", F.spark_partition_id()
    ).orderBy(order)
    survivors = (
        with_url.where(F.col("canonical_url").isNotNull())
        .withColumn("__r", F.row_number().over(w_local))
        .where(F.col("__r") == 1)
        .drop("__r")
    )
    w_global = Window.partitionBy("canonical_url").orderBy(order)
    deduped = (
        survivors.withColumn("__r", F.row_number().over(w_global))
        .where(F.col("__r") == 1)
        .drop("__r")
    )
    return deduped.unionByName(with_url.where(F.col("canonical_url").isNull()))

"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline; the LSH-bucketed
variant is the scale path (candidates from sign-pattern buckets, exact
re-rank inside). Everything is built from higher-order Catalyst
functions (zip_with/aggregate) — JVM-side, codegen'd, no Python UDF in
the hot path.

Cross-engine determinism: dot products are strict LEFT FOLDS over the
element pairs (Spark ``aggregate``; DuckDB ``list_reduce``). Same
doubles added in the same order → bit-identical sums → similarity
values and rankings agree exactly between engine and oracle. Hyperplane
"randomness" for LSH is md5-derived, so buckets match cross-engine too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def _dot_expr(a: str, b: str) -> str:
    """Strict left-fold dot product (Spark SQL)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _dot_sql(a: str, b: str) -> str:
    """The same fold in DuckDB (list_reduce folds from the first
    element; 0.0 + e1 == e1 exactly, so the sums are identical)."""
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (acc, v) -> acc + v)"
    )


def with_norm(df: DataFrame, vec: str = "embedding", out: str = "norm") -> DataFrame:
    return df.withColumn(out, F.expr(f"sqrt({_dot_expr(vec, vec)})"))


def cosine_neardup_pairs(
    df: DataFrame, id_col: str = "vec_id", vec: str = "embedding", threshold: float = 0.95
) -> DataFrame:
    """All-pairs cosine near-duplicates (id_a < id_b, cos ≥ threshold).
    Quadratic baseline — at scale use :func:`lsh_neardup_pairs`."""
    n = with_norm(df, vec)
    a = n.select(F.col(id_col).alias("id_a"), F.col(vec).alias("va"), F.col("norm").alias("na"))
    b = n.select(F.col(id_col).alias("id_b"), F.col(vec).alias("vb"), F.col("norm").alias("nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cos = F.expr(f"{_dot_expr('va', 'vb')} / (na * nb)")
    return pairs.select("id_a", "id_b", cos.alias("cos_sim")).where(
        F.col("cos_sim") >= threshold
    )


def cosine_neardup_pairs_sql(
    table: str, id_col: str = "vec_id", vec: str = "embedding", threshold: float = 0.95
) -> str:
    return f"""
    WITH n AS (
        SELECT {id_col}, {vec} AS v, sqrt({_dot_sql(vec, vec)}) AS nrm FROM {table}
    )
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
           {_dot_sql('a.v', 'b.v')} / (a.nrm * b.nrm) AS cos_sim
    FROM n a JOIN n b ON a.{id_col} < b.{id_col}
    WHERE {_dot_sql('a.v', 'b.v')} / (a.nrm * b.nrm) >= {threshold}
    """


def cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (brute force): one
    broadcast-able join + window rank. Ties broken by neighbor id."""
    base = with_norm(df, vec)
    q = with_norm(queries, vec).select(
        F.col(id_col).alias("q_id"), F.col(vec).alias("qv"), F.col("norm").alias("qn")
    )
    cand = q.join(
        base.select(F.col(id_col).alias("n_id"), F.col(vec).alias("nv"), F.col("norm").alias("nn")),
        F.col("q_id") != F.col("n_id"),
    )
    cos = F.expr(f"{_dot_expr('qv', 'nv')} / (qn * nn)")
    scored = cand.select("q_id", "n_id", cos.alias("cos_sim"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("n_id"))
    return scored.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= k)


def cosine_topk_sql(
    table: str,
    query_pred: str,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> str:
    return f"""
    WITH n AS (
        SELECT {id_col}, {vec} AS v, sqrt({_dot_sql(vec, vec)}) AS nrm FROM {table}
    ),
    scored AS (
        SELECT q.{id_col} AS q_id, c.{id_col} AS n_id,
               {_dot_sql('q.v', 'c.v')} / (q.nrm * c.nrm) AS cos_sim
        FROM n q JOIN n c ON q.{id_col} != c.{id_col}
        WHERE q.{query_pred}
    )
    SELECT q_id, n_id, cos_sim, rk FROM (
        SELECT q_id, n_id, cos_sim,
               ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_sim DESC, n_id) AS rk
        FROM scored
    ) WHERE rk <= {k}
    """


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (the scale path): md5-derived random hyperplanes
# ---------------------------------------------------------------------------

def _hyperplane_expr(plane: int, dim: int) -> str:
    """Deterministic pseudo-random hyperplane coefficient in [-0.5, 0.5):
    first 4 hex chars of md5('plane:dim') scaled. Cheap, seedless,
    identical on any engine with md5."""
    return (
        f"(CAST(instr('{HEX}', substr(md5('{plane}:{dim}'), 1, 1)) - 1 AS DOUBLE) * 4096.0"
        f" + CAST(instr('{HEX}', substr(md5('{plane}:{dim}'), 2, 1)) - 1 AS DOUBLE) * 256.0"
        f" + CAST(instr('{HEX}', substr(md5('{plane}:{dim}'), 3, 1)) - 1 AS DOUBLE) * 16.0"
        f" + CAST(instr('{HEX}', substr(md5('{plane}:{dim}'), 4, 1)) - 1 AS DOUBLE)"
        f") / 65536.0 - 0.5"
    )


def lsh_bucket_key(vec: str, dims: int, planes: int = 8, plane_offset: int = 0) -> F.Column:
    """Sign pattern of ``planes`` hyperplane projections → bucket key
    string like '10110010'."""
    bits = []
    for p in range(plane_offset, plane_offset + planes):
        terms = " + ".join(
            f"(CAST(element_at({vec}, {d + 1}) AS DOUBLE) * ({_hyperplane_expr(p, d)}))"
            for d in range(dims)
        )
        bits.append(f"CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END")
    return F.expr("concat(" + ", ".join(bits) + ")")


def lsh_neardup_pairs(
    df: DataFrame,
    dims: int,
    id_col: str = "vec_id",
    vec: str = "embedding",
    planes: int = 4,
    tables: int = 4,
    threshold: float = 0.95,
) -> DataFrame:
    """ANN near-dup: OR-amplified hyperplane LSH — ``tables``
    independent sign-pattern buckets (recall ≈ 1-(1-p^planes)^tables),
    exact cosine re-rank only within buckets. Recall < 1 by design
    (scale path); the brute-force query is the exactness baseline.

    At scale: the per-table bucket join is an equi-join on the key, so
    candidate generation is shuffle-bounded by bucket size, never
    all-pairs."""
    keys = [
        lsh_bucket_key(vec, dims, planes, plane_offset=t * planes).alias(f"bk_{t}")
        for t in range(tables)
    ]
    keyed = with_norm(df, vec).select("*", *keys)
    banded = keyed.select(
        F.col(id_col), F.col(vec), F.col("norm"),
        F.posexplode(F.array(*[F.col(f"bk_{t}") for t in range(tables)])).alias("tbl", "bucket"),
    )
    a = banded.select(
        F.col(id_col).alias("id_a"), F.col(vec).alias("va"),
        F.col("norm").alias("na"), "tbl", "bucket",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"), F.col(vec).alias("vb"),
        F.col("norm").alias("nb"), "tbl", "bucket",
    )
    pairs = a.join(b, ["tbl", "bucket"]).where(F.col("id_a") < F.col("id_b"))
    cos = F.expr(f"{_dot_expr('va', 'vb')} / (na * nb)")
    return (
        pairs.select("id_a", "id_b", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
        .distinct()
    )

"""Product quantization (PQ) for embedding columns: train codebooks,
encode vectors to m-byte codes, and ADC top-k search over the codes.

This is the 100 TB story for the ANN family (`operators/similarity.py`):
a 64-dim float32 embedding is 256 bytes; with m=8 sub-quantizers of 16
centroids each it becomes 8 codes of 4 bits — a 32-64× compression that
turns a corpus whose raw vectors need a cluster's worth of RAM into one
whose codes fit in a fraction of it, while asymmetric-distance (ADC)
search scans codes with a per-query lookup table and never touches the
raw vectors. Composes with IVF (`ivf_topk`): IVF prunes WHICH vectors
to score, PQ compresses HOW each one is scored.

Scale shape:

  * Training is on a BOUNDED deterministic sample (lowest
    ``xxhash64(id)`` wins, ``sample_rows`` cap) — the same posture as
    IVF's sampled coarse quantizer: codebooks are kilobytes derived
    from a fixed-size sample, never a full-corpus collect.
  * Encoding is map-only: codebooks ride a broadcast variable into a
    ``mapInPandas`` kernel that argmins each subspace vectorized over
    Arrow batches. No shuffle.
  * ADC search broadcasts per-query distance TABLES (m × k doubles per
    query — for 50 queries ≈ 50 KB), scans the encoded corpus map-side
    emitting each partition's top-k, and merges the bounded partials
    with one window. Shuffled volume is O(k · partitions · queries),
    independent of corpus size.

Determinism: kmeans init is the sample's first-k rows in hash order and
Lloyd iterations are fixed-count with argmin ties resolved to the
lowest centroid id (np.argmin semantics), so codebooks, codes, and ADC
scores are reproducible run-to-run and invariant to partitioning. The
invariant ADC == squared-L2 to the RECONSTRUCTED vector is pinned in
tests against a driver-side numpy twin.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# per-query ADC tables (m × k doubles each) are broadcast to every
# executor — the query frame must stay small; 16k queries ≈ 16k × 8 ×
# 16 × 8 B ≈ 16 MB of tables, a safe ceiling
MAX_QUERY_VECTORS = 16_384


def _hash_sample(
    df: DataFrame, id_col: str, vec: str, sample_rows: int, k: int
) -> np.ndarray:
    """The bounded deterministic training sample shared by every
    quantizer trainer: the ``sample_rows`` vectors with the lowest
    ``xxhash64(id)`` (append-stable), as a float64 matrix; fewer than
    ``k`` rows cannot seed ``k`` centroids and raises."""
    sample = (
        df.select(F.col(id_col).alias("id"), F.col(vec).alias("v"))
        .withColumn("__h", F.xxhash64(F.col("id")))
        .orderBy("__h")
        .limit(sample_rows)
        .toPandas()
    )
    X = np.stack(sample["v"].to_numpy()).astype(np.float64)
    if len(X) < k:
        raise ValueError(f"sample of {len(X)} rows cannot seed k={k} centroids")
    return X


def _collect_queries(queries: DataFrame, id_col: str, vec: str, op: str):
    """Bounded query-side collect shared by the ADC searches: the
    per-query distance tables are broadcast state on every executor,
    so an accidental corpus-sized query frame must be a clear error,
    not a driver OOM. Returns ``(qids ndarray, Q float64 matrix)``."""
    qpdf = (
        queries.select(F.col(id_col).alias("qid"), F.col(vec).alias("qv"))
        .limit(MAX_QUERY_VECTORS + 1)
        .toPandas()
    )
    if len(qpdf) > MAX_QUERY_VECTORS:
        raise ValueError(
            f"{op} got more than {MAX_QUERY_VECTORS} query vectors; the "
            "per-query ADC tables are broadcast state — batch the queries "
            "or raise MAX_QUERY_VECTORS deliberately"
        )
    if len(qpdf) == 0:
        raise ValueError("no query vectors")
    return qpdf["qid"].to_numpy(), np.stack(qpdf["qv"].to_numpy()).astype(np.float64)


def pq_train(
    df: DataFrame,
    dims: int,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec: str = "embedding",
    sample_rows: int = 4096,
    iters: int = 5,
) -> np.ndarray:
    """Train PQ codebooks: ``(m, k, dims//m)`` float64 array.

    The training sample is the ``sample_rows`` corpus vectors with the
    lowest ``xxhash64(id)`` — deterministic, append-stable, and bounded
    (this is a codebook fit on a fixed-size sample, not a data
    collect). Lloyd's algorithm runs ``iters`` fixed iterations per
    subspace; empty clusters keep their previous centroid.
    """
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    X = _hash_sample(df, id_col, vec, sample_rows, k)
    return _train_books(X, dims, m, k, iters)


def _lloyd(sub: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic fixed-iteration Lloyd: first-k init (caller
    provides hash-ordered rows), argmin ties to the lowest centroid,
    empty clusters keep their previous centroid."""
    cent = sub[:k].copy()
    for _ in range(iters):
        d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                cent[c] = sub[mask].mean(axis=0)
    return cent


def _train_books(X: np.ndarray, dims: int, m: int, k: int, iters: int) -> np.ndarray:
    dsub = dims // m
    books = np.empty((m, k, dsub))
    for j in range(m):
        books[j] = _lloyd(X[:, j * dsub : (j + 1) * dsub], k, iters)
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """Encode vectors to ``(id, codes array<smallint>)`` — map-only.

    Each code j is the index of the nearest (squared-L2) centroid of
    subspace j. m codes replace dims floats: 32-64× smaller.
    """
    m, k, dsub = codebooks.shape
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    def encode(batches):
        # NESTED for by-value pickling (executors need not import us)
        import numpy as np

        books = bc.value
        m, k, dsub = books.shape
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "codes": []})
                continue
            X = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            codes = np.empty((len(X), m), dtype=np.int16)
            for j in range(m):
                sub = X[:, j * dsub : (j + 1) * dsub]
                # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per
                # row, so argmin needs only the last two terms
                d2 = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = d2.argmin(axis=1)
            yield pd.DataFrame({"id": pdf["id"].to_numpy(), "codes": list(codes)})

    return df.select(
        F.col(id_col).alias("id"), F.col(vec).alias("v")
    ).mapInPandas(encode, schema="id long, codes array<smallint>")


def pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """ADC top-k: ``(q_id, n_id, adc_dist, rk)`` — nearest by
    asymmetric distance (squared L2 from the query to each corpus
    vector's RECONSTRUCTION), smallest first.

    Per query, a distance table ``T[j][c] = ||q_j - books[j][c]||²`` is
    precomputed once (m × k doubles) and broadcast; scanning a code is
    then m table lookups + adds. Each partition emits its local top-k;
    one window merges the bounded partials.

    The query-side collect is BOUNDED (``MAX_QUERY_VECTORS``): queries
    are small by design (the distance tables are per-query state on
    every executor), and the limit+probe turns an accidental
    corpus-sized query frame into a clear error instead of a driver
    OOM — the same posture as ``pq_train``'s explicit sample limit.
    """
    m, kcent, dsub = codebooks.shape
    spark = encoded.sparkSession
    qids_arr, Q = _collect_queries(queries, id_col, vec, "pq_topk")
    tables = np.empty((len(Q), m, kcent))
    for j in range(m):
        qs = Q[:, j * dsub : (j + 1) * dsub]
        diff = qs[:, None, :] - codebooks[j][None, :, :]
        tables[:, j, :] = (diff**2).sum(axis=2)
    bc = spark.sparkContext.broadcast((qids_arr, tables))

    def scan(batches):
        # NESTED for by-value pickling
        import numpy as np

        qids, tabs = bc.value
        nq, m, kcent = tabs.shape
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"q_id": [], "n_id": [], "adc_dist": []})
                continue
            ids = pdf["id"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # (n, m)
            # gather: dist[q, i] = sum_j tabs[q, j, codes[i, j]]
            n = len(ids)
            dist = np.zeros((nq, n))
            for j in range(m):
                dist += tabs[:, j, codes[:, j]]
            rows = {"q_id": [], "n_id": [], "adc_dist": []}
            # k+1: the query's own vector may sit in this partition and
            # is filtered AFTER the local top-k — one spare slot keeps
            # the merge exact
            kk = min(k + 1, n)
            for qi in range(nq):
                d = dist[qi]
                # FULL (dist, id) lexsort before truncation: argpartition
                # selects an arbitrary subset among EQUAL distances
                # (duplicate docs share codes), which would make the kept
                # candidate — and thus the result — partitioning-dependent
                order = np.lexsort((ids, d))[:kk]
                rows["q_id"].extend([qids[qi]] * len(order))
                rows["n_id"].extend(ids[order].tolist())
                rows["adc_dist"].extend(d[order].tolist())
            yield pd.DataFrame(rows)

    partial = encoded.mapInPandas(scan, schema="q_id long, n_id long, adc_dist double")
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("n_id"))
    return (
        partial.where(F.col("n_id") != F.col("q_id"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )


def pq_reconstruct(codebooks: np.ndarray, codes: np.ndarray) -> np.ndarray:
    """Driver-side numpy twin: decode codes back to the quantized
    vectors (test oracle for the ADC == L2²(q, reconstruction)
    invariant)."""
    m, kcent, dsub = codebooks.shape
    out = np.empty((len(codes), m * dsub))
    for j in range(m):
        out[:, j * dsub : (j + 1) * dsub] = codebooks[j][codes[:, j]]
    return out


# ---------------------------------------------------------------------------
# IVF-PQ: the composed billion-scale ANN recipe (FAISS IVFPQ shape)
# ---------------------------------------------------------------------------

def ivf_pq_index(
    df: DataFrame,
    dims: int,
    nlist: int = 16,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec: str = "embedding",
    sample_rows: int = 4096,
    iters: int = 5,
):
    """Build the composed IVF-PQ index: coarse inverted lists (IVF,
    pruning WHICH vectors a query scores) over PQ codes of the
    RESIDUALS (compressing HOW each one is scored) — the standard
    billion-scale layout: per vector the index stores one small int
    (its list) + m code bytes, never the raw floats.

    Returns ``(cids, centroids, codebooks, encoded)`` where ``cids``/
    ``centroids`` are the coarse quantizer (deterministic sample:
    vectors with ``id < nlist``, the same bit-stable posture as
    ``similarity.ivf_topk``), ``codebooks`` are PQ books trained on a
    bounded hash-sample of residuals, and ``encoded`` is the
    distributed ``(id, cid, codes)`` frame. Residual encoding matters:
    residuals are centered near zero, so the same code budget carries
    ~a list-radius less variance than raw vectors.

    Scale shape: the only driver-side data is the coarse centroids
    (nlist × dims) and the residual training sample; encoding is ONE
    map-only ``mapInPandas`` pass with the quantizers broadcast.
    """
    if dims % m:
        raise ValueError(f"dims={dims} not divisible by m={m}")
    cent_pdf = (
        df.where(F.col(id_col) < nlist)
        .select(F.col(id_col).alias("cid"), F.col(vec).alias("cv"))
        .orderBy("cid")
        .toPandas()
    )
    if len(cent_pdf) == 0:
        raise ValueError(f"no coarse centroids: no ids < nlist={nlist}")
    cids = cent_pdf["cid"].to_numpy()
    C = np.stack(cent_pdf["cv"].to_numpy()).astype(np.float64)

    sample = (
        df.select(F.col(id_col).alias("id"), F.col(vec).alias("v"))
        .withColumn("__h", F.xxhash64(F.col("id")))
        .orderBy("__h")
        .limit(sample_rows)
        .toPandas()
    )
    X = np.stack(sample["v"].to_numpy()).astype(np.float64)
    if len(X) < k:
        raise ValueError(f"sample of {len(X)} rows cannot seed k={k} centroids")
    d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    R = X - C[d2.argmin(axis=1)]
    codebooks = _train_books(R, dims, m, k, iters)

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((cids, C, codebooks))

    def encode(batches):
        # NESTED for by-value pickling
        import numpy as np

        cids_, C_, books = bc.value
        m_, k_, dsub = books.shape
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"id": [], "cid": [], "codes": []})
                continue
            X_ = np.stack(pdf["v"].to_numpy()).astype(np.float64)
            d2_ = -2.0 * (X_ @ C_.T) + (C_**2).sum(axis=1)[None, :]
            a = d2_.argmin(axis=1)
            Rv = X_ - C_[a]
            codes = np.empty((len(X_), m_), dtype=np.int16)
            for j in range(m_):
                sub = Rv[:, j * dsub : (j + 1) * dsub]
                dd = -2.0 * (sub @ books[j].T) + (books[j] ** 2).sum(axis=1)[None, :]
                codes[:, j] = dd.argmin(axis=1)
            yield pd.DataFrame(
                {"id": pdf["id"].to_numpy(), "cid": cids_[a], "codes": list(codes)}
            )

    encoded = df.select(
        F.col(id_col).alias("id"), F.col(vec).alias("v")
    ).mapInPandas(encode, schema="id long, cid long, codes array<smallint>")
    return cids, C, codebooks, encoded


def ivf_pq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    cids: np.ndarray,
    centroids: np.ndarray,
    codebooks: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> DataFrame:
    """ADC top-k over the IVF-PQ index: each query scores ONLY the
    codes in its ``nprobe`` nearest inverted lists, by asymmetric
    distance to the residual reconstruction — the probed fraction
    (≈ nprobe/nlist of the corpus) is scanned with m table lookups per
    code, so a query touches neither raw vectors nor the other lists.
    Returns ``(q_id, n_id, adc_dist, rk)``, smallest distance first,
    ties broken on id.

    Per (query, probed-list) the distance table is built from the
    RESIDUAL ``q - centroid[list]`` (that's what the codes encode);
    broadcast state is nq × nprobe tables of m × k doubles — bounded
    by the same query-count guard as :func:`pq_topk`.
    """
    m, kcent, dsub = codebooks.shape
    spark = encoded.sparkSession
    qids_arr, Q = _collect_queries(queries, id_col, vec, "ivf_pq_topk")
    nq = len(Q)
    nprobe = min(nprobe, len(cids))
    d2c = ((Q[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
    # nprobe nearest lists per query, ties to the lowest cid
    # (lexsort on (cid, dist) -> stable smallest-dist-then-cid order)
    probe_idx = np.empty((nq, nprobe), dtype=np.int64)
    for qi in range(nq):
        order = np.lexsort((cids, d2c[qi]))
        probe_idx[qi] = order[:nprobe]
    tables = np.empty((nq, nprobe, m, kcent))
    probe_cids = np.empty((nq, nprobe), dtype=np.int64)
    for qi in range(nq):
        # probe slots SORTED by cid so the scan's searchsorted needs no
        # per-batch argsort (slot order is irrelevant to correctness)
        ordered = probe_idx[qi][np.argsort(cids[probe_idx[qi]])]
        for pi, ci in enumerate(ordered):
            probe_cids[qi, pi] = cids[ci]
            r = Q[qi] - centroids[ci]
            for j in range(m):
                diff = r[j * dsub : (j + 1) * dsub][None, :] - codebooks[j]
                tables[qi, pi, j] = (diff**2).sum(axis=1)
    bc = spark.sparkContext.broadcast((qids_arr, probe_cids, tables))

    def scan(batches):
        # NESTED for by-value pickling
        import numpy as np

        qids, pcids, tabs = bc.value
        nq_, npr, m_, kc = tabs.shape
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame({"q_id": [], "n_id": [], "adc_dist": []})
                continue
            ids = pdf["id"].to_numpy()
            cid = pdf["cid"].to_numpy()
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            rows = {"q_id": [], "n_id": [], "adc_dist": []}
            for qi in range(nq_):
                mask = np.isin(cid, pcids[qi])
                if not mask.any():
                    continue
                sel = np.nonzero(mask)[0]
                # pcids rows are pre-sorted by cid (see the builder)
                slot = np.searchsorted(pcids[qi], cid[sel])
                d = np.zeros(len(sel))
                for j in range(m_):
                    d += tabs[qi, slot, j, codes[sel, j]]
                kk = min(k + 1, len(sel))
                # full (dist, id) lexsort before truncation: ties among
                # equal ADC distances must keep the LOWEST id or the
                # result becomes partitioning-dependent
                order = np.lexsort((ids[sel], d))[:kk]
                rows["q_id"].extend([qids[qi]] * len(order))
                rows["n_id"].extend(ids[sel][order].tolist())
                rows["adc_dist"].extend(d[order].tolist())
            yield pd.DataFrame(rows)

    partial = encoded.mapInPandas(
        scan, schema="q_id long, n_id long, adc_dist double"
    )
    w = Window.partitionBy("q_id").orderBy(F.asc("adc_dist"), F.asc("n_id"))
    return (
        partial.where(F.col("n_id") != F.col("q_id"))
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
    )

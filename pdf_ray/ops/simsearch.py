"""Similarity search over the ``embeddings`` table.

- ``knn_brute``: exact top-k cosine for a fixed query set — broadcast query
  matrix (ray.put once), one numpy matmul per batch, per-batch partial
  top-k, tiny final reduce. This is the baseline the system brief asks for.
- ``knn_ivf``: LSH(random-hyperplane)-bucketed approximate variant — the
  scale path: queries only scan their own bucket (+neighboring probes).
  Rows-only check (approximate by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .registry import register

N_QUERIES = 8
TOP_K = 5


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _query_matrix(sf_dir: str):
    import pyarrow.parquet as pq

    # filter pushed into the read: only matching row groups leave storage
    # (a full-table read here would be a driver-side scan at scale)
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", N_QUERIES)],
    )
    df = t.to_pandas().sort_values("vec_id")
    Q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
    Q /= np.linalg.norm(Q, axis=1, keepdims=True)
    return df["vec_id"].to_numpy(), Q


def knn_brute(sf_dir: str, k: int = TOP_K):
    """Exact top-k cosine neighbors (neighbor != query) for queries
    vec_id < N_QUERIES. Output (query_id, rank, neighbor_id) — ints only,
    so the driver value-hash is float-free; ties break on neighbor id."""
    import ray

    qids, Q = _query_matrix(sf_dir)
    qref = ray.put((qids, Q))

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        qi, qm = ray.get(qref)
        M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        sims = qm @ M.T  # (nq, batch)
        vids = df["vec_id"].to_numpy()
        out_q, out_n, out_s = [], [], []
        for r, qid in enumerate(qi):
            s = sims[r].copy()
            s[vids == qid] = -np.inf  # exclude self
            take = min(k, len(s))
            idx = np.argpartition(-s, take - 1)[:take]
            out_q.extend([qid] * take)
            out_n.extend(vids[idx])
            out_s.extend(s[idx])
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "neighbor_id": pd.Series(out_n, dtype="int64"),
                "score": out_s,
            }
        )

    cand = _read_embeddings(sf_dir).map_batches(
        partial_topk, batch_format="pandas"
    ).to_pandas()  # <= nq * k * n_batches rows: tiny
    cand = cand.sort_values(
        ["query_id", "score", "neighbor_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    top = cand.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)


register(
    "knn_brute",
    knn_brute,
    f"""
    WITH q AS (SELECT vec_id qid, embedding qe FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.qid, e.vec_id nid,
             list_cosine_similarity(
               list_transform(q.qe, x -> CAST(x AS DOUBLE)),
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))) c
      FROM q JOIN embeddings e ON e.vec_id <> q.qid),
    ranked AS (
      SELECT qid, nid,
             row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) rnk
      FROM scored)
    SELECT qid AS query_id, rnk::BIGINT AS rank, nid AS neighbor_id
    FROM ranked WHERE rnk <= {TOP_K}
    """,
)


N_PLANES = 4  # 16 buckets


def _ivf_index_dir(sf_dir: str) -> str:
    """Cache key covers path + source file identity (mtime, size): a
    regenerated embeddings.parquet must NOT silently reuse a stale
    partitioned index."""
    import hashlib as _hl
    import os

    src = f"{sf_dir}/embeddings.parquet"
    try:
        st = os.stat(src)
        ident = f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}"
    except OSError:
        ident = sf_dir
    return "/tmp/pdf_ray_ivf_" + _hl.md5(ident.encode()).hexdigest()[:16]


def build_ivf_index(sf_dir: str, planes: np.ndarray) -> str:
    """One-time IVF index build: embeddings written as bucket-partitioned
    parquet (``bucket=<id>/`` dirs). Queries then READ only their probe
    buckets' files — real partition pruning, not a scan-and-filter. At
    scale this is the index-build job that amortizes across all queries.
    Atomic via build-to-tmp + rename; cached per sf_dir."""
    import os
    import shutil

    import ray.data as rd

    idx = _ivf_index_dir(sf_dir)
    if os.path.isdir(idx):
        return idx

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        bits = (M @ planes.T) > 0
        df = df.copy()
        df["bucket"] = (
            (bits * (1 << np.arange(N_PLANES))).sum(axis=1).astype("int64")
        )
        return df

    tmp = idx + ".build"
    shutil.rmtree(tmp, ignore_errors=True)
    rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(add_bucket, batch_format="pandas").write_parquet(
        tmp, partition_cols=["bucket"]
    )
    try:
        os.rename(tmp, idx)
    except OSError:  # concurrent builder won the rename
        shutil.rmtree(tmp, ignore_errors=True)
    return idx


def knn_ivf(sf_dir: str, k: int = TOP_K):
    """Approximate top-k: random-hyperplane LSH into 2^N_PLANES buckets,
    with a PARTITIONED index — embeddings are written once as
    bucket-partitioned parquet (build_ivf_index) and each query run reads
    ONLY its probe buckets' partitions (own bucket + 1-bit flips). Non-
    probe buckets never leave storage. Rows-only (approximate)."""
    import os

    import ray
    import ray.data as rd

    rng = np.random.RandomState(7)
    qids, Q = _query_matrix(sf_dir)
    dim = Q.shape[1]
    planes = rng.randn(N_PLANES, dim)

    def bucket_of(M: np.ndarray) -> np.ndarray:
        bits = (M @ planes.T) > 0
        return (bits * (1 << np.arange(N_PLANES))).sum(axis=1)

    q_buckets = bucket_of(Q)
    # multi-probe: own bucket + 1-bit flips
    probes = {
        int(b) ^ (1 << j) for b in q_buckets for j in range(N_PLANES)
    } | {int(b) for b in q_buckets}

    idx = build_ivf_index(sf_dir, planes)
    import glob

    probe_dirs = sorted(
        f
        for b in sorted(probes)
        for f in glob.glob(os.path.join(idx, f"bucket={b}", "*.parquet"))
    )
    qref = ray.put((qids, Q))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        qi, qm = ray.get(qref)
        M = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        M /= np.linalg.norm(M, axis=1, keepdims=True)
        vids = df["vec_id"].to_numpy()
        if len(vids) == 0:
            return pd.DataFrame(
                {"query_id": pd.Series([], dtype="int64"),
                 "neighbor_id": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        sims = qm @ M.T
        out_q, out_n, out_s = [], [], []
        for r, qid in enumerate(qi):
            s = sims[r].copy()
            s[vids == qid] = -np.inf
            take = min(k, len(s))
            idx = np.argpartition(-s, take - 1)[:take] if take else []
            out_q.extend([qid] * take)
            out_n.extend(vids[idx])
            out_s.extend(s[idx])
        return pd.DataFrame(
            {
                "query_id": pd.Series(out_q, dtype="int64"),
                "neighbor_id": pd.Series(out_n, dtype="int64"),
                "score": out_s,
            }
        )

    cand = (
        rd.read_parquet(probe_dirs, columns=["vec_id", "embedding"])
        .map_batches(partial, batch_format="pandas")
        .to_pandas()
    )
    cand = cand.sort_values(
        ["query_id", "score", "neighbor_id"],
        ascending=[True, False, True],
        kind="mergesort",
    )
    top = cand.groupby("query_id", as_index=False).head(k).copy()
    top["rank"] = top.groupby("query_id").cumcount() + 1
    return top[["query_id", "rank", "neighbor_id"]].reset_index(drop=True)


def _ivf_oracle(dim: int = 64) -> str:
    """Exact SQL oracle for knn_ivf: the hyperplanes are SEEDED
    (RandomState(7)), so bucket membership is deterministic — DuckDB
    recomputes each vector's bucket from inlined plane literals (the sign
    of the inner product is normalization-invariant, so the raw embedding
    works), rebuilds the global multi-probe bucket set (own buckets +
    1-bit flips, unioned across queries exactly like the Python), and
    takes the exact top-k within those candidates. This turns the IVF
    query from rows-only into a full rows+schema+hash gate."""
    rng = np.random.RandomState(7)
    planes = rng.randn(N_PLANES, dim)
    lits = [
        "[" + ", ".join(repr(float(v)) for v in p) + "]" for p in planes
    ]
    bucket_expr = " + ".join(
        f"(CASE WHEN list_inner_product(e, {lits[j]}) > 0 "
        f"THEN {1 << j} ELSE 0 END)"
        for j in range(N_PLANES)
    )
    flips = ", ".join(f"({1 << j})" for j in range(N_PLANES))
    return f"""
    WITH emb AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e
      FROM embeddings),
    b AS (SELECT vec_id, e, {bucket_expr} AS bucket FROM emb),
    q AS (SELECT vec_id qid, e qe, bucket qb FROM b
          WHERE vec_id < {N_QUERIES}),
    probes AS (
      SELECT DISTINCT xor(qb, p) AS pb
      FROM q, (VALUES (0), {flips}) t(p)),
    cand AS (SELECT vec_id, e FROM b
             WHERE bucket IN (SELECT pb FROM probes)),
    scored AS (
      SELECT q.qid, c.vec_id nid, list_cosine_similarity(q.qe, c.e) s
      FROM q JOIN cand c ON c.vec_id <> q.qid),
    ranked AS (
      SELECT qid, nid,
             row_number() OVER (PARTITION BY qid ORDER BY s DESC, nid) rnk
      FROM scored)
    SELECT qid AS query_id, rnk::BIGINT AS rank, nid AS neighbor_id
    FROM ranked WHERE rnk <= {TOP_K}
    """


register("knn_ivf", knn_ivf, _ivf_oracle())

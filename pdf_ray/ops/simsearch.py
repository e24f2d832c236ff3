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

    def group_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "rank": pd.Series(
                    range(1, len(g) + 1), index=g.index, dtype="int64"
                ),
                "neighbor_id": g["neighbor_id"].astype("int64"),
            }
        )

    # per-query reduce IN TASKS (nq keys, map-side partials are already
    # <= nq*k per block): the driver receives exactly nq*k rows instead
    # of O(n_blocks) partial top-k candidates
    top = (
        _read_embeddings(sf_dir)
        .map_batches(partial_topk, batch_format="pandas")
        .groupby("query_id")
        .map_groups(group_topk, batch_format="pandas")
        .to_pandas()
    )
    return top.sort_values(["query_id", "rank"], kind="mergesort").reset_index(
        drop=True
    )


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

    def group_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["score", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        return pd.DataFrame(
            {
                "query_id": g["query_id"].astype("int64"),
                "rank": pd.Series(
                    range(1, len(g) + 1), index=g.index, dtype="int64"
                ),
                "neighbor_id": g["neighbor_id"].astype("int64"),
            }
        )

    # per-query reduce in tasks (see knn_brute): driver gets nq*k rows
    top = (
        rd.read_parquet(probe_dirs, columns=["vec_id", "embedding"])
        .map_batches(partial, batch_format="pandas")
        .groupby("query_id")
        .map_groups(group_topk, batch_format="pandas")
        .to_pandas()
    )
    return top.sort_values(["query_id", "rank"], kind="mergesort").reset_index(
        drop=True
    )


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


# -- all-pairs nearest neighbor (exact integer squared-L2) -------------------

NN_CHUNKS = 4
NN_BUCKETS = 64


def nearest_neighbor(sf_dir: str):
    """Every vector's exact nearest neighbor by squared L2 on quantized
    int64 components (monotone in true L2 up to quantization; integer
    arithmetic end-to-end so the result hashes identically to the SQL
    replay — no float argmin boundary flips).

    Shape: the same blocked chunk-pair join as dedup_embedding_cosine —
    vectors chunked by vec_id %% C, each (a, b) chunk-pair group computes
    one cross distance matrix and emits per-vector PARTIAL minima (both
    sides), then a fixed-fan-in bucketed reduce takes the global min per
    vector (ties -> lowest neighbor id). Per-task memory O((n/C)^2),
    all-pairs work inherent to exact NN; C scales with the corpus."""
    import pyarrow as pa

    from .cluster import _quantize_table

    C = NN_CHUNKS
    emb = _read_embeddings(sf_dir)

    def expand(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ids = t.column("vec_id").to_numpy()
        c = ids % C
        idx = np.repeat(np.arange(n), C)
        peer = np.tile(np.arange(C, dtype=np.int64), n)
        cc = c[idx]
        lo = np.minimum(cc, peer)
        hi = np.maximum(cc, peer)
        rep = t.take(pa.array(idx))
        return rep.append_column(
            "gid", pa.array((lo * C + hi).astype("int64"))
        ).append_column("chunk", pa.array(cc.astype("int64")))

    def group_minima(g: pd.DataFrame) -> pd.DataFrame:
        gid = int(g["gid"].iloc[0])
        a, b = gid // C, gid % C
        empty = pd.DataFrame(
            {
                "vec_id": pd.Series(dtype="int64"),
                "nn_id": pd.Series(dtype="int64"),
                "d2": pd.Series(dtype="int64"),
            }
        )

        def side(chunk):
            s = g[g["chunk"] == chunk]
            if not len(s):
                return None, None
            ids = s["vec_id"].to_numpy()
            Q = np.stack(s["embedding"].to_numpy()).astype(np.float64)
            Q = np.floor(Q * 1_000_000 + 0.5).astype(np.int64)
            return ids, Q

        ids_a, Qa = side(a)
        if ids_a is None:
            return empty
        na2 = (Qa * Qa).sum(axis=1)
        if a == b:
            if len(ids_a) < 2:
                return empty
            d2 = na2[:, None] + na2[None, :] - 2 * (Qa @ Qa.T)
            np.fill_diagonal(d2, np.iinfo(np.int64).max)
            rows = [(ids_a, ids_a, d2)]
        else:
            ids_b, Qb = side(b)
            if ids_b is None:
                return empty
            nb2 = (Qb * Qb).sum(axis=1)
            d2 = na2[:, None] + nb2[None, :] - 2 * (Qa @ Qb.T)
            rows = [(ids_a, ids_b, d2), (ids_b, ids_a, d2.T)]
        out_v, out_n, out_d = [], [], []
        for vids, nids, m in rows:
            # per-row min with lowest-id tie-break: order candidate cols
            # by (d2, nn_id) via lexsort once per matrix
            order = np.argsort(nids, kind="stable")
            m2 = m[:, order]
            j = np.argmin(m2, axis=1)  # first min = lowest nn_id
            out_v.append(vids)
            out_n.append(nids[order][j])
            out_d.append(m2[np.arange(len(vids)), j])
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_v).astype("int64"),
                "nn_id": np.concatenate(out_n).astype("int64"),
                "d2": np.concatenate(out_d).astype("int64"),
            }
        )

    partials = (
        emb.map_batches(expand, batch_format="pyarrow")
        .groupby("gid")
        .map_groups(group_minima, batch_format="pandas")
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        v = t.column("vec_id").to_numpy()
        return t.append_column(
            "bucket", pa.array((v % NN_BUCKETS).astype("int32"))
        )

    def bucket_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["vec_id", "d2", "nn_id"], kind="mergesort")
        return g.drop_duplicates("vec_id")[["vec_id", "nn_id", "d2"]]

    return (
        partials.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(
            lambda g: bucket_min(g.drop(columns="bucket")),
            batch_format="pandas",
        )
    )


register(
    "nearest_neighbor",
    nearest_neighbor,
    """
    WITH q AS (SELECT vec_id,
                      list_transform(embedding,
                          x -> CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5)
                                    AS BIGINT)) AS qv
               FROM embeddings),
    d AS (SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
                 list_sum(list_transform(range(1, 65),
                     i -> (a.qv[i] - b.qv[i]) * (a.qv[i] - b.qv[i]))) AS d2
          FROM q a JOIN q b ON a.vec_id <> b.vec_id)
    SELECT vec_id, nn_id, d2::BIGINT AS d2 FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
                                     ORDER BY d2, nn_id) AS rn
        FROM d) WHERE rn = 1
    """,
)


def knn_ivf_recall(sf_dir: str, k: int = TOP_K):
    """ANN self-evaluation: recall@k of the IVF-LSH index vs the exact
    brute-force top-k, per query (n_hits, recall in basis points). Both
    sides are deterministic (seeded hyperplanes, exact tie-breaks), so
    the DuckDB oracle replays BOTH rankings and the intersection —
    the op a pipeline owner runs before trusting the ANN path. The two
    child pipelines keep their own distributed shapes; the join here is
    over 2 * nq * k ranked rows."""
    b = knn_brute(sf_dir, k)
    v = knn_ivf(sf_dir, k)
    m = b.merge(v, on=["query_id", "neighbor_id"], how="left")
    hits = (
        m.groupby("query_id")["rank_y"]
        .count()
        .rename("n_hits")
        .reset_index()
    )
    hits["n_hits"] = hits["n_hits"].astype("int64")
    hits["recall_bp"] = (hits["n_hits"] * 10_000 // k).astype("int64")
    return hits


from .registry import ORACLE_SQL  # noqa: E402  (oracle text reuse)


def _ivf_recall_oracle() -> str:
    return f"""
    WITH b AS ({ORACLE_SQL["knn_brute"]}),
    v AS ({ORACLE_SQL["knn_ivf"]})
    SELECT b.query_id,
           count(v.neighbor_id)::BIGINT AS n_hits,
           (count(v.neighbor_id) * 10000 // {TOP_K})::BIGINT AS recall_bp
    FROM b LEFT JOIN v
      ON b.query_id = v.query_id AND b.neighbor_id = v.neighbor_id
    GROUP BY b.query_id
    """


register("knn_ivf_recall", knn_ivf_recall, _ivf_recall_oracle())

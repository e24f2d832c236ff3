"""Semantic clustering over the ``embeddings`` table: distributed
Lloyd's k-means in EXACT integer arithmetic, plus SemDeDup-shape
within-cluster near-dup pairs.

Why integer: assignments are the output, and the driver's correctness
gate hashes values — float centroid sums are summation-order-dependent
across engines, so every arithmetic step here is quantized to int64
(component = floor(x * 1e6 + 0.5), computed in float64 identically on
both sides) and centroid updates use exact floor division. DuckDB can
then replay the whole iteration chain bit-for-bit as chained CTEs.

Scale shape: centroids are a K x d int64 array (KBs) captured in the
batch closure — the classic broadcast-small-side pattern; each Lloyd's
round is one streaming pass emitting <= K partial rows per batch
(cluster, component-sum bytes, count), then a FIXED-B bucket-hash
reduce (``cl %% B`` groupby) merges them to exactly one row per live
cluster before the driver sees anything — the driver receives <= K
rows total, not O(n_blocks * K * d) bytes. The within-cluster
dedup pass uses the final cluster as its blocking key (the SemDeDup
design point: candidate pairs are bounded per cluster, K grows with the
corpus) with chunked pair expansion inside each group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .registry import register

EMB_DIM = 64
KMEANS_K = 10
KMEANS_ROUNDS = 4  # assignment rounds; ROUNDS-1 centroid updates between
QUANT_SCALE = 1_000_000
# within-cluster near-dup threshold tau = 0.3: tau^2 as an exact fraction
SEMDEDUP_TAU2_NUM = 900
SEMDEDUP_TAU2_DEN = 10_000
SEMDEDUP_PAIR_CHUNK = 2048
KMEANS_REDUCE_BUCKETS = 16  # fixed-B bucket reduce for partials/seed


def _read_embeddings(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _quantize_table(t: pa.Table) -> np.ndarray:
    """list<float> column -> (n, EMB_DIM) int64, exact same float64 op
    chain as the SQL oracle's floor(CAST(x AS DOUBLE)*SCALE + 0.5)."""
    arr = t.column("embedding").combine_chunks()
    vals = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    M = vals.reshape(-1, EMB_DIM)
    return np.floor(M * QUANT_SCALE + 0.5).astype(np.int64)


def _assign(Q: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Exact int64 squared-L2 argmin; ties go to the lowest centroid
    index (np.argmin first-occurrence == SQL ORDER BY d, cl)."""
    d = ((Q[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d, axis=1)


def _reduce_partials_bucketed(parts_ds) -> dict[int, tuple[np.ndarray, int]]:
    """Merge (cl, vsum:binary, cnt) partial rows to ONE row per cluster
    via a fixed-B ``cl %% B`` bucket-hash reduce; the driver receives at
    most K rows (each bucket group sums its clusters' int64 vectors in
    numpy), never the O(n_blocks * K) partial stream."""

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.append_column(
            "bucket",
            pc.cast(
                pc.bit_wise_and(t.column("cl"), KMEANS_REDUCE_BUCKETS - 1),
                pa.int32(),
            ),
        )

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cls, sums, cnts = [], [], []
        for cl, sub in g.groupby("cl"):
            s = np.zeros(EMB_DIM, dtype=np.int64)
            for b in sub["vsum"]:
                s += np.frombuffer(b, dtype=np.int64)
            cls.append(int(cl))
            sums.append(s.tobytes())
            cnts.append(int(sub["cnt"].sum()))
        return pd.DataFrame({"cl": cls, "vsum": sums, "cnt": cnts})

    agg: dict[int, tuple[np.ndarray, int]] = {}
    merged = (
        parts_ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )
    for r in merged.take_all():  # <= K rows, one per live cluster
        agg[r["cl"]] = (np.frombuffer(r["vsum"], dtype=np.int64), r["cnt"])
    return agg


def _kmeans_centroids(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Run KMEANS_ROUNDS-1 update rounds; return (centroids, cluster_ids)
    for the final assignment pass. Deterministic init: the K vectors
    with the smallest vec_ids — per-batch partial bottom-K, then a
    fixed-B ``vec_id %% B`` bucket reduce taking each bucket's bottom-K,
    down to <= B*K rows before the driver merge (the global bottom-K is
    a subset of the union of per-bucket bottom-Ks); no global sort, no
    O(n_blocks*K) driver collect."""
    emb = _read_embeddings(sf_dir)

    def partial_bottomk(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy()
        idx = np.argsort(ids, kind="stable")[:KMEANS_K]
        out = t.take(pa.array(idx))
        import pyarrow.compute as pc

        return out.append_column(
            "bucket",
            pc.cast(
                pc.bit_wise_and(out.column("vec_id"), KMEANS_REDUCE_BUCKETS - 1),
                pa.int32(),
            ),
        )

    def bucket_bottomk(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(KMEANS_K, "vec_id")[["vec_id", "embedding"]]

    seed = (
        emb.map_batches(partial_bottomk, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_bottomk, batch_format="pandas")
        .take_all()
    )  # <= B*K rows
    seed.sort(key=lambda r: r["vec_id"])
    seed = seed[:KMEANS_K]
    C = np.floor(
        np.array([r["embedding"] for r in seed], dtype=np.float64) * QUANT_SCALE
        + 0.5
    ).astype(np.int64)
    cids = np.arange(len(seed), dtype=np.int64)

    for _ in range(KMEANS_ROUNDS - 1):
        Cc, cc = C, cids  # bind for closure

        def partials(t: pa.Table) -> pa.Table:
            Q = _quantize_table(t)
            a = _assign(Q, Cc)
            cl_rows, sums, counts = [], [], []
            for j in range(len(cc)):
                m = a == j
                n = int(m.sum())
                if n:
                    cl_rows.append(int(cc[j]))
                    sums.append(Q[m].sum(axis=0).tobytes())
                    counts.append(n)
            return pa.table(
                {
                    "cl": pa.array(cl_rows, pa.int64()),
                    "vsum": pa.array(sums, pa.binary()),
                    "cnt": pa.array(counts, pa.int64()),
                }
            )

        agg = _reduce_partials_bucketed(
            emb.map_batches(partials, batch_format="pyarrow")
        )
        cids = np.array(sorted(agg), dtype=np.int64)  # empty clusters drop
        C = np.stack(
            [np.floor_divide(agg[int(c)][0], agg[int(c)][1]) for c in cids]
        )
    return C, cids


def semantic_kmeans(sf_dir: str):
    """Final (vec_id, cluster) assignment after the integer Lloyd's
    rounds."""
    C, cids = _kmeans_centroids(sf_dir)

    def final_assign(t: pa.Table) -> pa.Table:
        Q = _quantize_table(t)
        a = _assign(Q, C)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": pa.array(cids[a], pa.int64()),
            }
        )

    return _read_embeddings(sf_dir).map_batches(
        final_assign, batch_format="pyarrow"
    )


def semantic_dedup_pairs(sf_dir: str):
    """SemDeDup shape: near-dup candidate pairs generated ONLY within a
    vector's k-means cluster (cosine >= tau, exact integer compare on the
    quantized vectors: dot >= 0 and dot^2 * DEN >= NUM * |a|^2 * |b|^2 in
    arbitrary-precision ints, zero vectors never pair)."""
    C, cids = _kmeans_centroids(sf_dir)

    def assign_with_vec(t: pa.Table) -> pa.Table:
        Q = _quantize_table(t)
        a = _assign(Q, C)
        return pa.table(
            {
                "vec_id": t.column("vec_id"),
                "cluster": pa.array(cids[a], pa.int64()),
                "qv": pa.array(list(Q), pa.list_(pa.int64())),
            }
        )

    def cluster_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        Q = np.stack(g["qv"].to_numpy()).astype(np.int64)
        cl = int(g["cluster"].iloc[0])
        n2 = (Q * Q).sum(axis=1)
        out_a, out_b = [], []
        CH = SEMDEDUP_PAIR_CHUNK
        for ai in range(0, len(ids), CH):
            Qa = Q[ai : ai + CH]
            for bi in range(ai, len(ids), CH):
                dot = Qa @ Q[bi : bi + CH].T
                ii, jj = np.where(dot >= 0)
                if not len(ii):
                    continue
                # exact arbitrary-precision compare on the >=0 survivors
                d_obj = dot[ii, jj].astype(object)
                na = n2[ai + ii].astype(object)
                nb = n2[bi + jj].astype(object)
                ok = (
                    (d_obj * d_obj * SEMDEDUP_TAU2_DEN >= SEMDEDUP_TAU2_NUM * na * nb)
                    & (na > 0)
                    & (nb > 0)
                )
                gi = ai + ii[ok.astype(bool)]
                gj = bi + jj[ok.astype(bool)]
                keep = gi < gj  # dedup the diagonal/self block
                out_a.append(gi[keep])
                out_b.append(gj[keep])
        if not out_a:
            return pd.DataFrame(
                {
                    "vec_a": pd.Series(dtype="int64"),
                    "vec_b": pd.Series(dtype="int64"),
                    "cluster": pd.Series(dtype="int64"),
                }
            )
        ia = np.concatenate(out_a)
        ib = np.concatenate(out_b)
        return pd.DataFrame(
            {
                "vec_a": ids[ia].astype("int64"),
                "vec_b": ids[ib].astype("int64"),
                "cluster": np.full(len(ia), cl, dtype="int64"),
            }
        )

    return (
        _read_embeddings(sf_dir)
        .map_batches(assign_with_vec, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(cluster_pairs, batch_format="pandas")
    )


def _kmeans_cte_sql() -> str:
    """Chained-CTE replay of the integer Lloyd's rounds (exact)."""
    dim, k, scale = EMB_DIM, KMEANS_K, QUANT_SCALE
    parts = [
        f"""
    q AS (SELECT vec_id,
                 list_transform(embedding,
                     x -> CAST(floor(CAST(x AS DOUBLE) * {scale} + 0.5) AS BIGINT)
                 ) AS qv
          FROM embeddings),
    c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS cl,
                  qv AS cv
           FROM (SELECT * FROM q ORDER BY vec_id LIMIT {k}))"""
    ]
    for t in range(1, KMEANS_ROUNDS + 1):
        parts.append(
            f"""
    d{t} AS (SELECT q.vec_id, q.qv, c.cl,
                    list_sum(list_transform(range(1, {dim + 1}),
                        i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS d
             FROM q, c{t - 1} c),
    a{t} AS (SELECT vec_id, qv, cl FROM (
                SELECT vec_id, qv, cl,
                       row_number() OVER (PARTITION BY vec_id ORDER BY d, cl) AS rn
                FROM d{t}) WHERE rn = 1)"""
        )
        if t < KMEANS_ROUNDS:
            parts.append(
                f"""
    c{t} AS (SELECT cl, list(s ORDER BY i) AS cv FROM (
                SELECT cl, i,
                       -- exact int floor division (np.floor_divide parity):
                       -- subtract the sign-corrected mod first so // is
                       -- exact whatever its rounding mode; no DOUBLE cast
                       -- (sums past 2^53 would round across a boundary)
                       CAST((sum(qv[i]) - ((sum(qv[i]) % count(*))
                             + count(*)) % count(*)) // count(*) AS BIGINT) AS s
                FROM a{t}, range(1, {dim + 1}) r(i)
                GROUP BY cl, i) GROUP BY cl)"""
            )
    return "WITH " + ",".join(parts)


register(
    "semantic_kmeans",
    semantic_kmeans,
    _kmeans_cte_sql()
    + f"""
    SELECT vec_id, cl AS cluster FROM a{KMEANS_ROUNDS}
    """,
)

register(
    "semantic_dedup_pairs",
    semantic_dedup_pairs,
    _kmeans_cte_sql()
    + f""",
    nrm AS (SELECT vec_id, qv, cl,
                   CAST(list_sum(list_transform(range(1, {EMB_DIM + 1}),
                        i -> qv[i] * qv[i])) AS HUGEINT) AS n2
            FROM a{KMEANS_ROUNDS})
    SELECT va AS vec_a, vb AS vec_b, cl AS cluster FROM (
        SELECT a.vec_id AS va, b.vec_id AS vb, a.cl AS cl,
               a.n2 AS na2, b.n2 AS nb2,
               CAST(list_sum(list_transform(range(1, {EMB_DIM + 1}),
                    i -> a.qv[i] * b.qv[i])) AS HUGEINT) AS dot
        FROM nrm a JOIN nrm b ON a.cl = b.cl AND a.vec_id < b.vec_id)
    WHERE dot >= 0 AND na2 > 0 AND nb2 > 0
      AND dot * dot * {SEMDEDUP_TAU2_DEN} >= {SEMDEDUP_TAU2_NUM} * na2 * nb2
    """,
)


def lang_centroids(sf_dir: str):
    """Cross-table vector aggregation: per-language integer centroid of
    the document embeddings — documents(doc_id, lang) ⋈
    embeddings(vec_id, embedding) as a bucketed tagged-union partitioned
    join (both sides corpus-sized; id %% B colocates each pair), per-
    bucket per-lang (vsum, cnt) partials, tiny per-lang merge (|langs|
    rows reach the driver), exact int64 floor-divide centroid. Output:
    (lang, dim, c) rows the SQL oracle replays with the same quantize +
    integer floor-division chain."""
    import ray.data as rd

    B = 64

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        import pyarrow.compute as pc

        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(ids, B - 1), pa.int32()),
                "id": ids,
                "lang": t.column("lang"),
                "embedding": pa.nulls(t.num_rows, pa.list_(pa.float64())),
            }
        )

    def tag_emb(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id")
        import pyarrow.compute as pc

        emb = t.column("embedding").combine_chunks()
        if emb.type != pa.list_(pa.float64()):
            emb = emb.cast(pa.list_(pa.float64()))
        return pa.table(
            {
                "bucket": pc.cast(pc.bit_wise_and(ids, B - 1), pa.int32()),
                "id": ids,
                "lang": pa.nulls(t.num_rows, pa.string()),
                "embedding": emb,
            }
        )

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    ).map_batches(tag_docs, batch_format="pyarrow")
    emb = _read_embeddings(sf_dir).map_batches(tag_emb, batch_format="pyarrow")

    def join_partials(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["lang"].notna()][["id", "lang"]]
        right = g[g["lang"].isna()][["id", "embedding"]]
        j = left.merge(right, on="id", how="inner")
        langs, sums, cnts = [], [], []
        for lang, sub in j.groupby("lang"):
            M = np.stack(sub["embedding"].to_numpy()).astype(np.float64)
            Q = np.floor(M * QUANT_SCALE + 0.5).astype(np.int64)
            langs.append(lang)
            sums.append(Q.sum(axis=0).tobytes())
            cnts.append(len(sub))
        return pd.DataFrame({"lang": langs, "vsum": sums, "cnt": cnts})

    def merge_lang(g: pd.DataFrame) -> pd.DataFrame:
        s = np.zeros(EMB_DIM, dtype=np.int64)
        for b in g["vsum"]:
            s += np.frombuffer(b, dtype=np.int64)
        n = int(g["cnt"].sum())
        c = np.floor_divide(s, n)
        return pd.DataFrame(
            {
                "lang": [g["lang"].iloc[0]] * EMB_DIM,
                "dim": np.arange(EMB_DIM, dtype=np.int64),
                "c": c,
            }
        )

    return (
        docs.union(emb)
        .groupby("bucket")
        .map_groups(
            lambda g: join_partials(g.drop(columns="bucket")),
            batch_format="pandas",
        )
        .groupby("lang")
        .map_groups(merge_lang, batch_format="pandas")
    )


register(
    "lang_centroids",
    lang_centroids,
    f"""
    WITH q AS (
      SELECT d.lang,
             list_transform(e.embedding,
                 x -> CAST(floor(CAST(x AS DOUBLE) * {QUANT_SCALE} + 0.5)
                           AS BIGINT)) AS qv
      FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id)
    SELECT lang, (i - 1)::BIGINT AS dim,
           CAST((sum(qv[i]) - ((sum(qv[i]) % count(*)) + count(*)) % count(*))
                // count(*) AS BIGINT) AS c
    FROM q, range(1, {EMB_DIM + 1}) r(i)
    GROUP BY 1, 2
    """,
)

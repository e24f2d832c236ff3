"""Deduplication operators over the ``documents`` / ``embeddings`` tables.

Five families (system brief): exact hash, n-gram Jaccard (exact, via an
inverted-index pair join — scalable, no O(n^2) driver work), MinHash+LSH
(approximate candidates, verified), SimHash, and embedding-cosine.
SQL-checkable ones carry oracles; the approximate ones are rows-only.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa

from .registry import register

JACCARD_TAU = 0.2
COSINE_TAU = 0.4
SIMHASH_MAX_HAMMING = 2


def _read_documents(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# -- exact ------------------------------------------------------------------


def dedup_exact(sf_dir: str):
    """Exact dedup: md5 over lowercased text, keep lowest doc_id per group
    (hash-partitioned groupby; first-per-group)."""
    from ray.data.aggregate import Count, Min

    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text_hash"] = [
            hashlib.md5(t.lower().encode()).hexdigest() for t in df["text"]
        ]
        return df[["doc_id", "text_hash"]]

    ds = _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        add_hash, batch_format="pandas"
    )
    return ds.groupby("text_hash").aggregate(
        Min("doc_id", alias_name="canonical_doc_id"),
        Count(alias_name="n_docs"),
    )


register(
    "dedup_exact",
    dedup_exact,
    """
    SELECT md5(lower(text)) AS text_hash,
           min(doc_id) AS canonical_doc_id,
           count(*)::BIGINT AS n_docs
    FROM documents GROUP BY 1
    """,
)


# -- n-gram Jaccard (exact, inverted index) ---------------------------------


def _shingles(tokens: list[str], n: int = 3) -> set[str]:
    if len(tokens) < n:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


N_SHINGLE_BUCKETS = 128


def dedup_ngram_jaccard(sf_dir: str, tau: float = JACCARD_TAU):
    """Exact word-3-gram Jaccard pairs >= tau via an inverted-index join:

      docs -> (bucket=hash(shingle)%B, shingle, doc_id) explode
           -> groupby(bucket): per-bucket *vectorized* pandas groupby over
              its shingles, emitting co-occurrence pairs
           -> groupby(pair-bucket): per-bucket pair counts = |A∩B|
           -> jaccard with |A|,|B| -> filter

    Bucketing by shingle hash (not per-shingle map_groups) keeps reducer
    count fixed at B — one pandas call per bucket instead of one per
    distinct shingle (~1M groups at sf0.1, which is per-group-overhead
    death). All-to-all cost stays bounded by shingle co-occurrence, not
    n^2; ultra-common shingles would need a frequency cap (documented
    partitioning assumption — the sf corpora don't hit it). The jaccard
    threshold compare is integer-only so it is float-stable vs the oracle."""

    def explode(batch: pa.Table) -> pa.Table:
        doc_ids, shingle_col, buckets = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            for s in _shingles(text.lower().split(" ")):
                doc_ids.append(doc_id)
                shingle_col.append(s)
                buckets.append(
                    int.from_bytes(hashlib.md5(s.encode()).digest()[:4], "little")
                    % N_SHINGLE_BUCKETS
                )
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.int32()),
                "shingle": pa.array(shingle_col, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
            }
        )

    docs = _read_documents(sf_dir, ["doc_id", "text"])
    inv = docs.map_batches(explode, batch_format="pyarrow")

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, grp in g.groupby("shingle", sort=False):
            if len(grp) < 2:
                continue
            ids = sorted(grp["doc_id"].tolist())
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
            }
        )

    raw_pairs = inv.groupby("bucket").map_groups(
        pairs_of_bucket, batch_format="pandas"
    )

    def add_pair_bucket(batch: pa.Table) -> pa.Table:
        import numpy as np

        a = batch.column("doc_a").to_numpy()
        b = batch.column("doc_b").to_numpy()
        pb = ((a * 1000003 + b) % N_SHINGLE_BUCKETS).astype("int32")
        return batch.append_column("pbucket", pa.array(pb))

    def count_pairs(g: pd.DataFrame) -> pd.DataFrame:
        c = (
            g.groupby(["doc_a", "doc_b"], sort=False)
            .size()
            .reset_index(name="inter")
        )
        return c

    pair_counts = (
        raw_pairs.map_batches(add_pair_bucket, batch_format="pyarrow")
        .groupby("pbucket")
        .map_groups(
            lambda g: count_pairs(g.drop(columns="pbucket")),
            batch_format="pandas",
        )
    )

    # shingle-set sizes: small per-doc table, broadcast for the final filter
    import ray

    def sizes(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "n_sh": pa.array(
                    [
                        len(_shingles(t.lower().split(" ")))
                        for t in batch.column("text").to_pylist()
                    ],
                    pa.int64(),
                ),
            }
        )

    size_df = docs.map_batches(sizes, batch_format="pyarrow").to_pandas()
    size_ref = ray.put(dict(zip(size_df["doc_id"], size_df["n_sh"])))

    def jaccard_filter(df: pd.DataFrame) -> pd.DataFrame:
        sz = ray.get(size_ref)
        na = df["doc_a"].map(sz).astype("int64")
        nb = df["doc_b"].map(sz).astype("int64")
        union = na + nb - df["inter"]
        keep = df["inter"] >= tau * union  # integer-only comparison
        out = df[keep][["doc_a", "doc_b"]].copy()
        return out

    return pair_counts.map_batches(jaccard_filter, batch_format="pandas")


register(
    "dedup_ngram_jaccard",
    dedup_ngram_jaccard,
    f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
    s AS (SELECT doc_id,
                 list_distinct(CASE WHEN len(tk) < 3 THEN [array_to_string(tk, ' ')]
                      ELSE list_transform(range(1, len(tk) - 1),
                                          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
                 END) sh
          FROM t)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM s a JOIN s b ON a.doc_id < b.doc_id
    WHERE len(list_intersect(a.sh, b.sh))
          >= {JACCARD_TAU} * (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))
    """,
)


# -- MinHash + LSH (approximate candidates, verified) -----------------------

_N_HASHES = 64
_N_BANDS = 16  # 16 bands x 4 rows


def _minhash_sig(shingles: set[str]) -> np.ndarray:
    """64 minhashes from md5(shingle) split into 4x16-bit... deterministic:
    we use 64 independent 64-bit hash slots derived from md5(seed||shingle)."""
    if not shingles:
        return np.zeros(_N_HASHES, dtype=np.uint64)
    base = np.array(
        [
            struct.unpack("<QQ", hashlib.md5(s.encode()).digest())
            for s in shingles
        ],
        dtype=np.uint64,
    )  # (n, 2)
    # xorshift mixing per slot: h_i = min over shingles of mix(h1, h2, i)
    i = np.arange(_N_HASHES, dtype=np.uint64)
    # (n, 64): h1 * (2i+1) + h2 * (i^2+3) -- cheap universal-ish family
    vals = (
        base[:, 0:1] * (2 * i + 1)[None, :] + base[:, 1:2] * (i * i + 3)[None, :]
    )
    return vals.min(axis=0)


def dedup_minhash_lsh(sf_dir: str, tau: float = JACCARD_TAU):
    """MinHash(64) + LSH(16 bands x 4): candidate pairs from band-bucket
    collisions, verified with exact Jaccard. Approximate (LSH can miss);
    rows-only driver check. Bands use a groupby shuffle keyed on
    (band_id, band_hash) — the scale path for near-dup at 10^12 docs."""
    from ray.data.aggregate import Count

    import ray

    docs = _read_documents(sf_dir, ["doc_id", "text"])

    def band_rows(batch: pa.Table) -> pa.Table:
        doc_ids, buckets, keys = [], [], []
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            sh = _shingles(text.lower().split(" "))
            sig = _minhash_sig(sh)
            r = _N_HASHES // _N_BANDS
            for b in range(_N_BANDS):
                h = hashlib.md5(
                    bytes([b]) + sig[b * r : (b + 1) * r].tobytes()
                ).hexdigest()[:16]
                doc_ids.append(doc_id)
                keys.append(h)
                buckets.append(int(h[:4], 16) % N_SHINGLE_BUCKETS)
        return pa.table(
            {
                "bucket": pa.array(buckets, pa.int32()),
                "key": pa.array(keys, pa.string()),
                "doc_id": pa.array(doc_ids, pa.int64()),
            }
        )

    def pairs_of_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one pandas call per hash-bucket of band-keys (fixed reducer
        # count), not one per distinct LSH bucket
        out_a, out_b = [], []
        for _, grp in g.groupby("key", sort=False):
            if len(grp) < 2:
                continue
            ids = sorted(set(grp["doc_id"].tolist()))
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        df = pd.DataFrame(
            {
                "doc_a": pd.Series(out_a, dtype="int64"),
                "doc_b": pd.Series(out_b, dtype="int64"),
            }
        )
        return df.drop_duplicates()

    candidates = (
        docs.map_batches(band_rows, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pairs_of_bucket, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="n_bands"))
    )

    # verify candidates with exact Jaccard (broadcast shingle sets: the
    # candidate set is small; at scale verify via a bucketed re-join)
    sh_df = docs.map_batches(
        lambda t: pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sh": pa.array(
                    [
                        list(_shingles(x.lower().split(" ")))
                        for x in t.column("text").to_pylist()
                    ],
                    pa.list_(pa.string()),
                ),
            }
        ),
        batch_format="pyarrow",
    ).to_pandas()
    sh_ref = ray.put(dict(zip(sh_df["doc_id"], sh_df["sh"])))

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        shm = ray.get(sh_ref)
        keep_a, keep_b = [], []
        for a, b in zip(df["doc_a"], df["doc_b"]):
            sa, sb = set(shm[a]), set(shm[b])
            inter = len(sa & sb)
            if inter >= tau * (len(sa) + len(sb) - inter):
                keep_a.append(a)
                keep_b.append(b)
        return pd.DataFrame(
            {
                "doc_a": pd.Series(keep_a, dtype="int64"),
                "doc_b": pd.Series(keep_b, dtype="int64"),
            }
        )

    return candidates.map_batches(verify, batch_format="pandas")


register("dedup_minhash_lsh", dedup_minhash_lsh, None)  # approximate


# -- SimHash ----------------------------------------------------------------


def simhash_pairs(sf_dir: str, max_hamming: int = SIMHASH_MAX_HAMMING):
    """64-bit SimHash near-dup pairs (hamming <= k) found by 4x16-bit
    block LSH (a pair within hamming<=3 must share one block; k>3 uses
    more blocks): bucket on each block -> candidates -> verify hamming.
    Rows-only (bit arithmetic isn't portable SQL)."""
    import ray

    docs = _read_documents(sf_dir, ["doc_id", "text"])

    token_bits: dict[str, np.ndarray] = {}  # per-actor token hash cache

    def bits_of(tok: str) -> np.ndarray:
        got = token_bits.get(tok)
        if got is None:
            h = hashlib.md5(tok.encode()).digest()[:8]
            got = np.where(
                np.unpackbits(np.frombuffer(h, dtype=np.uint8)) > 0, 1, -1
            ).astype(np.int8)
            token_bits[tok] = got
        return got

    def simhash_of(text: str) -> int:
        toks = set(text.lower().split(" "))
        if not toks:
            return 0
        acc = np.sum([bits_of(t) for t in toks], axis=0)
        return int(np.packbits((acc > 0).astype(np.uint8)).view(">u8")[0])

    def hash_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        hs = [simhash_of(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "simhash": pa.array([h & 0x7FFFFFFFFFFFFFFF for h in hs], pa.int64()),
                # 4 x 16-bit blocks as bucket keys
                **{
                    f"b{k}": pa.array(
                        [(h >> (16 * k)) & 0xFFFF for h in hs], pa.int32()
                    )
                    for k in range(4)
                },
            }
        )

    hashed = docs.map_batches(hash_batch, batch_format="pyarrow")
    small = hashed.to_pandas()  # simhash table is 1 row/doc; candidate
    # generation via per-block buckets (scale path: groupby per block)
    ref = ray.put(small)

    import ray.data as rd

    def candidates(_block: pd.DataFrame) -> pd.DataFrame:
        df = ray.get(ref)
        pairs: set[tuple[int, int]] = set()
        for k in range(4):
            for _, grp in df.groupby(f"b{k}"):
                if len(grp) < 2:
                    continue
                grp = grp.sort_values("doc_id")
                ids = grp["doc_id"].to_numpy()
                # vectorized pairwise hamming: bit matrix B in {0,1},
                # hamming = 64 - ones_agree - zeros_agree
                sh = grp["simhash"].to_numpy().astype(np.uint64)
                bits = np.unpackbits(
                    sh.view(np.uint8).reshape(len(sh), 8), axis=1
                ).astype(np.float32)
                ones = bits @ bits.T
                zeros = (1 - bits) @ (1 - bits).T
                hamming = 64 - ones - zeros
                ii, jj = np.where(np.triu(hamming <= max_hamming, k=1))
                for i, j in zip(ii, jj):
                    a, b = int(ids[i]), int(ids[j])
                    pairs.add((a, b) if a < b else (b, a))
        out = sorted(pairs)
        return pd.DataFrame(
            {
                "doc_a": pd.Series([p[0] for p in out], dtype="int64"),
                "doc_b": pd.Series([p[1] for p in out], dtype="int64"),
            }
        )

    return candidates(None)


register("simhash_pairs", simhash_pairs, None)  # rows-only


# -- embedding cosine -------------------------------------------------------


def dedup_embedding_cosine(sf_dir: str, tau: float = COSINE_TAU):
    """Near-dup pairs by embedding cosine >= tau: the embedding matrix is
    broadcast once (ray.put) and each batch does one float64 matmul against
    it — brute-force exact. At 10^12 rows the same stage runs per
    IVF/LSH bucket instead of all-vs-all (see simsearch.knn_ivf)."""
    import ray
    import ray.data as rd

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_df = emb.to_pandas()
    ids = all_df["vec_id"].to_numpy()
    M = np.stack(all_df["embedding"].to_numpy()).astype(np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((ids, M))

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        aid, am = ray.get(ref)
        q = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        sims = q @ am.T  # (batch, n)
        rows, cols = np.where(sims >= tau)
        qa = df["vec_id"].to_numpy()[rows]
        qb = aid[cols]
        keep = qa < qb  # dedup pair orientation, drop self
        return pd.DataFrame(
            {
                "vec_a": pd.Series(qa[keep], dtype="int64"),
                "vec_b": pd.Series(qb[keep], dtype="int64"),
            }
        )

    return emb.map_batches(pairs, batch_format="pandas")


register(
    "dedup_embedding_cosine",
    dedup_embedding_cosine,
    f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= {COSINE_TAU}
    """,
)

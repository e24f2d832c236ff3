"""Exact duplicated-substring detection over the ``documents`` table.

The "dedup by duplicated training-data substrings" operator family
(Lee et al. 2022 shape, without the suffix array): every 5-token window
of every document is checked for existence in ANY other document; each
doc reports how many of its window positions are corpus-duplicated.
Corpora are scored, not mutated — the dup fraction is the downstream
filter key.

Scale shape: the window inverted index is built by a flat-map explode
(one row per DISTINCT window per doc, carrying the in-doc position
count), reduced per window-hash bucket (fixed fan-in B, one vectorized
pandas call per bucket — nunique + where, never a pair expansion, so
hot windows cost O(df) not O(df^2)), then re-keyed by doc for the final
sum. No driver-side state; both shuffles are bucketed.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .registry import register

WINDOW_TOKENS = 5
N_WINDOW_BUCKETS = 128


def _read_documents(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _explode_windows(batch: pa.Table) -> pa.Table:
    """doc rows -> one (bucket, win_hash, doc_id, n_pos) row per DISTINCT
    5-token window (n_pos = number of positions showing it). Docs with
    fewer than 5 tokens emit a zero marker row (hash 0 collides with
    nothing that matters: its dup flag is multiplied by n_pos=0) so every
    doc survives to the final rollup.

    The shuffle key is the window's 64-bit md5 prefix, not the window
    string — ~5x fewer shuffle bytes and an int64 groupby downstream.
    (Counts would only drift on a 64-bit collision between two distinct
    windows sharing a hash bucket AND a doc overlap — ~n^2/2^64; the SQL
    oracle stays exact-equal at any realistic corpus size.)"""
    doc_ids, wins, n_pos = [], [], []
    md5 = hashlib.md5
    for doc_id, text in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        toks = text.lower().split(" ")
        if len(toks) < WINDOW_TOKENS:
            doc_ids.append(doc_id)
            wins.append(0)
            n_pos.append(0)
            continue
        counts: dict[str, int] = {}
        for i in range(len(toks) - WINDOW_TOKENS + 1):
            w = " ".join(toks[i : i + WINDOW_TOKENS])
            counts[w] = counts.get(w, 0) + 1
        for w, c in counts.items():
            doc_ids.append(doc_id)
            wins.append(
                int.from_bytes(md5(w.encode()).digest()[:8], "little", signed=True)
            )
            n_pos.append(c)
    win_arr = np.asarray(wins, dtype=np.int64)
    bucket = (win_arr % N_WINDOW_BUCKETS).astype("int32")
    return pa.table(
        {
            "bucket": pa.array(bucket),
            "win": pa.array(win_arr),
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_pos": pa.array(n_pos, pa.int64()),
        }
    )


def _bucket_reduce(g: pd.DataFrame) -> pd.DataFrame:
    """Within one window-hash bucket: mark windows seen in >= 2 distinct
    docs, then pre-sum per doc (partial rollup; the cross-bucket sum is
    the next stage). Entirely vectorized — no per-window Python."""
    nd = g.groupby("win", sort=False)["doc_id"].transform("nunique")
    dup_pos = np.where(nd.to_numpy() >= 2, g["n_pos"].to_numpy(), 0)
    out = (
        g.assign(dup_pos=dup_pos)
        .groupby("doc_id", as_index=False)
        .agg(dup_windows=("dup_pos", "sum"), n_windows=("n_pos", "sum"))
    )
    return out


def duplicate_ngram_windows(sf_dir: str):
    """Per-doc duplicated-window stats: of a doc's 5-token windows, how
    many positions carry a window that also appears in another document.
    Output: (doc_id, n_windows, dup_windows, dup_frac_bp) — the fraction
    in integer basis points so value hashing is float-free."""
    docs = _read_documents(sf_dir, ["doc_id", "text"])
    inv = docs.map_batches(_explode_windows, batch_format="pyarrow")

    partial = inv.groupby("bucket").map_groups(
        lambda g: _bucket_reduce(g.drop(columns="bucket")),
        batch_format="pandas",
    )

    # cross-bucket per-doc sum as a bucket-hash reduce (doc_id %% B), NOT
    # ray's native groupby().aggregate() — measured on this exact query,
    # the Aggregate operator spent 330s remote wall on 5k docs where the
    # map_groups shuffle spends <1s (same finding that moved events_hourly
    # to this shape in round 2)
    def add_dbucket(t: pa.Table) -> pa.Table:
        d = t.column("doc_id").to_numpy()
        return t.append_column(
            "dbucket", pa.array((d % N_WINDOW_BUCKETS).astype("int32"))
        )

    def doc_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("doc_id", as_index=False).agg(
            dup_windows=("dup_windows", "sum"), n_windows=("n_windows", "sum")
        )

    per_doc = (
        partial.map_batches(add_dbucket, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(
            lambda g: doc_sum(g.drop(columns="dbucket")),
            batch_format="pandas",
        )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n_windows"].to_numpy()
        d = df["dup_windows"].to_numpy()
        bp = np.where(n > 0, (d * 10000) // np.maximum(n, 1), 0)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "n_windows": df["n_windows"].astype("int64"),
                "dup_windows": df["dup_windows"].astype("int64"),
                "dup_frac_bp": bp.astype("int64"),
            }
        )

    return per_doc.map_batches(finish, batch_format="pandas")


register(
    "duplicate_ngram_windows",
    duplicate_ngram_windows,
    f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk FROM documents),
    wins AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(1, len(tk) - {WINDOW_TOKENS - 2}),
                   i -> array_to_string(
                       list_slice(tk, i, i + {WINDOW_TOKENS - 1}), ' ')
               )) AS win
        FROM t
    ),
    df AS (SELECT win, count(DISTINCT doc_id) nd FROM wins GROUP BY win),
    per AS (
        SELECT wins.doc_id,
               count(*) AS n_windows,
               sum(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS dup_windows
        FROM wins JOIN df USING (win)
        GROUP BY wins.doc_id
    )
    SELECT d.doc_id,
           coalesce(per.n_windows, 0)::BIGINT AS n_windows,
           coalesce(per.dup_windows, 0)::BIGINT AS dup_windows,
           CASE WHEN coalesce(per.n_windows, 0) = 0 THEN 0
                ELSE per.dup_windows * 10000 // per.n_windows
           END::BIGINT AS dup_frac_bp
    FROM documents d LEFT JOIN per USING (doc_id)
    """,
)

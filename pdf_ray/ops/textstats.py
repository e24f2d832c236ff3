"""Text-analysis operators over the ``documents`` table.

Each op is a Ray Data pipeline (vectorized pandas/pyarrow batches; no
per-row Python in hot paths except hashing, which is a C call per row)
paired with a DuckDB oracle. Integer/floor outputs are preferred over raw
float ratios so value-hash comparison is bit-stable across engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from .registry import register

STOPWORDS = {
    "en": ["the", "and", "of", "a", "to", "in"],
    "es": ["el", "la", "de", "y", "que", "en"],
    "de": ["der", "die", "und", "das", "ist", "zu"],
}


def _read_documents(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def doc_token_stats(sf_dir: str):
    """Per-doc token statistics (whitespace tokenization)."""

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.split(" ")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_tokens": toks.map(len).astype("int64"),
                "n_uniq_tokens": toks.map(lambda t: len(set(t))).astype("int64"),
                "text_len": df["text"].str.len().astype("int64"),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        stats, batch_format="pandas"
    )


register(
    "doc_token_stats",
    doc_token_stats,
    """
    SELECT doc_id,
           len(string_split(text, ' '))::BIGINT AS n_tokens,
           len(list_distinct(string_split(text, ' ')))::BIGINT AS n_uniq_tokens,
           length(text)::BIGINT AS text_len
    FROM documents
    """,
)


def lang_stats(sf_dir: str):
    """Per-language rollup. Partial aggregation happens inside map_batches
    (one row per lang per batch) before the small groupby — the
    pre-aggregate pattern that keeps the shuffle tiny at scale."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", as_index=False).agg(
            part_docs=("doc_id", "count"), part_chars=("n_chars", "sum")
        )
        return g

    ds = _read_documents(sf_dir, ["doc_id", "lang", "n_chars"]).map_batches(
        partial, batch_format="pandas"
    )
    return ds.groupby("lang").aggregate(
        Sum("part_docs", alias_name="n_docs"),
        Sum("part_chars", alias_name="total_chars"),
    )


register(
    "lang_stats",
    lang_stats,
    """
    SELECT lang, count(*)::BIGINT AS n_docs, sum(n_chars)::BIGINT AS total_chars
    FROM documents GROUP BY lang
    """,
)


def doc_fingerprint(sf_dir: str):
    """Content fingerprint: md5 of lowercased text (exact-dup key)."""

    def fp(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "fingerprint": [
                    hashlib.md5(t.lower().encode()).hexdigest()
                    for t in df["text"]
                ],
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fp, batch_format="pandas"
    )


register(
    "doc_fingerprint",
    doc_fingerprint,
    "SELECT doc_id, md5(lower(text)) AS fingerprint FROM documents",
)


def lang_id(sf_dir: str):
    """Stopword-hit language ID (en/es/de; deterministic tie-break
    en > es > de). A real corpus would use char n-gram profiles; the
    Ray-side shape (vectorized scoring in map_batches) is identical."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split(" ")
        hits = {
            lang: toks.map(lambda t, sw=set(sws): sum(x in sw for x in t))
            for lang, sws in STOPWORDS.items()
        }
        en, es, de = hits["en"], hits["es"], hits["de"]
        pred = np.where(
            (en >= es) & (en >= de), "en", np.where(es >= de, "es", "de")
        )
        return pd.DataFrame({"doc_id": df["doc_id"], "lang_pred": pred})

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )


def _sw_sql(lang: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(string_split(lower(text), ' '), "
        f"x -> list_contains([{lst}], x)))"
    )


register(
    "lang_id",
    lang_id,
    f"""
    SELECT doc_id,
           CASE WHEN {_sw_sql("en")} >= {_sw_sql("es")}
                 AND {_sw_sql("en")} >= {_sw_sql("de")} THEN 'en'
                WHEN {_sw_sql("es")} >= {_sw_sql("de")} THEN 'es'
                ELSE 'de' END AS lang_pred
    FROM documents
    """,
)


def quality_score(sf_dir: str):
    """Heuristic doc quality: permille of English stopwords and mean token
    length (floored to ints for engine-stable comparison)."""

    def score(df: pd.DataFrame) -> pd.DataFrame:
        toks = df["text"].str.lower().str.split(" ")
        n = toks.map(len).astype("int64")
        sw = set(STOPWORDS["en"])
        stop = toks.map(lambda t: sum(x in sw for x in t)).astype("int64")
        tok_chars = toks.map(lambda t: sum(len(x) for x in t)).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "stopword_permille": np.floor(1000.0 * stop / n).astype("int64"),
                "mean_token_len_x100": np.floor(100.0 * tok_chars / n).astype(
                    "int64"
                ),
            }
        )

    return _read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pandas"
    )


register(
    "quality_score",
    quality_score,
    f"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') tk,
                      {_sw_sql("en")} stop FROM documents)
    SELECT doc_id,
           CAST(FLOOR(1000.0 * stop / len(tk)) AS BIGINT) AS stopword_permille,
           CAST(FLOOR(100.0 * len(array_to_string(tk, '')) / len(tk)) AS BIGINT)
               AS mean_token_len_x100
    FROM t
    """,
)


def token_count_total(sf_dir: str):
    """Corpus-wide token count: per-batch partial sums -> one global sum
    (mergeable-sketch shape; output is a single row)."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"part": [int(df["text"].str.count(" ").sum() + len(df))]}
        )

    ds = _read_documents(sf_dir, ["text"]).map_batches(
        partial, batch_format="pandas"
    )
    out = ds.aggregate(Sum("part", alias_name="total_tokens"))
    import pandas as pd2

    return pd2.DataFrame({"total_tokens": [out["total_tokens"]]})


register(
    "token_count_total",
    token_count_total,
    "SELECT sum(len(string_split(text,' ')))::BIGINT AS total_tokens FROM documents",
)

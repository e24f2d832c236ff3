"""Mergeable-sketch operators (ray_guide 'Aggregation at scale': emit one
serialized sketch per batch, merge in a tiny second stage).

- ``event_type_distinct_users``: EXACT distinct count per key (dedup pairs
  then count) — SQL oracle.
- ``distinct_users_hll``: HyperLogLog (p=12, ~1.6%% expected error) —
  one sketch per batch, merged driver-side; rows-only check (approximate),
  with the error bound asserted against the exact op in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .registry import register

HLL_P = 12  # 4096 registers


def _read_events(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


N_DEDUP_BUCKETS = 64


def event_type_distinct_users(sf_dir: str):
    """Exact distinct count per key: per-batch pair dedup (map-side), then
    a bucketed reduce — ``bucket = hash(user_id) %% B`` groupby with a
    vectorized pandas ``drop_duplicates`` + per-event_type count inside
    each of the B reducer groups, then a tiny per-key Sum. Reducer count
    stays fixed at B however many distinct pairs exist (a groupby on the
    raw pair key would sort/shuffle every distinct pair; a per-pair
    map_groups would add per-group Python overhead on top)."""
    from ray.data.aggregate import Sum

    def dedup_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates()
        df = df.assign(
            bucket=(df["user_id"] % N_DEDUP_BUCKETS).astype("int32")
        )
        return df

    def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop(columns="bucket").drop_duplicates()
        out = d.groupby("event_type", as_index=False).size()
        return out.rename(columns={"size": "p_users"})

    return (
        _read_events(sf_dir, ["event_type", "user_id"])
        .map_batches(dedup_pairs, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_count, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("p_users", alias_name="n_users"))
    )


register(
    "event_type_distinct_users",
    event_type_distinct_users,
    """
    SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_users
    FROM events GROUP BY 1
    """,
)


class Hll:
    """Minimal HyperLogLog with the standard bias-corrected estimator."""

    __slots__ = ("p", "registers")

    def __init__(self, p: int = HLL_P):
        self.p = p
        self.registers = np.zeros(1 << p, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """hashes: uint64 array."""
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits, +1
        lz = np.full(len(rest), 64 - self.p, dtype=np.uint8)
        mask = rest != 0
        if mask.any():
            bits = 63 - np.floor(np.log2(rest[mask].astype(np.float64))).astype(
                np.int64
            )
            lz[mask] = np.minimum(bits, 64 - self.p)
        rank = (lz + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "Hll") -> None:
        np.maximum(self.registers, other.registers, out=self.registers)

    def estimate(self) -> float:
        m = float(len(self.registers))
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int((self.registers == 0).sum())
            if zeros:
                est = m * np.log(m / zeros)
        return float(est)


def _hash_ids(ids: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 over the int64 id column (wrapping uint64
    arithmetic; one numpy pass, no per-row Python)."""
    z = np.asarray(ids, dtype=np.int64).view(np.uint64) + np.uint64(
        0x9E3779B97F4A7C15
    )
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def distinct_users_hll(sf_dir: str):
    """Approximate distinct users overall + per event_type via mergeable
    HLL sketches: one serialized sketch per (batch, key), merged in a tiny
    final stage (no shuffle of raw ids)."""

    def sketch_batch(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        keys, blobs = [], []
        for key, grp in df.groupby("event_type"):
            h = Hll()
            h.add_hashes(_hash_ids(grp["user_id"].to_numpy()))
            keys.append(key)
            blobs.append(h.registers.tobytes())
        return pa.table(
            {
                "event_type": pa.array(keys, pa.string()),
                "sketch": pa.array(blobs, pa.large_binary()),
            }
        )

    sketches = (
        _read_events(sf_dir, ["event_type", "user_id"])
        .map_batches(sketch_batch, batch_format="pyarrow")
        .to_pandas()
    )  # tiny: one 4KB sketch per key per batch
    out_rows = []
    total = Hll()
    for key, grp in sketches.groupby("event_type"):
        h = Hll()
        for blob in grp["sketch"]:
            other = Hll()
            other.registers = np.frombuffer(blob, dtype=np.uint8).copy()
            h.merge(other)
        total.merge(h)
        out_rows.append(
            {"event_type": key, "approx_users": int(round(h.estimate()))}
        )
    out_rows.append(
        {"event_type": "__total__", "approx_users": int(round(total.estimate()))}
    )
    return pd.DataFrame(out_rows)


register("distinct_users_hll", distinct_users_hll, None)  # approximate

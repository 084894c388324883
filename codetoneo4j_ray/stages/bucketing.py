"""Bucketed group-apply: the scalable alternative to per-key map_groups.

``groupby(key).map_groups(fn)`` invokes Python once per group — with
millions of distinct keys that is pure interpreter overhead. Instead we
hash keys into a bounded number of buckets (one shuffle, same as any
groupby), then run a *vectorized* pandas function once per bucket; every
row of a given key lands in exactly one bucket, so per-key semantics
(dedup, LWW winner, aggregation) stay exact. At cluster scale the
bucket count is the reduce-side parallelism knob; hot single keys are
still collapsed beforehand by map-side combine in the callers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

DEFAULT_BUCKETS = 64


def target_blocks() -> int:
    """Sensible block count for all-to-all ops: ~2× cluster CPUs.

    Ray's sort-based exchanges scale O(blocks²) in task count; feeding
    them hundreds of tiny blocks dominates wall time at small scale.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:  # noqa: BLE001
        cpus = 8
    return max(8, min(256, cpus * 2))


def coalesce(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Repartition down to target_blocks() when the dataset is fragmented."""
    return ds.repartition(target_blocks())


def _key_strings(batch: pa.Table, col: str) -> pa.ChunkedArray:
    """Key column as a non-null utf8 array. Bucket identity is free to
    change (callers only require same-key → same-bucket, deterministic
    across blocks and processes), so the exact string form of non-string
    keys doesn't matter — only that Arrow's cast is deterministic."""
    arr = batch[col]
    if not pa.types.is_string(arr.type):
        try:
            arr = pc.cast(arr, pa.string())
        except pa.ArrowError:  # exotic types (binary/nested): slow path
            arr = pa.array([str(v) for v in arr.to_pylist()], pa.string())
    return pc.fill_null(arr, "\x00null")


def _hash_bucket(joined: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    """Vectorized deterministic string hash → bucket id. pandas'
    hash_array is a C-level siphash with a fixed key — stable across
    processes (unlike Python's randomized str hash) and ~2 orders of
    magnitude faster than a per-row Python crc loop.

    categorize=False is LOAD-BEARING: the default categorize=True path
    is not a pure per-value function — the same string hashes
    differently depending on the surrounding array (empirically chunk-
    dependent), which silently breaks cross-block co-bucketing."""
    obj = joined.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(np.asarray(obj, dtype=object), categorize=False) % num_buckets
    return pa.array(h.astype(np.int32), pa.int32())


def add_bucket_column(
    ds: ray.data.Dataset, key_cols: list[str], num_buckets: int = DEFAULT_BUCKETS
) -> ray.data.Dataset:
    def add(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__bucket", pa.array([], pa.int32()))
        if not key_cols:  # single global group (small final reductions)
            return batch.append_column(
                "__bucket", pa.array([0] * batch.num_rows, pa.int32())
            )
        cols = [_key_strings(batch, c) for c in key_cols]
        if len(cols) == 1:
            joined = cols[0]
        else:
            joined = pc.binary_join_element_wise(*cols, "\x00")
        return batch.append_column("__bucket", _hash_bucket(joined, num_buckets))

    return ds.map_batches(add, batch_format="pyarrow")


def bucketed_apply(
    ds: ray.data.Dataset,
    key_cols: list[str],
    bucket_fn,
    num_buckets: int = DEFAULT_BUCKETS,
) -> ray.data.Dataset:
    """Hash rows into buckets by key_cols; run ``bucket_fn(pandas_df)``
    once per bucket (vectorized). fn must not depend on bucket identity."""

    def apply(group: pd.DataFrame) -> pd.DataFrame:
        out = bucket_fn(group.drop(columns="__bucket"))
        return out

    return (
        coalesce(add_bucket_column(ds, key_cols, num_buckets))
        .groupby("__bucket")
        .map_groups(apply, batch_format="pandas")
    )

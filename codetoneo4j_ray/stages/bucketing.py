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

import zlib

import pandas as pd
import pyarrow as pa
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


def _crc_bucket(values, num_buckets: int) -> pa.Array:
    return pa.array(
        [zlib.crc32(v.encode("utf-8")) % num_buckets if v is not None else 0
         for v in values],
        pa.int32(),
    )


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
        if len(key_cols) == 1:
            vals = batch[key_cols[0]].to_pylist()
            joined = [str(v) for v in vals]
        else:
            cols = [batch[c].to_pylist() for c in key_cols]
            joined = ["\x00".join(str(v) for v in row) for row in zip(*cols)]
        return batch.append_column("__bucket", _crc_bucket(joined, num_buckets))

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

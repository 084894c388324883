"""Stage 3 — canonicalization (global dedup).

Reproduces Neo4j MERGE semantics:
  - nodes:  ``MERGE (n:src__Symbol {key}) SET …`` = one row per key,
    last-writer-wins (``Cypher/UpsertSymbols.cypher:2``). The reference's
    winner is nondeterministic (parallel flush order); we use a
    deterministic tie-break: max row under _TIEBREAK.
  - edges:  ``apoc.merge.relationship`` = distinct (subj, pred, obj)
    (``Cypher/MergeRelationships.cypher:4``).

Skew handling, two phases:
  1. map-side combine — per-batch dedup collapses hot keys (``pkg:*``
     deps and ``System.*`` targets appear once per *file*) before any
     shuffle, so no reducer sees more than one row per key per block;
  2. bucketed reduce — keys hash into a bounded number of buckets and
     each bucket dedups vectorized in pandas (stages.bucketing), instead
     of one Python call per key.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from codetoneo4j_ray.stages.bucketing import coalesce, bucketed_apply_tasks

_SEP = "\x00"

# Total tie-break order: replicated exactly in the DuckDB oracles.
_TIEBREAK = ["path", "start_line", "end_line", "repo", "namespace", "kind", "accessibility"]
_FILE_TIEBREAK = ["path", "repo"]


def _winner_last(df: pd.DataFrame, key: str, order: list[str]) -> pd.DataFrame:
    # na_position='first' makes NULL the minimum, matching the oracle's
    # ORDER BY … DESC under DuckDB's default NULLS LAST (null = smallest);
    # pandas' default ('last') would let a NULL-tiebreak row win instead
    df = df.sort_values([key] + order, kind="stable", na_position="first")
    return df.drop_duplicates(subset=[key], keep="last")


def _local_dedup_nodes(batch: pa.Table) -> pa.Table:
    df = _winner_last(batch.to_pandas(), "key", _TIEBREAK)
    return pa.Table.from_pandas(df, preserve_index=False, schema=batch.schema)


def lww_sorted(
    ds: ray.data.Dataset, key: str, order: list[str]
) -> ray.data.Dataset:
    """Exact LWW dedup fused into the output sort — ONE exchange.

    Ray's range-partitioned sort assigns every row with equal sort-key to
    the same reduce partition (boundary assignment is a pure function of
    the value), and each sort reduce emits exactly one block per
    partition (``sort_task_spec.py:148-161`` → ``merge_sorted_blocks``,
    no dynamic splitting). So after ``sort(key)`` every equal-key run is
    fully contained in one block, and a per-block (batch_size=None)
    vectorized winner-pick is globally exact. Map-side combine first so
    hot keys collapse to ≤1 row per input block before the shuffle.
    """

    def combine(batch: pa.Table) -> pa.Table:
        df = _winner_last(batch.to_pandas(), key, order)
        return pa.Table.from_pandas(df, preserve_index=False, schema=batch.schema)

    def block_winner(batch: pa.Table) -> pa.Table:
        df = _winner_last(batch.to_pandas(), key, order)
        return pa.Table.from_pandas(df, preserve_index=False, schema=batch.schema)

    # coalesce is a cheap block merge (no all-to-all) — without it the
    # sort inherits one reduce partition per upstream block and the
    # shuffle-object count grows quadratically
    return (
        coalesce(ds.map_batches(combine, batch_format="pyarrow"))
        .sort(key)
        .map_batches(block_winner, batch_format="pyarrow", batch_size=None)
    )


def distinct_sorted(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Exact distinct (subj, pred, obj) fused into the output sort — ONE
    exchange (same equal-keys-share-a-block argument as lww_sorted)."""

    def local(batch: pa.Table) -> pa.Table:
        df = batch.select(["subj", "pred", "obj"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def block_distinct(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False, schema=batch.schema)

    return (
        coalesce(edges.map_batches(local, batch_format="pyarrow"))
        .sort(["subj", "pred", "obj"])
        .map_batches(block_distinct, batch_format="pyarrow", batch_size=None)
    )


def dedup_nodes(symbols: ray.data.Dataset) -> ray.data.Dataset:
    """One row per key, deterministic last-writer-wins.

    Map-side combine (per-block LWW collapses hot keys) then ONE
    bucketed exchange doing the exact per-key reduce. A previous design
    split unique keys past the shuffle, but the caller's final sort
    moves the full payload regardless — the split's extra materialize +
    dup-detection shuffle + driver roundtrip cost more wall time at
    every parallelism level than the single exchange it avoided.
    """
    combined = symbols.map_batches(_local_dedup_nodes, batch_format="pyarrow")
    return bucketed_apply_tasks(
        combined, ["key"], lambda df: _winner_last(df, "key", _TIEBREAK)
    )

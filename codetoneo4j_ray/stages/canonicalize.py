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

from codetoneo4j_ray.stages.bucketing import bucketed_apply

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


def _split_dedup(
    ds: ray.data.Dataset, key: str, order: list[str]
) -> ray.data.Dataset:
    """Exact LWW dedup that never shuffles the wide payload.

    After map-side combine each block holds ≤1 row per key, so only keys
    appearing in ≥2 blocks need a reduce. Those keys are found with a
    single-column shuffle (cheap: just the key strings), broadcast as a
    set, and only their rows take the wide groupby path; everything else
    — the overwhelming majority — streams through untouched.
    """
    import ray

    # the input is consumed three times (dup detection, unique pass,
    # dup pass) — pin it once; post-combine data is output-sized and the
    # object store spills if it outgrows memory
    ds = ds.materialize()

    def key_only(batch: pa.Table) -> pa.Table:
        return batch.select([key])

    dup_keys_ds = bucketed_apply(
        ds.map_batches(key_only, batch_format="pyarrow"),
        [key],
        lambda df: df[df[key].duplicated(keep="first")].drop_duplicates(),
    )
    dup_df = dup_keys_ds.to_pandas()
    dup_keys = set(dup_df[key]) if key in dup_df.columns else set()
    if not dup_keys:
        return ds
    dup_ref = ray.put(dup_keys)

    def uniques(batch: pa.Table) -> pa.Table:
        from codetoneo4j_ray.stages.link import _cached_get

        dups = _cached_get(dup_ref)
        keep = [v not in dups for v in batch[key].to_pylist()]
        return batch.filter(pa.array(keep, pa.bool_()))

    def duplicated(batch: pa.Table) -> pa.Table:
        from codetoneo4j_ray.stages.link import _cached_get

        dups = _cached_get(dup_ref)
        keep = [v in dups for v in batch[key].to_pylist()]
        return batch.filter(pa.array(keep, pa.bool_()))

    unique_part = ds.map_batches(uniques, batch_format="pyarrow")
    dup_part = bucketed_apply(
        ds.map_batches(duplicated, batch_format="pyarrow"),
        [key],
        lambda df: _winner_last(df, key, order),
    ).map_batches(lambda b: b, batch_format="pyarrow")  # pandas → arrow blocks
    return unique_part.union(dup_part)


def dedup_nodes(symbols: ray.data.Dataset) -> ray.data.Dataset:
    """One row per key, deterministic last-writer-wins."""
    combined = symbols.map_batches(_local_dedup_nodes, batch_format="pyarrow")
    return _split_dedup(combined, "key", _TIEBREAK)


def distinct_triples(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (subj, pred, obj): map-side combine + bucketed distinct."""

    def local(batch: pa.Table) -> pa.Table:
        df = batch.select(["subj", "pred", "obj"]).to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed_apply(
        edges.map_batches(local, batch_format="pyarrow"),
        ["subj", "pred", "obj"],
        lambda df: df.drop_duplicates(),
    )


def dedup_files(files: ray.data.Dataset) -> ray.data.Dataset:
    """One row per file key (MERGE (f:src__File {key}) — UpsertFile.cypher:2)."""

    def local(batch: pa.Table) -> pa.Table:
        df = _winner_last(batch.to_pandas(), "key", _FILE_TIEBREAK)
        return pa.Table.from_pandas(df, preserve_index=False, schema=batch.schema)

    return _split_dedup(
        files.map_batches(local, batch_format="pyarrow"), "key", _FILE_TIEBREAK
    )

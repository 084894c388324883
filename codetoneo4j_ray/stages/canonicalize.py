"""Stage 3 — canonicalization (global dedup).

Reproduces Neo4j MERGE semantics:
  - nodes:  ``MERGE (n:src__Symbol {key}) SET …`` = one row per key,
    last-writer-wins (``Cypher/UpsertSymbols.cypher:2``). The reference's
    winner is nondeterministic (parallel flush order); we use a
    deterministic tie-break: max (path, start_line, end_line).
  - edges:  ``apoc.merge.relationship`` = distinct (subj, pred, obj)
    (``Cypher/MergeRelationships.cypher:4``).

Skew handling: hot keys (``pkg:*`` deps, ``System.*`` namespace targets
appear once per *file*) are collapsed by a map-side combine (per-batch
dedup) before the shuffle, so each reducer group receives at most one
row per key per upstream block — the two-phase "salted" aggregate.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

_SEP = "\x00"

# Total tie-break order: the reference's winner is nondeterministic
# (parallel flush order, Cypher MERGE…SET); ours is the max row under
# this total order, replicated exactly in the DuckDB oracles.
_TIEBREAK = ["path", "start_line", "end_line", "repo", "namespace", "kind", "accessibility"]
_FILE_TIEBREAK = ["path", "repo"]


def _local_dedup_nodes(batch: pa.Table) -> pa.Table:
    df = batch.to_pandas()
    df = df.sort_values(["key"] + _TIEBREAK, kind="stable")
    df = df.drop_duplicates(subset=["key"], keep="last")
    return pa.Table.from_pandas(df, preserve_index=False, schema=batch.schema)


def _pick_winner(group: pd.DataFrame) -> pd.DataFrame:
    group = group.sort_values(_TIEBREAK, kind="stable")
    return group.tail(1)


def dedup_nodes(symbols: ray.data.Dataset) -> ray.data.Dataset:
    """One row per key, deterministic last-writer-wins."""
    combined = symbols.map_batches(_local_dedup_nodes, batch_format="pyarrow")
    return combined.groupby("key").map_groups(_pick_winner, batch_format="pandas")


def distinct_triples(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct (subj, pred, obj) via map-side combine + composite-key groupby."""

    def local(batch: pa.Table) -> pa.Table:
        batch = batch.select(["subj", "pred", "obj"])
        df = batch.to_pandas().drop_duplicates()
        df["_ck"] = df["subj"] + _SEP + df["pred"] + _SEP + df["obj"]
        return pa.Table.from_pandas(df, preserve_index=False)

    def first(group: pd.DataFrame) -> pd.DataFrame:
        return group.iloc[:1][["subj", "pred", "obj"]]

    return (
        edges.map_batches(local, batch_format="pyarrow")
        .groupby("_ck")
        .map_groups(first, batch_format="pandas")
    )


def dedup_files(files: ray.data.Dataset) -> ray.data.Dataset:
    """One row per file key (MERGE (f:src__File {key}) — UpsertFile.cypher:2)."""

    def local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["key"] + _FILE_TIEBREAK, kind="stable").drop_duplicates(
            subset=["key"], keep="last"
        )
        return pa.Table.from_pandas(df, preserve_index=False, schema=batch.schema)

    def winner(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(_FILE_TIEBREAK, kind="stable").tail(1)

    return (
        files.map_batches(local, batch_format="pyarrow")
        .groupby("key")
        .map_groups(winner, batch_format="pandas")
    )

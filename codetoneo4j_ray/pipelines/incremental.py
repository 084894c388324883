"""Incremental rebuild — the reference's ``--diff-base`` analog.

The reference restarts with a git-diff filter and marks deleted files
(``SolutionProcessor.cs:82-97,301-324``, ``Cypher/MarkFileAsDeleted.cypher``).
For a Parquet corpus the equivalent is a content diff against the prior
run's files table:

  changed  = rows whose sha256 differs from (or is absent in) the prior
             LIVE files table       → re-extracted (stage 1 on the delta)
  deleted  = prior live file keys absent from the new corpus
             → their records dropped; tombstoned in files/ and listed
             in the run manifest
  carried  = everything else        → prior records reused verbatim

The incremental files/ table carries ``deleted`` / ``deleted_at``
columns (``Cypher/MarkFileAsDeleted.cypher:1-5``,
``SolutionProcessor.cs:84-92``): live rows are deleted=false /
deleted_at=null; a deleted file keeps its prior-run properties as a
tombstone row with deleted=true and the run's timestamp. Tombstones
chain: a file deleted two runs ago stays tombstoned with its ORIGINAL
deleted_at; a tombstoned file that reappears in the corpus is
re-extracted and returns to live (the tombstone drops). A fresh full
build (new index) has no tombstones and keeps the base schema.

Stage 1 cost scales with the delta, not the corpus; stages 2–4 rerun
over the merged record stream (metadata-sized).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from codetoneo4j_ray.extractors.accessibility import DEFAULT_MIN_ACCESSIBILITY
from codetoneo4j_ray.functions.text import sha256_hex
from codetoneo4j_ray.pipelines.build_graph import (
    _parquet_rows,
    _stub_fsspec_http,
    graph_from_records,
    read_corpus_pinned,
    read_records,
    resolve_mode,
)
from codetoneo4j_ray.stages.extract import build_type_index, extract_records
from codetoneo4j_ray.state.manifest import corpus_fingerprint, write_manifest


def _joined_keys(keys: set[tuple[str, str]]) -> pa.Array:
    """(repo, path) set → Arrow string array for vectorized pc.is_in."""
    return pa.array([f"{r}\x00{p}" for r, p in keys], pa.string())


def _join_cols(batch: pa.Table) -> pa.Array:
    return pc.binary_join_element_wise(batch["repo"], batch["path"], "\x00")


def _diff_vs_prior(
    corpus: ray.data.Dataset, prior_files_dir: str
) -> tuple[set[tuple[str, str]], list[tuple[str, str]],
           list[tuple[str, str, int]]]:
    """Bucketed (repo, path) diff of corpus sha256 vs the prior files table.

    A distributed anti/semi-join — neither the corpus universe nor the
    prior file table is ever collected on the driver; only the *diff*
    (changed + deleted + carried-tombstone keys, delta-sized by
    definition) comes back. Three sides meet in each bucket:

      c = current corpus, p = prior LIVE rows, t = prior tombstones
      changed   = c absent from p, or present with a different sha —
                  includes resurrections (c matching only a tombstone)
      deleted   = p absent from c (newly deleted this run)
      tombstone = t absent from c (stays deleted; original deleted_at
                  rides along so the stamp never refreshes)

    Returns (changed_keys, deleted_keys sorted,
    carried_tombstones sorted [(repo, path, deleted_at_sec)])."""
    import pandas as pd

    from codetoneo4j_ray.stages.bucketing import bucketed_apply, bucketed_apply_tasks

    def cur_meta(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "sha256": pa.array(
                    [sha256_hex(c) for c in batch["content"].to_pylist()],
                    pa.string(),
                ),
                "deleted_at": pa.nulls(n, pa.int64()),
                "side": pa.array(["c"] * n, pa.string()),
            }
        )

    prior_all = ray.data.read_parquet(prior_files_dir)
    has_tombs = "deleted" in prior_all.schema().names

    def prior_meta(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if has_tombs:
            dead = pc.fill_null(batch["deleted"], False)
            side = pc.if_else(dead, "t", "p")
            deleted_at = batch["deleted_at"]
            if not pa.types.is_int64(deleted_at.type):
                deleted_at = pc.cast(deleted_at, pa.int64())
        else:
            side = pa.array(["p"] * n, pa.string())
            deleted_at = pa.nulls(n, pa.int64())
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "sha256": batch["sha256"],
                "deleted_at": deleted_at,
                "side": side,
            }
        )

    cur = corpus.map_batches(cur_meta, batch_format="pyarrow")
    prior = prior_all.map_batches(prior_meta, batch_format="pyarrow")

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["side"] == "c"]
        p = df[df["side"] == "p"]
        t = df[df["side"] == "t"]
        m = c.merge(p[["repo", "path", "sha256"]], on=["repo", "path"],
                    how="outer", suffixes=("_c", "_p"), indicator=True)
        changed = m[
            (m["_merge"] == "left_only")
            | ((m["_merge"] == "both") & (m["sha256_c"] != m["sha256_p"]))
        ]
        deleted = m[m["_merge"] == "right_only"]
        if len(t):
            tm = t.merge(c[["repo", "path"]], on=["repo", "path"],
                         how="left", indicator=True)
            tomb = tm[tm["_merge"] == "left_only"]
        else:
            tomb = t
        import numpy as np

        return pd.DataFrame(
            {
                "repo": pd.concat(
                    [changed["repo"], deleted["repo"], tomb["repo"]],
                    ignore_index=True,
                ).to_numpy(),
                "path": pd.concat(
                    [changed["path"], deleted["path"], tomb["path"]],
                    ignore_index=True,
                ).to_numpy(),
                "status": ["changed"] * len(changed)
                + ["deleted"] * len(deleted) + ["tomb"] * len(tomb),
                "deleted_at": np.concatenate([
                    np.full(len(changed) + len(deleted), -1, dtype=np.int64),
                    tomb["deleted_at"].to_numpy(dtype=np.int64)
                    if len(tomb) else np.array([], dtype=np.int64),
                ]),
            }
        )

    out = bucketed_apply_tasks(cur.union(prior), ["repo", "path"], diff).to_pandas()
    if "status" not in out.columns:
        return set(), [], []
    changed = set(
        zip(out.loc[out["status"] == "changed", "repo"],
            out.loc[out["status"] == "changed", "path"])
    )
    deleted = sorted(
        zip(out.loc[out["status"] == "deleted", "repo"],
            out.loc[out["status"] == "deleted", "path"])
    )
    t_rows = out.loc[out["status"] == "tomb"]
    tombstones = sorted(
        (r, p_, int(d))
        for r, p_, d in zip(t_rows["repo"], t_rows["path"],
                            t_rows["deleted_at"])
    )
    return changed, deleted, tombstones


_BASE_FILE_COLS = [
    "key", "path", "file_name", "namespace", "sha256", "language",
    "technology", "repo", "commit",
]


def _files_with_tombstones(
    live: ray.data.Dataset,
    prior_files_dir: str,
    deleted: list[tuple[str, str]],
    carried_tombs: list[tuple[str, str, int]],
    deleted_at_sec: int | None,
) -> ray.data.Dataset:
    """Live rows + tombstone rows (``MarkFileAsDeleted.cypher:1-5``): a
    deleted file keeps its prior-run properties with deleted=true and
    its deletion stamp (new deletions get this run's stamp; carried
    tombstones keep their original). Tombstone props come from a
    broadcast-filtered scan of the prior files table — the broadcast is
    the delta-sized key set, never a file table."""
    import time

    run_ts = int(time.time()) if deleted_at_sec is None else int(deleted_at_sec)
    stamp = {(r, p): run_ts for r, p in deleted}
    stamp.update({(r, p): ts for r, p, ts in carried_tombs})

    def live_cols(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        out = batch.select(_BASE_FILE_COLS)
        out = out.append_column("deleted", pa.array([False] * n, pa.bool_()))
        return out.append_column("deleted_at", pa.nulls(n, pa.int64()))

    live_out = live.map_batches(live_cols, batch_format="pyarrow")
    if not stamp:
        return live_out

    keys_ref = ray.put(_joined_keys(set(stamp)))
    stamp_ref = ray.put(stamp)

    def tomb_rows(batch: pa.Table) -> pa.Table:
        from codetoneo4j_ray.stages.link import _cached_get

        keys: pa.Array = _cached_get(keys_ref)
        sel = batch.filter(pc.is_in(_join_cols(batch), value_set=keys))
        n = sel.num_rows
        stamps: dict = _cached_get(stamp_ref)
        ts = [stamps[(r, p)] for r, p in
              zip(sel["repo"].to_pylist(), sel["path"].to_pylist())]
        out = sel.select(_BASE_FILE_COLS)
        out = out.append_column("deleted", pa.array([True] * n, pa.bool_()))
        return out.append_column("deleted_at", pa.array(ts, pa.int64()))

    tombs = ray.data.read_parquet(prior_files_dir).map_batches(
        tomb_rows, batch_format="pyarrow"
    )
    return live_out.union(tombs).sort("key")


def build_graph_incremental(
    input_path: str,
    prior_out_dir: str,
    out_dir: str,
    min_accessibility: str = DEFAULT_MIN_ACCESSIBILITY,
    concurrency=None,
    mode: str = "auto",
    packages_path: str | None = None,
    no_key: bool = False,
    batch_size: int = 64,
    deleted_at_sec: int | None = None,
) -> dict:
    """Rebuild against a prior run: extract only changed files.

    ``packages_path`` and ``no_key`` must match the full run's — the
    incremental==full contract includes the URL side-table lookups and
    the key scheme of re-extracted files (a mixed-key graph would stop
    linking carried and re-extracted symbols).

    ``deleted_at_sec`` stamps this run's NEW tombstones (defaults to the
    wall clock); carried tombstones keep their original stamp.
    """
    if os.path.realpath(out_dir) == os.path.realpath(prior_out_dir):
        raise ValueError(
            "out_dir must differ from prior_out_dir: the carried-records "
            "read is lazy, and rebuilding in place would delete the prior "
            "checkpoint before it is read"
        )
    from codetoneo4j_ray.pipelines.build_graph import corpus_content_bytes

    # concrete mode into the run fingerprint (same byte-budget guardrail
    # as build_graph — the stage-2 index is corpus-sized, not diff-sized;
    # the footer scan only runs when the mode is actually "auto")
    mode = resolve_mode(mode, corpus_bytes=(
        corpus_content_bytes(input_path) if mode == "auto" else None))
    pkg_meta = None
    if packages_path is not None:
        from codetoneo4j_ray.stages.extract import load_pkg_meta

        pkg_meta = load_pkg_meta(packages_path)
    corpus = read_corpus_pinned(input_path)
    changed, deleted, carried_tombs = _diff_vs_prior(
        corpus, f"{prior_out_dir}/files"
    )

    # re-extract only the changed rows (broadcast of the *delta* key set —
    # bounded by the diff size, never the corpus)
    changed_ref = ray.put(_joined_keys(changed))

    def changed_only(batch: pa.Table) -> pa.Table:
        from codetoneo4j_ray.stages.link import _cached_get

        keys: pa.Array = _cached_get(changed_ref)
        joined = _join_cols(batch)
        return batch.filter(pc.is_in(joined, value_set=keys))

    delta = corpus.map_batches(changed_only, batch_format="pyarrow")

    stale = changed | set(deleted) | {(r, p) for r, p, _ in carried_tombs}
    stale_ref = ray.put(_joined_keys(stale))

    # pass-A type index over the FULL corpus: a changed file may reference
    # types/namespaces declared in unchanged files (receiver typing, base
    # chains, global usings) — the incremental==full contract requires the
    # same compilation-wide knowledge the reference re-opens per run
    # (SolutionProcessor.cs:256-279). Stage-1 *parse* cost still scales
    # with the delta; the skim is the cheap declaration pass.
    indices = build_type_index(corpus)
    new_records = extract_records(delta, indices, min_accessibility,
                                  concurrency=concurrency, pkg_meta=pkg_meta,
                                  no_key=no_key, batch_size=batch_size)

    def drop_stale(batch: pa.Table) -> pa.Table:
        from codetoneo4j_ray.stages.link import _cached_get

        stale_keys: pa.Array = _cached_get(stale_ref)
        joined = _join_cols(batch)
        return batch.filter(pc.invert(pc.is_in(joined, value_set=stale_keys)))

    carried = read_records(f"{prior_out_dir}/records").map_batches(
        drop_stale, batch_format="pyarrow"
    )
    if changed:
        # partition-column reads reorder columns; align before union
        cols = new_records.schema().names
        merged = new_records.union(carried.select_columns(cols))
    else:
        # empty delta → extraction yields a schemaless empty dataset
        # (Ray drops all-empty schemas); carry the prior records alone
        merged = carried

    records_dir = f"{out_dir}/records"
    shutil.rmtree(records_dir, ignore_errors=True)
    merged.write_parquet(records_dir, partition_cols=["rec_type"])

    _stub_fsspec_http()
    outputs = graph_from_records(records_dir=records_dir, mode=mode,
                                 no_key=no_key)
    outputs["files"] = _files_with_tombstones(
        outputs["files"], f"{prior_out_dir}/files", deleted, carried_tombs,
        deleted_at_sec,
    )
    metrics: dict = {
        "changed_files": len(changed),
        "deleted_files": len(deleted),
        "deleted": [f"{r}:{p}" for r, p in deleted][:1000],
        "tombstones": len(deleted) + len(carried_tombs),
    }
    for name in ("nodes", "edges", "files"):
        path = f"{out_dir}/{name}"
        shutil.rmtree(path, ignore_errors=True)
        outputs[name].write_parquet(path)
        metrics[name] = _parquet_rows(path)
    fp = corpus_fingerprint(input_path, {
        "incremental": True, "min_accessibility": min_accessibility,
        "mode": mode, "packages": packages_path, "no_key": no_key,
        "prior": os.path.realpath(prior_out_dir),
    })
    write_manifest(out_dir, "graph", fp, metrics)
    return metrics

"""Incremental rebuild — the reference's ``--diff-base`` analog.

The reference restarts with a git-diff filter and marks deleted files
(``SolutionProcessor.cs:82-97,301-324``, ``Cypher/MarkFileAsDeleted.cypher``).
For a Parquet corpus the equivalent is a content diff against the prior
run's files table:

  changed  = rows whose sha256 differs from (or is absent in) the prior
             files table            → re-extracted (stage 1 on the delta)
  deleted  = prior file keys absent from the new corpus
             → their records dropped; listed in the run manifest
  carried  = everything else        → prior records reused verbatim

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
    read_corpus,
    read_records,
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
) -> tuple[set[tuple[str, str]], list[tuple[str, str]]]:
    """Bucketed (repo, path) diff of corpus sha256 vs the prior files table.

    A distributed anti/semi-join — neither the corpus universe nor the
    prior file table is ever collected on the driver; only the *diff*
    (changed + deleted keys, delta-sized by definition) comes back.
    Returns (changed_keys, deleted_keys sorted)."""
    import pandas as pd

    from codetoneo4j_ray.stages.bucketing import bucketed_apply

    def cur_meta(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "sha256": pa.array(
                    [sha256_hex(c) for c in batch["content"].to_pylist()],
                    pa.string(),
                ),
                "side": pa.array(["c"] * batch.num_rows, pa.string()),
            }
        )

    def prior_meta(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": batch["repo"],
                "path": batch["path"],
                "sha256": batch["sha256"],
                "side": pa.array(["p"] * batch.num_rows, pa.string()),
            }
        )

    cur = corpus.map_batches(cur_meta, batch_format="pyarrow")
    prior = ray.data.read_parquet(
        prior_files_dir, columns=["repo", "path", "sha256"]
    ).map_batches(prior_meta, batch_format="pyarrow")

    def diff(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["side"] == "c"]
        p = df[df["side"] == "p"]
        m = c.merge(p, on=["repo", "path"], how="outer",
                    suffixes=("_c", "_p"), indicator=True)
        changed = m[
            (m["_merge"] == "left_only")
            | ((m["_merge"] == "both") & (m["sha256_c"] != m["sha256_p"]))
        ]
        deleted = m[m["_merge"] == "right_only"]
        return pd.DataFrame(
            {
                "repo": pd.concat([changed["repo"], deleted["repo"]]),
                "path": pd.concat([changed["path"], deleted["path"]]),
                "status": ["changed"] * len(changed) + ["deleted"] * len(deleted),
            }
        )

    out = bucketed_apply(cur.union(prior), ["repo", "path"], diff).to_pandas()
    if "status" not in out.columns:
        return set(), []
    changed = set(
        zip(out.loc[out["status"] == "changed", "repo"],
            out.loc[out["status"] == "changed", "path"])
    )
    deleted = sorted(
        zip(out.loc[out["status"] == "deleted", "repo"],
            out.loc[out["status"] == "deleted", "path"])
    )
    return changed, deleted


def build_graph_incremental(
    input_path: str,
    prior_out_dir: str,
    out_dir: str,
    min_accessibility: str = DEFAULT_MIN_ACCESSIBILITY,
    concurrency=None,
    mode: str = "broadcast",
    packages_path: str | None = None,
    no_key: bool = False,
    batch_size: int = 64,
) -> dict:
    """Rebuild against a prior run: extract only changed files.

    ``packages_path`` and ``no_key`` must match the full run's — the
    incremental==full contract includes the URL side-table lookups and
    the key scheme of re-extracted files (a mixed-key graph would stop
    linking carried and re-extracted symbols).
    """
    if os.path.realpath(out_dir) == os.path.realpath(prior_out_dir):
        raise ValueError(
            "out_dir must differ from prior_out_dir: the carried-records "
            "read is lazy, and rebuilding in place would delete the prior "
            "checkpoint before it is read"
        )
    pkg_meta = None
    if packages_path is not None:
        from codetoneo4j_ray.stages.extract import load_pkg_meta

        pkg_meta = load_pkg_meta(packages_path)
    corpus = read_corpus(input_path)
    changed, deleted = _diff_vs_prior(corpus, f"{prior_out_dir}/files")

    # re-extract only the changed rows (broadcast of the *delta* key set —
    # bounded by the diff size, never the corpus)
    changed_ref = ray.put(_joined_keys(changed))

    def changed_only(batch: pa.Table) -> pa.Table:
        from codetoneo4j_ray.stages.link import _cached_get

        keys: pa.Array = _cached_get(changed_ref)
        joined = _join_cols(batch)
        return batch.filter(pc.is_in(joined, value_set=keys))

    delta = corpus.map_batches(changed_only, batch_format="pyarrow")

    stale = changed | set(deleted)
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
    # partition-column reads reorder columns; align before union
    cols = new_records.schema().names
    carried = carried.select_columns(cols)

    records_dir = f"{out_dir}/records"
    shutil.rmtree(records_dir, ignore_errors=True)
    new_records.union(carried).write_parquet(
        records_dir, partition_cols=["rec_type"]
    )

    _stub_fsspec_http()
    outputs = graph_from_records(records_dir=records_dir, mode=mode,
                                 no_key=no_key)
    metrics: dict = {
        "changed_files": len(changed),
        "deleted_files": len(deleted),
        "deleted": [f"{r}:{p}" for r, p in deleted][:1000],
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

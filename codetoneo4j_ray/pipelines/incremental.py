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

import shutil

import pyarrow as pa
import ray
import ray.data

from codetoneo4j_ray.extractors.accessibility import DEFAULT_MIN_ACCESSIBILITY
from codetoneo4j_ray.functions.text import sha256_hex
from codetoneo4j_ray.pipelines.build_graph import (
    _parquet_rows,
    _stub_fsspec_http,
    extract_to_records,
    graph_from_records,
    read_corpus,
    read_records,
)
from codetoneo4j_ray.state.manifest import corpus_fingerprint, write_manifest


def _prior_shas(prior_files_dir: str) -> dict[tuple[str, str], str]:
    df = ray.data.read_parquet(
        prior_files_dir, columns=["repo", "path", "sha256"]
    ).to_pandas()
    return {
        (r, p): s
        for r, p, s in zip(df["repo"], df["path"], df["sha256"])
    }


def build_graph_incremental(
    input_path: str,
    prior_out_dir: str,
    out_dir: str,
    min_accessibility: str = DEFAULT_MIN_ACCESSIBILITY,
    concurrency=None,
    mode: str = "broadcast",
) -> dict:
    """Rebuild against a prior run: extract only changed files."""
    prior = _prior_shas(f"{prior_out_dir}/files")
    prior_ref = ray.put(prior)

    corpus = read_corpus(input_path)

    def changed_only(batch: pa.Table) -> pa.Table:
        from codetoneo4j_ray.stages.link import _cached_get

        shas = _cached_get(prior_ref)
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        contents = batch["content"].to_pylist()
        keep = [
            shas.get((r, p)) != sha256_hex(c)
            for r, p, c in zip(repos, paths, contents)
        ]
        return batch.filter(pa.array(keep, pa.bool_()))

    delta = corpus.map_batches(changed_only, batch_format="pyarrow")

    # current (repo, path) universe → detect deletions + stale records
    live = set(
        zip(*(corpus.select_columns(["repo", "path"]).to_pandas()[c]
              for c in ("repo", "path")))
    )
    deleted = sorted(k for k in prior if k not in live)

    # changed keys: re-extracted files (their old records are stale too)
    changed = set(
        zip(*(delta.select_columns(["repo", "path"]).to_pandas()[c]
              for c in ("repo", "path")))
    ) if delta.count() > 0 else set()
    stale = changed | set(deleted)
    stale_ref = ray.put(stale)

    new_records = extract_to_records(delta, min_accessibility, concurrency)

    def drop_stale(batch: pa.Table) -> pa.Table:
        from codetoneo4j_ray.stages.link import _cached_get

        stale_keys = _cached_get(stale_ref)
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        keep = [(r, p) not in stale_keys for r, p in zip(repos, paths)]
        return batch.filter(pa.array(keep, pa.bool_()))

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
    outputs = graph_from_records(records_dir=records_dir, mode=mode)
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
    fp = corpus_fingerprint(input_path, {"incremental": True})
    write_manifest(out_dir, "graph", fp, metrics)
    return metrics

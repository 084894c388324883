"""Stage 4 — structural edges + sorted, deduplicated Parquet outputs.

Structural (flush-time) edges the reference creates outside the
relBuffer, reproduced here from the record stream:

  Project HAS_FILE File      — UpsertFile.cypher:18-24
  File    DECLARES Symbol    — UpsertSymbols.cypher:20-22 (from s.fileKey)
  Symbol  HAS_TAG  Tag       — Neo4jFlushService.cs:90-94 + UpsertTags.cypher
  Dep     HAS_URL  Url       — UpsertDependencyUrls.cypher:7-8
  Project DEPENDS_ON Dep     — UpsertDependencies.cypher:8-13
                               (DependencyIngestor analog: handler pkg deps)
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from codetoneo4j_ray.functions.tags import parse_namespace_tags
from codetoneo4j_ray.functions.text import truncate_indexed
from codetoneo4j_ray.schema import (
    DECLARES,
    DEPENDS_ON,
    HAS_FILE,
    HAS_TAG,
    HAS_URL,
    TRIPLE_SCHEMA,
)

_TRIPLE_COLS = ["subj", "pred", "obj"]


def _triples(subjs, preds, objs) -> pa.Table:
    return pa.table(
        {
            "subj": pa.array(subjs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
        },
        schema=TRIPLE_SCHEMA,
    )


def structural_edges_batch(batch: pa.Table, include_project: bool = True) -> pa.Table:
    """records batch → structural triples (vector-ish, one pass).

    ``include_project=False`` reproduces ``--no-key``: with a null
    repoKey the UpsertFile/UpsertDependencies cyphers' OPTIONAL MATCH on
    the Project node finds nothing, so no Project HAS_FILE / Project
    DEPENDS_ON edges are created (UpsertFile.cypher:18-24)."""
    rec_type = batch["rec_type"].to_pylist()
    keys = batch["key"].to_pylist()
    file_keys = batch["file_key"].to_pylist()
    repos = batch["repo"].to_pylist()
    namespaces = batch["namespace"].to_pylist()
    kinds = batch["kind"].to_pylist()
    dep_keys = batch["dep_key"].to_pylist()
    url_keys = batch["url_key"].to_pylist()
    subjs: list[str] = []
    preds: list[str] = []
    objs: list[str] = []
    for i, rt in enumerate(rec_type):
        if rt == "symbol":
            # File DECLARES Symbol (every raw row; MERGE dedups later)
            subjs.append(file_keys[i])
            preds.append(DECLARES)
            objs.append(keys[i])
            ns = namespaces[i]
            if ns and ns.strip():
                for tag in parse_namespace_tags(ns):
                    subjs.append(keys[i])
                    preds.append(HAS_TAG)
                    objs.append(tag)
            if kinds[i] == "Dependency" and include_project:
                # Project DEPENDS_ON Dependency (DependencyIngestor analog)
                subjs.append(repos[i].lower())
                preds.append(DEPENDS_ON)
                objs.append(keys[i])
        elif rt == "file":
            if include_project:
                subjs.append(repos[i].lower())
                preds.append(HAS_FILE)
                objs.append(keys[i])
        elif rt == "url":
            subjs.append(dep_keys[i])
            preds.append(HAS_URL)
            objs.append(url_keys[i])
    return _triples(subjs, preds, objs)


def structural_edges(
    records: ray.data.Dataset, include_project: bool = True
) -> ray.data.Dataset:
    import functools

    return records.map_batches(
        functools.partial(structural_edges_batch,
                          include_project=include_project),
        batch_format="pyarrow",
    )


def finalize_nodes(nodes: ray.data.Dataset) -> ray.data.Dataset:
    """Apply the 8000-char indexed-string truncation
    (Neo4jFlushService.cs:76-77) and project to the output schema."""

    def fix(batch: pa.Table) -> pa.Table:
        doc = pa.array(
            [truncate_indexed(v) for v in batch["documentation"].to_pylist()],
            pa.string(),
        )
        com = pa.array(
            [truncate_indexed(v) for v in batch["comments"].to_pylist()],
            pa.string(),
        )
        batch = batch.set_column(
            batch.schema.get_field_index("documentation"), "documentation", doc
        )
        return batch.set_column(
            batch.schema.get_field_index("comments"), "comments", com
        )

    cols = [
        "key", "name", "kind", "class", "fqn", "accessibility", "file_key",
        "path", "start_line", "end_line", "documentation", "comments",
        "namespace", "version", "language", "technology", "repo",
    ]
    return nodes.map_batches(fix, batch_format="pyarrow").select_columns(cols)


def finalize_files(files: ray.data.Dataset) -> ray.data.Dataset:
    cols = [
        "key", "path", "file_name", "namespace", "sha256", "language",
        "technology", "repo", "commit",
    ]
    return files.select_columns(cols)

"""Commit-subgraph pipeline — the reference's git ingestion, portable.

The reference shells out to ``git log`` and folds per-file history
driver-side (``VersionControl/GitService.cs:17-94``,
``GitLogParser.cs:65-114``); a Parquet corpus carries no git repo, so
the same facts arrive as an optional ``commits`` side table
``(repo, hash, author, email, date, message, changed_paths,
changed_deleted)`` and every fold becomes a distributed aggregate:

  - Commit nodes + COMMITTED / PART_OF_PROJECT / MODIFIED_FILE edges
    reproduce ``Cypher/UpsertCommit.cypher:1-20``: Author MERGEd by
    name, Commit by hash, Project matched by repoKey, one
    MODIFIED_FILE edge per changed file.
  - The per-(file, author) AUTHORED fold (firstCommit = min date,
    lastCommit = max date, commitCount) reproduces
    ``GitLogParser.BuildFileMetadata`` + ``Cypher/UpsertFile.cypher:31-36``
    as map-side partials + a bucketed merge — one metadata shuffle.

Key namespace: triples flatten Neo4j's per-label key spaces
(``src__Author {name}``, ``src__Commit {hash}`` —
``Graph/GraphSchema.cs:8-12``), so author nodes key as
``author:{name}`` and commits as ``commit:{hash}``; Project keys stay
``lower(repo)`` and File keys stay relative paths, matching the
structural edges in stages/materialize.py.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data

from codetoneo4j_ray.stages.bucketing import bucketed_apply

COMMITTED = "src__COMMITTED"
PART_OF_PROJECT = "src__PART_OF_PROJECT"
MODIFIED_FILE = "src__MODIFIED_FILE"
AUTHORED = "src__AUTHORED"


def read_commits(commits_path: str) -> ray.data.Dataset:
    return ray.data.read_parquet(commits_path)


def _date_sec(col: pd.Series) -> pd.Series:
    # tz-aware us timestamps → epoch seconds (engine-exact vs DuckDB)
    return (col.astype("int64") // 1_000_000).astype("int64")


def commit_nodes(commits: ray.data.Dataset) -> ray.data.Dataset:
    """One row per commit hash (MERGE (c:src__Commit {hash}) — last
    writer wins on props; hashes are globally unique so dedup is a
    safety net, deterministic by full-column tiebreak)."""
    _TIE = ["hash", "repo", "author", "email", "date_sec", "message"]

    def local(batch: pa.Table) -> pa.Table:
        df = batch.select(
            ["hash", "repo", "author", "email", "date", "message"]
        ).to_pandas()
        df["date_sec"] = _date_sec(df["date"])
        df = df.drop(columns="date")
        df = df.sort_values(_TIE, kind="stable", na_position="first")
        return pa.Table.from_pandas(
            df.drop_duplicates(subset=["hash"], keep="last"),
            preserve_index=False,
        )

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(_TIE, kind="stable", na_position="first")
        return df.drop_duplicates(subset=["hash"], keep="last")

    return (
        bucketed_apply(
            commits.map_batches(local, batch_format="pyarrow"), ["hash"], merge
        )
        .select_columns(["hash", "repo", "author", "email", "date_sec", "message"])
        .sort("hash")
    )


def commit_edges(commits: ray.data.Dataset) -> ray.data.Dataset:
    """COMMITTED + PART_OF_PROJECT + MODIFIED_FILE triples, distinct +
    sorted (each cypher MERGE is a distinct edge)."""

    def explode(batch: pa.Table) -> pa.Table:
        hashes = batch["hash"].to_pylist()
        repos = batch["repo"].to_pylist()
        authors = batch["author"].to_pylist()
        changed = batch["changed_paths"].to_pylist()
        subjs: list[str] = []
        preds: list[str] = []
        objs: list[str] = []
        for h, repo, author, paths in zip(hashes, repos, authors, changed):
            ck = f"commit:{h}"
            subjs.append(f"author:{author}")
            preds.append(COMMITTED)
            objs.append(ck)
            subjs.append(ck)
            preds.append(PART_OF_PROJECT)
            objs.append(repo.lower())
            for p in paths or []:
                subjs.append(ck)
                preds.append(MODIFIED_FILE)
                objs.append(p)
        return pa.table(
            {
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
            }
        )

    def local(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return (
        bucketed_apply(
            commits.map_batches(explode, batch_format="pyarrow")
            .map_batches(local, batch_format="pyarrow"),
            ["subj", "pred", "obj"],
            lambda df: df.drop_duplicates(),
        )
        .sort(["subj", "pred", "obj"])
    )


def authored_stats(commits: ray.data.Dataset) -> ray.data.Dataset:
    """The AUTHORED fold: per (file, author) min/max commit date + count
    (``GitLogParser.cs:83-99`` authorMap fold, one edge per pair with
    firstCommit/lastCommit/commitCount props —
    ``UpsertFile.cypher:31-36``). Map-side partials collapse each
    (path, author) to one row per block before the single shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["author", "date", "changed_paths"]).to_pandas()
        df["date_sec"] = _date_sec(df["date"])
        df = df.drop(columns="date").explode("changed_paths")
        df = df.rename(columns={"changed_paths": "path"})
        df = df.dropna(subset=["path"])
        g = df.groupby(["author", "path"], as_index=False).agg(
            first_sec=("date_sec", "min"),
            last_sec=("date_sec", "max"),
            commit_count=("date_sec", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["author", "path"], as_index=False).agg(
            first_sec=("first_sec", "min"),
            last_sec=("last_sec", "max"),
            commit_count=("commit_count", "sum"),
        )

    return (
        bucketed_apply(
            commits.map_batches(partial, batch_format="pyarrow"),
            ["author", "path"],
            merge,
        )
        .select_columns(["author", "path", "first_sec", "last_sec", "commit_count"])
        .sort(["author", "path"])
    )


def file_history(commits: ray.data.Dataset) -> ray.data.Dataset:
    """Per-file created/lastModified/commit count (the FileMetadata fold:
    ``GitLogParser.cs:70-81`` created=min, lastModified=max; commit list
    length as n_commits)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select(["date", "changed_paths", "repo"]).to_pandas()
        df["date_sec"] = _date_sec(df["date"])
        df = df.drop(columns="date").explode("changed_paths")
        df = df.rename(columns={"changed_paths": "path"})
        df = df.dropna(subset=["path"])
        g = df.groupby(["repo", "path"], as_index=False).agg(
            created_sec=("date_sec", "min"),
            modified_sec=("date_sec", "max"),
            n_commits=("date_sec", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["repo", "path"], as_index=False).agg(
            created_sec=("created_sec", "min"),
            modified_sec=("modified_sec", "max"),
            n_commits=("n_commits", "sum"),
        )

    return (
        bucketed_apply(
            commits.map_batches(partial, batch_format="pyarrow"),
            ["repo", "path"],
            merge,
        )
        .select_columns(["repo", "path", "created_sec", "modified_sec", "n_commits"])
        .sort(["repo", "path"])
    )

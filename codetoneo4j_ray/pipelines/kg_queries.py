"""KG queries over the synthetic corpus + their DuckDB oracles.

The driver's correctness gate runs each ``queries()`` callable AND its
``oracle_sql()`` string side-by-side. C# parsing is not SQL-expressible,
so the oracle contract is: stage 1 (extraction) writes its raw record
stream to Parquet once per scale factor (deterministic: same corpus ⇒
same records); the *distributed* stages — linking semi-join, dedup,
structural-edge derivation, sort — are then computed BOTH by Ray (the
query) and by DuckDB (the oracle) from those same Parquet files.
Parsing itself is covered by the snippet-level pytest suite
(tests/test_csharp_extractor.py etc.), mirroring the reference's test
split (SURVEY §5). The files oracle additionally recomputes sha256 from
the corpus content in SQL, checking the per-row hash invariant.
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from codetoneo4j_ray.extractors.csharp.extractor import BASE_PRED, MEMBER_PRED
from codetoneo4j_ray.functions.tags import parse_namespace_tags
from codetoneo4j_ray.pipelines.build_graph import (
    extract_to_records,
    read_corpus_pinned,
    read_records,
)
from codetoneo4j_ray.sources.synth import corpus_dir_for_sf, ensure_corpus
from codetoneo4j_ray.stages.bucketing import coalesce
from codetoneo4j_ray.stages.canonicalize import dedup_nodes
from codetoneo4j_ray.stages.link import (
    build_member_indices,
    resolve_edges_broadcast,
    resolve_mentions,
    strip_internal,
)
from codetoneo4j_ray.stages.materialize import (
    finalize_files,
    finalize_nodes,
    structural_edges,
)
from codetoneo4j_ray.state.manifest import corpus_fingerprint, stage_is_complete, write_manifest

_KG_CONFIG = {"min_accessibility": "Private", "kg_cache_v": 18}


def kg_paths(sf_dir: str) -> dict[str, str]:
    base = os.path.join(corpus_dir_for_sf(sf_dir), "out")
    return {
        "out": base,
        "corpus": os.path.join(corpus_dir_for_sf(sf_dir), "corpus.parquet"),
        "records": os.path.join(base, "records"),
        "mentions": os.path.join(base, "mentions_resolved"),
        "tags_map": os.path.join(base, "tags_map.parquet"),
    }


def ensure_kg(sf_dir: str) -> dict[str, str]:
    """Generate corpus + run stage 1 + linking once per scale factor."""
    corpus_path = ensure_corpus(sf_dir)
    paths = kg_paths(sf_dir)
    fp = corpus_fingerprint(corpus_path, _KG_CONFIG)
    if stage_is_complete(paths["out"], "kgcache", fp):
        return paths
    from codetoneo4j_ray.sources.synth import ensure_packages
    from codetoneo4j_ray.stages.extract import load_pkg_meta

    corpus = read_corpus_pinned(corpus_path)
    records = extract_to_records(
        corpus, pkg_meta=load_pkg_meta(ensure_packages(sf_dir))
    )
    shutil.rmtree(paths["records"], ignore_errors=True)
    coalesce(records).write_parquet(paths["records"], partition_cols=["rec_type"])

    records_ds = read_records(paths["records"])
    member_indices = build_member_indices(read_records(paths["records"], "mention"))
    mention_cols = ["subj", "pred", "obj", "repo", "ctx_kind", "ctx_name",
                    "ctx_receiver", "ctx_argc"]
    raw_mentions = read_records(paths["records"], "mention")
    resolved = resolve_mentions(
        strip_internal(raw_mentions.select_columns(mention_cols)),
        member_indices,
    ).select_columns(["subj", "pred", "obj", "repo"])
    shutil.rmtree(paths["mentions"], ignore_errors=True)
    resolved.write_parquet(paths["mentions"])

    # namespace → tag side table so the oracle can join instead of
    # reimplementing the PascalCase splitter in SQL. Dedup is distributed
    # (per-batch Arrow unique, then Ray's aggregate-based ``unique``) so
    # the driver only ever receives the distinct namespace set — never a
    # corpus-sized column (this was the last driver-side structure on the
    # kg path that grew with corpus size).
    import pyarrow.compute as pc

    def _ns_batch_distinct(batch: pa.Table) -> pa.Table:
        col = pc.drop_null(batch.column("namespace").combine_chunks()).unique()
        return pa.table({"namespace": col})

    distinct_ns = (
        read_records(paths["records"], "symbol")
        .select_columns(["namespace"])
        .map_batches(_ns_batch_distinct, batch_format="pyarrow")
        .unique("namespace")
    )
    ns_col, tag_col = [], []
    for ns in sorted(n for n in distinct_ns if n is not None and n.strip()):
        for tag in parse_namespace_tags(ns):
            ns_col.append(ns)
            tag_col.append(tag)
    pq.write_table(
        pa.table({"namespace": pa.array(ns_col, pa.string()),
                  "tag": pa.array(tag_col, pa.string())}),
        paths["tags_map"],
    )
    write_manifest(paths["out"], "kgcache", fp, {"records": records_ds.count()})
    return paths


# ---------------------------------------------------------------------------
# Ray-side queries (each re-runs the distributed stages from the records)
# ---------------------------------------------------------------------------

_NODE_COLS = [
    "key", "name", "kind", "class", "fqn", "accessibility", "file_key",
    "path", "start_line", "end_line", "documentation", "comments",
    "namespace", "version", "language", "technology", "repo",
]


def q_kg_nodes(sf_dir: str) -> ray.data.Dataset:
    from codetoneo4j_ray.stages.canonicalize import _TIEBREAK, lww_sorted

    paths = ensure_kg(sf_dir)
    symbols = read_records(paths["records"], "symbol")
    return lww_sorted(finalize_nodes(symbols), "key", _TIEBREAK)


def kg_edges_raw(sf_dir: str) -> ray.data.Dataset:
    """Pre-dedup edge stream (the oracle's ``all_edges`` CTE): linked
    mention triples ∪ structural edges, duplicates included. Consumers
    that dedup themselves (graph_ops' DISTINCT-pair analytics) read this
    and skip the final table's sort/dedup exchange."""
    paths = ensure_kg(sf_dir)
    records = read_records(paths["records"])
    mentions = ray.data.read_parquet(paths["mentions"]).select_columns(
        ["subj", "pred", "obj"]
    )
    symbols = read_records(paths["records"], "symbol")
    symbol_keys = set(symbols.select_columns(["key"]).to_pandas()["key"])
    sym_edges = resolve_edges_broadcast(mentions, symbol_keys)
    return sym_edges.union(structural_edges(records))


def q_kg_edges(sf_dir: str) -> ray.data.Dataset:
    from codetoneo4j_ray.stages.canonicalize import distinct_sorted

    return distinct_sorted(kg_edges_raw(sf_dir))


def ensure_kg_edges(sf_dir: str) -> str:
    """Distinct (subj, pred, obj) edge table, computed once per corpus
    and cached as parquet (unsorted — consumers that need order sort
    themselves). Shared input of the graph-analytics ops, which would
    otherwise each re-run the linking maps per query."""
    from codetoneo4j_ray.stages.bucketing import bucketed_apply, coalesce, bucketed_apply_tasks

    paths = ensure_kg(sf_dir)
    fp = corpus_fingerprint(paths["corpus"], _KG_CONFIG)
    out = os.path.join(paths["out"], "edges_distinct")
    if stage_is_complete(paths["out"], "edges_distinct", fp):
        return out
    distinct = bucketed_apply_tasks(
        kg_edges_raw(sf_dir),
        ["subj", "pred", "obj"],
        lambda df: df.drop_duplicates(),
    )
    shutil.rmtree(out, ignore_errors=True)
    coalesce(distinct).write_parquet(out)
    write_manifest(paths["out"], "edges_distinct", fp, {})
    return out


def q_kg_files(sf_dir: str) -> ray.data.Dataset:
    from codetoneo4j_ray.stages.canonicalize import _FILE_TIEBREAK, lww_sorted

    paths = ensure_kg(sf_dir)
    files = read_records(paths["records"], "file")
    return lww_sorted(finalize_files(files), "key", _FILE_TIEBREAK)


def q_kg_symbol_kinds(sf_dir: str) -> ray.data.Dataset:
    """Node count per (language, kind) after dedup — aggregate sanity."""
    paths = ensure_kg(sf_dir)
    symbols = read_records(paths["records"], "symbol")
    import pandas as pd

    from codetoneo4j_ray.stages.bucketing import bucketed_apply, bucketed_apply_tasks

    def count(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["language", "kind"], as_index=False).size()
        return g.rename(columns={"size": "n"})

    return (
        bucketed_apply_tasks(dedup_nodes(symbols), ["language", "kind"], count)
        .sort(["language", "kind"])
    )


def q_kg_pred_counts(sf_dir: str) -> ray.data.Dataset:
    """Edge count per predicate over the FINAL edge table — exercises the
    full linking+dedup chain feeding a distributed aggregate."""
    import pandas as pd

    from codetoneo4j_ray.stages.bucketing import bucketed_apply, bucketed_apply_tasks

    edges = q_kg_edges(sf_dir)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("pred", as_index=False).agg(n=("n", "sum"))

    partial = edges.map_batches(
        lambda b: pa.Table.from_pandas(
            b.to_pandas().groupby("pred", as_index=False).size().rename(
                columns={"size": "n"}
            ),
            preserve_index=False,
        ),
        batch_format="pyarrow",
    )
    return bucketed_apply_tasks(partial, ["pred"], merge).sort("pred")


def _commits_path(sf_dir: str) -> str:
    from codetoneo4j_ray.sources.synth import ensure_commits

    return ensure_commits(sf_dir)


def q_kg_commits(sf_dir: str) -> ray.data.Dataset:
    """Commit nodes (UpsertCommit.cypher:1-3 MERGE by hash)."""
    from codetoneo4j_ray.pipelines.commits import commit_nodes, read_commits

    return commit_nodes(read_commits(_commits_path(sf_dir)))


def q_kg_commit_edges(sf_dir: str) -> ray.data.Dataset:
    """COMMITTED / PART_OF_PROJECT / MODIFIED_FILE triples."""
    from codetoneo4j_ray.pipelines.commits import commit_edges, read_commits

    return commit_edges(read_commits(_commits_path(sf_dir)))


def q_kg_authored(sf_dir: str) -> ray.data.Dataset:
    """Per-(author, file) AUTHORED fold with first/last/count props."""
    from codetoneo4j_ray.pipelines.commits import authored_stats, read_commits

    return authored_stats(read_commits(_commits_path(sf_dir)))


def q_kg_file_history(sf_dir: str) -> ray.data.Dataset:
    """Per-file created/lastModified/commit-count fold."""
    from codetoneo4j_ray.pipelines.commits import file_history, read_commits

    return file_history(read_commits(_commits_path(sf_dir)))


def q_kg_file_versions(sf_dir: str) -> ray.data.Dataset:
    """Per-file commit list (newest first) + distinct tag list, in the
    \\x1f-joined strict-comparable form — the ``f.commits`` / ``f.tags``
    File-node properties (UpsertFile.cypher:12-13, GitLogParser.cs:83-114)."""
    from codetoneo4j_ray.pipelines.commits import file_versions, read_commits

    return file_versions(read_commits(_commits_path(sf_dir)))


def q_kg_mentions_raw(sf_dir: str) -> ray.data.Dataset:
    """Raw mention triples (relBuffer analog, pre-linking) — rows-only."""
    paths = ensure_kg(sf_dir)
    return (
        ray.data.read_parquet(paths["mentions"])
        .select_columns(["subj", "pred", "obj"])
        .sort(["subj", "pred", "obj"])
    )


# ---------------------------------------------------------------------------
# DuckDB oracles (read the same parquet artifacts)
# ---------------------------------------------------------------------------


def _p(path: str) -> str:
    return f"read_parquet('{path}/*.parquet')"


def _p_hive(path: str) -> str:
    return f"read_parquet('{path}/*/*.parquet', hive_partitioning=1)"


def oracle_kg(sf_dir: str) -> dict[str, str]:
    paths = kg_paths(sf_dir)
    records = _p_hive(paths["records"])
    mentions = _p(paths["mentions"])
    corpus = f"read_parquet('{paths['corpus']}')"
    tags_map = f"read_parquet('{paths['tags_map']}')"
    commits = (
        "read_parquet('"
        + os.path.join(corpus_dir_for_sf(sf_dir), "commits.parquet")
        + "')"
    )

    edges_cte = f"""
        sym AS (SELECT * FROM {records} WHERE rec_type = 'symbol'),
        keys AS (SELECT DISTINCT key FROM sym),
        men AS (
            SELECT subj, pred, obj FROM {mentions}
            WHERE pred NOT IN ('{MEMBER_PRED}', '{BASE_PRED}')
        ),
        all_edges AS (
            SELECT m.subj, m.pred, m.obj
            FROM men m
            JOIN keys k1 ON m.subj = k1.key
            JOIN keys k2 ON m.obj = k2.key
            UNION ALL
            SELECT file_key, 'src__DECLARES', key FROM sym
            UNION ALL
            SELECT lower(repo), 'src__HAS_FILE', key
            FROM {records} WHERE rec_type = 'file'
            UNION ALL
            SELECT s.key, 'src__HAS_TAG', t.tag
            FROM sym s JOIN {tags_map} t ON s.namespace = t.namespace
            UNION ALL
            SELECT lower(repo), 'src__DEPENDS_ON', key
            FROM sym WHERE kind = 'Dependency'
            UNION ALL
            SELECT dep_key, 'src__HAS_URL', url_key
            FROM {records} WHERE rec_type = 'url'
        )
    """

    nodes_dedup = f"""
        SELECT * FROM (
            SELECT key, name, kind, "class", fqn, accessibility, file_key,
                   path, start_line, end_line,
                   substr(documentation, 1, 8000) AS documentation,
                   substr(comments, 1, 8000) AS comments,
                   namespace, version, language, technology, repo,
                   row_number() OVER (
                       PARTITION BY key
                       ORDER BY path DESC, start_line DESC, end_line DESC, repo DESC, namespace DESC, kind DESC, accessibility DESC
                   ) AS rn
            FROM {records} WHERE rec_type = 'symbol'
        ) WHERE rn = 1
    """
    return {
        "kg_nodes": f"""
            SELECT key, name, kind, "class", fqn, accessibility, file_key,
                   path, start_line, end_line, documentation, comments,
                   namespace, version, language, technology, repo
            FROM ({nodes_dedup}) ORDER BY key
        """,
        "kg_edges": f"""
            WITH {edges_cte}
            SELECT DISTINCT subj, pred, obj FROM all_edges
            ORDER BY subj, pred, obj
        """,
        "kg_files": f"""
            WITH filed AS (
                SELECT * FROM (
                    SELECT key, path, file_name, namespace, language,
                           technology, repo, commit,
                           row_number() OVER (
                               PARTITION BY key ORDER BY path DESC, repo DESC
                           ) AS rn
                    FROM {records} WHERE rec_type = 'file'
                ) WHERE rn = 1
            )
            SELECT DISTINCT f.key, f.path, f.file_name, f.namespace,
                   sha256(c.content) AS sha256,
                   f.language, f.technology, f.repo, f.commit
            FROM filed f
            JOIN {corpus} c ON f.repo = c.repo AND f.path = c.path
            ORDER BY f.key
        """,
        "kg_commits": f"""
            SELECT hash, repo, author, email,
                   CAST(floor(epoch(date)) AS BIGINT) AS date_sec, message
            FROM (
                SELECT *, row_number() OVER (
                    PARTITION BY hash
                    ORDER BY repo DESC, author DESC, email DESC,
                             epoch(date) DESC, message DESC
                ) AS rn FROM {commits}
            ) WHERE rn = 1 ORDER BY hash
        """,
        "kg_commit_edges": f"""
            WITH e AS (
                SELECT 'author:' || author AS subj,
                       'src__COMMITTED' AS pred,
                       'commit:' || hash AS obj
                FROM {commits}
                UNION ALL
                SELECT 'commit:' || hash, 'src__PART_OF_PROJECT', lower(repo)
                FROM {commits}
                UNION ALL
                SELECT 'commit:' || hash, 'src__MODIFIED_FILE',
                       unnest(changed_paths)
                FROM {commits}
            )
            SELECT DISTINCT subj, pred, obj FROM e ORDER BY subj, pred, obj
        """,
        "kg_authored": f"""
            SELECT author, path,
                   min(sec) AS first_sec, max(sec) AS last_sec,
                   count(*) AS commit_count
            FROM (
                SELECT author,
                       CAST(floor(epoch(date)) AS BIGINT) AS sec,
                       unnest(changed_paths) AS path
                FROM {commits}
            )
            GROUP BY author, path ORDER BY author, path
        """,
        "kg_file_history": f"""
            SELECT repo, path,
                   min(sec) AS created_sec, max(sec) AS modified_sec,
                   count(*) AS n_commits
            FROM (
                SELECT repo,
                       CAST(floor(epoch(date)) AS BIGINT) AS sec,
                       unnest(changed_paths) AS path
                FROM {commits}
            )
            GROUP BY repo, path ORDER BY repo, path
        """,
        "kg_file_versions": f"""
            WITH x AS (
                SELECT repo, hash,
                       CAST(floor(epoch(date)) AS BIGINT) AS sec,
                       unnest(changed_paths) AS path, tags
                FROM {commits}
            ),
            cc AS (
                SELECT repo, path,
                       string_agg(hash, chr(31) ORDER BY sec DESC, hash ASC)
                           AS commits_csv
                FROM x GROUP BY repo, path
            ),
            tc AS (
                SELECT repo, path,
                       string_agg(tag, chr(31) ORDER BY tag) AS tags_csv
                FROM (SELECT DISTINCT repo, path, unnest(tags) AS tag FROM x)
                GROUP BY repo, path
            )
            SELECT cc.repo, cc.path, cc.commits_csv,
                   COALESCE(tc.tags_csv, '') AS tags_csv
            FROM cc LEFT JOIN tc
                ON cc.repo = tc.repo AND cc.path = tc.path
            ORDER BY cc.repo, cc.path
        """,
        "kg_symbol_kinds": f"""
            SELECT language, kind, count(*) AS n
            FROM ({nodes_dedup})
            GROUP BY language, kind ORDER BY language, kind
        """,
        "kg_degree_topk": f"""
            WITH {edges_cte},
            deg AS (
                SELECT subj, count(*) AS n
                FROM (SELECT DISTINCT subj, pred, obj FROM all_edges)
                GROUP BY subj
            ),
            ranked AS (
                SELECT subj, n, row_number() OVER (
                    ORDER BY n DESC, subj
                ) AS rn FROM deg
            )
            SELECT subj, n FROM ranked WHERE rn <= {DEGREE_TOPK_K} ORDER BY subj
        """,
        "kg_pred_counts": f"""
            WITH {edges_cte}
            SELECT pred, count(*) AS n
            FROM (SELECT DISTINCT subj, pred, obj FROM all_edges)
            GROUP BY pred ORDER BY pred
        """,
        "kg_pagerank": _graph_ops().pagerank_oracle_sql(edges_cte),
        "kg_triangles": _graph_ops().triangles_oracle_sql(edges_cte),
        "kg_components": _graph_ops().components_oracle_sql(edges_cte),
        "kg_bfs_depth": _graph_ops().bfs_depth_oracle_sql(edges_cte),
        "kg_sssp": _graph_ops().sssp_oracle_sql(edges_cte),
    }


def _graph_ops():
    from codetoneo4j_ray.pipelines import graph_ops

    return graph_ops


DEGREE_TOPK_K = 20


def q_kg_degree_topk(sf_dir: str, k: int = DEGREE_TOPK_K) -> ray.data.Dataset:
    """Top-k node keys by out-degree over the FINAL edge table — the
    graph-analytics heavy-hitter a KG consumer runs first. Same partial/
    merge/global-top-k pattern as top_tokens: per-batch counts, bucketed
    exact merge by subj, per-bucket local top-k, one global merge."""
    import pandas as pd

    from codetoneo4j_ray.stages.bucketing import bucketed_apply, bucketed_apply_tasks

    edges = q_kg_edges(sf_dir)

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas().groupby("subj", as_index=False).size().rename(
            columns={"size": "n"}
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["n", "subj"], ascending=[False, True],
                            kind="stable").head(k)
        df["n"] = df["n"].astype("int64")
        return df

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return topk(df.groupby("subj", as_index=False).agg(n=("n", "sum")))

    partials = edges.map_batches(partial, batch_format="pyarrow")
    return bucketed_apply_tasks(
        bucketed_apply_tasks(partials, ["subj"], merge), [], topk
    ).sort("subj")

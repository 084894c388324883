"""Graph analytics over the FINAL KG edge table.

The reference stops at materializing the graph into Neo4j, where a
consumer's first analytical queries are centrality and cohesion
(degree — already covered by kg_degree_topk — plus PageRank and
triangle counts). These run here as distributed Ray Data pipelines over
the same canonical (subj, pred, obj) table the sinks emit.

Strict-oracle design notes:

* ``kg_pagerank`` is a FIXED-POINT power iteration: ranks are scaled
  BIGINTs and every step is integer arithmetic (floor division), so
  the result is exactly order-independent — float summation would make
  a distributed run non-reproducible and could never value-hash-match
  a SQL oracle. Dangling-node mass is dropped (not redistributed),
  matching the unrolled-CTE oracle literally.
* ``kg_triangles`` counts each triangle once via degree-ordered
  orientation (every triangle has exactly one vertex whose two other
  corners are both out-neighbors under a total order on (degree, key)),
  which also bounds per-node wedge generation by O(sqrt(m)) out-degree
  — the standard scalable MapReduce triangle plan. The oracle
  enumerates triangles independently with a key-ordered 3-way
  self-join; the per-node counts must agree exactly.

Both ops consume ``q_kg_edges`` (the deduped, sorted output table), so
they also serve as end-to-end consumers of the KG pipeline. All joins
are hash-bucketed exchanges (stages/bucketing.py) — nothing driver-side
grows with the graph.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from codetoneo4j_ray.stages.bucketing import bucketed_apply

PAGERANK_SCALE = 1_000_000_000  # rank fixed-point unit (1e-9 of total mass)
PAGERANK_ITERS = 5
TRIANGLE_TOPK_K = 20

# int64 overflow guard for 85 * sum(contrib): sums stay far below this
# for any graph whose total mass N * SCALE fits int64 / 85 — at
# SCALE=1e9 that is ~1e8 nodes; shrink SCALE for larger graphs.
_MAX_SAFE_SUM = (2**63 - 1) // 85


def _dedup(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates()


def _distinct_pairs(edges: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct directed (subj, obj) node pairs, pred collapsed."""

    def to_pairs(b: pa.Table) -> pa.Table:
        df = b.to_pandas()[["subj", "obj"]].drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    return bucketed_apply(
        edges.map_batches(to_pairs, batch_format="pyarrow"),
        ["subj", "obj"],
        _dedup,
    )


def kg_pagerank(
    sf_dir: str,
    iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
) -> ray.data.Dataset:
    """Fixed-point PageRank over the final KG edge table (see
    :func:`pagerank_over`). Reads the pre-dedup edge stream — the
    DISTINCT-pair collapse inside pagerank_over subsumes the final
    table's dedup, so its sort exchange is skipped."""
    from codetoneo4j_ray.pipelines.kg_queries import kg_edges_raw

    return pagerank_over(kg_edges_raw(sf_dir), iters=iters, scale=scale)


def pagerank_over(
    edges: ray.data.Dataset,
    iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
) -> ray.data.Dataset:
    """Fixed-point PageRank (damping 0.85, ``iters`` synchronous steps)
    over distinct (subj, obj) pairs of an edge dataset.

    Update rule, all-BIGINT:  r'(v) = 15*scale//100
    + 85 * sum_{u->v}( r(u) // outdeg(u) ) // 100.

    Output: (node, rank_fp) for every node appearing in any edge,
    sorted by node. Per iteration: one rank⋈edge bucket exchange + one
    contribution-sum exchange; ranks and the degree-annotated edge list
    are pinned with materialize() so the per-iteration lineage stays
    flat (same pattern as embedding_kmeans)."""
    pairs = _distinct_pairs(edges).materialize()

    def endpoints(b: pa.Table) -> pa.Table:
        vals = pd.unique(
            np.concatenate(
                [
                    b["subj"].to_numpy(zero_copy_only=False),
                    b["obj"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"node": pa.array(vals, pa.string())})

    nodes = bucketed_apply(
        pairs.map_batches(endpoints, batch_format="pyarrow"),
        ["node"],
        _dedup,
    ).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        g = b.to_pandas().groupby("subj", as_index=False).size()
        return pa.table(
            {
                "subj": pa.array(g["subj"], pa.string()),
                "obj": pa.nulls(len(g), pa.string()),
                "d": pa.array(g["size"], pa.int64()),
                "side": pa.array(["d"] * len(g), pa.string()),
            }
        )

    def pair_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "subj": b["subj"],
                "obj": b["obj"],
                "d": pa.nulls(n, pa.int64()),
                "side": pa.array(["e"] * n, pa.string()),
            }
        )

    def attach_deg(df: pd.DataFrame) -> pd.DataFrame:
        e = df.loc[df["side"] == "e", ["subj", "obj"]]
        # per-batch partial counts sum to the exact out-degree inside the
        # bucket (all rows of a subj land here), no separate exchange
        d = (
            df.loc[df["side"] == "d", ["subj", "d"]]
            .groupby("subj", as_index=False)
            .agg(d=("d", "sum"))
        )
        m = e.merge(d, on="subj", how="inner")
        m["d"] = m["d"].astype("int64")
        return m[["subj", "obj", "d"]]

    edges_deg = bucketed_apply(
        pairs.map_batches(pair_side, batch_format="pyarrow").union(
            pairs.map_batches(deg_partial, batch_format="pyarrow")
        ),
        ["subj"],
        attach_deg,
    ).materialize()

    base = 15 * scale // 100

    def init_rank(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": b["node"],
                "r": pa.array([scale] * b.num_rows, pa.int64()),
            }
        )

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow").materialize()

    def rank_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "subj": b["node"],
                "obj": pa.nulls(n, pa.string()),
                "d": pc_cast_int64(b["r"]),
                "side": pa.array(["r"] * n, pa.string()),
            }
        )

    def contribute(df: pd.DataFrame) -> pd.DataFrame:
        e = df.loc[df["side"] == "e", ["subj", "obj", "d"]].rename(
            columns={"d": "outdeg"}
        )
        r = df.loc[df["side"] == "r", ["subj", "d"]].rename(columns={"d": "r"})
        m = e.merge(r, on="subj", how="inner")
        c = (m["r"].astype("int64") // m["outdeg"].astype("int64")).astype(
            "int64"
        )
        return pd.DataFrame({"node": m["obj"], "c": c})

    def node_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "node": b["node"],
                "c": pa.nulls(n, pa.int64()),
                "side": pa.array(["n"] * n, pa.string()),
            }
        )

    def apply_rank(df: pd.DataFrame) -> pd.DataFrame:
        c = df.loc[df["side"] == "c", ["node", "c"]]
        s = c.groupby("node", as_index=False).agg(s=("c", "sum"))
        if len(s) and int(s["s"].max()) > _MAX_SAFE_SUM:
            raise OverflowError(
                "pagerank fixed-point sum exceeds int64/85; lower scale"
            )
        n = df.loc[df["side"] == "n", ["node"]]
        m = n.merge(s, on="node", how="left")
        m["s"] = m["s"].fillna(0).astype("int64")
        m["r"] = base + 85 * m["s"] // 100
        return m[["node", "r"]]

    nodes_tagged = nodes.map_batches(node_side, batch_format="pyarrow")

    for _ in range(iters):
        contrib = bucketed_apply(
            edges_deg.map_batches(pair_deg_side, batch_format="pyarrow").union(
                ranks.map_batches(rank_side, batch_format="pyarrow")
            ),
            ["subj"],
            contribute,
        )

        def contrib_side(b: pa.Table) -> pa.Table:
            n = b.num_rows
            return pa.table(
                {
                    "node": b["node"],
                    "c": pc_cast_int64(b["c"]),
                    "side": pa.array(["c"] * n, pa.string()),
                }
            )

        ranks = bucketed_apply(
            nodes_tagged.union(
                contrib.map_batches(contrib_side, batch_format="pyarrow")
            ),
            ["node"],
            apply_rank,
        ).materialize()

    def rename(b: pa.Table) -> pa.Table:
        return pa.table({"node": b["node"], "rank_fp": pc_cast_int64(b["r"])})

    return ranks.map_batches(rename, batch_format="pyarrow").sort("node")


def pc_cast_int64(arr: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    import pyarrow.compute as pc

    return pc.cast(arr, pa.int64())


def pair_deg_side(b: pa.Table) -> pa.Table:
    """(subj, obj, d=outdeg) rows tagged 'e' for the contribution join."""
    return pa.table(
        {
            "subj": b["subj"],
            "obj": b["obj"],
            "d": pc_cast_int64(b["d"]),
            "side": pa.array(["e"] * b.num_rows, pa.string()),
        }
    )


def pagerank_oracle_sql(
    edges_cte: str,
    iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
) -> str:
    """Unrolled fixed-iteration power-step CTE chain (no recursion —
    the node list must be re-joined every step for dangling nodes,
    which a recursive CTE's single self-reference cannot express).
    BIGINT throughout; ``//`` is DuckDB integer division, and sum() is
    cast back from HUGEINT so the schema stays BIGINT."""
    base = 15 * scale // 100
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(
            f"""r{i} AS (
            SELECT n.node,
                   CAST({base} + 85 * COALESCE(c.s, 0) // 100 AS BIGINT) AS r
            FROM pr_nodes n LEFT JOIN (
                SELECT p.obj AS node,
                       CAST(sum(r.r // d.d) AS BIGINT) AS s
                FROM {prev} r
                JOIN pr_deg d ON d.node = r.node
                JOIN pr_pairs p ON p.subj = r.node
                GROUP BY p.obj
            ) c ON c.node = n.node
        )"""
        )
        prev = f"r{i}"
    chain = ",\n        ".join(steps)
    return f"""
        WITH {edges_cte},
        pr_pairs AS (SELECT DISTINCT subj, obj FROM all_edges),
        pr_nodes AS (
            SELECT subj AS node FROM pr_pairs
            UNION SELECT obj FROM pr_pairs
        ),
        pr_deg AS (
            SELECT subj AS node, count(*) AS d FROM pr_pairs GROUP BY subj
        ),
        r0 AS (
            SELECT node, CAST({scale} AS BIGINT) AS r FROM pr_nodes
        ),
        {chain}
        SELECT node, r AS rank_fp FROM {prev} ORDER BY node
    """


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------


def kg_triangles(sf_dir: str, k: int = TRIANGLE_TOPK_K) -> ray.data.Dataset:
    """Triangle participation top-k over the final KG edge table (see
    :func:`triangles_over`). Reads the pre-dedup edge stream — the
    canonical-undirected-pair collapse subsumes the final dedup."""
    from codetoneo4j_ray.pipelines.kg_queries import kg_edges_raw

    return triangles_over(kg_edges_raw(sf_dir), k=k)


def triangles_over(
    edges: ray.data.Dataset, k: int = TRIANGLE_TOPK_K
) -> ray.data.Dataset:
    """Top-k nodes by triangle participation over the undirected,
    self-loop-free distinct pair graph of an edge dataset.

    Plan (Cohen's degree-oriented MapReduce scheme): canonical
    undirected pairs → per-node degrees → orient each edge from the
    (degree, key)-smaller endpoint → per-source wedge generation
    (all-pairs of out-neighbors, out-degree ≤ O(sqrt(m)) by the
    orientation) → bucketed wedge⋈edge join closes triangles, each
    counted exactly once at its unique orientation-source vertex →
    per-node count + the same local-topk/global-merge as
    kg_degree_topk. Output (node, n_tri), ordered by node."""

    def undirected(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df = df[df["subj"] != df["obj"]]
        s = df["subj"].to_numpy()
        o = df["obj"].to_numpy()
        swap = s < o
        out = pd.DataFrame(
            {"a": np.where(swap, s, o), "b": np.where(swap, o, s)}
        ).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    und = bucketed_apply(
        edges.map_batches(undirected, batch_format="pyarrow"),
        ["a", "b"],
        _dedup,
    ).materialize()

    def deg_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        cnt = pd.concat([df["a"], df["b"]]).value_counts()
        return pa.table(
            {
                "node": pa.array(cnt.index.to_numpy(), pa.string()),
                "d": pa.array(cnt.to_numpy(), pa.int64()),
            }
        )

    deg = bucketed_apply(
        und.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"],
        lambda df: df.groupby("node", as_index=False).agg(d=("d", "sum")),
    ).materialize()

    # two bucket joins attach (deg_a, deg_b) to every undirected edge
    def edge_side_a(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "a": b["a"],
                "b": b["b"],
                "d": pa.nulls(n, pa.int64()),
                "side": pa.array(["e"] * n, pa.string()),
            }
        )

    def deg_side_a(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "a": b["node"],
                "b": pa.nulls(n, pa.string()),
                "d": pc_cast_int64(b["d"]),
                "side": pa.array(["d"] * n, pa.string()),
            }
        )

    def join_a(df: pd.DataFrame) -> pd.DataFrame:
        e = df.loc[df["side"] == "e", ["a", "b"]]
        d = df.loc[df["side"] == "d", ["a", "d"]].rename(columns={"d": "da"})
        m = e.merge(d, on="a", how="inner")
        m["da"] = m["da"].astype("int64")
        return m[["a", "b", "da"]]

    with_da = bucketed_apply(
        und.map_batches(edge_side_a, batch_format="pyarrow").union(
            deg.map_batches(deg_side_a, batch_format="pyarrow")
        ),
        ["a"],
        join_a,
    )

    def edge_side_b(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "a": b["a"],
                "b": b["b"],
                "da": pc_cast_int64(b["da"]),
                "d": pa.nulls(n, pa.int64()),
                "side": pa.array(["e"] * n, pa.string()),
            }
        )

    def deg_side_b(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "a": pa.nulls(n, pa.string()),
                "b": b["node"],
                "da": pa.nulls(n, pa.int64()),
                "d": pc_cast_int64(b["d"]),
                "side": pa.array(["d"] * n, pa.string()),
            }
        )

    def join_b_orient(df: pd.DataFrame) -> pd.DataFrame:
        e = df.loc[df["side"] == "e", ["a", "b", "da"]]
        d = df.loc[df["side"] == "d", ["b", "d"]].rename(columns={"d": "db"})
        m = e.merge(d, on="b", how="inner")
        a = m["a"].to_numpy()
        b_ = m["b"].to_numpy()
        da = m["da"].to_numpy().astype("int64")
        db = m["db"].to_numpy().astype("int64")
        a_first = (da < db) | ((da == db) & (a < b_))
        return pd.DataFrame(
            {
                "src": np.where(a_first, a, b_),
                "dst": np.where(a_first, b_, a),
            }
        )

    oriented = bucketed_apply(
        with_da.map_batches(edge_side_b, batch_format="pyarrow").union(
            deg.map_batches(deg_side_b, batch_format="pyarrow")
        ),
        ["b"],
        join_b_orient,
    )

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(df, on="src")
        m = m[m["dst_x"] < m["dst_y"]]
        return pd.DataFrame(
            {"a": m["dst_x"], "b": m["dst_y"], "center": m["src"]}
        )

    wedge_rows = bucketed_apply(oriented, ["src"], wedges)

    def und_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "a": b["a"],
                "b": b["b"],
                "center": pa.nulls(n, pa.string()),
                "side": pa.array(["e"] * n, pa.string()),
            }
        )

    def wedge_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "a": b["a"],
                "b": b["b"],
                "center": b["center"],
                "side": pa.array(["w"] * n, pa.string()),
            }
        )

    def close(df: pd.DataFrame) -> pd.DataFrame:
        e = df.loc[df["side"] == "e", ["a", "b"]]
        w = df.loc[df["side"] == "w", ["a", "b", "center"]]
        m = w.merge(e, on=["a", "b"], how="inner")
        nodes = pd.concat([m["center"], m["a"], m["b"]])
        cnt = nodes.value_counts()
        return pd.DataFrame(
            {
                "node": cnt.index.to_numpy(),
                "n_tri": cnt.to_numpy().astype("int64"),
            }
        )

    tri_partial = bucketed_apply(
        und.map_batches(und_side, batch_format="pyarrow").union(
            wedge_rows.map_batches(wedge_side, batch_format="pyarrow")
        ),
        ["a", "b"],
        close,
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["n_tri", "node"], ascending=[False, True], kind="stable"
        ).head(k)
        df["n_tri"] = df["n_tri"].astype("int64")
        return df

    def merge_counts(df: pd.DataFrame) -> pd.DataFrame:
        return topk(df.groupby("node", as_index=False).agg(n_tri=("n_tri", "sum")))

    return bucketed_apply(
        bucketed_apply(tri_partial, ["node"], merge_counts), [], topk
    ).sort("node")


def triangles_oracle_sql(edges_cte: str, k: int = TRIANGLE_TOPK_K) -> str:
    """Independent enumeration: key-ordered canonical triangles via a
    3-way self-join, then per-node participation counts."""
    return f"""
        WITH {edges_cte},
        tri_und AS (
            SELECT DISTINCT least(subj, obj) AS a, greatest(subj, obj) AS b
            FROM (SELECT DISTINCT subj, obj FROM all_edges)
            WHERE subj <> obj
        ),
        tri AS (
            SELECT e1.a AS x, e1.b AS y, e2.b AS z
            FROM tri_und e1
            JOIN tri_und e2 ON e2.a = e1.b
            JOIN tri_und e3 ON e3.a = e1.a AND e3.b = e2.b
        ),
        pernode AS (
            SELECT node, count(*) AS n_tri FROM (
                SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            ) GROUP BY node
        ),
        ranked AS (
            SELECT node, n_tri, row_number() OVER (
                ORDER BY n_tri DESC, node
            ) AS rn FROM pernode
        )
        SELECT node, n_tri FROM ranked WHERE rn <= {k} ORDER BY node
    """

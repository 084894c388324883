"""Graph analytics over the FINAL KG edge table.

The reference stops at materializing the graph into Neo4j, where a
consumer's first analytical queries are centrality and cohesion
(degree — already covered by kg_degree_topk — plus PageRank, triangle
counts, connected components and BFS layering). These run here as
distributed Ray Data pipelines over the same canonical
(subj, pred, obj) table the sinks emit.

Strict-oracle design notes:

* ``kg_pagerank`` is a FIXED-POINT power iteration: ranks are scaled
  BIGINTs and every step is integer arithmetic (floor division), so
  the result is exactly order-independent — float summation would make
  a distributed run non-reproducible and could never value-hash-match
  a SQL oracle. Dangling-node mass is dropped (not redistributed),
  matching the unrolled-CTE oracle literally.
* ``kg_components`` runs min-label propagation TO CONVERGENCE (the
  frontier empties), accelerated by pointer-jumping at every
  checkpoint, so the output is the true connected components — the
  oracle is an until-fixpoint recursive reachability CTE, not an
  unrolled approximation. A high safety bound raises instead of
  returning partial labels.
* ``kg_bfs_depth`` likewise runs until the BFS wave empties; its
  safety bound doubles as the oracle's walk-length cap, so whenever
  the Ray side succeeds the two are exactly equal.
* ``kg_triangles`` counts each triangle once via degree-ordered
  orientation (every triangle has exactly one vertex whose two other
  corners are both out-neighbors under a total order on (degree, key)),
  which also bounds per-node wedge generation by O(sqrt(m)) out-degree
  — the standard scalable MapReduce triangle plan. The oracle
  enumerates triangles independently with a key-ordered 3-way
  self-join; the per-node counts must agree exactly.

Scale plan (the part that matters at 100 TB): all four ops first map
node keys to dense ORDER-PRESERVING int64 ids (assign_order_ids), so
every edge-sized exchange and every per-iteration shuffle carries
8-byte integers instead of repeated long symbol strings
(``repo:Namespace.Type.Method(params)``), and every groupby/merge is
numeric. The big sides are pinned ONCE into per-bucket object-store
pieces (stages/bucketing.BucketStore) and every repeated or
data-amplifying join becomes a worker-local lookup against those
pieces:

* PageRank moves the (already int-encoded) edge list through an
  exchange exactly once; each of the ``iters`` steps shuffles only
  node-sized rank rows plus map-side-combined contribution partials
  (1 exchange per step, vs the naive 2 full edge re-shuffles per
  step).
* Components/BFS propagate int64 labels against the pinned adjacency
  with frontier (delta) filtering; pointer-jumping at checkpoints
  turns path-shaped convergence from O(diameter) into O(log n)
  rounds.
* Triangle counting attaches degrees and closes wedges by bucket
  lookup, so the wedge stream — the largest intermediate in any
  triangle plan, O(m^1.5) rows — is generated and consumed in one
  streaming pass and never enters an all-to-all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from codetoneo4j_ray.stages.bucketing import (
    build_bucket_store,
    bucketed_apply,
    hash_bucket_series,
    prebucketed_apply,
    process_cache,
    target_blocks,
)

PAGERANK_SCALE = 1_000_000_000  # rank fixed-point unit (1e-9 of total mass)
PAGERANK_ITERS = 5
TRIANGLE_TOPK_K = 20

# int64 overflow guard for 85 * sum(contrib): per-node contribution
# sums are bounded by the total rank mass, which never exceeds
# num_nodes * scale (each step's total is 0.15*n*scale + 0.85 * the
# incoming mass, a contraction) — so validating n*scale up-front
# covers every map-side partial and reduce-side sum in every
# iteration. At SCALE=1e9 that is ~1e8 nodes; shrink SCALE for
# larger graphs.
_MAX_SAFE_SUM = (2**63 - 1) // 85

# convergence-safety bounds: iteration PAST convergence is the
# identity, so these are pure runaway guards that RAISE rather than
# ever returning partial labels. With pointer-jumping, component
# convergence is O(log diameter)-ish — 512 rounds is astronomically
# conservative. BFS needs O(eccentricity-from-roots) rounds; a code
# KG deeper than 256 hops from its repo roots trips the guard loudly
# (raise max_iters AND the oracle cap together — they must agree).
CC_MAX_ITERS = 512
BFS_MAX_ITERS = 256

# checkpoint cadence for iterative lazy chains: Ray's planning and
# execution overhead grows superlinearly with chained sort stages, so
# the loops pin the (node-sized) labels every few steps, test
# convergence there, and (for components) pointer-jump before
# continuing.
_CHAIN_CHECKPOINT = 3

# rounds executed by the most recent convergence loop of each op in
# this process — introspection for benchmarks/tests (the loops are
# driver-side, so a plain module dict is accurate per session)
LAST_RUN_ROUNDS: dict[str, int] = {}


def _dedup(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates()


# ---------------------------------------------------------------------------
# int64 node-id encoding shared by all four ops
# ---------------------------------------------------------------------------


def _ibucket(values, num_buckets: int) -> np.ndarray:
    """Bucket ids for int64 keys — the numeric analog of
    hash_bucket_series, without the stringify round-trip. Only valid
    for co-locating with stores whose tags were ALSO produced by this
    function (the graph ops' nid-keyed stores), never with
    add_bucket_column's string-cast buckets."""
    arr = np.asarray(values, dtype="int64")
    h = pd.util.hash_array(arr, categorize=False)
    return (h % num_buckets).astype(np.int32)


def _ibucket2(a, b, num_buckets: int) -> np.ndarray:
    """Bucket ids for int64 PAIRS (triangle wedge-closing lookups)."""
    ha = pd.util.hash_array(np.asarray(a, dtype="int64"), categorize=False)
    hb = pd.util.hash_array(np.asarray(b, dtype="int64"), categorize=False)
    return ((ha * np.uint64(0x9E3779B97F4A7C15) + hb) % num_buckets).astype(
        np.int32
    )


@ray.remote
def _stamp_ids(block, offset: int):
    """Stamp a sorted node block with its global dense rank range."""
    if isinstance(block, pd.DataFrame):
        t = pa.Table.from_pandas(block, preserve_index=False)
    else:
        t = block
    if t.num_rows == 0 or "node" not in t.column_names:
        # Ray drops the schema of empty blocks through sort
        return pa.table(
            {
                "node": pa.array([], pa.string()),
                "nid": pa.array([], pa.int64()),
            }
        )
    return pa.table(
        {
            "node": t["node"],
            "nid": pa.array(
                np.arange(offset, offset + t.num_rows, dtype="int64")
            ),
        }
    )


def assign_order_ids(nodes: ray.data.Dataset) -> ray.data.Dataset:
    """(node: string, distinct) → (node, nid: int64) with nid the dense
    ORDER-PRESERVING rank of node in global key order — so integer MIN
    over nids agrees with lexicographic MIN over keys. One Ray sort
    range-partitions the keys; per-block offsets come from block
    METADATA only (a driver-side prefix over block row counts, never
    rows); ids are stamped by raw tasks over the sorted block refs
    (the same block-ref pattern as build_bucket_store)."""
    snodes = nodes.sort("node").materialize()
    refs: list = []
    counts: list[int] = []
    for bundle in snodes.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            refs.append(ref)
            counts.append(meta.num_rows)
    if not refs:
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "nid": pa.array([], pa.int64()),
                }
            )
        )
    offsets = np.concatenate([[0], np.cumsum(counts[:-1])]).tolist()
    return ray.data.from_arrow_refs(
        [_stamp_ids.remote(r, int(off)) for r, off in zip(refs, offsets)]
    )


_SERIES_CACHE: dict[tuple, pd.Series] = {}
_SERIES_CACHE_MAX = 512  # ~2 stores x 64 buckets x 2 directions, LRU-ish


class _LookupJoin:
    """Map-side id lookups against a pinned store: batch values are
    grouped by the bucket their key hashes to and mapped through that
    bucket's key→val Series. The indexed Series is built once per
    (store, bucket) per worker process — never per batch — so the
    per-batch cost is pure hash + take. Integer keys hash through
    _ibucket, strings through hash_bucket_series — matching how each
    kind of store is tagged at build time."""

    def __init__(self, store, num_buckets: int):
        self._store = store
        self._k = num_buckets

    def _bucket_series(self, k: int, key: str, val: str) -> pd.Series:
        ck = (self._store.token, k, key, val)
        s = _SERIES_CACHE.get(ck)
        if s is None:
            df = process_cache(self._store).bucket_df(k)
            s = df.set_index(key)[val] if not df.empty else pd.Series(dtype=object)
            while len(_SERIES_CACHE) >= _SERIES_CACHE_MAX:
                _SERIES_CACHE.pop(next(iter(_SERIES_CACHE)))
            _SERIES_CACHE[ck] = s
        return s

    def _mapping(self, values: pd.Series, key: str, val: str) -> pd.Series:
        if pd.api.types.is_integer_dtype(values):
            ids = _ibucket(values.to_numpy(), self._k)
        else:
            ids = hash_bucket_series(values, self._k)
        vnp = values.to_numpy()
        out = np.empty(len(values), dtype=object)
        for k in np.unique(ids):
            mask = ids == k
            s = self._bucket_series(int(k), key, val)
            out[mask] = pd.Series(vnp[mask]).map(s).to_numpy()
        return pd.Series(out, index=values.index)


class _EncodeAdj(_LookupJoin):
    """(src, dst) strings → int64 nids, tagged map-side with the
    bucket of src's nid so the encoded adjacency exchanges (for its
    dedup/degree reduce) on 8-byte keys and pins straight into a
    BucketStore. ``extra`` names int64 columns (e.g. edge weights)
    copied through unchanged."""

    def __init__(
        self,
        store,
        num_buckets: int,
        src: str = "src",
        dst: str = "dst",
        extra: tuple[str, ...] = (),
    ):
        super().__init__(store, num_buckets)
        self._src = src
        self._dst = dst
        self._extra = extra

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            cols = {
                "src": pd.Series([], dtype="int64"),
                "dst": pd.Series([], dtype="int64"),
            }
            for c in self._extra:
                cols[c] = pd.Series([], dtype="int64")
            cols["__bucket"] = pd.Series([], dtype="int32")
            return pd.DataFrame(cols)
        out = pd.DataFrame(
            {
                "src": self._mapping(batch[self._src], "node", "nid").astype(
                    "int64"
                ),
                "dst": self._mapping(batch[self._dst], "node", "nid").astype(
                    "int64"
                ),
            }
        )
        for c in self._extra:
            out[c] = batch[c].astype("int64").to_numpy()
        out["__bucket"] = _ibucket(out["src"], self._k)
        return out


class _DecodeLabels(_LookupJoin):
    """(node: nid, lbl: nid) → (node, comp) strings via the reverse
    (nid → node) store."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype=object),
                    "comp": pd.Series([], dtype=object),
                }
            )
        return pd.DataFrame(
            {
                "node": self._mapping(batch["node"], "nid", "node").to_numpy(),
                "comp": self._mapping(batch["lbl"], "nid", "node").to_numpy(),
            }
        )


def _tag_by_nid(num_buckets: int):
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _ibucket(df["nid"], num_buckets)
        return df

    return tag


_KG_ID_CACHE: dict[tuple, tuple] = {}


def _kg_id_tables(sf_dir: str, num_buckets: int):
    """Once-per-session dense id assignment over the KG edge table's
    endpoint set, shared by all four kg_* graph ops: the node set (and
    its order-preserving nids) is identical for pagerank / components /
    BFS and a superset for triangles (which drops self-loop-only
    nodes — a superset mapping preserves order on any subset), so the
    endpoint exchange, the global sort, and both id stores are built
    once per corpus per session instead of once per op. Returns
    (ids, id_store, rev_store); the Ray objects stay alive while the
    cache holds them (driver-owned refs)."""
    from codetoneo4j_ray.pipelines.kg_queries import ensure_kg_edges

    path = ensure_kg_edges(sf_dir)
    key = (path, num_buckets)
    hit = _KG_ID_CACHE.get(key)
    if hit is not None:
        return hit
    edges = ray.data.read_parquet(
        path, columns=["subj", "obj"], override_num_blocks=num_buckets
    )

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
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["node"],
        _dedup,
        num_buckets,
    )
    ids = assign_order_ids(nodes).materialize()
    id_store = build_bucket_store(ids, ["node"], num_buckets)
    rev_store = build_bucket_store(
        ids.map_batches(_tag_by_nid(num_buckets), batch_format="pandas"),
        None,
        num_buckets,
    )
    out = (ids, id_store, rev_store)
    while len(_KG_ID_CACHE) >= 4:
        _KG_ID_CACHE.pop(next(iter(_KG_ID_CACHE)))
    _KG_ID_CACHE[key] = out
    return out


def _encode_pairs(
    pairs: ray.data.Dataset,
    num_buckets: int,
    reduce_fn=None,
    src: str = "src",
    dst: str = "dst",
    id_tables: tuple | None = None,
    extra: tuple[str, ...] = (),
):
    """Shared front half of every graph op: map-side-distinct string
    (src, dst) pairs → dense int64 ids and an int-encoded, exchanged
    adjacency.

    Returns (ids, id_store, rev_store, adj) where

    * ids — materialized (node: string, nid: int64), order-preserving;
    * id_store — node → nid BucketStore (string-hashed);
    * rev_store — nid → node BucketStore (_ibucket-tagged);
    * adj — materialized (src, dst: int64, __bucket=_ibucket(src), plus
      whatever ``reduce_fn`` added), deduped per bucket. The ONLY
      edge-sized exchange in the plan, and it carries 8-byte keys.

    ``reduce_fn(df, bucket)`` defaults to plain dedup; pagerank passes
    a variant that also attaches exact out-degrees (exact because all
    rows of a src co-locate). ``id_tables`` supplies a prebuilt
    (ids, id_store, rev_store) covering (at least) the pairs'
    endpoints — the kg_* wrappers share one via _kg_id_tables."""
    pairs = pairs.materialize()

    if id_tables is not None:
        ids, id_store, rev_store = id_tables
    else:
        def endpoints(b: pa.Table) -> pa.Table:
            vals = pd.unique(
                np.concatenate(
                    [
                        b[src].to_numpy(zero_copy_only=False),
                        b[dst].to_numpy(zero_copy_only=False),
                    ]
                )
            )
            return pa.table({"node": pa.array(vals, pa.string())})

        nodes = bucketed_apply(
            pairs.map_batches(endpoints, batch_format="pyarrow"),
            ["node"],
            _dedup,
            num_buckets,
        )
        ids = assign_order_ids(nodes).materialize()
        id_store = build_bucket_store(ids, ["node"], num_buckets)
        rev_store = build_bucket_store(
            ids.map_batches(_tag_by_nid(num_buckets), batch_format="pandas"),
            None,
            num_buckets,
        )
    if reduce_fn is None:
        reduce_fn = lambda df, _k: df.drop_duplicates()  # noqa: E731
    enc = pairs.map_batches(
        _EncodeAdj(id_store, num_buckets, src=src, dst=dst, extra=extra),
        batch_format="pandas",
        batch_size=None,
    )
    adj = prebucketed_apply(enc, reduce_fn, keep_bucket=True).materialize()
    return ids, id_store, rev_store, adj


# ---------------------------------------------------------------------------
# PageRank
# ---------------------------------------------------------------------------


def kg_pagerank(
    sf_dir: str,
    iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
) -> ray.data.Dataset:
    """Fixed-point PageRank over the final KG edge table (see
    :func:`pagerank_over`). Reads the once-per-corpus cached distinct
    edge parquet (ensure_kg_edges) — pred collapse to pairs still
    happens inside pagerank_over."""
    from codetoneo4j_ray.pipelines.kg_queries import ensure_kg_edges

    nb = target_blocks()
    edges = ray.data.read_parquet(
        ensure_kg_edges(sf_dir), columns=["subj", "obj"],
        override_num_blocks=nb,
    )
    return pagerank_over(edges, iters=iters, scale=scale, num_buckets=nb,
                         id_tables=_kg_id_tables(sf_dir, nb))


class _PageRankStep:
    """The fused per-iteration map: for each rank row (node, r) in
    bucket k, join the pinned int-encoded edge pieces of bucket k
    (same hash, so edges with src=node live exactly there) and emit
    per-dst partial contribution sums ('c' rows, map-side combined)
    PLUS the node presence rows ('n', so dangling targets survive the
    next reduce). One map + one rank-sized exchange per iteration;
    plain task fn + process-level bucket cache, so Ray's reused worker
    processes keep the fetched edge buckets warm across all iterations
    and the whole power iteration runs as a single lazy chain with no
    per-step driver sync."""

    def __init__(self, store, num_buckets: int):
        self._store = store
        self._k = num_buckets

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):  # schemaless empty blocks survive exchanges
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "c": pd.Series([], dtype="int64"),
                    "side": pd.Series([], dtype=object),
                    "__bucket": pd.Series([], dtype="int32"),
                }
            )
        cache = process_cache(self._store)
        outs = [
            pd.DataFrame(
                {
                    "node": batch["node"].astype("int64"),
                    "c": np.int64(0),
                    "side": "n",
                    "__bucket": batch["__bucket"].astype("int32"),
                }
            )
        ]
        for k, grp in batch.groupby("__bucket", sort=False):
            e = cache.bucket_df(int(k))
            if e.empty:
                continue
            m = e.merge(grp[["node", "r"]], left_on="src", right_on="node")
            if m.empty:
                continue
            c = m["r"].astype("int64") // m["d"].astype("int64")
            part = (
                pd.DataFrame({"node": m["dst"], "c": c})
                .groupby("node", as_index=False)["c"]
                .sum()
            )
            part["c"] = part["c"].astype("int64")
            part["side"] = "c"
            part["__bucket"] = _ibucket(part["node"], self._k)
            outs.append(part[["node", "c", "side", "__bucket"]])
        return pd.concat(outs, ignore_index=True)


def pagerank_over(
    edges: ray.data.Dataset,
    iters: int = PAGERANK_ITERS,
    scale: int = PAGERANK_SCALE,
    num_buckets: int | None = None,
    id_tables: tuple | None = None,
) -> ray.data.Dataset:
    """Fixed-point PageRank (damping 0.85, ``iters`` synchronous steps)
    over distinct (subj, obj) pairs of an edge dataset.

    Update rule, all-BIGINT:  r'(v) = 15*scale//100
    + 85 * sum_{u->v}( r(u) // outdeg(u) ) // 100.

    Output: (node, rank_fp) for every node appearing in any edge,
    sorted by node. Node keys are first densely int64-encoded
    (_encode_pairs), so the one edge exchange, the pinned adjacency,
    and every per-iteration shuffle carry 8-byte keys; per iteration
    only rank rows and combined partials move (one exchange), and the
    whole ``iters``-step loop is a single lazy map→reduce chain
    executed in one streaming run — no per-step materialization or
    driver sync. The ranks are pure arithmetic over the graph
    structure, so the encoding cannot change any output value."""

    if num_buckets is None:
        # buckets double as reduce parallelism AND per-iteration sort
        # fan-in; scale them with the cluster instead of a fixed 64
        num_buckets = target_blocks()

    def to_pairs(b: pa.Table) -> pa.Table:
        df = b.to_pandas()[["subj", "obj"]].drop_duplicates()
        return pa.Table.from_pandas(
            df.rename(columns={"subj": "src", "obj": "dst"}),
            preserve_index=False,
        )

    def dedup_deg(df: pd.DataFrame, _k: int) -> pd.DataFrame:
        df = df.drop_duplicates().copy()
        df["d"] = df.groupby("src")["src"].transform("size").astype("int64")
        return df[["src", "dst", "d"]]

    ids, _id_store, rev_store, edges_deg = _encode_pairs(
        edges.map_batches(to_pairs, batch_format="pyarrow"),
        num_buckets,
        reduce_fn=dedup_deg,
        id_tables=id_tables,
    )
    # up-front overflow validation: contribution sums are bounded by
    # the total mass n*scale (see _MAX_SAFE_SUM note) — checking here
    # also covers the map-side partial sums, and cannot be fooled by
    # silent int64 wraparound the way a post-hoc max() check could.
    n_nodes = ids.count()
    if n_nodes * scale > _MAX_SAFE_SUM:
        raise OverflowError(
            "pagerank fixed-point mass num_nodes*scale exceeds int64/85; "
            "lower scale"
        )
    store = build_bucket_store(edges_deg, None, num_buckets)

    base = 15 * scale // 100

    def init_rank(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["nid"].astype("int64"),
                "r": np.int64(scale),
                "__bucket": _ibucket(df["nid"], num_buckets),
            }
        )

    ranks = ids.map_batches(init_rank, batch_format="pandas")

    def apply_rank(df: pd.DataFrame, _k: int) -> pd.DataFrame:
        c = df.loc[df["side"] == "c", ["node", "c"]]
        s = c.groupby("node", as_index=False).agg(s=("c", "sum"))
        n = df.loc[df["side"] == "n", ["node"]]
        m = n.merge(s, on="node", how="left")
        m["s"] = m["s"].fillna(0).astype("int64")
        m["r"] = base + 85 * m["s"] // 100
        return m[["node", "r"]]

    for i in range(iters):
        stepped = ranks.map_batches(
            _PageRankStep(store, num_buckets), batch_format="pandas"
        )
        ranks = prebucketed_apply(stepped, apply_rank, keep_bucket=True)
        if (i + 1) % _CHAIN_CHECKPOINT == 0 and i + 1 < iters:
            # bound lazy-plan growth (see components_over)
            ranks = ranks.materialize()

    class _DecodeRank(_LookupJoin):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype=object),
                        "rank_fp": pd.Series([], dtype="int64"),
                    }
                )
            return pd.DataFrame(
                {
                    "node": self._mapping(
                        batch["node"], "nid", "node"
                    ).to_numpy(),
                    "rank_fp": batch["r"].astype("int64").to_numpy(),
                }
            )

    return ranks.map_batches(
        _DecodeRank(rev_store, num_buckets),
        batch_format="pandas",
        batch_size=None,
    ).sort("node")


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
# Connected components (min-label propagation to convergence)
# ---------------------------------------------------------------------------


def kg_components(sf_dir: str, max_iters: int = CC_MAX_ITERS) -> ray.data.Dataset:
    """True connected components (min-label ids) over the final KG
    edge table (see :func:`components_over`), from the once-per-corpus
    cached distinct edge parquet."""
    from codetoneo4j_ray.pipelines.kg_queries import ensure_kg_edges

    nb = target_blocks()
    edges = ray.data.read_parquet(
        ensure_kg_edges(sf_dir), columns=["subj", "obj"],
        override_num_blocks=nb,
    )
    return components_over(edges, max_iters=max_iters, num_buckets=nb,
                           id_tables=_kg_id_tables(sf_dir, nb))


class _MinLabelStep:
    """Fused per-iteration map for frontier (delta) label propagation:
    each label row (node, lbl, chg) in bucket k emits a self row
    carrying its current label, and — ONLY if its label changed last
    step — per-neighbor candidate minima via the pinned
    symmetric-adjacency pieces of bucket k (map-side combined).
    Skipping unchanged nodes is exact for a monotone MIN: an unchanged
    label was already offered to every neighbor in an earlier step and
    minima never regress — so per-level results equal the full
    propagation's, while the candidate volume collapses as waves
    subside. Labels are int64 nids (assign_order_ids), so every
    exchange carries 8-byte values and MIN is numeric, not an object
    comparison over long key strings.

    ``increment`` is added to each neighbor candidate (0 for component
    labels, 1 for BFS depths); ``weight_col`` names a per-edge int64
    column in the pinned adjacency used INSTEAD of the scalar increment
    (weighted shortest distance); rows at or above ``cutoff`` (the
    unreached sentinel, or the distance budget) never emit
    candidates."""

    def __init__(
        self,
        store,
        num_buckets: int,
        increment: int = 0,
        cutoff: int | None = None,
        weight_col: str | None = None,
    ):
        self._store = store
        self._k = num_buckets
        self._inc = increment
        self._cutoff = cutoff
        self._wcol = weight_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):  # schemaless empty blocks survive exchanges
            return pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "cand": pd.Series([], dtype="int64"),
                    "own": pd.Series([], dtype=bool),
                    "__bucket": pd.Series([], dtype="int32"),
                }
            )
        cache = process_cache(self._store)
        outs = [
            pd.DataFrame(
                {
                    "node": batch["node"].astype("int64"),
                    "cand": batch["lbl"].astype("int64"),
                    "own": True,
                    "__bucket": batch["__bucket"].astype("int32"),
                }
            )
        ]
        frontier = batch[batch["chg"]]
        if self._cutoff is not None:
            frontier = frontier[frontier["lbl"] < self._cutoff]
        for k, grp in frontier.groupby("__bucket", sort=False):
            adj = cache.bucket_df(int(k))
            if adj.empty:
                continue
            m = adj.merge(grp[["node", "lbl"]], left_on="src", right_on="node")
            if m.empty:
                continue
            step = m[self._wcol] if self._wcol else self._inc
            part = (
                pd.DataFrame({"node": m["dst"], "cand": m["lbl"] + step})
                .groupby("node", as_index=False)["cand"]
                .min()
            )
            part["own"] = False
            part["__bucket"] = _ibucket(part["node"], self._k)
            outs.append(part[["node", "cand", "own", "__bucket"]])
        return pd.concat(outs, ignore_index=True)


def _min_reduce(df: pd.DataFrame, _k: int) -> pd.DataFrame:
    new = df.groupby("node", as_index=False)["cand"].min()
    old = df.loc[df["own"], ["node", "cand"]].rename(columns={"cand": "old"})
    out = new.merge(old.drop_duplicates("node"), on="node", how="left")
    # a node absent from 'own' rows can't occur (self rows cover
    # every node), but guard the comparison anyway
    out["old"] = out["old"].fillna(out["cand"]).astype("int64")
    out["chg"] = out["cand"] < out["old"]
    out["lbl"] = out["cand"].astype("int64")
    return out[["node", "lbl", "chg"]]


def _none_changed(labels: ray.data.Dataset) -> bool:
    """True when no label changed in the LAST propagation round. The
    frontier discipline means every earlier change has already been
    offered to all neighbors, so an empty final frontier is exactly
    the global fixpoint — all further rounds are the identity."""
    import pandas as _pd

    tot = labels.map_batches(
        lambda df: _pd.DataFrame({"n": [int(df["chg"].sum())]}),
        batch_format="pandas",
    ).sum("n")
    return not tot


def _pointer_jump(labels: ray.data.Dataset, num_buckets: int) -> ray.data.Dataset:
    """One round of label shortcutting: lbl(v) ← min(lbl(v),
    lbl(lbl(v))). Sound for min-label propagation — labels are node
    ids, lbl(u) ≤ u always, and lbl(lbl(v)) names a node in v's own
    component — so the jump is monotone decreasing toward the same
    fixpoint, and interleaving it with propagation turns path-shaped
    convergence from O(diameter) rounds into O(log n). Nodes the jump
    lowers are marked changed so they re-offer next step.

    One node-sized exchange: every label row emits a provider row
    (key=node, already in its own bucket) plus a seeker row routed to
    bucket-of-lbl; the reduce maps each seeker through its bucket's
    provider dict and retags the output by bucket-of-node. The output
    feeds _MinLabelStep directly (the step groups by __bucket itself),
    so no second exchange is needed."""

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # schemaless empty blocks survive exchanges
            return pd.DataFrame(
                {
                    "key": pd.Series([], dtype="int64"),
                    "node": pd.Series([], dtype="int64"),
                    "val": pd.Series([], dtype="int64"),
                    "chg": pd.Series([], dtype=bool),
                    "seek": pd.Series([], dtype=bool),
                    "__bucket": pd.Series([], dtype="int32"),
                }
            )
        prov = pd.DataFrame(
            {
                "key": df["node"].astype("int64"),
                "node": np.int64(-1),
                "val": df["lbl"].astype("int64"),
                "chg": False,
                "seek": False,
                "__bucket": df["__bucket"].astype("int32"),
            }
        )
        seek = pd.DataFrame(
            {
                "key": df["lbl"].astype("int64"),
                "node": df["node"].astype("int64"),
                "val": df["lbl"].astype("int64"),
                "chg": df["chg"].astype(bool),
                "seek": True,
            }
        )
        seek["__bucket"] = _ibucket(seek["key"], num_buckets)
        return pd.concat([prov, seek], ignore_index=True)

    def jump_reduce(df: pd.DataFrame, _k: int) -> pd.DataFrame:
        prov = df.loc[~df["seek"]].set_index("key")["val"]
        prov = prov[~prov.index.duplicated()]
        s = df.loc[df["seek"]]
        j = s["key"].map(prov).fillna(s["val"]).astype("int64")
        lowered = j.to_numpy() < s["val"].to_numpy()
        out = pd.DataFrame(
            {
                "node": s["node"].astype("int64").to_numpy(),
                "lbl": np.minimum(j.to_numpy(), s["val"].to_numpy()),
                "chg": s["chg"].to_numpy() | lowered,
            }
        )
        out["__bucket"] = _ibucket(out["node"], num_buckets)
        return out

    return prebucketed_apply(
        labels.map_batches(emit, batch_format="pandas", batch_size=None),
        jump_reduce,
    )


def components_over(
    edges: ray.data.Dataset,
    max_iters: int = CC_MAX_ITERS,
    num_buckets: int | None = None,
    id_tables: tuple | None = None,
) -> ray.data.Dataset:
    """TRUE connected components over the symmetric closure of the
    distinct (subj, obj) pairs: every node starts labeled with its own
    key; synchronous min-label rounds (each taking the MIN over its
    own and all neighbors' labels) run UNTIL THE FRONTIER EMPTIES,
    with a pointer-jump (label ← label-of-label) at every checkpoint
    so path-shaped components converge in O(log n) rounds rather than
    O(diameter). At the fixpoint every node's label is exactly its
    component's minimum key — this is the real CC semantics, and the
    oracle (components_oracle_sql) is an until-fixpoint recursive
    reachability query, not an unrolled approximation.

    ``max_iters`` is a pure runaway guard: if the frontier is still
    non-empty after that many propagation rounds the op RAISES rather
    than returning partial labels (with jumping, hitting 512 would
    take a graph beyond any physical size).

    Same topology as pagerank_over — node keys map to dense
    ORDER-PRESERVING int64 ids (assign_order_ids, so integer MIN
    agrees with lexicographic MIN), the int-encoded symmetric
    adjacency is exchanged once and pinned as a BucketStore, and each
    round is one fused map + one node-sized exchange of 8-byte labels,
    checkpointed (materialize + convergence test + jump) every
    _CHAIN_CHECKPOINT rounds. Output (node, comp), sorted by node."""
    if max_iters < 1:
        raise ValueError("components_over requires max_iters >= 1")
    if num_buckets is None:
        num_buckets = target_blocks()

    def sym_pairs(b: pa.Table) -> pa.Table:
        df = b.to_pandas()[["subj", "obj"]]
        out = pd.DataFrame(
            {
                "src": np.concatenate([df["subj"].to_numpy(), df["obj"].to_numpy()]),
                "dst": np.concatenate([df["obj"].to_numpy(), df["subj"].to_numpy()]),
            }
        ).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    ids, _id_store, rev_store, adj_enc = _encode_pairs(
        edges.map_batches(sym_pairs, batch_format="pyarrow"), num_buckets,
        id_tables=id_tables,
    )
    adj = build_bucket_store(adj_enc, None, num_buckets)

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "node": df["nid"].astype("int64"),
                "lbl": df["nid"].astype("int64"),
                "chg": True,
                "__bucket": _ibucket(df["nid"], num_buckets),
            }
        )

    labels = ids.map_batches(init_labels, batch_format="pandas")

    rounds = 0
    while True:
        for _ in range(_CHAIN_CHECKPOINT):
            stepped = labels.map_batches(
                _MinLabelStep(adj, num_buckets),
                batch_format="pandas",
                batch_size=None,
            )
            labels = prebucketed_apply(stepped, _min_reduce, keep_bucket=True)
            rounds += 1
        labels = labels.materialize()
        if _none_changed(labels):
            LAST_RUN_ROUNDS["components"] = rounds
            break
        if rounds >= max_iters:
            raise RuntimeError(
                f"components_over did not converge within {max_iters} "
                "min-label rounds; raise max_iters"
            )
        labels = _pointer_jump(labels, num_buckets)

    return labels.map_batches(
        _DecodeLabels(rev_store, num_buckets),
        batch_format="pandas",
        batch_size=None,
    ).sort("node")


def components_oracle_sql(edges_cte: str) -> str:
    """TRUE connected components, until fixpoint: recursive
    reachability over the symmetric closure — reach(v) accumulates the
    labels of every node that can reach v, and UNION-dedup on the
    (node, lbl) pair guarantees termination on cycles — then MIN per
    node. Independent of the Ray side's propagation/jumping schedule,
    so it checks the real CC semantics, not an iteration count."""
    return f"""
        WITH RECURSIVE {edges_cte},
        cc_pairs AS (SELECT DISTINCT subj, obj FROM all_edges),
        cc_sym AS (
            SELECT subj AS src, obj AS dst FROM cc_pairs
            UNION SELECT obj, subj FROM cc_pairs
        ),
        cc_nodes AS (SELECT DISTINCT src AS node FROM cc_sym),
        cc_reach(node, lbl) AS (
            SELECT node, node FROM cc_nodes
            UNION
            SELECT e.dst, r.lbl FROM cc_reach r JOIN cc_sym e ON e.src = r.node
        )
        SELECT node, min(lbl) AS comp FROM cc_reach GROUP BY node ORDER BY node
    """


# ---------------------------------------------------------------------------
# Multi-source BFS depth (distance from repo roots)
# ---------------------------------------------------------------------------

BFS_ROOT_PRED = "src__HAS_FILE"  # repo → file edges (see materialize.py preds)
_UNREACHED = 2**62  # depth sentinel; +iters stays far below int64 max


def kg_bfs_depth(sf_dir: str, max_iters: int = BFS_MAX_ITERS) -> ray.data.Dataset:
    """Directed BFS depth from the repo roots (subjects of
    BFS_ROOT_PRED edges) over the final KG edge table (see
    :func:`bfs_depth_over`), from the once-per-corpus cached distinct
    edge parquet."""
    from codetoneo4j_ray.pipelines.kg_queries import ensure_kg_edges

    nb = target_blocks()
    edges = ray.data.read_parquet(
        ensure_kg_edges(sf_dir), columns=["subj", "pred", "obj"],
        override_num_blocks=nb,
    )
    return bfs_depth_over(edges, max_iters=max_iters, num_buckets=nb,
                          id_tables=_kg_id_tables(sf_dir, nb))


def bfs_depth_over(
    edges: ray.data.Dataset,
    roots_pred: str = BFS_ROOT_PRED,
    max_iters: int = BFS_MAX_ITERS,
    num_buckets: int | None = None,
    id_tables: tuple | None = None,
) -> ray.data.Dataset:
    """Multi-source BFS over the DIRECTED distinct (subj, obj) pairs,
    run UNTIL THE WAVE EMPTIES: roots (distinct subjects of
    ``roots_pred`` edges) start at depth 0, everything else at an
    unreached sentinel; each synchronous round takes
    min(depth, min over in-neighbors (their depth + 1)). Output
    (node, depth) for every REACHABLE node — true shortest hop counts,
    sorted by node.

    ``max_iters`` is the convergence-safety bound: BFS needs exactly
    max-finite-depth rounds, so if the wave is still moving after
    ``max_iters`` rounds the op RAISES rather than returning truncated
    depths. The oracle caps its recursive walk at the same bound, so
    whenever the Ray side succeeds the two are exactly equal — raise
    both together for unusually deep graphs.

    Same machinery as components_over (dense int64 ids, pinned
    int-encoded adjacency, frontier steps, one node-sized exchange per
    hop) minus the pointer jump (depths are not node ids, so
    shortcutting does not apply); roots are marked by store lookup,
    never a driver-side collection."""
    if max_iters < 1:
        raise ValueError("bfs_depth_over requires max_iters >= 1")
    if num_buckets is None:
        num_buckets = target_blocks()

    def dir_pairs(b: pa.Table) -> pa.Table:
        df = b.to_pandas()[["subj", "obj"]].drop_duplicates()
        return pa.Table.from_pandas(
            df.rename(columns={"subj": "src", "obj": "dst"}),
            preserve_index=False,
        )

    ids, _id_store, rev_store, adj_enc = _encode_pairs(
        edges.map_batches(dir_pairs, batch_format="pyarrow"), num_buckets,
        id_tables=id_tables,
    )
    adj = build_bucket_store(adj_enc, None, num_buckets)

    def root_rows(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        r = df.loc[df["pred"] == roots_pred, ["subj"]].drop_duplicates()
        return pa.table({"node": pa.array(r["subj"].to_numpy(), pa.string())})

    roots = bucketed_apply(
        edges.map_batches(root_rows, batch_format="pyarrow"),
        ["node"],
        _dedup,
        num_buckets,
        keep_bucket=True,
    )

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["is_root"] = 1
        return df

    roots_store = build_bucket_store(
        roots.map_batches(mark, batch_format="pandas"), None, num_buckets
    )

    class _InitDepth(_LookupJoin):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype="int64"),
                        "lbl": pd.Series([], dtype="int64"),
                        "chg": pd.Series([], dtype=bool),
                        "__bucket": pd.Series([], dtype="int32"),
                    }
                )
            is_root = self._mapping(batch["node"], "node", "is_root").notna()
            return pd.DataFrame(
                {
                    "node": batch["nid"].astype("int64"),
                    "lbl": np.where(is_root, 0, _UNREACHED).astype("int64"),
                    "chg": True,
                    "__bucket": _ibucket(batch["nid"], num_buckets),
                }
            )

    labels = ids.map_batches(
        _InitDepth(roots_store, num_buckets),
        batch_format="pandas",
        batch_size=None,
    )

    rounds = 0
    while True:
        for _ in range(_CHAIN_CHECKPOINT):
            stepped = labels.map_batches(
                _MinLabelStep(adj, num_buckets, increment=1, cutoff=_UNREACHED),
                batch_format="pandas",
                batch_size=None,
            )
            labels = prebucketed_apply(stepped, _min_reduce, keep_bucket=True)
            rounds += 1
        labels = labels.materialize()
        if _none_changed(labels):
            LAST_RUN_ROUNDS["bfs"] = rounds
            break
        if rounds >= max_iters:
            raise RuntimeError(
                f"bfs_depth_over did not converge within {max_iters} "
                "rounds; raise max_iters (and the oracle cap) together"
            )

    class _DecodeDepth(_LookupJoin):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch[batch["lbl"] < _UNREACHED]
            if not len(batch):
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype=object),
                        "depth": pd.Series([], dtype="int64"),
                    }
                )
            return pd.DataFrame(
                {
                    "node": self._mapping(
                        batch["node"], "nid", "node"
                    ).to_numpy(),
                    "depth": batch["lbl"].astype("int64").to_numpy(),
                }
            )

    return labels.map_batches(
        _DecodeDepth(rev_store, num_buckets),
        batch_format="pandas",
        batch_size=None,
    ).sort("node")


def bfs_depth_oracle_sql(
    edges_cte: str,
    roots_pred: str = BFS_ROOT_PRED,
    max_depth: int = BFS_MAX_ITERS,
) -> str:
    """True BFS depths via a recursive walk capped at ``max_depth``
    (the cap guarantees termination on cycles; UNION dedups the
    (node, d) pairs so cycle spinning is bounded by n*max_depth rows).
    min(d) per node is the shortest hop count for every node whose
    true depth is ≤ the cap — and the Ray side RAISES beyond the same
    bound, so whenever it returns at all the two agree exactly."""
    return f"""
        WITH RECURSIVE {edges_cte},
        bfs_adj AS (SELECT DISTINCT subj AS src, obj AS dst FROM all_edges),
        bfs_roots AS (
            SELECT DISTINCT subj AS node FROM all_edges
            WHERE pred = '{roots_pred}'
        ),
        bfs_walk(node, d) AS (
            SELECT node, CAST(0 AS BIGINT) FROM bfs_roots
            UNION
            SELECT e.dst, w.d + 1
            FROM bfs_walk w JOIN bfs_adj e ON e.src = w.node
            WHERE w.d < {max_depth}
        )
        SELECT node, min(d) AS depth FROM bfs_walk
        GROUP BY node ORDER BY node
    """


# ---------------------------------------------------------------------------
# Weighted multi-source shortest distance (cost from repo roots)
# ---------------------------------------------------------------------------

# edge costs: structural containment (repo→file, file→symbol) is cheap,
# semantic hops (INVOKES / DEPENDS_ON / HAS_TAG / HAS_URL / ...) cost
# more — so dist ranks "how far from the project surface a symbol sits
# semantically", not just hop count. Fixed integer weights keep the
# whole op BIGINT-exact for the strict oracle.
_SSSP_CHEAP_PREDS = ("src__HAS_FILE", "src__DECLARES")
_SSSP_CHEAP_W = 1
_SSSP_FAR_W = 3
SSSP_MAX_DIST = 255  # distance budget: output contract AND oracle walk cap
SSSP_MAX_ITERS = 256  # ≥ budget/min-weight rounds always suffice


def kg_sssp(sf_dir: str, max_iters: int = SSSP_MAX_ITERS) -> ray.data.Dataset:
    """Weighted shortest distance from the repo roots over the final KG
    edge table (see :func:`sssp_over`), from the once-per-corpus cached
    distinct edge parquet."""
    from codetoneo4j_ray.pipelines.kg_queries import ensure_kg_edges

    nb = target_blocks()
    edges = ray.data.read_parquet(
        ensure_kg_edges(sf_dir), columns=["subj", "pred", "obj"],
        override_num_blocks=nb,
    )
    return sssp_over(edges, max_iters=max_iters, num_buckets=nb,
                     id_tables=_kg_id_tables(sf_dir, nb))


def sssp_over(
    edges: ray.data.Dataset,
    roots_pred: str = BFS_ROOT_PRED,
    cheap_preds: tuple[str, ...] = _SSSP_CHEAP_PREDS,
    budget: int = SSSP_MAX_DIST,
    max_iters: int = SSSP_MAX_ITERS,
    num_buckets: int | None = None,
    id_tables: tuple | None = None,
) -> ray.data.Dataset:
    """Multi-source WEIGHTED shortest distance (synchronous Bellman-Ford
    relaxation with frontier deltas) over the directed distinct
    (subj, obj, w) edges, where w = _SSSP_CHEAP_W for ``cheap_preds``
    and _SSSP_FAR_W otherwise: roots (subjects of ``roots_pred`` edges)
    start at 0; each round takes min(dist, min over in-edges
    (src dist + w)). Runs until the frontier empties; output
    (node, dist) for every node with dist ≤ ``budget``, sorted by node.

    The budget is the op's contract on BOTH sides: the oracle caps its
    recursive walk at the same total cost (which also bounds its cycle
    expansion), and budget-pruning the Ray frontier is exact because
    every ≤-budget path's prefixes are themselves ≤ budget. Positive
    integer weights bound convergence by budget/min-weight rounds, so
    ``max_iters`` = 256 can only trip on a genuine runaway — and then
    it RAISES rather than returning partial distances. Same pinned
    int64 machinery as components/BFS; the per-edge weight rides the
    pinned adjacency, never an exchange."""
    if max_iters < 1:
        raise ValueError("sssp_over requires max_iters >= 1")
    if num_buckets is None:
        num_buckets = target_blocks()

    cheap = set(cheap_preds)

    def wpairs(b: pa.Table) -> pa.Table:
        df = b.to_pandas()[["subj", "pred", "obj"]]
        w = np.where(
            df["pred"].isin(cheap), _SSSP_CHEAP_W, _SSSP_FAR_W
        ).astype("int64")
        out = pd.DataFrame(
            {"src": df["subj"], "dst": df["obj"], "w": w}
        ).drop_duplicates()
        return pa.Table.from_pandas(out, preserve_index=False)

    ids, _id_store, rev_store, adj_enc = _encode_pairs(
        edges.map_batches(wpairs, batch_format="pyarrow"), num_buckets,
        id_tables=id_tables, extra=("w",),
    )
    adj = build_bucket_store(adj_enc, None, num_buckets)

    def root_rows(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        r = df.loc[df["pred"] == roots_pred, ["subj"]].drop_duplicates()
        return pa.table({"node": pa.array(r["subj"].to_numpy(), pa.string())})

    roots = bucketed_apply(
        edges.map_batches(root_rows, batch_format="pyarrow"),
        ["node"],
        _dedup,
        num_buckets,
        keep_bucket=True,
    )

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["is_root"] = 1
        return df

    roots_store = build_bucket_store(
        roots.map_batches(mark, batch_format="pandas"), None, num_buckets
    )

    class _InitDist(_LookupJoin):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype="int64"),
                        "lbl": pd.Series([], dtype="int64"),
                        "chg": pd.Series([], dtype=bool),
                        "__bucket": pd.Series([], dtype="int32"),
                    }
                )
            is_root = self._mapping(batch["node"], "node", "is_root").notna()
            return pd.DataFrame(
                {
                    "node": batch["nid"].astype("int64"),
                    "lbl": np.where(is_root, 0, _UNREACHED).astype("int64"),
                    "chg": True,
                    "__bucket": _ibucket(batch["nid"], num_buckets),
                }
            )

    labels = ids.map_batches(
        _InitDist(roots_store, num_buckets),
        batch_format="pandas",
        batch_size=None,
    )

    rounds = 0
    while True:
        for _ in range(_CHAIN_CHECKPOINT):
            stepped = labels.map_batches(
                # cutoff = budget: a node at dist ≥ budget cannot relax
                # any neighbor to ≤ budget (weights ≥ 1), and every
                # ≤-budget path's intermediate true distances are below
                # the budget, so pruning loses nothing
                _MinLabelStep(adj, num_buckets, cutoff=budget,
                              weight_col="w"),
                batch_format="pandas",
                batch_size=None,
            )
            labels = prebucketed_apply(stepped, _min_reduce, keep_bucket=True)
            rounds += 1
        labels = labels.materialize()
        if _none_changed(labels):
            LAST_RUN_ROUNDS["sssp"] = rounds
            break
        if rounds >= max_iters:
            raise RuntimeError(
                f"sssp_over did not converge within {max_iters} "
                "relaxation rounds; raise max_iters"
            )

    class _DecodeDist(_LookupJoin):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            batch = batch[batch["lbl"] <= budget]
            if not len(batch):
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype=object),
                        "dist": pd.Series([], dtype="int64"),
                    }
                )
            return pd.DataFrame(
                {
                    "node": self._mapping(
                        batch["node"], "nid", "node"
                    ).to_numpy(),
                    "dist": batch["lbl"].astype("int64").to_numpy(),
                }
            )

    return labels.map_batches(
        _DecodeDist(rev_store, num_buckets),
        batch_format="pandas",
        batch_size=None,
    ).sort("node")


def sssp_oracle_sql(
    edges_cte: str,
    roots_pred: str = BFS_ROOT_PRED,
    budget: int = SSSP_MAX_DIST,
) -> str:
    """True weighted shortest distances via a recursive walk whose
    total cost is capped at ``budget`` (the cap both matches the Ray
    side's output contract and bounds cycle expansion — UNION dedups
    (node, d) pairs, d ≤ budget, so the walk set is finite)."""
    return f"""
        WITH RECURSIVE {edges_cte},
        sssp_adj AS (
            SELECT DISTINCT subj AS src, obj AS dst,
                   CAST(CASE WHEN pred IN ('src__HAS_FILE', 'src__DECLARES')
                        THEN {_SSSP_CHEAP_W} ELSE {_SSSP_FAR_W} END
                        AS BIGINT) AS w
            FROM all_edges
        ),
        sssp_roots AS (
            SELECT DISTINCT subj AS node FROM all_edges
            WHERE pred = '{roots_pred}'
        ),
        sssp_walk(node, d) AS (
            SELECT node, CAST(0 AS BIGINT) FROM sssp_roots
            UNION
            SELECT e.dst, w.d + e.w
            FROM sssp_walk w JOIN sssp_adj e ON e.src = w.node
            WHERE w.d + e.w <= {budget}
        )
        SELECT node, min(d) AS dist FROM sssp_walk
        GROUP BY node ORDER BY node
    """


# ---------------------------------------------------------------------------
# Triangle counting
# ---------------------------------------------------------------------------


def kg_triangles(sf_dir: str, k: int = TRIANGLE_TOPK_K) -> ray.data.Dataset:
    """Triangle participation top-k over the final KG edge table (see
    :func:`triangles_over`). Reads the once-per-corpus cached distinct
    edge parquet (ensure_kg_edges); the canonical-undirected-pair
    collapse still folds preds/directions."""
    from codetoneo4j_ray.pipelines.kg_queries import ensure_kg_edges

    nb = target_blocks()
    edges = ray.data.read_parquet(
        ensure_kg_edges(sf_dir), columns=["subj", "obj"],
        override_num_blocks=nb,
    )
    return triangles_over(edges, k=k, num_buckets=nb,
                          id_tables=_kg_id_tables(sf_dir, nb))


class _DegOrient:
    """Attach (deg_a, deg_b) to undirected int-encoded pairs by
    degree-store lookup and orient each edge from its (degree, nid)-
    smaller endpoint — identical to (degree, key) order because the
    nids are order-preserving."""

    def __init__(self, store, num_buckets: int):
        self._store = store
        self._k = num_buckets

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if not len(batch):
            return pd.DataFrame(
                {
                    "src": pd.Series([], dtype="int64"),
                    "dst": pd.Series([], dtype="int64"),
                    "__bucket": pd.Series([], dtype="int32"),
                }
            )
        cache = process_cache(self._store)
        ka = _ibucket(batch["a"], self._k)
        kb = _ibucket(batch["b"], self._k)
        need = np.unique(np.concatenate([ka, kb]))
        frames = [cache.bucket_df(int(x)) for x in need]
        frames = [f for f in frames if not f.empty]
        dm = pd.concat(frames).set_index("node")["d"]
        a = batch["a"].to_numpy(dtype="int64")
        b = batch["b"].to_numpy(dtype="int64")
        da = batch["a"].map(dm).to_numpy(dtype="int64")
        db = batch["b"].map(dm).to_numpy(dtype="int64")
        a_first = (da < db) | ((da == db) & (a < b))
        out = pd.DataFrame(
            {"src": np.where(a_first, a, b), "dst": np.where(a_first, b, a)}
        )
        out["__bucket"] = _ibucket(out["src"], self._k)
        return out


class _CloseWedges:
    """Close wedges against the pinned undirected-edge store and emit
    per-node triangle-participation partial counts — a pure streaming
    consumer, so the O(m^1.5) wedge rows never enter an exchange."""

    def __init__(self, store, num_buckets: int):
        self._store = store
        self._k = num_buckets

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        cache = process_cache(self._store)
        outs = []
        if len(batch):
            ids = _ibucket2(batch["a"], batch["b"], self._k)
            for kk in np.unique(ids):
                e = cache.bucket_df(int(kk))
                if e.empty:
                    continue
                w = batch[ids == kk]
                m = w.merge(e, on=["a", "b"], how="inner")
                if m.empty:
                    continue
                cnt = pd.concat([m["center"], m["a"], m["b"]]).value_counts()
                outs.append(
                    pd.DataFrame(
                        {
                            "node": cnt.index.to_numpy(dtype="int64"),
                            "n_tri": cnt.to_numpy().astype("int64"),
                        }
                    )
                )
        if outs:
            out = pd.concat(outs, ignore_index=True)
        else:
            out = pd.DataFrame(
                {
                    "node": pd.Series([], dtype="int64"),
                    "n_tri": pd.Series([], dtype="int64"),
                }
            )
        out["__bucket"] = _ibucket(out["node"], self._k)
        return out


def triangles_over(
    edges: ray.data.Dataset,
    k: int = TRIANGLE_TOPK_K,
    num_buckets: int | None = None,
    id_tables: tuple | None = None,
) -> ray.data.Dataset:
    """Top-k nodes by triangle participation over the undirected,
    self-loop-free distinct pair graph of an edge dataset.

    Plan (Cohen's degree-oriented MapReduce scheme), entirely over
    dense int64 node ids: canonical undirected string pairs map-side →
    int encoding (_encode_pairs: the one edge exchange, 16-byte rows)
    → per-node degrees (one node-sized exchange, pinned as a
    BucketStore) → degree attach + orientation by store lookup (no
    exchange) → per-source wedge generation (one exchange of the
    oriented int edges; out-degree ≤ O(sqrt(m)) by the orientation) →
    wedge closing by undirected-store lookup (no exchange — wedges
    stream straight into partial counts) → count merge + local-topk /
    global-merge, tie-broken by nid ≡ key order → decode the ≤k
    winners back to strings. Output (node, n_tri), ordered by node."""

    if num_buckets is None:
        num_buckets = target_blocks()

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

    # a < b on strings ⇒ src < dst on the order-preserving nids, so the
    # canonical orientation survives the encoding unchanged
    _ids, _id_store, rev_store, und = _encode_pairs(
        edges.map_batches(undirected, batch_format="pyarrow"),
        num_buckets,
        src="a",
        dst="b",
        id_tables=id_tables,
    )

    def as_ab(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"src": "a", "dst": "b"})

    und_ab = und.drop_columns(["__bucket"]).map_batches(
        as_ab, batch_format="pandas"
    )

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        cnt = pd.concat([df["a"], df["b"]]).value_counts()
        out = pd.DataFrame(
            {
                "node": cnt.index.to_numpy(dtype="int64"),
                "d": cnt.to_numpy().astype("int64"),
            }
        )
        out["__bucket"] = _ibucket(out["node"], num_buckets)
        return out

    deg = prebucketed_apply(
        und_ab.map_batches(deg_partial, batch_format="pandas"),
        lambda df, _k: df.groupby("node", as_index=False).agg(d=("d", "sum")),
        keep_bucket=True,
    )
    deg_store = build_bucket_store(deg, None, num_buckets)

    def tag_pair(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["__bucket"] = _ibucket2(df["a"], df["b"], num_buckets)
        return df

    und_store = build_bucket_store(
        und_ab.map_batches(tag_pair, batch_format="pandas"), None, num_buckets
    )

    oriented = und_ab.map_batches(
        _DegOrient(deg_store, num_buckets), batch_format="pandas"
    )

    def wedges(df: pd.DataFrame, _k: int) -> pd.DataFrame:
        m = df.merge(df, on="src")
        m = m[m["dst_x"] < m["dst_y"]]
        return pd.DataFrame(
            {"a": m["dst_x"], "b": m["dst_y"], "center": m["src"]}
        )

    tri_partial = prebucketed_apply(oriented, wedges).map_batches(
        _CloseWedges(und_store, num_buckets), batch_format="pandas"
    )

    def topk_i(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["n_tri", "node"], ascending=[False, True], kind="stable"
        ).head(k)
        df["n_tri"] = df["n_tri"].astype("int64")
        return df

    def merge_counts(df: pd.DataFrame, _k: int) -> pd.DataFrame:
        return topk_i(
            df.groupby("node", as_index=False).agg(n_tri=("n_tri", "sum"))
        )

    winners = bucketed_apply(
        prebucketed_apply(tri_partial, merge_counts), [], topk_i
    )

    class _DecodeCount(_LookupJoin):
        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            if not len(batch):
                return pd.DataFrame(
                    {
                        "node": pd.Series([], dtype=object),
                        "n_tri": pd.Series([], dtype="int64"),
                    }
                )
            return pd.DataFrame(
                {
                    "node": self._mapping(
                        batch["node"], "nid", "node"
                    ).to_numpy(),
                    "n_tri": batch["n_tri"].astype("int64").to_numpy(),
                }
            )

    return winners.map_batches(
        _DecodeCount(rev_store, num_buckets),
        batch_format="pandas",
        batch_size=None,
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

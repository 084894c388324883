"""Stage 2 — entity linking.

Two sub-steps, mirroring what the reference gets from the Roslyn
semantic model + Neo4j MERGE semantics:

  A. ``resolve_mentions`` — finalize deferred INVOKES targets by member
     lookup (name + arity) against the repo-wide member index, walking
     the resolved internal base-type chain (Roslyn resolves inherited
     calls to the declaring base type). The member index is built from
     stage-1's internal ``__MEMBER__`` / ``__BASE__`` rows and broadcast
     with ``ray.put`` (scale path: hash-partition both sides on repo —
     the same partitioning key used everywhere else).

  B. ``resolve_edges`` — the endpoint semi-join:
     ``Cypher/MergeRelationships.cypher:2-4`` MATCHes BOTH endpoints as
     existing ``src__Symbol`` nodes, silently dropping dangling refs.
     Small side (distinct symbol keys) is broadcast; a hash-partitioned
     bucket join is provided for when the key set outgrows one node.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from codetoneo4j_ray.extractors.csharp.extractor import BASE_PRED, MEMBER_PRED

_MAX_BASE_DEPTH = 16

_OP_METADATA = {
    "+": "op_Addition", "-": "op_Subtraction", "*": "op_Multiply",
    "/": "op_Division", "%": "op_Modulus", "==": "op_Equality",
    "!=": "op_Inequality",
}

_UNOP_METADATA = {
    "!": "op_LogicalNot", "~": "op_OnesComplement", "-": "op_UnaryNegation",
    "+": "op_UnaryPlus", "++": "op_Increment", "--": "op_Decrement",
}


# ---------------------------------------------------------------------------
# member index
# ---------------------------------------------------------------------------


class MemberIndex:
    """Per-repo: (type display, member name) → [(argc, key)] + base chains."""

    def __init__(self) -> None:
        self.members: dict[tuple[str, str], list[tuple[int, str]]] = defaultdict(list)
        self.bases: dict[str, list[str]] = defaultdict(list)

    def lookup_all(self, type_display: str, name: str) -> list[str]:
        """All candidate member keys of one type (no base walk)."""
        return [k for _a, k in self.members.get((type_display, name), [])]

    def lookup(self, type_display: str, name: str, argc: int,
               skip_self: bool = False) -> str | None:
        """Resolve to a declared member key, walking internal bases."""
        seen: set[str] = set()
        frontier = list(self.bases.get(type_display, [])) if skip_self else [type_display]
        depth = 0
        while frontier and depth < _MAX_BASE_DEPTH:
            nxt: list[str] = []
            for t in frontier:
                if t in seen:
                    continue
                seen.add(t)
                cands = self.members.get((t, name))
                if cands:
                    exact = [k for a, k in cands if a == argc]
                    pool = exact or [k for _a, k in cands]
                    return min(pool)
                nxt.extend(self.bases.get(t, []))
            frontier = nxt
            depth += 1
        return None


def build_member_indices(records: ray.data.Dataset) -> dict[str, MemberIndex]:
    """Collect the internal __MEMBER__/__BASE__ rows (metadata-sized)."""
    df = (
        records.filter(
            expr=f"pred == '{MEMBER_PRED}' or pred == '{BASE_PRED}'"
        )
        .select_columns(["repo", "pred", "subj", "obj", "ctx_name", "ctx_argc"])
        .to_pandas()
    )
    out: dict[str, MemberIndex] = {}
    if len(df) == 0:
        return out
    is_member = (df["pred"] == MEMBER_PRED).to_numpy()
    for repo, pred_m, subj, obj, name, argc in zip(
        df["repo"].to_numpy(), is_member, df["subj"].to_numpy(),
        df["obj"].to_numpy(), df["ctx_name"].to_numpy(),
        df["ctx_argc"].to_numpy(),
    ):
        idx = out.get(repo)
        if idx is None:
            idx = out[repo] = MemberIndex()
        if pred_m:
            idx.members[(subj, name)].append((int(argc), obj))
        else:
            idx.bases[subj].append(obj)
    return out


# ---------------------------------------------------------------------------
# step A: resolve deferred INVOKES
# ---------------------------------------------------------------------------


# Worker-local cache for broadcast objects: map_batches *tasks* reuse the
# already-warm worker pool (no actor spin-up); the first task per worker
# pays one zero-copy local-object-store ray.get, later tasks hit the dict.
# Bounded LRU — long-lived sessions broadcast many refs (one per k-means
# iteration, one per pipeline run); unbounded, every ref stays pinned in
# every worker for the session's lifetime.
_BROADCAST_CACHE_MAX = 8
_BROADCAST_CACHE: dict = {}


def _cached_get(ref):
    obj = _BROADCAST_CACHE.pop(ref, None)
    if obj is None:
        obj = ray.get(ref)
        while len(_BROADCAST_CACHE) >= _BROADCAST_CACHE_MAX:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
    _BROADCAST_CACHE[ref] = obj  # re-insert = move to MRU position
    return obj


def _resolve_batch(batch: pa.Table, index_ref=None) -> pa.Table:
    """Fills ``obj`` for deferred mentions; passes keyed ones through.

    Unresolved call targets keep an approximate ``repo:{recv}.{name}(~n)``
    key — present in raw mentions (like Roslyn's external-method keys),
    never matching a declared symbol, hence dropped by step B, exactly as
    the reference's dangling refs are dropped by MergeRelationships.

    Only the deferred rows (``ctx_kind`` set and not "member") cross into
    Python; the pass-through majority stays in Arrow and the updated
    ``obj`` column is spliced back with ``pc.replace_with_mask``.
    """
    import numpy as np

    kinds_col = batch["ctx_kind"]
    dmask = pc.fill_null(
        pc.and_(
            pc.not_equal(kinds_col, pa.scalar("")),
            pc.not_equal(kinds_col, pa.scalar("member")),
        ),
        False,
    )
    if not pc.any(dmask).as_py():
        return batch
    indices: dict[str, MemberIndex] = _cached_get(index_ref)
    sub = batch.filter(dmask)
    objs = sub["obj"].to_pylist()
    repos = sub["repo"].to_pylist()
    kinds = sub["ctx_kind"].to_pylist()
    names = sub["ctx_name"].to_pylist()
    recvs = sub["ctx_receiver"].to_pylist()
    argcs = sub["ctx_argc"].to_pylist()
    drop_local = np.zeros(len(kinds), dtype=bool)
    for i, kind in enumerate(kinds):
        idx = indices.get(repos[i])
        repo_key = repos[i].lower()
        recv, name, argc = recvs[i], names[i], int(argcs[i])
        key = _lookup_site(idx, kind, recv, name, argc)
        if key is None:
            if kind in ("mgroup", "cast", "conv", "binop", "unop"):
                # no IMethodSymbol resolves here → Roslyn emits nothing
                drop_local[i] = True
                continue
            if kind == "ctor":
                simple = recv.rsplit(".", 1)[-1].split("<", 1)[0]
                key = f"{repo_key}:{recv}.{simple}(~{argc})"
            else:
                key = f"{repo_key}:{recv}.{name}(~{argc})"
        objs[i] = key
    obj_col = batch["obj"]
    if isinstance(obj_col, pa.ChunkedArray):
        obj_col = obj_col.combine_chunks()
    mask_arr = dmask.combine_chunks() if isinstance(dmask, pa.ChunkedArray) else dmask
    new_obj = pc.replace_with_mask(obj_col, mask_arr, pa.array(objs, pa.string()))
    batch = batch.set_column(
        batch.schema.get_field_index("obj"), "obj", new_obj
    )
    if drop_local.any():
        keep = np.ones(len(batch), dtype=bool)
        keep[np.nonzero(mask_arr.to_numpy(zero_copy_only=False))[0][drop_local]] = False
        batch = batch.filter(pa.array(keep))
    return batch


def _lookup_site(idx: "MemberIndex | None", kind: str, recv: str, name: str,
                 argc: int) -> str | None:
    if idx is None:
        return None
    if kind == "ctor":
        return idx.lookup(recv, ".ctor", argc)
    if kind == "call_base":
        return idx.lookup(recv, name, argc, skip_self=True)
    if kind == "cast":
        # conversion ops can live on the target (recv) or source (ctx_name)
        # type; pick by the operator's own signature embedded in the key:
        #   {container}.explicit operator {target}({source})
        cands: list[str] = []
        for t in (recv, name):
            if t:
                cands += idx.lookup_all(t, "op_Explicit")
                cands += idx.lookup_all(t, "op_Implicit")
        if not cands:
            return None
        if recv:
            sig = [k for k in cands if f" operator {recv}(" in k]
            if sig:
                cands = sig
        if name:
            src = [k for k in cands if k.endswith(f"({name})")]
            if src:
                cands = src
        return min(cands)
    if kind == "conv":
        # implicit conversion: ops on target (recv) or source (name) type,
        # implicit only, signature-matched
        cands = idx.lookup_all(recv, "op_Implicit") + idx.lookup_all(name, "op_Implicit")
        if not cands:
            return None
        sig = [k for k in cands if f" operator {recv}(" in k]
        if sig:
            cands = sig
        src = [k for k in cands if k.endswith(f"({name})")]
        if src:
            cands = src
        return min(cands)
    if kind == "binop":
        op, _sep, right = name.partition("\x1f")
        meta = _OP_METADATA.get(op)
        if meta is None:
            return None
        cands = idx.lookup_all(recv, meta) + idx.lookup_all(right, meta)
        if not cands:
            return None
        sig = [k for k in cands if k.endswith(f"({recv}, {right})")]
        if sig:
            cands = sig
        return min(cands)
    if kind == "unop":
        meta = _UNOP_METADATA.get(name)
        if meta is None:
            return None
        cands = [k for k in idx.lookup_all(recv, meta)
                 if k.endswith(f"({recv})")] or idx.lookup_all(recv, meta)
        return min(cands) if cands else None
    # 'call' (argc=-2 ⇒ method group, any overload) and 'mgroup'
    return idx.lookup(recv, name, argc)


def resolve_mentions(
    records: ray.data.Dataset,
    member_indices: dict[str, MemberIndex],
    concurrency=None,
) -> ray.data.Dataset:
    import functools

    index_ref = ray.put(member_indices)
    return records.map_batches(
        functools.partial(_resolve_batch, index_ref=index_ref),
        batch_format="pyarrow",
    )


def resolve_mentions_partitioned(
    raw_mentions: ray.data.Dataset,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Fully distributed step A: no driver-side index, no broadcast.

    Mentions hash-partition by ``repo`` (the pipeline-wide partition
    key); each bucket rebuilds its repos' member indices from the
    co-partitioned ``__MEMBER__``/``__BASE__`` rows and resolves its
    deferred mentions locally. One metadata shuffle, zero serial driver
    work — the multi-node configuration of stage 2 (the broadcast path
    remains the low-latency single-node option). Internal rows are
    consumed here and dropped from the output.
    """
    import pandas as pd

    from codetoneo4j_ray.stages.bucketing import bucketed_apply_tasks

    def resolve_bucket(df: pd.DataFrame) -> pd.DataFrame:
        indices: dict[str, MemberIndex] = {}
        internal = df["pred"].isin((MEMBER_PRED, BASE_PRED)).to_numpy()
        for repo, pred, subj, obj, name, argc in zip(
            df["repo"].to_numpy()[internal],
            df["pred"].to_numpy()[internal],
            df["subj"].to_numpy()[internal],
            df["obj"].to_numpy()[internal],
            df["ctx_name"].to_numpy()[internal],
            df["ctx_argc"].to_numpy()[internal],
        ):
            idx = indices.get(repo)
            if idx is None:
                idx = indices[repo] = MemberIndex()
            if pred == MEMBER_PRED:
                idx.members[(subj, name)].append((int(argc), obj))
            else:
                idx.bases[subj].append(obj)
        out = df.loc[~internal].copy()
        import numpy as np

        deferred = (out["ctx_kind"] != "").to_numpy()
        if deferred.any():
            objs = out["obj"].to_numpy(copy=True)
            drop = np.zeros(len(out), dtype=bool)
            rows = zip(
                np.nonzero(deferred)[0],
                out["repo"].to_numpy()[deferred],
                out["ctx_kind"].to_numpy()[deferred],
                out["ctx_name"].to_numpy()[deferred],
                out["ctx_receiver"].to_numpy()[deferred],
                out["ctx_argc"].to_numpy()[deferred],
            )
            for pos, repo, kind, name, recv, argc in rows:
                argc = int(argc)
                key = _lookup_site(indices.get(repo), kind, recv, name, argc)
                if key is None:
                    if kind in ("mgroup", "cast", "conv", "binop", "unop"):
                        drop[pos] = True
                        continue
                    repo_key = repo.lower()
                    if kind == "ctor":
                        simple = recv.rsplit(".", 1)[-1].split("<", 1)[0]
                        key = f"{repo_key}:{recv}.{simple}(~{argc})"
                    else:
                        key = f"{repo_key}:{recv}.{name}(~{argc})"
                objs[pos] = key
            out["obj"] = objs
            if drop.any():
                out = out.loc[~drop]
        return out[["subj", "pred", "obj", "repo"]]

    cols = ["subj", "pred", "obj", "repo", "ctx_kind", "ctx_name",
            "ctx_receiver", "ctx_argc"]
    return bucketed_apply_tasks(
        raw_mentions.select_columns(cols), ["repo"], resolve_bucket, num_buckets
    )


# ---------------------------------------------------------------------------
# step B: endpoint semi-join (MergeRelationships semantics)
# ---------------------------------------------------------------------------


def _endpoint_filter_batch(batch: pa.Table, keys_ref=None) -> pa.Table:
    # probe against the broadcast frozenset: the hash table is built ONCE
    # (driver-side) and deserialized once per worker via _cached_get —
    # pc.is_in(value_set=...) would rebuild a |keys|-sized hash table on
    # EVERY batch, which measured ~60 ms/call at 240 k keys and dominated
    # the edges pipeline's CPU
    keys: frozenset = _cached_get(keys_ref)
    keep = pa.array(
        [s in keys and o in keys
         for s, o in zip(batch["subj"].to_pylist(), batch["obj"].to_pylist())],
        pa.bool_(),
    )
    return batch.filter(keep)


def resolve_edges_broadcast(
    mentions: ray.data.Dataset,
    symbol_keys: set[str],
    concurrency=None,
) -> ray.data.Dataset:
    """Inner-join both endpoints against the declared-symbol key set,
    broadcast once via ``ray.put`` and probed per batch (no shuffle)."""
    import functools

    keys_ref = ray.put(frozenset(symbol_keys))
    return mentions.map_batches(
        functools.partial(_endpoint_filter_batch, keys_ref=keys_ref),
        batch_format="pyarrow",
    )


def resolve_edges_partitioned(
    mentions: ray.data.Dataset,
    symbols: ray.data.Dataset,
    num_buckets: int = 64,
    extra_edges: ray.data.Dataset | None = None,
    distinct: bool = False,
) -> ray.data.Dataset:
    """Scale path: explicit hash-partitioned semi-join for when the
    declared-key set no longer fits a broadcast.

    Two row-preserving filter-joins: mentions hash-bucket on ``subj``
    with the declared keys and each bucket keeps rows whose subj exists;
    the survivors repeat on ``obj``. All-to-all traffic is keys + mention
    rows — never file content.

    With ``distinct=True`` the obj pass also deduplicates triples —
    globally exact, since equal triples share their obj bucket — and
    ``extra_edges`` (structural edges that skip endpoint filtering) can
    ride the same exchange, saving a separate distinct shuffle.
    """
    from codetoneo4j_ray.stages.bucketing import bucketed_apply_tasks

    keys = symbols.select_columns(["key"])

    def tagged(ds: ray.data.Dataset, tag: str) -> ray.data.Dataset:
        def fn(batch: pa.Table) -> pa.Table:
            batch = batch.select(["subj", "pred", "obj"])
            return batch.append_column(
                "__side", pa.array([tag] * batch.num_rows, pa.string())
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    def keys_side(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            vals = batch["key"]
            n = batch.num_rows
            cols = {
                col: vals,
                "subj" if col != "subj" else "obj": pa.nulls(n, pa.string()),
                "pred": pa.nulls(n, pa.string()),
                "__side": pa.array(["k"] * n, pa.string()),
            }
            return pa.table(
                {name: cols[name] for name in ("subj", "pred", "obj", "__side")}
            )

        return fn

    def semi(ds: ray.data.Dataset, col: str, last: bool) -> ray.data.Dataset:
        both = ds.union(keys.map_batches(keys_side(col), batch_format="pyarrow"))

        def join_bucket(df):
            have = set(df.loc[df["__side"] == "k", col].drop_duplicates())
            m = df[df["__side"] == "m"]
            out = m[m[col].isin(have)]
            passthrough = df[df["__side"] == "s"]
            if len(passthrough):
                import pandas as pd

                out = pd.concat([out, passthrough], ignore_index=True)
            if last:
                if distinct:
                    out = out.drop_duplicates(subset=["subj", "pred", "obj"])
                return out[["subj", "pred", "obj"]]
            return out[["subj", "pred", "obj", "__side"]]

        return bucketed_apply_tasks(both, [col], join_bucket, num_buckets)

    first = semi(tagged(mentions, "m"), "subj", last=False)
    if extra_edges is not None:
        first = first.union(tagged(extra_edges, "s"))
    return semi(first, "obj", last=True)


def strip_internal(records: ray.data.Dataset) -> ray.data.Dataset:
    """Drop the __MEMBER__/__BASE__ helper rows before materialize."""
    return records.filter(
        expr=f"pred != '{MEMBER_PRED}' and pred != '{BASE_PRED}'"
    )


# ---------------------------------------------------------------------------
# fused partitioned linking: one big exchange + small global leftovers
# ---------------------------------------------------------------------------

_KEY_PRED = "__KEYROW__"


def _bucket_resolve_and_filter(df):
    """Per-repo-bucket: build member indices, resolve deferred mentions,
    and endpoint-check BOTH endpoints against the repo-local key set.

    Exactness argument — why repo-local equals the global semi-join:
    a run of the reference indexes ONE solution; every symbol
    cross-reference it emits is intra-solution, and in the corpus model
    a repo IS a solution. Concretely every mention endpoint is either
    (a) a repo-prefixed key (``{repo.lower()}:...``, SymbolMapper.cs:43-47),
    declarable only by this repo, or (b) a file-key-anchored / ``pkg:`` /
    ``url:`` key emitted by a handler that declares the matching symbol
    in the same file (TextSymbolMapper keys, PackageDependencyHandlerBase
    .cs:28-45). Either way the declaring candidates live in this repo, so
    membership in the repo-local key set decides exactly what the global
    set would. (Pathological cross-repo key collisions — same relative
    path, different content, one side's symbol accessibility-filtered —
    could in principle diverge; the mode-equivalence test and the strict
    kg_edges oracle check this continuously.)
    """
    import numpy as np
    import pandas as pd

    is_key = (df["pred"] == _KEY_PRED).to_numpy()
    internal = df["pred"].isin((MEMBER_PRED, BASE_PRED)).to_numpy()

    keys_by_repo: dict[str, set] = {}
    for repo, key in zip(df["repo"].to_numpy()[is_key],
                         df["subj"].to_numpy()[is_key]):
        keys_by_repo.setdefault(repo, set()).add(key)

    indices: dict[str, MemberIndex] = {}
    for repo, pred, subj, obj, name, argc in zip(
        df["repo"].to_numpy()[internal], df["pred"].to_numpy()[internal],
        df["subj"].to_numpy()[internal], df["obj"].to_numpy()[internal],
        df["ctx_name"].to_numpy()[internal], df["ctx_argc"].to_numpy()[internal],
    ):
        idx = indices.get(repo)
        if idx is None:
            idx = indices[repo] = MemberIndex()
        if pred == MEMBER_PRED:
            idx.members[(subj, name)].append((int(argc), obj))
        else:
            idx.bases[subj].append(obj)

    out = df.loc[~(is_key | internal)].copy()
    if not len(out):
        return pd.DataFrame(
            {"subj": pd.Series([], dtype=str), "pred": pd.Series([], dtype=str),
             "obj": pd.Series([], dtype=str)}
        )

    # resolve deferred INVOKES (same logic as resolve_mentions_partitioned)
    deferred = (out["ctx_kind"] != "").to_numpy()
    if deferred.any():
        objs = out["obj"].to_numpy(copy=True)
        drop = np.zeros(len(out), dtype=bool)
        rows = zip(
            np.nonzero(deferred)[0],
            out["repo"].to_numpy()[deferred],
            out["ctx_kind"].to_numpy()[deferred],
            out["ctx_name"].to_numpy()[deferred],
            out["ctx_receiver"].to_numpy()[deferred],
            out["ctx_argc"].to_numpy()[deferred],
        )
        for pos, repo, kind, name, recv, argc in rows:
            argc = int(argc)
            key = _lookup_site(indices.get(repo), kind, recv, name, argc)
            if key is None:
                if kind in ("mgroup", "cast", "conv", "binop", "unop"):
                    drop[pos] = True
                    continue
                repo_key = repo.lower()
                if kind == "ctor":
                    simple = recv.rsplit(".", 1)[-1].split("<", 1)[0]
                    key = f"{repo_key}:{recv}.{simple}(~{argc})"
                else:
                    key = f"{repo_key}:{recv}.{name}(~{argc})"
            objs[pos] = key
        out["obj"] = objs
        if drop.any():
            out = out.loc[~drop]

    # vectorized per-repo membership check on both endpoints
    keep = np.ones(len(out), dtype=bool)
    for repo, grp in out.groupby("repo", sort=False):
        kset = keys_by_repo.get(repo, set())
        loc = out.index.get_indexer(grp.index)
        keep[loc] = (
            grp["subj"].isin(kset).to_numpy()
            & grp["obj"].isin(kset).to_numpy()
        )
    out = out.loc[keep]
    # local distinct: all of a repo's mentions share this bucket, so this
    # is a combine; the global distinct fuses into the final sort
    return out[["subj", "pred", "obj"]].drop_duplicates()


def resolve_link_fused(
    raw_mentions: ray.data.Dataset,
    symbols: ray.data.Dataset,
    num_buckets: int = 64,
    salt: int = 4,
) -> ray.data.Dataset:
    """Fully-partitioned stage 2 for edges in ONE exchange.

    Mentions, the internal __MEMBER__/__BASE__ rows AND the declared-key
    rows all hash-partition by ``repo`` — the pipeline-wide key — so each
    bucket resolves deferred INVOKES and endpoint-checks both ends
    against its repos' key sets with zero driver state and zero further
    exchanges (see _bucket_resolve_and_filter for why repo-local checks
    are exact). Output is (subj, pred, obj) with per-bucket distinct
    applied; callers fuse the global distinct + sort into one exchange
    via canonicalize.distinct_sorted.

    ``salt`` sub-partitions each repo's mention rows into ``salt``
    buckets by subj hash, REPLICATING the (index-sized) key/member/base
    side rows into every salted bucket of their repo — a corpus of few
    large repos would otherwise cap reduce parallelism at the repo
    count while each bucket runs the Python resolution loop serially.
    Exact by construction: every salted bucket sees its repo's full
    index + key set, resolution is per-row, and duplicate triples share
    a subj (same salt) so the local distinct still combines them."""
    from codetoneo4j_ray.stages.bucketing import bucketed_apply_tasks

    cols = ["subj", "pred", "obj", "repo", "ctx_kind", "ctx_name",
            "ctx_receiver", "ctx_argc"]

    def keys_as_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "subj": batch["key"],
                "pred": pa.array([_KEY_PRED] * n, pa.string()),
                "obj": pa.nulls(n, pa.string()),
                "repo": batch["repo"],
                "ctx_kind": pa.array([""] * n, pa.string()),
                "ctx_name": pa.nulls(n, pa.string()),
                "ctx_receiver": pa.nulls(n, pa.string()),
                "ctx_argc": pa.nulls(n, pa.int32()),
            }
        )

    e1_in = raw_mentions.select_columns(cols).union(
        symbols.select_columns(["key", "repo"]).map_batches(
            keys_as_rows, batch_format="pyarrow"
        )
    )
    if salt <= 1:
        return bucketed_apply_tasks(e1_in, ["repo"], _bucket_resolve_and_filter,
                              num_buckets)

    def add_salt(batch: pa.Table) -> pa.Table:
        import numpy as np
        import pandas as pd

        # keep the Arrow schema explicit: a pandas round-trip re-infers
        # all-null columns as null-type and int32 NaNs as double, which
        # breaks the per-bucket concat
        schema = batch.schema.append(pa.field("__salt", pa.int32()))
        df = batch.to_pandas()
        if not len(df):
            df["__salt"] = pd.Series([], dtype="int32")
            return pa.Table.from_pandas(df, schema=schema,
                                        preserve_index=False)
        side = df["pred"].isin((_KEY_PRED, MEMBER_PRED, BASE_PRED)).to_numpy()
        m = df.loc[~side].copy()
        h = pd.util.hash_array(
            m["subj"].to_numpy(dtype=object), categorize=False
        )
        m["__salt"] = (h % salt).astype("int32")
        parts = [m]
        sd = df.loc[side]
        for k in range(salt):
            r = sd.copy()
            r["__salt"] = np.int32(k)
            parts.append(r)
        return pa.Table.from_pandas(
            pd.concat(parts, ignore_index=True), schema=schema,
            preserve_index=False,
        )

    salted = e1_in.map_batches(add_salt, batch_format="pyarrow")
    # raw split-tasks + one resolve task per bucket: the one-shot
    # linking exchange skips the groupby's sort/sample machinery
    return bucketed_apply_tasks(salted, ["repo", "__salt"],
                                _bucket_resolve_and_filter, num_buckets)

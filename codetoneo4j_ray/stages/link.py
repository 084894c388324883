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


# ---------------------------------------------------------------------------
# member index
# ---------------------------------------------------------------------------


class MemberIndex:
    """Per-repo: (type display, member name) → [(argc, key)] + base chains."""

    def __init__(self) -> None:
        self.members: dict[tuple[str, str], list[tuple[int, str]]] = defaultdict(list)
        self.bases: dict[str, list[str]] = defaultdict(list)

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
    rows = (
        records.filter(
            expr=f"pred == '{MEMBER_PRED}' or pred == '{BASE_PRED}'"
        )
        .select_columns(["repo", "pred", "subj", "obj", "ctx_name", "ctx_argc"])
        .take_all()
    )
    out: dict[str, MemberIndex] = {}
    for r in rows:
        idx = out.setdefault(r["repo"], MemberIndex())
        if r["pred"] == MEMBER_PRED:
            idx.members[(r["subj"], r["ctx_name"])].append(
                (int(r["ctx_argc"]), r["obj"])
            )
        else:
            idx.bases[r["subj"]].append(r["obj"])
    return out


# ---------------------------------------------------------------------------
# step A: resolve deferred INVOKES
# ---------------------------------------------------------------------------


class ResolveMentions:
    """Actor: fills ``obj`` for deferred mentions; passes keyed ones through.

    Unresolved call targets keep an approximate ``repo:{recv}.{name}(~n)``
    key — present in raw mentions (like Roslyn's external-method keys),
    never matching a declared symbol, hence dropped by step B, exactly as
    the reference's dangling refs are dropped by MergeRelationships.
    """

    def __init__(self, index_ref):
        self.indices: dict[str, MemberIndex] = ray.get(index_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        mask = pc.not_equal(batch["ctx_kind"], pa.scalar(""))
        if not pc.any(mask).as_py():
            return batch
        objs = batch["obj"].to_pylist()
        repos = batch["repo"].to_pylist()
        kinds = batch["ctx_kind"].to_pylist()
        names = batch["ctx_name"].to_pylist()
        recvs = batch["ctx_receiver"].to_pylist()
        argcs = batch["ctx_argc"].to_pylist()
        for i, kind in enumerate(kinds):
            if not kind or kind == "member":
                continue
            idx = self.indices.get(repos[i])
            repo_key = repos[i].lower()
            recv, name, argc = recvs[i], names[i], int(argcs[i])
            key = None
            if idx is not None:
                if kind == "ctor":
                    key = idx.lookup(recv, ".ctor", argc)
                elif kind == "call_base":
                    key = idx.lookup(recv, name, argc, skip_self=True)
                else:
                    key = idx.lookup(recv, name, argc)
            if key is None:
                if kind == "ctor":
                    simple = recv.rsplit(".", 1)[-1].split("<", 1)[0]
                    key = f"{repo_key}:{recv}.{simple}(~{argc})"
                else:
                    key = f"{repo_key}:{recv}.{name}(~{argc})"
            objs[i] = key
        return batch.set_column(
            batch.schema.get_field_index("obj"), "obj", pa.array(objs, pa.string())
        )


def resolve_mentions(
    records: ray.data.Dataset,
    member_indices: dict[str, MemberIndex],
    concurrency=None,
) -> ray.data.Dataset:
    index_ref = ray.put(member_indices)
    kwargs = {"concurrency": concurrency if concurrency is not None else (1, 8)}
    return records.map_batches(
        ResolveMentions,
        fn_constructor_kwargs={"index_ref": index_ref},
        batch_format="pyarrow",
        **kwargs,
    )


# ---------------------------------------------------------------------------
# step B: endpoint semi-join (MergeRelationships semantics)
# ---------------------------------------------------------------------------


class _EndpointFilter:
    def __init__(self, keys_ref):
        self.keys: set[str] = ray.get(keys_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj = batch["subj"].to_pylist()
        obj = batch["obj"].to_pylist()
        keep = [s in self.keys and o in self.keys for s, o in zip(subj, obj)]
        return batch.filter(pa.array(keep, pa.bool_()))


def resolve_edges_broadcast(
    mentions: ray.data.Dataset,
    symbol_keys: set[str],
    concurrency=None,
) -> ray.data.Dataset:
    """Inner-join both endpoints against the declared-symbol key set,
    broadcast once via ``ray.put`` and probed per batch (no shuffle)."""
    keys_ref = ray.put(symbol_keys)
    kwargs = {"concurrency": concurrency if concurrency is not None else (1, 8)}
    return mentions.map_batches(
        _EndpointFilter,
        fn_constructor_kwargs={"keys_ref": keys_ref},
        batch_format="pyarrow",
        **kwargs,
    )


def resolve_edges_partitioned(
    mentions: ray.data.Dataset,
    symbols: ray.data.Dataset,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Scale path: explicit hash-partitioned semi-join.

    Each mention is probed twice (once per endpoint); a mention survives
    only if both probes hit. Implementation: explode mentions into
    (probe_key, side) rows, bucket both streams by hash(probe_key),
    mark hits per bucket with a pandas merge, then regroup by mention id
    requiring 2 hits. All-to-all traffic is keys + row ids, not content.
    """
    import pandas as pd

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        subj = batch["subj"].to_pylist()
        obj = batch["obj"].to_pylist()
        pred = batch["pred"].to_pylist()
        rows = {"probe": [], "mid": [], "subj": [], "pred": [], "obj": []}
        for i in range(n):
            mid = f"{subj[i]}\x00{pred[i]}\x00{obj[i]}"
            for probe in (subj[i], obj[i]):
                rows["probe"].append(probe)
                rows["mid"].append(mid)
                rows["subj"].append(subj[i])
                rows["pred"].append(pred[i])
                rows["obj"].append(obj[i])
        t = pa.table(
            {k: pa.array(v, pa.string()) for k, v in rows.items()}
        )
        bucket = pa.array(
            [_stable_hash(p) % num_buckets for p in rows["probe"]], pa.int32()
        )
        return t.append_column("bucket", bucket)

    def keys_side(batch: pa.Table) -> pa.Table:
        keys = batch["key"].to_pylist()
        t = pa.table({"probe": pa.array(keys, pa.string())})
        bucket = pa.array([_stable_hash(k) % num_buckets for k in keys], pa.int32())
        return t.append_column("bucket", bucket)

    probes = mentions.map_batches(explode, batch_format="pyarrow")
    keyset = symbols.map_batches(keys_side, batch_format="pyarrow")

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        have = set(group.loc[group["side"] == "k", "probe"])
        m = group[group["side"] == "m"]
        hit = m[m["probe"].isin(have)]
        return hit[["mid", "subj", "pred", "obj"]]

    probes = probes.map_batches(
        lambda t: t.append_column("side", pa.array(["m"] * t.num_rows)),
        batch_format="pyarrow",
    )
    keyset = keyset.map_batches(
        lambda t: pa.table(
            {
                "probe": t["probe"],
                "mid": pa.nulls(t.num_rows, pa.string()),
                "subj": pa.nulls(t.num_rows, pa.string()),
                "pred": pa.nulls(t.num_rows, pa.string()),
                "obj": pa.nulls(t.num_rows, pa.string()),
                "bucket": t["bucket"],
                "side": pa.array(["k"] * t.num_rows),
            }
        ),
        batch_format="pyarrow",
    )
    both = probes.union(keyset)
    hits = both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")

    def count_two(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) >= 2:
            return group.iloc[:1][["subj", "pred", "obj"]]
        return group.iloc[0:0][["subj", "pred", "obj"]]

    return hits.groupby("mid").map_groups(count_two, batch_format="pandas")


def _stable_hash(s: str) -> int:
    import zlib

    return zlib.crc32(s.encode("utf-8"))


def strip_internal(records: ray.data.Dataset) -> ray.data.Dataset:
    """Drop the __MEMBER__/__BASE__ helper rows before materialize."""
    return records.filter(
        expr=f"pred != '{MEMBER_PRED}' and pred != '{BASE_PRED}'"
    )

"""Incremental rebuild: only changed files re-extracted; deletions drop."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from codetoneo4j_ray.schema import CORPUS_SCHEMA


def _corpus(rows):
    cols = list(zip(*rows))
    return pa.table(
        {f.name: pa.array(list(cols[i]), pa.string())
         for i, f in enumerate(CORPUS_SCHEMA)},
        schema=CORPUS_SCHEMA,
    )


V1 = [
    ("r1", "src/A.cs", "c" * 40, "csharp",
     "namespace N;\npublic class A { public void M() {} }"),
    ("r1", "src/B.cs", "c" * 40, "csharp",
     "namespace N;\npublic class B { public void Old() {} }"),
    ("r1", "src/Gone.cs", "c" * 40, "csharp",
     "namespace N;\npublic class Gone { }"),
]
V2 = [
    V1[0],  # unchanged
    ("r1", "src/B.cs", "d" * 40, "csharp",
     "namespace N;\npublic class B { public void New() {} }"),  # changed
    # src/Gone.cs deleted
    ("r1", "src/C.cs", "d" * 40, "csharp",
     "namespace N;\npublic class C { }"),  # added
]


@pytest.fixture(scope="module")
def incr(ray_session, tmp_path_factory):
    base = tmp_path_factory.mktemp("incr")
    p1, p2 = str(base / "v1.parquet"), str(base / "v2.parquet")
    pq.write_table(_corpus(V1), p1)
    pq.write_table(_corpus(V2), p2)
    from codetoneo4j_ray.pipelines.build_graph import build_graph
    from codetoneo4j_ray.pipelines.incremental import build_graph_incremental

    out1, out2 = str(base / "out1"), str(base / "out2")
    build_graph(p1, out1)
    metrics = build_graph_incremental(p2, out1, out2)

    # a from-scratch build of v2 must equal the incremental one
    out_full = str(base / "out_full")
    build_graph(p2, out_full)
    import ray.data as rd

    return {
        "metrics": metrics,
        "incr": {n: rd.read_parquet(f"{out2}/{n}").to_pandas()
                 for n in ("nodes", "edges", "files")},
        "full": {n: rd.read_parquet(f"{out_full}/{n}").to_pandas()
                 for n in ("nodes", "edges", "files")},
    }


def test_delta_detection(incr):
    m = incr["metrics"]
    assert m["changed_files"] == 2  # B changed + C added
    assert m["deleted_files"] == 1
    assert m["deleted"] == ["r1:src/Gone.cs"]


def _sorted_rows(df):
    """Row-order-insensitive canonical form: Ray's read_parquet
    concatenates file fragments, so two reads of identically-sorted
    outputs can disagree on block order under load; global output
    ORDER itself is asserted by the strict oracle hash tests."""
    df = df.reset_index(drop=True)
    return df.iloc[
        df.astype(str).apply(lambda r: "\x00".join(r), axis=1).argsort(kind="stable")
    ].reset_index(drop=True)


def test_incremental_equals_full_rebuild(incr):
    for n in ("nodes", "edges", "files"):
        a = incr["incr"][n].reset_index(drop=True)
        b = incr["full"][n].reset_index(drop=True)
        if n == "files":
            # the incremental table additionally carries tombstones
            # (MarkFileAsDeleted analog) — live rows must equal the
            # fresh full rebuild exactly
            a = a[~a["deleted"]].drop(columns=["deleted", "deleted_at"])
            a = a.reset_index(drop=True)
        assert _sorted_rows(a).equals(_sorted_rows(b)), f"{n} differs"


def test_deleted_file_tombstone(incr):
    """Deleted files stay as tombstone rows with their prior properties
    (MarkFileAsDeleted.cypher:1-5: deleted=true, deletedAt set)."""
    files = incr["incr"]["files"]
    tomb = files[files["deleted"]]
    assert list(tomb["path"]) == ["src/Gone.cs"]
    assert tomb["deleted_at"].notna().all()
    assert tomb["sha256"].notna().all()  # prior props carried
    # tombstones and live rows are disjoint key sets
    assert not (set(tomb["key"]) & set(files.loc[~files["deleted"], "key"]))


def test_old_symbols_gone_new_present(incr):
    keys = set(incr["incr"]["nodes"]["key"])
    assert "r1:N.B.New()" in keys
    assert "r1:N.B.Old()" not in keys
    assert "r1:N.Gone" not in keys
    assert "r1:N.C" in keys


def test_incremental_cross_file_reference(ray_session, tmp_path):
    """A changed file calling a method declared in an UNCHANGED file must
    keep its INVOKES edge — the pass-A type index has to cover the full
    corpus, not just the delta (incremental == full contract)."""
    lib = ("namespace Lib;\npublic class Helper {\n"
           "  public void Go() { }\n}")
    v1 = [
        ("r1", "src/A.cs", "c" * 40, "csharp", lib),
        ("r1", "src/B.cs", "c" * 40, "csharp",
         "using Lib;\nnamespace App;\npublic class B {\n"
         "  public void Run() { var h = new Helper(); h.Go(); }\n}"),
    ]
    v2 = [
        v1[0],  # Lib/Helper UNCHANGED
        ("r1", "src/B.cs", "d" * 40, "csharp",
         "using Lib;\nnamespace App;\npublic class B {\n"
         "  public void Run2() { var h = new Helper(); h.Go(); }\n}"),
    ]
    p1, p2 = str(tmp_path / "v1.parquet"), str(tmp_path / "v2.parquet")
    pq.write_table(_corpus(v1), p1)
    pq.write_table(_corpus(v2), p2)
    from codetoneo4j_ray.pipelines.build_graph import build_graph
    from codetoneo4j_ray.pipelines.incremental import build_graph_incremental

    out1, out2, out_full = (str(tmp_path / d) for d in ("o1", "o2", "of"))
    build_graph(p1, out1)
    build_graph_incremental(p2, out1, out2)
    build_graph(p2, out_full)
    import ray.data as rd

    incr_edges = rd.read_parquet(f"{out2}/edges").to_pandas()
    full_edges = rd.read_parquet(f"{out_full}/edges").to_pandas()
    assert incr_edges.reset_index(drop=True).equals(
        full_edges.reset_index(drop=True)
    )
    inv = incr_edges[incr_edges["pred"] == "src__INVOKES"]
    assert ("r1:App.B.Run2()", "r1:Lib.Helper.Go()") in set(
        zip(inv["subj"], inv["obj"])
    )


def test_incremental_no_key_equals_full(ray_session, tmp_path):
    """--no-key must thread into incremental re-extraction: a mixed-key
    graph (prior no-key records + repo-prefixed delta records) would
    stop carried and re-extracted symbols from merging."""
    import ray.data as rd

    from codetoneo4j_ray.pipelines.build_graph import build_graph
    from codetoneo4j_ray.pipelines.incremental import build_graph_incremental

    p1, p2 = str(tmp_path / "v1.parquet"), str(tmp_path / "v2.parquet")
    pq.write_table(_corpus(V1), p1)
    pq.write_table(_corpus(V2), p2)
    out1 = str(tmp_path / "out1")
    out2 = str(tmp_path / "out2")
    out_full = str(tmp_path / "out_full")
    build_graph(p1, out1, no_key=True)
    build_graph_incremental(p2, out1, out2, no_key=True)
    build_graph(p2, out_full, no_key=True)
    for n in ("nodes", "edges", "files"):
        a = rd.read_parquet(f"{out2}/{n}").to_pandas().reset_index(drop=True)
        b = (rd.read_parquet(f"{out_full}/{n}").to_pandas()
             .reset_index(drop=True))
        if n == "files":  # live rows only (tombstones are incremental-only)
            a = (a[~a["deleted"]].drop(columns=["deleted", "deleted_at"])
                 .reset_index(drop=True))
        assert _sorted_rows(a).equals(_sorted_rows(b)), f"{n} differs"
    keys = set(rd.read_parquet(f"{out2}/nodes").to_pandas()["key"])
    assert ":N.B.New()" in keys and "r1:N.B.New()" not in keys


def test_tombstone_chain_and_resurrection(ray_session, tmp_path):
    """Tombstones carry across chained incrementals with their ORIGINAL
    deleted_at; a reappearing file returns to live and re-extracts."""
    from codetoneo4j_ray.pipelines.build_graph import build_graph
    from codetoneo4j_ray.pipelines.incremental import build_graph_incremental
    import ray.data as rd

    a = ("r1", "src/A.cs", "c" * 40, "csharp",
         "namespace N;\npublic class A { }")
    gone = ("r1", "src/Gone.cs", "c" * 40, "csharp",
            "namespace N;\npublic class Gone { }")
    p1, p2, p3 = (str(tmp_path / f"v{i}.parquet") for i in (1, 2, 3))
    pq.write_table(_corpus([a, gone]), p1)
    pq.write_table(_corpus([a]), p2)            # Gone deleted
    pq.write_table(_corpus([a, gone]), p3)      # Gone resurrected

    out1 = str(tmp_path / "o1")
    build_graph(p1, out1)

    out2 = str(tmp_path / "o2")
    m2 = build_graph_incremental(p2, out1, out2, deleted_at_sec=111)
    f2 = rd.read_parquet(f"{out2}/files").to_pandas()
    t2 = f2[f2["deleted"]]
    assert list(t2["path"]) == ["src/Gone.cs"]
    assert list(t2["deleted_at"]) == [111]
    assert m2["tombstones"] == 1

    # chained run, Gone still absent: stamp must NOT refresh
    out3 = str(tmp_path / "o3")
    m3 = build_graph_incremental(p2, out2, out3, deleted_at_sec=222)
    f3 = rd.read_parquet(f"{out3}/files").to_pandas()
    t3 = f3[f3["deleted"]]
    assert list(t3["path"]) == ["src/Gone.cs"]
    assert list(t3["deleted_at"]) == [111]      # original stamp carried
    assert m3["deleted_files"] == 0 and m3["tombstones"] == 1

    # resurrection: Gone reappears → re-extracted, tombstone drops
    out4 = str(tmp_path / "o4")
    m4 = build_graph_incremental(p3, out3, out4, deleted_at_sec=333)
    f4 = rd.read_parquet(f"{out4}/files").to_pandas()
    assert not f4["deleted"].any()
    assert "src/Gone.cs" in set(f4["path"])
    nodes4 = rd.read_parquet(f"{out4}/nodes").to_pandas()
    assert "r1:N.Gone" in set(nodes4["key"])    # symbols re-extracted
    assert m4["changed_files"] == 1 and m4["tombstones"] == 0

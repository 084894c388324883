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


def test_incremental_equals_full_rebuild(incr):
    for n in ("nodes", "edges", "files"):
        a = incr["incr"][n].reset_index(drop=True)
        b = incr["full"][n].reset_index(drop=True)
        assert a.equals(b), f"{n} differs"


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
        assert a.equals(b), f"{n} differs"
    keys = set(rd.read_parquet(f"{out2}/nodes").to_pandas()["key"])
    assert ":N.B.New()" in keys and "r1:N.B.New()" not in keys

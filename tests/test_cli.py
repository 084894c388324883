"""CLI surface (Program.cs analog) + --no-key end-to-end."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from codetoneo4j_ray.schema import CORPUS_SCHEMA

ROWS = [
    ("MyRepo", "src/A.cs", "c" * 40, "csharp",
     "namespace N;\npublic class A { public void M() { } }"),
]


def _corpus(tmp_path):
    cols = list(zip(*ROWS))
    t = pa.table(
        {f.name: pa.array(list(cols[i]), pa.string())
         for i, f in enumerate(CORPUS_SCHEMA)},
        schema=CORPUS_SCHEMA,
    )
    p = str(tmp_path / "corpus.parquet")
    pq.write_table(t, p)
    return p


def test_no_key_drops_repo_prefix_and_project_edges(ray_session, tmp_path):
    """--no-key: repoKey null → keys ':{display}' and no Project edges
    (OptionsBinder.cs:89-99, UpsertFile.cypher OPTIONAL MATCH)."""
    import ray.data as rd

    from codetoneo4j_ray.pipelines.build_graph import build_graph

    p = _corpus(tmp_path)
    out = str(tmp_path / "out")
    build_graph(p, out, no_key=True)
    nodes = rd.read_parquet(f"{out}/nodes").to_pandas()
    assert ":N.A" in set(nodes["key"])           # null repoKey prefix
    edges = rd.read_parquet(f"{out}/edges").to_pandas()
    assert not (edges["pred"] == "src__HAS_FILE").any()
    # DECLARES + linking still work against the ':'-prefixed keys
    assert ((edges["pred"] == "src__DECLARES")
            & (edges["obj"] == ":N.A")).any()


def test_cli_build_and_purge(ray_session, tmp_path, monkeypatch, capsys):
    from codetoneo4j_ray import cli

    p = _corpus(tmp_path)
    out = str(tmp_path / "cli_out")
    # ray already initialised by the fixture — cli must not re-init/shutdown
    monkeypatch.setattr("ray.shutdown", lambda: None)
    rc = cli.main(["build", "--input", p, "--output", out])
    assert rc == 0
    import json
    import os

    metrics = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert metrics["nodes"] >= 2 and os.path.isdir(f"{out}/edges")

    rc = cli.main(["purge", "--output", out, "--yes"])
    assert rc == 0
    assert not os.path.exists(out)


def test_cli_supported_files(capsys):
    from codetoneo4j_ray import cli

    assert cli.main(["--show-supported-files"]) == 0
    out = capsys.readouterr().out
    assert "csharp" in out and "pubspec.yaml" in out


def test_cli_build_with_commits_attaches_file_versions(
    ray_session, tmp_path, monkeypatch, capsys
):
    """--commits rewrites files/ with commits/tags list columns
    (UpsertFile.cypher:12-13 f.commits/f.tags)."""
    import datetime as dt

    import ray.data as rd

    from codetoneo4j_ray import cli
    from codetoneo4j_ray.sources.synth import _COMMITS_SCHEMA

    p = _corpus(tmp_path)
    utc = dt.timezone.utc
    commit_rows = [
        ("MyRepo", "h1", "Ada", "ada@x", dt.datetime(2024, 1, 1, tzinfo=utc),
         "m", ["src/A.cs"], [False], ["v1.0"]),
        ("MyRepo", "h2", "Ada", "ada@x", dt.datetime(2024, 1, 2, tzinfo=utc),
         "m", ["src/A.cs"], [False], []),
    ]
    cols = list(zip(*commit_rows))
    ct = pa.table(
        {f.name: pa.array(list(cols[i]), f.type)
         for i, f in enumerate(_COMMITS_SCHEMA)},
        schema=_COMMITS_SCHEMA,
    )
    cp = str(tmp_path / "commits.parquet")
    pq.write_table(ct, cp)

    out = str(tmp_path / "cli_commits_out")
    monkeypatch.setattr("ray.shutdown", lambda: None)
    rc = cli.main(["build", "--input", p, "--output", out, "--commits", cp])
    assert rc == 0
    capsys.readouterr()
    files = rd.read_parquet(f"{out}/files").to_pandas().set_index("path")
    assert list(files.loc["src/A.cs", "commits"]) == ["h2", "h1"]
    assert list(files.loc["src/A.cs", "tags"]) == ["v1.0"]
    # commit subgraph outputs exist alongside
    import os

    assert os.path.isdir(f"{out}/commit_nodes")


def test_auto_mode_resolution(monkeypatch):
    """'auto' picks partitioned iff >1 alive node: the broadcast-mode
    driver structures must never be the default on a real cluster
    (VERDICT r2 item 7); explicit modes always pass through."""
    from codetoneo4j_ray.pipelines.build_graph import resolve_mode

    one = [{"NodeID": "a", "Alive": True}]
    many = [{"NodeID": "a", "Alive": True}, {"NodeID": "b", "Alive": True}]
    dead_tail = [{"NodeID": "a", "Alive": True}, {"NodeID": "b", "Alive": False}]

    monkeypatch.setattr("ray.nodes", lambda: one)
    assert resolve_mode("auto") == "broadcast"
    monkeypatch.setattr("ray.nodes", lambda: many)
    assert resolve_mode("auto") == "partitioned"
    # a departed node must not flip a single-node cluster to partitioned
    monkeypatch.setattr("ray.nodes", lambda: dead_tail)
    assert resolve_mode("auto") == "broadcast"
    # explicit override wins regardless of topology
    assert resolve_mode("broadcast") == "broadcast"
    assert resolve_mode("partitioned") == "partitioned"


def test_auto_mode_byte_budget(monkeypatch, tmp_path):
    """'auto' flips to partitioned when the corpus-content estimate
    exceeds GRAFT_BROADCAST_BUDGET_BYTES — a single fat node on a huge
    corpus must not assemble a corpus-scale index on the driver
    (VERDICT r4 item 7)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from codetoneo4j_ray.pipelines.build_graph import (
        corpus_content_bytes,
        resolve_mode,
    )

    one = [{"NodeID": "a", "Alive": True}]
    monkeypatch.setattr("ray.nodes", lambda: one)

    p = str(tmp_path / "corpus.parquet")
    pq.write_table(
        pa.table({"repo": ["r"], "path": ["a.cs"], "commit": ["c"],
                  "lang": ["cs"], "content": ["class A {}" * 50]}),
        p,
    )
    est = corpus_content_bytes(p)
    assert est and est > 100  # footer-only estimate sees the content bytes

    # single node + corpus under budget → broadcast
    assert resolve_mode("auto", corpus_bytes=est) == "broadcast"
    # low budget forces the switch on the same single node
    monkeypatch.setenv("GRAFT_BROADCAST_BUDGET_BYTES", "1")
    assert resolve_mode("auto", corpus_bytes=est) == "partitioned"
    # explicit mode still wins over the budget
    assert resolve_mode("broadcast", corpus_bytes=est) == "broadcast"
    # no estimate (non-parquet input) keeps topology-only behavior
    assert corpus_content_bytes(str(tmp_path / "nope.parquet")) is None
    assert resolve_mode("auto", corpus_bytes=None) == "broadcast"


def test_build_graph_honors_byte_budget(monkeypatch, tmp_path):
    """End-to-end: a tiny budget makes build_graph run partitioned on a
    single node (metrics['mode']), and the outputs stay byte-identical
    to a broadcast run of the same corpus."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from codetoneo4j_ray.pipelines.build_graph import build_graph

    p = str(tmp_path / "corpus.parquet")
    pq.write_table(
        pa.table({
            "repo": ["r", "r"],
            "path": ["src/A.cs", "src/B.cs"],
            "commit": ["c1", "c1"],
            "lang": ["cs", "cs"],
            "content": [
                "namespace N { public class A { public void M() { "
                "var b = new B(); b.Go(); } } }",
                "namespace N { public class B { public void Go() {} } }",
            ],
        }),
        p,
    )
    out_b = str(tmp_path / "out_broadcast")
    m_b = build_graph(p, out_b, resume=False, mode="auto")
    assert m_b["mode"] == "broadcast"

    monkeypatch.setenv("GRAFT_BROADCAST_BUDGET_BYTES", "1")
    out_p = str(tmp_path / "out_partitioned")
    m_p = build_graph(p, out_p, resume=False, mode="auto")
    assert m_p["mode"] == "partitioned"

    for table in ("nodes", "edges", "files"):
        a = rd.read_parquet(f"{out_b}/{table}").to_pandas()
        b = rd.read_parquet(f"{out_p}/{table}").to_pandas()
        pd_testing_cols = sorted(a.columns)
        assert a[pd_testing_cols].equals(b[pd_testing_cols])


def test_checkpoint_write_failure_surfaces(ray_session, tmp_path,
                                           monkeypatch):
    """A failure inside the background records-checkpoint thread must
    fail the build (re-raised at the join), not report success over a
    partial, manifest-less checkpoint dir."""
    import pytest

    import codetoneo4j_ray.pipelines.build_graph as bg

    real_write = bg.write_manifest

    def boom(out_dir, stage, fp, meta=None):
        if stage == "records":
            raise OSError("disk full (simulated)")
        return real_write(out_dir, stage, fp, meta)

    monkeypatch.setattr(bg, "write_manifest", boom)
    p = _corpus(tmp_path)
    out = str(tmp_path / "out_ckpt_fail")
    with pytest.raises(RuntimeError, match="checkpoint write failed"):
        bg.build_graph(p, out, no_key=True)


def test_corpus_pin_budget(monkeypatch, tmp_path):
    """read_corpus_pinned materializes a small corpus (plasma-pinned
    MaterializedDataset) but streams when the content estimate exceeds
    GRAFT_CORPUS_PIN_BUDGET_BYTES — the 100 TB shape must never try to
    materialize the input."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from ray.data.dataset import MaterializedDataset

    from codetoneo4j_ray.pipelines.build_graph import read_corpus_pinned

    p = str(tmp_path / "corpus.parquet")
    pq.write_table(
        pa.table({"repo": ["r"], "path": ["a.cs"], "commit": ["c"],
                  "lang": ["cs"], "content": ["class A {}" * 50]}),
        p,
    )
    pinned = read_corpus_pinned(p)
    assert isinstance(pinned, MaterializedDataset)
    assert pinned.count() == 1

    monkeypatch.setenv("GRAFT_CORPUS_PIN_BUDGET_BYTES", "1")
    streamed = read_corpus_pinned(p)
    assert not isinstance(streamed, MaterializedDataset)
    assert streamed.count() == 1

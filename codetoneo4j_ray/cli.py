"""CLI — the reference's Program.cs option surface, Ray-Data-shaped.

The reference's UX is ``codetoneo4j --input <sln> --uri bolt://…``
(``Program.cs:44-175``, ``ProgramOptions/OptionsBinder.cs``). Here the
input is a Parquet corpus and the Neo4j instance is replaced by sorted
triple tables on disk, so connection options map to ``--output``:

    python -m codetoneo4j_ray build  --input corpus.parquet --output out/
    python -m codetoneo4j_ray purge  --output out/
    python -m codetoneo4j_ray incremental --input v2.parquet \
        --prior out_v1/ --output out_v2/

Option parity:
  --input/-s            corpus parquet (InputPathResolver analog)
  --output/-o           output prefix (replaces --uri/--user/--password/
                        --database: a batch run's "database" is a
                        directory of parquet tables)
  --no-key              null repoKey: keys become ":{display}", no
                        Project edges (OptionsBinder.cs:89-99)
  --min-accessibility   accessibility gate (AccessibilityFilter.cs)
  --batch-size          stage-1 extraction batch size (Program.cs:71-73
                        flush batching analog)
  --mode                auto | broadcast | partitioned — auto (default)
                        picks partitioned iff the Ray cluster reports
                        more than one alive node, so the broadcast-mode
                        driver structures are never the multi-node
                        default (override explicitly either way)
  --commits             commits side table → commit subgraph
                        (the --diff-base git-ingestion analog)
  --packages            package-metadata side table (nuspec analog)
  --show-supported-files  handler registry listing
  --purge-data          via the ``purge`` subcommand
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="codetoneo4j_ray")
    sub = p.add_subparsers(dest="command", required=False)

    def common(sp):
        sp.add_argument("--input", "-s", "--sln", dest="input",
                        help="corpus parquet path")
        sp.add_argument("--output", "-o", required=True)
        sp.add_argument("--no-key", action="store_true", dest="no_key")
        sp.add_argument("--min-accessibility", default="Private",
                        choices=["Private", "Protected", "Internal",
                                 "ProtectedOrInternal", "Public"])
        sp.add_argument("--batch-size", type=int, default=64)
        sp.add_argument("--mode", default="auto",
                        choices=["auto", "broadcast", "partitioned"])
        sp.add_argument("--commits", help="commits side-table parquet")
        sp.add_argument("--packages", help="package-metadata parquet")
        sp.add_argument("--no-resume", action="store_true")

    b = sub.add_parser("build", help="full index run (SURVEY §3.1)")
    common(b)
    inc = sub.add_parser("incremental",
                         help="rebuild against a prior run (--diff-base analog)")
    common(inc)
    inc.add_argument("--prior", required=True,
                     help="output dir of the prior run")
    pg = sub.add_parser("purge", help="delete an output prefix (PurgeData analog)")
    pg.add_argument("--output", "-o", required=True)
    pg.add_argument("--yes", action="store_true",
                    help="skip confirmation (PurgeConfirmationHandler)")
    p.add_argument("--show-supported-files", action="store_true")
    p.add_argument("--version", action="store_true")
    return p


def _show_supported_files() -> None:
    from codetoneo4j_ray.config import HANDLERS

    for h in HANDLERS:
        exts = ", ".join(h.extensions)
        print(f"{h.name:14s} {exts:28s} {h.language}/{h.technology}")


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    if args.version:
        print("codetoneo4j_ray 0.2 (round 2)")
        return 0
    if args.show_supported_files:
        _show_supported_files()
        return 0
    if args.command is None:
        _build_parser().print_help()
        return 2

    if args.command == "purge":
        import shutil

        if not args.yes:
            resp = input(f"Delete everything under {args.output}? [y/N] ")
            if resp.strip().lower() != "y":
                print("aborted")
                return 1
        shutil.rmtree(args.output, ignore_errors=True)
        print(f"purged {args.output}")
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    try:
        if args.command == "build":
            from codetoneo4j_ray.pipelines.build_graph import build_graph

            metrics = build_graph(
                args.input, args.output,
                min_accessibility=args.min_accessibility,
                resume=not args.no_resume, mode=args.mode,
                packages_path=args.packages, no_key=args.no_key,
                batch_size=args.batch_size,
            )
            if args.commits:
                _write_commit_graph(args.commits, args.output, metrics)
            print(json.dumps(metrics))
        elif args.command == "incremental":
            from codetoneo4j_ray.pipelines.incremental import (
                build_graph_incremental,
            )

            metrics = build_graph_incremental(
                args.input, args.prior, args.output,
                min_accessibility=args.min_accessibility, mode=args.mode,
                packages_path=args.packages, no_key=args.no_key,
                batch_size=args.batch_size,
            )
            if args.commits:
                _write_commit_graph(args.commits, args.output, metrics)
            print(json.dumps(metrics))
    finally:
        ray.shutdown()
    return 0


def _write_commit_graph(commits_path: str, out_dir: str, metrics: dict) -> None:
    import os
    import shutil

    import ray.data

    from codetoneo4j_ray.pipelines.commits import (
        attach_file_versions,
        authored_stats,
        commit_edges,
        commit_nodes,
        read_commits,
    )

    commits = read_commits(commits_path)
    for name, ds in (
        ("commit_nodes", commit_nodes(commits)),
        ("commit_edges", commit_edges(commits)),
        ("authored", authored_stats(commits)),
    ):
        path = f"{out_dir}/{name}"
        shutil.rmtree(path, ignore_errors=True)
        ds.write_parquet(path)
        # row count from the written footers — a lazy dataset would
        # re-execute its whole lineage on a second consumer
        from codetoneo4j_ray.pipelines.build_graph import _parquet_rows

        metrics[name] = _parquet_rows(path)

    # File nodes carry their commit/tag lists (UpsertFile.cypher:12-13
    # ``f.commits = file.commits, f.tags = file.tags``): rewrite files/
    # with the list columns joined on, atomically via a sibling dir swap
    files_dir = f"{out_dir}/files"
    if os.path.isdir(files_dir):
        tmp = f"{out_dir}/files.withversions"
        shutil.rmtree(tmp, ignore_errors=True)
        attach_file_versions(
            ray.data.read_parquet(files_dir), commits
        ).write_parquet(tmp)
        old = f"{out_dir}/files.old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(files_dir, old)
        os.rename(tmp, files_dir)
        shutil.rmtree(old, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())

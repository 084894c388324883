"""Fidelity indicator on real code, per language.

Runs the full stage-1 + stage-2 pipeline over the reference's own
source trees (C#: src/, TS: tools/ts-analyzer/src, Dart:
tools/dart-analyzer/lib+bin) and reports, for each:

* files / symbols / raw INVOKES mentions extracted;
* resolved-INVOKES %: the fraction of INVOKES candidate mentions that
  survive resolution + the both-endpoint check against repo-declared
  symbols — the rest target framework/SDK members, which the
  reference's MergeRelationships also silently drops (SURVEY §1.5).

The three languages share ONE definition, so the numbers are
comparable: the C# figure contextualizes the Dart/TS heuristic deltas
(capitalized-callee ctor detection, no re-export resolution) the same
way BASELINE.md's C# 41% has since round 2. Usage:

    python tools/fidelity.py            # all three trees, JSON line
"""

from __future__ import annotations

import json
import os
import sys

# manifests ride along: the TS/Dart handlers analyze only inside a
# project root (package.json / pubspec.yaml), matching the reference's
# no-project-root skip behavior — without them extraction is (correctly)
# file-hash-only
TREES = {
    "csharp": ("/root/reference/src", (".cs",)),
    "typescript": ("/root/reference/tools/ts-analyzer",
                   (".ts", "package.json")),
    "dart": ("/root/reference/tools/dart-analyzer",
             (".dart", "pubspec.yaml")),
}


def _corpus_rows(root: str, exts: tuple[str, ...]) -> list[dict]:
    rows = []
    for r, _dirs, files in os.walk(root):
        for f in sorted(files):
            if not f.endswith(exts):
                continue
            p = os.path.join(r, f)
            try:
                with open(p, encoding="utf-8", errors="replace") as fh:
                    content = fh.read()
            except OSError:
                continue
            rows.append(
                {
                    "repo": "ref",
                    "path": os.path.relpath(p, root),
                    "commit": "HEAD",
                    "lang": exts[0].lstrip("."),
                    "content": content,
                }
            )
    return rows


def measure(root: str, exts: tuple[str, ...]) -> dict:
    import pyarrow as pa
    import ray.data

    from codetoneo4j_ray.pipelines.build_graph import (
        _record_parts,
        _symbol_edges,
        extract_to_records,
    )

    rows = _corpus_rows(root, exts)
    corpus = ray.data.from_arrow(
        pa.Table.from_pylist(rows)
    ).repartition(8)
    records = extract_to_records(corpus).materialize()
    symbols, files, raw_mentions, _rec = _record_parts(records, None)
    n_sym = symbols.count()

    def count_invokes(ds) -> int:
        import pandas as pd

        def f(df: pd.DataFrame) -> pd.DataFrame:
            n = int(df["pred"].str.contains("INVOKES").sum()) if len(df) else 0
            return pd.DataFrame({"n": [n]})

        return int(ds.map_batches(f, batch_format="pandas").sum("n") or 0)

    n_raw = count_invokes(raw_mentions)
    sym_edges, _resolved = _symbol_edges(raw_mentions, symbols, "broadcast")
    n_resolved = count_invokes(sym_edges)
    return {
        "files": len(rows),
        "symbols": n_sym,
        "invokes_raw": n_raw,
        "invokes_resolved": n_resolved,
        "resolved_pct": round(100.0 * n_resolved / n_raw, 1) if n_raw else None,
    }


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")

    out = {}
    for lang, (root, exts) in TREES.items():
        if not os.path.isdir(root):
            out[lang] = {"error": f"missing tree {root}"}
            continue
        out[lang] = measure(root, exts)
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

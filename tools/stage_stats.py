"""Print Ray Data per-stage stats for the flagship pipeline.

Usage:  python tools/stage_stats.py [sf_dir]

Runs stage 1 + the nodes/edges outputs over the synthetic corpus and
prints ``ds.stats()`` for each consuming pipeline — wall/cpu/memory per
operator, the feedback loop used while tuning (block coalescing, bucket
counts, narrow projections; see BASELINE.md §2)."""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from codetoneo4j_ray.pipelines.build_graph import (
        extract_to_records,
        graph_from_records,
        read_corpus,
    )
    from codetoneo4j_ray.sources.synth import ensure_corpus

    corpus_path = ensure_corpus(sf_dir)
    out = "/tmp/c2n4j_stats"
    shutil.rmtree(out, ignore_errors=True)

    records = extract_to_records(read_corpus(corpus_path))
    records.write_parquet(f"{out}/records", partition_cols=["rec_type"])
    print("=" * 70)
    print("STAGE 1 (extraction → records checkpoint)")
    print(records.stats())

    outputs = graph_from_records(records_dir=f"{out}/records")
    for name in ("nodes", "edges"):
        outputs[name].write_parquet(f"{out}/{name}")
        print("=" * 70)
        print(f"OUTPUT PIPELINE: {name}")
        print(outputs[name].stats())
    ray.shutdown()


if __name__ == "__main__":
    main()

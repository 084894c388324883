"""Checkpoint manifests for resumable runs."""

from codetoneo4j_ray.state.manifest import (
    corpus_fingerprint,
    read_manifest,
    stage_is_complete,
    write_manifest,
)

__all__ = [
    "corpus_fingerprint",
    "read_manifest",
    "stage_is_complete",
    "write_manifest",
]

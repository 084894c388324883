"""Corpus sources: reader + deterministic synthetic generator."""

from codetoneo4j_ray.sources.synth import (
    corpus_dir_for_sf,
    ensure_corpus,
    generate_corpus,
    sf_from_dir,
)

__all__ = [
    "corpus_dir_for_sf",
    "ensure_corpus",
    "generate_corpus",
    "sf_from_dir",
]

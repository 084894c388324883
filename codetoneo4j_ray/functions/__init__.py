"""Pure scalar / vectorized functions shared by extractors and stages."""

from codetoneo4j_ray.functions.text import (
    dirname,
    get_line_number,
    infer_file_metadata,
    sha256_hex,
    sha256_column,
    truncate_indexed,
)
from codetoneo4j_ray.functions.tags import parse_namespace_tags
from codetoneo4j_ray.functions.urls import normalize_repository_url

__all__ = [
    "dirname",
    "get_line_number",
    "infer_file_metadata",
    "sha256_hex",
    "sha256_column",
    "truncate_indexed",
    "parse_namespace_tags",
    "normalize_repository_url",
]

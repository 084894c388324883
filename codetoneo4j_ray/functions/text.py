"""Scalar text/path functions ported from the reference's semantics.

Citations into /root/reference:
  - truncate to 8000 chars: Extensions/StringExtensions.cs:9-12 (applied at
    Neo4j/Neo4jFlushService.cs:76-77)
  - line number from char offset: Technologies/DocumentHandlerBase.cs:53-54
  - sha256 lowercase hex: FileSystem/FileService.cs:17-22
  - file key + namespace inference: FileSystem/FileService.cs:24-55
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

MAX_INDEXED_STRING_LENGTH = 8000  # Neo4jFlushService.cs:16


def truncate_indexed(s: str | None, max_len: int = MAX_INDEXED_STRING_LENGTH) -> str | None:
    if s is None:
        return None
    return s if len(s) <= max_len else s[:max_len]


def get_line_number(content: str, index: int) -> int:
    """1-based line of a char offset — counts '\\n' before index."""
    return content.count("\n", 0, index) + 1


def sha256_hex(content: str) -> str:
    return hashlib.sha256(content.encode("utf-8")).hexdigest()


def sha256_column(col: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Vectorized-ish sha256 over a string column (hashlib per value; the
    hash itself dominates, so the Python loop is not the bottleneck)."""
    return pa.array(
        [None if v is None else hashlib.sha256(v.encode("utf-8")).hexdigest()
         for v in col.to_pylist()],
        type=pa.string(),
    )


def dirname(path: str) -> str:
    """Directory part with forward slashes ('' for top-level files)."""
    i = path.rfind("/")
    return path[:i] if i > 0 else ""


def infer_file_metadata(relative_path: str) -> tuple[str, str]:
    """(fileKey, namespace) per FileService.InferFileMetadata.

    fileKey is the relative path itself. For Roslyn-family files
    (.cs/.razor/.xaml) the namespace is the directory path dots-joined
    with a case-insensitive ``src.``/``source.`` prefix (or bare
    ``src``/``source``) stripped; otherwise the slash-form directory.
    """
    dot = relative_path.rfind(".")
    ext = relative_path[dot:].lower() if dot >= 0 else ""
    directory = dirname(relative_path)
    if ext in (".cs", ".razor", ".xaml"):
        ns = directory.replace("/", ".")
        low = ns.lower()
        if low.startswith("src."):
            ns = ns[4:]
        elif low == "src":
            ns = ""
        elif low.startswith("source."):
            ns = ns[7:]
        elif low == "source":
            ns = ""
        return relative_path, ns
    return relative_path, directory

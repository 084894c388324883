"""Extractor registry + per-row dispatch (stage-1 inner loop).

Mirrors the reference's handler dispatch
(``Solution/SolutionProcessor.cs:333-379``: exact-basename first, then
extension) and per-file processing
(``SolutionProcessor.ProcessFile:232-299``: relative path → inferred
key/namespace → sha256 → handler → buffers).
"""

from __future__ import annotations

from codetoneo4j_ray.config import HandlerConfig, is_excluded, resolve_handler
from codetoneo4j_ray.extractors.base import FileContext
from codetoneo4j_ray.extractors.csharp.extractor import extract_csharp
from codetoneo4j_ray.extractors.csharp.types import RepoTypeIndex
from codetoneo4j_ray.extractors.textfile import (
    extract_csproj,
    extract_css,
    extract_html,
    extract_json,
    extract_package_json,
    extract_pubspec_yaml,
    extract_razor,
    extract_xaml,
    extract_xml,
)
from codetoneo4j_ray.extractors.dart import extract_dart
from codetoneo4j_ray.extractors.typescript import extract_typescript
from codetoneo4j_ray.functions.text import infer_file_metadata

_EMPTY_INDEX = RepoTypeIndex()


def extract_file(
    repo: str,
    path: str,
    content: str,
    min_accessibility: str,
    repo_index: RepoTypeIndex | None = None,
    pkg_meta: dict | None = None,
    no_key: bool = False,
) -> FileContext | None:
    """Run the matching handler for one corpus row; None when no handler
    or the path is in an excluded directory.

    ``no_key`` reproduces the reference's ``--no-key``: repoKey = null,
    so C#-style symbol keys interpolate to ``:{display}``
    (OptionsBinder.cs:89-99, SymbolMapper.cs:43-47) — for instances
    dedicated to a single repository."""
    if is_excluded(path):
        return None
    handler = resolve_handler(path)
    if handler is None:
        return None
    file_key, namespace = infer_file_metadata(path)
    ctx = FileContext(
        repo=repo,
        repo_key="" if no_key else repo.lower(),
        path=path,
        file_key=file_key,
        namespace=namespace,
        content=content,
        language=handler.language,
        technology=handler.technology,
        pkg_meta=pkg_meta,
    )
    fn = _DISPATCH[handler.name]
    try:
        if handler.name == "csharp":
            fn(ctx, min_accessibility, repo_index or _EMPTY_INDEX)
        elif handler.name in ("razor", "xaml"):
            # the generated-code passes type receivers against the same
            # repo-wide index the C# extractor uses
            fn(ctx, min_accessibility, repo_index or _EMPTY_INDEX)
        elif handler.name in ("typescript", "javascript"):
            # repo_index carries the project-root manifest map; None (the
            # unit-test path) keeps the project≈repo fallback
            fn(ctx, min_accessibility, handler.kind_prefix, repo_index)
        elif handler.name == "dart":
            fn(ctx, min_accessibility, repo_index)
        else:
            fn(ctx, min_accessibility)
    except RecursionError:
        # pathologically nested input (deep XML/JSON trees): keep whatever
        # was emitted before the limit — handlers warn-and-skip, never fail
        # the pipeline (JsonHandler.cs:38-41 / XmlHandler.cs:39-42 spirit)
        pass
    return ctx


_DISPATCH = {
    "csharp": extract_csharp,
    "razor": extract_razor,
    "typescript": extract_typescript,
    "javascript": extract_typescript,
    "css": extract_css,
    "html": extract_html,
    "xaml": extract_xaml,
    "xml": extract_xml,
    "json": extract_json,
    "csproj": extract_csproj,
    "dart": extract_dart,
    "package_json": extract_package_json,
    "pubspec_yaml": extract_pubspec_yaml,
}

__all__ = ["extract_file", "FileContext", "HandlerConfig"]

"""Handler registry: which extractor handles which file.

Mirrors the reference's config-driven handler table
(``src/CodeToNeo4j/Configuration/config.json:1-17`` +
``Solution/SolutionProcessor.cs:333-379`` dispatch: exact-basename
handlers first (package.json, pubspec.yaml), then extension lookup).
Exclusion directories per
``Solution/Discovery/SolutionFileDiscoveryService.cs:141-149``.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class HandlerConfig:
    name: str
    extensions: tuple[str, ...]
    language: str
    technology: str
    kind_prefix: str = ""


# Order matters only for documentation; dispatch is by dict lookup.
HANDLERS: tuple[HandlerConfig, ...] = (
    HandlerConfig("csharp", (".cs",), "csharp", "dotnet"),
    HandlerConfig("razor", (".razor",), "csharp", "dotnet"),
    HandlerConfig("typescript", (".ts", ".tsx"), "typescript", "node", "TypeScript"),
    HandlerConfig("javascript", (".js",), "javascript", "node", "JavaScript"),
    HandlerConfig("css", (".css",), "css", "web"),
    HandlerConfig("html", (".html",), "html", "web"),
    HandlerConfig("xaml", (".xaml",), "xaml", "dotnet"),
    HandlerConfig("xml", (".xml",), "xml", "xml"),
    HandlerConfig("json", (".json",), "json", "json"),
    HandlerConfig("csproj", (".csproj",), "xml", "dotnet"),
    HandlerConfig("dart", (".dart",), "dart", "flutter"),
    HandlerConfig("package_json", ("package.json",), "json", "node"),
    HandlerConfig("pubspec_yaml", ("pubspec.yaml",), "yaml", "flutter"),
)

# basename handlers win over extension handlers (SolutionProcessor.cs:342-359)
BASENAME_HANDLERS: dict[str, HandlerConfig] = {
    "package.json": next(h for h in HANDLERS if h.name == "package_json"),
    "pubspec.yaml": next(h for h in HANDLERS if h.name == "pubspec_yaml"),
}

EXTENSION_HANDLERS: dict[str, HandlerConfig] = {
    ext: h
    for h in HANDLERS
    if h.name not in ("package_json", "pubspec_yaml")
    for ext in h.extensions
}

# SolutionFileDiscoveryService.cs:141-149 (case-insensitive path-segment match)
EXCLUDED_DIRS = frozenset(
    {"bin", "obj", ".git", ".idea", "node_modules", ".dart_tool", "build"}
)


def resolve_handler(path: str) -> HandlerConfig | None:
    """filename → handler (basename first, then extension), None if no handler."""
    base = path.rsplit("/", 1)[-1].lower()
    h = BASENAME_HANDLERS.get(base)
    if h is not None:
        return h
    dot = base.rfind(".")
    if dot < 0:
        return None
    return EXTENSION_HANDLERS.get(base[dot:])


def is_excluded(path: str) -> bool:
    return any(seg.lower() in EXCLUDED_DIRS for seg in path.split("/"))

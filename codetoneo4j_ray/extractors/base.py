"""Shared extractor infrastructure.

An extractor is a pure function of one corpus row that appends row-dicts
to per-file symbol / mention / url buffers — the analog of the
reference's ``IDocumentHandler.Handle(... symbolBuffer, relBuffer ...)``
(``Technologies/IDocumentHandler.cs:6-26``). Key/record construction
mirrors TextSymbolMapper (``Graph/Mapping/TextSymbolMapper.cs:6-44``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

_UNSET = object()  # sentinel: "namespace not passed" vs "namespace is None"


@dataclass
class FileContext:
    """Everything a handler gets about the file being processed."""

    repo: str            # raw repo column
    repo_key: str        # lowercased repo (OptionsBinder.cs:89-99)
    path: str            # relative path, forward slashes
    file_key: str        # == path (FileService.cs:24-55)
    namespace: str       # inferred from directory (FileService.cs:26-54)
    content: str
    language: str
    technology: str

    symbols: list[dict] = field(default_factory=list)
    mentions: list[dict] = field(default_factory=list)
    urls: list[dict] = field(default_factory=list)
    # handlers may override the file-level namespace (razor @namespace,
    # xaml x:Class, csharp first type) — reflected into the files table
    file_namespace_override: str | None = None
    # optional package-metadata side table: (name_lower, version) →
    # (project_url, repository_url). The portable analog of the nuspec
    # cache lookup (CsprojHandler.cs:157-200 reads
    # ~/.nuget/packages/{name}/{version}/{name}.nuspec) — a Parquet
    # corpus has no package cache, so the same facts arrive as a
    # broadcast side table.
    pkg_meta: dict | None = None

    # ---- TextSymbolMapper analogs ------------------------------------
    def build_key(self, kind_token: str, name: str, start_line: int | None = None) -> str:
        if start_line is not None:
            return f"{self.file_key}:{kind_token}:{name}:{start_line}"
        return f"{self.file_key}:{kind_token}:{name}"

    def add_symbol(
        self,
        key: str,
        name: str,
        kind: str,
        class_: str,
        fqn: str,
        start_line: int,
        end_line: int | None = None,
        accessibility: str = "Public",
        documentation: str | None = None,
        comments: str | None = None,
        namespace=_UNSET,
        version: str | None = None,
    ) -> dict:
        row = {
            "key": key,
            "name": name,
            "kind": kind,
            "class": class_,
            "fqn": fqn,
            "accessibility": accessibility,
            "file_key": self.file_key,
            "path": self.path,
            "start_line": start_line,
            "end_line": end_line if end_line is not None else start_line,
            "documentation": documentation,
            "comments": comments,
            "namespace": self.namespace if namespace is _UNSET else namespace,
            "version": version,
            "language": self.language,
            "technology": self.technology,
            "repo": self.repo,
        }
        self.symbols.append(row)
        return row

    def add_mention(self, subj: str, pred: str, obj: str) -> None:
        """A fully-keyed mention (relBuffer entry with a concrete target key)."""
        self.mentions.append(
            {
                "subj": subj,
                "pred": pred,
                "obj": obj,
                "repo": self.repo,
                "ctx_kind": "",
                "ctx_name": "",
                "ctx_receiver": "",
                "ctx_argc": -1,
                "ctx_namespace": "",
                "ctx_usings": "",
            }
        )

    def add_deferred_mention(
        self,
        subj: str,
        pred: str,
        ctx_kind: str,
        ctx_name: str,
        ctx_receiver: str = "",
        ctx_argc: int = -1,
        ctx_namespace: str = "",
        ctx_usings: str = "",
    ) -> None:
        """A mention whose target key needs stage-2 name resolution
        (cross-file FQN lookup the reference gets from the semantic model)."""
        self.mentions.append(
            {
                "subj": subj,
                "pred": pred,
                "obj": "",
                "repo": self.repo,
                "ctx_kind": ctx_kind,
                "ctx_name": ctx_name,
                "ctx_receiver": ctx_receiver,
                "ctx_argc": ctx_argc,
                "ctx_namespace": ctx_namespace,
                "ctx_usings": ctx_usings,
            }
        )

    def add_url(self, dep_key: str, url: str) -> None:
        self.urls.append(
            {
                "dep_key": dep_key,
                "url_key": f"url:{url}",
                "name": url,
                "repo": self.repo,
            }
        )

    # ---- PackageDependencyHandlerBase.AddDependency ------------------
    def add_package_dependency(self, name: str, version: str | None) -> None:
        """pkg:{name} Dependency symbol + File DEPENDS_ON mention
        (``Technologies/PackageDependencyHandlerBase.cs:20-47``)."""
        key = f"pkg:{name}"
        self.add_symbol(
            key,
            name,
            "Dependency",
            name,
            f"{name} ({version})" if version is not None else name,
            -1,
            documentation=version,
            version=version,
        )
        self.add_mention(self.file_key, "src__DEPENDS_ON", key)

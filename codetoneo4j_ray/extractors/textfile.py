"""Text-family extractors: JSON, XML, CSS, HTML, csproj, package.json,
pubspec.yaml, Razor directives, XAML.

Each function is the Ray-side port of one reference handler (citations
inline); it mutates the FileContext buffers and returns nothing. Parse
failures warn-and-skip like the reference (emit nothing, keep going).
"""

from __future__ import annotations

import json
import re

from codetoneo4j_ray.extractors import accessibility as acc
from codetoneo4j_ray.extractors.base import FileContext
from codetoneo4j_ray.extractors.xmlutil import XmlElem, XmlParseError, parse_xml
from codetoneo4j_ray.functions.text import dirname, get_line_number
from codetoneo4j_ray.schema import (
    BINDS_TO,
    CONTAINS,
    DEPENDS_ON,
    HAS_ATTRIBUTE,
    HAS_PROPERTY,
    SETS_PROPERTY,
)

# ---------------------------------------------------------------------------
# JSON — Technologies/Json/JsonHandler.cs:19-95
# ---------------------------------------------------------------------------


def extract_json(ctx: FileContext, min_accessibility: str) -> None:
    ns = dirname(ctx.path)
    ctx.file_namespace_override = ns
    if not acc.is_public_accessible(min_accessibility):
        return
    try:
        # list-of-pairs objects: preserves duplicate keys and order like
        # System.Text.Json's EnumerateObject
        doc = json.loads(ctx.content, object_pairs_hook=lambda p: ("__obj__", p))
    except (json.JSONDecodeError, RecursionError):
        return
    _process_json_element(ctx, doc, ns, "")


def _process_json_element(ctx: FileContext, element, ns: str, path: str) -> None:
    if isinstance(element, tuple) and len(element) == 2 and element[0] == "__obj__":
        for name, value in element[1]:
            prop_path = name if not path else f"{path}.{name}"
            key = ctx.build_key("JsonProperty", prop_path)
            ctx.add_symbol(
                key, name, "JsonProperty", "property", prop_path,
                -1, namespace=ns,
            )
            ctx.add_mention(ctx.file_key, CONTAINS, key)
            _process_json_element(ctx, value, ns, prop_path)
    elif isinstance(element, list):
        for i, item in enumerate(element):
            _process_json_element(ctx, item, ns, f"{path}[{i}]")


# ---------------------------------------------------------------------------
# XML — Technologies/Xml/XmlHandler.cs:17-91 + Graph/Xml/XmlAttributeExtractor.cs
# ---------------------------------------------------------------------------


def _extract_xml_attributes(
    ctx: FileContext,
    elem: XmlElem,
    element_name: str,
    parent_key: str,
    start_line: int,
    ns: str | None,
    kind_token: str,
    rel_type: str,
    skip_predicate=None,
    comment_extractor=None,
) -> None:
    for attr in elem.attrs:
        if skip_predicate is not None and skip_predicate(attr):
            continue
        attr_name = attr.local_name
        attr_key = ctx.build_key(kind_token, f"{element_name}.{attr_name}", start_line)
        ctx.add_symbol(
            attr_key,
            attr_name,
            kind_token,
            "attribute",
            f"{element_name}.{attr_name}={attr.value}",
            start_line,
            documentation=attr.value,
            comments=comment_extractor(attr.value) if comment_extractor else None,
            namespace=ns,
        )
        ctx.add_mention(parent_key, rel_type, attr_key)


def extract_xml(ctx: FileContext, min_accessibility: str) -> None:
    ns = dirname(ctx.path)
    ctx.file_namespace_override = ns
    try:
        root = parse_xml(ctx.content)
    except XmlParseError:
        return
    if acc.PUBLIC < acc.level(min_accessibility):
        return
    _process_xml_element(ctx, root, ns, min_accessibility)


def _process_xml_element(ctx: FileContext, elem: XmlElem, ns: str, min_accessibility: str) -> None:
    name = elem.local_name
    start_line = elem.line
    key = ctx.build_key("XmlElement", name, start_line)
    ctx.add_symbol(key, name, "XmlElement", "element", name, start_line, namespace=ns)
    ctx.add_mention(ctx.file_key, CONTAINS, key)
    _extract_xml_attributes(
        ctx, elem, name, key, start_line, ns, "XmlAttribute", HAS_ATTRIBUTE
    )
    for child in elem.children:
        _process_xml_element(ctx, child, ns, min_accessibility)


# ---------------------------------------------------------------------------
# CSS — Technologies/Web/Css/CssHandler.cs:15-77
# ---------------------------------------------------------------------------

_CSS_SELECTOR_RE = re.compile(r"([^{]+)\s*\{", re.MULTILINE)


def extract_css(ctx: FileContext, min_accessibility: str) -> None:
    ns = dirname(ctx.path)
    ctx.file_namespace_override = ns
    if not acc.is_public_accessible(min_accessibility):
        return
    for m in _CSS_SELECTOR_RE.finditer(ctx.content):
        selector = m.group(1).strip()
        if not selector or selector.startswith("@"):
            continue
        start_line = get_line_number(ctx.content, m.start())
        key = ctx.build_key("CssSelector", selector, start_line)
        ctx.add_symbol(
            key, selector, "CssSelector", "selector", selector, start_line, namespace=ns
        )
        ctx.add_mention(ctx.file_key, CONTAINS, key)


# ---------------------------------------------------------------------------
# HTML — Technologies/Web/Html/HtmlHandler.cs:15-110
# ---------------------------------------------------------------------------

_HTML_SCRIPT_RE = re.compile(r"<script\s+.*?src=['\"](.*?)['\"]", re.IGNORECASE | re.MULTILINE)
_HTML_ID_RE = re.compile(r"id=['\"](.*?)['\"]", re.IGNORECASE | re.MULTILINE)


def extract_html(ctx: FileContext, min_accessibility: str) -> None:
    ns = dirname(ctx.path)
    ctx.file_namespace_override = ns
    if not acc.is_public_accessible(min_accessibility):
        return
    for m in _HTML_SCRIPT_RE.finditer(ctx.content):
        src = m.group(1)
        start_line = get_line_number(ctx.content, m.start())
        key = ctx.build_key("ScriptRef", src, start_line)
        ctx.add_symbol(
            key, src, "HtmlScriptReference", "script", src, start_line, namespace=ns
        )
        ctx.add_mention(ctx.file_key, DEPENDS_ON, key)
    for m in _HTML_ID_RE.finditer(ctx.content):
        elem_id = m.group(1)
        start_line = get_line_number(ctx.content, m.start())
        key = ctx.build_key("ElementId", elem_id, start_line)
        ctx.add_symbol(
            key, elem_id, "HtmlElementId", "element", elem_id, start_line, namespace=ns
        )
        ctx.add_mention(ctx.file_key, CONTAINS, key)


# ---------------------------------------------------------------------------
# csproj — Technologies/DotNet/Csproj/CsprojHandler.cs:17-204
# ---------------------------------------------------------------------------


def extract_csproj(ctx: FileContext, min_accessibility: str) -> None:
    ns = dirname(ctx.path)
    ctx.file_namespace_override = ns
    try:
        root = parse_xml(ctx.content)
    except XmlParseError:
        return
    if acc.PUBLIC < acc.level(min_accessibility):
        return

    # PropertyGroup direct children → ProjectProperty symbols.
    # NOTE: reference omits language/technology here → "unknown"
    # (CsprojHandler.cs:75-88 calls CreateSymbol without those args).
    for group in root.children:
        if group.local_name != "PropertyGroup":
            continue
        for prop in group.children:
            name = prop.local_name
            value = _xelement_value(prop)
            if not name.strip() or not value.strip():
                continue
            start_line = prop.line
            key = ctx.build_key("Property", name, start_line)
            row = ctx.add_symbol(
                key, name, "ProjectProperty", name, f"{name}: {value}",
                start_line, documentation=value, namespace=ns,
            )
            row["language"] = "unknown"
            row["technology"] = "unknown"
            ctx.add_mention(ctx.file_key, HAS_PROPERTY, key)

    for elem in root.iter():
        if elem.local_name == "PackageReference":
            include = _attr_value(elem, "Include")
            version = _attr_value(elem, "Version")
            if version is None:
                for child in elem.children:
                    if child.local_name == "Version":
                        version = _xelement_value(child)
                        break
            if not include:
                continue
            ctx.add_package_dependency(include, version)
            # nuspec URL analog (CsprojHandler.CollectNuspecUrls:139-154):
            # the package-metadata side table replaces the local NuGet
            # cache; lookup only with a version, urls in nuspec order
            # (projectUrl then repositoryUrl), empties skipped
            nuget_meta = (ctx.pkg_meta or {}).get("nuget")
            if nuget_meta is not None and version:
                meta = nuget_meta.get((include.lower(), version))
                if meta is not None:
                    dep_key = f"pkg:{include}"
                    for url in meta:
                        if url:
                            ctx.add_url(dep_key, url)
        elif elem.local_name == "ProjectReference":
            include = _attr_value(elem, "Include")
            if not include:
                continue
            start_line = elem.line
            key = ctx.build_key("ProjectReference", include, start_line)
            row = ctx.add_symbol(
                key, include, "ProjectReference", include, include, start_line,
                namespace=ns,
            )
            row["language"] = "unknown"
            row["technology"] = "unknown"
            ctx.add_mention(ctx.file_key, DEPENDS_ON, key)


def _xelement_value(elem: XmlElem) -> str:
    """XElement.Value: concatenated text of all descendants."""
    parts = [elem.text]
    for c in elem.children:
        parts.append(_xelement_value(c))
    return "".join(parts)


def _attr_value(elem: XmlElem, name: str) -> str | None:
    a = elem.find_attr(name)
    return a.value if a is not None else None


# ---------------------------------------------------------------------------
# package.json — Technologies/Web/npm/PackageJsonHandler.cs:15-229
# ---------------------------------------------------------------------------


def extract_package_json(ctx: FileContext, min_accessibility: str) -> None:
    ns = dirname(ctx.path)
    ctx.file_namespace_override = ns
    if acc.PUBLIC < acc.level(min_accessibility):
        return
    try:
        doc = json.loads(ctx.content)
    except json.JSONDecodeError:
        return
    if not isinstance(doc, dict):
        return
    for section in ("dependencies", "devDependencies"):
        deps = doc.get(section)
        if not isinstance(deps, dict):
            continue
        for name, version in deps.items():
            if not name:
                continue
            ctx.add_package_dependency(
                name, version if isinstance(version, str) else None
            )
            # npm URL analog (PackageJsonHandler.CollectNpmUrls:125-166):
            # the side table replaces node_modules/.pnpm on disk. Lookup
            # is by NAME (node_modules holds the resolved version);
            # homepage emitted verbatim, repository normalized.
            npm_meta = (ctx.pkg_meta or {}).get("npm")
            if npm_meta is not None:
                meta = npm_meta.get(name)
                if meta is not None:
                    from codetoneo4j_ray.functions.urls import (
                        normalize_repository_url,
                    )

                    homepage, repo_raw = meta
                    dep_key = f"pkg:{name}"
                    if homepage and homepage.strip():
                        ctx.add_url(dep_key, homepage.strip())
                    repo_url = normalize_repository_url(repo_raw)
                    if repo_url:
                        ctx.add_url(dep_key, repo_url)


# ---------------------------------------------------------------------------
# pubspec.yaml — Technologies/Dart/PubspecYamlHandler.cs:23-92
# ---------------------------------------------------------------------------


def extract_pubspec_yaml(ctx: FileContext, min_accessibility: str) -> None:
    ns = dirname(ctx.path)
    ctx.file_namespace_override = ns
    if acc.PUBLIC < acc.level(min_accessibility):
        return
    try:
        import yaml

        doc = yaml.safe_load(ctx.content)
    except Exception:
        return
    if not isinstance(doc, dict):
        return
    for section in ("dependencies", "dev_dependencies"):
        deps = doc.get(section)
        if not isinstance(deps, dict):
            continue
        for name, version in deps.items():
            if not name:
                continue
            v = version if isinstance(version, (str, int, float)) else None
            ctx.add_package_dependency(name, str(v) if v is not None else None)


# ---------------------------------------------------------------------------
# Razor — Technologies/DotNet/Razor/RazorHandler.cs (regex directives; the
# Roslyn generated-code pass needs a compilation → not portable, documented)
# ---------------------------------------------------------------------------

_RAZOR_NAMESPACE_RE = re.compile(r"^@namespace\s+(.+)$", re.MULTILINE)
_RAZOR_DIRECTIVES_RE = re.compile(r"^@(?:using|inject|model|inherits)\s+(.+)$", re.MULTILINE)


_RAZOR_CODE_OPEN_RE = re.compile(r"@(?:code|functions)\s*\{")


def _razor_code_blocks(content: str) -> list[tuple[int, str]]:
    """(start_line_of_block_body, body) per @code/@functions block —
    simple depth-matched braces (strings with braces inside @code are the
    documented approximation vs the real Razor parser)."""
    out: list[tuple[int, str]] = []
    for m in _RAZOR_CODE_OPEN_RE.finditer(content):
        open_idx = m.end() - 1
        depth = 0
        for i in range(open_idx, len(content)):
            c = content[i]
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    body = content[open_idx + 1 : i]
                    # body starts right after '{'; its first line is the
                    # line of '{' itself
                    out.append((get_line_number(content, open_idx), body))
                    break
    return out


def extract_razor(ctx: FileContext, min_accessibility: str,
                  repo_index=None) -> None:
    """Razor: generated-code analog + regex directives.

    The reference runs RoslynSymbolProcessor over the compiler-generated
    component class and maps lines back via #line, overriding the file
    key with the generated type's FQN (RazorHandler.cs:34-84). Without a
    Razor compilation the generated tree is deterministic from the
    template: class name = file basename, namespace = @namespace (else
    the inferred directory namespace), base = @inherits, members = the
    @code/@functions block bodies. We synthesize that compilation unit
    and run the regular C# extractor over it, remapping member lines to
    the template. Deltas: markup-derived code (bind/event lambdas in
    HTML) is not extracted; class decl maps to line 1."""
    content = ctx.content
    m = _RAZOR_NAMESPACE_RE.search(content)
    ns = m.group(1).strip() if m else None

    # ---- generated-code pass (RazorHandler.cs:34-78 analog) ----------
    from codetoneo4j_ray.extractors.base import FileContext as _FC
    from codetoneo4j_ray.extractors.csharp.extractor import extract_csharp
    from codetoneo4j_ray.extractors.csharp.types import RepoTypeIndex

    base_name = ctx.path.rsplit("/", 1)[-1]
    cls = base_name[:-6] if base_name.lower().endswith(".razor") else base_name
    cls_ident = re.sub(r"[^0-9A-Za-z_]", "_", cls) or "_"
    gen_ns = ns or (ctx.namespace or None)
    fqn = f"{gen_ns}.{cls_ident}" if gen_ns else cls_ident

    usings: list[str] = []
    inherits: str | None = None
    for dm in _RAZOR_DIRECTIVES_RE.finditer(content):
        text = dm.group(0).strip()
        val = dm.group(1).strip()
        if text.startswith("@using"):
            usings.append(val)
        elif text.startswith("@inherits"):
            inherits = val

    syn_lines: list[str] = []
    line_map: dict[int, int] = {}

    def emit(text: str, orig_line: int | None = None) -> None:
        syn_lines.append(text)
        if orig_line is not None:
            line_map[len(syn_lines)] = orig_line

    for u in usings:
        emit(f"using {u};")
    if gen_ns:
        emit(f"namespace {gen_ns};")
    decl = f"public partial class {cls_ident}"
    if inherits:
        decl += f" : {inherits}"
    emit(decl)
    emit("{")
    for block_line, body in _razor_code_blocks(content):
        for i, ln in enumerate(body.split("\n")):
            emit(ln, orig_line=block_line + i)
    emit("}")

    child = _FC(
        repo=ctx.repo, repo_key=ctx.repo_key, path=ctx.path,
        file_key=fqn, namespace=gen_ns or "", content="\n".join(syn_lines),
        language=ctx.language, technology=ctx.technology,
    )
    try:
        extract_csharp(child, min_accessibility,
                       repo_index or RepoTypeIndex())
    except Exception:  # noqa: BLE001 — malformed @code never fails the file
        child = None
    if child is not None:
        for s in child.symbols:
            s["start_line"] = line_map.get(s["start_line"], 1)
            s["end_line"] = line_map.get(s["end_line"], 1)
        ctx.symbols.extend(child.symbols)
        ctx.mentions.extend(child.mentions)
        # fileKey := generated type FQN; fileNamespace := its namespace
        # (RazorHandler.cs:60-72) — the directive pass below uses both
        ctx.file_key = fqn
        if gen_ns:
            ns = gen_ns
    ctx.file_namespace_override = ns

    # ---- regex directive pass (fallback/complement, :96-129) ---------
    if not acc.is_public_accessible(min_accessibility):
        return
    for m in _RAZOR_DIRECTIVES_RE.finditer(content):
        line_text = m.group(0).strip()
        if line_text.startswith("@using"):
            kind = "UsingDirective"
        elif line_text.startswith("@inject"):
            kind = "InjectDirective"
        elif line_text.startswith("@model"):
            kind = "ModelDirective"
        else:
            kind = "InheritsDirective"
        name = m.group(1).strip()
        key = ctx.build_key(kind, name)
        start_line = get_line_number(ctx.content, m.start())
        ctx.add_symbol(
            key, name, kind, "component", name, start_line, namespace=ns
        )
        ctx.add_mention(ctx.file_key, CONTAINS, key)


# ---------------------------------------------------------------------------
# XAML — Technologies/DotNet/Xaml/XamlHandler.cs:25-253 (XML pass; the
# Roslyn generated-code pass needs a compilation → not portable, documented)
# ---------------------------------------------------------------------------

_XAML_NAMESPACES = frozenset(
    {
        "http://schemas.microsoft.com/winfx/2009/xaml",
        "http://schemas.microsoft.com/winfx/2006/xaml",
        "http://schemas.microsoft.com/dotnet/2021/maui",
        "http://schemas.microsoft.com/winfx/2006/xaml/presentation",
        "http://xamarin.com/schemas/2014/forms",
        "http://schemas.microsoft.com/client/2007",
        "https://github.com/avaloniaui",
    }
)

_BINDING_RE = re.compile(r"^\{Binding\s+(\S+?)(?:\s*,.*)?}$")

_EVENT_SUFFIXES = ("Click", "Changed", "Loaded", "Pressed", "Released")


def _is_event_handler(attr_name: str) -> bool:
    return attr_name.endswith(_EVENT_SUFFIXES) or attr_name == "Command"


def extract_binding_path(value: str) -> str | None:
    m = _BINDING_RE.match(value)
    if not m:
        return None
    path = m.group(1)
    if path.startswith("Path="):
        path = path[5:]
    return path


def _get_xaml_attr(elem: XmlElem, local_name: str):
    for a in elem.attrs:
        if (
            a.local_name == local_name
            and not a.is_namespace_decl
            and (a.namespace == "" or a.namespace in _XAML_NAMESPACES)
        ):
            return a
    return None


def extract_xaml(ctx: FileContext, min_accessibility: str,
                 repo_index=None) -> None:
    try:
        root = parse_xml(ctx.content)
    except XmlParseError:
        ctx.file_namespace_override = None
        return
    ns: str | None = None
    x_class = _get_xaml_attr(root, "Class")
    if x_class is not None and x_class.value:
        ns = x_class.value.rsplit(".", 1)[0] if "." in x_class.value else None
    ctx.file_namespace_override = ns
    _process_xaml_element(ctx, root, ns, min_accessibility)
    if x_class is not None and x_class.value:
        _xaml_generated_pass(ctx, root, x_class.value, min_accessibility,
                             repo_index)


def _xaml_generated_pass(
    ctx: FileContext, root: XmlElem, x_class: str, min_accessibility: str,
    repo_index=None,
) -> None:
    """Generated-code analog (XamlHandler.cs:61-88): the XAML compiler's
    ``.g.cs`` partial class — one typed field per ``x:Name`` element plus
    ``InitializeComponent()`` — processed like any C# tree, mapped back
    to the .xaml file (file key stays the path; unlike Razor there is no
    key override). Element-type fields reference framework types
    (Button, …) whose DEPENDS_ON mentions dangle and drop at linking,
    exactly as the reference's generated-field types do."""
    from codetoneo4j_ray.extractors.base import FileContext as _FC
    from codetoneo4j_ray.extractors.csharp.extractor import extract_csharp
    from codetoneo4j_ray.extractors.csharp.types import RepoTypeIndex

    gen_ns = x_class.rsplit(".", 1)[0] if "." in x_class else None
    cls = x_class.rsplit(".", 1)[-1]
    fields: list[tuple[str, str, int]] = []  # (type, name, orig_line)

    def walk(elem: XmlElem) -> None:
        xn = _get_xaml_attr(elem, "Name")
        if xn is not None and xn.value:
            fields.append((elem.local_name, xn.value, elem.line))
        for child in elem.children:
            walk(child)

    walk(root)

    syn_lines: list[str] = []
    line_map: dict[int, int] = {}

    def emit(text: str, orig_line: int | None = None) -> None:
        syn_lines.append(text)
        if orig_line is not None:
            line_map[len(syn_lines)] = orig_line

    if gen_ns:
        emit(f"namespace {gen_ns};")
    emit(f"public partial class {cls}")
    emit("{")
    for ftype, fname, fline in fields:
        emit(f"    internal {ftype} {fname};", orig_line=fline)
    emit("    private void InitializeComponent() { }")
    emit("}")

    child = _FC(
        repo=ctx.repo, repo_key=ctx.repo_key, path=ctx.path,
        file_key=ctx.file_key, namespace=gen_ns or "",
        content="\n".join(syn_lines),
        language=ctx.language, technology=ctx.technology,
    )
    try:
        extract_csharp(child, min_accessibility,
                       repo_index or RepoTypeIndex())
    except Exception:  # noqa: BLE001 — synthesis must never fail the file
        return
    for s in child.symbols:
        s["start_line"] = line_map.get(s["start_line"], 1)
        s["end_line"] = line_map.get(s["end_line"], 1)
    ctx.symbols.extend(child.symbols)
    ctx.mentions.extend(child.mentions)


def _process_xaml_element(
    ctx: FileContext, elem: XmlElem, ns: str | None, min_accessibility: str
) -> None:
    name = elem.local_name
    x_name = _get_xaml_attr(elem, "Name")
    x_key = _get_xaml_attr(elem, "Key")
    key_suffix = ""
    if x_name is not None:
        key_suffix = f":{x_name.value}"
    elif x_key is not None:
        key_suffix = f":{x_key.value}"
    start_line = elem.line
    symbol_key = f"{ctx.file_key}:{name}{key_suffix}:{start_line}"
    min_lv = acc.level(min_accessibility)

    if acc.PUBLIC >= min_lv:
        display = (
            x_name.value if x_name is not None
            else x_key.value if x_key is not None
            else name
        )
        ctx.add_symbol(
            symbol_key, display, "XamlElement", "element",
            f"{name}{key_suffix}", start_line, namespace=ns,
        )
        ctx.add_mention(ctx.file_key, CONTAINS, symbol_key)

    for attr in elem.attrs:
        if attr.is_namespace_decl:
            continue
        if _is_event_handler(attr.local_name) and acc.PRIVATE >= min_lv:
            handler_key = ctx.build_key("EventHandler", attr.value)
            ctx.add_symbol(
                handler_key, attr.value, "XamlEventHandler", "event-handler",
                attr.value, start_line, accessibility="Private", namespace=ns,
            )
            ctx.add_mention(symbol_key, BINDS_TO, handler_key)

    if acc.PUBLIC >= min_lv:

        def skip(a):
            return (
                a.is_namespace_decl
                or a.namespace in _XAML_NAMESPACES
                or _is_event_handler(a.local_name)
            )

        _extract_xml_attributes(
            ctx, elem, name, symbol_key, start_line, ns,
            "XamlAttribute", SETS_PROPERTY,
            skip_predicate=skip, comment_extractor=extract_binding_path,
        )

    for child in elem.children:
        _process_xaml_element(ctx, child, ns, min_accessibility)

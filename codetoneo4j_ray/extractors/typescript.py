"""TypeScript / JavaScript extractor.

Ports the reference's TS Compiler API visitor
(``tools/ts-analyzer/src/visitor.ts:17-496``) and the C#-side key/record
construction (``Technologies/Web/TypeScriptHandlerBase.cs:66-110``) as a
token-scanning extractor (no tsc available):

  - symbol key   = ``{fileKey}:{Kind}:{name}:{startLine}``
  - symbol fqn   = ``@{project}/{relPath}::[Class.]name`` — project =
    the nearest-ancestor ``package.json``'s ``name`` (basename fallback,
    ``analyzer.ts:52-66``), relPath = path relative to that project
    root; files with NO package.json ancestor keep their File record
    but skip analysis (``TypeScriptHandlerBase.cs:36-41``). Direct
    ``extract_file(..., repo_index=None)`` calls (unit tests) fall back
    to project ≈ repo with solution-relative paths.
  - namespace    = ``@{project}/{dir}``
  - relationship endpoint keys use the visitor's lowercase kinds
    ('class' / 'method' / 'file' / 'package' …), which never coincide
    with symbol keys — faithfully reproducing the reference, where all
    TS edges dangle and are dropped at materialize time.

Covered: class (abstract), interface, enum, type alias, namespace/module,
function, arrow/function-expression const, methods/accessors/ctors/fields,
decorators (HAS_TAG), heritage (DEPENDS_ON), imports (relative → file,
bare → package root), calls / new (INVOKES). JSX bodies and re-exports
are scanned best-effort.
"""

from __future__ import annotations

import posixpath

from codetoneo4j_ray.extractors import accessibility as acc
from codetoneo4j_ray.extractors.base import FileContext
from codetoneo4j_ray.extractors.csharp.lexer import Token, tokenize
from codetoneo4j_ray.functions.text import dirname
from codetoneo4j_ray.schema import CONTAINS, DEPENDS_ON, HAS_TAG, INVOKES

_MODIFIERS = frozenset(
    "export declare abstract default public private protected static readonly async".split()
)
_NOT_CALLS = frozenset(
    "if while for switch catch return throw new typeof instanceof in of else do "
    "await yield function class interface enum namespace module import export "
    "const let var delete void super".split()
)


_ANALYZER_SKIP_DIRS = frozenset(
    {"node_modules", "dist", "build", ".next", ".nuxt", "coverage", ".git"}
)


def _analyzer_excluded(path: str) -> bool:
    """Files the reference's node analyzer never returns results for:
    declaration files (analyzer.ts:39), generated files (analyzer.ts:42,
    107-119) and skipped directories incl. dot-dirs (analyzer.ts:70,91).
    The C# handler still emits the File record for them — HandleFile
    returns an empty FileResult (TypeScriptHandlerBase.cs:62-66) — so the
    extractor skips symbols/relationships but keeps the file row."""
    base = path.rsplit("/", 1)[-1].lower()
    if base.endswith(".d.ts"):
        return True
    if base.endswith((".generated.ts", ".gen.ts", ".generated.js", ".gen.js")):
        return True
    return any(
        s.lower() in _ANALYZER_SKIP_DIRS or s.startswith(".")
        for s in path.split("/")[:-1]
    )


def _nearest_root(path: str, roots: dict[str, str | None]):
    """Nearest ancestor dir holding a manifest — the FindProjectRoot
    walk (TypeScriptHandlerBase.cs:116-133) over corpus-relative dirs."""
    d = dirname(path)
    while True:
        if d in roots:
            return d, roots[d]
        if d == "":
            return None
        d = dirname(d)


def extract_typescript(
    ctx: FileContext,
    min_accessibility: str,
    kind_prefix: str = "TypeScript",
    repo_index=None,
) -> None:
    ns_dir = dirname(ctx.path)
    ctx.file_namespace_override = ns_dir
    if _analyzer_excluded(ctx.path):
        return
    if repo_index is None:
        # direct/unit-test invocation: project ≈ repo, solution-relative
        # paths (the visitor tests' PROJECT/REL_PATH inputs)
        project, rel = ctx.repo, ctx.path
    else:
        hit = _nearest_root(ctx.path, repo_index.npm_roots)
        if hit is None:
            # no package.json ancestor → File record only, no analysis
            # (TypeScriptHandlerBase.cs:36-41)
            return
        root_dir, name = hit
        # project name: package.json 'name', else basename(projectRoot)
        # (analyzer.ts:52-66); a corpus-root project falls back to repo
        project = name or (root_dir.rsplit("/", 1)[-1] if root_dir else ctx.repo)
        rel = ctx.path[len(root_dir) + 1:] if root_dir else ctx.path
    toks = [t for t in tokenize(ctx.content) if t.kind not in ("comment", "doc")]
    trivia = _leading_trivia_map(ctx.content)
    s = _Scanner(ctx, toks, trivia, project, min_accessibility, kind_prefix, rel)
    s.scan(0, len(toks), current_class=None, class_kind=None, in_method=None)


def _leading_trivia_map(content: str) -> dict[int, tuple[str | None, str | None]]:
    """line → (jsdoc, comments) attached to declarations starting there."""
    toks = tokenize(content)
    out: dict[int, tuple[str | None, str | None]] = {}
    pending_doc: list[str] = []
    pending_comments: list[str] = []
    for t in toks:
        if t.kind == "doc" and t.value.startswith("/**"):
            pending_doc.append(t.value)
        elif t.kind in ("comment", "doc"):
            pending_comments.append(t.value)
        else:
            if pending_doc or pending_comments:
                out[t.line] = (
                    "\n".join(pending_doc) or None,
                    "\n".join(pending_comments) or None,
                )
                pending_doc, pending_comments = [], []
    return out


class _Scanner:
    def __init__(self, ctx, toks: list[Token], trivia, project, min_acc,
                 kind_prefix, rel_path: str | None = None):
        self.ctx = ctx
        self.toks = toks
        self.trivia = trivia
        self.project = project
        self.min_acc = min_acc
        self.prefix = kind_prefix
        # project-relative path: the visitor's relativePath input, used
        # for fqn/namespace and the import from-name (visitor.ts:409-418)
        self.rel_path = rel_path if rel_path is not None else ctx.path

    # ---- helpers ------------------------------------------------------
    def v(self, i: int) -> str:
        return self.toks[i].value if 0 <= i < len(self.toks) else ""

    def k(self, i: int) -> str:
        return self.toks[i].kind if 0 <= i < len(self.toks) else ""

    def _match_balanced(self, i: int, open_c: str, close_c: str) -> int:
        depth = 0
        while i < len(self.toks):
            vv = self.v(i)
            if vv == open_c:
                depth += 1
            elif vv == close_c:
                depth -= 1
                if depth == 0:
                    return i
            i += 1
        return len(self.toks) - 1

    def _end_line_of_block(self, i: int) -> tuple[int, int]:
        """From a position, find '{'..'}' ahead; returns (close_idx, end_line)."""
        j = i
        while j < len(self.toks) and self.v(j) not in ("{", ";"):
            j += 1
        if self.v(j) == "{":
            close = self._match_balanced(j, "{", "}")
            return close, self.toks[close].line
        return j, (self.toks[j].line if j < len(self.toks) else self.toks[-1].line)

    def _accessibility(self, mods: list[str]) -> str:
        if "private" in mods:
            return "Private"
        if "protected" in mods:
            return "Protected"
        return "Public"

    def _should_include(self, accessibility: str) -> bool:
        # TypeScriptHandlerBase.ShouldInclude:135-158
        if acc.level(self.min_acc) == acc.NOT_APPLICABLE:
            return True
        return acc.level(accessibility) >= acc.level(self.min_acc)

    def _fqn(self, name: str, current_class: str | None) -> str:
        prefix = f"@{self.project}/{self.rel_path}"
        if current_class:
            return f"{prefix}::{current_class}.{name}"
        return f"{prefix}::{name}"

    def _namespace(self) -> str:
        d = dirname(self.rel_path)
        return f"@{self.project}/{d}"

    def _rel_key(self, file_key: str, kind: str, name: str, line: int | None) -> str:
        if line is not None:
            return f"{file_key}:{kind}:{name}:{line}"
        return f"{file_key}:{kind}:{name}"

    def _emit_symbol(self, name, kind_suffix, class_str, fqn, line, end_line,
                     accessibility, doc, comments) -> None:
        if not self._should_include(accessibility):
            return
        kind = f"{self.prefix}{kind_suffix}"
        key = f"{self.ctx.file_key}:{kind}:{name}:{line}"
        self.ctx.add_symbol(
            key, name, kind, class_str, fqn, line, end_line,
            accessibility=accessibility, documentation=doc, comments=comments,
            namespace=self._namespace(),
        )

    def _emit_rel(self, from_kind, from_name, from_line, to_kind, to_name,
                  to_line, rel_type, to_file: str | None = None) -> None:
        from_key = self._rel_key(self.ctx.file_key, from_kind, from_name, from_line)
        to_fk = to_file if to_file else self.ctx.file_key
        to_key = self._rel_key(to_fk, to_kind, to_name, to_line)
        self.ctx.add_mention(from_key, rel_type, to_key)

    # ---- main scan ----------------------------------------------------
    def scan(self, start: int, end: int, current_class, class_kind, in_method) -> None:
        i = start
        while i < end:
            t = self.toks[i]
            v = t.value
            if self.k(i) != "id":
                i += 1
                continue

            mods: list[str] = []
            decorators: list[str] = []
            j = i
            if v.startswith("@"):  # the lexer folds '@Name' into one id token
                i += 1
                continue
            # gather leading modifiers from this position
            while self.v(j) in _MODIFIERS and self.k(j) == "id":
                mods.append(self.v(j))
                j += 1
            # decorators appear before modifiers; collect backwards
            b = i - 1
            while b >= start:
                if self.k(b) == "id" and self.v(b).startswith("@") and len(self.v(b)) > 1:
                    decorators.append(self.v(b)[1:])
                    b -= 1
                    continue
                if self.v(b) == ")":  # @Component({...}) call form
                    depth = 0
                    b2 = b
                    while b2 >= start:
                        if self.v(b2) == ")":
                            depth += 1
                        elif self.v(b2) == "(":
                            depth -= 1
                            if depth == 0:
                                break
                        b2 -= 1
                    if b2 - 1 >= start and self.k(b2 - 1) == "id" and self.v(b2 - 1).startswith("@"):
                        decorators.append(self.v(b2 - 1)[1:])
                        b = b2 - 2
                        continue
                break
            head = self.v(j)

            if head == "class" and (self.k(j + 1) == "id" or "default" in mods):
                i = self._handle_class(i, j, mods, decorators, current_class)
                continue
            if head == "interface" and self.k(j + 1) == "id":
                i = self._handle_interface(i, j, mods)
                continue
            if head == "enum" and self.k(j + 1) == "id":
                name = self.v(j + 1)
                close, end_line = self._end_line_of_block(j + 2)
                doc, com = self.trivia.get(t.line, (None, None))
                self._emit_symbol(name, "Enum", "enum", self._fqn(name, None),
                                  t.line, end_line, self._accessibility(mods), doc, com)
                i = close + 1
                continue
            if head == "type" and self.k(j + 1) == "id" and self.v(j + 2) == "=":
                name = self.v(j + 1)
                doc, com = self.trivia.get(t.line, (None, None))
                self._emit_symbol(name, "TypeAlias", "type", self._fqn(name, None),
                                  t.line, t.line, self._accessibility(mods), doc, com)
                while i < end and self.v(i) != ";":
                    i += 1
                continue
            if head in ("namespace", "module") and self.k(j + 1) == "id":
                name = self.v(j + 1)
                jj = j + 2
                while self.v(jj) == "." and self.k(jj + 1) == "id":
                    name = self.v(jj + 1)
                    jj += 2
                close, end_line = self._end_line_of_block(jj)
                doc, com = self.trivia.get(t.line, (None, None))
                self._emit_symbol(name, "Namespace", "namespace", self._fqn(name, None),
                                  t.line, end_line, self._accessibility(mods), doc, com)
                body_open = jj
                while body_open <= close and self.v(body_open) != "{":
                    body_open += 1
                self.scan(body_open + 1, close, name, "namespace", None)
                i = close + 1
                continue
            if head == "function" and current_class is None:
                jj = j + 1
                if self.v(jj) == "*":
                    jj += 1
                if self.k(jj) == "id":
                    name = self.v(jj)
                    close, end_line = self._end_line_of_block(jj + 1)
                    doc, com = self.trivia.get(t.line, (None, None))
                    self._emit_symbol(name, "Function", "function",
                                      self._fqn(name, current_class), t.line, end_line,
                                      self._accessibility(mods), doc, com)
                    body_open = jj + 1
                    while body_open <= close and self.v(body_open) != "{":
                        body_open += 1
                    self.scan(body_open + 1, close, current_class, class_kind, name)
                    i = close + 1
                    continue
            if head in ("const", "let", "var") and current_class is None and self.k(j + 1) == "id":
                consumed = self._maybe_arrow_const(i, j, mods, current_class, class_kind)
                if consumed is not None:
                    i = consumed
                    continue
            if head == "import":
                i = self._handle_import(j)
                continue

            # calls inside a method body
            if in_method is not None and v not in _NOT_CALLS:
                if self.v(i + 1) == "(":
                    target = v
                    prev = self.v(i - 1)
                    if prev in (".", "?."):
                        pass  # property access: target = final name ✓
                    self._emit_rel("method", in_method, None, "method", target, None, INVOKES)
                    i += 1
                    continue
            if in_method is not None and v == "new" and self.k(i + 1) == "id" and self.v(i + 2) == "(":
                self._emit_rel("method", in_method, None, "constructor", self.v(i + 1), None, INVOKES)
                i += 2
                continue
            i += 1

    # ---- declarations -------------------------------------------------
    def _handle_class(self, i, j, mods, decorators, outer_class) -> int:
        t = self.toks[i]
        # anonymous `export default class {}`: named 'default' with the
        # `@proj/path#default` fqn form (visitor.ts:100-101)
        anon = self.k(j + 1) != "id"
        name = "default" if anon else self.v(j + 1)
        fqn = (
            f"@{self.project}/{self.rel_path}#default"
            if anon
            else self._fqn(name, None)
        )
        is_abstract = "abstract" in mods
        jj = j + 1 if anon else j + 2
        if self.v(jj) == "<":
            jj = self._match_balanced(jj, "<", ">") + 1
        heritage: list[tuple[str, str]] = []
        while self.v(jj) in ("extends", "implements"):
            rel_kind = "class" if self.v(jj) == "extends" else "interface"
            jj += 1
            while self.k(jj) == "id" and self.v(jj) not in ("implements", "extends"):
                tname = self.v(jj)
                jj += 1
                while self.v(jj) == "." and self.k(jj + 1) == "id":
                    tname += "." + self.v(jj + 1)
                    jj += 2
                if self.v(jj) == "<":
                    jj = self._match_balanced(jj, "<", ">") + 1
                heritage.append((tname, rel_kind))
                if self.v(jj) == ",":
                    jj += 1
                else:
                    break
        close, end_line = self._end_line_of_block(jj)
        doc, com = self.trivia.get(t.line, (None, None))
        self._emit_symbol(
            name, "AbstractClass" if is_abstract else "Class", "class",
            fqn, t.line, end_line,
            self._accessibility(mods), doc, com,
        )
        for tname, rel_kind in heritage:
            self._emit_rel("class", name, t.line, rel_kind, tname, None, DEPENDS_ON)
        for dec in decorators:
            self._emit_rel("class", name, t.line, "decorator", dec, None, HAS_TAG)
        body_open = jj
        while body_open <= close and self.v(body_open) != "{":
            body_open += 1
        self._scan_class_body(body_open + 1, close, name)
        return close + 1

    def _handle_interface(self, i, j, mods) -> int:
        t = self.toks[i]
        name = self.v(j + 1)
        jj = j + 2
        if self.v(jj) == "<":
            jj = self._match_balanced(jj, "<", ">") + 1
        heritage = []
        if self.v(jj) == "extends":
            jj += 1
            while self.k(jj) == "id":
                tname = self.v(jj)
                jj += 1
                while self.v(jj) == "." and self.k(jj + 1) == "id":
                    tname += "." + self.v(jj + 1)
                    jj += 2
                if self.v(jj) == "<":
                    jj = self._match_balanced(jj, "<", ">") + 1
                heritage.append(tname)
                if self.v(jj) == ",":
                    jj += 1
                else:
                    break
        close, end_line = self._end_line_of_block(jj)
        doc, com = self.trivia.get(t.line, (None, None))
        self._emit_symbol(name, "Interface", "interface", self._fqn(name, None),
                          t.line, end_line, self._accessibility(mods), doc, com)
        for tname in heritage:
            self._emit_rel("interface", name, t.line, "interface", tname, None, DEPENDS_ON)
        return close + 1  # interface members are not visited (visitor.ts:138-159)

    def _maybe_arrow_const(self, i, j, mods, current_class, class_kind) -> int | None:
        """const Name = (…) => …  /  const Name = function (…) {…}"""
        t = self.toks[i]
        name = self.v(j + 1)
        jj = j + 2
        if self.v(jj) == ":":  # type annotation: skip to '='
            while jj < len(self.toks) and self.v(jj) not in ("=", ";"):
                jj += 1
        if self.v(jj) != "=":
            return None
        jj += 1
        if self.v(jj) == "async" and self.k(jj) == "id":
            jj += 1
        is_fn = False
        body_from = jj
        if self.v(jj) == "function":
            is_fn = True
        elif self.v(jj) == "(":
            close_paren = self._match_balanced(jj, "(", ")")
            after = close_paren + 1
            if self.v(after) == ":":
                while after < len(self.toks) and self.v(after) != "=>":
                    after += 1
            if self.v(after) == "=>":
                is_fn = True
                body_from = after + 1
        elif self.k(jj) == "id" and self.v(jj + 1) == "=>":
            is_fn = True
            body_from = jj + 2
        if not is_fn:
            return None
        close, end_line = self._end_line_of_block(body_from)
        doc, com = self.trivia.get(t.line, (None, None))
        self._emit_symbol(name, "Function", "function", self._fqn(name, None),
                          self.toks[j + 1].line, end_line, "Public", doc, com)
        body_open = body_from
        while body_open <= close and self.v(body_open) not in ("{", ";"):
            body_open += 1
        if self.v(body_open) == "{":
            self.scan(body_open + 1, close, current_class, class_kind, name)
        else:
            # arrow expression body: the visitor walks it too (visitor.ts:356)
            self.scan(body_from, close, current_class, class_kind, name)
        return close + 1

    def _handle_import(self, j) -> int:
        t = self.toks[j]
        jj = j + 1
        spec = None
        depth = 0
        while jj < len(self.toks):
            v = self.v(jj)
            if v == ";":
                break
            # ASI (no-semicolon style): once the module spec string has
            # been seen and we are outside any braces, a token on a NEW
            # line belongs to the next statement — do not consume it
            if (spec is not None and depth == 0
                    and self.toks[jj].line > self.toks[jj - 1].line):
                jj -= 1
                break
            if v == "{":
                depth += 1
            elif v == "}":
                depth = max(0, depth - 1)
            # the lexer tags double-quoted strings 'str' and
            # single-quoted ones 'char' — imports use both styles
            if self.k(jj) in ("str", "char") and spec is None:
                spec = self.toks[jj].value.strip("'\"")
            jj += 1
        if spec:
            # from-name = the visitor's project-relative relativePath
            # (visitor.ts rel.FromSymbol; TypeScriptHandlerBase.cs:105)
            is_relative = spec.startswith(".") or spec.startswith("/")
            if is_relative:
                to_file = self._resolve_relative(spec)
                self.ctx.add_mention(
                    self._rel_key(self.ctx.file_key, "file", self.rel_path, t.line),
                    DEPENDS_ON,
                    self._rel_key(to_file, "file", to_file or spec, None),
                )
            else:
                pkg_root = spec.split("/")[0]
                self.ctx.add_mention(
                    self._rel_key(self.ctx.file_key, "file", self.rel_path, t.line),
                    DEPENDS_ON,
                    self._rel_key(self.ctx.file_key, "package", pkg_root, None),
                )
        return jj + 1

    def _resolve_relative(self, spec: str) -> str:
        from_dir = dirname(self.ctx.path)
        resolved = posixpath.normpath(posixpath.join(from_dir, spec))
        if not posixpath.splitext(resolved)[1]:
            resolved += ".ts"
        return resolved

    # ---- class body ---------------------------------------------------
    def _scan_class_body(self, start: int, end: int, class_name: str) -> None:
        i = start
        while i < end:
            if self.k(i) != "id":
                i += 1
                continue
            t = self.toks[i]
            mods: list[str] = []
            j = i
            while self.v(j) in _MODIFIERS and self.k(j) == "id" and not (
                self.v(j + 1) in ("(", "=", ":", ";", "?", "<")
            ):
                mods.append(self.v(j))
                j += 1
            head = self.v(j)
            accessor = None
            if head in ("get", "set") and self.k(j + 1) == "id":
                accessor = head
                j += 1
                head = self.v(j)
            doc, com = self.trivia.get(t.line, (None, None))
            accessibility = self._accessibility(mods)
            if head == "constructor" and self.v(j + 1) == "(":
                close, end_line = self._end_line_of_block(j + 1)
                self._emit_symbol("constructor", "Constructor", "constructor",
                                  self._fqn("constructor", class_name),
                                  t.line, end_line, accessibility, doc, com)
                self._emit_rel("class", class_name, t.line, "constructor",
                               "constructor", None, CONTAINS)
                body_open = j + 1
                while body_open <= close and self.v(body_open) != "{":
                    body_open += 1
                if self.v(body_open) == "{":
                    self.scan(body_open + 1, close, class_name, "class", "constructor")
                i = close + 1
                continue
            if self.k(j) == "id" and head not in _NOT_CALLS:
                name = head
                jj = j + 1
                if self.v(jj) == "?":
                    jj += 1
                if self.v(jj) == "<":
                    jj = self._match_balanced(jj, "<", ">") + 1
                if self.v(jj) == "(":
                    # method or accessor
                    close, end_line = self._end_line_of_block(jj)
                    kind_suffix = "Property" if accessor else "Method"
                    class_str = "property" if accessor else "method"
                    self._emit_symbol(name, kind_suffix, class_str,
                                      self._fqn(name, class_name),
                                      t.line, end_line, accessibility, doc, com)
                    self._emit_rel("class", class_name, t.line, class_str, name,
                                   None, CONTAINS)
                    body_open = jj
                    while body_open <= close and self.v(body_open) != "{":
                        body_open += 1
                    if self.v(body_open) == "{":
                        self.scan(body_open + 1, close, class_name, "class", name)
                    i = close + 1
                    continue
                if self.v(jj) in (":", "=", ";"):
                    self._emit_symbol(name, "Field", "field",
                                      self._fqn(name, class_name),
                                      t.line, t.line, accessibility, doc, com)
                    self._emit_rel("class", class_name, t.line, "field", name,
                                   None, CONTAINS)
                    # consume the whole (possibly multi-line, balanced)
                    # initializer so object-literal keys are never
                    # re-scanned as class members
                    i = jj
                    depth = 0
                    while i < end:
                        v = self.v(i)
                        if depth == 0 and v == ";":
                            break
                        if v in ("(", "[", "{"):
                            depth += 1
                        elif v in (")", "]", "}"):
                            if depth == 0:
                                break  # class-body close — leave it
                            depth -= 1
                        if (depth == 0 and i + 1 < end
                                and self.toks[i + 1].line > self.toks[i].line
                                and self.v(i + 1) not in (
                                    ".", "+", "-", "?", ":", "=>", "(",
                                    "[", ",", "=",
                                )):
                            i += 1
                            break
                        i += 1
                    continue
            i += 1

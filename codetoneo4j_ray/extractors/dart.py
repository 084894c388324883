"""Dart extractor.

Ports the reference's Dart analyzer visitor
(``tools/dart-analyzer/lib/src/ast_visitor.dart:9-506``) + the C#-side
record construction (``src/CodeToNeo4j/Technologies/Dart/DartHandler.cs:73-95``)
as a token scanner (no Dart SDK here):

  - symbol key   = ``{fileKey}:{Kind}:{name}:{startLine}``
  - fqn          = ``package:{pkg}/{relPath}::[Class.]name`` — pkg =
    the nearest-ancestor ``pubspec.yaml``'s ``name:`` (basename
    fallback, ``analyzer_service.dart:104-117``), relPath = path
    relative to that project root; files with NO pubspec ancestor keep
    their File record but skip analysis (``DartHandler.cs:34-40``).
    Direct ``extract_file(..., repo_index=None)`` calls (unit tests)
    fall back to pkg ≈ repo with solution-relative paths.
  - namespace    = ``package:{pkg}/{dir}`` (dir '.' for project-root
    files — the visitor does not special-case p.dirname's '.',
    ast_visitor.dart:26-30)
  - accessibility: leading ``_`` → Private; @protected → Protected;
    @visibleForTesting → Internal (ast_visitor.dart:41-49)
  - relationship keys use the visitor's lowercase kinds → dangling at
    materialize, faithfully mirroring the reference
  - INVOKES originate from the *class* (or the file at top level), not
    the enclosing method (ast_visitor.dart:430-485)

Covered: class/mixin/enum/extension/extension-type/typedef, top-level
and member functions/getters/setters/operators, constructors (incl.
named), fields (member and top-level, with DEPENDS_ON to explicitly
declared types), imports, method/ctor invocations (ctor detection is
heuristic: capitalized callee — the visitor has resolved types
instead).

NOT ported from ast_visitor_test.dart: the ``getLine`` resolver
indirection (our lexer carries real line numbers on every token, so
there is no offset→line resolver to delegate to) and the
``containingClass`` field assertions (containment is represented as
CONTAINS relationships + the class-qualified fqn, not a symbol column).
"""

from __future__ import annotations

from codetoneo4j_ray.extractors import accessibility as acc
from codetoneo4j_ray.extractors.base import FileContext
from codetoneo4j_ray.extractors.csharp.lexer import Token, tokenize
from codetoneo4j_ray.functions.text import dirname
from codetoneo4j_ray.schema import CONTAINS, DEPENDS_ON, INVOKES

_DECL_KEYWORDS = frozenset("class mixin enum extension typedef".split())
# keyword-ish names that ARE legal declared types (subset of _NOT_CALLS)
_BUILTIN_TYPES = frozenset("int double bool String num".split())
_NOT_CALLS = frozenset(
    "if while for switch catch return throw assert new const final var late "
    "void int double bool String num await async sync yield else do is as in "
    "super this true false null required covariant static get set operator "
    "factory import export part library show hide on with extends implements".split()
)


def extract_dart(ctx: FileContext, min_accessibility: str, repo_index=None) -> None:
    from codetoneo4j_ray.extractors.typescript import _nearest_root

    ns_dir = dirname(ctx.path)
    ctx.file_namespace_override = ns_dir
    if repo_index is None:
        pkg, rel = ctx.repo, ctx.path
    else:
        hit = _nearest_root(ctx.path, repo_index.pub_roots)
        if hit is None:
            # no pubspec.yaml ancestor → File record only, no analysis
            # (DartHandler.cs:34-40)
            return
        root_dir, name = hit
        pkg = name or (root_dir.rsplit("/", 1)[-1] if root_dir else ctx.repo)
        rel = ctx.path[len(root_dir) + 1:] if root_dir else ctx.path
    toks = [t for t in tokenize(ctx.content) if t.kind not in ("comment", "doc")]
    trivia = _doc_map(ctx.content)
    s = _DartScanner(ctx, toks, trivia, min_accessibility, pkg, rel)
    s.scan(0, len(toks), current_class=None, class_kind=None)


def _doc_map(content: str) -> dict[int, str]:
    """line → '///' doc comment text (lexeme lines joined by newline)."""
    out: dict[int, str] = {}
    pending: list[str] = []
    for t in tokenize(content):
        if t.kind == "doc" and t.value.startswith("///"):
            pending.append(t.value)
        elif t.kind in ("comment", "doc"):
            continue
        else:
            if pending:
                out[t.line] = "\n".join(pending)
                pending = []
    return out


class _DartScanner:
    def __init__(self, ctx, toks: list[Token], trivia, min_acc,
                 pkg: str | None = None, rel_path: str | None = None):
        self.ctx = ctx
        self.toks = toks
        self.trivia = trivia
        self.min_acc = min_acc
        self.pkg = pkg if pkg is not None else ctx.repo
        # project-relative path (the visitor's _relativePath,
        # ast_visitor.dart:25): fqn/namespace + relationship from-names
        self.rel_path = rel_path if rel_path is not None else ctx.path

    def v(self, i):
        return self.toks[i].value if 0 <= i < len(self.toks) else ""

    def k(self, i):
        return self.toks[i].kind if 0 <= i < len(self.toks) else ""

    def _bal(self, i, o, c):
        depth = 0
        while i < len(self.toks):
            vv = self.v(i)
            if vv == o:
                depth += 1
            elif vv == c:
                depth -= 1
                if depth == 0:
                    return i
            i += 1
        return len(self.toks) - 1

    def _block_end(self, i):
        j = i
        while j < len(self.toks) and self.v(j) not in ("{", ";", "=>"):
            j += 1
        if self.v(j) == "{":
            close = self._bal(j, "{", "}")
            return close, self.toks[close].line
        if self.v(j) == "=>":
            while j < len(self.toks) and self.v(j) != ";":
                j += 1
        return j, (self.toks[j].line if j < len(self.toks) else 1)

    def _annotations_before(self, i, start):
        anns = []
        b = i - 1
        while b >= start:
            if self.k(b) == "id" and self.v(b).startswith("@"):
                anns.append(self.v(b)[1:])
                b -= 1
                continue
            if self.v(b) == ")":
                depth, b2 = 0, b
                while b2 >= start:
                    if self.v(b2) == ")":
                        depth += 1
                    elif self.v(b2) == "(":
                        depth -= 1
                        if depth == 0:
                            break
                    b2 -= 1
                if b2 - 1 >= start and self.v(b2 - 1).startswith("@"):
                    anns.append(self.v(b2 - 1)[1:])
                    b = b2 - 2
                    continue
            break
        return anns

    def _accessibility(self, name: str, anns) -> str:
        if "protected" in anns:
            return "Protected"
        if "visibleForTesting" in anns:
            return "Internal"
        return "Private" if name.startswith("_") else "Public"

    def _should_include(self, accessibility: str) -> bool:
        if acc.level(self.min_acc) == acc.NOT_APPLICABLE:
            return True
        return acc.level(accessibility) >= acc.level(self.min_acc)

    def _fqn(self, name, current_class):
        base = f"package:{self.pkg}/{self.rel_path}"
        if current_class:
            return f"{base}::{current_class}.{name}"
        return f"{base}::{name}"

    def _namespace(self):
        # p.dirname of a root-level file is '.' and the visitor keeps it
        # (ast_visitor.dart:26-30)
        return f"package:{self.pkg}/{dirname(self.rel_path) or '.'}"

    def _emit(self, name, kind, class_str, fqn, line, end_line, accessibility, doc,
              containing=None):
        if not self._should_include(accessibility):
            return
        key = f"{self.ctx.file_key}:Dart{kind}:{name}:{line}"
        self.ctx.add_symbol(
            key, name, f"Dart{kind}", class_str, fqn, line, end_line,
            accessibility=accessibility, documentation=doc,
            namespace=self._namespace(),
        )

    def _rel(self, from_kind, from_name, from_line, to_kind, to_name, rel):
        fk = self.ctx.file_key
        from_key = (f"{fk}:{from_kind}:{from_name}:{from_line}"
                    if from_line is not None else f"{fk}:{from_kind}:{from_name}")
        to_key = f"{fk}:{to_kind}:{to_name}"
        self.ctx.add_mention(from_key, rel, to_key)

    # ------------------------------------------------------------------
    def scan(self, start, end, current_class, class_kind):
        i = start
        while i < end:
            t = self.toks[i]
            if self.k(i) != "id":
                i += 1
                continue
            v = t.value
            if v.startswith("@"):
                i += 1
                continue
            anns = self._annotations_before(i, start)
            doc = self.trivia.get(t.line)

            # library/part/export directives (incl. ``part of x;``) emit
            # nothing — the reference visitor has no PartOfDirective /
            # LibraryDirective branch (ast_visitor.dart) — and must not
            # fall through to the declaration matchers, which would
            # misread ``part of my_lib;`` as a typed variable.
            if v in ("library", "part", "export") and current_class is None:
                j = i + 1
                while j < end and self.v(j) != ";":
                    j += 1
                i = j + 1
                continue

            if v == "import" and current_class is None:
                j = i + 1
                uri = None
                while j < end and self.v(j) != ";":
                    if self.k(j) in ("str", "char"):
                        uri = self.toks[j].value.strip("'\"")
                    j += 1
                if uri:
                    self._rel("file", self.rel_path, t.line, "file", uri, DEPENDS_ON)
                i = j + 1
                continue

            head, j = v, i
            if v == "abstract" and self.v(i + 1) == "class":
                head, j = "class", i + 1
            if (head == "extension" and self.v(j + 1) == "type"
                    and self.k(j + 2) == "id"):
                i = self._handle_extension_type(j, anns, doc)
                continue
            if head in _DECL_KEYWORDS and self.k(j + 1) == "id":
                i = self._handle_type(i, j, head, anns, doc)
                continue

            if current_class is None:
                consumed = self._maybe_function(i, anns, doc, None, None)
                if consumed is not None:
                    i = consumed
                    continue
                consumed = self._maybe_toplevel_var(i, anns, doc)
                if consumed is not None:
                    i = consumed
                    continue
                # top-level call (rare): attributed to the file
                if self.v(i + 1) == "(" and v not in _NOT_CALLS:
                    to_kind = "constructor" if v[:1].isupper() else "method"
                    self._rel("file", self.rel_path, t.line, to_kind, v, INVOKES)
            i += 1

    def _handle_extension_type(self, j, anns, doc):
        """``extension type Name(Repr field) [implements ...] {}`` —
        DartExtensionType / 'extensiontype' (ast_visitor.dart extension
        type branch; Dart 3 inline classes)."""
        t = self.toks[j]
        name = self.v(j + 2)
        jj = j + 3
        if self.v(jj) == "<":
            jj = self._bal(jj, "<", ">") + 1
        if self.v(jj) == "(":
            jj = self._bal(jj, "(", ")") + 1
        heritage = []
        if self.v(jj) == "implements":
            jj += 1
            while self.k(jj) == "id":
                heritage.append(self.v(jj))
                jj += 1
                if self.v(jj) == "<":
                    jj = self._bal(jj, "<", ">") + 1
                if self.v(jj) == ",":
                    jj += 1
                else:
                    break
        close, end_line = self._block_end(jj)
        self._emit(name, "ExtensionType", "extensiontype",
                   self._fqn(name, None), t.line, end_line,
                   self._accessibility(name, anns), doc)
        for tname in heritage:
            self._rel("extensiontype", name, t.line, "class", tname, DEPENDS_ON)
        return close + 1

    def _maybe_toplevel_var(self, i, anns, doc):
        """Top-level variable: ``[const|final|late|var]* [Type]? name
        (= …)? ;`` → DartField (ast_visitor.dart top-level variable
        branch). Function declarations never match (they need '(' after
        the name, which _maybe_function already consumed)."""
        t = self.toks[i]
        j = i
        while self.v(j) in ("const", "final", "late", "var", "external"):
            j += 1
        typed_from = None
        if (self.k(j) == "id"
                and (self.v(j) in _BUILTIN_TYPES
                     or self.v(j) not in _NOT_CALLS)
                and (self.k(j + 1) == "id" or self.v(j + 1) == "<")):
            typed_from = j
            if self.v(j + 1) == "<":
                j = self._bal(j + 1, "<", ">") + 1
            else:
                j += 1
            if self.v(j) == "?":
                j += 1
        if j == i and typed_from is None:
            return None  # no modifier and no type → not a declaration
        name = self.v(j)
        if self.k(j) != "id" or name in _NOT_CALLS:
            return None
        if self.v(j + 1) not in ("=", ";", ","):
            return None
        self._emit(name, "Field", "field", self._fqn(name, None),
                   t.line, t.line, self._accessibility(name, anns), doc)
        if typed_from is not None:
            self._rel("field", name, t.line, "class",
                      self.v(typed_from), DEPENDS_ON)
        # multi-variable declarations (``int x = 1, y = 2;``): the
        # reference's visitTopLevelVariableDeclaration iterates
        # node.variables.variables — emit one Field per comma-separated
        # name at initializer depth 0.
        depth = 0
        while j < len(self.toks) and (depth > 0 or self.v(j) != ";"):
            vj = self.v(j)
            if vj in ("(", "[", "{"):
                depth += 1
            elif vj in (")", "]", "}"):
                depth -= 1
            elif (depth == 0 and vj == ","
                  and self.k(j + 1) == "id"
                  and self.v(j + 1) not in _NOT_CALLS
                  and self.v(j + 2) in ("=", ",", ";")):
                nm = self.v(j + 1)
                self._emit(nm, "Field", "field", self._fqn(nm, None),
                           t.line, t.line, self._accessibility(nm, anns), doc)
                if typed_from is not None:
                    self._rel("field", nm, t.line, "class",
                              self.v(typed_from), DEPENDS_ON)
                j += 1
            j += 1
        return j + 1

    def _handle_type(self, i, j, keyword, anns, doc):
        t = self.toks[i]
        name = self.v(j + 1)
        kind = {"class": "Class", "mixin": "Mixin", "enum": "Enum",
                "extension": "Extension", "typedef": "TypeAlias"}[keyword]
        class_str = keyword if keyword != "typedef" else "type"
        jj = j + 2
        if self.v(jj) == "<":
            jj = self._bal(jj, "<", ">") + 1
        heritage = []
        while self.v(jj) in ("extends", "implements", "with", "on"):
            clause = self.v(jj)
            to_kind = "mixin" if clause == "with" else "class"
            jj += 1
            while self.k(jj) == "id":
                tname = self.v(jj)
                jj += 1
                if self.v(jj) == "<":
                    jj = self._bal(jj, "<", ">") + 1
                heritage.append((tname, to_kind))
                if self.v(jj) == ",":
                    jj += 1
                else:
                    break
        if keyword == "typedef":
            while jj < len(self.toks) and self.v(jj) != ";":
                jj += 1
            self._emit(name, kind, class_str, self._fqn(name, None),
                       t.line, self.toks[jj].line if jj < len(self.toks) else t.line,
                       self._accessibility(name, anns), doc)
            return jj + 1
        close, end_line = self._block_end(jj)
        self._emit(name, kind, class_str, self._fqn(name, None), t.line, end_line,
                   self._accessibility(name, anns), doc)
        for tname, to_kind in heritage:
            self._rel(keyword, name, t.line, to_kind, tname, DEPENDS_ON)
        body_open = jj
        while body_open <= close and self.v(body_open) != "{":
            body_open += 1
        if keyword in ("class", "mixin", "extension") and self.v(body_open) == "{":
            self._scan_members(body_open + 1, close, name, keyword)
        return close + 1

    def _maybe_function(self, i, anns, doc, current_class, class_kind):
        """Top-level function / getter / setter: ``RetType? name(…)``."""
        t = self.toks[i]
        j = i
        # optional return type: Ident (possibly generic / nullable)
        if (self.k(j) == "id" and self.k(j + 1) == "id"
                and self.v(j) not in ("get", "set")):
            j2 = j + 1
        elif self.k(j) == "id" and self.v(j + 1) == "<":
            close_t = self._bal(j + 1, "<", ">")
            j2 = close_t + 1
            if self.v(j2) == "?":
                j2 += 1
            if self.k(j2) != "id":
                return None
        else:
            j2 = j
        accessor = None
        if self.v(j2) in ("get", "set") and self.k(j2 + 1) == "id":
            accessor = self.v(j2)
            j2 += 1
        name = self.v(j2)
        if self.k(j2) != "id" or name in _NOT_CALLS:
            return None
        after = j2 + 1
        if self.v(after) == "<":
            after = self._bal(after, "<", ">") + 1
        if accessor == "get":
            if self.v(after) not in ("{", "=>"):
                return None
        elif self.v(after) != "(":
            return None
        close, end_line = self._block_end(after)
        accessibility = self._accessibility(name, anns)
        if accessor:
            self._emit(name, "Property", "property", self._fqn(name, current_class),
                       t.line, end_line, accessibility, doc)
        else:
            self._emit(name, "Function", "function", self._fqn(name, current_class),
                       t.line, end_line, accessibility, doc)
        body_open = after
        while body_open <= close and self.v(body_open) not in ("{", "=>"):
            body_open += 1
        if body_open <= close:
            self._scan_calls(body_open, close, None, None)
        return close + 1

    def _scan_members(self, start, end, class_name, class_kind):
        i = start
        while i < end:
            if self.k(i) != "id":
                i += 1
                continue
            t = self.toks[i]
            v = t.value
            if v.startswith("@"):
                i += 1
                continue
            anns = self._annotations_before(i, start)
            doc = self.trivia.get(t.line)
            mods_end = i
            while self.v(mods_end) in ("static", "final", "const", "late", "covariant",
                                       "external", "factory", "var"):
                mods_end += 1
            j = mods_end

            # constructor: ClassName( or ClassName.named(
            if self.v(j) == class_name:
                if self.v(j + 1) == "(":
                    close, end_line = self._block_end(j + 1)
                    self._emit(class_name, "Constructor", "constructor",
                               self._fqn(class_name, None), t.line, end_line,
                               self._accessibility(class_name, anns), doc)
                    self._rel(class_kind, class_name, t.line, "constructor",
                              class_name, CONTAINS)
                    self._scan_calls(j + 1, close, class_name, class_kind)
                    i = close + 1
                    continue
                if self.v(j + 1) == "." and self.k(j + 2) == "id" and self.v(j + 3) == "(":
                    cname = self.v(j + 2)
                    display = f"{class_name}.{cname}"
                    close, end_line = self._block_end(j + 3)
                    self._emit(display, "Constructor", "constructor",
                               self._fqn(display, None), t.line, end_line,
                               self._accessibility(cname, anns), doc)
                    self._rel(class_kind, class_name, t.line, "constructor",
                              display, CONTAINS)
                    self._scan_calls(j + 3, close, class_name, class_kind)
                    i = close + 1
                    continue

            # getter / setter / method / operator / field
            jj = j
            if (
                self.k(jj) == "id"
                and self.v(jj) not in ("get", "set", "operator")
                and (self.k(jj + 1) == "id" or self.v(jj + 1) == "<")
            ):
                # leading return/field type
                if self.v(jj + 1) == "<":
                    jj = self._bal(jj + 1, "<", ">") + 1
                    if self.v(jj) == "?":
                        jj += 1
                else:
                    jj += 1
            if self.v(jj) == "?" :
                jj += 1
            accessor = None
            if self.v(jj) in ("get", "set") and self.k(jj + 1) == "id":
                accessor = self.v(jj)
                jj += 1
            if self.v(jj) == "operator":
                op = self.v(jj + 1)
                k2 = jj + 2
                while self.v(k2) != "(" and k2 < end:
                    op += self.v(k2)
                    k2 += 1
                close, end_line = self._block_end(k2)
                self._emit(op, "Operator", "operator",
                           self._fqn(f"operator {op}", class_name), t.line, end_line,
                           self._accessibility(op, anns), doc)
                self._rel(class_kind, class_name, t.line, "method", op, CONTAINS)
                self._scan_calls(k2, close, class_name, class_kind)
                i = close + 1
                continue
            name = self.v(jj)
            if self.k(jj) != "id" or name in _NOT_CALLS:
                i += 1
                continue
            after = jj + 1
            if self.v(after) == "<":
                after = self._bal(after, "<", ">") + 1
            if accessor == "get" and self.v(after) in ("{", "=>"):
                close, end_line = self._block_end(after)
                self._emit(name, "Property", "property", self._fqn(name, class_name),
                           t.line, end_line, self._accessibility(name, anns), doc,
                           containing=class_name)
                self._rel(class_kind, class_name, t.line, "property", name, CONTAINS)
                self._scan_calls(after, close, class_name, class_kind)
                i = close + 1
                continue
            if self.v(after) == "(":
                kind = "Property" if accessor else "Method"
                class_str = "property" if accessor else "method"
                close, end_line = self._block_end(after)
                self._emit(name, kind, class_str, self._fqn(name, class_name),
                           t.line, end_line, self._accessibility(name, anns), doc,
                           containing=class_name)
                self._rel(class_kind, class_name, t.line, class_str, name, CONTAINS)
                self._scan_calls(after, close, class_name, class_kind)
                i = close + 1
                continue
            # a consumed declaration modifier (final/const/late/...)
            # already proves this is a field even without an explicit
            # type — idiomatic Dart writes `final x = 1;`
            if (jj > mods_end or mods_end > i) and self.v(after) in ("=", ";", ","):
                # field declarator(s)
                self._emit(name, "Field", "field", self._fqn(name, class_name),
                           t.line, t.line, self._accessibility(name, anns), doc,
                           containing=class_name)
                self._rel(class_kind, class_name, t.line, "field", name, CONTAINS)
                if jj > mods_end and self.k(mods_end) == "id":
                    # explicitly typed field → DEPENDS_ON its type
                    # (ast_visitor.dart field-type dependency)
                    self._rel("field", name, t.line, "class",
                              self.v(mods_end), DEPENDS_ON)
                while i < end and self.v(i) != ";":
                    i += 1
                continue
            i += 1

    def _scan_calls(self, start, end, class_name, class_kind):
        """INVOKES from the class (or file) — ast_visitor.dart:430-485."""
        from_name = class_name if class_name else self.rel_path
        from_kind = class_kind if class_name else "file"
        seen = set()
        i = start
        while i < end:
            if self.k(i) == "id" and self.v(i + 1) == "(":
                v = self.toks[i].value
                if v not in _NOT_CALLS and not v.startswith("@"):
                    # dotted receiver calls emit too — the reference
                    # visitor records MethodInvocation regardless of
                    # target (ast_visitor.dart:430-485)
                    to_kind = "constructor" if v[:1].isupper() else "method"
                    sig = (v, to_kind, self.toks[i].line)
                    if sig not in seen:
                        seen.add(sig)
                        self._rel(from_kind, from_name, self.toks[i].line,
                                  to_kind, v, INVOKES)
            i += 1

"""C# declaration-level parser.

Parses a token stream into namespaces / type declarations / members with
enough structure to reproduce Roslyn symbol keys: names, arity, parameter
types, modifiers, line spans, leading doc/comment trivia, and captured
method-body token ranges for call-site scanning. Statement-level syntax
inside bodies is NOT parsed (only scanned for invocations).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from codetoneo4j_ray.extractors.csharp.lexer import Token, tokenize
from codetoneo4j_ray.extractors.csharp.types import TypeRef

MODIFIERS = frozenset(
    "public private protected internal static readonly virtual override abstract "
    "sealed async partial extern unsafe new const volatile required ref file".split()
)

TYPE_KEYWORDS = frozenset("class struct interface enum record delegate".split())

PARAM_MODIFIERS = frozenset("ref out in params this scoped readonly".split())

PREDEFINED = frozenset(
    "bool byte sbyte char decimal double float int uint long ulong short ushort "
    "object string void dynamic nint nuint var".split()
)

_NOT_CALL_KEYWORDS = frozenset(
    "if while for foreach switch catch using lock return throw typeof sizeof "
    "default checked unchecked when is as in out ref new else do yield await "
    "case fixed stackalloc".split()
)


@dataclass
class CsUsing:
    text: str                  # qualified name as written
    is_global: bool = False
    is_static: bool = False
    alias: str | None = None
    line: int = 0


@dataclass
class CsParam:
    modifiers: list[str]
    type: TypeRef | None
    name: str


@dataclass
class CsMember:
    kind: str                  # method|ctor|dtor|property|indexer|field|event|enum_member|operator|conversion
    name: str
    modifiers: list[str]
    type: TypeRef | None       # return / property / field / event type
    params: list[CsParam] | None
    type_params: list[str]
    start_line: int
    end_line: int
    doc: str | None
    comments: str | None
    body: tuple[int, int] | None   # [start, end) indices into CsFileParse.code
    explicit_iface: str | None = None  # "IFoo" for explicit interface impls
    op_token: str | None = None        # operator symbol text for operators


@dataclass
class CsTypeDecl:
    kind: str                  # class|struct|interface|enum|record|record_struct|delegate
    name: str
    type_params: list[str]
    modifiers: list[str]
    bases: list[TypeRef]
    namespace: str
    containing: tuple[str, ...]       # containing type names, outermost first
    members: list[CsMember] = field(default_factory=list)
    nested: list["CsTypeDecl"] = field(default_factory=list)
    start_line: int = 0
    end_line: int = 0
    doc: str | None = None
    comments: str | None = None
    delegate_params: list[CsParam] | None = None
    delegate_return: TypeRef | None = None


@dataclass
class CsFileParse:
    usings: list[CsUsing]
    types: list[CsTypeDecl]    # all types, nested included (flattened), in source order
    code: list[Token]          # trivia-free token list (bodies index into this)


def parse_csharp(src: str) -> CsFileParse:
    toks = tokenize(src)
    code: list[Token] = []
    # sparse trivia map {code index: [comment tokens before it]} — most
    # code tokens have no leading trivia, so a dict beats a parallel
    # list of (mostly empty) per-token lists
    lead: dict[int, list[Token]] = {}
    pending: list[Token] | None = None
    append = code.append
    for t in toks:
        k = t.kind
        if k == "comment" or k == "doc":
            if pending is None:
                pending = [t]
            else:
                pending.append(t)
        else:
            if pending is not None:
                lead[len(code)] = pending
                pending = None
            append(t)
    p = _Parser(code, lead)
    p.parse_unit()
    return CsFileParse(p.usings, p.types, code)


class _Parser:
    def __init__(self, code: list[Token], lead: dict[int, list[Token]]):
        self.code = code
        # hot-path parallel value list: tok()/val() together are called
        # ~24M times per 13k-file corpus, so each is one list index
        # against a cached length instead of a method chain over
        # NamedTuple attributes (~25% of parse CPU before)
        self.vals = [t.value for t in code]
        self.n = len(code)
        self.lead = lead
        self.i = 0
        self.usings: list[CsUsing] = []
        self.types: list[CsTypeDecl] = []

    # ---- primitives ---------------------------------------------------
    def tok(self, k: int = 0) -> Token | None:
        j = self.i + k
        return self.code[j] if j < self.n else None

    def val(self, k: int = 0) -> str:
        j = self.i + k
        return self.vals[j] if j < self.n else ""

    def at_end(self) -> bool:
        return self.i >= self.n

    def advance(self) -> Token | None:
        i = self.i
        self.i = i + 1
        return self.code[i] if i < self.n else None

    def accept(self, value: str) -> bool:
        i = self.i
        if i < self.n and self.vals[i] == value:
            self.i = i + 1
            return True
        return False

    def skip_balanced(self, open_c: str, close_c: str) -> tuple[int, int]:
        """At an opener: skip to matching closer; returns [start, end) span."""
        start = self.i
        vals = self.vals
        n = self.n
        i = start
        depth = 0
        while i < n:
            v = vals[i]
            if v == open_c:
                depth += 1
            elif v == close_c:
                depth -= 1
                if depth == 0:
                    i += 1
                    self.i = i
                    return (start, i)
            i += 1
        self.i = i
        return (start, i)

    def skip_to(self, *values: str) -> None:
        depth = 0
        while not self.at_end():
            v = self.val()
            if depth == 0 and v in values:
                return
            if v in "([{":
                depth += 1
            elif v in ")]}":
                depth = max(0, depth - 1)
            self.i += 1

    def leading_trivia(self) -> tuple[str | None, str | None]:
        """(doc, comments) from the trivia before the current token —
        SymbolMapper.ExtractComments semantics: '//'/'/*' trivia trimmed and
        '\\n'-joined; '///'-doc lines aggregated separately."""
        trivia = self.lead.get(self.i, ())
        comments = [
            t.value.strip() for t in trivia if t.kind == "comment"
        ]
        doc_lines: list[str] = []
        for t in trivia:
            if t.kind != "doc":
                continue
            if t.value.startswith("///"):
                line = t.value[3:]
                if line.startswith(" "):
                    line = line[1:]
                doc_lines.append(line.rstrip())
            else:  # /** ... */
                inner = t.value[3:-2] if t.value.endswith("*/") else t.value[3:]
                for raw in inner.split("\n"):
                    doc_lines.append(raw.strip(" *\t"))
        doc = "\n".join(doc_lines) if doc_lines else None
        return doc, ("\n".join(comments) if comments else None)

    # ---- compilation unit ---------------------------------------------
    def parse_unit(self) -> None:
        ns = ""
        while not self.at_end():
            v = self.val()
            if v == "using" or (v == "global" and self.val(1) == "using"):
                self.parse_using()
            elif v == "namespace":
                done = self.parse_namespace(ns)
                if done is not None:
                    ns = done  # file-scoped namespace
            elif v == "extern":
                self.skip_to(";")
                self.accept(";")
            elif v == "[":
                self.skip_balanced("[", "]")
            elif v == ";":
                self.i += 1
            elif v in MODIFIERS or v in TYPE_KEYWORDS:
                self.parse_type_decl(ns, ())
            else:
                self.i += 1  # tolerate top-level statements / junk

    def parse_using(self) -> None:
        line = self.tok().line
        is_global = self.accept("global")
        self.accept("using")
        is_static = self.accept("static")
        # possible alias:  using X = A.B.C;
        alias = None
        if self.tok() and self.tok().kind == "id" and self.val(1) == "=":
            alias = self.advance().value
            self.advance()  # '='
        parts: list[str] = []
        while not self.at_end() and self.val() != ";":
            t = self.advance()
            if t.kind == "id":
                parts.append(t.value)
            elif t.value in (".", "::"):
                parts.append(".")
            elif t.value == "<":
                # generic in using static/alias target: fold into text
                self.i -= 1
                span = self.skip_balanced("<", ">")
                parts.append(
                    "<" + "".join(x.value for x in self.code[span[0] + 1 : span[1] - 1]) + ">"
                )
        self.accept(";")
        text = "".join(parts).replace("..", ".")
        self.usings.append(CsUsing(text, is_global, is_static, alias, line))

    def parse_namespace(self, outer_ns: str) -> str | None:
        self.accept("namespace")
        parts = []
        while self.tok() and (self.tok().kind == "id" or self.val() == "."):
            parts.append(self.advance().value)
        name = "".join(parts)
        full = f"{outer_ns}.{name}" if outer_ns else name
        if self.accept(";"):
            return full  # file-scoped
        if self.accept("{"):
            while not self.at_end() and self.val() != "}":
                v = self.val()
                if v == "using":
                    self.parse_using()
                elif v == "namespace":
                    self.parse_namespace(full)
                elif v == "[" :
                    self.skip_balanced("[", "]")
                elif v == ";":
                    self.i += 1
                elif v in MODIFIERS or v in TYPE_KEYWORDS:
                    self.parse_type_decl(full, ())
                else:
                    self.i += 1
            self.accept("}")
        return None

    # ---- type declarations --------------------------------------------
    def parse_type_decl(self, ns: str, containing: tuple[str, ...]) -> CsTypeDecl | None:
        doc, comments = self.leading_trivia()
        start_tok = self.tok()
        while self.val() == "[":
            self.skip_balanced("[", "]")
        mods: list[str] = []
        while self.val() in MODIFIERS and not (
            self.val() == "ref" and self.val(1) not in ("struct", "partial")
        ):
            mods.append(self.advance().value)
        kw = self.val()
        if kw not in TYPE_KEYWORDS:
            self.skip_to(";", "{", "}")
            return None
        self.advance()
        kind = kw
        if kw == "record":
            if self.val() in ("class", "struct"):
                sub = self.advance().value
                kind = "record_struct" if sub == "struct" else "record"
        if kw == "delegate":
            return self.parse_delegate(ns, containing, mods, doc, comments, start_tok)
        name_t = self.advance()
        if name_t is None or name_t.kind != "id":
            self.skip_to(";", "{", "}")
            return None
        type_params = self.parse_type_params()
        decl = CsTypeDecl(
            kind, name_t.value.lstrip("@"), type_params, mods, [], ns, containing,
            start_line=start_tok.line, doc=doc, comments=comments,
        )
        # record primary constructor parameter list
        if self.val() == "(":
            self.parse_params(")")
        if self.accept(":"):
            while not self.at_end() and self.val() not in ("{", ";") and self.val() != "where":
                t = parse_type_ref(self)
                if t is None:
                    self.i += 1
                    continue
                decl.bases.append(t)
                if self.val() == "(":  # base ctor args on records
                    self.skip_balanced("(", ")")
                if not self.accept(","):
                    break
        while self.val() == "where":
            # step past 'where' BEFORE skipping, or skip_to returns
            # immediately (cursor already on a stop token) and the
            # constraint tokens leak into the body parse
            self.advance()
            self.skip_to("{", ";", "where")
        self.types.append(decl)
        if kind == "enum":
            self.parse_enum_body(decl)
        elif self.accept("{"):
            while not self.at_end() and self.val() != "}":
                m = self.parse_member(decl)
                if m == "nested":
                    pass
            end_t = self.tok()
            decl.end_line = end_t.line if end_t else (self.code[-1].line if self.code else 0)
            self.accept("}")
            self.accept(";")
        else:
            self.accept(";")
            decl.end_line = decl.start_line
        if decl.end_line == 0:
            decl.end_line = decl.start_line
        return decl

    def parse_delegate(self, ns, containing, mods, doc, comments, start_tok) -> CsTypeDecl:
        ret = parse_type_ref(self)
        name_t = self.advance()
        name = name_t.value.lstrip("@") if name_t else "?"
        type_params = self.parse_type_params()
        params = self.parse_params(")") if self.val() == "(" else []
        self.skip_to(";")
        end_t = self.tok()
        self.accept(";")
        decl = CsTypeDecl(
            "delegate", name, type_params, mods, [], ns, containing,
            start_line=start_tok.line,
            end_line=end_t.line if end_t else start_tok.line,
            doc=doc, comments=comments,
            delegate_params=params, delegate_return=ret,
        )
        self.types.append(decl)
        return decl

    def parse_type_params(self) -> list[str]:
        if self.val() != "<":
            return []
        span = self.skip_balanced("<", ">")
        names = []
        expect_name = True
        depth = 0
        for t in self.code[span[0] + 1 : span[1] - 1]:
            if t.value == "<":
                depth += 1
            elif t.value == ">":
                depth -= 1
            elif depth == 0:
                if t.value == ",":
                    expect_name = True
                elif t.kind == "id" and t.value not in ("in", "out") and expect_name:
                    names.append(t.value.lstrip("@"))
                    expect_name = False
        return names

    def parse_enum_body(self, decl: CsTypeDecl) -> None:
        if not self.accept("{"):
            self.accept(";")
            decl.end_line = decl.start_line
            return
        while not self.at_end() and self.val() != "}":
            doc, comments = self.leading_trivia()
            while self.val() == "[":
                self.skip_balanced("[", "]")
            t = self.tok()
            if t is None or t.kind != "id":
                self.i += 1
                continue
            self.advance()
            member = CsMember(
                "enum_member", t.value.lstrip("@"), [], None, None, [],
                t.line, t.line, doc, comments, None,
            )
            decl.members.append(member)
            if self.accept("="):
                self.skip_to(",", "}")
            self.accept(",")
        end_t = self.tok()
        decl.end_line = end_t.line if end_t else decl.start_line
        self.accept("}")
        self.accept(";")

    # ---- members -------------------------------------------------------
    def parse_member(self, decl: CsTypeDecl) -> str | None:
        doc, comments = self.leading_trivia()
        start_tok = self.tok()
        if start_tok is None:
            return None
        save = self.i
        while self.val() == "[":
            self.skip_balanced("[", "]")
        mods: list[str] = []
        while self.val() in MODIFIERS:
            # 'ref' may start a ref-return type; only treat as modifier before
            # other modifiers/struct keywords — heuristic: 'ref' followed by a
            # type keyword or 'readonly' is a modifier, else part of the type.
            if self.val() == "ref" and self.val(1) not in ("readonly",) and self.val(1) not in TYPE_KEYWORDS:
                break
            if self.val() == "new" and self.val(1) == "(":
                break
            mods.append(self.advance().value)
        v = self.val()
        if v in TYPE_KEYWORDS or (v == "record" ):
            self.i = save
            nested = self._parse_nested_type(decl)
            return "nested" if nested else None
        if v == "event":
            self.advance()
            return self._parse_event(decl, mods, start_tok, doc, comments)
        if v in ("implicit", "explicit") and self.val(1) == "operator":
            self.advance()
            self.advance()
            conv_kind = v  # implicit / explicit
            target = parse_type_ref(self)
            params = self.parse_params(")") if self.val() == "(" else []
            body, end_line = self._member_tail()
            m = CsMember(
                "conversion", "op_Implicit" if conv_kind == "implicit" else "op_Explicit",
                mods, target, params, [], start_tok.line, end_line, doc, comments, body,
                op_token=conv_kind,
            )
            decl.members.append(m)
            return None
        if v == "~":
            self.advance()
            self.advance()  # type name
            if self.val() == "(":
                self.parse_params(")")
            body, end_line = self._member_tail()
            decl.members.append(
                CsMember("dtor", "Finalize", mods, None, [], [],
                         start_tok.line, end_line, doc, comments, body)
            )
            return None
        # constructor?
        t = self.tok()
        if t is not None and t.kind == "id" and t.value.lstrip("@") == decl.name and self.val(1) == "(":
            self.advance()
            params = self.parse_params(")")
            if self.accept(":"):  # : this(...) / : base(...)
                self.advance()  # this/base
                if self.val() == "(":
                    self.skip_balanced("(", ")")
            body, end_line = self._member_tail()
            decl.members.append(
                CsMember("ctor", ".ctor", mods, None, params, [],
                         start_tok.line, end_line, doc, comments, body)
            )
            return None
        # member with a leading type
        mtype = parse_type_ref(self)
        if mtype is None:
            self.skip_to(";", "}")
            self.accept(";")
            return None
        if self.val() == "operator":
            self.advance()
            op_parts = []
            while self.val() != "(" and not self.at_end():
                op_parts.append(self.advance().value)
            op = "".join(op_parts)
            params = self.parse_params(")") if self.val() == "(" else []
            body, end_line = self._member_tail()
            decl.members.append(
                CsMember("operator", _operator_metadata_name(op), mods, mtype, params,
                         [], start_tok.line, end_line, doc, comments, body, op_token=op)
            )
            return None
        if self.val() == "this":
            self.advance()
            params = self.parse_params("]") if self.val() == "[" else []
            body, end_line = self._property_tail()
            decl.members.append(
                CsMember("indexer", "this[]", mods, mtype, params, [],
                         start_tok.line, end_line, doc, comments, body)
            )
            return None
        # name — possibly qualified (explicit interface implementation)
        name_parts: list[str] = []
        while self.tok() and self.tok().kind == "id":
            name_parts.append(self.advance().value.lstrip("@"))
            if self.val() == "<" and self.val_is_generic_then(("(", ".", "{", "=>")):
                tp = self.parse_type_params()
                if self.val() == ".":
                    name_parts[-1] += "<" + ",".join(tp) + ">"
                    self.advance()
                    continue
                # generic method
                name = name_parts[-1]
                explicit = ".".join(name_parts[:-1]) or None
                if self.val() == "(":
                    params = self.parse_params(")")
                    self._skip_constraints()
                    body, end_line = self._member_tail()
                    decl.members.append(
                        CsMember("method", name, mods, mtype, params, tp,
                                 start_tok.line, end_line, doc, comments, body,
                                 explicit_iface=explicit)
                    )
                    return None
            if self.val() == ".":
                self.advance()
                continue
            break
        if not name_parts:
            self.skip_to(";", "}")
            self.accept(";")
            return None
        name = name_parts[-1]
        explicit = ".".join(name_parts[:-1]) or None
        v = self.val()
        if v == "(":
            params = self.parse_params(")")
            self._skip_constraints()
            body, end_line = self._member_tail()
            decl.members.append(
                CsMember("method", name, mods, mtype, params, [],
                         start_tok.line, end_line, doc, comments, body,
                         explicit_iface=explicit)
            )
            return None
        if v in ("{", "=>"):
            body, end_line = self._property_tail()
            decl.members.append(
                CsMember("property", name, mods, mtype, None, [],
                         start_tok.line, end_line, doc, comments, body,
                         explicit_iface=explicit)
            )
            return None
        # field declarator list
        names = [(name, start_tok.line)]
        if self.accept("="):
            self.skip_initializer()
        while self.accept(","):
            nt = self.tok()
            if nt is None or nt.kind != "id":
                break
            self.advance()
            names.append((nt.value.lstrip("@"), nt.line))
            if self.accept("="):
                self.skip_initializer()
        end_t = self.tok()
        end_line = end_t.line if end_t else start_tok.line
        self.accept(";")
        for idx, (fname, fline) in enumerate(names):
            # Roslyn maps the field symbol to its *declarator* node: the
            # first declarator starts at the declaration (RoslynSymbolProcessor
            # passes the variable declarator, whose own span is one line here)
            decl.members.append(
                CsMember("field", fname, mods, mtype, None, [],
                         fline, fline, doc if idx == 0 else None,
                         comments if idx == 0 else None, None)
            )
        return None

    def skip_initializer(self) -> None:
        """skip_to(',', ';') that also jumps validated '<...>' generic
        argument lists — the comma inside 'new Dictionary<string, int>()'
        must not end the field declarator. A '<' that cannot be matched
        as a generic list (i.e. a comparison operator) is treated as an
        ordinary token, so 'x = a < b ? 1 : 2' still stops at ';'."""
        depth = 0
        while not self.at_end():
            v = self.val()
            if depth == 0 and v in (",", ";"):
                return
            if v == "<":
                j = self._match_generic(self.i)
                if j is not None:
                    self.i = j + 1
                    continue
            if v in "([{":
                depth += 1
            elif v in ")]}":
                depth = max(0, depth - 1)
            self.i += 1

    def _match_generic(self, i: int, limit: int = 64) -> int | None:
        """Index of the '>' closing a generic argument list opening at
        ``i``, or None if the span does not look like one (only type-ish
        tokens allowed inside; bounded lookahead)."""
        depth = 0
        j = i
        code = self.code
        n = self.n
        while j < n and j - i <= limit:
            t = code[j]
            v = t.value
            if v == "<":
                depth += 1
            elif v == ">":
                depth -= 1
                if depth == 0:
                    return j
            elif t.kind != "id" and v not in (",", ".", "[", "]", "?", "::"):
                return None
            j += 1
        return None

    def val_is_generic_then(self, follow: tuple[str, ...]) -> bool:
        """Lookahead: '<'...'>' followed by one of `follow` (cheap scan)."""
        j = self.i
        vals = self.vals
        n = self.n
        if vals[j] != "<":
            return False
        depth = 0
        while j < n:
            v = vals[j]
            if v == "<":
                depth += 1
            elif v == ">":
                depth -= 1
                if depth == 0:
                    nxt = vals[j + 1] if j + 1 < n else ""
                    return nxt in follow
            elif v in (";", "{", ")"):
                return False
            j += 1
        return False

    def _parse_nested_type(self, decl: CsTypeDecl) -> CsTypeDecl | None:
        nested = self.parse_type_decl(
            decl.namespace, decl.containing + (decl.name,)
        )
        if nested is not None:
            decl.nested.append(nested)
        return nested

    def _parse_event(self, decl, mods, start_tok, doc, comments) -> None:
        etype = parse_type_ref(self)
        names = []
        while self.tok() and self.tok().kind == "id":
            names.append((self.advance().value.lstrip("@"), start_tok.line))
            if self.val() == "=":
                self.advance()
                self.skip_to(",", ";", "{")
            if not self.accept(","):
                break
        if self.val() == "{":
            span = self.skip_balanced("{", "}")
            end_line = self.code[span[1] - 1].line
            for n, _ln in names[:1]:
                decl.members.append(
                    CsMember("event", n, mods, etype, None, [],
                             start_tok.line, end_line, doc, comments, None)
                )
            return None
        end_t = self.tok()
        end_line = end_t.line if end_t else start_tok.line
        self.accept(";")
        for idx, (n, ln) in enumerate(names):
            decl.members.append(
                CsMember("event", n, mods, etype, None, [],
                         ln, ln, doc if idx == 0 else None,
                         comments if idx == 0 else None, None)
            )
        return None

    def _skip_constraints(self) -> None:
        while self.val() == "where":
            self.advance()  # past 'where' first — see parse_type_decl
            self.skip_to("{", ";", "=>", "where")

    def _member_tail(self) -> tuple[tuple[int, int] | None, int]:
        """Method-ish tail: '{...}' | '=> expr ;' | ';'. Returns (body span, end line)."""
        if self.val() == "{":
            span = self.skip_balanced("{", "}")
            return span, self.code[span[1] - 1].line
        if self.val() == "=>":
            self.advance()
            start = self.i
            self.skip_to(";")
            end = self.i
            end_t = self.tok()
            self.accept(";")
            fallback = self.code[start].line if start < len(self.code) else 0
            return (start, end), (end_t.line if end_t else fallback)
        end_t = self.tok()
        self.accept(";")
        return None, (end_t.line if end_t else 0)

    def _property_tail(self) -> tuple[tuple[int, int] | None, int]:
        """Property tail: accessor block (+ optional initializer) or => expr;.
        Bodies are not scanned for INVOKES (the reference only walks
        BaseMethodDeclarationSyntax bodies — MemberDependencyExtractor.cs:21-25)."""
        if self.val() == "{":
            span = self.skip_balanced("{", "}")
            end_line = self.code[span[1] - 1].line
            if self.accept("="):
                self.skip_to(";")
                end_t = self.tok()
                if end_t:
                    end_line = end_t.line
                self.accept(";")
            return None, end_line
        if self.val() == "=>":
            self.advance()
            self.skip_to(";")
            end_t = self.tok()
            self.accept(";")
            return None, (end_t.line if end_t else 0)
        end_t = self.tok()
        self.accept(";")
        return None, (end_t.line if end_t else 0)

    def parse_params(self, closer: str) -> list[CsParam]:
        opener = "(" if closer == ")" else "["
        if self.val() != opener:
            return []
        self.advance()
        params: list[CsParam] = []
        while not self.at_end() and self.val() != closer:
            while self.val() == "[":
                self.skip_balanced("[", "]")
            mods = []
            while self.val() in PARAM_MODIFIERS and not (
                self.val() == "in" and self.val(1) in (",", closer)
            ):
                if self.val() == "readonly" and "ref" not in mods:
                    break
                mods.append(self.advance().value)
            ptype = parse_type_ref(self)
            pname = ""
            if self.tok() and self.tok().kind == "id":
                pname = self.advance().value.lstrip("@")
            if self.accept("="):
                self.skip_to(",", closer)
            params.append(CsParam(mods, ptype, pname))
            if not self.accept(","):
                break
        self.accept(closer)
        return params


def _operator_metadata_name(op: str) -> str:
    return {
        "+": "op_Addition", "-": "op_Subtraction", "*": "op_Multiply",
        "/": "op_Division", "%": "op_Modulus", "==": "op_Equality",
        "!=": "op_Inequality", ">": "op_GreaterThan", "<": "op_LessThan",
        ">=": "op_GreaterThanOrEqual", "<=": "op_LessThanOrEqual",
        "!": "op_LogicalNot", "~": "op_OnesComplement", "++": "op_Increment",
        "--": "op_Decrement", "&": "op_BitwiseAnd", "|": "op_BitwiseOr",
        "^": "op_ExclusiveOr", "<<": "op_LeftShift", ">>": "op_RightShift",
        "true": "op_True", "false": "op_False",
    }.get(op, f"op_{op}")


def parse_type_ref(p: _Parser) -> TypeRef | None:
    """Parse one type reference at the cursor; None if not a type."""
    t = p.tok()
    if t is None:
        return None
    if t.value == "(":
        # tuple type
        p.advance()
        elements: list[tuple[TypeRef, str]] = []
        while not p.at_end() and p.val() != ")":
            et = parse_type_ref(p)
            if et is None:
                p.skip_to(",", ")")
            else:
                name = ""
                if p.tok() and p.tok().kind == "id" and p.val(1) in (",", ")"):
                    name = p.advance().value
                elements.append((et, name))
            if not p.accept(","):
                break
        p.accept(")")
        base = TypeRef(form="tuple", elements=elements)
        return _type_suffixes(p, base)
    if t.kind != "id":
        return None
    if t.value in ("ref",):
        p.advance()
        p.accept("readonly")
        return parse_type_ref(p)
    parts: list[str] = []
    args: list[TypeRef] = []
    # global:: alias qualifier
    if t.value == "global" and p.val(1) == "::":
        p.advance()
        p.advance()
        t = p.tok()
        if t is None or t.kind != "id":
            return None
    while True:
        t = p.tok()
        if t is None or t.kind != "id":
            break
        parts.append(t.value)
        p.advance()
        if p.val() == "<" and p.val_is_generic_ok():
            args = _parse_type_args(p)
            if p.val() == "." or p.val() == "::":
                # generic non-final part (Outer<int>.Inner): flatten as written
                parts[-1] += "<" + ", ".join(a.written() for a in args) + ">"
                args = []
                p.advance()
                continue
            break
        if p.val() in (".", "::"):
            p.advance()
            continue
        break
    if not parts:
        return None
    base = TypeRef(form="named", parts=parts, args=args)
    return _type_suffixes(p, base)


def _parse_type_args(p: _Parser) -> list[TypeRef]:
    p.advance()  # '<'
    args: list[TypeRef] = []
    if p.val() == ">":  # open generic List<>
        p.advance()
        return args
    while not p.at_end():
        a = parse_type_ref(p)
        if a is None:
            p.skip_to(",", ">")
        else:
            args.append(a)
        if p.accept(","):
            continue
        p.accept(">")
        break
    return args


def _type_suffixes(p: _Parser, base: TypeRef) -> TypeRef:
    while True:
        v = p.val()
        if v == "?":
            # avoid consuming conditional '?': only treat as nullable when
            # followed by type-ish continuation or declaration-ish token
            base = TypeRef(form="nullable", inner=base)
            p.advance()
        elif v == "[":
            # array rank specifier: '[' (',')* ']'
            j = p.i + 1
            rank = 1
            ok = True
            while j < len(p.code):
                vv = p.code[j].value
                if vv == ",":
                    rank += 1
                elif vv == "]":
                    break
                else:
                    ok = False
                    break
                j += 1
            if not ok or j >= len(p.code):
                break
            p.i = j + 1
            base = TypeRef(form="array", inner=base, rank=rank)
        elif v == "*":
            base = TypeRef(form="pointer", inner=base)
            p.advance()
        else:
            break
    return base


def _val_is_generic_ok(self) -> bool:
    """'<' starts type args if the balanced run contains only type-ish tokens."""
    j = self.i
    depth = 0
    while j < len(self.code):
        v = self.code[j].value
        t = self.code[j]
        if v == "<":
            depth += 1
        elif v == ">":
            depth -= 1
            if depth == 0:
                return True
        elif t.kind == "id" or v in (",", ".", "?", "[", "]", "*", "::", "(", ")"):
            pass
        else:
            return False
        j += 1
    return False


_Parser.val_is_generic_ok = _val_is_generic_ok

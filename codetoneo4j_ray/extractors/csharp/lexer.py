"""C# tokenizer.

Produces a flat token list with 1-based line numbers. Comment trivia is
kept as tokens (kind 'comment' / 'doc') so the parser can attach leading
trivia to declarations the way Roslyn does
(``Graph/Mapping/SymbolMapper.cs:65-77``). Interpolated strings are
lexed as single opaque 'str' tokens (brace/quote nesting tracked);
preprocessor directives are dropped.

The scanner is a compiled master-regex anchored-match loop (one C-level
match per token) — the char-by-char loop it replaced was ~33% of
stage-1 extraction CPU. String/char/template literals keep the custom
nesting-aware scanners (interpolation holes can't be regular).
Token-stream equivalence with the straightforward reference scanner is
pinned by tests/test_lexer_equivalence.py over the synthetic corpus and
the reference repo's real C#/TS/Dart trees.
"""

from __future__ import annotations

import re
from typing import NamedTuple

PUNCT_3 = ("<<=", ">>=", "??=", "...", ">>>")
PUNCT_2 = (
    "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "?.", "::",
    "++", "--", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<",
)
# NOTE: '>>' deliberately lexed as two '>' so nested generics close cleanly.


class Token(NamedTuple):
    kind: str   # 'id' | 'punct' | 'str' | 'char' | 'num' | 'comment' | 'doc'
    value: str
    line: int


def _is_id_start(c: str) -> bool:
    return c.isalpha() or c == "_" or c == "@"


def _is_id_part(c: str) -> bool:
    return c.isalnum() or c == "_"


# Master token pattern. Alternation order mirrors the reference
# scanner's branch order for every same-start ambiguity: comments
# before '/'-punct, '...'-punct only when the num alternative's
# (?=[0-9]) lookahead fails, PUNCT_3 before PUNCT_2 (first-match
# alternation = longest-first for these fixed sets). Group positions
# are the dispatch keys below; string/char/template starts ("'`$@) are
# handled before the regex because their ends are not regular
# (interpolation-hole nesting).
_MASTER = re.compile(
    "(?P<ws>[ \t\r\f\v\u00a0\ufeff\n]+)"
    "|(?P<id>[A-Za-z_][A-Za-z0-9_]*)"
    "|(?P<num>(?:[0-9]|\\.(?=[0-9]))(?:[0-9A-Za-z._]|(?<=[eE])[+-])*)"
    "|(?P<lc>//[^\n]*)"
    "|(?P<bc>/\\*(?:[^*]|\\*(?!/))*(?:\\*/)?)"
    "|(?P<pp>#[^\n]*)"
    "|(?P<p>" + "|".join(re.escape(p) for p in PUNCT_3 + PUNCT_2) + ")"
    "|(?P<any>[\\s\\S])"
)
_G_WS, _G_ID, _G_NUM, _G_LC, _G_BC, _G_PP, _G_P, _G_ANY = range(1, 9)
_AT_ID = re.compile("@[A-Za-z0-9_]*")
_NL = re.compile("\n")
# chars whose token end is context-dependent: custom scanners below
_SPECIAL = '"\'`$@'


def tokenize(src: str, depth: int = 0) -> list[Token]:
    toks: list[Token] = []
    append = toks.append
    master = _MASTER.match
    nl_pos = [m.start() for m in _NL.finditer(src)]
    nl_n = len(nl_pos)
    li = 0  # index of first newline at-or-after i → line = li + 1 - skew
    # bug-compat with the reference scanner: newlines swallowed inside a
    # char token never advanced its line counter; skew preserves that
    skew = 0
    i, n = 0, len(src)
    while i < n:
        line = li + 1 - skew
        c = src[i]
        if c in _SPECIAL:
            if c == '"' or (c != "`" and _looks_like_string(src, i)):
                text, _nl = _scan_string(src, i)
                append(Token("str", text, line))
                # interpolation holes: re-lex the hole expressions and
                # splice them in, paren-wrapped, so call-site scanning
                # sees them (Roslyn's DescendantNodes walks
                # interpolations; depth-capped)
                if "$" in text[:3] and depth < 4:
                    for hole in _holes(text):
                        append(Token("punct", "(", line))
                        toks.extend(
                            t2 for t2 in tokenize(hole, depth + 1)
                            if t2.kind not in ("comment", "doc")
                        )
                        append(Token("punct", ")", line))
                i += len(text)
            elif c == "'":
                j = i + 1
                while j < n:
                    if src[j] == "\\":
                        j += 2
                        continue
                    if src[j] == "'":
                        j += 1
                        break
                    j += 1
                append(Token("char", src[i:j], line))
                skew += src.count("\n", i, min(j, n))
                i = j
            elif c == "`":
                # TS/JS template literal (shared lexer): ${} holes
                text, _nl = _scan_template(src, i)
                append(Token("str", text, line))
                i += len(text)
            elif c == "@":
                j = _AT_ID.match(src, i).end()
                while j < n and _is_id_part(src[j]):  # non-ASCII tail
                    j += 1
                append(Token("id", src[i:j], line))
                i = j
            else:  # lone '$' (not a string start)
                append(Token("punct", c, line))
                i += 1
            while li < nl_n and nl_pos[li] < i:
                li += 1
            continue
        m = master(src, i)
        g = m.lastindex
        j = m.end()
        if g == _G_WS:  # ~half of all matches: skip before the dispatch chain
            i = j
            while li < nl_n and nl_pos[li] < i:
                li += 1
            continue
        if g == _G_ID:
            if j < n and ord(src[j]) > 127 and _is_id_part(src[j]):
                while j < n and _is_id_part(src[j]):  # non-ASCII tail
                    j += 1
            append(Token("id", src[i:j], line))
        elif g == _G_P:
            append(Token("punct", m.group(), line))
        elif g == _G_NUM:
            if j < n and ord(src[j]) > 127 and src[j].isalnum():
                while j < n and (src[j].isalnum() or src[j] in "._+-"):
                    if src[j] in "+-" and src[j - 1] not in "eE":
                        break
                    j += 1
            append(Token("num", src[i:j], line))
        elif g == _G_LC:
            text = m.group()
            kind = ("doc" if text.startswith("///")
                    and not text.startswith("////") else "comment")
            append(Token(kind, text.rstrip("\r"), line))
        elif g == _G_BC:
            text = m.group()
            kind = ("doc" if text.startswith("/**")
                    and text != "/**/" else "comment")
            append(Token(kind, text, line))
        elif g == _G_ANY:
            ch = m.group()
            if ord(ch) > 127 and _is_id_start(ch):  # non-ASCII id start
                while j < n and _is_id_part(src[j]):
                    j += 1
                append(Token("id", src[i:j], line))
            elif ch.isdigit() or (
                ch == "." and j < n and src[j].isdigit()
            ):
                # non-ASCII digit start (the regex num alternative is
                # ASCII-only; ASCII digits never reach this group) —
                # scanner parity: str.isdigit() chars start a num
                while j < n and (src[j].isalnum() or src[j] in "._+-"):
                    if src[j] in "+-" and src[j - 1] not in "eE":
                        break
                    j += 1
                append(Token("num", src[i:j], line))
            else:
                append(Token("punct", ch, line))
        # ws / pp groups: skip
        i = j
        while li < nl_n and nl_pos[li] < i:
            li += 1
    return toks


def _holes(literal: str) -> list[str]:
    """Hole expression substrings of an interpolated string literal.

    Mirrors _scan_string's state machine; trims a trailing ``:format`` /
    ``,alignment`` clause at hole depth 1."""
    holes: list[str] = []
    n = len(literal)
    i = 0
    verbatim = False
    while i < n and literal[i] in "$@":
        verbatim = verbatim or literal[i] == "@"
        i += 1
    if literal[i : i + 3] == '"""':
        return []  # raw literals: holes rare, skip
    i += 1
    depth = 0
    start = -1
    fmt_cut = -1
    pdepth = 0
    while i < n:
        c = literal[i]
        if depth == 0:
            if c == "\\" and not verbatim:
                i += 2
                continue
            if c == '"':
                if verbatim and literal[i + 1 : i + 2] == '"':
                    i += 2
                    continue
                break
            if c == "{" and literal[i + 1 : i + 2] != "{":
                depth = 1
                start = i + 1
                fmt_cut = -1
                pdepth = 0
                i += 1
                continue
            if c == "{":
                i += 2
                continue
            i += 1
        else:
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
                if depth == 0:
                    end = fmt_cut if fmt_cut >= 0 else i
                    holes.append(literal[start:end])
            elif c in "([":
                pdepth += 1
            elif c in ")]":
                pdepth -= 1
            elif c in ":," and depth == 1 and pdepth == 0 and fmt_cut < 0:
                fmt_cut = i
            elif c == '"' or (c in "$@" and _looks_like_string(literal, i)):
                inner, _ = _scan_string(literal, i)
                i += len(inner)
                continue
            elif c == "'":
                i += 1
                while i < n:
                    if literal[i] == "\\":
                        i += 2
                        continue
                    if literal[i] == "'":
                        break
                    i += 1
            i += 1
            continue
    return holes


def _scan_template(src: str, i: int) -> tuple[str, int]:
    start = i
    n = len(src)
    i += 1
    depth = 0
    while i < n:
        c = src[i]
        if depth == 0:
            if c == "\\":
                i += 2
                continue
            if c == "`":
                i += 1
                break
            if c == "$" and src[i + 1 : i + 2] == "{":
                depth = 1
                i += 2
                continue
            i += 1
        else:
            if c == "{":
                depth += 1
            elif c == "}":
                depth -= 1
            elif c == "`":
                inner, _ = _scan_template(src, i)
                i += len(inner)
                continue
            i += 1
    text = src[start:i]
    return text, text.count("\n")


def _looks_like_string(src: str, i: int) -> bool:
    """True if src[i] starts a $/@-prefixed string literal."""
    j = i
    seen = set()
    while j < len(src) and src[j] in "$@" and src[j] not in seen:
        seen.add(src[j])
        j += 1
    return j < len(src) and src[j] == '"'


def _scan_string(src: str, i: int) -> tuple[str, int]:
    """Scan any string literal starting at i; returns (text, newline_count)."""
    start = i
    n = len(src)
    verbatim = False
    interpolated = False
    while i < n and src[i] in "$@":
        verbatim = verbatim or src[i] == "@"
        interpolated = interpolated or src[i] == "$"
        i += 1
    # raw string literal """..."""
    if src[i : i + 3] == '"""':
        q = 3
        while src[i + q : i + q + 1] == '"':
            q += 1
        close = '"' * q
        j = src.find(close, i + q)
        j = n if j < 0 else j + q
        text = src[start:j]
        return text, text.count("\n")
    i += 1  # opening quote
    depth = 0  # interpolation hole depth
    while i < n:
        c = src[i]
        if depth == 0:
            if c == "\\" and not verbatim:
                i += 2
                continue
            if c == '"':
                if verbatim and src[i + 1 : i + 2] == '"':
                    i += 2
                    continue
                i += 1
                break
            if interpolated and c == "{":
                if src[i + 1 : i + 2] == "{":
                    i += 2
                    continue
                depth = 1
                i += 1
                continue
            i += 1
        else:
            # inside an interpolation hole: track braces and nested strings
            if c == "{":
                depth += 1
                i += 1
            elif c == "}":
                depth -= 1
                i += 1
            elif c == '"' or (c in "$@" and _looks_like_string(src, i)):
                inner, _ = _scan_string(src, i)
                i += len(inner)
            elif c == "'":
                i += 1
                while i < n:
                    if src[i] == "\\":
                        i += 2
                        continue
                    if src[i] == "'":
                        i += 1
                        break
                    i += 1
            else:
                i += 1
    text = src[start:i]
    return text, text.count("\n")

"""C# tokenizer.

Produces a flat token list with 1-based line numbers. Comment trivia is
kept as tokens (kind 'comment' / 'doc') so the parser can attach leading
trivia to declarations the way Roslyn does
(``Graph/Mapping/SymbolMapper.cs:65-77``). Interpolated strings are
lexed as single opaque 'str' tokens (brace/quote nesting tracked);
preprocessor directives are dropped.
"""

from __future__ import annotations

from dataclasses import dataclass

PUNCT_3 = ("<<=", ">>=", "??=", "...", ">>>")
PUNCT_2 = (
    "=>", "==", "!=", "<=", ">=", "&&", "||", "??", "?.", "::",
    "++", "--", "+=", "-=", "*=", "/=", "%=", "&=", "|=", "^=", "<<",
)
# NOTE: '>>' deliberately lexed as two '>' so nested generics close cleanly.


@dataclass(frozen=True)
class Token:
    kind: str   # 'id' | 'punct' | 'str' | 'char' | 'num' | 'comment' | 'doc'
    value: str
    line: int


def _is_id_start(c: str) -> bool:
    return c.isalpha() or c == "_" or c == "@"


def _is_id_part(c: str) -> bool:
    return c.isalnum() or c == "_"


def tokenize(src: str, depth: int = 0) -> list[Token]:
    toks: list[Token] = []
    i, n, line = 0, len(src), 1
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r\f\v ﻿":
            i += 1
            continue
        if c == "/" and i + 1 < n:
            nxt = src[i + 1]
            if nxt == "/":
                j = src.find("\n", i)
                if j < 0:
                    j = n
                text = src[i:j]
                kind = "doc" if text.startswith("///") and not text.startswith("////") else "comment"
                toks.append(Token(kind, text.rstrip("\r"), line))
                i = j
                continue
            if nxt == "*":
                j = src.find("*/", i + 2)
                j = n if j < 0 else j + 2
                text = src[i:j]
                kind = "doc" if text.startswith("/**") and text != "/**/" else "comment"
                toks.append(Token(kind, text, line))
                line += text.count("\n")
                i = j
                continue
        if c == "#":
            # preprocessor directive: drop to end of line
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == '"' or (
            c in "$@" and _looks_like_string(src, i)
        ):
            text, nl = _scan_string(src, i)
            toks.append(Token("str", text, line))
            # interpolation holes: re-lex the hole expressions and splice
            # them in, paren-wrapped, so call-site scanning sees them
            # (Roslyn's DescendantNodes walks interpolations; depth-capped)
            if "$" in text[:3] and depth < 4:
                for hole in _holes(text):
                    toks.append(Token("punct", "(", line))
                    toks.extend(
                        t2 for t2 in tokenize(hole, depth + 1)
                        if t2.kind not in ("comment", "doc")
                    )
                    toks.append(Token("punct", ")", line))
            line += nl
            i += len(text)
            continue
        if c == "'":
            j = i + 1
            while j < n:
                if src[j] == "\\":
                    j += 2
                    continue
                if src[j] == "'":
                    j += 1
                    break
                j += 1
            toks.append(Token("char", src[i:j], line))
            i = j
            continue
        if c == "`":
            # TS/JS template literal (shared lexer): scan with ${} holes
            text, nl = _scan_template(src, i)
            toks.append(Token("str", text, line))
            line += nl
            i += len(text)
            continue
        if c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i + 1
            while j < n and (src[j].isalnum() or src[j] in "._+-"):
                if src[j] in "+-" and src[j - 1] not in "eE":
                    break
                j += 1
            toks.append(Token("num", src[i:j], line))
            i = j
            continue
        if _is_id_start(c):
            j = i + 1 if c != "@" else i + 1
            while j < n and _is_id_part(src[j]):
                j += 1
            toks.append(Token("id", src[i:j], line))
            i = j
            continue
        three = src[i : i + 3]
        if three in PUNCT_3:
            toks.append(Token("punct", three, line))
            i += 3
            continue
        two = src[i : i + 2]
        if two in PUNCT_2:
            toks.append(Token("punct", two, line))
            i += 2
            continue
        toks.append(Token("punct", c, line))
        i += 1
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

"""Token-stream equivalence: regex master-pattern lexer vs the
straightforward char-by-char reference scanner it replaced.

The production ``tokenize`` (extractors/csharp/lexer.py) is an
anchored-match loop over one compiled regex; this file keeps the
original scanner verbatim as the oracle and asserts identical token
streams over (a) targeted edge-case snippets, (b) every file of the
sf0.001 synthetic corpus (all languages share this lexer), and (c) the
reference repository's real C#/TS/Dart sources when present.
"""

from __future__ import annotations

import os

import pytest

from codetoneo4j_ray.extractors.csharp.lexer import (
    PUNCT_2,
    PUNCT_3,
    Token,
    _holes,
    _looks_like_string,
    _scan_string,
    _scan_template,
    tokenize,
)


def _is_id_start(c: str) -> bool:
    return c.isalpha() or c == "_" or c == "@"


def _is_id_part(c: str) -> bool:
    return c.isalnum() or c == "_"


def tokenize_oracle(src: str, depth: int = 0) -> list[Token]:
    """The original scanner, kept verbatim (modulo Token type)."""
    toks: list[Token] = []
    i, n, line = 0, len(src), 1
    while i < n:
        c = src[i]
        if c == "\n":
            line += 1
            i += 1
            continue
        if c in " \t\r\f\v\xa0﻿":
            i += 1
            continue
        if c == "/" and i + 1 < n:
            nxt = src[i + 1]
            if nxt == "/":
                j = src.find("\n", i)
                if j < 0:
                    j = n
                text = src[i:j]
                kind = ("doc" if text.startswith("///")
                        and not text.startswith("////") else "comment")
                toks.append(Token(kind, text.rstrip("\r"), line))
                i = j
                continue
            if nxt == "*":
                j = src.find("*/", i + 2)
                j = n if j < 0 else j + 2
                text = src[i:j]
                kind = ("doc" if text.startswith("/**")
                        and text != "/**/" else "comment")
                toks.append(Token(kind, text, line))
                line += text.count("\n")
                i = j
                continue
        if c == "#":
            j = src.find("\n", i)
            i = n if j < 0 else j
            continue
        if c == '"' or (c in "$@" and _looks_like_string(src, i)):
            text, nl = _scan_string(src, i)
            toks.append(Token("str", text, line))
            if "$" in text[:3] and depth < 4:
                for hole in _holes(text):
                    toks.append(Token("punct", "(", line))
                    toks.extend(
                        t2 for t2 in tokenize_oracle(hole, depth + 1)
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
            j = i + 1
            while j < n and _is_id_part(src[j]):
                j += 1
            toks.append(Token("id", src[i:j], line))
            i = j
            continue
        three = src[i:i + 3]
        if three in PUNCT_3:
            toks.append(Token("punct", three, line))
            i += 3
            continue
        two = src[i:i + 2]
        if two in PUNCT_2:
            toks.append(Token("punct", two, line))
            i += 2
            continue
        toks.append(Token("punct", c, line))
        i += 1
    return toks


EDGE_CASES = [
    "",
    "\n\n\n",
    "int x = 1;",
    "x >>= 1; a >> b; c >>> d; a<<b<<=c;",
    "a ?? b ??= c; x?.y::z; i++ + ++j;",
    "1.5e+2 .5 1e-3 0x1F 1_000 1.2.3 1e+ 1..2 3...4",
    'var s = "plain \\" esc";',
    '@"verbatim "" quotes" @ @x @if',
    '$"interp {a + b} and {c:{0:N2}} tail"',
    '$@"both {x}" @$"swap {y}"',
    '$"nested {Get($"inner {z}")} out"',
    '"""raw " literal"""',
    '$$ $ "s"',
    "'c' '\\'' '\\\\' 'unterminated",
    "`template ${a + `inner ${b}`} end`",
    "// line comment\n/// doc\n//// not doc\n/* block */ /** doc */ /**/",
    "/* unterminated",
    "/*/x*/ /**",
    "#if DEBUG\nint y;\n#endif",
    "# pragma no newline at eof",
    "a\rb\fc\vd\xa0e﻿f",
    "é _x x1 1x _ @",
    "café naïve x²",
    "a.b(c, d).e<F>(g);",
    "int a = ٣; b = ¹²; var y = .٣ + 1٣e+5; a..٣; a.٣",
    '"unterminated string',
    "@\"unterminated verbatim",
    "$\"unterminated {interp",
    "`unterminated ${tpl",
    "...x ..y .z",
    "\\ $ ^ ~",
    "/",
    "/ ",
    "a/",
    "string s = \"tail\\\\\";",
    "'\\\\",
]


@pytest.mark.parametrize("idx", range(len(EDGE_CASES)))
def test_edge_cases(idx):
    src = EDGE_CASES[idx]
    assert tokenize(src) == tokenize_oracle(src)


def _corpus_contents():
    import pyarrow.parquet as pq

    from codetoneo4j_ray.sources.synth import ensure_corpus

    f = ensure_corpus("/tmp/c2n4j_corpus/sf0.001")
    t = pq.read_table(f, columns=["path", "content"])
    return list(zip(t["path"].to_pylist(), t["content"].to_pylist()))


def test_synthetic_corpus_equivalence():
    rows = _corpus_contents()
    assert rows, "corpus missing"
    for path, content in rows:
        assert tokenize(content) == tokenize_oracle(content), path


def test_reference_tree_equivalence():
    ref = "/root/reference"
    if not os.path.isdir(ref):
        pytest.skip("reference tree not present")
    n = 0
    for root, _dirs, files in os.walk(ref):
        for f in files:
            if f.rsplit(".", 1)[-1] not in (
                "cs", "ts", "dart", "razor", "xaml", "csproj", "json",
                "css", "html", "yaml", "cypher",
            ):
                continue
            p = os.path.join(root, f)
            try:
                src = open(p, encoding="utf-8", errors="replace").read()
            except OSError:
                continue
            assert tokenize(src) == tokenize_oracle(src), p
            n += 1
    assert n > 100, f"only {n} reference files lexed"


# hypothesis fuzz: random text (including non-ASCII digits/letters and
# C#-ish fragment soups) must lex identically in both scanners
from hypothesis import given, settings
from hypothesis import strategies as st

_FRAGMENTS = [
    "class C {", "}", "int x = 1;", "x?.y::z", "a >>= b;", "// cmt",
    "/* blk */", "/// doc", '"str"', "$\"i{x}j\"", "@\"v\"", "'c'",
    "`t${x}`", "#if X", "3.14f", "0x1F", "1e-9", "a..b", "٣", "¹²",
    "é", "x²", "@class", "_", ".5", "a.5", "...",
]


@settings(max_examples=250, deadline=None)
@given(
    src=st.one_of(
        st.text(max_size=300),
        st.text(
            alphabet=st.sampled_from(list("ab_1.+-eE\"'`$@#/{}()٣²é \n")),
            max_size=120,
        ),
        st.lists(st.sampled_from(_FRAGMENTS), max_size=30).map(" ".join),
    )
)
def test_fuzz_equivalence(src):
    assert tokenize(src) == tokenize_oracle(src)

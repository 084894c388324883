"""Never-crash property: handlers warn-and-skip, they don't raise
(JsonHandler.cs:38-41 / XmlHandler.cs:39-42 semantics generalized)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from codetoneo4j_ray.extractors import extract_file
from codetoneo4j_ray.extractors.csharp.extractor import skim_file

_EXTS = [".cs", ".json", ".xml", ".css", ".html", ".razor", ".xaml",
         ".ts", ".js", ".dart", ".csproj"]

_CS_FRAGMENTS = [
    "namespace N", "{", "}", "public class C", "void M(int x)", "(", ")",
    "using System;", "var x = ", '"str"', "$\"{y}\"", "@\"verb\"", "// line",
    "/* block", "=> x + 1;", "<T, U>", "new C(", "[Attr]", "public int P { get; }",
    "operator +", "??", "?.", ";", "#if DEBUG", "'c'", "0x1F", "1.5e3",
    "static implicit operator int(C c)", "this[int i]", "where T : class",
    "global using X;", "partial", "record R(int A)", "enum E { A, B }",
    # razor/xaml generated-pass stressors
    "@code {", "@functions {", "@namespace A.B", "@inherits Base",
    "@using C.D", "<root x:Name=\"n\"/>", "x:Class=\"A.B\"",
    "<Page xmlns:x=\"http://schemas.microsoft.com/winfx/2009/xaml\"",
]


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    ext=st.sampled_from(_EXTS),
    content=st.one_of(
        st.text(max_size=400),
        st.lists(st.sampled_from(_CS_FRAGMENTS), max_size=40).map(" ".join),
        st.binary(max_size=200).map(lambda b: b.decode("utf-8", "replace")),
    ),
)
def test_extract_never_raises(ext, content):
    ctx = extract_file("fuzz", f"src/F{ext}", content, "Private")
    if ctx is not None:
        for s in ctx.symbols:
            assert isinstance(s["key"], str)


@settings(max_examples=80, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(content=st.lists(st.sampled_from(_CS_FRAGMENTS), max_size=60).map("\n".join))
def test_skim_never_raises(content):
    skim_file("fuzz", "src/F.cs", content)

"""Port of the reference Dart analyzer's visitor test suite
(/root/reference/tools/dart-analyzer/test/ast_visitor_test.dart:36-357)
against our token-scanner extractor.

Mapping notes (see extractors/dart.py module docstring):

* ``_visit(source)`` there parses with the real Dart analyzer into
  (symbols, relationships); here ``extract_file`` produces the same
  shapes as ctx.symbols / ctx.mentions.
* relationship from/to assertions match on the NAME embedded in the
  mention key (``{file}:{kind}:{name}[:{line}]``) — the reference
  matches on fromSymbol/toSymbol names the same way.
* ``getLine`` resolver tests are not portable (our lexer carries line
  numbers on tokens); ``containingClass`` is asserted via CONTAINS
  relationships + class-qualified fqns instead of a symbol column.
"""

from __future__ import annotations

from codetoneo4j_ray.extractors import extract_file
from codetoneo4j_ray.schema import CONTAINS, DEPENDS_ON, INVOKES

FILE = "lib/foo.dart"
PKG = "my_pkg"


def _visit(source: str, path: str = FILE, pkg: str = PKG):
    return extract_file(pkg, path, source, "Private")


def _symbol(ctx, name: str):
    hits = [s for s in ctx.symbols if s["name"] == name]
    assert hits, f"symbol {name!r} not extracted"
    return hits[0]


def _rels(ctx, frm=None, to=None, rel=None):
    def name_of(key: str) -> str:
        parts = key.split(":")
        # {file}:{kind}:{name}[:{line}] — file itself contains one ':'
        # only when the from-name IS the file path; match on substring
        return parts[2] if len(parts) >= 3 else key

    out = []
    for m in ctx.mentions:
        if rel is not None and m["pred"] != rel:
            continue
        if frm is not None and f":{frm}:" not in ":" + m["subj"] + ":":
            continue
        if to is not None and not (
            m["obj"].endswith(f":{to}") or f":{to}:" in m["obj"]
        ):
            continue
        out.append(m)
    return out


# --- class declarations (ast_visitor_test.dart:37-79) ---------------------


def test_class_name_kind_fqn():
    ctx = _visit("class Foo {}")
    s = _symbol(ctx, "Foo")
    assert s["kind"] == "DartClass"
    assert s["class"] == "class"
    assert "Foo" in s["fqn"]


def test_public_class_accessibility():
    assert _symbol(_visit("class Foo {}"), "Foo")["accessibility"] == "Public"


def test_private_class_accessibility():
    assert _symbol(_visit("class _Foo {}"), "_Foo")["accessibility"] == "Private"


def test_extends_produces_depends_on():
    ctx = _visit("class A {} class B extends A {}")
    assert len(_rels(ctx, frm="B", to="A", rel=DEPENDS_ON)) == 1


def test_implements_produces_depends_on():
    ctx = _visit("abstract class I {} class C implements I {}")
    assert len(_rels(ctx, frm="C", to="I", rel=DEPENDS_ON)) == 1


def test_with_mixin_produces_depends_on():
    ctx = _visit("mixin M {} class C with M {}")
    assert len(_rels(ctx, frm="C", to="M", rel=DEPENDS_ON)) == 1


def test_multiple_implements_produce_one_each():
    ctx = _visit(
        "abstract class I1 {} abstract class I2 {} class C implements I1, I2 {}"
    )
    assert len(_rels(ctx, frm="C", rel=DEPENDS_ON)) == 2


# --- mixin / enum / extension declarations (81-106) ------------------------


def test_mixin_kind():
    s = _symbol(_visit("mixin M {}"), "M")
    assert s["kind"] == "DartMixin" and s["class"] == "mixin"


def test_enum_kind():
    s = _symbol(_visit("enum Color { red, green, blue }"), "Color")
    assert s["kind"] == "DartEnum" and s["class"] == "enum"


def test_named_extension_kind():
    s = _symbol(_visit("extension StringX on String {}"), "StringX")
    assert s["kind"] == "DartExtension" and s["class"] == "extension"


# --- method declarations (108-143) ------------------------------------------


def test_method_symbol_and_contains():
    ctx = _visit("class C { void doThing() {} }")
    s = _symbol(ctx, "doThing")
    assert s["kind"] == "DartMethod"
    assert "C.doThing" in s["fqn"]
    assert len(_rels(ctx, frm="C", to="doThing", rel=CONTAINS)) == 1


def test_getter_is_property():
    assert _symbol(
        _visit("class C { int get value => 0; }"), "value"
    )["kind"] == "DartProperty"


def test_setter_is_property():
    assert _symbol(
        _visit("class C { set value(int v) {} }"), "value"
    )["kind"] == "DartProperty"


def test_operator_symbol():
    ctx = _visit("class C { bool operator ==(Object o) => false; }")
    ops = [s for s in ctx.symbols if s["kind"] == "DartOperator"]
    assert len(ops) == 1


def test_private_method_accessibility():
    assert _symbol(
        _visit("class C { void _secret() {} }"), "_secret"
    )["accessibility"] == "Private"


# --- constructors (145-163) --------------------------------------------------


def test_unnamed_constructor():
    ctx = _visit("class C { C(); }")
    ctors = [s for s in ctx.symbols if s["kind"] == "DartConstructor"]
    assert len(ctors) == 1
    assert len(_rels(ctx, frm="C", rel=CONTAINS)) >= 1


def test_named_constructor_name():
    ctx = _visit("class C { C.named(); }")
    ctors = [s for s in ctx.symbols if s["kind"] == "DartConstructor"]
    assert ctors[0]["name"] == "C.named"


# --- fields (165-187) --------------------------------------------------------


def test_field_symbol_and_contains():
    ctx = _visit("class C { int count = 0; }")
    s = _symbol(ctx, "count")
    assert s["kind"] == "DartField"
    assert len(_rels(ctx, frm="C", to="count", rel=CONTAINS)) == 1


def test_typed_field_depends_on_type():
    ctx = _visit('class C { String name = ""; }')
    assert len(_rels(ctx, frm="name", to="String", rel=DEPENDS_ON)) == 1


def test_untyped_field_no_depends_on():
    ctx = _visit("class C { var x = 0; }")
    assert _rels(ctx, frm="x", rel=DEPENDS_ON) == []


# --- top-level declarations (189-207) ---------------------------------------


def test_top_level_function():
    assert _symbol(_visit("void run() {}"), "run")["kind"] == "DartFunction"


def test_top_level_getter_is_property():
    assert _symbol(
        _visit("int get answer => 42;"), "answer"
    )["kind"] == "DartProperty"


def test_top_level_variable_is_field():
    assert _symbol(
        _visit("const int kMax = 100;"), "kMax"
    )["kind"] == "DartField"


# --- imports (209-221) -------------------------------------------------------


def test_import_depends_on():
    ctx = _visit("import 'dart:io';")
    rels = _rels(ctx, to="dart:io", rel=DEPENDS_ON)
    assert len(rels) == 1
    # fromKind/toKind both 'file' (ast_visitor_test.dart:215-220)
    assert rels[0]["subj"].split(":")[1] == "file"
    assert ":file:" in rels[0]["obj"]


# --- invocations (223-242) ---------------------------------------------------


def test_method_call_invokes():
    ctx = _visit('void run() { print("hi"); }')
    assert len(_rels(ctx, to="print", rel=INVOKES)) == 1


def test_instance_creation_invokes():
    ctx = _visit("class Foo {} void run() { var f = new Foo(); }")
    assert len(_rels(ctx, to="Foo", rel=INVOKES)) == 1


def test_function_expression_invocation():
    ctx = _visit("void run() { final fn = () {}; fn(); }")
    assert len(_rels(ctx, to="fn", rel=INVOKES)) == 1


# --- extension types (244-256) -----------------------------------------------


def test_extension_type_kind():
    s = _symbol(_visit("extension type Meters(int value) {}"), "Meters")
    assert s["kind"] == "DartExtensionType"
    assert s["class"] == "extensiontype"


def test_private_extension_type_accessibility():
    s = _symbol(_visit("extension type _Internal(int value) {}"), "_Internal")
    assert s["accessibility"] == "Private"


# --- type aliases (258-270) --------------------------------------------------


def test_typedef_kind():
    s = _symbol(_visit("typedef MyFunc = void Function(int);"), "MyFunc")
    assert s["kind"] == "DartTypeAlias" and s["class"] == "type"


def test_private_typedef_accessibility():
    s = _symbol(_visit("typedef _Internal = void Function();"), "_Internal")
    assert s["accessibility"] == "Private"


# --- accessibility annotations (272-296) -------------------------------------


def test_protected_annotation():
    src = """import 'package:meta/meta.dart';
class C {
  @protected
  void doThing() {}
}
"""
    assert _symbol(_visit(src), "doThing")["accessibility"] == "Protected"


def test_visible_for_testing_annotation():
    src = """import 'package:meta/meta.dart';
class C {
  @visibleForTesting
  void doThing() {}
}
"""
    assert _symbol(_visit(src), "doThing")["accessibility"] == "Internal"


# --- FQN format (319-343) ----------------------------------------------------


def test_top_level_fqn():
    s = _symbol(_visit("void run() {}"), "run")
    assert s["fqn"] == "package:my_pkg/lib/foo.dart::run"


def test_member_fqn_contains_class():
    s = _symbol(_visit("class C { void doThing() {} }"), "doThing")
    assert "C.doThing" in s["fqn"]


def test_namespace_reflects_directory():
    s = _symbol(_visit("class C {}", path="lib/services/foo.dart"), "C")
    assert s["namespace"] == "package:my_pkg/lib/services"


# --- documentation comments (345-356) ----------------------------------------


def test_doc_comment_captured():
    s = _symbol(_visit("/// A useful class.\nclass C {}"), "C")
    assert s["documentation"] is not None
    assert "A useful class" in s["documentation"]


def test_no_doc_comment_is_null():
    s = _symbol(_visit("class C {}"), "C")
    assert s["documentation"] is None

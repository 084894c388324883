"""Dart extractor tests — kinds/keys per tools/dart-analyzer/lib/src/
ast_visitor.dart + DartHandler.cs:73-95."""

from __future__ import annotations

from codetoneo4j_ray.extractors import extract_file

SRC = """import 'package:flutter/material.dart';
import 'util.dart';

/// A counter.
class Counter extends StatefulWidget with Mixin1 implements ICount {
  final int _start;
  int count = 0;

  Counter(this._start);
  Counter.zero() : _start = 0;

  void increment(int by) {
    count = compute(count, by);
    notify();
  }

  int get total => count;
  set total(int v) { count = v; }
  void _hidden() {}
}

mixin Mixin1 {}
enum Color { red, green }
typedef Handler = void Function(int);
extension IntX on int {
  int doubled() => this * 2;
}

int compute(int a, int b) { return a + b; }
@protected
void notify() { Logger().log(); }
"""


def run(min_acc="Private"):
    return extract_file("myapp", "lib/src/counter.dart", SRC, min_acc)


def test_symbols_and_kinds():
    ctx = run()
    by_kind = {}
    for s in ctx.symbols:
        by_kind.setdefault(s["kind"], []).append(s)
    assert [s["name"] for s in by_kind["DartClass"]] == ["Counter"]
    assert [s["name"] for s in by_kind["DartMixin"]] == ["Mixin1"]
    assert [s["name"] for s in by_kind["DartEnum"]] == ["Color"]
    assert [s["name"] for s in by_kind["DartTypeAlias"]] == ["Handler"]
    assert [s["name"] for s in by_kind["DartExtension"]] == ["IntX"]
    assert {s["name"] for s in by_kind["DartConstructor"]} == {"Counter", "Counter.zero"}
    assert {s["name"] for s in by_kind["DartMethod"]} == {"increment", "doubled", "_hidden"}
    # getter AND setter both emit DartProperty (ast_visitor.dart:260-276)
    assert [s["name"] for s in by_kind["DartProperty"]] == ["total", "total"]
    assert {s["name"] for s in by_kind["DartFunction"]} == {"compute", "notify"}
    cls = by_kind["DartClass"][0]
    assert cls["fqn"] == "package:myapp/lib/src/counter.dart::Counter"
    assert cls["key"] == "lib/src/counter.dart:DartClass:Counter:5"
    assert cls["namespace"] == "package:myapp/lib/src"
    assert cls["documentation"] == "/// A counter."


def test_accessibility_rules():
    ctx = run()
    by_name = {}
    for s in ctx.symbols:
        by_name.setdefault(s["name"], []).append(s)
    assert by_name["_start"][0]["accessibility"] == "Private"  # leading underscore
    assert by_name["count"][0]["accessibility"] == "Public"
    assert by_name["notify"][0]["accessibility"] == "Protected"  # @protected


def test_relationships():
    ctx = run()
    r = {(m["subj"], m["pred"], m["obj"]) for m in ctx.mentions}
    fk = "lib/src/counter.dart"
    assert (f"{fk}:class:Counter:5", "src__DEPENDS_ON", f"{fk}:class:StatefulWidget") in r
    assert (f"{fk}:class:Counter:5", "src__DEPENDS_ON", f"{fk}:mixin:Mixin1") in r
    assert (f"{fk}:class:Counter:5", "src__DEPENDS_ON", f"{fk}:class:ICount") in r
    assert (f"{fk}:file:{fk}:2", "src__DEPENDS_ON", f"{fk}:file:util.dart") in r
    # INVOKES from the CLASS, not the method (ast_visitor.dart:430-447)
    assert any(
        s.startswith(f"{fk}:class:Counter") and p == "src__INVOKES"
        and o == f"{fk}:method:compute"
        for s, p, o in r
    )
    # ctor-style call heuristic: capitalized → constructor
    assert any(o == f"{fk}:constructor:Logger" and p == "src__INVOKES" for _s, p, o in r)


def test_min_accessibility_filter():
    ctx = run(min_acc="Public")
    names = {s["name"] for s in ctx.symbols}
    assert "_hidden" not in names and "_start" not in names
    assert "increment" in names


def test_typeless_final_fields_and_top_accessors():
    ctx = extract_file("myapp", "lib/src/extra.dart", """
class C {
  final x = 1;
  final int y = 2;
  static const z = 3;
}
set topSetter(int v) { }
int get topGetter => 1;
""", "Private")
    fields = {s["name"] for s in ctx.symbols if s["kind"] == "DartField"}
    assert {"x", "y", "z"} <= fields
    props = {s["name"] for s in ctx.symbols if s["kind"] == "DartProperty"}
    assert {"topSetter", "topGetter"} <= props
    assert not any(s["kind"] == "DartFunction" and s["name"] == "topSetter"
                   for s in ctx.symbols)


def test_part_of_directive_emits_nothing():
    # ADVICE r4: `part of my_lib;` must not become a typed top-level var
    # (reference visitor has no PartOfDirective branch).
    ctx = extract_file("myapp", "lib/src/p.dart", """part of my_lib;

class Real {}
""", "Private")
    names = {s["name"] for s in ctx.symbols}
    assert "my_lib" not in names and "of" not in names
    assert "Real" in names
    assert not any("of" == m["obj"].split(":")[-1] for m in ctx.mentions)


def test_library_and_export_directives_emit_nothing():
    ctx = extract_file("myapp", "lib/src/l.dart", """library my_lib;
export 'src/other.dart';

int kTop = 1;
""", "Private")
    names = {s["name"] for s in ctx.symbols}
    assert names == {"kTop"} or "kTop" in names
    assert "my_lib" not in names


def test_multi_variable_toplevel_declaration():
    # ADVICE r4: reference iterates node.variables.variables — one
    # DartField per comma-separated variable.
    ctx = extract_file("myapp", "lib/src/m.dart", """int x = 1, y = 2, z;
const a = f(1, 2), b = [3, 4], c = 5;
""", "Private")
    fields = {s["name"] for s in ctx.symbols if s["kind"] == "DartField"}
    assert {"x", "y", "z", "a", "b", "c"} <= fields
    # typed decls: each variable gets the type DEPENDS_ON edge
    dep_objs = [m["obj"] for m in ctx.mentions if m["pred"].endswith("DEPENDS_ON")]
    assert sum(o.endswith(":class:int") for o in dep_objs) >= 3

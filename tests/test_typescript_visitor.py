"""Port of the reference's own TS visitor test expectations
(``tools/ts-analyzer/test/visitor.test.ts:13-406``) against the
token-scanning extractor, mapped through the end-to-end record shapes
(``Technologies/Web/TypeScriptHandlerBase.cs:66-110``):

  - ``containingClass`` has no direct column here; containment is
    asserted via the fqn (``::Class.member``) and the CONTAINS edge.
  - ``.js`` kinds are asserted POST-remap (``JavaScriptClass`` …) since
    the C# side applies KindPrefix "JavaScript" (config.json:6) to the
    visitor's raw TypeScript* kinds (visitor.test.ts:394-405 tests the
    pre-remap tool output).
  - ``.d.ts`` / generated files are asserted at the product level: file
    record kept, zero symbols (analyzer.ts:39,42 + HandleFile's empty
    FileResult, TypeScriptHandlerBase.cs:62-66); visitor.test.ts:373-382
    only pins the raw tool's non-filtering.
"""

from __future__ import annotations

from codetoneo4j_ray.extractors import extract_file
from codetoneo4j_ray.schema import CONTAINS, DEPENDS_ON, HAS_TAG, INVOKES

PROJECT = "my-project"
REL_PATH = "src/test.ts"


def run(code: str, path: str = REL_PATH, min_acc: str = "Private"):
    return extract_file(PROJECT, path, code, min_acc)


def rels(ctx, pred):
    return [m for m in ctx.mentions if m["pred"] == pred]


# ---- class declarations (visitor.test.ts:13-76) -----------------------

def test_extracts_public_class():
    ctx = run("export class MyClass {}")
    assert len(ctx.symbols) == 1
    s = ctx.symbols[0]
    assert s["name"] == "MyClass"
    assert s["kind"] == "TypeScriptClass"
    assert s["class"] == "class"
    assert s["accessibility"] == "Public"
    assert s["fqn"] == f"@{PROJECT}/{REL_PATH}::MyClass"
    assert s["namespace"] == f"@{PROJECT}/src"


def test_extends_is_depends_on():
    ctx = run("class Child extends Parent {}")
    deps = rels(ctx, DEPENDS_ON)
    assert any(
        ":class:Child:" in r["subj"] and r["obj"].endswith(":class:Parent")
        for r in deps
    )


def test_implements_is_depends_on():
    ctx = run("class Impl implements IFoo, IBar {}")
    deps = rels(ctx, DEPENDS_ON)
    assert len(deps) == 2
    assert any(r["obj"].endswith(":interface:IFoo") for r in deps)
    assert any(r["obj"].endswith(":interface:IBar") for r in deps)


def test_decorator_is_has_tag():
    ctx = run("@Injectable()\nclass MyService {}")
    tags = rels(ctx, HAS_TAG)
    assert any(
        ":class:MyService:" in r["subj"]
        and r["obj"].endswith(":decorator:Injectable")
        for r in tags
    )


def test_anonymous_default_export_class_fqn():
    ctx = run("export default class {}")
    assert len(ctx.symbols) == 1
    assert ctx.symbols[0]["fqn"] == f"@{PROJECT}/{REL_PATH}#default"
    assert ctx.symbols[0]["name"] == "default"


def test_abstract_class_kind():
    ctx = run("abstract class Base { abstract doWork(): void; }")
    cls = next(s for s in ctx.symbols if s["name"] == "Base")
    assert cls["kind"] == "TypeScriptAbstractClass"
    assert cls["class"] == "class"


def test_concrete_class_kind():
    ctx = run("class Concrete {}")
    assert ctx.symbols[0]["kind"] == "TypeScriptClass"


# ---- interface / enum / type alias / namespace (:78-135) ---------------

def test_interface():
    ctx = run("export interface IFoo {}")
    assert len(ctx.symbols) == 1
    s = ctx.symbols[0]
    assert (s["name"], s["kind"], s["class"]) == (
        "IFoo", "TypeScriptInterface", "interface",
    )


def test_interface_extends_depends_on():
    ctx = run("interface IChild extends IParent {}")
    deps = rels(ctx, DEPENDS_ON)
    assert any(
        ":interface:IChild:" in r["subj"]
        and r["obj"].endswith(":interface:IParent")
        for r in deps
    )


def test_enum():
    ctx = run("export enum Color { Red, Green, Blue }")
    assert len(ctx.symbols) == 1
    s = ctx.symbols[0]
    assert (s["name"], s["kind"], s["class"]) == ("Color", "TypeScriptEnum", "enum")


def test_const_enum():
    ctx = run("const enum Direction { Up, Down }")
    assert ctx.symbols[0]["kind"] == "TypeScriptEnum"


def test_type_alias():
    ctx = run("export type MyType = string | number;")
    assert len(ctx.symbols) == 1
    s = ctx.symbols[0]
    assert (s["name"], s["kind"], s["class"]) == (
        "MyType", "TypeScriptTypeAlias", "type",
    )


def test_namespace():
    ctx = run("namespace MyNS {}")
    assert any(
        s["name"] == "MyNS" and s["kind"] == "TypeScriptNamespace"
        for s in ctx.symbols
    )


# ---- methods / ctors / fields (:137-229) -------------------------------

def test_method_and_contains():
    ctx = run("class Foo {\n  doSomething(): void {}\n}")
    m = next(s for s in ctx.symbols if s["name"] == "doSomething")
    assert m["kind"] == "TypeScriptMethod"
    assert m["class"] == "method"
    assert m["fqn"] == f"@{PROJECT}/{REL_PATH}::Foo.doSomething"
    assert any(
        ":class:Foo:" in r["subj"] and r["obj"].endswith(":method:doSomething")
        for r in rels(ctx, CONTAINS)
    )


def test_getter_is_property():
    ctx = run("class Bar {\n  get value(): string { return ''; }\n}")
    p = next(s for s in ctx.symbols if s["name"] == "value")
    assert p["kind"] == "TypeScriptProperty"
    assert p["class"] == "property"


def test_private_accessibility():
    ctx = run("class A {\n  private secret(): void {}\n}")
    m = next(s for s in ctx.symbols if s["name"] == "secret")
    assert m["accessibility"] == "Private"


def test_protected_accessibility():
    ctx = run("class A {\n  protected inner(): void {}\n}")
    m = next(s for s in ctx.symbols if s["name"] == "inner")
    assert m["accessibility"] == "Protected"


def test_constructor_and_contains():
    ctx = run("class Svc {\n  constructor(private dep: string) {}\n}")
    c = next(s for s in ctx.symbols if s["kind"] == "TypeScriptConstructor")
    assert c["name"] == "constructor"
    assert any(
        r["obj"].endswith(":constructor:constructor")
        for r in rels(ctx, CONTAINS)
    )


def test_field_and_contains():
    ctx = run("class Model {\n  name: string = '';\n}")
    f = next(s for s in ctx.symbols if s["name"] == "name")
    assert f["kind"] == "TypeScriptField"
    assert f["class"] == "field"
    assert any(r["obj"].endswith(":field:name") for r in rels(ctx, CONTAINS))


# ---- functions (:231-263) ----------------------------------------------

def test_top_level_function():
    ctx = run("export function greet(name: string): string { return name; }")
    assert len(ctx.symbols) == 1
    s = ctx.symbols[0]
    assert (s["name"], s["kind"], s["class"]) == (
        "greet", "TypeScriptFunction", "function",
    )


def test_arrow_const_function():
    ctx = run("export const add = (a: number, b: number) => a + b;")
    fn = next(s for s in ctx.symbols if s["name"] == "add")
    assert fn["kind"] == "TypeScriptFunction"


def test_class_members_not_top_level_functions():
    ctx = run("class Foo {\n  bar(): void {}\n}\nfunction topLevel() {}")
    fns = [s for s in ctx.symbols if s["kind"] == "TypeScriptFunction"]
    assert [f["name"] for f in fns] == ["topLevel"]


# ---- imports (:266-294) --------------------------------------------------

def test_relative_import_depends_on_file():
    ctx = run("import { Foo } from './foo';")
    deps = rels(ctx, DEPENDS_ON)
    assert any(
        f":file:{REL_PATH}:" in r["subj"] and ":file:" in r["obj"]
        for r in deps
    )


def test_bare_import_depends_on_package():
    ctx = run("import React from 'react';")
    deps = rels(ctx, DEPENDS_ON)
    assert any(r["obj"].endswith(":package:react") for r in deps)


def test_scoped_package_uses_org_prefix():
    ctx = run("import { Injectable } from '@angular/core';")
    deps = rels(ctx, DEPENDS_ON)
    assert any(r["obj"].endswith(":package:@angular") for r in deps)


# ---- INVOKES (:296-332) ---------------------------------------------------

def test_invokes_from_method():
    ctx = run("class A {\n  run(): void {\n    doWork();\n  }\n}")
    inv = rels(ctx, INVOKES)
    assert any(
        ":method:run" in r["subj"] and r["obj"].endswith(":method:doWork")
        for r in inv
    )


def test_invokes_new_expression_constructor():
    ctx = run("class B {\n  create(): void {\n    new Dep();\n  }\n}")
    inv = rels(ctx, INVOKES)
    assert any(r["obj"].endswith(":constructor:Dep") for r in inv)


def test_no_invokes_for_top_level_calls():
    ctx = run("doSomething();")
    assert rels(ctx, INVOKES) == []


# ---- JSDoc / comments (:334-356) ------------------------------------------

def test_jsdoc_documentation():
    ctx = run("/** A greeter class */\nclass Greeter {}")
    s = next(x for x in ctx.symbols if x["name"] == "Greeter")
    assert "A greeter class" in (s["documentation"] or "")


def test_leading_line_comment():
    ctx = run("// This is a comment\nclass Widget {}")
    s = next(x for x in ctx.symbols if x["name"] == "Widget")
    assert "This is a comment" in (s["comments"] or "")


# ---- line numbers (:358-371) -----------------------------------------------

def test_one_based_line_numbers():
    ctx = run("\nclass Foo {\n  bar(): void {}\n}")
    cls = next(s for s in ctx.symbols if s["name"] == "Foo")
    assert cls["start_line"] >= 1
    assert cls["end_line"] >= cls["start_line"]


# ---- analyzer-level exclusions (analyzer.ts:39,42,70,107-119) ---------------

def test_declaration_file_has_record_but_no_symbols():
    ctx = run("export declare class Foo {}", path="src/types.d.ts")
    assert ctx is not None  # file record still produced
    assert ctx.symbols == []
    assert ctx.mentions == []


def test_generated_file_has_record_but_no_symbols():
    ctx = run("class Gen {}", path="src/models.generated.ts")
    assert ctx is not None and ctx.symbols == []
    ctx = run("class Gen {}", path="src/api.gen.js")
    assert ctx is not None and ctx.symbols == []


def test_skipdir_file_has_record_but_no_symbols():
    for p in ("dist/app.ts", "web/.next/page.ts", "coverage/x.js"):
        ctx = run("class C {}", path=p)
        assert ctx is not None and ctx.symbols == [], p
    # ...but an ordinary nested dir is NOT excluded
    assert run("class C {}", path="src/nested/ok.ts").symbols


def test_generated_tsx_is_not_excluded():
    # isGeneratedFile matches '.generated.ts' exactly — '.generated.tsx'
    # does not end with it (analyzer.ts:110) and stays included
    assert run("class C {}", path="src/view.generated.tsx").symbols


# ---- accessibility default (:384-392) ---------------------------------------

def test_accessibility_defaults_public():
    ctx = run("class Foo { bar(): void {} }")
    m = next(s for s in ctx.symbols if s["name"] == "bar")
    assert m["accessibility"] == "Public"


# ---- allowJs (.js) files, post-KindPrefix remap (:394-406 + config.json:6) ---

def test_js_class_extracted_with_javascript_prefix():
    ctx = run("class MyJsClass { hello() {} }", path="src/test.js")
    assert any(
        s["name"] == "MyJsClass" and s["kind"] == "JavaScriptClass"
        for s in ctx.symbols
    )


def test_js_function_extracted_with_javascript_prefix():
    ctx = run("function jsFunction() {}", path="src/util.js")
    assert any(
        s["name"] == "jsFunction" and s["kind"] == "JavaScriptFunction"
        for s in ctx.symbols
    )

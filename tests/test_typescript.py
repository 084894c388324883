"""TypeScript/JavaScript extractor tests — kinds/keys/relationships per
tools/ts-analyzer/src/visitor.ts + TypeScriptHandlerBase.cs:66-110."""

from __future__ import annotations

from codetoneo4j_ray.extractors import extract_file

SRC = """import { format } from "./util";
import React from "react";

@Component({selector: "app"})
export class AppRoot extends BaseView implements IView {
  private count: number = 0;
  constructor() { this.refresh(); }
  refresh(): void { render(format(this.count)); }
  get total() { return this.count; }
}
export abstract class Shape {}
export interface IView extends IBase {}
export enum Mode { Light, Dark }
export type Handler = (e: Event) => void;
export function render(v: string) { console.log(v); }
export const fmt = (s: string) => s.trim();
export namespace Util { export function deep() { inner(); } }
"""


def run(path="src/app.ts", content=SRC, min_acc="Private"):
    return extract_file("proj", path, content, min_acc)


def test_symbol_kinds_and_keys():
    ctx = run()
    by_kind = {}
    for s in ctx.symbols:
        by_kind.setdefault(s["kind"], []).append(s)
    assert [s["name"] for s in by_kind["TypeScriptClass"]] == ["AppRoot"]
    assert [s["name"] for s in by_kind["TypeScriptAbstractClass"]] == ["Shape"]
    assert [s["name"] for s in by_kind["TypeScriptInterface"]] == ["IView"]
    assert [s["name"] for s in by_kind["TypeScriptEnum"]] == ["Mode"]
    assert [s["name"] for s in by_kind["TypeScriptTypeAlias"]] == ["Handler"]
    # functions inside a namespace are skipped: the visitor sets
    # currentClass to the namespace name (visitor.ts:70-74,196-214)
    assert {s["name"] for s in by_kind["TypeScriptFunction"]} == {"render", "fmt"}
    assert [s["name"] for s in by_kind["TypeScriptNamespace"]] == ["Util"]
    assert [s["name"] for s in by_kind["TypeScriptConstructor"]] == ["constructor"]
    assert [s["name"] for s in by_kind["TypeScriptMethod"]] == ["refresh"]
    assert [s["name"] for s in by_kind["TypeScriptProperty"]] == ["total"]
    f = by_kind["TypeScriptField"][0]
    assert f["name"] == "count" and f["accessibility"] == "Private"
    cls = by_kind["TypeScriptClass"][0]
    assert cls["key"] == f"src/app.ts:TypeScriptClass:AppRoot:{cls['start_line']}"
    assert cls["fqn"] == "@proj/src/app.ts::AppRoot"
    assert by_kind["TypeScriptMethod"][0]["fqn"] == "@proj/src/app.ts::AppRoot.refresh"
    assert cls["namespace"] == "@proj/src"


def test_relationships():
    ctx = run()
    r = {(m["subj"], m["pred"], m["obj"]) for m in ctx.mentions}
    # heritage → DEPENDS_ON with lowercase kinds (dangling by design)
    line = next(s["start_line"] for s in ctx.symbols if s["name"] == "AppRoot")
    assert (f"src/app.ts:class:AppRoot:{line}", "src__DEPENDS_ON",
            "src/app.ts:class:BaseView") in r
    assert (f"src/app.ts:class:AppRoot:{line}", "src__DEPENDS_ON",
            "src/app.ts:interface:IView") in r
    # decorator → HAS_TAG
    assert (f"src/app.ts:class:AppRoot:{line}", "src__HAS_TAG",
            "src/app.ts:decorator:Component") in r
    # relative import → file ; bare import → package root
    assert ("src/app.ts:file:src/app.ts:1", "src__DEPENDS_ON",
            "src/util.ts:file:src/util.ts") in r
    assert ("src/app.ts:file:src/app.ts:2", "src__DEPENDS_ON",
            "src/app.ts:package:react") in r
    # calls
    assert ("src/app.ts:method:constructor", "src__INVOKES",
            "src/app.ts:method:refresh") in r
    assert ("src/app.ts:method:refresh", "src__INVOKES",
            "src/app.ts:method:render") in r
    assert ("src/app.ts:method:fmt", "src__INVOKES",
            "src/app.ts:method:trim") in r


def test_accessibility_filter():
    ctx = run(min_acc="Public")
    assert not any(s["name"] == "count" for s in ctx.symbols)  # private field
    assert any(s["name"] == "refresh" for s in ctx.symbols)


def test_javascript_kind_prefix():
    ctx = extract_file("proj", "src/app.js",
                       "export function foo() { bar(); }", "Private")
    assert ctx.symbols[0]["kind"] == "JavaScriptFunction"
    assert ctx.language == "javascript"


def test_no_semicolon_import_and_single_quotes():
    # ASI style: single-quoted import without ';' must not swallow the
    # next declaration, and the spec must still produce a DEPENDS_ON
    ctx = run(content="import x from './util'\nexport class Foo {\n  bar() { }\n}\n")
    names = {s["name"] for s in ctx.symbols}
    assert {"Foo", "bar"} <= names
    deps = [m["obj"] for m in ctx.mentions if m["pred"] == "src__DEPENDS_ON"]
    assert any("util" in d for d in deps)


def test_object_literal_field_no_phantom_members():
    ctx = run(content=(
        "export class C {\n"
        "  config = {\n    retries: 3,\n    verbose: true\n  };\n"
        "  handler = (x) => {\n    return x\n  }\n"
        "  go() {}\n"
        "}\n"
    ))
    names = [s["name"] for s in ctx.symbols]
    assert "retries" not in names and "verbose" not in names
    assert {"config", "handler", "go"} <= set(names)

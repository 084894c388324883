"""Handler tests mirroring the reference's per-handler test files
(JsonHandlerTests, XmlHandlerTests, CssHandlerTests, HtmlHandlerTests,
CsprojHandlerTests, PackageJsonHandlerTests, PubspecYamlHandlerTests,
RazorHandlerTests, XamlHandlerTests)."""

from __future__ import annotations

from codetoneo4j_ray.extractors import extract_file
from codetoneo4j_ray.extractors.textfile import extract_binding_path


def run(path: str, content: str, min_acc: str = "Private"):
    return extract_file("test-repo", path, content, min_acc)


def sym(ctx, **match):
    return [s for s in ctx.symbols
            if all(s.get(k) == v for k, v in match.items())]


def rels(ctx):
    return {(m["subj"], m["pred"], m["obj"]) for m in ctx.mentions}


class TestJson:
    def test_nested_paths(self):
        ctx = run("a/b.json", '{"foo": {"bar": 1}, "baz": 2}')
        fqns = {s["fqn"] for s in ctx.symbols}
        assert fqns == {"foo", "foo.bar", "baz"}
        assert ("a/b.json", "src__CONTAINS", "a/b.json:JsonProperty:foo.bar") in rels(ctx)

    def test_array_indices(self):
        ctx = run("a/b.json", '[{"foo": 1}, {"bar": 2}]')
        fqns = {s["fqn"] for s in ctx.symbols}
        assert fqns == {"[0].foo", "[1].bar"}

    def test_malformed_emits_nothing(self):
        ctx = run("a/b.json", '{"unclosed": [')
        assert ctx.symbols == [] and ctx.mentions == []

    def test_line_is_minus_one(self):
        ctx = run("a/b.json", '{"x": 1}')
        assert ctx.symbols[0]["start_line"] == -1

    def test_not_applicable_min_emits_nothing(self):
        # IsPublicAccessible(NotApplicable) == false (DocumentHandlerBase.cs:56-57)
        ctx = run("a/b.json", '{"x": 1}', min_acc="NotApplicable")
        assert ctx.symbols == []


class TestXml:
    def test_elements_and_attributes(self):
        ctx = run("a/d.xml", '<item name="foo">\n  <sub id="1"/>\n</item>')
        items = sym(ctx, kind="XmlElement", name="item")
        assert items and items[0]["start_line"] == 1
        attrs = sym(ctx, kind="XmlAttribute")
        assert {a["fqn"] for a in attrs} == {"item.name=foo", "sub.id=1"}
        assert (items[0]["key"], "HAS_ATTRIBUTE",
                "a/d.xml:XmlAttribute:item.name:1") in rels(ctx)

    def test_malformed(self):
        assert run("a/d.xml", "<root><unclosed></root>").symbols == []


class TestCss:
    def test_selector(self):
        ctx = run("a/s.css", "body { color: black; }")
        s = sym(ctx, name="body")
        assert s and s[0]["kind"] == "CssSelector"

    def test_at_rules_skipped(self):
        ctx = run("a/s.css", '@import "foo.css"; @media screen { .foo { color: red; } }')
        assert not any(s["name"].startswith("@") for s in ctx.symbols)
        assert sym(ctx, name=".foo")

    def test_not_applicable_gate(self):
        assert run("a/s.css", ".foo { }", min_acc="NotApplicable").symbols == []


class TestHtml:
    def test_script_and_id(self):
        ctx = run("a/p.html", '<script src="app.js"></script>\n<div id="main"/>')
        assert sym(ctx, kind="HtmlScriptReference", name="app.js")
        assert sym(ctx, kind="HtmlElementId", name="main")
        r = rels(ctx)
        assert ("a/p.html", "src__DEPENDS_ON", "a/p.html:ScriptRef:app.js:1") in r
        assert ("a/p.html", "src__CONTAINS", "a/p.html:ElementId:main:2") in r


class TestCsproj:
    CONTENT = """<Project>
  <PropertyGroup>
    <TargetFramework>net8.0</TargetFramework>
    <Empty></Empty>
  </PropertyGroup>
  <ItemGroup>
    <PackageReference Include="Newtonsoft.Json" Version="13.0.1" />
    <PackageReference Include="Serilog"><Version>3.0.0</Version></PackageReference>
    <ProjectReference Include="../Lib/Lib.csproj" />
  </ItemGroup>
</Project>"""

    def test_properties(self):
        ctx = run("a/App.csproj", self.CONTENT)
        props = sym(ctx, kind="ProjectProperty")
        assert [p["name"] for p in props] == ["TargetFramework"]  # Empty skipped
        assert props[0]["fqn"] == "TargetFramework: net8.0"
        assert props[0]["documentation"] == "net8.0"
        # reference omits language/technology → "unknown" (CsprojHandler.cs:75-88)
        assert props[0]["language"] == "unknown"

    def test_package_references(self):
        ctx = run("a/App.csproj", self.CONTENT)
        deps = sym(ctx, kind="Dependency")
        assert {(d["key"], d["version"]) for d in deps} == {
            ("pkg:Newtonsoft.Json", "13.0.1"),
            ("pkg:Serilog", "3.0.0"),  # Version child element form
        }
        assert ("a/App.csproj", "src__DEPENDS_ON", "pkg:Newtonsoft.Json") in rels(ctx)

    def test_project_reference(self):
        ctx = run("a/App.csproj", self.CONTENT)
        pr = sym(ctx, kind="ProjectReference")
        assert pr and pr[0]["name"] == "../Lib/Lib.csproj"


class TestPackageJson:
    def test_deps_and_dev_deps(self):
        ctx = run("a/package.json",
                  '{"dependencies": {"react": "^18.0.0"}, "devDependencies": {"jest": "29"}}')
        deps = {(s["key"], s["version"]) for s in ctx.symbols}
        assert deps == {("pkg:react", "^18.0.0"), ("pkg:jest", "29")}
        # dispatched by basename, not .json handler
        assert not sym(ctx, kind="JsonProperty")
        assert ctx.language == "json" and ctx.technology == "node"


class TestPubspec:
    def test_deps(self):
        ctx = run("a/pubspec.yaml",
                  "dependencies:\n  http: ^0.13.0\n  flutter:\n    sdk: flutter\n"
                  "dev_dependencies:\n  test: any\n")
        deps = {(s["key"], s["version"]) for s in ctx.symbols}
        assert deps == {("pkg:http", "^0.13.0"), ("pkg:flutter", None), ("pkg:test", "any")}
        fqns = {s["fqn"] for s in ctx.symbols}
        assert "http (^0.13.0)" in fqns and "flutter" in fqns


class TestRazor:
    def test_namespace_and_directives(self):
        ctx = run("a/V.razor",
                  "@namespace My.Views\n@using System.Text\n@inject IFoo foo\n"
                  "@model MyModel\n@inherits BasePage\n<h1>x</h1>\n")
        assert ctx.file_namespace_override == "My.Views"
        kinds = {(s["kind"], s["name"]) for s in ctx.symbols}
        assert kinds == {
            ("NamedType", "V"),          # generated component class
            ("UsingDirective", "System.Text"),
            ("InjectDirective", "IFoo foo"),
            ("ModelDirective", "MyModel"),
            ("InheritsDirective", "BasePage"),
        }
        # file key overridden with the generated type FQN
        # (RazorHandler.cs:60-65); directive keys anchor on it
        assert ctx.file_key == "My.Views.V"
        assert any(s["key"] == "My.Views.V:ModelDirective:MyModel"
                   for s in ctx.symbols)

    def test_generated_code_members(self):
        """@code members extract as Roslyn-shaped symbols of the
        generated component class, lines mapped to the template
        (RazorHandler.cs:34-78 generated-tree pass)."""
        ctx = run("src/App/Pages/Counter.razor",
                  "@namespace Acme.Pages\n"
                  "<h1>c</h1>\n"
                  "@code {\n"
                  "    private int count = 0;\n"
                  "    public void Increment()\n"
                  "    {\n"
                  "        count++;\n"
                  "        Helper();\n"
                  "    }\n"
                  "    private void Helper() { }\n"
                  "}\n")
        keys = {s["key"]: s for s in ctx.symbols}
        assert "test-repo:Acme.Pages.Counter" in keys
        assert "test-repo:Acme.Pages.Counter.Increment()" in keys
        assert keys["test-repo:Acme.Pages.Counter.count"]["start_line"] == 4
        assert keys["test-repo:Acme.Pages.Counter.Increment()"]["start_line"] == 5
        assert (
            "test-repo:Acme.Pages.Counter",
            "src__CONTAINS",
            "test-repo:Acme.Pages.Counter.Increment()",
        ) in rels(ctx)

    def test_no_code_block_still_emits_component(self):
        ctx = run("src/App/Pages/Home.razor", "<h1>home</h1>\n")
        # namespace falls back to the inferred directory namespace
        comps = [s for s in ctx.symbols if s["kind"] == "NamedType"]
        assert len(comps) == 1 and comps[0]["name"] == "Home"


class TestXaml:
    CONTENT = """<ContentPage
    xmlns="http://schemas.microsoft.com/dotnet/2021/maui"
    xmlns:x="http://schemas.microsoft.com/winfx/2009/xaml"
    x:Class="My.App.MainPage">
  <Entry x:Name="Input" Keyboard="Email" TextChanged="OnText" />
  <Label Text="{Binding Path=Items.Count, Mode=OneWay}" />
</ContentPage>"""

    def test_namespace_from_x_class(self):
        ctx = run("a/M.xaml", self.CONTENT)
        assert ctx.file_namespace_override == "My.App"

    def test_generated_partial_class(self):
        """Generated-code analog (.g.cs partial class): one field per
        x:Name + InitializeComponent, mapped to the .xaml file with NO
        file-key override (XamlHandler.cs:61-88)."""
        ctx = run("a/M.xaml", self.CONTENT)
        assert ctx.file_key == "a/M.xaml"  # unlike Razor, key stays path
        keys = {s["key"]: s for s in ctx.symbols}
        assert "test-repo:My.App.MainPage" in keys
        fld = keys["test-repo:My.App.MainPage.Input"]
        assert fld["kind"] == "Field" and fld["start_line"] == 5
        assert "test-repo:My.App.MainPage.InitializeComponent()" in keys
        assert (
            "test-repo:My.App.MainPage",
            "src__CONTAINS",
            "test-repo:My.App.MainPage.Input",
        ) in rels(ctx)

    def test_elements_with_name_suffix(self):
        ctx = run("a/M.xaml", self.CONTENT)
        entry = sym(ctx, kind="XamlElement", name="Input")
        assert entry and entry[0]["key"] == "a/M.xaml:Entry:Input:5"
        assert entry[0]["fqn"] == "Entry:Input"

    def test_event_handler_binds_to(self):
        ctx = run("a/M.xaml", self.CONTENT)
        h = sym(ctx, kind="XamlEventHandler")
        assert h and h[0]["name"] == "OnText" and h[0]["accessibility"] == "Private"
        assert ("a/M.xaml:Entry:Input:5", "BINDS_TO",
                "a/M.xaml:EventHandler:OnText") in rels(ctx)

    def test_property_attribute_sets_property(self):
        ctx = run("a/M.xaml", self.CONTENT)
        attrs = sym(ctx, kind="XamlAttribute")
        fqns = {a["fqn"] for a in attrs}
        assert "Entry.Keyboard=Email" in fqns
        # x:-attrs and xmlns skipped
        assert not any("Class" in f for f in fqns)
        binding = [a for a in attrs if a["name"] == "Text"]
        assert binding and binding[0]["comments"] == "Items.Count"

    def test_binding_path_extraction(self):
        assert extract_binding_path("{Binding Title}") == "Title"
        assert extract_binding_path("{Binding Path=Items.Count}") == "Items.Count"
        assert extract_binding_path("{Binding Path=X, Mode=TwoWay}") == "X"
        assert extract_binding_path("plain") is None


class TestDispatchAndExclusion:
    def test_excluded_dirs(self):
        assert extract_file("r", "bin/Debug/A.cs", "class C {}", "Private") is None
        assert extract_file("r", "node_modules/p/i.js", "x", "Private") is None

    def test_no_handler(self):
        assert extract_file("r", "a/readme.md", "x", "Private") is None


class TestXamlResources:
    def test_x_key_resource_suffix(self):
        # x:Key embeds in the element key like x:Name (XamlHandler.cs:96-115)
        ctx = run("a/R.xaml", """<ResourceDictionary
    xmlns="http://schemas.microsoft.com/dotnet/2021/maui"
    xmlns:x="http://schemas.microsoft.com/winfx/2009/xaml">
  <Color x:Key="Primary">#FF0000</Color>
</ResourceDictionary>""")
        color = sym(ctx, kind="XamlElement", name="Primary")
        assert color and color[0]["key"] == "a/R.xaml:Color:Primary:4"
        assert color[0]["fqn"] == "Color:Primary"


def test_csproj_pkg_meta_urls():
    """Package-metadata side table → HAS_URL url records for .NET deps
    (nuspec-cache analog, CsprojHandler.CollectNuspecUrls:139-154)."""
    from codetoneo4j_ray.extractors import extract_file

    content = """<Project Sdk="Microsoft.NET.Sdk">
  <ItemGroup>
    <PackageReference Include="Newtonsoft.Json" Version="13.0.1" />
    <PackageReference Include="NoMeta" Version="1.0.0" />
    <PackageReference Include="NoVersion" />
  </ItemGroup>
</Project>
"""
    meta = {"nuget": {("newtonsoft.json", "13.0.1"):
            ("https://www.newtonsoft.com/json",
             "https://github.com/JamesNK/Newtonsoft.Json")}}
    ctx = extract_file("r", "src/App/App.csproj", content, "Private",
                       pkg_meta=meta)
    urls = [(u["dep_key"], u["url_key"]) for u in ctx.urls]
    assert ("pkg:Newtonsoft.Json", "url:https://www.newtonsoft.com/json") in urls
    assert ("pkg:Newtonsoft.Json",
            "url:https://github.com/JamesNK/Newtonsoft.Json") in urls
    assert len(urls) == 2  # NoMeta / NoVersion contribute none

    # without the side table: no urls (round-1 behavior preserved)
    ctx2 = extract_file("r", "src/App/App.csproj", content, "Private")
    assert ctx2.urls == []


def test_package_json_npm_meta_urls():
    """npm side table → homepage verbatim + normalized repository URL
    (PackageJsonHandler.CollectNpmUrls:125-166, lookup by name)."""
    from codetoneo4j_ray.extractors import extract_file

    content = '{"dependencies": {"react": "^18.2.0", "unknown-pkg": "1.0.0"}}'
    meta = {"npm": {"react": ("https://react.dev/",
                              "git+https://github.com/facebook/react.git")}}
    ctx = extract_file("r", "client/package.json", content, "Private",
                       pkg_meta=meta)
    urls = [(u["dep_key"], u["url_key"]) for u in ctx.urls]
    assert ("pkg:react", "url:https://react.dev/") in urls
    # git+ prefix stripped, .git suffix stripped by the normalizer
    assert ("pkg:react", "url:https://github.com/facebook/react") in urls
    assert len(urls) == 2

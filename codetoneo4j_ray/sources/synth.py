"""Deterministic synthetic source-code corpus.

BASELINE.json's input_hint fixes the input shape: a Parquet table
``(repo, path, commit, lang, content)``. The driver's testdata has no
such table, so tests/bench synthesize one deterministically (seed +
scale only — same sf ⇒ byte-identical corpus). Fixture families mirror
FIXTURES.md: miniature .NET-solution-shaped repos exercising every
handler plus the documented edge cases (partial classes ⇒ duplicate FQN,
hot package keys across repos, malformed inputs, exclusion dirs,
CRLF line endings, >8000-char docs, duplicate input rows).
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

from codetoneo4j_ray.schema import CORPUS_SCHEMA

_CORPUS_ROOT = os.environ.get("C2N4J_CORPUS_DIR", "/tmp/c2n4j_corpus")
_GENERATOR_VERSION = 6  # bump to invalidate cached corpora


def sf_from_dir(sf_dir: str) -> str:
    """'/root/testdata/sf0.01' → 'sf0.01' (defaults to sf0.01)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base.startswith("sf") else "sf0.01"


def _scale(sf_name: str) -> tuple[int, int]:
    """sf name → (n_repos, filler C# files per repo)."""
    try:
        sf = float(sf_name[2:])
    except ValueError:
        sf = 0.01
    n_repos = max(2, int(round(400 * sf)))
    filler = max(2, int(round(3000 * sf)))
    return n_repos, filler


def corpus_dir_for_sf(sf_dir: str) -> str:
    return os.path.join(_CORPUS_ROOT, sf_from_dir(sf_dir))


def ensure_corpus(sf_dir: str) -> str:
    """Generate (once) and return the corpus parquet path for a sf dir."""
    out_dir = corpus_dir_for_sf(sf_dir)
    path = os.path.join(out_dir, "corpus.parquet")
    stamp_path = os.path.join(out_dir, "corpus.meta")
    n_repos, filler = _scale(sf_from_dir(sf_dir))
    stamp = f"v{_GENERATOR_VERSION}:{n_repos}:{filler}:42"
    current = None
    if os.path.exists(stamp_path):
        with open(stamp_path) as f:
            current = f.read().strip()
    if not os.path.exists(path) or current != stamp:
        os.makedirs(out_dir, exist_ok=True)
        table = generate_corpus(n_repos, filler)
        tmp = path + ".tmp"
        # bounded row groups: a single-row-group file forces Ray's
        # read_parquet into ONE read task (row groups are its split
        # unit), serializing the corpus scan ahead of extraction — a
        # real 100 TB corpus is many files/row-groups, so the bench
        # input should be too
        pq.write_table(table, tmp, row_group_size=1024)
        os.replace(tmp, path)
        with open(stamp_path, "w") as f:
            f.write(stamp)
    return path


_COMMITS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("hash", pa.string()),
        ("author", pa.string()),
        ("email", pa.string()),
        ("date", pa.timestamp("us", tz="UTC")),
        ("message", pa.string()),
        ("changed_paths", pa.list_(pa.string())),
        ("changed_deleted", pa.list_(pa.bool_())),
        # git tags pointing at this commit (the ``tag:`` refs git log
        # prints in %d — GitLogParser.cs:101-114 collects them per file)
        ("tags", pa.list_(pa.string())),
    ]
)

_AUTHOR_POOL = [
    ("Ada Lovelace", "ada@example.com"),
    ("Grace Hopper", "grace@example.com"),
    ("Alan Turing", "alan@example.com"),
    ("Edsger Dijkstra", "edsger@example.com"),
    ("Barbara Liskov", "barbara@example.com"),
]


def ensure_commits(sf_dir: str) -> str:
    """Deterministic commits side table next to the corpus parquet.

    The reference derives this from ``git log --name-only``
    (``VersionControl/GitService.cs:17-94``); a Parquet corpus carries
    no git history, so an optional ``commits`` table of
    (repo, hash, author, email, date, message, changed files) supplies
    the same facts — the portable equivalent called out in VERDICT §1."""
    out_dir = corpus_dir_for_sf(sf_dir)
    path = os.path.join(out_dir, "commits.parquet")
    stamp_path = os.path.join(out_dir, "commits.meta")
    n_repos, filler = _scale(sf_from_dir(sf_dir))
    # the corpus generator version is part of the stamp: regenerated
    # corpora change file paths, and commits.changed_paths must follow
    stamp = f"cv2:g{_GENERATOR_VERSION}:{n_repos}:{filler}:42"
    current = None
    if os.path.exists(stamp_path):
        with open(stamp_path) as f:
            current = f.read().strip()
    if not os.path.exists(path) or current != stamp:
        os.makedirs(out_dir, exist_ok=True)
        corpus_path = ensure_corpus(sf_dir)
        meta = pq.read_table(corpus_path, columns=["repo", "path"])
        paths_by_repo: dict[str, list[str]] = {}
        for repo, p in zip(meta["repo"].to_pylist(), meta["path"].to_pylist()):
            paths_by_repo.setdefault(repo, []).append(p)
        table = generate_commits(paths_by_repo, filler)
        tmp = path + ".tmp"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
        with open(stamp_path, "w") as f:
            f.write(stamp)
    return path


_PACKAGES_SCHEMA = pa.schema(
    [
        ("ecosystem", pa.string()),   # nuget | npm
        ("name", pa.string()),
        ("version", pa.string()),
        ("project_url", pa.string()),
        ("repository_url", pa.string()),
    ]
)

_PACKAGES_VERSION = 2  # bump to regenerate cached packages.parquet


def ensure_packages(sf_dir: str) -> str:
    """Deterministic package-metadata side table — the nuspec-cache
    (CsprojHandler.cs:157-200) and node_modules (PackageJsonHandler
    .cs:169-199) analog — for the packages the synthetic corpus
    references."""
    out_dir = corpus_dir_for_sf(sf_dir)
    path = os.path.join(out_dir, "packages.parquet")
    stamp_path = os.path.join(out_dir, "packages.meta")
    stamp = f"pv{_PACKAGES_VERSION}"
    current = None
    if os.path.exists(stamp_path):
        with open(stamp_path) as f:
            current = f.read().strip()
    if not os.path.exists(path) or current != stamp:
        os.makedirs(out_dir, exist_ok=True)
        rows = [
            ("nuget", "Newtonsoft.Json", "13.0.1",
             "https://www.newtonsoft.com/json",
             "https://github.com/JamesNK/Newtonsoft.Json"),
            # npm: looked up by name; repository_url normalized at use
            ("npm", "react", None,
             "https://react.dev/",
             "git+https://github.com/facebook/react.git"),
            ("npm", "left-pad", None,
             None,
             "git://github.com/stevemao/left-pad.git"),
        ]
        for minor in range(4):
            rows.append(
                ("nuget", "Serilog", f"3.{minor}.0",
                 "https://serilog.net/",
                 "https://github.com/serilog/serilog")
            )
        cols = list(zip(*rows))
        tmp = path + ".tmp"
        pq.write_table(
            pa.table(
                {f.name: pa.array(list(cols[i]), f.type)
                 for i, f in enumerate(_PACKAGES_SCHEMA)},
                schema=_PACKAGES_SCHEMA,
            ),
            tmp,
        )
        os.replace(tmp, path)
        with open(stamp_path, "w") as f:
            f.write(stamp)
    return path


def generate_commits(
    paths_by_repo: dict[str, list[str]], filler_per_repo: int, seed: int = 42
) -> pa.Table:
    """One deterministic history per repo over that repo's file paths."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    rows: list[tuple] = []
    for ri, (repo, paths) in enumerate(sorted(paths_by_repo.items())):
        rng = random.Random(seed * 1_000_003 + ri)
        paths = sorted(set(paths))
        n_commits = 8 + filler_per_repo // 2
        for j in range(n_commits):
            h = hashlib.sha1(f"{seed}:{repo}:commit:{j}".encode()).hexdigest()
            author, email = _AUTHOR_POOL[rng.randrange(len(_AUTHOR_POOL))]
            date = base + dt.timedelta(hours=ri * 7 + j * 13, minutes=j % 47)
            n_changed = 1 + rng.randrange(4)
            changed = sorted(rng.sample(paths, min(n_changed, len(paths))))
            deleted = [rng.random() < 0.05 for _ in changed]
            # deterministic tag placement: every 4th commit is a release
            # tag; every 8th carries an extra annotated tag
            tags = [f"v{j // 4}.{ri % 3}"] if j % 4 == 0 else []
            if j % 8 == 0:
                tags.append(f"release-{repo}-{j}")
            rows.append(
                (repo, h, author, email, date, f"commit {j}: update {repo}",
                 changed, deleted, tags)
            )
    cols = list(zip(*rows))
    return pa.table(
        {f.name: pa.array(list(cols[i]), f.type)
         for i, f in enumerate(_COMMITS_SCHEMA)},
        schema=_COMMITS_SCHEMA,
    )


def generate_corpus(n_repos: int = 2, filler_per_repo: int = 2, seed: int = 42) -> pa.Table:
    rows: list[tuple[str, str, str, str, str]] = []
    rng = random.Random(seed)
    for i in range(n_repos):
        app = f"Acme{i}"
        repo = f"acme-app-{i}"
        commit = hashlib.sha1(f"{seed}:{repo}".encode()).hexdigest()

        def add(path: str, lang: str, content: str) -> None:
            rows.append((repo, path, commit, lang, content))

        _add_repo_files(add, app, i, filler_per_repo, rng)
    cols = list(zip(*rows))
    return pa.table(
        {
            "repo": pa.array(cols[0], pa.string()),
            "path": pa.array(cols[1], pa.string()),
            "commit": pa.array(cols[2], pa.string()),
            "lang": pa.array(cols[3], pa.string()),
            "content": pa.array(cols[4], pa.string()),
        },
        schema=CORPUS_SCHEMA,
    )


def _add_repo_files(add, app: str, i: int, filler: int, rng: random.Random) -> None:
    ns = app  # src/<app>/... strips 'src.' → namespace starts at app segment

    add(f"src/{app}/GlobalUsings.cs", "csharp",
        f"global using System;\nglobal using {ns}.Models;\n")

    add(f"src/{app}/Models/Widget.cs", "csharp", f"""using System;
using System.Collections.Generic;

namespace {ns}.Models
{{
    /// <summary>A widget in {app}.</summary>
    public class Widget
    {{
        // primary identifier
        public int Id {{ get; set; }}
        public string? Name {{ get; set; }}
        protected internal DateTime Created {{ get; set; }}
        private readonly List<string> _tags = new();
        internal int _count, _limit;
        public event EventHandler? Changed;

        public Widget(int id)
        {{
            Id = id;
        }}

        public Widget(int id, string name) : this(id)
        {{
            Name = name;
        }}

        /// <summary>Adds a tag.</summary>
        public void AddTag(string tag)
        {{
            _tags.Add(tag);
        }}

        public Dictionary<string, List<int>> Index(ref int seed)
        {{
            Helper();
            return new Dictionary<string, List<int>>();
        }}

        private void Helper() {{ }}

        public enum Kind {{ Simple, Complex }}

        public class Meta
        {{
            public string? Note;
        }}
    }}
}}
""")

    add(f"src/{app}/Models/Order.cs", "csharp", f"""namespace {ns}.Models;

public interface IAuditable
{{
    string AuditLabel();
}}

public record OrderLine(string Sku, int Quantity);

public enum OrderStatus
{{
    Pending,
    Shipped,
    Cancelled,
}}

/* order aggregate */
public partial class Order : IAuditable
{{
    public OrderStatus Status {{ get; set; }}
    public OrderLine[]? Lines {{ get; set; }}

    public string AuditLabel()
    {{
        return Describe();
    }}
}}
""")

    add(f"src/{app}/Models/Order.More.cs", "csharp", f"""namespace {ns}.Models;

public partial class Order
{{
    public string Describe()
    {{
        var w = new Widget(1, "w");
        w.AddTag("x");
        return w.Name ?? "";
    }}
}}
""")

    add(f"src/{app}/Services/BaseService.cs", "csharp", f"""using {ns}.Models;

namespace {ns}.Services
{{
    public abstract class BaseService
    {{
        protected int Retries;

        public virtual void Log(string message)
        {{
        }}

        public void Touch()
        {{
        }}
    }}
}}
""")

    doc_filler = ""
    if i == 0:
        doc_filler = " ".join(f"word{k}" for k in range(1600))  # >8000 chars
    add(f"src/{app}/Services/WidgetService.cs", "csharp", f"""using System;
using System.Collections.Generic;
using {ns}.Models;

namespace {ns}.Services
{{
    /// <summary>Service for widgets. {doc_filler}</summary>
    public class WidgetService : BaseService
    {{
        private readonly List<Widget> _cache = new();

        public Widget Create(int id)
        {{
            var widget = new Widget(id);
            widget.AddTag("fresh");
            Log("created");
            base.Touch();
            Register(widget);
            Register(widget, true);
            Console.WriteLine(id);
            return widget;
        }}

        public void Register(Widget widget)
        {{
            _cache.Add(widget);
        }}

        public void Register(Widget widget, bool force)
        {{
            Register(widget);
        }}

        public override void Log(string message)
        {{
        }}

        public OrderStatus Advance(Order order)
        {{
            order.Describe();
            return OrderStatus.Shipped;
        }}
    }}
}}
""")

    for k in range(filler):
        cls = f"Worker{k}"
        n_steps = 4 + (k % 8)
        calls = "\n            ".join(f"Step{j}(count + {j});" for j in range(n_steps))
        steps = "\n\n".join(
            f"""        /// <summary>Step {j} of worker {k}.</summary>
        private int Step{j}(int input)
        {{
            // stage {j} computation
            var widget = new Widget(input + {j});
            widget.AddTag("s{j}");
            _service.Register(widget);
            return widget.Id;
        }}"""
            for j in range(n_steps)
        )
        props = "\n".join(
            f"        public int Metric{j} {{ get; set; }}" for j in range(n_steps)
        )
        add(f"src/{app}/Workers/{cls}.cs", "csharp", f"""using System;
using System.Collections.Generic;
using {ns}.Models;
using {ns}.Services;

namespace {ns}.Workers
{{
    // generated worker {k}
    public class {cls}
    {{
        private readonly WidgetService _service = new WidgetService();
        private readonly List<Widget> _seen = new();
        public int Batch {{ get; set; }}
{props}

        public void Run(int count)
        {{
            var w = _service.Create(count);
            _service.Register(w);
            {calls}
        }}

{steps}
    }}
}}
""")

    add(f"src/{app}/App.csproj", "xml", f"""<Project Sdk="Microsoft.NET.Sdk">
  <PropertyGroup>
    <OutputType>Exe</OutputType>
    <TargetFramework>net8.0</TargetFramework>
    <Nullable>enable</Nullable>
  </PropertyGroup>
  <ItemGroup>
    <PackageReference Include="Newtonsoft.Json" Version="13.0.1" />
    <PackageReference Include="Serilog" Version="3.{i % 4}.0" />
    <ProjectReference Include="../Lib/Lib.csproj" />
  </ItemGroup>
</Project>
""")

    add(f"config/settings{i}.json", "json",
        '{"logging": {"level": "info", "sinks": ["console", "file"]},\n'
        ' "features": {"beta": true}, "retries": 3}')
    add("config/malformed.json", "json", '{"unclosed": [1, 2,')
    add(f"config/data{i}.xml", "xml",
        f'<catalog version="1.{i}">\n  <item sku="A{i}" qty="2">\n'
        f'    <note>first</note>\n  </item>\n</catalog>')
    add("config/malformed.xml", "xml", "<root><unclosed></root>")

    add("web/site.css", "css",
        "body { color: #222; }\n@media screen {\n  .hero { margin: 0; }\n}\n")
    add("web/index.html", "html",
        f'<html>\n<head><script src="app{i}.js"></script></head>\n'
        f'<body><div id="main{i}"></div></body>\n</html>')

    add(f"src/{app}/Pages/Home.razor", "csharp",
        f"@namespace {ns}.Pages\n@using {ns}.Models\n"
        f"@inject WidgetService Service\n@inherits BasePage\n<h1>Home</h1>\n")

    add(f"src/{app}/Views/MainPage.xaml", "xaml", f"""<ContentPage
    xmlns="http://schemas.microsoft.com/dotnet/2021/maui"
    xmlns:x="http://schemas.microsoft.com/winfx/2009/xaml"
    x:Class="{ns}.Views.MainPage">
  <StackLayout x:Name="Root" Spacing="4">
    <Button x:Name="Go" Clicked="OnGoClicked" Text="{{Binding Title}}" />
    <Label Text="{{Binding Path=Items.Count, Mode=OneWay}}" />
  </StackLayout>
</ContentPage>
""")

    add("client/package.json", "json", f"""{{
  "name": "client-{i}",
  "dependencies": {{ "react": "^18.2.0", "left-pad": "1.3.0" }},
  "devDependencies": {{ "typescript": "^5.4.0" }},
  "repository": {{ "url": "git+ssh://git@github.com/acme/client-{i}.git" }}
}}
""")

    add("client/src/app.ts", "typescript", f"""import {{ format }} from "./util";
import React from "react";

@Component({{selector: "app-root"}})
export class AppRoot extends BaseView implements IView {{
  private count: number = 0;

  constructor() {{
    super();
    this.refresh();
  }}

  refresh(): void {{
    const v = format(this.count);
    render(v);
  }}

  get total() {{ return this.count; }}
}}

export interface IView {{}}
export enum Mode {{ Light, Dark }}
export type Handler = (e: Event) => void;
export function render(value: string) {{
  console.log(value);
}}
export const fmt = (s: string) => s.trim();
""")
    add("client/src/util.ts", "typescript",
        "export function format(n: number): string {\n  return `${n}`;\n}\n")

    add("mobile/lib/main.dart", "dart", f"""import 'package:flutter/material.dart';

/// App {i} entry widget.
class App{i}Widget extends StatelessWidget {{
  final int build_count = 0;

  Widget build(BuildContext context) {{
    return Container(Text(format(build_count)));
  }}
}}

String format(int n) {{ return '$n'; }}
""")

    add("mobile/pubspec.yaml", "yaml", f"""name: mobile_{i}
dependencies:
  http: ^0.13.0
  flutter:
    sdk: flutter
dev_dependencies:
  test: any
""")

    # exclusion + edge cases
    add("bin/Debug/Generated.cs", "csharp", "namespace Junk { public class G {} }")
    add("node_modules/pkg/index.js", "javascript", "module.exports = 1;")
    add(f"src/{app}/Empty.cs", "csharp", "")
    add(f"src/{app}/Crlf.cs", "csharp",
        f"namespace {ns}.Models\r\n{{\r\n    public class CrlfThing\r\n    {{\r\n"
        f"        public int Value;\r\n    }}\r\n}}\r\n")
    # duplicate input row (discovery dedup-by-path analog)
    add("web/site.css", "css",
        "body { color: #222; }\n@media screen {\n  .hero { margin: 0; }\n}\n")

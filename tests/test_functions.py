"""Pure-function ports: tags, urls, paths, truncation, hashing."""

from __future__ import annotations

import hashlib

from codetoneo4j_ray.functions.tags import parse_namespace_tags
from codetoneo4j_ray.functions.text import (
    dirname,
    get_line_number,
    infer_file_metadata,
    sha256_hex,
    truncate_indexed,
)
from codetoneo4j_ray.functions.urls import normalize_repository_url


class TestNamespaceTagParser:
    # Examples from NamespaceTagParser.cs:29-40 doc comment
    def test_dotnet_whitelist(self):
        assert parse_namespace_tags("Microsoft.DotNet.Cli") == [
            "Microsoft", "DotNet", "Cli"
        ]

    def test_acronym_run_kept(self):
        assert parse_namespace_tags("SomeApp.SomeFeature.BDC") == [
            "Some_App", "Some_Feature", "BDC"
        ]

    def test_acronym_then_word(self):
        assert parse_namespace_tags("MyApp.HTTPClient.Core") == [
            "My_App", "HTTP_Client", "Core"
        ]

    def test_ios_whitelist(self):
        assert parse_namespace_tags("MyApp.iOS.Views") == [
            "My_App", "iOS", "Views"
        ]

    def test_blank(self):
        assert parse_namespace_tags(None) == []
        assert parse_namespace_tags("  ") == []


class TestNormalizeRepositoryUrl:
    # Shapes from PackageJsonHandler.cs:201-228
    def test_github_shorthand(self):
        assert normalize_repository_url("github:user/repo") == "https://github.com/user/repo"

    def test_git_ssh(self):
        assert (
            normalize_repository_url("git+ssh://git@github.com/user/repo.git")
            == "https://github.com/user/repo"
        )

    def test_git_https(self):
        assert (
            normalize_repository_url("git+https://github.com/u/r.git")
            == "https://github.com/u/r"
        )

    def test_credentials_stripped(self):
        assert (
            normalize_repository_url("https://org@dev.azure.com/org/proj/_git/repo")
            == "https://dev.azure.com/org/proj/_git/repo"
        )

    def test_bare_git_protocol(self):
        assert (
            normalize_repository_url("git://github.com/u/r.git")
            == "https://github.com/u/r"
        )

    def test_none(self):
        assert normalize_repository_url(None) is None


class TestFileMetadata:
    # FileService.cs:24-55
    def test_csharp_src_strip(self):
        key, ns = infer_file_metadata("src/App/Models/Widget.cs")
        assert key == "src/App/Models/Widget.cs"
        assert ns == "App.Models"

    def test_csharp_source_strip(self):
        assert infer_file_metadata("source/App/A.cs")[1] == "App"

    def test_csharp_bare_src(self):
        assert infer_file_metadata("src/A.cs")[1] == ""

    def test_non_roslyn_dir(self):
        key, ns = infer_file_metadata("web/assets/site.css")
        assert (key, ns) == ("web/assets/site.css", "web/assets")

    def test_top_level(self):
        assert infer_file_metadata("readme.xml")[1] == ""


def test_truncate_8000():
    s = "x" * 9000
    assert len(truncate_indexed(s)) == 8000
    assert truncate_indexed(None) is None
    assert truncate_indexed("ok") == "ok"


def test_sha256_matches_reference_recipe():
    content = "hello ✓ world"
    assert sha256_hex(content) == hashlib.sha256(content.encode()).hexdigest()


def test_line_number():
    assert get_line_number("a\nb\nc", 0) == 1
    assert get_line_number("a\nb\nc", 2) == 2
    assert dirname("a/b/c.txt") == "a/b"
    assert dirname("c.txt") == ""

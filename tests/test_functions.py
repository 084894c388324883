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


def test_bucket_hash_is_pure_per_value():
    """The bucket hash must be a pure function of the key VALUE — same
    key in any block layout / surrounding array → same bucket. pandas'
    hash_array(categorize=True) default violates this (chunk-dependent
    results), which silently broke cross-block co-bucketing when the
    vectorized hash landed; this pins the categorize=False fix."""
    import random

    import numpy as np
    import pyarrow as pa

    from codetoneo4j_ray.stages.bucketing import _hash_bucket, _key_strings

    random.seed(7)
    strs = [
        "%d\x00%s" % (i % 16, ",".join(str(random.getrandbits(60)) for _ in range(4)))
        for i in range(4000)
    ]
    whole = _hash_bucket(pa.array(strs), 64).to_pylist()
    parts: list[int] = []
    for lo in range(0, len(strs), 333):  # uneven chunking on purpose
        parts.extend(_hash_bucket(pa.array(strs[lo : lo + 333]), 64).to_pylist())
    assert whole == parts
    # singleton == batch
    assert _hash_bucket(pa.array([strs[0]]), 64).to_pylist()[0] == whole[0]
    # int keys stringify consistently with arbitrary chunk layouts
    t1 = pa.table({"k": pa.chunked_array([pa.array([1, 2], pa.int64()),
                                          pa.array([3], pa.int64())])})
    t2 = pa.table({"k": pa.array([1, 2, 3], pa.int64())})
    a = _hash_bucket(_key_strings(t1, "k"), 64).to_pylist()
    b = _hash_bucket(_key_strings(t2, "k"), 64).to_pylist()
    assert a == b
    assert np.array(whole).min() >= 0 and np.array(whole).max() < 64

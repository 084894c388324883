"""Repository-URL normalization for package manifests.

Port of PackageJsonHandler.NormalizeRepositoryUrl
(``Technologies/Web/npm/PackageJsonHandler.cs:18-50,201-228``): apply the
first matching prefix rewrite, strip embedded credentials, strip a
trailing ``.git``.
"""

from __future__ import annotations

from urllib.parse import urlsplit

# Ordered prefix replacements; first match wins (PackageJsonHandler.cs:201-228).
_PREFIX_NORMALIZATIONS: tuple[tuple[str, str], ...] = (
    ("github:", "https://github.com/"),
    ("gitlab:", "https://gitlab.com/"),
    ("bitbucket:", "https://bitbucket.org/"),
    ("git+ssh://git@github.com/", "https://github.com/"),
    ("git+ssh://git@gitlab.com/", "https://gitlab.com/"),
    ("git+ssh://git@bitbucket.org/", "https://bitbucket.org/"),
    ("git+ssh://git@dev.azure.com/", "https://dev.azure.com/"),
    ("ssh://git@github.com/", "https://github.com/"),
    ("ssh://git@gitlab.com/", "https://gitlab.com/"),
    ("ssh://git@bitbucket.org/", "https://bitbucket.org/"),
    ("ssh://git@dev.azure.com/", "https://dev.azure.com/"),
    ("git+https://", "https://"),
    ("git+http://", "http://"),
    ("git://", "https://"),
)


def normalize_repository_url(url: str | None) -> str | None:
    if not url:
        return None
    url = url.strip()
    low = url.lower()
    for frm, to in _PREFIX_NORMALIZATIONS:
        if low.startswith(frm):
            url = to + url[len(frm):]
            break
    # Strip embedded credentials (user / user:token before '@' in authority).
    try:
        parts = urlsplit(url)
        if parts.scheme and parts.netloc and "@" in parts.netloc:
            userinfo = parts.netloc.rsplit("@", 1)[0]
            url = url.replace(f"{userinfo}@", "", 1)
    except ValueError:
        pass
    if url.lower().endswith(".git"):
        url = url[:-4]
    return url

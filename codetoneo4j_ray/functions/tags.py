"""Namespace → tag derivation.

Port of the reference's NamespaceTagParser
(``Graph/Xml/NamespaceTagParser.cs:29-98``): a dot-separated namespace is
split into segments; each segment is PascalCase-split into words joined by
'_', keeping acronym runs together ("HTTPClient" → "HTTP_Client"); the
whitelist {"DotNet", "iOS"} is returned verbatim (case-sensitive match).
Applied at flush time (``Neo4j/Neo4jFlushService.cs:90-94``) to every
symbol with a non-blank namespace.
"""

from __future__ import annotations

WHITELIST = frozenset({"DotNet", "iOS"})


def _segment_to_tag(segment: str) -> str:
    if not segment:
        return ""
    if segment in WHITELIST:
        return segment
    words: list[str] = []
    current: list[str] = []
    n = len(segment)
    for i, c in enumerate(current_segment := segment):
        if c.isupper():
            if current and current[-1].islower():
                words.append("".join(current))
                current = []
            elif (
                current
                and current[-1].isupper()
                and i + 1 < n
                and current_segment[i + 1].islower()
            ):
                words.append("".join(current))
                current = []
            current.append(c)
        else:
            current.append(c)
    if current:
        words.append("".join(current))
    return "_".join(words)


def parse_namespace_tags(namespace: str | None) -> list[str]:
    if namespace is None or not namespace.strip():
        return []
    tags = []
    for segment in namespace.split("."):
        if not segment:
            continue
        tag = _segment_to_tag(segment)
        if tag:
            tags.append(tag)
    return tags

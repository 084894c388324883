"""Minimal XML tree with line numbers and prefix→namespace tracking.

Replicates what the reference gets from ``XDocument.Parse(content,
LoadOptions.SetLineInfo)``: per-element start-tag line numbers, attribute
local names / namespace URIs, and xmlns-declaration detection — built on
stdlib expat (lxml is not available in this environment).
"""

from __future__ import annotations

import xml.parsers.expat
from dataclasses import dataclass, field

XMLNS_URI = "http://www.w3.org/2000/xmlns/"


@dataclass
class XmlAttr:
    raw_name: str          # as written, e.g. "x:Name" / "xmlns:x" / "id"
    local_name: str        # "Name" / "x" / "id"
    namespace: str         # resolved URI ("" for unprefixed non-xmlns attrs)
    value: str
    is_namespace_decl: bool


@dataclass
class XmlElem:
    raw_name: str
    local_name: str
    namespace: str
    line: int              # 1-based start-tag line
    attrs: list[XmlAttr] = field(default_factory=list)
    children: list["XmlElem"] = field(default_factory=list)
    text_parts: list[str] = field(default_factory=list)

    @property
    def text(self) -> str:
        return "".join(self.text_parts)

    def find_attr(self, local_name: str) -> XmlAttr | None:
        for a in self.attrs:
            if a.local_name == local_name and not a.is_namespace_decl:
                return a
        return None

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()


class XmlParseError(Exception):
    pass


def parse_xml(content: str) -> XmlElem:
    """Parse and return the root element; raises XmlParseError on bad input."""
    parser = xml.parsers.expat.ParserCreate()  # no namespace splitting: keep raw names
    root: list[XmlElem] = []
    stack: list[XmlElem] = []
    ns_stack: list[dict[str, str]] = [{"xml": "http://www.w3.org/XML/1998/namespace"}]

    def start(name: str, attrs_dict):
        # expat with ordered_attributes=False gives a dict; order preserved in 3.8+
        nsmap = dict(ns_stack[-1])
        raw_attrs = list(attrs_dict.items())
        for k, v in raw_attrs:
            if k == "xmlns":
                nsmap[""] = v
            elif k.startswith("xmlns:"):
                nsmap[k[6:]] = v
        ns_stack.append(nsmap)

        def resolve_elem(raw: str) -> tuple[str, str]:
            if ":" in raw:
                pfx, local = raw.split(":", 1)
                return local, nsmap.get(pfx, "")
            return raw, nsmap.get("", "")

        local, uri = resolve_elem(name)
        elem = XmlElem(name, local, uri, parser.CurrentLineNumber)
        for k, v in raw_attrs:
            if k == "xmlns":
                elem.attrs.append(XmlAttr(k, "xmlns", XMLNS_URI, v, True))
            elif k.startswith("xmlns:"):
                elem.attrs.append(XmlAttr(k, k[6:], XMLNS_URI, v, True))
            elif ":" in k:
                pfx, local_a = k.split(":", 1)
                elem.attrs.append(XmlAttr(k, local_a, nsmap.get(pfx, ""), v, False))
            else:
                # unprefixed attributes have NO namespace (XML spec / XLinq)
                elem.attrs.append(XmlAttr(k, k, "", v, False))
        if stack:
            stack[-1].children.append(elem)
        else:
            root.append(elem)
        stack.append(elem)

    def end(name: str):
        stack.pop()
        ns_stack.pop()

    def chars(data: str):
        if stack:
            stack[-1].text_parts.append(data)

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chars
    try:
        parser.Parse(content, True)
    except xml.parsers.expat.ExpatError as e:
        raise XmlParseError(str(e)) from e
    if not root:
        raise XmlParseError("no root element")
    return root[0]

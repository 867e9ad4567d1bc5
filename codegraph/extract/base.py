"""Shared extraction helpers: record emitter + line-aware XML walker."""

from __future__ import annotations

import xml.parsers.expat
from dataclasses import dataclass, field

from codegraph import keys

EXTRACT_COLUMNS = [
    "rec", "repo", "path", "lang",
    "key", "name", "kind", "klass", "fqn", "accessibility", "namespace",
    "start_line", "end_line", "documentation", "comments", "version",
    "language", "technology",
    "src_key", "dst_key", "rel_type",
    "m_kind", "m_from_key", "m_rel", "m_name", "m_recv", "m_usings", "m_nargs",
    "url_dep_key", "url_key", "url_name",
    "file_namespace",
]

US = "\x1f"  # separator for m_usings namespace lists


class Emitter:
    """Accumulates extraction records for one file as plain dicts."""

    def __init__(self, repo: str, path: str, lang: str, language: str, technology: str):
        self.repo = repo
        self.path = path
        self.lang = lang
        self.language = language
        self.technology = technology
        self.rows: list[dict] = []

    def _base(self, rec: str) -> dict:
        return {c: None for c in EXTRACT_COLUMNS} | {
            "rec": rec, "repo": self.repo, "path": self.path, "lang": self.lang,
        }

    def symbol(self, key, name, kind, klass, fqn, accessibility, namespace,
               start_line, end_line=None, documentation=None, comments=None,
               version=None):
        r = self._base("symbol")
        r.update(key=key, name=name, kind=kind, klass=klass, fqn=fqn,
                 accessibility=accessibility, namespace=namespace,
                 start_line=int(start_line), end_line=int(end_line if end_line is not None else start_line),
                 documentation=keys.truncate(documentation), comments=keys.truncate(comments),
                 version=version, language=self.language, technology=self.technology)
        self.rows.append(r)

    def rel(self, src_key: str, dst_key: str, rel_type: str):
        r = self._base("rel")
        r.update(src_key=src_key, dst_key=dst_key, rel_type=rel_type)
        self.rows.append(r)

    def mention(self, m_kind: str, m_from_key: str, m_rel: str, m_name: str,
                m_recv: str | None, usings: list[str], m_nargs: int | None = None):
        r = self._base("mention")
        r.update(m_kind=m_kind, m_from_key=m_from_key, m_rel=m_rel, m_name=m_name,
                 m_recv=m_recv, m_usings=US.join(usings), m_nargs=m_nargs)
        self.rows.append(r)

    def url(self, dep_key: str, url_key: str, name: str):
        r = self._base("url")
        r.update(url_dep_key=dep_key, url_key=url_key, url_name=name)
        self.rows.append(r)

    def filemeta(self, file_namespace: str | None):
        r = self._base("filemeta")
        r.update(file_namespace=file_namespace)
        self.rows.append(r)


# ---------------------------------------------------------------------------
# line-aware XML walker (replaces System.Xml.Linq + LoadOptions.SetLineInfo)
# ---------------------------------------------------------------------------


@dataclass
class XmlEl:
    local: str
    line: int
    attrs: list[tuple[str, str, str]] = field(default_factory=list)  # (nsuri, local, value)
    children: list["XmlEl"] = field(default_factory=list)
    text: str = ""  # direct character data (XElement.Value for leaf elements)


def parse_xml(content: str) -> XmlEl | None:
    """Parse XML into a line-annotated element tree. Returns None on error
    (reference handlers log-and-skip malformed XML, e.g. XmlHandler.cs:38-43).

    Namespace handling matches XName.LocalName semantics: attribute names are
    split into (namespace-uri, local); xmlns declarations are recorded with
    nsuri sentinel 'xmlns' so callers can skip them like IsNamespaceDeclaration.
    """
    parser = xml.parsers.expat.ParserCreate(namespace_separator="\x00")
    root: list[XmlEl] = []
    stack: list[XmlEl] = []

    def split_name(n: str) -> tuple[str, str]:
        if "\x00" in n:
            uri, local = n.split("\x00", 1)
            return uri, local
        return "", n

    def start(tag, attrs):
        _, local = split_name(tag)
        el = XmlEl(local=local, line=parser.CurrentLineNumber)
        for aname, aval in attrs.items():
            uri, alocal = split_name(aname)
            el.attrs.append((uri, alocal, aval))
        if stack:
            stack[-1].children.append(el)
        else:
            root.append(el)
        stack.append(el)

    def end(tag):
        stack.pop()

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    try:
        parser.Parse(content, True)
    except xml.parsers.expat.ExpatError:
        return None
    return root[0] if root else None


def parse_xml_keep_xmlns(content: str) -> XmlEl | None:
    """Like parse_xml but keeps xmlns declarations visible as attributes with
    nsuri sentinel '@xmlns' (XAML needs to skip them explicitly)."""
    # expat with namespace_separator hides xmlns attrs; re-parse without
    # namespace processing and resolve prefixes manually.
    parser = xml.parsers.expat.ParserCreate()
    root: list[XmlEl] = []
    stack: list[XmlEl] = []
    nsstack: list[dict[str, str]] = [{}]

    def start(tag, attrs):
        scope = dict(nsstack[-1])
        for aname, aval in attrs.items():
            if aname == "xmlns":
                scope[""] = aval
            elif aname.startswith("xmlns:"):
                scope[aname[6:]] = aval
        nsstack.append(scope)
        local = tag.split(":", 1)[1] if ":" in tag else tag
        el = XmlEl(local=local, line=parser.CurrentLineNumber)
        for aname, aval in attrs.items():
            if aname == "xmlns" or aname.startswith("xmlns:"):
                el.attrs.append(("@xmlns", aname, aval))
            elif ":" in aname:
                pfx, alocal = aname.split(":", 1)
                el.attrs.append((scope.get(pfx, ""), alocal, aval))
            else:
                # unprefixed attributes have NO namespace (XML spec / XName)
                el.attrs.append(("", aname, aval))
        if stack:
            stack[-1].children.append(el)
        else:
            root.append(el)
        stack.append(el)

    def end(tag):
        stack.pop()
        nsstack.pop()

    def chardata(data):
        if stack:
            stack[-1].text += data

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chardata
    try:
        parser.Parse(content, True)
    except xml.parsers.expat.ExpatError:
        return None
    return root[0] if root else None

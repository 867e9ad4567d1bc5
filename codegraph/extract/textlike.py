"""Text/markup handlers: CSS, HTML, JSON, Razor, XML, XAML, csproj,
package.json, pubspec.yaml (reference H4-H11, H14).

Accessibility-guard fidelity (two styles exist in the reference):

* guard A — ``IsPublicAccessible(min)`` = ``min <= Public && min !=
  NotApplicable`` (DocumentHandlerBase.cs:56-57): CSS, HTML, JSON, Razor
  directives. NOTE: at the reference's default ``--min-accessibility``
  (NotApplicable, Program.cs:81-82) these handlers emit NOTHING.
* guard B — ``Public < min`` skip (always false for valid enum values):
  XML, XAML elements/attrs, csproj, package.json, pubspec always emit;
  XAML event handlers additionally require ``Private >= min``
  (XamlHandler.cs:134-139).
"""

from __future__ import annotations

import json as jsonlib
import re

from codegraph import keys
from codegraph.extract.base import Emitter, XmlEl, parse_xml_keep_xmlns
from codegraph.schema import (
    ACC_NOT_APPLICABLE, ACC_PRIVATE, ACC_PUBLIC,
    R_BINDS_TO, R_CONTAINS, R_DEPENDS_ON, R_HAS_ATTRIBUTE, R_HAS_PROPERTY,
    R_SETS_PROPERTY,
)


def _guard_a(min_acc: int) -> bool:
    return min_acc <= ACC_PUBLIC and min_acc != ACC_NOT_APPLICABLE


# ---------------------------------------------------------------------------
# CSS (CssHandler.cs:34-77) — regex ([^{]+)\s*\{, trim, skip @-rules.
# The naive regex also captures declaration blocks of the previous rule as
# part of the "selector" (reference behavior, kept verbatim).
# ---------------------------------------------------------------------------

_CSS_RE = re.compile(r"([^{]+)\s*\{", re.MULTILINE)


def extract_css(em: Emitter, content: str, file_key: str, min_acc: int) -> None:
    ns = keys.dir_namespace(em.path)
    em.filemeta(ns or None)
    if not _guard_a(min_acc):
        return
    for m in _CSS_RE.finditer(content):
        selector = m.group(1).strip()
        if not selector or selector.startswith("@"):
            continue
        line = keys.line_number(content, m.start())
        k = keys.text_key(file_key, "CssSelector", selector, line)
        em.symbol(k, selector, "CssSelector", "selector", selector, "Public",
                  ns, line)
        em.rel(file_key, k, R_CONTAINS)  # drops at linking: file is not a Symbol


# ---------------------------------------------------------------------------
# HTML (HtmlHandler.cs:38-110)
# ---------------------------------------------------------------------------

_HTML_SCRIPT_RE = re.compile(r"<script\s+.*?src=['\"](.*?)['\"]", re.IGNORECASE | re.MULTILINE)
_HTML_ID_RE = re.compile(r"id=['\"](.*?)['\"]", re.IGNORECASE | re.MULTILINE)


def extract_html(em: Emitter, content: str, file_key: str, min_acc: int) -> None:
    ns = keys.dir_namespace(em.path)
    em.filemeta(ns or None)
    if not _guard_a(min_acc):
        return
    for m in _HTML_SCRIPT_RE.finditer(content):
        src = m.group(1)
        line = keys.line_number(content, m.start())
        k = keys.text_key(file_key, "ScriptRef", src, line)
        em.symbol(k, src, "HtmlScriptReference", "script", src, "Public", ns, line)
        em.rel(file_key, k, R_DEPENDS_ON)
    for m in _HTML_ID_RE.finditer(content):
        el_id = m.group(1)
        line = keys.line_number(content, m.start())
        k = keys.text_key(file_key, "ElementId", el_id, line)
        em.symbol(k, el_id, "HtmlElementId", "element", el_id, "Public", ns, line)
        em.rel(file_key, k, R_CONTAINS)


# ---------------------------------------------------------------------------
# JSON (JsonHandler.cs:46-95) — recursive property walk, fqn = dot path with
# [i] array indexing, startLine = -1, no symbol per array element.
# ---------------------------------------------------------------------------


def extract_json(em: Emitter, content: str, file_key: str, min_acc: int) -> None:
    ns = keys.dir_namespace(em.path)
    em.filemeta(ns or None)
    if not _guard_a(min_acc):
        return
    try:
        doc = jsonlib.loads(content)
    except ValueError:
        return

    def walk(node, path: str):
        if isinstance(node, dict):
            for name, value in node.items():
                ppath = name if not path else f"{path}.{name}"
                k = keys.text_key(file_key, "JsonProperty", ppath)
                em.symbol(k, name, "JsonProperty", "property", ppath, "Public",
                          ns, -1)
                em.rel(file_key, k, R_CONTAINS)
                walk(value, ppath)
        elif isinstance(node, list):
            for idx, item in enumerate(node):
                walk(item, f"{path}[{idx}]")

    walk(doc, "")


# ---------------------------------------------------------------------------
# Razor (RazorHandler.cs:36-136) — generated-tree pass + regex directives.
# The razor compiler's generated class for a component is {ns}.{stem}; the
# file key is PROMOTED to that FQN (RazorHandler.cs:61-72) and every symbol
# keyed off the file (incl. the regex directives, which run AFTER promotion)
# uses the promoted key. @inject directives become private properties of the
# generated type with a type DEPENDS_ON resolved like any C# member type.
# ---------------------------------------------------------------------------

_RAZOR_NS_RE = re.compile(r"^@namespace\s+(.+)$", re.MULTILINE)
_RAZOR_DIR_RE = re.compile(r"^@(?:using|inject|model|inherits)\s+(.+)$", re.MULTILINE)
_RAZOR_USING_RE = re.compile(r"^@using\s+([\w.]+)\s*$", re.MULTILINE)
_RAZOR_INJECT_RE = re.compile(r"^@inject\s+([\w.<>]+)\s+(\w+)\s*$", re.MULTILINE)


def extract_razor(em: Emitter, content: str, repo: str, file_key: str,
                  min_acc: int) -> None:
    import posixpath

    from codegraph.schema import ACC_ORDER as _AO

    nm = _RAZOR_NS_RE.search(content)
    file_ns = nm.group(1).strip() if nm else None
    stem = posixpath.splitext(posixpath.basename(em.path))[0]
    gen_display = f"{file_ns}.{stem}" if file_ns else None
    em.filemeta(file_ns, file_key_override=gen_display)
    promoted = gen_display if gen_display else file_key

    # --- generated-tree pass (subset of RoslynSymbolProcessor over the
    #     razor codegen output; derivable per-row from @namespace + stem)
    if gen_display:
        usings = [m.group(1) for m in _RAZOR_USING_RE.finditer(content)]
        cand_ns = [file_ns] + usings
        tkey = keys.csharp_key(repo, gen_display)
        em.symbol(tkey, stem, "NamedType", stem, f"global::{gen_display}",
                  "Public", file_ns, 1)
        for m in _RAZOR_INJECT_RE.finditer(content):
            ptype, pname = m.group(1), m.group(2)
            # [Inject] private {T} {Name} { get; set; } in the generated tree
            if _AO["Private"] >= min_acc or min_acc == 0:
                line = keys.line_number(content, m.start())
                pkey = keys.csharp_key(repo, f"{gen_display}.{pname}")
                em.symbol(pkey, pname, "Property", pname,
                          f"global::{gen_display}.{pname}", "Private",
                          file_ns, line)
                em.rel(tkey, pkey, R_CONTAINS)
            em.mention("type", tkey, R_DEPENDS_ON, ptype, None, cand_ns, None)

    # --- regex directives (ExtractDirectives, keyed off the PROMOTED key)
    if not _guard_a(min_acc):
        return
    for m in _RAZOR_DIR_RE.finditer(content):
        line_text = m.group(0).strip()
        if line_text.startswith("@using"):
            kind = "UsingDirective"
        elif line_text.startswith("@inject"):
            kind = "InjectDirective"
        elif line_text.startswith("@model"):
            kind = "ModelDirective"
        else:
            kind = "InheritsDirective"
        name = m.group(1).strip()
        k = keys.text_key(promoted, kind, name)
        line = keys.line_number(content, m.start())
        em.symbol(k, name, kind, "component", name, "Public", file_ns, line)
        em.rel(promoted, k, R_CONTAINS)


# ---------------------------------------------------------------------------
# XML (XmlHandler.cs:47-91 + XmlAttributeExtractor.cs:29-76) — every element
# incl. xmlns declarations as attributes (skipPredicate: null).
# ---------------------------------------------------------------------------


def _attr_local(nsuri: str, local: str) -> str:
    # xmlns:x -> "x"; bare xmlns -> "xmlns" (XName.LocalName semantics)
    if nsuri == "@xmlns":
        return local[6:] if local.startswith("xmlns:") else local
    return local


def _extract_attributes(em: Emitter, el: XmlEl, element_name: str, parent_key: str,
                        start_line: int, file_key: str, ns: str | None,
                        kind_token: str, rel_type: str,
                        skip=None, comment_extractor=None) -> None:
    for (auri, alocal, aval) in el.attrs:
        if skip is not None and skip(auri, alocal):
            continue
        attr_name = _attr_local(auri, alocal)
        k = keys.text_key(file_key, kind_token, f"{element_name}.{attr_name}", start_line)
        comments = comment_extractor(aval) if comment_extractor else None
        em.symbol(k, attr_name, kind_token, "attribute",
                  f"{element_name}.{attr_name}={aval}", "Public", ns, start_line,
                  documentation=aval, comments=comments)
        em.rel(parent_key, k, rel_type)


def extract_xml(em: Emitter, content: str, file_key: str, min_acc: int) -> None:
    ns = keys.dir_namespace(em.path)
    em.filemeta(ns or None)
    root = parse_xml_keep_xmlns(content)
    if root is None:
        return

    def walk(el: XmlEl):
        name = el.local
        line = el.line
        k = keys.text_key(file_key, "XmlElement", name, line)
        em.symbol(k, name, "XmlElement", "element", name, "Public", ns, line)
        em.rel(file_key, k, R_CONTAINS)
        _extract_attributes(em, el, name, k, line, file_key, ns,
                            "XmlAttribute", R_HAS_ATTRIBUTE)
        for child in el.children:
            walk(child)

    walk(root)


# ---------------------------------------------------------------------------
# XAML (XamlHandler.cs) — element keys embed x:Name/x:Key before the line;
# event-handler attrs -> XamlEventHandler + un-prefixed BINDS_TO; other attrs
# -> XamlAttribute + SETS_PROPERTY with {Binding} path in comments.
# ---------------------------------------------------------------------------

_XAML_NAMESPACES = frozenset({
    "http://schemas.microsoft.com/winfx/2009/xaml",
    "http://schemas.microsoft.com/winfx/2006/xaml",
    "http://schemas.microsoft.com/dotnet/2021/maui",
    "http://schemas.microsoft.com/winfx/2006/xaml/presentation",
    "http://xamarin.com/schemas/2014/forms",
    "http://schemas.microsoft.com/client/2007",
    "https://github.com/avaloniaui",
})
_BINDING_RE = re.compile(r"^\{Binding\s+(\S+?)(?:\s*,.*)?}$")


def _is_event_handler(attr_name: str) -> bool:
    return (attr_name.endswith("Click") or attr_name.endswith("Changed")
            or attr_name.endswith("Loaded") or attr_name.endswith("Pressed")
            or attr_name.endswith("Released") or attr_name == "Command")


def extract_binding_path(value: str) -> str | None:
    m = _BINDING_RE.match(value)
    if not m:
        return None
    path = m.group(1)
    if path.startswith("Path="):
        path = path[5:]
    return path


def _xaml_attr(el: XmlEl, local_name: str) -> str | None:
    for (auri, alocal, aval) in el.attrs:
        if alocal == local_name and (auri == "" or auri in _XAML_NAMESPACES):
            return aval
    return None


def extract_xaml(em: Emitter, content: str, repo: str, file_key: str,
                 min_acc: int) -> None:
    from codegraph.schema import ACC_ORDER as _AO

    root = parse_xml_keep_xmlns(content)
    file_ns = None
    x_class = None
    if root is not None:
        x_class = _xaml_attr(root, "Class")
        if x_class:
            file_ns = x_class[:x_class.rindex(".")] if "." in x_class else None
    em.filemeta(file_ns)
    if root is None:
        return

    # --- generated .g.cs pass (XamlHandler.cs:62-87): the partial class
    #     named by x:Class, its InitializeComponent(), and one private field
    #     per x:Name element. File key is NOT promoted (unlike razor — the
    #     handler passes the original fileKey through, :84-89).
    if x_class:
        tkey = keys.csharp_key(repo, x_class)
        em.symbol(tkey, x_class.split(".")[-1], "NamedType",
                  x_class.split(".")[-1], f"global::{x_class}", "Public",
                  file_ns, root.line)
        if _AO["Private"] >= min_acc or min_acc == 0:
            mkey = keys.csharp_key(repo, f"{x_class}.InitializeComponent()")
            em.symbol(mkey, "InitializeComponent", "Method",
                      "InitializeComponent",
                      f"global::{x_class}.InitializeComponent()", "Private",
                      file_ns, root.line)
            em.rel(tkey, mkey, R_CONTAINS)

            def gen_fields(el: XmlEl):
                xn = _xaml_attr(el, "Name")
                if xn:
                    fkey = keys.csharp_key(repo, f"{x_class}.{xn}")
                    em.symbol(fkey, xn, "Field", xn,
                              f"global::{x_class}.{xn}", "Private",
                              file_ns, el.line)
                    em.rel(tkey, fkey, R_CONTAINS)
                    # field type = the element's CLR type: dangling display,
                    # dropped at J1 like any BCL dep
                    em.rel(tkey, keys.csharp_key(repo, el.local), R_DEPENDS_ON)
                for ch in el.children:
                    gen_fields(ch)

            gen_fields(root)

    def walk(el: XmlEl):
        name = el.local
        x_name = _xaml_attr(el, "Name")
        x_key = _xaml_attr(el, "Key")
        suffix_val = x_name if x_name is not None else x_key
        line = el.line
        symbol_key = keys.xaml_element_key(file_key, name, suffix_val, line)
        key_suffix = f":{suffix_val}" if suffix_val is not None else ""
        if ACC_PUBLIC >= min_acc:
            em.symbol(symbol_key, suffix_val if suffix_val is not None else name,
                      "XamlElement", "element", f"{name}{key_suffix}", "Public",
                      file_ns, line)
            em.rel(file_key, symbol_key, R_CONTAINS)
        for (auri, alocal, aval) in el.attrs:
            if auri == "@xmlns":
                continue
            if _is_event_handler(alocal) and ACC_PRIVATE >= min_acc:
                handler_key = keys.text_key(file_key, "EventHandler", aval)
                em.symbol(handler_key, aval, "XamlEventHandler", "event-handler",
                          aval, "Private", file_ns, line)
                em.rel(symbol_key, handler_key, R_BINDS_TO)
        if ACC_PUBLIC >= min_acc:
            def skip(auri: str, alocal: str) -> bool:
                if auri == "@xmlns":
                    return True
                if auri in _XAML_NAMESPACES:
                    return True
                return _is_event_handler(alocal)
            _extract_attributes(em, el, name, symbol_key, line, file_key, file_ns,
                                "XamlAttribute", R_SETS_PROPERTY,
                                skip=skip, comment_extractor=extract_binding_path)
        for child in el.children:
            walk(child)

    walk(root)


# ---------------------------------------------------------------------------
# csproj (CsprojHandler.cs) — ProjectProperty / PackageReference /
# ProjectReference; nuspec URLs from the pkg_metadata side table.
# ---------------------------------------------------------------------------


def _add_dependency(em: Emitter, name: str, version: str | None, file_key: str,
                    ns: str | None) -> str:
    """PackageDependencyHandlerBase.cs:19-46."""
    k = keys.pkg_key(name)
    fqn = f"{name} ({version})" if version is not None else name
    em.symbol(k, name, "Dependency", name, fqn, "Public", ns, -1,
              documentation=version, version=version)
    em.rel(file_key, k, R_DEPENDS_ON)
    return k


def extract_csproj(em: Emitter, content: str, file_key: str, min_acc: int,
                   pkg_meta: dict) -> None:
    ns = keys.dir_namespace(em.path)
    em.filemeta(ns or None)
    root = parse_xml_keep_xmlns(content)
    if root is None:
        return

    def descendants(el: XmlEl):
        for c in el.children:
            yield c
            yield from descendants(c)

    for group in root.children:
        if group.local != "PropertyGroup":
            continue
        for prop in group.children:
            name = prop.local
            value = (prop.text or "").strip()
            if not name or not value:
                continue
            line = prop.line
            k = keys.text_key(file_key, "Property", name, line)
            em.symbol(k, name, "ProjectProperty", name, f"{name}: {value}",
                      "Public", ns, line, documentation=value)
            em.rel(file_key, k, R_HAS_PROPERTY)

    for el in descendants(root):
        if el.local == "PackageReference":
            attrs = {al: av for (_, al, av) in el.attrs}
            include = attrs.get("Include")
            version = attrs.get("Version")
            if not include:
                continue
            dep_key = _add_dependency(em, include, version, file_key, ns)
            meta = pkg_meta.get(("nuspec", include))
            if meta and version:
                _homepage, repository, project_url = meta
                if project_url:
                    em.url(dep_key, keys.url_key(project_url), project_url)
                if repository:
                    em.url(dep_key, keys.url_key(repository), repository)
        elif el.local == "ProjectReference":
            attrs = {al: av for (_, al, av) in el.attrs}
            include = attrs.get("Include")
            if not include:
                continue
            line = el.line
            k = keys.text_key(file_key, "ProjectReference", include, line)
            em.symbol(k, include, "ProjectReference", include, include,
                      "Public", ns, line)
            em.rel(file_key, k, R_DEPENDS_ON)


# ---------------------------------------------------------------------------
# package.json (PackageJsonHandler.cs) — dependencies + devDependencies;
# homepage raw, repository normalized (15 ordered prefix rules).
# ---------------------------------------------------------------------------


def extract_packagejson(em: Emitter, content: str, file_key: str, min_acc: int,
                        pkg_meta: dict) -> None:
    ns = keys.dir_namespace(em.path)
    em.filemeta(ns or None)
    try:
        doc = jsonlib.loads(content)
    except ValueError:
        return
    for section in ("dependencies", "devDependencies"):
        sec = doc.get(section)
        if not isinstance(sec, dict):
            continue
        for name, version in sec.items():
            if not name:
                continue
            dep_key = _add_dependency(em, name, version if isinstance(version, str) else None,
                                      file_key, ns)
            meta = pkg_meta.get(("npm", name))
            if meta:
                homepage, repository, _project_url = meta
                if homepage and homepage.strip():
                    u = homepage.strip()
                    em.url(dep_key, keys.url_key(u), u)
                if repository:
                    u = keys.normalize_repository_url(repository)
                    if u:
                        em.url(dep_key, keys.url_key(u), u)


# ---------------------------------------------------------------------------
# pubspec.yaml (PubspecYamlHandler.cs:35-91 + PubspecParser.cs:10-106) —
# dependencies + dev_dependencies only (sdk constraint parsed but not emitted)
# ---------------------------------------------------------------------------


def extract_pubspec(em: Emitter, content: str, file_key: str, min_acc: int) -> None:
    ns = keys.dir_namespace(em.path)
    em.filemeta(ns or None)
    current_section = None
    in_environment = False
    for line in content.split("\n"):
        trimmed = line.rstrip("\r")
        if trimmed and not trimmed[0].isspace():
            in_environment = False
            if trimmed.startswith("name:"):
                current_section = None
            elif trimmed.startswith("dependencies:"):
                current_section = "dependencies"
            elif trimmed.startswith("dev_dependencies:"):
                current_section = "dev_dependencies"
            elif trimmed.startswith("environment:"):
                current_section = None
                in_environment = True
            else:
                current_section = None
            continue
        if not trimmed.strip():
            continue
        stripped = trimmed.lstrip()
        if len(trimmed) == len(stripped):
            continue
        if in_environment and stripped.startswith("sdk:"):
            continue  # parsed but not emitted by the handler
        if current_section is None:
            continue
        colon = stripped.find(":")
        if colon <= 0:
            continue
        dep_name = stripped[:colon].strip()
        dep_value = stripped[colon + 1:].strip()
        if not dep_name:
            continue
        _add_dependency(em, dep_name, dep_value or None, file_key, ns)

"""C# subset lexer replacing the reference's Roslyn pass.

Replicates the *output semantics* of CSharpHandler + RoslynSymbolProcessor +
MemberDependencyExtractor + SymbolMapper
(/root/reference/src/CodeToNeo4j/Technologies/DotNet/CSharp/*.cs,
 Graph/Mapping/SymbolMapper.cs) over a documented C# subset:

* one file-scoped (or block) namespace per file, no nested types,
  no overloads, at most one constructor per type, member declarations from a
  fixed menu of single-signature-line shapes.
* symbol keys: ``{repoKey}:{display}`` where display mirrors
  SymbolDisplayFormat.CSharpErrorMessageFormat for the subset —
  types ``Ns.Type``, members ``Ns.Type.Name``, methods/ctors
  ``Ns.Type.Name(paramTok, ...)`` with parameter tokens as declared
  (SymbolMapper.cs:43-47).
* fqn: ``global::`` + display (FullyQualifiedFormat approximation).
* kind = Roslyn SymbolKind.ToString(): NamedType/Method/Property/Field/Event;
  klass = symbol.Name (SymbolMapper.cs:14).
* documentation: text of ``///`` lines (subset stand-in for
  GetDocumentationCommentXml); comments: leading ``//``/``/* */`` trivia
  joined by newline (SymbolMapper.cs:64-77).
* member-type dependencies (field/property/event/param/return) emit
  DEPENDS_ON from the CONTAINING TYPE key (MemberDependencyExtractor.cs:232-292);
  invocations emit INVOKES from the member key with per-member callee dedup
  (:77-182,218-230). In-repo targets are resolved later (link.py) against the
  broadcast symbol dictionary; known-external targets emit dangling keys that
  the linking join drops (MergeRelationships.cypher:1-5).
* accessibility filter per AccessibilityFilter.cs:14-26 (explicit interface
  implementations always kept).
"""

from __future__ import annotations

import re

from codegraph import keys
from codegraph.extract.base import Emitter
from codegraph.schema import ACC_ORDER, ACC_NOT_APPLICABLE, R_CONTAINS, R_DEPENDS_ON, R_INVOKES

# C# builtin keyword types: Roslyn resolves them to metadata types whose
# error-format display is the keyword itself -> dangling keys like "{repo}:int"
KEYWORD_TYPES = {
    "int", "string", "bool", "double", "void", "long", "float", "object",
    "decimal", "char", "byte", "short", "uint", "ulong", "ushort", "sbyte",
}
# Known BCL types the generator's subset may reference; display is the
# fully-qualified name CSharpErrorMessageFormat would print.
EXTERNAL_TYPE_DISPLAY = {
    "EventHandler": "System.EventHandler",
    "Console": "System.Console",
    "DateTime": "System.DateTime",
    "TimeSpan": "System.TimeSpan",
    "Exception": "System.Exception",
}

_RE_USING = re.compile(r"^\s*(global\s+)?using\s+(?:static\s+)?([\w.]+)\s*;")
_RE_NAMESPACE = re.compile(r"^\s*namespace\s+([\w.]+)\s*[;{]?\s*$")
_RE_TYPE = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*"
    r"(?:sealed\s+|abstract\s+|static\s+|partial\s+)*"
    r"(?P<tkind>class|interface|struct|record|enum)\s+(?P<name>\w+)"
)
_RE_EVENT = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*(?:static\s+)?"
    r"event\s+(?P<type>[\w.<>\[\]?]+)\s+(?P<name>\w+)\s*;"
)
_RE_PROPERTY = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*(?:static\s+|virtual\s+|override\s+)*"
    r"(?P<type>[\w.<>\[\]?]+)\s+(?P<name>[\w.]+)\s*\{\s*get"
)
_RE_FIELD = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*"
    r"(?:static\s+|readonly\s+|const\s+)*"
    r"(?P<type>[\w.<>\[\]?]+)\s+(?P<name>\w+)\s*(?:=[^;]*)?;"
)
_RE_METHOD = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*"
    r"(?:static\s+|virtual\s+|override\s+|async\s+)*"
    r"(?:(?P<ret>[\w.<>\[\]?]+)\s+)?(?P<name>[\w.]+)\s*\((?P<params>[^)]*)\)\s*(?:\{|=>|;|$)"
)
_RE_ENUM_MEMBER = re.compile(r"^\s*(?P<name>\w+)\s*(?:=\s*\d+\s*)?,?\s*$")
_RE_DOC = re.compile(r"^\s*///\s?(.*)$")
_RE_COMMENT = re.compile(r"^\s*(//(?!/).*|/\*.*\*/)\s*$")
# body statement shapes
_RE_NEW = re.compile(r"\bnew\s+([\w.]+)\s*\(([^)]*)\)")
_RE_CALL = re.compile(r"(?<![\w.])(?:(?P<recv>this|[\w]+)\.)?(?P<name>\w+)\s*\(([^)]*)\)")

_MODIFIER_WORDS = {
    "public", "internal", "private", "protected", "static", "readonly", "const",
    "sealed", "abstract", "partial", "virtual", "override", "async", "event",
    "class", "interface", "struct", "record", "enum", "using", "namespace",
    "return", "new", "var", "if", "while", "for", "foreach", "else", "get", "set",
}


def _count_args(argstr: str) -> int:
    s = argstr.strip()
    if not s:
        return 0
    return s.count(",") + 1


def _acc_name(tok: str | None, default: str) -> str:
    if not tok:
        return default
    return {"public": "Public", "internal": "Internal",
            "private": "Private", "protected": "Protected"}[tok]


def _passes(acc: str, min_acc: int, explicit_iface: bool = False) -> bool:
    """AccessibilityFilter.cs:14-18 — below-minimum filtered unless
    NotApplicable accessibility or explicit interface implementation."""
    a = ACC_ORDER[acc]
    return not (a < min_acc and a != ACC_NOT_APPLICABLE and not explicit_iface)


class _Type:
    __slots__ = ("name", "kind", "ns", "acc", "start", "end", "doc", "comments",
                 "display", "key", "members", "fields", "is_enum", "is_interface")

    def __init__(self, name, kind, ns, acc, start, doc, comments, repo):
        self.name = name
        self.kind = kind
        self.ns = ns
        self.acc = acc
        self.start = start
        self.end = start
        self.doc = doc
        self.comments = comments
        self.display = f"{ns}.{name}" if ns else name
        self.key = keys.csharp_key(repo, self.display)
        self.members = []
        self.fields = {}  # field name -> declared type token
        self.is_enum = kind == "enum"
        self.is_interface = kind == "interface"


def extract_csharp(em: Emitter, content: str, repo: str, file_key: str,
                   min_acc: int) -> None:
    lines = content.split("\n")
    n = len(lines)

    file_ns: str | None = None
    usings: list[str] = []
    types: list[_Type] = []

    # --- pass 1: usings + namespace --------------------------------------
    for ln in lines:
        m = _RE_USING.match(ln)
        if m:
            usings.append(m.group(2))
            continue
        m = _RE_NAMESPACE.match(ln)
        if m:
            file_ns = m.group(1)

    # --- pass 2: types, members, bodies ----------------------------------
    doc_buf: list[str] = []
    com_buf: list[str] = []
    cur: _Type | None = None
    depth = 0
    type_depth = -1
    i = 0
    pending_member = None  # (member dict) awaiting body lines
    body_buf: list[str] = []
    body_open_depth = -1

    def flush_trivia():
        doc = "\n".join(doc_buf) if doc_buf else None
        com = "\n".join(com_buf) if com_buf else None
        doc_buf.clear()
        com_buf.clear()
        return doc, com

    while i < n:
        raw = lines[i]
        stripped = raw.strip()
        lineno = i + 1

        mdoc = _RE_DOC.match(raw)
        if mdoc:
            doc_buf.append(mdoc.group(1))
            i += 1
            continue
        if _RE_COMMENT.match(raw):
            com_buf.append(stripped)
            i += 1
            continue

        opens = raw.count("{")
        closes = raw.count("}")

        if pending_member is not None:
            # collecting a method/ctor body until depth returns to decl depth
            body_buf.append(raw)
            depth += opens - closes
            if depth <= body_open_depth:
                pending_member["end"] = lineno
                pending_member["body"] = "\n".join(body_buf)
                cur.members.append(pending_member)
                pending_member = None
                body_buf = []
            i += 1
            continue

        mt = _RE_TYPE.match(raw)
        if mt and cur is None:
            doc, com = flush_trivia()
            acc = _acc_name(mt.group("acc"), "Internal")
            cur = _Type(mt.group("name"), mt.group("tkind"), file_ns or "", acc,
                        lineno, doc, com, repo)
            # type body: wait for open brace
            depth += opens - closes
            # find the opening brace depth (may be on this or a later line)
            while "{" not in raw:
                i += 1
                raw = lines[i]
                depth += raw.count("{") - raw.count("}")
            type_depth = depth - 1
            i += 1
            continue

        if cur is not None:
            depth += opens - closes
            if closes and depth <= type_depth:
                cur.end = lineno
                types.append(cur)
                cur = None
                flush_trivia()
                i += 1
                continue

            if cur.is_enum:
                memn = _RE_ENUM_MEMBER.match(stripped)
                if memn and stripped not in ("{", "}"):
                    doc, com = flush_trivia()
                    cur.members.append({
                        "mkind": "EnumMember", "name": memn.group("name"),
                        "acc": "Public", "start": lineno, "end": lineno,
                        "doc": doc, "com": com,
                    })
                i += 1
                continue

            mev = _RE_EVENT.match(raw)
            if mev:
                doc, com = flush_trivia()
                cur.members.append({
                    "mkind": "Event", "name": mev.group("name"),
                    "type": mev.group("type"),
                    "acc": _acc_name(mev.group("acc"), "Private"),
                    "start": lineno, "end": lineno, "doc": doc, "com": com,
                })
                i += 1
                continue

            mprop = _RE_PROPERTY.match(raw)
            if mprop and mprop.group("type") not in _MODIFIER_WORDS:
                doc, com = flush_trivia()
                cur.members.append({
                    "mkind": "Property", "name": mprop.group("name"),
                    "type": mprop.group("type"),
                    "acc": _acc_name(mprop.group("acc"),
                                     "Public" if cur.is_interface else "Private"),
                    "start": lineno, "end": lineno, "doc": doc, "com": com,
                })
                # single-line auto-property: braces balanced on the line
                i += 1
                continue

            mm = _RE_METHOD.match(raw)
            if mm and (mm.group("ret") or mm.group("name") == cur.name) and \
                    mm.group("name").split(".")[-1] not in _MODIFIER_WORDS and \
                    (mm.group("ret") is None or mm.group("ret") not in
                     ("new", "return")):
                doc, com = flush_trivia()
                name = mm.group("name")
                is_ctor = mm.group("ret") is None and name == cur.name
                params = []
                pstr = mm.group("params").strip()
                if pstr:
                    for p in pstr.split(","):
                        toks = p.strip().split()
                        if len(toks) >= 2:
                            params.append((toks[-2], toks[-1]))  # (type, name)
                explicit_iface = "." in name
                default_acc = "Public" if cur.is_interface else "Private"
                member = {
                    "mkind": "Method", "name": name, "is_ctor": is_ctor,
                    "params": params,
                    "ret": None if is_ctor else (mm.group("ret") or "void"),
                    "acc": _acc_name(mm.group("acc"), default_acc),
                    "explicit_iface": explicit_iface,
                    "start": lineno, "end": lineno, "doc": doc, "com": com,
                    "body": "",
                }
                if "=>" in raw or (raw.count("{") > 0 and raw.count("{") == raw.count("}")):
                    member["body"] = raw
                    cur.members.append(member)
                elif stripped.endswith(";"):
                    cur.members.append(member)  # interface member, no body
                else:
                    pending_member = member
                    body_open_depth = depth if "{" in raw else depth
                    if "{" not in raw:
                        # signature line without brace: body starts next line
                        body_open_depth = depth
                    body_buf = []
                i += 1
                continue

            mf = _RE_FIELD.match(raw)
            if mf and mf.group("type") not in _MODIFIER_WORDS:
                doc, com = flush_trivia()
                cur.members.append({
                    "mkind": "Field", "name": mf.group("name"),
                    "type": mf.group("type"),
                    "acc": _acc_name(mf.group("acc"), "Private"),
                    "start": lineno, "end": lineno, "doc": doc, "com": com,
                })
                cur.fields[mf.group("name")] = mf.group("type")
                i += 1
                continue

            i += 1
            continue

        # outside any type
        depth += opens - closes
        if stripped and not stripped.startswith(("using", "namespace")):
            flush_trivia()
        i += 1

    if cur is not None:  # unterminated type — tolerate
        cur.end = n
        types.append(cur)

    # --- emission ---------------------------------------------------------
    first_type_ns = types[0].ns if types else None
    # file namespace override (CSharpHandler.cs:36-42)
    em.filemeta(first_type_ns)

    member_ns = first_type_ns  # SymbolMapper: members get fileNamespace
    cand_ns = ([file_ns] if file_ns else []) + usings

    # using-directive dependencies (RoslynSymbolProcessor.cs:47-65):
    # resolved via the namespace dictionary at link time; in-repo namespaces
    # are same-assembly -> no edge, external -> dangling DEPENDS_ON
    seen_using = set()
    for u in usings:
        if u in seen_using:
            continue
        seen_using.add(u)
        em.mention("using", file_key, R_DEPENDS_ON, u, None, [], None)

    for t in types:
        if not _passes(t.acc, min_acc):
            continue
        em.symbol(t.key, t.name, "NamedType", t.name, f"global::{t.display}",
                  t.acc, t.ns or None, t.start, t.end, t.doc, t.comments)

        for mrec in t.members:
            acc = mrec["acc"]
            if not _passes(acc, min_acc, mrec.get("explicit_iface", False)):
                continue
            mk = mrec["mkind"]
            name = mrec["name"]
            if mk == "EnumMember":
                display = f"{t.display}.{name}"
                key = keys.csharp_key(repo, display)
                em.symbol(key, name, "Field", name, f"global::{display}", "Public",
                          member_ns, mrec["start"], mrec["end"], mrec["doc"], mrec["com"])
                em.rel(t.key, key, R_CONTAINS)
                continue

            if mk == "Method":
                if mrec["is_ctor"]:
                    ptoks = [p[0] for p in mrec["params"]]
                    display = f"{t.display}.{name}({', '.join(ptoks)})"
                    sym_name = ".ctor"  # Roslyn IMethodSymbol.Name for constructors
                else:
                    ptoks = [p[0] for p in mrec["params"]]
                    display = f"{t.display}.{name}({', '.join(ptoks)})"
                    sym_name = name
                key = keys.csharp_key(repo, display)
                em.symbol(key, sym_name, "Method", sym_name, f"global::{display}",
                          acc, member_ns, mrec["start"], mrec["end"],
                          mrec["doc"], mrec["com"])
                em.rel(t.key, key, R_CONTAINS)
                # param-type deps from the containing TYPE
                # (MemberDependencyExtractor.cs:232-243)
                for ptok, _pn in mrec["params"]:
                    _emit_type_dep(em, repo, t.key, ptok, cand_ns)
                # return-type dep for non-ctors (:245-253)
                if not mrec["is_ctor"] and mrec["ret"]:
                    _emit_type_dep(em, repo, t.key, mrec["ret"], cand_ns)
                # body invokes (:77-182)
                _emit_invokes(em, repo, key, t, mrec.get("body", ""), cand_ns)
                continue

            # Property / Field / Event: type dep from containing type
            display = f"{t.display}.{name}"
            key = keys.csharp_key(repo, display)
            em.symbol(key, name, mk, name, f"global::{display}", acc,
                      member_ns, mrec["start"], mrec["end"], mrec["doc"], mrec["com"])
            em.rel(t.key, key, R_CONTAINS)
            _emit_type_dep(em, repo, t.key, mrec["type"], cand_ns)


def _emit_type_dep(em: Emitter, repo: str, from_key: str, tok: str,
                   cand_ns: list[str]) -> None:
    """DEPENDS_ON from the containing type to a referenced type
    (MemberDependencyExtractor.cs:294-302). Keyword/BCL types resolve to
    metadata symbols whose keys dangle; unknown identifiers become mentions
    resolved against the in-repo dictionary (IErrorTypeSymbol -> no edge)."""
    tok = tok.rstrip("?")
    if tok in KEYWORD_TYPES:
        em.rel(from_key, keys.csharp_key(repo, tok), R_DEPENDS_ON)
    elif tok in EXTERNAL_TYPE_DISPLAY:
        em.rel(from_key, keys.csharp_key(repo, EXTERNAL_TYPE_DISPLAY[tok]), R_DEPENDS_ON)
    elif tok.startswith("System."):
        em.rel(from_key, keys.csharp_key(repo, tok), R_DEPENDS_ON)
    else:
        em.mention("type", from_key, R_DEPENDS_ON, tok, None, cand_ns, None)


def _emit_invokes(em: Emitter, repo: str, caller_key: str, t: _Type,
                  body: str, cand_ns: list[str]) -> None:
    """INVOKES edges from method bodies with per-callee dedup
    (MemberDependencyExtractor.cs:90,218-230). Receivers are classified at
    lex time: this/bare -> own type; field -> declared field type token;
    known-external -> dangling direct edge; unknown locals -> dangling."""
    if not body:
        return
    seen: set[tuple] = set()
    # strip the signature (its param list must not match as a call)
    if "\n" in body:
        text = "\n".join(body.split("\n")[1:])
    else:
        text = body.split(")", 1)[1] if ")" in body else body

    for m in _RE_NEW.finditer(text):
        tok, nargs = m.group(1), _count_args(m.group(2))
        k = ("new", tok, nargs)
        if k in seen:
            continue
        seen.add(k)
        if tok in EXTERNAL_TYPE_DISPLAY or tok in KEYWORD_TYPES or tok.startswith("System."):
            disp = EXTERNAL_TYPE_DISPLAY.get(tok, tok)
            em.rel(caller_key, keys.csharp_key(repo, f"{disp}.{disp.split('.')[-1]}(…)"),
                   R_INVOKES)
        else:
            em.mention("ctor", caller_key, R_INVOKES, tok, None, cand_ns, nargs)

    for m in _RE_CALL.finditer(text):
        recv, name, nargs = m.group("recv"), m.group("name"), _count_args(m.group(3))
        if name in _MODIFIER_WORDS or (recv is None and name in _MODIFIER_WORDS):
            continue
        # skip the `new X(...)` matches already handled
        pre = text[max(0, m.start() - 4):m.start()]
        if pre.endswith("new ") or pre.endswith("new"):
            continue
        k = ("call", recv, name, nargs)
        if k in seen:
            continue
        seen.add(k)
        if recv is None or recv == "this":
            # own-type call: resolve against own type display directly
            em.mention("invoke", caller_key, R_INVOKES, name, t.display, [], nargs)
        elif recv in t.fields:
            ftok = t.fields[recv].rstrip("?")
            if ftok in KEYWORD_TYPES or ftok in EXTERNAL_TYPE_DISPLAY or ftok.startswith("System."):
                disp = EXTERNAL_TYPE_DISPLAY.get(ftok, ftok)
                em.rel(caller_key, keys.csharp_key(repo, f"{disp}.{name}(…)"), R_INVOKES)
            else:
                em.mention("invoke_via", caller_key, R_INVOKES, name, ftok, cand_ns, nargs)
        elif recv in EXTERNAL_TYPE_DISPLAY or recv.startswith("System."):
            disp = EXTERNAL_TYPE_DISPLAY.get(recv, recv)
            em.rel(caller_key, keys.csharp_key(repo, f"{disp}.{name}(…)"), R_INVOKES)
        else:
            # static call on an in-repo type? try resolving the receiver as a
            # type; locals/params fall through to a dangling key at link time
            em.mention("invoke_static", caller_key, R_INVOKES, name, recv, cand_ns, nargs)

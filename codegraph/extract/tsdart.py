"""TypeScript/JavaScript + Dart subset lexers (reference H12/H13).

Replicate the output of the ts-analyzer / dart-analyzer bridges plus the C#
re-keying layer over the generator's template subset:

* TS symbols keyed ``{fileKey}:{Kind}:{name}:{startLine}``
  (TypeScriptHandlerBase.cs:74) with kinds hardcoded ``TypeScript*`` even for
  .js files — the config KindPrefix knob is declared but never applied
  (config.json:5-6 vs visitor.ts:106-337).
* fqn ``@{project}/{relInProjectPath}::{Class.}name`` (visitor.ts:409-413);
  files with no ancestor package.json are skipped entirely
  (TypeScriptHandlerBase.cs:36-41).
* edges use lowercase kind tokens class/method/file/package/constructor with
  null lines (visitor.ts:354-405,486-496), so from/to keys never equal symbol
  keys and every TS/Dart relationship drops at entity linking — reference
  behavior the replica must keep (SURVEY §1.4.1).
* Dart kinds ``Dart*`` (ast_visitor.dart:50-412); accessibility: ``_`` prefix
  -> Private, ``@protected`` -> Protected, ``@visibleForTesting`` -> Internal
  (ast_visitor.dart:39-48).
"""

from __future__ import annotations

import posixpath
import re

from codegraph import keys
from codegraph.extract.base import Emitter
from codegraph.schema import (ACC_NOT_APPLICABLE, ACC_ORDER, R_CONTAINS,
                              R_DEPENDS_ON, R_HAS_TAG, R_INVOKES)

_TS_IMPORT_RE = re.compile(r"^import\s+.*?from\s+['\"]([^'\"]+)['\"]", re.MULTILINE)
_TS_CLASS_RE = re.compile(
    r"^(?:export\s+)?(?P<abstract>abstract\s+)?class\s+(?P<name>\w+)"
    r"(?:\s+extends\s+(?P<base>[\w.]+))?(?:\s+implements\s+(?P<ifaces>[\w.,\s]+?))?\s*\{",
    re.MULTILINE)
_TS_IFACE_RE = re.compile(r"^(?:export\s+)?interface\s+(?P<name>\w+)", re.MULTILINE)
_TS_ENUM_RE = re.compile(r"^(?:export\s+)?enum\s+(?P<name>\w+)", re.MULTILINE)
_TS_TYPE_RE = re.compile(r"^(?:export\s+)?type\s+(?P<name>\w+)\s*=", re.MULTILINE)
_TS_FUNC_RE = re.compile(r"^(?:export\s+)?(?:async\s+)?function\s+(?P<name>\w+)\s*\(", re.MULTILINE)
_TS_ARROW_RE = re.compile(r"^(?:export\s+)?const\s+(?P<name>\w+)\s*=\s*(?:async\s*)?\([^)]*\)?\s*=>|"
                          r"^(?:export\s+)?const\s+(?P<name2>\w+)\s*=\s*\(\)\s*=>", re.MULTILINE)
_TS_FIELD_RE = re.compile(
    r"^[ \t]+(?P<acc>private|protected|public)?[ \t]*(?:readonly\s+)?(?P<name>\w+)\s*:\s*[\w.<>\[\]]+\s*(?:=[^;]*)?;",
    re.MULTILINE)
_TS_CTOR_RE = re.compile(r"^[ \t]+constructor\s*\(", re.MULTILINE)
_TS_GETTER_RE = re.compile(r"^[ \t]+(?P<acc>private|protected|public)?[ \t]*get\s+(?P<name>\w+)\s*\(", re.MULTILINE)
_TS_SETTER_RE = re.compile(r"^[ \t]+(?P<acc>private|protected|public)?[ \t]*set\s+(?P<name>\w+)\s*\(", re.MULTILINE)
_TS_NAMESPACE_RE = re.compile(r"^(?:export\s+)?namespace\s+(?P<name>\w+)", re.MULTILINE)
_TS_DECORATOR_RE = re.compile(r"^@(\w+)\s*(?:\([^)]*\))?\s*$")
_TS_METHOD_RE = re.compile(
    r"^[ \t]+(?P<acc>private|protected|public)?[ \t]*(?:async\s+)?(?P<name>\w+)\s*\([^)]*\)\s*:\s*[\w.<>\[\]]+\s*\{",
    re.MULTILINE)
_TS_CALL_RE = re.compile(r"(?:this\.)?(\w+)\s*\(")
_TS_NEW_RE = re.compile(r"\bnew\s+(\w+)\s*\(")
_TS_DOC_RE = re.compile(r"/\*\*\s*(.*?)\s*\*/", re.DOTALL)


def _line_of(content: str, idx: int) -> int:
    return keys.line_number(content, idx)


def _acc_passes(acc: str, min_acc: int) -> bool:
    """TypeScriptHandlerBase.cs:138-155: include-all when min==NotApplicable,
    else mapped accessibility >= min (unknown maps to Public)."""
    if min_acc == ACC_NOT_APPLICABLE:
        return True
    return ACC_ORDER.get(acc, 6) >= min_acc


def _doc_before(content: str, idx: int) -> str | None:
    """jsdoc /** ... */ immediately preceding a declaration (decorator lines
    in between don't detach it — they are part of the decorated node)."""
    prefix = content[:idx]
    m = None
    for m in _TS_DOC_RE.finditer(prefix):
        pass
    if m is None:
        return None
    between = [ln for ln in prefix[m.end():].split("\n")
               if ln.strip() and not ln.strip().startswith("@")]
    if not between:
        return m.group(1)
    return None


def _decorators_before(content: str, idx: int) -> list[str]:
    """Decorator names on the lines directly above a declaration
    (visitor.ts:153-158 emits them as HAS_TAG relationships)."""
    out: list[str] = []
    for ln in reversed(content[:idx].split("\n")[:-1]):
        s = ln.strip()
        if not s:
            continue
        md = _TS_DECORATOR_RE.match(s)
        if md:
            out.append(md.group(1))
            continue
        break
    return list(reversed(out))


_TS_SKIP_RE = re.compile(
    r"(\.d\.ts$)|(\.generated\.)|((^|/)(dist|build|\.next|\.nuxt|coverage)/)")


def _norm_cfg_entry(e: str) -> str:
    """tsconfig include/exclude entry -> dir/file prefix: './src/**/*' ->
    'src' (the documented subset of the glob grammar
    parseJsonConfigFileContent accepts, analyzer.ts:21)."""
    if e.startswith("./"):
        e = e[2:]
    for suffix in ("/**/*", "/**", "/*"):
        if e.endswith(suffix):
            e = e[: -len(suffix)]
            break
    return e.rstrip("/")


def _cfg_hit(rel: str, entries: list[str]) -> bool:
    for e in entries:
        p = _norm_cfg_entry(e)
        if p == "" or rel == p or rel.startswith(p + "/"):
            return True
    return False


def _tsconfig_selects(rel_in_project: str, inc_json: str | None,
                      exc_json: str | None) -> bool:
    """File-selection gate from the project root's tsconfig.json
    (analyzer.ts:16-33): files matched by ``include`` (everything when the
    key is absent) minus ``exclude`` form the TS program; everything else
    is never analyzed."""
    import json

    def _arr(s):
        if s is None:
            return None
        try:
            v = json.loads(s)
        except ValueError:
            return None
        return [e for e in v if isinstance(e, str)] if isinstance(v, list) else None

    inc = _arr(inc_json)
    if inc is not None and not _cfg_hit(rel_in_project, inc):
        return False
    exc = _arr(exc_json)
    if exc and _cfg_hit(rel_in_project, exc):
        return False
    return True


def _resolve_path_alias(spec: str, paths_json: str | None,
                        base_url: str | None) -> str | None:
    """``compilerOptions.paths`` alias resolution (the documented subset of
    TS module resolution the analyzer gets via parseJsonConfigFileContent,
    analyzer.ts:11-52): the FIRST matching pattern wins, its first
    substitution applies, '*' captures the specifier suffix; the result is
    joined under ``baseUrl`` (default the project root). Returns a
    project-root-relative path, or None when no alias matches (the
    specifier then stays a bare package import)."""
    if not paths_json:
        return None
    import json

    try:
        paths = json.loads(paths_json)
    except ValueError:
        return None
    if not isinstance(paths, dict):
        return None
    base = base_url or "."
    if base.startswith("./"):
        base = base[2:]
    base = base.strip("/")
    for pat, targets in paths.items():
        if not isinstance(targets, list) or not targets or \
                not isinstance(targets[0], str):
            continue
        tgt = targets[0]
        if pat.endswith("*"):
            pre = pat[:-1]
            if not spec.startswith(pre):
                continue
            mapped = tgt.replace("*", spec[len(pre):], 1)
        elif spec == pat:
            mapped = tgt
        else:
            continue
        if mapped.startswith("./"):
            mapped = mapped[2:]
        if base and base != ".":
            mapped = posixpath.join(base, mapped)
        return posixpath.normpath(mapped)
    return None


def extract_ts(em: Emitter, content: str, repo: str, file_key: str,
               min_acc: int, ts_projects: dict,
               resolved: tuple | None = None,
               ts_configs: dict | None = None) -> None:
    ns = keys.dir_namespace(em.path)
    em.filemeta(ns or None)

    # F8: declaration files, *.generated.*, and build-output dirs skipped
    # (tools/ts-analyzer/src/analyzer.ts:23,39-42,107-119)
    if _TS_SKIP_RE.search(file_key):
        return

    # find governing package.json (TypeScriptHandlerBase.cs:36-41,115-129).
    # ``resolved`` carries the Spark-side path-prefix-join answer when the
    # package dim was too big to broadcast (dispatch.attach_ts_projects);
    # otherwise walk the broadcast dict up the ancestor chain.
    inc_json = exc_json = paths_json = base_url = None
    if resolved is not None:
        project, project_dir = resolved[0], resolved[1]
        if len(resolved) > 2:
            inc_json, exc_json = resolved[2], resolved[3]
        if len(resolved) > 4:
            paths_json, base_url = resolved[4], resolved[5]
    else:
        project = None
        project_dir = None
        d = posixpath.dirname(file_key)
        while True:
            if (repo, d) in ts_projects:
                project = ts_projects[(repo, d)]
                project_dir = d
                break
            if d == "":
                break
            d = posixpath.dirname(d)
        if project is not None and ts_configs:
            cfg = ts_configs.get((repo, project_dir)) or (None, None)
            inc_json, exc_json = cfg[0], cfg[1]
            if len(cfg) > 2:
                paths_json, base_url = cfg[2], cfg[3]
    if project is None:
        return  # no package.json ancestor -> analyzer skipped the file

    rel_in_project = file_key[len(project_dir) + 1:] if project_dir else file_key

    # tsconfig file selection (analyzer.ts:16-33): outside the program ->
    # the analyzer never visits the file
    if not _tsconfig_selects(rel_in_project, inc_json, exc_json):
        return

    def fqn(name: str, cls: str | None = None) -> str:
        prefix = f"@{project}/{rel_in_project}"
        return f"{prefix}::{cls}.{name}" if cls else f"{prefix}::{name}"

    def sym(kind: str, name: str, klass: str, line: int, acc: str = "Public",
            doc: str | None = None, cls: str | None = None):
        if not _acc_passes(acc, min_acc):
            return
        k = keys.text_key(file_key, kind, name, line)
        em.symbol(k, name, kind, klass, fqn(name, cls), acc, ns, line,
                  documentation=doc)

    # imports -> file-level DEPENDS_ON with lowercase 'file' kind tokens
    # (visitor.ts:354-372) — these keys never match symbols and drop at J1
    for m in _TS_IMPORT_RE.finditer(content):
        spec = m.group(1)
        line = _line_of(content, m.start())
        is_rel = spec.startswith(".") or spec.startswith("/")
        # compilerOptions.paths aliases resolve like relative file imports
        # (the TS module resolver the analyzer's program uses honors them)
        aliased = None if is_rel else _resolve_path_alias(spec, paths_json,
                                                          base_url)
        if is_rel or aliased is not None:
            to_file = aliased if aliased is not None else posixpath.normpath(
                posixpath.join(posixpath.dirname(rel_in_project), spec))
            if not posixpath.splitext(to_file)[1]:
                to_file += ".ts"
            to_symbol = to_file
            to_file_key = (f"{project_dir}/{to_file}" if project_dir else to_file)
            to_kind = "file"
        else:
            to_symbol = spec.split("/")[0]
            to_file_key = file_key
            to_kind = "package"
        from_key = keys.text_key(file_key, "file", rel_in_project, line)
        to_key = keys.text_key(to_file_key, to_kind, to_symbol)
        em.rel(from_key, to_key, R_DEPENDS_ON)

    lines = content.split("\n")

    for m in _TS_CLASS_RE.finditer(content):
        name = m.group("name")
        line = _line_of(content, m.start())
        kind = "TypeScriptAbstractClass" if m.group("abstract") else "TypeScriptClass"
        sym(kind, name, "class", line, "Public", _doc_before(content, m.start()))
        cls_key_tok = keys.text_key(file_key, "class", name, line)
        # heritage -> DEPENDS_ON (visitor.ts:118-131) — lowercase tokens, drop
        targets = []
        if m.group("base"):
            targets.append(m.group("base"))
        if m.group("ifaces"):
            targets += [t.strip() for t in m.group("ifaces").split(",") if t.strip()]
        for t in targets:
            em.rel(cls_key_tok, keys.text_key(file_key, "class", t), R_DEPENDS_ON)
        # decorators -> HAS_TAG (visitor.ts:153-158); lowercase 'decorator'
        # kind tokens, so these candidates drop at J1 like all TS edges
        for d in _decorators_before(content, m.start()):
            em.rel(cls_key_tok, keys.text_key(file_key, "decorator", d), R_HAS_TAG)

        # class body members
        body_start = m.end()
        depth = 1
        j = body_start
        while j < len(content) and depth > 0:
            if content[j] == "{":
                depth += 1
            elif content[j] == "}":
                depth -= 1
            j += 1
        body = content[body_start:j]
        boff = body_start

        for fm in _TS_FIELD_RE.finditer(body):
            fl = _line_of(content, boff + fm.start())
            sym("TypeScriptField", fm.group("name"), "field", fl,
                _acc_map(fm.group("acc")), cls=name)
            em.rel(cls_key_tok, keys.text_key(file_key, "field", fm.group("name"), fl),
                   R_CONTAINS)
        for cm in _TS_CTOR_RE.finditer(body):
            cl = _line_of(content, boff + cm.start())
            sym("TypeScriptConstructor", "constructor", "constructor", cl, "Public", cls=name)
            em.rel(cls_key_tok, keys.text_key(file_key, "constructor", "constructor", cl),
                   R_CONTAINS)
        for gm in _TS_GETTER_RE.finditer(body):
            gl = _line_of(content, boff + gm.start())
            sym("TypeScriptProperty", gm.group("name"), "property", gl,
                _acc_map(gm.group("acc")), cls=name)
            em.rel(cls_key_tok, keys.text_key(file_key, "property", gm.group("name"), gl),
                   R_CONTAINS)
        # setter side: its OWN TypeScriptProperty symbol at its own line
        # (get/set both route through handleMethod, visitor.ts:57,225-227)
        for sm in _TS_SETTER_RE.finditer(body):
            sl = _line_of(content, boff + sm.start())
            sym("TypeScriptProperty", sm.group("name"), "property", sl,
                _acc_map(sm.group("acc")), cls=name)
            em.rel(cls_key_tok, keys.text_key(file_key, "property", sm.group("name"), sl),
                   R_CONTAINS)
        for mm in _TS_METHOD_RE.finditer(body):
            mname = mm.group("name")
            if mname in ("constructor", "get", "if", "for", "while"):
                continue
            ml = _line_of(content, boff + mm.start())
            sym("TypeScriptMethod", mname, "method", ml, _acc_map(mm.group("acc")), cls=name)
            mkey = keys.text_key(file_key, "method", mname, ml)
            em.rel(cls_key_tok, mkey, R_CONTAINS)
            # calls / new inside the member line (visitor.ts:374-405)
            stmt = body[mm.end():body.find("}", mm.end()) if body.find("}", mm.end()) > 0 else len(body)]
            for c in _TS_CALL_RE.finditer(stmt):
                if stmt[max(0, c.start() - 4):c.start()].endswith("new "):
                    continue  # NewExpression, handled below (visitor.ts:391-405)
                em.rel(keys.text_key(file_key, "method", mname),
                       keys.text_key(file_key, "method", c.group(1)), R_INVOKES)
            for nw in _TS_NEW_RE.finditer(stmt):
                em.rel(keys.text_key(file_key, "method", mname),
                       keys.text_key(file_key, "constructor", nw.group(1)), R_INVOKES)

    for m in _TS_NAMESPACE_RE.finditer(content):
        sym("TypeScriptNamespace", m.group("name"), "namespace",
            _line_of(content, m.start()), "Public",
            _doc_before(content, m.start()))
    for m in _TS_IFACE_RE.finditer(content):
        sym("TypeScriptInterface", m.group("name"), "interface",
            _line_of(content, m.start()), "Public", _doc_before(content, m.start()))
    for m in _TS_ENUM_RE.finditer(content):
        sym("TypeScriptEnum", m.group("name"), "enum", _line_of(content, m.start()))
    for m in _TS_TYPE_RE.finditer(content):
        sym("TypeScriptTypeAlias", m.group("name"), "type", _line_of(content, m.start()))
    for m in _TS_FUNC_RE.finditer(content):
        name = m.group("name")
        line = _line_of(content, m.start())
        sym("TypeScriptFunction", name, "function", line)
        # top-level function body calls
        rest = content[m.end():]
        end = rest.find("}")
        for c in _TS_CALL_RE.finditer(rest[:end if end > 0 else 0]):
            em.rel(keys.text_key(file_key, "function", name),
                   keys.text_key(file_key, "method", c.group(1)), R_INVOKES)
    for m in _TS_ARROW_RE.finditer(content):
        name = m.group("name") or m.group("name2")
        if name:
            sym("TypeScriptFunction", name, "function", _line_of(content, m.start()))


def _acc_map(tok: str | None) -> str:
    return {"private": "Private", "protected": "Protected",
            "public": "Public"}.get(tok or "", "Public")


# ---------------------------------------------------------------------------
# Dart
# ---------------------------------------------------------------------------

_DART_IMPORT_RE = re.compile(r"^import\s+['\"]([^'\"]+)['\"]", re.MULTILINE)
_DART_CLASS_RE = re.compile(
    r"^(?:abstract\s+)?class\s+(?P<name>\w+)"
    r"(?:\s+extends\s+(?P<base>\w+))?(?:\s+with\s+(?P<mixins>[\w,\s]+?))?"
    r"(?:\s+implements\s+(?P<ifaces>[\w,\s]+?))?\s*\{", re.MULTILINE)
_DART_MIXIN_RE = re.compile(r"^mixin\s+(?P<name>\w+)", re.MULTILINE)
_DART_ENUM_RE = re.compile(r"^enum\s+(?P<name>\w+)", re.MULTILINE)
_DART_EXT_RE = re.compile(r"^extension\s+(?P<name>\w+)\s+on\s+", re.MULTILINE)
_DART_EXTTYPE_RE = re.compile(r"^extension type\s+(?P<name>\w+)\s*\(", re.MULTILINE)
_DART_OPERATOR_RE = re.compile(
    r"^[ \t]+[\w<>]+[ \t]+operator\s*(?P<op>\S+)\s*\([^)]*\)\s*(?:\{|=>)",
    re.MULTILINE)
_DART_ANNOTATION_RE = re.compile(r"^@(\w+)\s*(?:\([^)]*\))?\s*$")
_DART_TYPEDEF_RE = re.compile(r"^typedef\s+(?P<name>\w+)\s*=", re.MULTILINE)
_DART_FUNC_RE = re.compile(r"^(?P<ret>[\w<>]+)\s+(?P<name>_?\w+)\s*\([^)]*\)\s*(?:\{|=>)", re.MULTILINE)
_DART_TOPVAR_RE = re.compile(r"^(?:final|const)\s+[\w<>]+\s+(?P<name>_?\w+)\s*=", re.MULTILINE)
_DART_TOPGET_RE = re.compile(r"^[\w<>]+\s+get\s+(?P<name>_?\w+)\s*(?:=>|\{)", re.MULTILINE)
_DART_FIELD_RE = re.compile(r"^[ \t]+(?:final\s+|const\s+|late\s+)?(?P<type>[\w<>]+)[ \t]+(?P<name>_?\w+)\s*(?:=[^;]*)?;", re.MULTILINE)
_DART_GETTER_RE = re.compile(r"^[ \t]+[\w<>]+[ \t]+get[ \t]+(?P<name>_?\w+)\s*=>", re.MULTILINE)
_DART_SETTER_RE = re.compile(
    r"^[ \t]+(?:[\w<>]+[ \t]+)?set[ \t]+(?P<name>_?\w+)\s*\(", re.MULTILINE)
_DART_TOPSET_RE = re.compile(
    r"^(?:[\w<>]+\s+)?set\s+(?P<name>_?\w+)\s*\(", re.MULTILINE)
_DART_METHOD_RE = re.compile(r"^[ \t]+(?P<ret>[\w<>]+)[ \t]+(?P<name>_?\w+)\s*\([^)]*\)\s*(?:\{|=>)", re.MULTILINE)
_DART_CALL_RE = re.compile(r"(\w+)\.(\w+)\s*\(|(?<![\w.])(\w+)\s*\(")
_DART_INVOKE_RE = re.compile(r"((?:\w+\s*\.\s*)*)(\w+)\s*\(")
_DART_CTRL_KEYWORDS = {"if", "for", "while", "switch", "catch", "assert",
                       "return", "throw", "await", "yield", "super", "this"}
_DART_LOCAL_FN_RE = re.compile(r"(?:var|final)\s+(\w+)\s*=")


def _dart_call_kind(callee: str, has_receiver: bool, fn_locals: set) -> str | None:
    """Invocation toKind per the resolved-AST node the reference visits
    (ast_visitor.dart:431-485): any MethodInvocation (with or without a
    target) -> 'method'; invoking a function-typed local variable is
    rewritten to FunctionExpressionInvocation with a SimpleIdentifier
    function -> 'function'; an uppercase bare call is an
    InstanceCreationExpression -> 'constructor'. Control keywords and
    super()/this() redirects (Super-/RedirectingConstructorInvocation
    nodes, which the visitor does not emit) return None."""
    if callee in _DART_CTRL_KEYWORDS:
        return None
    if has_receiver:
        return "method"
    if callee in fn_locals:
        return "function"
    if callee[0].isupper():
        return "constructor"
    return "method"


def _dart_acc(name: str, annotations: str = "") -> str:
    """ast_visitor.dart:39-48: annotation metadata outranks the _-prefix."""
    if "visibleForTesting" in annotations:
        return "Internal"
    if "protected" in annotations:
        return "Protected"
    if name.startswith("_"):
        return "Private"
    return "Public"


def _dart_annotations_before(content: str, idx: int) -> str:
    """Annotation lines (node.metadata) directly above a declaration,
    e.g. '@protected' / '@visibleForTesting'."""
    names: list[str] = []
    for ln in reversed(content[:idx].split("\n")[:-1]):
        s = ln.strip()
        if not s:
            continue
        ma = _DART_ANNOTATION_RE.match(s)
        if ma:
            names.append(ma.group(1))
            continue
        break
    return " ".join(names)


def _dart_body(content: str, from_idx: int, consumed_brace: bool = False):
    """Brace-matched declaration body starting at/after ``from_idx``.
    Returns (body, body_offset); empty body when no brace follows."""
    if consumed_brace:
        start = from_idx
    else:
        b = content.find("{", from_idx)
        if b < 0:
            return "", from_idx
        start = b + 1
    depth = 1
    j = start
    while j < len(content) and depth > 0:
        if content[j] == "{":
            depth += 1
        elif content[j] == "}":
            depth -= 1
        j += 1
    return content[start:j], start


def _make_dart_member_walk(em: Emitter, content: str, file_key: str, sym):
    """Member scan shared by class/mixin/extension bodies: the reference
    sets _currentClass for all three, so fields/getters/setters/operators/
    methods emit identically (ast_visitor.dart:51-177, 213-316)."""

    def walk(body: str, boff: int, name: str, owner_tok: str,
             allow_ctor: bool) -> None:
        for fm in _DART_FIELD_RE.finditer(body):
            fl = _line_of(content, boff + fm.start())
            sym("DartField", fm.group("name"), "field", fl, at=boff + fm.start())
            em.rel(owner_tok, keys.text_key(file_key, "field", fm.group("name"), fl), R_CONTAINS)
            em.rel(owner_tok, keys.text_key(file_key, "class", fm.group("type")), R_DEPENDS_ON)
        for gm in _DART_GETTER_RE.finditer(body):
            gl = _line_of(content, boff + gm.start())
            sym("DartProperty", gm.group("name"), "property", gl, at=boff + gm.start())
            em.rel(owner_tok, keys.text_key(file_key, "property", gm.group("name"), gl), R_CONTAINS)
        # setters are DartProperty too (ast_visitor.dart:263-275: isGetter
        # OR isSetter -> kind DartProperty, CONTAINS toKind 'property')
        for sm in _DART_SETTER_RE.finditer(body):
            sl = _line_of(content, boff + sm.start())
            sym("DartProperty", sm.group("name"), "property", sl, at=boff + sm.start())
            em.rel(owner_tok, keys.text_key(file_key, "property", sm.group("name"), sl), R_CONTAINS)
        # operator declarations (ast_visitor.dart:276-288): kind
        # DartOperator, fqn 'operator <op>'
        for om in _DART_OPERATOR_RE.finditer(body):
            ol = _line_of(content, boff + om.start())
            op = om.group("op")
            sym("DartOperator", op, "operator", ol, at=boff + om.start(),
                fqn=f"operator {op}")
            em.rel(owner_tok, keys.text_key(file_key, "operator", op, ol), R_CONTAINS)
        if allow_ctor:
            ctor = re.search(rf"^[ \t]+{name}\s*\(", body, re.MULTILINE)
            if ctor:
                cl = _line_of(content, boff + ctor.start())
                sym("DartConstructor", name, "constructor", cl, at=boff + ctor.start())
                em.rel(owner_tok, keys.text_key(file_key, "constructor", name, cl), R_CONTAINS)
            # named constructors: display '$class.$name', accessibility from
            # the SHORT name (ast_visitor.dart:319-345)
            for nc in re.finditer(rf"^[ \t]+{name}\.(_?\w+)\s*\(", body, re.MULTILINE):
                short = nc.group(1)
                cl = _line_of(content, boff + nc.start())
                ann = _dart_annotations_before(content, boff + nc.start())
                disp = f"{name}.{short}"
                sym("DartConstructor", disp, "constructor", cl,
                    acc=_dart_acc(short, ann))
                em.rel(owner_tok, keys.text_key(file_key, "constructor", disp, cl), R_CONTAINS)
        for mm in _DART_METHOD_RE.finditer(body):
            mname = mm.group("name")
            if mname == name or mm.group("ret") in ("final", "const", "return",
                                                    "get", "set"):
                continue
            ml = _line_of(content, boff + mm.start())
            sym("DartMethod", mname, "method", ml, at=boff + mm.start())
            mtok = keys.text_key(file_key, "method", mname, ml)
            em.rel(owner_tok, mtok, R_CONTAINS)
            stmt_end = body.find("}", mm.end())
            stmt = body[mm.end():stmt_end if stmt_end > 0 else len(body)]
            fn_locals = set(_DART_LOCAL_FN_RE.findall(stmt))
            for c in _DART_INVOKE_RE.finditer(stmt):
                kind = _dart_call_kind(c.group(2), bool(c.group(1)), fn_locals)
                if kind is None:
                    continue
                em.rel(keys.text_key(file_key, "method", mname),
                       keys.text_key(file_key, kind, c.group(2)), R_INVOKES)

    return walk


def extract_dart(em: Emitter, content: str, repo: str, file_key: str,
                 min_acc: int) -> None:
    ns = keys.dir_namespace(em.path)
    em.filemeta(ns or None)

    def sym(kind: str, name: str, klass: str, line: int, acc: str | None = None,
            doc: str | None = None, at: int | None = None, fqn: str | None = None):
        """at: content offset of the declaration — its preceding annotation
        lines (node.metadata) feed the accessibility map
        (ast_visitor.dart:39-48)."""
        if acc is None:
            ann = _dart_annotations_before(content, at) if at is not None else ""
            a = _dart_acc(name, ann)
        else:
            a = acc
        if not _acc_passes(a, min_acc):
            return
        k = keys.text_key(file_key, kind, name, line)
        em.symbol(k, name, kind, klass, fqn if fqn is not None else name,
                  a, ns, line, documentation=doc)

    for m in _DART_IMPORT_RE.finditer(content):
        spec = m.group(1)
        line = _line_of(content, m.start())
        em.rel(keys.text_key(file_key, "file", file_key, line),
               keys.text_key(file_key, "file", spec), R_DEPENDS_ON)

    for m in _DART_CLASS_RE.finditer(content):
        name = m.group("name")
        line = _line_of(content, m.start())
        sym("DartClass", name, "class", line, at=m.start())
        cls_tok = keys.text_key(file_key, "class", name, line)
        heritage = []
        if m.group("base"):
            heritage.append(m.group("base"))
        if m.group("mixins"):
            heritage += [t.strip() for t in m.group("mixins").split(",") if t.strip()]
        if m.group("ifaces"):
            heritage += [t.strip() for t in m.group("ifaces").split(",") if t.strip()]
        for t in heritage:
            em.rel(cls_tok, keys.text_key(file_key, "class", t), R_DEPENDS_ON)

        body, boff = _dart_body(content, m.end(), consumed_brace=True)
        walk_members = _make_dart_member_walk(em, content, file_key, sym)
        walk_members(body, boff, name, cls_tok, allow_ctor=True)

    # mixins and extensions set _currentClass in the reference, so their
    # members emit exactly like class members (ast_visitor.dart:113-177)
    for m in _DART_MIXIN_RE.finditer(content):
        name = m.group("name")
        line = _line_of(content, m.start())
        sym("DartMixin", name, "mixin", line, at=m.start())
        body, boff = _dart_body(content, m.end())
        _make_dart_member_walk(em, content, file_key, sym)(
            body, boff, name, keys.text_key(file_key, "mixin", name, line),
            allow_ctor=False)
    # enhanced enums: constants never emit (no EnumConstantDeclaration
    # visitor) but methods inside the body do (_currentClass = enum name)
    for m in _DART_ENUM_RE.finditer(content):
        name = m.group("name")
        line = _line_of(content, m.start())
        sym("DartEnum", name, "enum", line, at=m.start())
        body, boff = _dart_body(content, m.end())
        _make_dart_member_walk(em, content, file_key, sym)(
            body, boff, name, keys.text_key(file_key, "enum", name, line),
            allow_ctor=False)
    for m in _DART_EXT_RE.finditer(content):
        name = m.group("name")
        line = _line_of(content, m.start())
        sym("DartExtension", name, "extension", line, at=m.start())
        body, boff = _dart_body(content, m.end())
        _make_dart_member_walk(em, content, file_key, sym)(
            body, boff, name, keys.text_key(file_key, "extension", name, line),
            allow_ctor=False)
    # extension types (ast_visitor.dart:181-200)
    for m in _DART_EXTTYPE_RE.finditer(content):
        sym("DartExtensionType", m.group("name"), "extensiontype",
            _line_of(content, m.start()), at=m.start())
    for m in _DART_TYPEDEF_RE.finditer(content):
        sym("DartTypeAlias", m.group("name"), "typedef", _line_of(content, m.start()),
            at=m.start())
    for m in _DART_FUNC_RE.finditer(content):
        name = m.group("name")
        ret = m.group("ret")
        if ret in ("class", "mixin", "enum", "extension", "typedef", "import",
                   "final", "const", "get", "set") or name in ("get", "set"):
            continue
        line = _line_of(content, m.start())
        sym("DartFunction", name, "function", line)
        rest = content[m.end():]
        end = rest.find("}")
        stmt = rest[:end if end > 0 else 0]
        fn_locals = set(_DART_LOCAL_FN_RE.findall(stmt))
        for c in _DART_INVOKE_RE.finditer(stmt):
            kind = _dart_call_kind(c.group(2), bool(c.group(1)), fn_locals)
            if kind is None:
                continue
            em.rel(keys.text_key(file_key, "function", name),
                   keys.text_key(file_key, kind, c.group(2)), R_INVOKES)
    for m in _DART_TOPVAR_RE.finditer(content):
        sym("DartField", m.group("name"), "field", _line_of(content, m.start()),
            at=m.start())
    for m in _DART_TOPGET_RE.finditer(content):
        sym("DartProperty", m.group("name"), "property", _line_of(content, m.start()),
            at=m.start())
    # top-level setters: DartProperty like getters (ast_visitor.dart:230-241)
    for m in _DART_TOPSET_RE.finditer(content):
        sym("DartProperty", m.group("name"), "property", _line_of(content, m.start()),
            at=m.start())

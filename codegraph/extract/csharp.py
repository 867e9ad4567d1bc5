"""C# subset lexer replacing the reference's Roslyn pass.

Replicates the *output semantics* of CSharpHandler + RoslynSymbolProcessor +
MemberDependencyExtractor + SymbolMapper
(/root/reference/src/CodeToNeo4j/Technologies/DotNet/CSharp/*.cs,
 Graph/Mapping/SymbolMapper.cs) over a documented C# subset:

* file-scoped (``namespace X;``) and block (``namespace X { ... }``)
  namespace declarations, INCLUDING several per file — each type takes the
  namespace active at its declaration (Roslyn ContainingNamespace,
  SymbolMapper.cs:19-21), member rows carry the FIRST type's namespace
  (fileNamespace, CSharpHandler.cs:36-42), and candidate-namespace lists
  are per type ([own ns] + file usings); block bodies sit at column 0 in
  the subset (legal C#) so member shapes stay line-anchored. Nested blocks
  compose (``X.Y``); nested types one level deep
  (DescendantNodes visits them as their own BaseTypeDeclarationSyntax AND as
  a member of the outer type -> CONTAINS outer->nested,
  RoslynSymbolProcessor.cs:103-113,288); generic type AND method
  declarations display their type parameters (``Ns.Box<T>``,
  ``Ns.Type.Echo<T>(T)``, SymbolMapper.cs:43-47); multi-declarator
  field/event lines expand to one symbol per declarator
  (RoslynSymbolProcessor.cs:216-262); ``partial class`` parts in different
  files share one symbol key (Roslyn merges the declarations into one
  INamedTypeSymbol), so members from every part CONTAINS-attach to the same
  type and cross-part member calls resolve through the member dictionary;
  expression-bodied properties (``int Total => Count;``) are Property
  symbols.
* symbol keys: ``{repoKey}:{display}`` where display mirrors
  SymbolDisplayFormat.CSharpErrorMessageFormat for the subset —
  types ``Ns.Type``, members ``Ns.Type.Name``, methods/ctors
  ``Ns.Type.Name(paramTok, ...)`` with parameter tokens as declared,
  user-defined operators ``Ns.Type.operator +(T, T)`` and conversions
  ``Ns.Type.implicit operator int(T)`` (MemberDependencyExtractorTests.cs
  InlineData shapes :425-500,598-650). Conversion return tokens are assumed
  non-dotted (keyword or bare in-repo name) in this subset.
* kind = Roslyn SymbolKind.ToString(); operator/conversion symbols are
  Methods named op_Addition/op_Implicit/... (IMethodSymbol.Name).
* member-type dependencies (field/property/event/param/return) emit
  DEPENDS_ON from the CONTAINING TYPE key (MemberDependencyExtractor.cs:232-302).
* method bodies emit INVOKES with per-callee dedup for: invocations, object
  creations, user-defined binary/prefix/postfix operators, explicit casts,
  method groups outside invocation position, and user-defined implicit
  conversions at initializer/argument/return positions
  (MemberDependencyExtractor.cs:77-230). Locals are type-tracked through the
  subset's statement shapes; argument types are classified from literals and
  tracked identifiers so entity linking can do overload resolution on
  parameter tokens (link.py).
* ``global using`` directives are additionally emitted as ``global_using``
  mention records: the reference resolves names against the COMPILATION's
  global usings, i.e. every file in the repo (RoslynSymbolProcessor.cs:68-99),
  which link.py replicates with a per-repo broadcast of global namespaces.
* accessibility filter per AccessibilityFilter.cs:14-26 (explicit interface
  implementations always kept).
"""

from __future__ import annotations

import re

from codegraph import keys
from codegraph.extract.base import RS, US, Emitter
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
    "Action": "System.Action",
}

# Roslyn IMethodSymbol.Name for user-defined operators
OP_NAMES = {
    "+": "op_Addition", "-": "op_Subtraction", "*": "op_Multiply",
    "/": "op_Division", "%": "op_Modulus", "==": "op_Equality",
    "!=": "op_Inequality", ">": "op_GreaterThan", "<": "op_LessThan",
    ">=": "op_GreaterThanOrEqual", "<=": "op_LessThanOrEqual",
    "|": "op_BitwiseOr", "&": "op_BitwiseAnd", "^": "op_ExclusiveOr",
    "!": "op_LogicalNot", "~": "op_OnesComplement",
    "++": "op_Increment", "--": "op_Decrement",
}
_CMP_OPS = {"==", "!=", ">", "<", ">=", "<="}

_RE_USING = re.compile(
    r"^\s*(?P<glob>global\s+)?using\s+(?P<stat>static\s+)?([\w.]+)\s*;")
_RE_NAMESPACE = re.compile(r"^\s*namespace\s+([\w.]+)\s*[;{]?\s*$")
_RE_TYPE = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*"
    r"(?:sealed\s+|abstract\s+|static\s+|partial\s+)*"
    r"(?P<tkind>class|interface|struct|record|enum)\s+(?P<name>\w+)"
    r"(?P<targs><[\w, ]+>)?"
)
_RE_EVENT = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*(?:static\s+)?"
    r"event\s+(?P<type>[\w.<>\[\]?]+)\s+(?P<names>\w+(?:\s*,\s*\w+)*)\s*;"
)
_RE_PROPERTY = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*(?:static\s+|virtual\s+|override\s+)*"
    r"(?P<type>[\w.]+(?:<[\w.,<>? \[\]]*>)?(?:\[\])?\??)\s+(?P<name>[\w.]+)\s*\{\s*get"
)
_RE_FIELD = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*"
    r"(?:static\s+|readonly\s+|const\s+)*"
    r"(?P<type>[\w.]+(?:<[\w.,<>? \[\]]*>)?(?:\[\])?\??)"
    r"\s+(?P<names>\w+(?:\s*,\s*\w+)*)\s*(?:=(?!>)[^;]*)?;"
)
# expression-bodied property: `public int Total => Count;` is an
# IPropertySymbol (get-only), not a field (RoslynSymbolProcessor kinds)
_RE_EXPR_PROP = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*(?:static\s+)?"
    r"(?P<type>[\w.<>\[\]?]+)\s+(?P<name>\w+)\s*=>\s*[^;]*;"
)
_RE_OPERATOR = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*static\s+"
    r"(?P<ret>[\w.<>\[\]?]+)\s+operator\s*(?P<op>\+\+|--|[+\-*/%^&|!~]|[<>=!]=?=?)"
    r"\s*\((?P<params>[^)]*)\)"
)
_RE_CONVERSION = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*static\s+"
    r"(?P<ckind>implicit|explicit)\s+operator\s+(?P<ret>[\w.<>\[\]?]+)"
    r"\s*\((?P<params>[^)]*)\)"
)
_RE_METHOD = re.compile(
    r"^\s*(?P<acc>public|internal|private|protected)?\s*"
    r"(?:static\s+|virtual\s+|override\s+|async\s+)*"
    r"(?:(?P<ret>[\w.<>\[\]?]+)\s+)?(?P<name>[\w.]+)(?P<targs><[\w, ]+>)?"
    r"\s*\((?P<params>[^)]*)\)\s*(?:\{|=>|;|$)"
)
_RE_ENUM_MEMBER = re.compile(r"^\s*(?P<name>\w+)\s*(?:=\s*\d+\s*)?,?\s*$")
_RE_DOC = re.compile(r"^\s*///\s?(.*)$")
_RE_COMMENT = re.compile(r"^\s*(//(?!/).*|/\*.*\*/)\s*$")
# body statement shapes
_RE_NEW = re.compile(r"\bnew\s+([\w.]+)\s*\(([^)]*)\)")
_RE_CALL = re.compile(r"(?<![\w.])(?:(?P<recv>this|[\w]+)\.)?(?P<name>\w+)\s*\(([^)]*)\)")
# innermost-call variant for the sweep pass: the argument list may contain
# NO parens, so `Outer(Inner(x))` matches Inner first; Outer matches the
# following sweep once Inner's span is blanked to '#'
_RE_CALL_IN = re.compile(
    r"(?<![\w.])(?:(?P<recv>this|[\w]+)\.)?(?P<name>\w+)\s*\((?P<a>[^()]*)\)")
# lambda parameter lists are NOT call parens: left in place they would keep
# an enclosing call (`Batch((Helper d) => d.Fix())`) permanently
# non-innermost, dropping Batch's edge. Blanked before the sweeps; the
# typed params were already registered as locals from the raw body.
_RE_LAMBDA_PARENS = re.compile(
    r"\(\s*(?:[A-Z]\w*\s+\w+(?:\s*,\s*[A-Z]\w*\s+\w+)*)?\s*\)\s*=>")
# one-level call chain a.B(..).C(..): the head call is matched by _RE_CALL
# (whose lookbehind skips the .C segment); the chained member binds through
# the head's RETURN type at link time (retsig dictionary)
_RE_CHAIN = re.compile(
    r"(?<![\w.])(?:(?P<recv>this|\w+)\.)?(?P<m1>\w+)\s*\((?P<a1>[^)]*)\)"
    r"\s*\.\s*(?P<m2>\w+)\s*\((?P<a2>[^)]*)\)")
# two-level chain a.B().C().D(): D binds through TWO retsig hops (B's return
# resolves C's declaring type, C's return resolves D's). The _RE_CHAIN match
# on the same text gives C its edge; _RE_CALL gives B its edge.
_RE_CHAIN3 = re.compile(
    r"(?<![\w.])(?:(?P<recv>this|\w+)\.)?(?P<m1>\w+)\s*\((?P<a1>[^)]*)\)"
    r"\s*\.\s*(?P<m2>\w+)\s*\((?P<a2>[^)]*)\)"
    r"\s*\.\s*(?P<m3>\w+)\s*\((?P<a3>[^)]*)\)")
# three-level chain a.B().C().D().E(): E binds through THREE retsig hops;
# the shorter scans give B/C/D their edges on the same text
_RE_CHAIN4 = re.compile(
    r"(?<![\w.])(?:(?P<recv>this|\w+)\.)?(?P<m1>\w+)\s*\((?P<a1>[^)]*)\)"
    r"\s*\.\s*(?P<m2>\w+)\s*\((?P<a2>[^)]*)\)"
    r"\s*\.\s*(?P<m3>\w+)\s*\((?P<a3>[^)]*)\)"
    r"\s*\.\s*(?P<m4>\w+)\s*\((?P<a4>[^)]*)\)")
# must match link.MAX_CHAIN_HOPS: chains needing more hops than this drop
# (the reference binds arbitrary depth, MemberDependencyExtractor.cs:77-182)
_MAX_CHAIN_HOPS = 4
# member-access chains with PROPERTY hops: `a.Prop.M()`, `this.P1.P2.M()`,
# `a.Prop.B().C()` — each segment is a name with or without an argument
# list; non-final paren-less segments are property hops (name␟P in the hop
# signature), resolved through the link-time propsig dictionary exactly as
# call hops resolve through retsig (Roslyn binds the MemberAccessExpression
# through the property symbol's declared type,
# MemberDependencyExtractor.cs:77-182). Pure-call chains skip here —
# _RE_CHAIN/_RE_CHAIN3/_RE_CHAIN4 already cover them.
_SEG = r"\w+(?:\([^()]*\))?"
_RE_MCHAIN = re.compile(
    r"(?<![\w.])(?P<recv>this|\w+)"
    r"\.(?P<s1>" + _SEG + r")"
    r"(?:\.(?P<s2>" + _SEG + r"))?"
    r"(?:\.(?P<s3>" + _SEG + r"))?"
    r"(?:\.(?P<s4>" + _SEG + r"))?")
# bare property read as a local initializer: `var c = a.Prop;` — the local
# carries the pending property hop, same tracking as call-return locals
_RE_PROP_READ = re.compile(r"^(?P<recv>this|\w+)\.(?P<p>\w+)$")
# indexer receiver: `reg[k].M(..)` — the element access binds this[..],
# typing the receiver of M by the collection's value/element type
_RE_INDEX_CALL = re.compile(
    r"(?<![\w.])(?P<recv>\w+)\[(?P<ix>[^\[\]]*)\]\s*\.\s*(?P<m>\w+)"
    r"\s*\((?P<a>[^)]*)\)")
# indexer read as a local initializer: `var v = reg[k];`
_RE_INDEX_READ = re.compile(r"^(?P<recv>\w+)\[[^\[\]]*\]$")
# explicitly-typed lambda parameter `(Dep d) =>`: registers d as a local so
# calls in the lambda body bind through its type (Roslyn walks lambda bodies
# as part of the enclosing member, MemberDependencyExtractor.cs:77-104;
# type-INFERENCE for untyped lambda params is out of the lexer subset)
_RE_LAMBDA_PARAM = re.compile(r"\(\s*(?P<tok>[A-Z]\w*)\s+(?P<name>\w+)\s*\)\s*=>")
# LINQ / iteration subset: iteration variables, query range variables, and
# untyped lambda parameters take the ELEMENT type of a generic-collection
# source (Roslyn binds foreach through GetEnumerator().Current, and query /
# lambda parameters through the IEnumerable<T> delegate parameter — the
# bound symbols reach MemberDependencyExtractor.cs:77-104 like any other
# invocation; the lexer reproduces the element-type inference for the
# collection shapes the subset declares)
_RE_FOREACH = re.compile(
    r"\bforeach\s*\(\s*(?P<tok>var|[\w.]+(?:<[\w.,<>? \[\]]*>)?(?:\[\])?\??)"
    r"\s+(?P<name>\w+)\s+in\s+(?P<src>\w+)\s*\)")
_RE_QUERY_FROM = re.compile(r"\bfrom\s+(?P<name>\w+)\s+in\s+(?P<src>\w+)\b")
# one-call untyped-lambda argument `recv.Op(p => p.M(..))`: Op binds to a
# BCL extension method (System.Linq metadata symbol -> key dangles, no
# edge); the lambda body call binds through the inferred element type
_RE_LAMBDA_CALL = re.compile(
    r"(?<![\w.])(?P<recv>\w+)\.(?P<op>\w+)\(\s*(?P<p>\w+)\s*=>\s*"
    r"(?P<pr>\w+)\.(?P<m>\w+)\s*\((?P<a>[^()]*)\)\s*\)")
# explicit type-argument list at a call site: Roslyn binds the invocation
# to the generic DEFINITION (Echo<string>("w") -> display Echo<T>(T)), and
# the link side matches bare name + arity, so the lexer strips the list.
# `new X<T>(...)` keeps its list: constructed-ctor keys dangle like the
# reference's metadata symbols.
_RE_TARGS_CALL = re.compile(r"(?<![\w.])(?<!new )(?P<n>\w+)<[\w.?, ]+>\s*\(")
# method group behind a member access: `recv.Name` with NO argument list
# and no further member segment — MemberAccessExpressionSyntax outside
# invocation position binds an IMethodSymbol when the name is a method
# group (MemberDependencyExtractor.cs:163-169); property/field reads
# resolve to non-method symbols and add nothing, which the link-time
# Method-only member dictionary reproduces structurally (no Method row ->
# the mention drops)
_RE_MGROUP = re.compile(
    r"(?<![\w.)\]])(?P<recv>[A-Za-z_]\w*)\s*\.\s*(?P<name>[A-Za-z_]\w*)"
    r"(?!\s*[\w(.\[<])")
# nameof(...) spans (single-level parens — the subset's nameof arguments
# are identifiers/member accesses): blanked before the scans so nothing
# inside emits a mention
_RE_NAMEOF = re.compile(r"(?<![\w.])nameof\s*\(([^()]*)\)")
# simple-assignment statement: `name = rhs;` — the RHS is an implicit-
# conversion candidate (AssignmentExpressionSyntax right,
# MemberDependencyExtractor.cs:210)
_RE_ASSIGN = re.compile(
    r"^(?P<name>[A-Za-z_]\w*)\s*=\s*(?P<rhs>[^=;][^;]*);$")
# conditional expression over two identifiers: `cond ? a : b` — when both
# operands share one declared type, that is the expression's type (Roslyn's
# best-common-type reduces to it); differing operand types are out of the
# lexer subset -> the local stays untyped and later calls on it drop
_RE_TERNARY = re.compile(r"^[^?:]+\?\s*(?P<a>\w+)\s*:\s*(?P<b>\w+)$")
_GENERIC_COLLECTIONS = (
    "List", "IList", "IEnumerable", "ICollection", "IReadOnlyList",
    "IReadOnlyCollection", "ISet", "HashSet", "Queue", "Stack",
)
_RE_ELEM = re.compile(
    r"^(?:System\.Collections\.Generic\.)?(?:%s)<(?P<e>[\w.]+)>$"
    % "|".join(_GENERIC_COLLECTIONS))


def _elem_type(tok: str | None) -> str | None:
    """Element type of a generic-collection or array token, else None."""
    if not tok:
        return None
    tok = tok.rstrip("?")
    if tok.endswith("[]"):
        return tok[:-2]
    m = _RE_ELEM.match(tok)
    return m.group("e") if m else None


# dictionary-shaped tokens for indexer element typing: recv[k] binds the
# this[..] indexer, whose type is the VALUE type argument (Roslyn binds the
# ElementAccessExpression through the indexer symbol)
_RE_DICT = re.compile(
    r"^(?:System\.Collections\.Generic\.)?"
    r"(?:Dictionary|IDictionary|IReadOnlyDictionary|SortedDictionary"
    r"|ConcurrentDictionary)<(?P<a>.+)>$")


def _index_elem_type(tok: str | None) -> str | None:
    """Type produced by an indexer access ``recv[..]``: dictionaries yield
    their VALUE type argument (top-level-comma split handles nested
    generics), lists/arrays their element type, anything else None."""
    if not tok:
        return None
    tok = tok.rstrip("?")
    m = _RE_DICT.match(tok)
    if m:
        s = m.group("a")
        depth, last_comma = 0, None
        for i, ch in enumerate(s):
            if ch == "<":
                depth += 1
            elif ch == ">":
                depth -= 1
            elif ch == "," and depth == 0:
                last_comma = i
        return s[last_comma + 1:].strip() if last_comma is not None else None
    return _elem_type(tok)


# generic constraint clause at the end of a type/method declaration line:
# Roslyn displays ignore constraints (CSharpErrorMessageFormat), so the
# lexer strips the clause before matching the declaration shape
_RE_WHERE = re.compile(r"\s+where\s+\w+\s*:\s*[^({]+$")
_RE_LOCAL = re.compile(
    r"^\s*(?P<tok>var|[\w.]+(?:<[\w.,<>? \[\]]*>)?(?:\[\])?\??)"
    r"\s+(?P<name>\w+)\s*=\s*(?P<rhs>[^;]+);")
_RE_BIN = re.compile(
    r"^(?P<a>\w+)\s*(?P<op>\+|-|\*|/|%|==|!=|>=|<=|>|<|\||&|\^)\s*(?P<b>\w+)$")
_RE_PRE = re.compile(r"^(?P<op>\+\+|--|!|~|-)\s*(?P<a>\w+)$")
_RE_POST = re.compile(r"^(?P<a>\w+)\s*(?P<op>\+\+|--)$")
_RE_CASTX = re.compile(r"^\((?P<t>[\w.<>\[\]?]+)\)\s*(?P<e>\w+|\d+)$")
# `expr as T` narrows the local to T (Roslyn: the as-expression's type is
# T?; no user-defined conversion is invoked — reference conversions only)
_RE_AS = re.compile(r"^(?P<e>\w+)\s+as\s+(?P<t>[\w.<>\[\]?]+)$")
# declaration pattern `expr is T name`: the pattern variable is T-typed
# (Roslyn flow analysis narrows it; the subset flattens scope to the member)
_RE_IS_PATTERN = re.compile(r"\bis\s+(?P<t>[A-Z][\w.<>]*)\s+(?P<name>\w+)")
# switch-case declaration pattern `case Dep d:` — the pattern variable
# narrows to the declared type exactly like an is-pattern (Roslyn:
# DeclarationPatternSyntax binds a local of the pattern type)
_RE_CASE_PATTERN = re.compile(
    r"\bcase\s+(?P<t>[A-Z][\w.<>]*)\s+(?P<name>\w+)\s*:")
# out-var call site `TryMake(out var d)`: d takes the OWN method's declared
# out-parameter type (Roslyn: DeclarationExpressionSyntax in an out argument
# binds a local of the parameter's type; cross-type receivers are out of
# the lexer subset — the dep's signatures live in another file)
_RE_OUT_VAR = re.compile(
    r"(?<![\w.])(?P<name>\w+)\s*\((?P<args>[^()]*\bout\s+var\s+\w+[^()]*)\)")
_RE_OUT_VAR_ARG = re.compile(r"^out\s+var\s+(?P<v>\w+)$")
# control-flow keyword directly before a paren: the invocation scans would
# otherwise consume `if (...)` as a pseudo-call whose [^)]* argument capture
# swallows any REAL call inside the condition (`if (TryMake(out var d))`
# lost TryMake's edge). The keyword is blanked, the paren kept, so inner
# calls scan normally (Roslyn of course binds them, :77-104).
_RE_CTRL_KW = re.compile(
    r"(?<![\w.])(?:if|while|switch|foreach|for|lock|using)\s*\(")
# object-creation with an initializer and no argument list `new X { .. }`:
# Roslyn binds the parameterless constructor
_RE_NEW_INIT = re.compile(r"\bnew\s+([\w.]+)\s*\{")
# target-typed new as a local initializer: `Dep fresh = new(...);` — Roslyn
# binds the DECLARED type's constructor (ImplicitObjectCreationExpression-
# Syntax takes the target type from the declaration)
_RE_NEWT = re.compile(r"^new\s*\((?P<a>[^)]*)\)")
# EXPRESSION receivers of statically-known type: members chained off an
# object creation (`new Dep().Run()`), a parenthesized cast
# (`((Dep)o).Run()`), or a parenthesized same-typed ternary
# (`(f ? a : b).Run()`). Roslyn binds through the receiver EXPRESSION's
# type like any other receiver (MemberDependencyExtractor.cs:77-182); the
# lexer subset covers these three shapes, whose type is syntactically
# evident. Segment i binds through i retsig hops off the receiver type.
_RE_SEG_TAIL = r"(?P<rest>(?:\s*\.\s*\w+\s*\([^)]*\))+)"
_RE_NEW_RECV = re.compile(
    r"\bnew\s+(?P<t>[\w.]+)\s*\((?P<a0>[^)]*)\)" + _RE_SEG_TAIL)
# the leading lookbehind keeps both scans off ARGUMENT parens: in
# `Foo((Dep)o).Bar()` the trailing member binds through Foo's return, not
# the cast — a paren preceded by an identifier/`)`/`]` is a call, indexer,
# or grouping tail, never the start of a receiver expression
_RE_CAST_RECV = re.compile(
    r"(?<![\w)\]])\(\(\s*(?P<t>[\w.]+)\??\s*\)\s*(?P<e>\w+)\s*\)" + _RE_SEG_TAIL)
_RE_TERN_RECV = re.compile(
    r"(?<![\w)\]])\(\s*[\w.!]+\s*\?\s*(?P<a>\w+)\s*:\s*(?P<b>\w+)\s*\)"
    + _RE_SEG_TAIL)
_RE_SEGS = re.compile(r"\.\s*(\w+)\s*\(([^)]*)\)")
_RE_RET = re.compile(r"^\s*return\s+(?P<e>\w+)\s*;")
_RE_IDENT = re.compile(r"^\w+$")

_MODIFIER_WORDS = {
    "public", "internal", "private", "protected", "static", "readonly", "const",
    "sealed", "abstract", "partial", "virtual", "override", "async", "event",
    "class", "interface", "struct", "record", "enum", "using", "namespace",
    "return", "new", "var", "if", "while", "for", "foreach", "else", "get", "set",
    "operator", "implicit", "explicit",
}


def _count_args(argstr: str) -> int:
    s = argstr.strip()
    if not s:
        return 0
    return s.count(",") + 1


def _split_args(argstr: str) -> list[str]:
    s = argstr.strip()
    return [a.strip() for a in s.split(",")] if s else []


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


_REF_KINDS = ("out", "ref", "in", "params")


def _parse_params(pstr: str) -> list[tuple[str, str]]:
    """(display-token, name) pairs. Ref-kind modifiers stay in the display
    token — CSharpErrorMessageFormat renders `TryGet(out int)` — while
    `_strip_ref` recovers the bare type for dep emission and local typing.
    The `this` receiver modifier of extension methods is dropped from the
    display (the reference's keys show 'Boost(Widget5, int)'); default
    values (`int w = 5`) never reach the display either — optionality is
    carried separately (`_count_defaults`) for the link-time optsig
    dictionary."""
    params = []
    pstr = pstr.strip()
    if pstr:
        for p in pstr.split(","):
            toks = p.split("=", 1)[0].strip().split()
            if len(toks) >= 3 and toks[-3] in _REF_KINDS:
                params.append((f"{toks[-3]} {toks[-2]}", toks[-1]))
            elif len(toks) >= 2:
                params.append((toks[-2], toks[-1]))  # (type, name)
    return params


def _count_defaults(pstr: str) -> int:
    """Number of parameters declaring a default value (`= expr`)."""
    pstr = pstr.strip()
    if not pstr:
        return 0
    return sum(1 for p in pstr.split(",") if "=" in p)


def _strip_ref(tok: str) -> str:
    """Bare type token of a possibly ref-kind-prefixed parameter display."""
    head, _, rest = tok.partition(" ")
    return rest if rest and head in _REF_KINDS else tok


class _Type:
    __slots__ = ("name", "name_tok", "kind", "ns", "acc", "start", "end",
                 "doc", "comments", "display", "key", "members", "fields",
                 "is_enum", "is_interface", "parent", "body_depth", "bases")

    def __init__(self, name, name_tok, kind, ns, acc, start, doc, comments,
                 repo, parent: "_Type | None" = None):
        self.name = name
        self.name_tok = name_tok      # includes <T...> for generic decls
        self.kind = kind
        self.ns = ns
        self.acc = acc
        self.start = start
        self.end = start
        self.doc = doc
        self.comments = comments
        if parent is not None:
            self.display = f"{parent.display}.{name_tok}"
        else:
            self.display = f"{ns}.{name_tok}" if ns else name_tok
        self.key = keys.csharp_key(repo, self.display)
        self.members = []
        self.fields = {}  # field name -> declared type token
        self.is_enum = kind == "enum"
        self.is_interface = kind == "interface"
        self.parent = parent
        self.body_depth = 0
        self.bases = []  # declared base-list tokens (class X : Base, IFoo)


def extract_csharp(em: Emitter, content: str, repo: str, file_key: str,
                   min_acc: int) -> None:
    lines = content.split("\n")
    n = len(lines)

    file_ns: str | None = None
    usings: list[str] = []
    global_usings: list[str] = []
    static_usings: list[str] = []

    # --- pass 1: usings ----------------------------------------------------
    # (namespace declarations are tracked in pass 2: a file may declare a
    # file-scoped namespace OR one-or-more BLOCK namespaces — Roslyn takes
    # any shape, CSharpHandler.cs:36-42 — so the active namespace is
    # positional state, not a file constant)
    for ln in lines:
        m = _RE_USING.match(ln)
        if m:
            if m.group("stat"):
                # `using static T;` imports T's STATIC MEMBERS, not a
                # namespace: bare simple-name calls fall back to T when no
                # own member applies (Roslyn simple-name lookup); the
                # directive's own symbol is a type, not a namespace, so it
                # joins neither the candidate-namespace list nor the
                # using-directive DEPENDS_ON mentions
                static_usings.append(m.group(3))
            else:
                usings.append(m.group(3))
                if m.group("glob"):
                    global_usings.append(m.group(3))

    # --- pass 2: types, members, bodies ----------------------------------
    doc_buf: list[str] = []
    com_buf: list[str] = []
    types: list[_Type] = []
    tstack: list[_Type] = []
    # namespace state: a file-scoped decl (`namespace X;`) applies from its
    # line to EOF (or the next decl); a block decl (`namespace X {`) applies
    # until its brace closes and composes with an enclosing block (X.Y).
    # Roslyn resolves each type's ContainingNamespace positionally
    # (SymbolMapper.cs:19-21); the stack reproduces that for the subset.
    ns_stack: list[tuple[str, int]] = []  # (composed ns, depth after open)
    depth = 0
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

    def close_type(t: _Type, lineno: int):
        t.end = lineno
        types.append(t)

    while i < n:
        raw = lines[i]
        stripped = raw.strip()
        lineno = i + 1

        # comment/doc shapes require a '/', namespace lines the keyword —
        # substring guards skip the regex engine on the common code lines
        if "/" in raw:
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
                tstack[-1].members.append(pending_member)
                pending_member = None
                body_buf = []
            i += 1
            continue

        mns = (_RE_NAMESPACE.match(raw)
               if not tstack and "namespace" in raw else None)
        if mns:
            nsname = mns.group(1)
            outer = ns_stack[-1][0] + "." if ns_stack else ""
            if raw.rstrip().endswith(";"):
                file_ns = outer + nsname  # file-scoped: applies to EOF
            else:
                # block-scoped: consume up to the opening brace (same line
                # or a following one), then scope the name to that block
                depth += opens - closes
                while "{" not in raw and i + 1 < n:
                    i += 1
                    raw = lines[i]
                    depth += raw.count("{") - raw.count("}")
                ns_stack.append((outer + nsname, depth))
            i += 1
            continue

        # generic constraint clauses never reach a Roslyn display — strip
        # them from the declaration line before shape-matching
        raw_decl = _RE_WHERE.sub("", raw) if " where " in raw else raw

        mt = (_RE_TYPE.match(raw_decl)
              if ("class" in raw_decl or "struct" in raw_decl
                  or "interface" in raw_decl or "record" in raw_decl
                  or "enum" in raw_decl) else None)
        if mt:
            doc, com = flush_trivia()
            acc = _acc_name(mt.group("acc"), "Internal" if not tstack else "Private")
            parent = tstack[-1] if tstack else None
            name_tok = mt.group("name") + (mt.group("targs") or "")
            active_ns = ns_stack[-1][0] if ns_stack else (file_ns or "")
            t = _Type(mt.group("name"), name_tok, mt.group("tkind"),
                      active_ns, acc, lineno, doc, com, repo, parent)
            # declared base list (class X : Base, IFoo): tokens feed the
            # link-time inherited-member expansion (Roslyn binds calls on a
            # derived type to the BASE's declaring member symbol); C# base
            # types emit no DEPENDS_ON edge themselves (unlike TS/Dart
            # heritage — RoslynSymbolProcessor has no heritage edge)
            mb = re.match(r"\s*:\s*([\w.<>, ]+)", raw_decl[mt.end():])
            if mb:
                t.bases = [b.strip() for b in mb.group(1).split(",")
                           if b.strip()]
            # type body: wait for open brace
            depth += opens - closes
            while "{" not in raw:
                i += 1
                raw = lines[i]
                depth += raw.count("{") - raw.count("}")
            t.body_depth = depth - 1
            tstack.append(t)
            i += 1
            continue

        if tstack:
            cur = tstack[-1]
            depth += opens - closes
            if closes and depth <= cur.body_depth:
                close_type(cur, lineno)
                tstack.pop()
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

            mev = _RE_EVENT.match(raw) if "event" in raw else None
            if mev:
                doc, com = flush_trivia()
                # multi-declarator event: one IEventSymbol per variable
                for name in re.split(r"\s*,\s*", mev.group("names")):
                    cur.members.append({
                        "mkind": "Event", "name": name,
                        "type": mev.group("type"),
                        "acc": _acc_name(mev.group("acc"), "Private"),
                        "start": lineno, "end": lineno, "doc": doc, "com": com,
                    })
                i += 1
                continue

            mprop = _RE_PROPERTY.match(raw) if "get" in raw else None
            if mprop and mprop.group("type") not in _MODIFIER_WORDS:
                doc, com = flush_trivia()
                cur.members.append({
                    "mkind": "Property", "name": mprop.group("name"),
                    "type": mprop.group("type"),
                    "acc": _acc_name(mprop.group("acc"),
                                     "Public" if cur.is_interface else "Private"),
                    "start": lineno, "end": lineno, "doc": doc, "com": com,
                })
                # properties act as typed receivers exactly like fields
                # (Roslyn binds Item.Run() through the property's type)
                cur.fields[mprop.group("name")] = mprop.group("type")
                i += 1
                continue

            mxp = _RE_EXPR_PROP.match(raw) if "=>" in raw else None
            if mxp and mxp.group("type") not in _MODIFIER_WORDS:
                doc, com = flush_trivia()
                cur.members.append({
                    "mkind": "Property", "name": mxp.group("name"),
                    "type": mxp.group("type"),
                    "acc": _acc_name(mxp.group("acc"),
                                     "Public" if cur.is_interface else "Private"),
                    "start": lineno, "end": lineno, "doc": doc, "com": com,
                })
                i += 1
                continue

            has_op = "operator" in raw
            mconv = _RE_CONVERSION.match(raw) if has_op else None
            mop = _RE_OPERATOR.match(raw) if has_op and not mconv else None
            if mconv or mop:
                doc, com = flush_trivia()
                m = mconv or mop
                member = {
                    "mkind": "Conversion" if mconv else "Operator",
                    "ckind": mconv.group("ckind") if mconv else None,
                    "op": mop.group("op") if mop else None,
                    "ret": m.group("ret"),
                    "params": _parse_params(m.group("params")),
                    "acc": _acc_name(m.group("acc"), "Private"),
                    "start": lineno, "end": lineno, "doc": doc, "com": com,
                    "body": "",
                }
                if "=>" in raw or (raw.count("{") > 0 and raw.count("{") == raw.count("}")):
                    member["body"] = raw
                    cur.members.append(member)
                elif stripped.endswith(";"):
                    cur.members.append(member)
                else:
                    pending_member = member
                    body_open_depth = depth
                    body_buf = []
                i += 1
                continue

            mm = _RE_METHOD.match(raw_decl) if "(" in raw_decl else None
            if mm and (mm.group("ret") or mm.group("name") == cur.name) and \
                    mm.group("name").split(".")[-1] not in _MODIFIER_WORDS and \
                    (mm.group("ret") is None or mm.group("ret") not in
                     ("new", "return")):
                doc, com = flush_trivia()
                name = mm.group("name")
                is_ctor = mm.group("ret") is None and name == cur.name
                explicit_iface = "." in name
                default_acc = "Public" if cur.is_interface else "Private"
                member = {
                    "mkind": "Method", "name": name, "is_ctor": is_ctor,
                    "targs": mm.group("targs"),  # generic method <T, ...>
                    "params": _parse_params(mm.group("params")),
                    "n_opt": _count_defaults(mm.group("params")),
                    # `this` first param marks an extension method; the
                    # display drops the modifier (_parse_params keeps only
                    # the type token) exactly like CSharpErrorMessageFormat
                    "is_ext": mm.group("params").strip().startswith("this "),
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
                    body_open_depth = depth
                    body_buf = []
                i += 1
                continue

            mf = _RE_FIELD.match(raw)
            if mf and mf.group("type") not in _MODIFIER_WORDS:
                doc, com = flush_trivia()
                # multi-declarator field: one IFieldSymbol per variable
                # (RoslynSymbolProcessor.cs:216-240)
                for name in re.split(r"\s*,\s*", mf.group("names")):
                    cur.members.append({
                        "mkind": "Field", "name": name,
                        "type": mf.group("type"),
                        "acc": _acc_name(mf.group("acc"), "Private"),
                        "start": lineno, "end": lineno, "doc": doc, "com": com,
                    })
                    cur.fields[name] = mf.group("type")
                i += 1
                continue

            i += 1
            continue

        # outside any type
        depth += opens - closes
        while ns_stack and depth < ns_stack[-1][1]:
            ns_stack.pop()  # block namespace closed
        if stripped and not stripped.startswith(("using", "namespace")):
            flush_trivia()
        i += 1

    if pending_member is not None and tstack:
        # unterminated member body at EOF — keep the declaration (Roslyn
        # error-recovery still yields the symbol)
        pending_member["end"] = n
        pending_member["body"] = "\n".join(body_buf)
        tstack[-1].members.append(pending_member)
    while tstack:  # unterminated type — tolerate
        close_type(tstack.pop(), n)

    # --- emission ---------------------------------------------------------
    top_types = [t for t in types if t.parent is None]
    first_type_ns = top_types[0].ns if top_types else (types[0].ns if types else None)
    # file namespace override (CSharpHandler.cs:36-42)
    em.filemeta(first_type_ns)

    member_ns = first_type_ns  # SymbolMapper: members get fileNamespace

    # using-directive dependencies (RoslynSymbolProcessor.cs:47-65):
    # resolved via the namespace dictionary at link time; in-repo namespaces
    # are same-assembly -> no edge, external -> dangling DEPENDS_ON
    seen_using = set()
    for u in usings:
        if u in seen_using:
            continue
        seen_using.add(u)
        em.mention("using", file_key, R_DEPENDS_ON, u, None, [], None)
    # global usings feed the repo-wide candidate-namespace pool
    # (compilation-level lookup, RoslynSymbolProcessor.cs:68-99)
    for u in dict.fromkeys(global_usings):
        em.mention("global_using", file_key, R_DEPENDS_ON, u, None, [], None)

    for t in types:
        if not _passes(t.acc, min_acc):
            continue
        # candidate namespaces are PER TYPE: bare names resolve in the
        # type's OWN containing namespace first, then the file's usings
        # (Roslyn simple-name lookup; with multiple namespaces per file the
        # own-namespace head differs between types)
        cand_ns = ([t.ns] if t.ns else []) + usings
        em.symbol(t.key, t.name, "NamedType", t.name, f"global::{t.display}",
                  t.acc, t.ns or None, t.start, t.end, t.doc, t.comments)
        if t.parent is not None:
            # nested type is also a member of the outer type -> CONTAINS
            # (ProcessMemberSymbol over tds.Members, RoslynSymbolProcessor.cs:288)
            em.rel(t.parent.key, t.key, R_CONTAINS)
        for b in t.bases:
            # declared base-list record: feeds the link-time
            # inherited-member dictionary expansion (Roslyn binds calls on
            # a derived type to the BASE's declaring member); base types
            # emit no C# DEPENDS_ON edge themselves
            em.mention("basesig", t.key, "", b, t.display, cand_ns, None)

        # property/field type records for the link-time propsig dictionary:
        # property hops (`a.Prop.M()`) step through the member's declared
        # type. Emitted for EVERY accessibility — compile-valid source only
        # contains accesses the member's accessibility permits, so the
        # binding needs no filter here (the indexing min-accessibility
        # filter governs which SYMBOLS are exported, not how receivers
        # bind). Column reuse: m_recv=declaring type display, m_head=member
        # type token, m_nargs=-1 (the prop-hop rank sentinel). The record
        # carries the DECLARING file's candidate namespaces: Roslyn resolves
        # a member's declared type at its declaration site, so link-time
        # resolution of the hop-result token uses these, not the call
        # site's usings.
        for mrec in t.members:
            if mrec["mkind"] in ("Property", "Field") and mrec.get("type"):
                em.mention("propsig",
                           keys.csharp_key(repo, f"{t.display}.{mrec['name']}"),
                           "", mrec["name"], t.display, cand_ns, -1,
                           m_head=mrec["type"].rstrip("?"))

        # own-type method signature map (overload-aware; used for method
        # groups and same-class argument conversions)
        type_sigs: dict[str, list[list[str]]] = {}
        for mrec in t.members:
            if mrec["mkind"] == "Method" and not mrec.get("is_ctor"):
                type_sigs.setdefault(mrec["name"], []).append(
                    [p[0] for p in mrec["params"]])

        for mrec in t.members:
            acc = mrec["acc"]
            if not _passes(acc, min_acc, mrec.get("explicit_iface", False)):
                continue
            mk = mrec["mkind"]

            if mk == "EnumMember":
                name = mrec["name"]
                display = f"{t.display}.{name}"
                key = keys.csharp_key(repo, display)
                em.symbol(key, name, "Field", name, f"global::{display}", "Public",
                          member_ns, mrec["start"], mrec["end"], mrec["doc"], mrec["com"])
                em.rel(t.key, key, R_CONTAINS)
                continue

            if mk in ("Method", "Operator", "Conversion"):
                ptoks = [p[0] for p in mrec["params"]]
                if mk == "Method":
                    # generic methods display their type parameters
                    # (SymbolMapper.cs:43-47: 'Echo<T>(T)'); IMethodSymbol.Name
                    # stays the bare name
                    name = mrec["name"] + (mrec.get("targs") or "")
                    display = f"{t.display}.{name}({', '.join(ptoks)})"
                    sym_name = ".ctor" if mrec["is_ctor"] else mrec["name"]
                elif mk == "Operator":
                    op = mrec["op"]
                    display = f"{t.display}.operator {op}({', '.join(ptoks)})"
                    sym_name = OP_NAMES.get(op, f"op_{op}")
                else:  # Conversion
                    display = (f"{t.display}.{mrec['ckind']} operator "
                               f"{mrec['ret']}({', '.join(ptoks)})")
                    sym_name = "op_Implicit" if mrec["ckind"] == "implicit" else "op_Explicit"
                key = keys.csharp_key(repo, display)
                em.symbol(key, sym_name, "Method", sym_name, f"global::{display}",
                          acc, member_ns, mrec["start"], mrec["end"],
                          mrec["doc"], mrec["com"])
                em.rel(t.key, key, R_CONTAINS)
                if mk == "Method" and not mrec.get("is_ctor"):
                    if mrec.get("ret"):
                        # return-token record for the link-time ret
                        # dictionary: chained calls a.B().C() bind C through
                        # B's return type (Roslyn semantic binding,
                        # MemberDependencyExtractor.cs:77-182). Column reuse:
                        # m_recv=declaring type display, m_args=param tokens,
                        # m_head=return token. Carries the DECLARING file's
                        # candidate namespaces (Roslyn resolves the return
                        # type where the method is declared).
                        em.mention("retsig", key, "", mrec["name"], t.display,
                                   cand_ns, len(ptoks), m_args=ptoks,
                                   m_head=mrec["ret"].rstrip("?"))
                    if mrec.get("n_opt"):
                        # optional-parameter record: the member accepts call
                        # sites from (nparams - n_opt) to nparams arguments
                        # (Roslyn fills defaults; the display shows types
                        # only). Column reuse: m_recv=declaring type display,
                        # m_args=param tokens, m_nargs=REQUIRED minimum.
                        em.mention("optsig", key, "", mrec["name"], t.display,
                                   [], len(ptoks) - mrec["n_opt"],
                                   m_args=ptoks)
                    if mrec.get("is_ext") and ptoks:
                        # extension-method record: receiver-typed call sites
                        # (w.Boost(5)) bind to the static method when the
                        # receiver type declares no applicable instance
                        # member. Column reuse: m_recv=receiver param token,
                        # m_args=remaining param tokens, m_head=full display
                        # (the edge target key is {repo}:{display}).
                        em.mention("extsig", key, "", mrec["name"],
                                   ptoks[0].rstrip("?"), [], len(ptoks) - 1,
                                   m_args=ptoks[1:], m_head=display)
                # param-type deps from the containing TYPE
                # (MemberDependencyExtractor.cs:232-243); the dep targets
                # the parameter's TYPE, so ref-kind display prefixes strip
                for ptok, _pn in mrec["params"]:
                    _emit_type_dep(em, repo, t.key, _strip_ref(ptok), cand_ns)
                # return-type dep for non-ctors (:245-253)
                if mrec.get("ret"):
                    _emit_type_dep(em, repo, t.key, mrec["ret"], cand_ns)
                # body INVOKES surface (:77-230)
                _analyze_body(em, repo, key, t, mrec, cand_ns, type_sigs,
                              static_usings)
                continue

            # Property / Field / Event: type dep from containing type
            name = mrec["name"]
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


def _is_keywordish(tok: str | None) -> bool:
    return (tok is None or tok in KEYWORD_TYPES or tok in EXTERNAL_TYPE_DISPLAY
            or tok.startswith("System."))


_RE_ARG_INT = re.compile(r"\d+")
_RE_ARG_FLOAT = re.compile(r"\d+\.\d+[fdm]?")


def _classify_arg(a: str, locals_: dict, fields: dict, own_display: str) -> str:
    """Argument type token for overload matching ('?' = unknown)."""
    a = a.strip()
    if not a:
        return "?"
    if _RE_ARG_INT.fullmatch(a):
        return "int"
    if _RE_ARG_FLOAT.fullmatch(a):
        return "double"
    if a.startswith('"'):
        return "string"
    if a in ("true", "false"):
        return "bool"
    if a == "this":
        return own_display.split(".")[-1]
    t = locals_.get(a) or fields.get(a)
    return t.rstrip("?") if t else "?"


def _analyze_body(em: Emitter, repo: str, caller_key: str, t: _Type,
                  mrec: dict, cand_ns: list[str], type_sigs: dict,
                  static_usings: list[str] | None = None) -> None:
    """INVOKES edges from method bodies with per-callee dedup
    (MemberDependencyExtractor.cs:90,218-230). Covers the full
    ExtractMethodExecutes surface over the subset's statement shapes:
    invocations, object creations, user-defined binary/prefix/postfix
    operators, explicit casts, method groups outside invocation position,
    and implicit conversions at initializer/argument/return positions."""
    body = mrec.get("body", "")
    if not body:
        return
    seen: set[tuple] = set()
    # strip the signature (its param list must not match as a call)
    if "\n" in body:
        text = "\n".join(body.split("\n")[1:])
    else:
        text = body.split(")", 1)[1] if ")" in body else body
    # null-conditional access `x?.M()` binds the SAME member symbol as plain
    # access (Roslyn ConditionalAccessExpressionSyntax — the null guard
    # changes control flow, not binding), so normalize before scanning; the
    # `?.` digraph cannot occur in any other subset shape (nullable type
    # tokens are followed by whitespace, ternaries space their '?')
    if "?." in text:
        text = text.replace("?.", ".")
    # keep condition-internal calls scannable (see _RE_CTRL_KW)
    text = _RE_CTRL_KW.sub(lambda m: " " * (len(m.group(0)) - 1) + "(", text)

    locals_: dict[str, str] = {pn: _strip_ref(ptok)
                               for ptok, pn in mrec.get("params", [])}
    # explicitly-typed lambda params act as typed locals for the body walk
    # (scoping is flattened to the member — acceptable in the subset, where
    # lambda param names don't shadow other locals)
    if "=>" in body:
        for lm in _RE_LAMBDA_PARAM.finditer(body):
            locals_.setdefault(lm.group("name"), lm.group("tok"))
    # iteration + query range variables: `foreach (var it in xs)` /
    # `from e in xs` bind the variable to xs's element type (an explicitly
    # typed foreach keeps its declared token). Sources are fields or
    # params; unknown sources leave the variable untyped, so its calls
    # dangle like any unclassifiable receiver. Scoping flattens to the
    # member, same as lambda params above.
    if "foreach" in body:
        for fm in _RE_FOREACH.finditer(body):
            tok = fm.group("tok")
            if tok == "var":
                et = _elem_type(locals_.get(fm.group("src"))
                                or t.fields.get(fm.group("src")))
            else:
                et = tok.rstrip("?")
            if et:
                locals_.setdefault(fm.group("name"), et)
    if "from" in body:
        for qm in _RE_QUERY_FROM.finditer(body):
            et = _elem_type(locals_.get(qm.group("src"))
                            or t.fields.get(qm.group("src")))
            if et:
                locals_.setdefault(qm.group("name"), et)
    # declaration-pattern variables: `if (o is Dep n)` narrows n to Dep
    if "is" in body:
        for pm in _RE_IS_PATTERN.finditer(body):
            locals_.setdefault(pm.group("name"), pm.group("t"))
    # switch-case declaration patterns narrow their variable the same way
    if "case" in body:
        for pm in _RE_CASE_PATTERN.finditer(body):
            locals_.setdefault(pm.group("name"), pm.group("t"))
    # out-var declarations: `TryMake(out var d)` types d from the OWN
    # method's out parameter when every same-arity overload agrees on the
    # token (Roslyn binds the declared type; an overload disagreement or a
    # cross-type receiver leaves the local untyped -> its calls drop)
    for om in (_RE_OUT_VAR.finditer(body) if "out" in body else ()):
        arg_list = [a.strip() for a in _split_args(om.group("args"))]
        pos, var = next(
            ((i, mv.group("v")) for i, a in enumerate(arg_list)
             if (mv := _RE_OUT_VAR_ARG.match(a)) is not None), (None, None))
        if pos is None:
            continue
        toks = {sig[pos] for sig in type_sigs.get(om.group("name"), [])
                if len(sig) == len(arg_list) and sig[pos].startswith("out ")}
        if len(toks) == 1:
            locals_.setdefault(var, toks.pop()[4:])
    ret_tok = (mrec.get("ret") or "").rstrip("?") or None

    def type_of(ident: str) -> str | None:
        tok = locals_.get(ident) or t.fields.get(ident)
        return tok.rstrip("?") if tok else None

    def mention_once(kind, name, recv, nargs=None, args=None):
        k = (kind, name, recv, nargs, tuple(args) if args else None)
        if k in seen:
            return
        seen.add(k)
        em.mention(kind, caller_key, R_INVOKES, name, recv, cand_ns, nargs,
                   m_args=args)

    def conv(kind: str, target_tok: str, operand_type: str | None):
        """User-defined conversion mention: search the operand type and (for
        in-repo targets) the target type for implicit/explicit operator
        members (Conversion MethodKind, MemberDependencyExtractor.cs:130-139,
        184-193)."""
        target_tok = target_tok.rstrip("?")
        if operand_type == target_tok:
            return  # identity, no conversion
        mention_once(kind, target_tok, operand_type)

    def emit_ctor(tok: str, argstr: str) -> None:
        """Constructor INVOKES (BaseObjectCreationExpressionSyntax,
        MemberDependencyExtractor.cs:106-113): shared by explicit
        `new X(..)` sites and target-typed `X x = new(..)` sites —
        Roslyn binds the same IMethodSymbol either way."""
        nargs = _count_args(argstr)
        args = [_classify_arg(a, locals_, t.fields, t.display)
                for a in _split_args(argstr)]
        k = ("new", tok, nargs, tuple(args))
        if k in seen:
            return
        seen.add(k)
        if tok in EXTERNAL_TYPE_DISPLAY or tok in KEYWORD_TYPES or tok.startswith("System."):
            disp = EXTERNAL_TYPE_DISPLAY.get(tok, tok)
            em.rel(caller_key,
                   keys.csharp_key(repo, f"{disp}.{disp.split('.')[-1]}(…)"),
                   R_INVOKES)
        else:
            em.mention("ctor", caller_key, R_INVOKES, tok, None, cand_ns,
                       nargs, m_args=args)

    # --- chain machinery ---------------------------------------------------
    # A chain binds its final member through a SEQUENCE of head-call return
    # types (retsig lookups applied iteratively at link time). Heads come
    # from three places: literal chains (a.B().C(), a.B().C().D()), and
    # locals bound from call returns (`var x = a.B(); x.C()` — x carries
    # B's pending return, so x.C() is the same one-hop chain; the reference
    # type-tracks all of this through the semantic model,
    # MemberDependencyExtractor.cs:77-182). local_heads maps such a local to
    # (base receiver type or None=own type, hop signature tuple).
    local_heads: dict[str, tuple[str | None, tuple[str, ...]]] = {}

    def hop_sig(name: str, argstr: str) -> str:
        args = [_classify_arg(a, locals_, t.fields, t.display)
                for a in _split_args(argstr)]
        return US.join([name, str(_count_args(argstr))] + args)

    def chain_base(recv: str | None) -> tuple[str | None, tuple[str, ...]] | None:
        """Resolve a chain's base receiver: None/this -> own type; a local
        bound from a call return -> its pending hops; a typed local/field ->
        its declared type; an identifier that is NO local/field -> a static
        TYPE receiver (``Factory.Make().Run()`` — the token resolves, or
        dangles, in the link-time type dictionary, mirroring the
        invoke_static path). Keyword/BCL receivers and declared-but-
        unclassifiable locals return None: the chained target is a metadata
        member whose key dangles -> no edge."""
        if recv is None or recv == "this":
            return (None, ())
        if recv in local_heads and not type_of(recv):
            return local_heads[recv]
        rtok = type_of(recv)
        if rtok is not None:
            return None if _is_keywordish(rtok) else (rtok, ())
        if recv in locals_ or recv in t.fields:
            return None  # declared, type unknown -> Roslyn error -> no edge
        if _is_keywordish(recv):
            return None  # BCL static chain -> metadata member -> dangles
        return (recv, ())

    def emit_chain(base: str | None, hops: tuple[str, ...],
                   final_name: str, final_argstr: str) -> None:
        if not hops or len(hops) > _MAX_CHAIN_HOPS:
            return  # beyond the hop bound -> drop (dangling outcome)
        nargs = _count_args(final_argstr)
        args = [_classify_arg(a, locals_, t.fields, t.display)
                for a in _split_args(final_argstr)]
        head = RS.join(hops)
        k = ("chain", base, head, final_name, nargs, tuple(args))
        if k in seen:
            return
        seen.add(k)
        if base is None:
            em.mention("chain_own", caller_key, R_INVOKES, final_name,
                       t.display, cand_ns, nargs, m_args=args, m_head=head)
        else:
            em.mention("chain_via", caller_key, R_INVOKES, final_name, base,
                       cand_ns, nargs, m_args=args, m_head=head)

    # --- statement pass: local type tracking + non-invocation INVOKES ------
    for raw_line in text.split("\n"):
        s = raw_line.strip()
        # _RE_LOCAL/_RE_ASSIGN both require a literal '=', _RE_RET the
        # 'return' prefix — cheap substring guards skip the regex engine
        # for the common statement lines that can't match
        has_eq = "=" in s
        ml = _RE_LOCAL.match(s) if has_eq else None
        if ml:
            tok, name, rhs = ml.group("tok"), ml.group("name"), ml.group("rhs").strip()
            declared = None if tok == "var" else tok.rstrip("?")
            inferred: str | None = None
            if rhs.startswith("new "):
                mnr = _RE_NEW_RECV.fullmatch(rhs) if declared is None else None
                if mnr is not None:
                    # creation-rooted chain RHS (`var d = new Dep().Clone();`):
                    # the local takes the LAST segment's return — known only
                    # to the link-time retsig dictionary, so it carries the
                    # pending hops exactly like a call-return local (the
                    # ctor and segment edges come from the text scans below)
                    t_tok = mnr.group("t").rstrip("?")
                    if not _is_keywordish(t_tok):
                        segs = _RE_SEGS.findall(mnr.group("rest"))
                        hops = tuple(hop_sig(nm, a) for nm, a in segs)
                        if hops and len(hops) <= _MAX_CHAIN_HOPS:
                            local_heads[name] = (t_tok, hops)
                else:
                    mnew = _RE_NEW.match(rhs) or _RE_NEW_INIT.match(rhs)
                    inferred = mnew.group(1) if mnew else None
                # the ctor INVOKES itself comes from the _RE_NEW scan below
            elif declared and (mnt := _RE_NEWT.match(rhs)) is not None:
                # target-typed new `Dep fresh = new(..);` — Roslyn binds the
                # DECLARED type's ctor; the _RE_NEW scan cannot see the type
                # token, so the ctor mention is emitted here
                emit_ctor(declared, mnt.group("a"))
            elif (mc := _RE_CASTX.match(rhs)) is not None:
                target, operand = mc.group("t"), mc.group("e")
                op_type = type_of(operand) if _RE_IDENT.match(operand) and not operand.isdigit() else None
                # an `object` operand never binds a user-defined conversion
                # (C# forbids declaring one from/to object — the built-in
                # reference conversion wins), same rule as the cast-receiver
                # scan below
                if op_type != "object" and not (
                        _is_keywordish(target.rstrip("?")) and _is_keywordish(op_type)):
                    conv("conv_expl", target, op_type)
                inferred = target.rstrip("?")
            elif (mb := _RE_BIN.match(rhs)) is not None:
                ta, tb = type_of(mb.group("a")), type_of(mb.group("b"))
                opt = ta if not _is_keywordish(ta) else (tb if not _is_keywordish(tb) else None)
                if opt:
                    mention_once("op", f"operator {mb.group('op')}", opt, 2, [opt, opt])
                    inferred = "bool" if mb.group("op") in _CMP_OPS else opt
            elif (mp := _RE_PRE.match(rhs)) is not None:
                ta = type_of(mp.group("a"))
                if not _is_keywordish(ta):
                    mention_once("op", f"operator {mp.group('op')}", ta, 1, [ta])
                    inferred = "bool" if mp.group("op") == "!" else ta
            elif (mp := _RE_POST.match(rhs)) is not None:
                ta = type_of(mp.group("a"))
                if not _is_keywordish(ta):
                    mention_once("op", f"operator {mp.group('op')}", ta, 1, [ta])
                    inferred = ta
            elif (mas := _RE_AS.match(rhs)) is not None:
                # `var m = o as Dep;` — m narrows to Dep; no conversion
                # member is invoked (reference conversions bind no symbol)
                inferred = mas.group("t").rstrip("?")
            elif (mir := _RE_INDEX_READ.fullmatch(rhs)) is not None:
                # `var v = reg[k];` — the element access binds this[..];
                # v takes the collection's value/element type
                inferred = _index_elem_type(type_of(mir.group("recv")))
            elif (mt := _RE_TERNARY.match(rhs)) is not None:
                # `var pick = f ? a : b;` — same-typed operands give the
                # conditional expression its type (best common type)
                ta, tb = type_of(mt.group("a")), type_of(mt.group("b"))
                if ta is not None and ta == tb and not _is_keywordish(ta):
                    inferred = ta
            elif _RE_IDENT.match(rhs):
                if rhs in type_sigs:
                    # method group outside invocation position -> INVOKES
                    # (IdentifierNameSyntax !IsInvocationTarget, :158-176)
                    mention_once("invoke", rhs, t.display, None, None)
                else:
                    rt = type_of(rhs)
                    if declared and rt and not _is_keywordish(rt):
                        # implicit conversion at initializer (EqualsValueClause)
                        conv("conv_impl", declared, rt)
                    inferred = rt
            elif declared is None:
                # `var x = <call or chain>;` — the local's type is the LAST
                # call's return, known only to the link-time retsig
                # dictionary: record the pending hops so later x.M() calls
                # emit chain mentions (Roslyn type-tracks the local through
                # the semantic model, MemberDependencyExtractor.cs:77-182)
                trk = None
                # `var r = await <call>;` — the local takes the awaited
                # call's UNWRAPPED result (Task<T> -> T); the hop carries an
                # '@' marker so the link-time step applies the unwrap
                # (Roslyn: the await-expression's type is the awaiter's
                # GetResult type)
                rhs_c = rhs
                awaited = rhs_c.startswith("await ")
                if awaited:
                    rhs_c = rhs_c[6:].lstrip()
                m4_ = _RE_CHAIN4.fullmatch(rhs_c)
                m3_ = _RE_CHAIN3.fullmatch(rhs_c) if m4_ is None else None
                m2_ = (_RE_CHAIN.fullmatch(rhs_c)
                       if m4_ is None and m3_ is None else None)
                m1_ = (_RE_CALL.fullmatch(rhs_c)
                       if m4_ is None and m3_ is None and m2_ is None else None)
                if m4_ is not None:
                    trk = (m4_.group("recv"),
                           [(m4_.group(f"m{i}"), m4_.group(f"a{i}"))
                            for i in range(1, 5)])
                elif m3_ is not None:
                    trk = (m3_.group("recv"),
                           [(m3_.group("m1"), m3_.group("a1")),
                            (m3_.group("m2"), m3_.group("a2")),
                            (m3_.group("m3"), m3_.group("a3"))])
                elif m2_ is not None:
                    trk = (m2_.group("recv"),
                           [(m2_.group("m1"), m2_.group("a1")),
                            (m2_.group("m2"), m2_.group("a2"))])
                elif m1_ is not None and m1_.group("name") not in _MODIFIER_WORDS:
                    trk = (m1_.group("recv"), [(m1_.group("name"), m1_.group(3))])
                if trk is not None:
                    base_info = chain_base(trk[0])
                    if base_info is not None:
                        base, prefix = base_info
                        hops = prefix + tuple(hop_sig(n, a) for n, a in trk[1])
                        if awaited:
                            hops = hops[:-1] + ("@" + hops[-1],)
                        if len(hops) <= _MAX_CHAIN_HOPS:
                            local_heads[name] = (base, hops)
                elif not awaited and (mpr := _RE_PROP_READ.fullmatch(rhs_c)):
                    # `var c = a.Prop;` — the local carries a pending
                    # property hop (propsig lookup at link time)
                    base_info = chain_base(mpr.group("recv"))
                    if base_info is not None:
                        base, prefix = base_info
                        hops = prefix + (mpr.group("p") + US + "P",)
                        if len(hops) <= _MAX_CHAIN_HOPS:
                            local_heads[name] = (base, hops)
            locals_[name] = declared or inferred or ""
            continue
        ma = _RE_ASSIGN.match(s) if has_eq else None
        if ma:
            # implicit conversion at ASSIGNMENT position (`n = q;` after
            # declaration): AssignmentExpressionSyntax right-hand sides are
            # conversion candidates (MemberDependencyExtractor.cs:205-216);
            # the mention drops unless a user-defined implicit operator
            # exists between the RHS type and the target's declared type
            declared = type_of(ma.group("name"))
            rhs = ma.group("rhs").strip()
            if declared and _RE_IDENT.match(rhs):
                rt = type_of(rhs)
                if rt and not _is_keywordish(rt):
                    conv("conv_impl", declared, rt)
            elif declared and (mnt := _RE_NEWT.match(rhs)) is not None:
                # target-typed new at assignment position (`d = new(..);`):
                # the target type is the assignee's declared type
                emit_ctor(declared, mnt.group("a"))
            continue
        mr = _RE_RET.match(s) if s.startswith("return") else None
        if mr and ret_tok and ret_tok != "void":
            rt = type_of(mr.group("e"))
            if rt and not _is_keywordish(rt):
                # implicit conversion at return position
                conv("conv_impl", ret_tok, rt)

    # --- untyped-lambda argument calls --------------------------------------
    # `recv.Op(p => p.M(..))`: the lambda parameter takes recv's element
    # type (pr == p), or the body call goes through its own receiver's
    # declared type (pr != p). Op itself binds to a BCL extension method
    # whose metadata key dangles -> no edge. The matched span is blanked so
    # the call scans below don't mis-parse the swallowed inner call (their
    # `[^)]*` argument capture stops at the lambda body's first `)`).
    pieces: list[str] = []
    last = 0
    for m in (_RE_LAMBDA_CALL.finditer(text) if "=>" in text else ()):
        p, pr = m.group("p"), m.group("pr")
        rt = _elem_type(type_of(m.group("recv"))) if pr == p else type_of(pr)
        if rt and not _is_keywordish(rt):
            argstr = m.group("a")
            args = [_classify_arg(a, locals_, t.fields, t.display)
                    for a in _split_args(argstr)]
            mention_once("invoke_via", m.group("m"), rt,
                         _count_args(argstr), args)
        pieces.append(text[last:m.start()])
        pieces.append(" " * (m.end() - m.start()))
        last = m.end()
    if pieces:
        pieces.append(text[last:])
        text = "".join(pieces)

    # explicit call-site type arguments vanish from the lookup shape
    # (Echo<string>("w") scans as Echo("w")); the link-time lookup then
    # binds the generic DEFINITION and emits NO edge — the reference keys
    # the edge off the CONSTRUCTED symbol display, which dangles
    # (SymbolMapper.BuildStableSymbolKey, no .OriginalDefinition)
    if "<" in text:
        text = _RE_TARGS_CALL.sub(r"\g<n>(", text)

    # nameof(...) argument spans are blanked BEFORE the member-access /
    # identifier scans: Roslyn returns SymbolInfo.Symbol = null inside
    # nameof (CandidateReason.MemberGroup), so neither a bare identifier
    # (nameof(Run)) nor a member access (nameof(_dep.Run)) binds anything —
    # the reference's IMethodSymbol pattern-match adds no edge
    if "nameof" in text:
        text = _RE_NAMEOF.sub(
            lambda m: "nameof(" + " " * len(m.group(1)) + ")", text)

    # --- invocation pass ----------------------------------------------------
    has_new = "new" in text
    for m in (_RE_NEW.finditer(text) if has_new else ()):
        emit_ctor(m.group(1), m.group(2))

    # --- expression receivers of statically-known type ----------------------
    def emit_recv_chain(base_tok: str | None, rest: str) -> None:
        """Members chained off an EXPRESSION receiver whose type the lexer
        knows syntactically (object creation, cast, same-typed ternary):
        segment 0 binds directly on the receiver type; segment i binds
        through i retsig hops, exactly like an identifier-rooted chain
        (Roslyn binds the receiver expression's type,
        MemberDependencyExtractor.cs:77-182)."""
        if base_tok is None:
            return
        base_tok = base_tok.rstrip("?")
        if _is_keywordish(base_tok):
            return  # metadata receiver -> member keys dangle -> no edge
        segs = _RE_SEGS.findall(rest)
        for i, (nm, arg) in enumerate(segs):
            if nm in _MODIFIER_WORDS:
                return
            if i == 0:
                mention_once("invoke_via", nm, base_tok, _count_args(arg),
                             [_classify_arg(a, locals_, t.fields, t.display)
                              for a in _split_args(arg)])
            else:
                emit_chain(base_tok,
                           tuple(hop_sig(n2, a2) for n2, a2 in segs[:i]),
                           nm, arg)

    for m in (_RE_NEW_RECV.finditer(text) if has_new else ()):
        # `new Dep(..).M()..` — the ctor edge comes from the _RE_NEW scan
        emit_recv_chain(m.group("t"), m.group("rest"))
    for m in _RE_CAST_RECV.finditer(text):
        # `((Dep)o).M()..` — the cast is an explicit-conversion candidate
        # (CastExpressionSyntax, :130-139); reference-type casts bind no
        # conversion method, so that mention dangles unless a user-defined
        # operator exists. An `object` operand NEVER binds a user-defined
        # conversion: C# forbids declaring one from/to object (CS0553-
        # family — a built-in reference conversion always exists), so
        # `(Dep)o` is a pure downcast and Roslyn returns no method symbol.
        tgt, operand = m.group("t"), m.group("e")
        op_type = type_of(operand)
        if op_type != "object" and not (
                _is_keywordish(tgt.rstrip("?")) and _is_keywordish(op_type)):
            conv("conv_expl", tgt, op_type)
        emit_recv_chain(tgt, m.group("rest"))
    for m in _RE_TERN_RECV.finditer(text):
        # `(f ? a : b).M()..` — same-typed operands give the conditional
        # its type (best common type); differing types are out of the
        # lexer subset -> no mention -> no edge
        ta, tb = type_of(m.group("a")), type_of(m.group("b"))
        if ta is not None and ta == tb:
            emit_recv_chain(ta, m.group("rest"))

    for rx, n_heads in ((_RE_CHAIN, 1), (_RE_CHAIN3, 2), (_RE_CHAIN4, 3)):
        # chained members: `recv.M1(a1).M2(a2)[.M3(a3)]` — M1's INVOKES
        # comes from the _RE_CALL scan below; each later member binds
        # through the PRECEDING call's return type, which only the
        # link-time retsig dictionary knows (reference: Roslyn binds the
        # full chain semantically, MemberDependencyExtractor.cs:77-182).
        # _RE_CHAIN fires on a longer chain's prefix too, giving M2 its
        # edge; _RE_CHAIN3/_RE_CHAIN4 add M3's/M4's deeper bindings.
        for m in rx.finditer(text):
            parts = [(m.group(f"m{i}"), m.group(f"a{i}"))
                     for i in range(1, n_heads + 2)]
            if any(name in _MODIFIER_WORDS for name, _ in parts):
                continue
            pre = text[max(0, m.start() - 4):m.start()]
            if pre.endswith("new ") or pre.endswith("new"):
                continue  # `new X(..).M(..)` out of the subset's chain scope
            base_info = chain_base(m.group("recv"))
            if base_info is None:
                continue  # keyword/BCL/unknown receiver -> dangles -> no edge
            base, prefix = base_info
            hops = prefix + tuple(hop_sig(n, a) for n, a in parts[:-1])
            emit_chain(base, hops, parts[-1][0], parts[-1][1])

    # member-access chains containing PROPERTY hops: `a.Prop.M()`,
    # `this.P1.P2.M()`, mixed `a.Prop.B().M()` / `a.B().Prop.M()`. Pure-call
    # chains skip (the _RE_CHAIN/_RE_CHAIN3/_RE_CHAIN4 scans above own them);
    # the final segment must be an invocation (a bare trailing property reads no
    # member the subset records). Namespace-qualified static calls
    # (`Sys.Util.Go()`) parse as property hops off a static type receiver
    # and drop in the propsig lookup — same no-edge outcome they had before.
    for m in _RE_MCHAIN.finditer(text):
        segs = [m.group(g) for g in ("s1", "s2", "s3", "s4") if m.group(g)]
        parsed = []
        for s in segs:
            if "(" in s:
                nm, arg = s.split("(", 1)
                parsed.append((nm.strip(), arg[:-1], True))
            else:
                parsed.append((s, None, False))
        if not parsed[-1][2]:
            continue  # no trailing invocation
        hops_src = parsed[:-1]
        if not hops_src or all(is_call for _, _, is_call in hops_src):
            continue  # plain call or pure-call chain: covered above
        if any(nm in _MODIFIER_WORDS for nm, _, _ in parsed):
            continue
        pre = text[max(0, m.start() - 4):m.start()]
        if pre.endswith("new ") or pre.endswith("new"):
            continue
        base_info = chain_base(m.group("recv"))
        if base_info is None:
            continue
        base, prefix = base_info
        hops = prefix + tuple(
            hop_sig(nm, arg) if is_call else nm + US + "P"
            for nm, arg, is_call in hops_src)
        emit_chain(base, hops, parsed[-1][0], parsed[-1][1])

    # method groups behind a member access: `Action f = _dep.Run;`,
    # `Accept(_dep.Run);` — a MemberAccessExpressionSyntax that is NOT an
    # invocation target binds to the method symbol when the name is a
    # method group (MemberDependencyExtractor.cs:163-169). The mention
    # carries no argument list; the link-time lookup matches by bare name
    # against the Method-only dictionary, so property/field READS through
    # the same syntax resolve to non-method symbols and add nothing (the
    # reference's IMethodSymbol pattern-match filter)
    for m in _RE_MGROUP.finditer(text):
        recv, gname = m.group("recv"), m.group("name")
        if recv in _MODIFIER_WORDS or gname in _MODIFIER_WORDS:
            continue
        base_info = chain_base(recv)
        if base_info is None:
            continue  # keyword/BCL/unknown receiver -> metadata symbol -> dangles
        base, prefix = base_info
        if prefix:
            continue  # group off a tracked chain head: out of the subset
        if base is None:
            mention_once("invoke", gname, t.display)
        else:
            mention_once("invoke_via", gname, base)

    # indexer receivers: `reg[k].M(..)` — the element access binds this[..];
    # M resolves against the collection's value/element type (an unknown or
    # non-collection receiver dangles, the reference's no-edge outcome)
    for m in _RE_INDEX_CALL.finditer(text):
        rt = _index_elem_type(type_of(m.group("recv")))
        if rt and not _is_keywordish(rt):
            argstr = m.group("a")
            mention_once("invoke_via", m.group("m"), rt,
                         _count_args(argstr),
                         [_classify_arg(a, locals_, t.fields, t.display)
                          for a in _split_args(argstr)])

    # innermost-first sweeps: `Outer(Inner(x))` — a flat argument capture
    # would swallow Inner as Outer's argument text and bind neither
    # correctly, while Roslyn binds BOTH InvocationExpressions (:96-104).
    # Each sweep matches only calls whose argument list contains no parens
    # (innermost), emits them, and blanks the span to a '#' placeholder so
    # the NEXT sweep sees the outer call with the right arity and an
    # unclassifiable ('?') argument — the lexer cannot know the inner
    # call's return type (rank-by-arity, like any complex argument
    # expression). Non-nested bodies finish in one sweep.
    sweep_emits: list[tuple] = []
    cur_text = _RE_LAMBDA_PARENS.sub(lambda m: " " * len(m.group(0)), text)
    for _sweep in range(_MAX_CHAIN_HOPS):
        pieces: list[str] = []
        last = 0
        for m in _RE_CALL_IN.finditer(cur_text):
            pre = cur_text[max(0, m.start() - 4):m.start()]
            pieces.append(cur_text[last:m.start()])
            pieces.append("#".center(m.end() - m.start()))
            last = m.end()
            # `new X(...)`: ctor handled by the _RE_NEW scan; still blanked
            if not (pre.endswith("new ") or pre.endswith("new")):
                sweep_emits.append((m.group("recv"), m.group("name"),
                                    m.group("a")))
        if last == 0:
            break
        pieces.append(cur_text[last:])
        cur_text = "".join(pieces)

    for recv, name, argstr in sweep_emits:
        nargs = _count_args(argstr)
        if name in _MODIFIER_WORDS or (recv is None and name in _MODIFIER_WORDS):
            continue
        arg_list = _split_args(argstr)
        args = [_classify_arg(a, locals_, t.fields, t.display) for a in arg_list]
        # bare method-group ARGUMENT (`Accept(Run);`): an IdentifierNameSyntax
        # outside invocation position resolving to an own-type method is a
        # method group -> INVOKES (MemberDependencyExtractor.cs:155-161);
        # locals/fields shadow the method name per C# lookup order. `nameof`
        # arguments are excluded: a method group inside nameof never binds
        # (SymbolInfo.Symbol is null, CandidateReason.MemberGroup), so the
        # reference's IMethodSymbol pattern-match adds nothing
        if name != "nameof":
            for a in arg_list:
                a = a.strip()
                if (a in type_sigs and a not in locals_ and a not in t.fields
                        and _RE_IDENT.match(a)):
                    mention_once("invoke", a, t.display)
        # seen-key includes classified arg tokens: calls that resolve to
        # DIFFERENT overloads must each survive (per-callee dedup happens on
        # resolved keys, AddInvokes:218-230 / link_edges distinct)
        k = ("call", recv, name, nargs, tuple(args))
        if k in seen:
            continue
        seen.add(k)
        if recv == "base":
            # base.M() binds in the BASE type's scope (Roslyn base-access
            # lookup); link maps the own display through the basesig dim
            em.mention("invoke_base", caller_key, R_INVOKES, name, t.display,
                       [], nargs, m_args=args)
        elif recv is None or recv == "this":
            # own-type call: resolve against own type display directly
            em.mention("invoke", caller_key, R_INVOKES, name, t.display, [],
                       nargs, m_args=args)
            if recv is None and static_usings and name not in type_sigs:
                # using-static fallback: a bare simple name with NO own
                # member of that name looks through the file's using-static
                # imports (Roslyn simple-name lookup order: members of the
                # enclosing type AND ITS BASES win; two imports declaring
                # the same applicable member are a CS0229-style ambiguity
                # the subset resolves by import order). m_head carries the
                # imported type displays; the link side joins them straight
                # into the member lookup. m_recv carries the OWN type
                # display: the lexer cannot see INHERITED members (base is
                # cross-file), so link suppresses this mention when the
                # inherit-expanded dictionary declares the name on the own
                # type — C# scope lookup stops there before consulting
                # using-static imports.
                em.mention("invoke_ustatic", caller_key, R_INVOKES, name,
                           t.display, [], nargs, m_args=args,
                           m_head=US.join(static_usings))
            # implicit conversions at ARGUMENT position against the own-type
            # overload whose arity matches (ArgumentSyntax candidates, :184-193)
            for sig in type_sigs.get(name, []):
                if len(sig) != nargs:
                    continue
                for ptok, atok in zip(sig, args):
                    if (_is_keywordish(ptok.rstrip("?")) and atok not in ("?", "")
                            and not _is_keywordish(atok)):
                        conv("conv_impl", ptok, atok)
        elif recv in local_heads and not type_of(recv):
            # local bound from a call return (`var x = a.B(); x.C()`): the
            # call binds through the pending head hops, same link path as a
            # literal chain a.B().C()
            base, prefix = local_heads[recv]
            emit_chain(base, prefix, name, argstr)
        elif recv in t.fields or recv in locals_:
            ftok = (t.fields.get(recv) or locals_.get(recv, "")).rstrip("?")
            if ftok in KEYWORD_TYPES or ftok in EXTERNAL_TYPE_DISPLAY or ftok.startswith("System."):
                disp = EXTERNAL_TYPE_DISPLAY.get(ftok, ftok)
                em.rel(caller_key, keys.csharp_key(repo, f"{disp}.{name}(…)"), R_INVOKES)
            elif ftok:
                em.mention("invoke_via", caller_key, R_INVOKES, name, ftok,
                           cand_ns, nargs, m_args=args)
            else:
                em.mention("invoke_static", caller_key, R_INVOKES, name, recv,
                           cand_ns, nargs, m_args=args)
        elif recv in EXTERNAL_TYPE_DISPLAY or recv.startswith("System."):
            disp = EXTERNAL_TYPE_DISPLAY.get(recv, recv)
            em.rel(caller_key, keys.csharp_key(repo, f"{disp}.{name}(…)"), R_INVOKES)
        else:
            # static call on an in-repo type? try resolving the receiver as a
            # type; locals/params fall through to a dangling key at link time
            em.mention("invoke_static", caller_key, R_INVOKES, name, recv,
                       cand_ns, nargs, m_args=args)

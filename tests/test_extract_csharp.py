"""C# subset lexer vs the reference processor's documented output
(RoslynSymbolProcessor.cs, MemberDependencyExtractor.cs, SymbolMapper.cs)."""

from codegraph.extract.dispatch import _extract_one
from codegraph.schema import ACC_ORDER

SNIPPET = """using System;
using MyApp.Core;

namespace MyApp.Feature;

/// <summary>Doc for Widget.</summary>
// leading comment
public class Widget
{
    private readonly Helper _helper;
    public int Count { get; set; }
    public event EventHandler Changed;
    public Widget(Helper helper)
    {
        _helper = helper;
    }
    public string Render(int n)
    {
        _helper.Fix();
        Console.WriteLine(n);
        return n.ToString();
    }
    private void Secret()
    {
    }
}

public interface IWidget
{
    void Hidden();
}

public enum Color
{
    Red,
    Green
}
"""


def _run(min_acc="Private"):
    return _extract_one("myrepo", "src/MyApp/Feature/Widget.cs", SNIPPET,
                        ACC_ORDER[min_acc], {}, {})


def _symbols(rows):
    return {r["key"]: r for r in rows if r["rec"] == "symbol"}


def test_symbol_keys_and_kinds():
    syms = _symbols(_run())
    assert "myrepo:MyApp.Feature.Widget" in syms
    assert syms["myrepo:MyApp.Feature.Widget"]["kind"] == "NamedType"
    assert syms["myrepo:MyApp.Feature.Widget"]["fqn"] == "global::MyApp.Feature.Widget"
    assert syms["myrepo:MyApp.Feature.Widget"]["accessibility"] == "Public"
    # members keyed with CSharpErrorMessageFormat-style signatures
    assert "myrepo:MyApp.Feature.Widget._helper" in syms
    assert syms["myrepo:MyApp.Feature.Widget._helper"]["kind"] == "Field"
    assert syms["myrepo:MyApp.Feature.Widget._helper"]["accessibility"] == "Private"
    assert "myrepo:MyApp.Feature.Widget.Count" in syms
    assert syms["myrepo:MyApp.Feature.Widget.Count"]["kind"] == "Property"
    assert "myrepo:MyApp.Feature.Widget.Changed" in syms
    assert syms["myrepo:MyApp.Feature.Widget.Changed"]["kind"] == "Event"
    assert "myrepo:MyApp.Feature.Widget.Widget(Helper)" in syms  # ctor signature
    assert syms["myrepo:MyApp.Feature.Widget.Widget(Helper)"]["name"] == ".ctor"
    assert "myrepo:MyApp.Feature.Widget.Render(int)" in syms
    assert "myrepo:MyApp.Feature.Widget.Secret()" in syms
    assert "myrepo:MyApp.Feature.IWidget" in syms
    assert "myrepo:MyApp.Feature.IWidget.Hidden()" in syms
    assert syms["myrepo:MyApp.Feature.IWidget.Hidden()"]["accessibility"] == "Public"
    assert "myrepo:MyApp.Feature.Color" in syms
    assert "myrepo:MyApp.Feature.Color.Red" in syms
    assert syms["myrepo:MyApp.Feature.Color.Red"]["kind"] == "Field"  # enum member


def test_doc_and_comments():
    syms = _symbols(_run())
    w = syms["myrepo:MyApp.Feature.Widget"]
    assert "Doc for Widget." in w["documentation"]
    assert w["comments"] == "// leading comment"
    assert w["start_line"] == 8
    assert w["end_line"] == 26  # closing brace line (GetLineSpan end)


def test_accessibility_filter_public():
    # AccessibilityFilter.cs:14-18 — private members dropped at min=Public
    syms = _symbols(_run("Public"))
    assert "myrepo:MyApp.Feature.Widget.Secret()" not in syms
    assert "myrepo:MyApp.Feature.Widget._helper" not in syms
    assert "myrepo:MyApp.Feature.Widget.Count" in syms
    assert "myrepo:MyApp.Feature.Color.Red" in syms  # enum members Public


def test_contains_edges():
    rows = _run()
    rels = {(r["src_key"], r["rel_type"], r["dst_key"])
            for r in rows if r["rec"] == "rel"}
    assert ("myrepo:MyApp.Feature.Widget", "src__CONTAINS",
            "myrepo:MyApp.Feature.Widget.Count") in rels
    assert ("myrepo:MyApp.Feature.Color", "src__CONTAINS",
            "myrepo:MyApp.Feature.Color.Red") in rels
    # BCL deps dangle with error-format displays (drop at linking)
    assert ("myrepo:MyApp.Feature.Widget", "src__DEPENDS_ON", "myrepo:int") in rels
    assert ("myrepo:MyApp.Feature.Widget", "src__DEPENDS_ON",
            "myrepo:System.EventHandler") in rels
    # Console.WriteLine emits a dangling external INVOKES
    assert any(r[1] == "src__INVOKES" and "System.Console" in r[2] for r in rels)


def test_mentions():
    rows = _run()
    mentions = [r for r in rows if r["rec"] == "mention"]
    type_m = [m for m in mentions if m["m_kind"] == "type"]
    # Helper appears as field type + ctor param type from the containing type
    assert all(m["m_name"] == "Helper" for m in type_m)
    assert all(m["m_from_key"] == "myrepo:MyApp.Feature.Widget" for m in type_m)
    # candidate namespaces: own ns first, then usings in order
    assert type_m[0]["m_usings"].split("\x1f") == [
        "MyApp.Feature", "System", "MyApp.Core"]
    via = [m for m in mentions if m["m_kind"] == "invoke_via"]
    assert via and via[0]["m_recv"] == "Helper" and via[0]["m_name"] == "Fix"
    usings = [m for m in mentions if m["m_kind"] == "using"]
    assert {m["m_name"] for m in usings} == {"System", "MyApp.Core"}


def test_filemeta_namespace():
    rows = _run()
    fm = [r for r in rows if r["rec"] == "filemeta"]
    assert fm[0]["file_namespace"] == "MyApp.Feature"


OPS_SNIPPET = """using System;

namespace MyApp.Money;

public class Money
{
    public int Value { get; set; }
    private int _a, _b;
    private readonly Box<int> _box;
    public static Money operator +(Money a, Money b)
    {
        return a;
    }
    public static bool operator !(Money a)
    {
        return false;
    }
    public static implicit operator int(Money m)
    {
        return 0;
    }
    public static explicit operator Money(int v)
    {
        return null;
    }
    public class Inner
    {
        public int Size { get; set; }
    }
}

public class Wallet
{
    public void Run()
    {
    }
    public void Pay(int v)
    {
    }
    public void Pay(string v)
    {
    }
    public int Use(Money x, Money y)
    {
        var z = x + y;
        var f = !x;
        var k = (Money)7;
        int n = x;
        Pay(3);
        Pay("cash");
        return z;
    }
    public void Hook()
    {
        Action go = Run;
        go();
    }
}

public class Box<T>
{
    public T Item { get; set; }
}
"""


def _run_ops():
    return _extract_one("r", "src/MyApp/Money/Money.cs", OPS_SNIPPET,
                        ACC_ORDER["Private"], {}, {})


def test_operator_and_conversion_symbols():
    """Operator/conversion declarations become Method symbols with Roslyn
    op_* names and CSharpErrorMessageFormat displays
    (MemberDependencyExtractorTests.cs:425-500,598-650)."""
    syms = _symbols(_run_ops())
    add = syms["r:MyApp.Money.Money.operator +(Money, Money)"]
    assert add["kind"] == "Method" and add["name"] == "op_Addition"
    neg = syms["r:MyApp.Money.Money.operator !(Money)"]
    assert neg["name"] == "op_LogicalNot"
    imp = syms["r:MyApp.Money.Money.implicit operator int(Money)"]
    assert imp["name"] == "op_Implicit"
    exp = syms["r:MyApp.Money.Money.explicit operator Money(int)"]
    assert exp["name"] == "op_Explicit"


def test_multi_declarator_and_generic_and_nested():
    syms = _symbols(_run_ops())
    # multi-declarator -> one IFieldSymbol per variable (RoslynSymbolProcessor.cs:216-240)
    assert "r:MyApp.Money.Money._a" in syms
    assert "r:MyApp.Money.Money._b" in syms
    # generic display keeps type parameters (SymbolMapper.cs:43-47)
    assert "r:MyApp.Money.Box<T>" in syms
    assert syms["r:MyApp.Money.Box<T>"]["name"] == "Box"
    assert "r:MyApp.Money.Box<T>.Item" in syms
    # nested type + member; CONTAINS outer->Inner
    assert "r:MyApp.Money.Money.Inner" in syms
    assert "r:MyApp.Money.Money.Inner.Size" in syms
    rels = {(r["src_key"], r["rel_type"], r["dst_key"])
            for r in _run_ops() if r["rec"] == "rel"}
    assert ("r:MyApp.Money.Money", "src__CONTAINS",
            "r:MyApp.Money.Money.Inner") in rels
    assert ("r:MyApp.Money.Money.Inner", "src__CONTAINS",
            "r:MyApp.Money.Money.Inner.Size") in rels


def test_operator_usage_mentions():
    """Binary/prefix operators, casts, implicit conversions at
    initializer/argument/return, and method groups all emit INVOKES mentions
    (MemberDependencyExtractor.cs:77-230)."""
    mentions = [r for r in _run_ops() if r["rec"] == "mention"]
    by_kind = {}
    for m in mentions:
        by_kind.setdefault(m["m_kind"], []).append(m)
    ops = {(m["m_name"], m["m_recv"]) for m in by_kind.get("op", [])}
    assert ("operator +", "Money") in ops
    assert ("operator !", "Money") in ops
    convs = {(m["m_kind"], m["m_name"], m["m_recv"])
             for m in mentions if m["m_kind"].startswith("conv")}
    assert ("conv_expl", "Money", None) in convs       # (Money)7 cast
    assert ("conv_impl", "int", "Money") in convs      # int n = x; / return z
    # method group: Action go = Run; -> own-type invoke with no arg list
    mg = [m for m in by_kind.get("invoke", [])
          if m["m_name"] == "Run" and m["m_nargs"] is None]
    assert mg and mg[0]["m_recv"] == "MyApp.Money.Wallet"
    # overloads carry classified arg tokens for param-token matching
    pays = {m["m_args"] for m in by_kind.get("invoke", []) if m["m_name"] == "Pay"}
    assert pays == {"int", "string"}


def test_global_using_records():
    src = "global using MyApp.Core;\n"
    rows = _extract_one("r", "src/MyApp/GlobalUsings.cs", src,
                        ACC_ORDER["Private"], {}, {})
    kinds = {(r["m_kind"], r["m_name"]) for r in rows if r["rec"] == "mention"}
    # both the file-level using mention AND the repo-wide global pool record
    assert ("using", "MyApp.Core") in kinds
    assert ("global_using", "MyApp.Core") in kinds


def test_nullable_member_displays():
    """Nullable value types survive in member displays (int? in the
    CSharpErrorMessageFormat param list, SymbolMapper.cs:43-47) while type
    deps strip the annotation (int? -> int, string? -> string)."""
    src = (
        "namespace MyApp.Core;\n"
        "\n"
        "public class Cache\n"
        "{\n"
        "    public int? Slot { get; set; }\n"
        "    public string? Find(int? key)\n"
        "    {\n"
        "        return null;\n"
        "    }\n"
        "}\n"
    )
    rows = _extract_one("r", "src/MyApp/Core/Cache.cs", src,
                        ACC_ORDER["Private"], {}, {})
    syms = {s["key"]: s for s in rows if s["rec"] == "symbol"}
    assert "r:MyApp.Core.Cache.Slot" in syms
    assert syms["r:MyApp.Core.Cache.Slot"]["kind"] == "Property"
    assert "r:MyApp.Core.Cache.Find(int?)" in syms
    rels = {(r["src_key"], r["rel_type"], r["dst_key"])
            for r in rows if r["rec"] == "rel"}
    # deps target the unannotated type keys (both dangle like any BCL type)
    assert ("r:MyApp.Core.Cache", "src__DEPENDS_ON", "r:int") in rels
    assert ("r:MyApp.Core.Cache", "src__DEPENDS_ON", "r:string") in rels
    assert not any(d.endswith("int?") for _, _, d in rels)


def test_expression_bodied_method():
    """Arrow-bodied methods are IMethodSymbols and their expression body
    participates in the INVOKES surface (RoslynSymbolProcessor kinds;
    MemberDependencyExtractor.cs:77-230 walks arrow bodies too)."""
    src = (
        "namespace MyApp.Core;\n"
        "\n"
        "public class Meter\n"
        "{\n"
        "    public int Peek() => Grab();\n"
        "    private int Grab()\n"
        "    {\n"
        "        return 1;\n"
        "    }\n"
        "}\n"
    )
    rows = _extract_one("r", "src/MyApp/Core/Meter.cs", src,
                        ACC_ORDER["Private"], {}, {})
    syms = {s["key"]: s for s in rows if s["rec"] == "symbol"}
    assert "r:MyApp.Core.Meter.Peek()" in syms
    assert syms["r:MyApp.Core.Meter.Peek()"]["kind"] == "Method"
    assert "r:MyApp.Core.Meter.Grab()" in syms
    # the arrow body's own-type call emits an invoke mention
    inv = [r for r in rows if r["rec"] == "mention" and r["m_kind"] == "invoke"
           and r["m_name"] == "Grab"]
    assert inv and inv[0]["m_nargs"] == 0


def test_struct_and_record_types():
    """struct/record declarations are BaseTypeDeclarationSyntax — processed
    exactly like classes (RoslynSymbolProcessor.cs:101-112); only
    syntax-declared members emit (no synthesized record members)."""
    src = (
        "namespace MyApp.Core;\n"
        "\n"
        "public struct Point\n"
        "{\n"
        "    public int X { get; set; }\n"
        "}\n"
        "public record Note\n"
        "{\n"
        "    public int Id { get; set; }\n"
        "}\n"
    )
    rows = _extract_one("r", "src/MyApp/Core/Shapes.cs", src,
                        ACC_ORDER["Private"], {}, {})
    syms = {s["key"]: s for s in rows if s["rec"] == "symbol"}
    assert syms["r:MyApp.Core.Point"]["kind"] == "NamedType"
    assert syms["r:MyApp.Core.Note"]["kind"] == "NamedType"
    assert syms["r:MyApp.Core.Point.X"]["kind"] == "Property"
    assert syms["r:MyApp.Core.Note.Id"]["kind"] == "Property"
    rels = {(r["src_key"], r["rel_type"], r["dst_key"])
            for r in rows if r["rec"] == "rel"}
    assert ("r:MyApp.Core.Point", "src__CONTAINS", "r:MyApp.Core.Point.X") in rels
    assert ("r:MyApp.Core.Note", "src__CONTAINS", "r:MyApp.Core.Note.Id") in rels


def test_lambda_body_calls_and_typed_params():
    """Calls inside lambda bodies attribute to the ENCLOSING member (Roslyn
    walks the whole body, MemberDependencyExtractor.cs:77-104); explicitly
    typed lambda params act as typed locals for receiver resolution."""
    src = """using MyApp.Core;

namespace MyApp.Feature;

public class Sweeper
{
    public void Sweep()
    {
        Action go = () => Tick();
        Batch((Helper d) => d.Fix());
    }
    private void Tick()
    {
    }
    private void Batch(Action<Helper> op)
    {
    }
}
"""
    rows = _extract_one("r", "src/MyApp/Sweeper.cs", src,
                        ACC_ORDER["Private"], {}, {})
    mentions = [r for r in rows if r["rec"] == "mention"]
    own = {(m["m_name"], m["m_recv"]) for m in mentions
           if m["m_kind"] == "invoke"}
    # lambda-body own-type call binds from the enclosing method
    assert ("Tick", "MyApp.Feature.Sweeper") in own
    # typed lambda param resolves the receiver type
    via = {(m["m_name"], m["m_recv"]) for m in mentions
           if m["m_kind"] == "invoke_via"}
    assert ("Fix", "Helper") in via
    # the Batch(...) call itself is still a real invocation
    assert ("Batch", "MyApp.Feature.Sweeper") in own


def test_generic_constraint_clause_stripped_from_displays():
    """`where T : ...` clauses never reach a Roslyn display
    (CSharpErrorMessageFormat); the declaration still parses."""
    src = """namespace MyApp.Feature;

public class Holder<T> where T : class
{
    public T Clamp<U>(U item) where U : notnull
    {
        return default;
    }
    public void Use()
    {
        Clamp(7);
    }
}
"""
    rows = _extract_one("r", "src/MyApp/Holder.cs", src,
                        ACC_ORDER["Private"], {}, {})
    syms = {r["key"] for r in rows if r["rec"] == "symbol"}
    assert "r:MyApp.Feature.Holder<T>" in syms
    assert "r:MyApp.Feature.Holder<T>.Clamp<U>(U)" in syms
    calls = {(m["m_name"], m["m_nargs"]) for m in rows
             if m["rec"] == "mention" and m["m_kind"] == "invoke"}
    assert ("Clamp", 1) in calls


def test_retsig_and_extsig_records():
    """Method declarations emit return-token records; `this`-param methods
    emit extension-signature records (chained-call / extension binding)."""
    src = """namespace MyApp.Feature;

public static class Ext
{
    public static int Boost(this Widget w, int amount)
    {
        return amount;
    }
}
"""
    rows = _extract_one("r", "src/MyApp/Ext.cs", src,
                        ACC_ORDER["Private"], {}, {})
    rets = [r for r in rows if r["rec"] == "mention" and r["m_kind"] == "retsig"]
    assert any(r["m_name"] == "Boost" and r["m_recv"] == "MyApp.Feature.Ext"
               and r["m_head"] == "int" for r in rets)
    exts = [r for r in rows if r["rec"] == "mention" and r["m_kind"] == "extsig"]
    assert any(r["m_name"] == "Boost" and r["m_recv"] == "Widget"
               and r["m_nargs"] == 1
               and r["m_head"] == "MyApp.Feature.Ext.Boost(Widget, int)"
               for r in exts)


def test_property_typed_receiver_and_expression_arg():
    """Properties act as typed receivers (Roslyn binds Item.Run() through
    the property's type); expression arguments stay unclassifiable."""
    src = """namespace MyApp.Feature;

public class Holder
{
    public Helper Item { get; set; }
    public int Count { get; set; }
    public void Go()
    {
        Item.Fix();
        Pick(Count);
        Pick(Count + 1);
    }
    public void Pick(int a)
    {
    }
}
"""
    rows = _extract_one("r", "src/MyApp/Holder.cs", src,
                        ACC_ORDER["Private"], {}, {})
    mentions = [r for r in rows if r["rec"] == "mention"]
    via = {(m["m_name"], m["m_recv"]) for m in mentions
           if m["m_kind"] == "invoke_via"}
    assert ("Fix", "Helper") in via
    picks = {m["m_args"] for m in mentions if m["m_name"] == "Pick"}
    # property arg classifies through its declared type; expression stays '?'
    assert picks == {"int", "?"}


BLOCK_NS = """using System;

namespace First.Area
{
public class Alpha
{
    public void Run()
    {
        Console.WriteLine(1);
    }
}
}

namespace Second.Zone
{
public class Beta
{
    private readonly Alpha _dep;
    public void Go()
    {
        _dep.Run();
    }
}
}
"""


def test_block_scoped_and_multiple_namespaces():
    """Roslyn takes any namespace shape (CSharpHandler.cs:36-42): block
    declarations scope their types; two blocks in one file give each type
    its OWN ContainingNamespace (SymbolMapper.cs:19-21), while MEMBER rows
    carry the FILE namespace = the first type's (RoslynSymbolProcessor
    passes fileNamespace to every member record)."""
    rows = _extract_one("r", "src/App/Mixed.cs", BLOCK_NS,
                        ACC_ORDER["Private"], {}, {})
    syms = _symbols(rows)
    assert "r:First.Area.Alpha" in syms
    assert syms["r:First.Area.Alpha"]["namespace"] == "First.Area"
    assert "r:Second.Zone.Beta" in syms
    assert syms["r:Second.Zone.Beta"]["namespace"] == "Second.Zone"
    # member rows carry fileNamespace (the first type's namespace)
    assert syms["r:Second.Zone.Beta.Go()"]["namespace"] == "First.Area"
    # the file override is the first type's namespace
    meta = [r for r in rows if r["rec"] == "filemeta"][0]
    assert meta["file_namespace"] == "First.Area"
    # Beta's _dep mention resolves Alpha with Beta's OWN namespace first —
    # Alpha is NOT in scope (no using First.Area), so the invoke_via
    # candidate list must not contain Second.Zone-only false positives;
    # the candidate list is [own ns] + usings
    m = [r for r in rows if r["rec"] == "mention"
         and r["m_kind"] == "invoke_via" and r["m_name"] == "Run"][0]
    assert m["m_usings"].split("\x1f")[0] == "Second.Zone"


def test_file_scoped_namespace_after_block_composes_nothing():
    """A later file-scoped declaration replaces the active namespace for
    the remaining types (subset shape: sequential, not nested)."""
    src = "namespace A;\npublic class X\n{\n}\n"
    rows = _extract_one("r", "src/App/P.cs", src, ACC_ORDER["Private"], {}, {})
    assert "r:A.X" in _symbols(rows)

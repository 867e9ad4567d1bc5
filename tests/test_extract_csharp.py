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

"""Method groups beyond simple local assignment + assignment-position
implicit conversions.

Reference semantics (MemberDependencyExtractor.cs:155-169, 205-216): a
MemberAccessExpressionSyntax or IdentifierNameSyntax that is NOT an
invocation target but resolves to an IMethodSymbol is a method group ->
INVOKES; a property/field read through the same syntax resolves to a
non-method symbol -> nothing. AssignmentExpressionSyntax right-hand sides
are implicit-conversion candidates like initializers/arguments/returns.
"""

import pytest

from codegraph import pipeline

# full-pipeline Spark e2e: minutes per test at tiny scale (fixed plan/stage
# overhead) - excluded from the fast subset via pytest -m "not slow"
pytestmark = pytest.mark.slow


def _src(spark, files):
    rows = [("r1", path, "c" * 40, "csharp", content) for path, content in files]
    return spark.createDataFrame(rows, "repo string, path string, "
                                       "commit string, lang string, content string")


def _edges(spark, files):
    res = pipeline.run_pipeline(spark, _src(spark, files), persist=False)
    return {(r["src_key"], r["rel_type"], r["dst_key"])
            for r in res["linked"].collect()}


WORKER = """namespace Lib;

public class Worker
{
    public int Size { get; set; }
    public void Pulse()
    {
    }
}
"""


def test_member_access_method_group_binds(spark):
    caller = """using System;
using Lib;

namespace App;

public class Caller
{
    private readonly Worker _dep;
    public void Wire()
    {
        Action relay = _dep.Pulse;
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Worker.cs", WORKER),
        ("src/App/Caller.cs", caller),
    ])
    assert ("r1:App.Caller.Wire()", "src__INVOKES",
            "r1:Lib.Worker.Pulse()") in edges


def test_property_read_is_not_a_method_group(spark):
    # `_dep.Size` resolves to an IPropertySymbol -> the reference's
    # IMethodSymbol filter adds nothing; the replica's Method-only member
    # dictionary reproduces the drop
    caller = """using Lib;

namespace App;

public class Caller
{
    private readonly Worker _dep;
    public int Peek()
    {
        return _dep.Size;
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Worker.cs", WORKER),
        ("src/App/Caller.cs", caller),
    ])
    assert not any(rel == "src__INVOKES" and dst == "r1:Lib.Worker.Size"
                   for _src_k, rel, dst in edges)


def test_identifier_method_group_argument(spark):
    caller = """using System;

namespace App;

public class Caller
{
    public void Go()
    {
    }
    public void Wire()
    {
        Accept(Go);
    }
    private void Accept(Action op)
    {
    }
}
"""
    edges = _edges(spark, [("src/App/Caller.cs", caller)])
    src = "r1:App.Caller.Wire()"
    assert (src, "src__INVOKES", "r1:App.Caller.Go()") in edges
    assert (src, "src__INVOKES", "r1:App.Caller.Accept(Action)") in edges


def test_nameof_method_group_binds_nothing(spark):
    # a method group inside nameof never binds (SymbolInfo.Symbol is null,
    # CandidateReason.MemberGroup) -> the reference adds no INVOKES
    caller = """namespace App;

public class Caller
{
    public void Go()
    {
    }
    public string Label()
    {
        return nameof(Go);
    }
}
"""
    edges = _edges(spark, [("src/App/Caller.cs", caller)])
    assert ("r1:App.Caller.Label()", "src__INVOKES",
            "r1:App.Caller.Go()") not in edges


def test_assignment_position_implicit_conversion(spark):
    lib = """namespace Lib;

public class Money
{
    public static implicit operator int(Money m)
    {
        return 0;
    }
}
"""
    caller = """using Lib;

namespace App;

public class Caller
{
    public void Shift(Money q)
    {
        int n = 0;
        n = q;
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Money.cs", lib),
        ("src/App/Caller.cs", caller),
    ])
    assert ("r1:App.Caller.Shift(Money)", "src__INVOKES",
            "r1:Lib.Money.implicit operator int(Money)") in edges


def test_out_param_display_keeps_ref_kind(spark):
    # CSharpErrorMessageFormat renders ref-kind keywords in parameter
    # displays: the symbol key is 'TryGet(out int)' and the out-var call
    # site binds to it by arity
    caller = """namespace App;

public class Caller
{
    public int Count { get; set; }
    public bool TryGet(out int v)
    {
        v = Count;
        return true;
    }
    public void UseTry()
    {
        TryGet(out var r);
    }
}
"""
    edges = _edges(spark, [("src/App/Caller.cs", caller)])
    assert ("r1:App.Caller.UseTry()", "src__INVOKES",
            "r1:App.Caller.TryGet(out int)") in edges


def test_ternary_local_inference(spark):
    # `var pick = f ? _dep : other;` — same-typed operands give the
    # conditional its type; calls on the local bind through it
    caller = """using Lib;

namespace App;

public class Caller
{
    private readonly Worker _dep;
    public void Branch(bool f)
    {
        var other = _dep;
        var pick = f ? _dep : other;
        pick.Pulse();
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Worker.cs", WORKER),
        ("src/App/Caller.cs", caller),
    ])
    assert ("r1:App.Caller.Branch(bool)", "src__INVOKES",
            "r1:Lib.Worker.Pulse()") in edges


def test_using_static_bare_call_binds(spark):
    # `using static Lib.Util;` + bare Snap(4): no own member named Snap ->
    # simple-name lookup falls through to the imported static type
    util = """namespace Lib;

public static class Util
{
    public static int Snap(int v)
    {
        return v;
    }
}
"""
    caller = """using static Lib.Util;

namespace App;

public class Caller
{
    public void Trim()
    {
        Snap(4);
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Util.cs", util),
        ("src/App/Caller.cs", caller),
    ])
    assert ("r1:App.Caller.Trim()", "src__INVOKES",
            "r1:Lib.Util.Snap(int)") in edges


def test_using_static_own_member_wins(spark):
    # an own member of the same name hides the import (lookup order)
    util = """namespace Lib;

public static class Util
{
    public static int Snap(int v)
    {
        return v;
    }
}
"""
    caller = """using static Lib.Util;

namespace App;

public class Caller
{
    public int Snap(int v)
    {
        return v;
    }
    public void Trim()
    {
        Snap(4);
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Util.cs", util),
        ("src/App/Caller.cs", caller),
    ])
    assert ("r1:App.Caller.Trim()", "src__INVOKES",
            "r1:App.Caller.Snap(int)") in edges
    assert ("r1:App.Caller.Trim()", "src__INVOKES",
            "r1:Lib.Util.Snap(int)") not in edges


def test_default_parameter_call_sites(spark):
    # Log(1) fills w from its default; both call arities bind the SAME
    # symbol Log(int, int) (Roslyn optional-argument fill); an exact-arity
    # overload still wins over a default-fill candidate
    caller = """namespace App;

public class Caller
{
    public void Log(int v, int w = 5)
    {
    }
    public void UseLog()
    {
        Log(1);
        Log(2, 3);
    }
}
"""
    edges = _edges(spark, [("src/App/Caller.cs", caller)])
    assert ("r1:App.Caller.UseLog()", "src__INVOKES",
            "r1:App.Caller.Log(int, int)") in edges


def test_default_fill_loses_to_exact_arity(spark):
    caller = """namespace App;

public class Caller
{
    public void Log(int v, int w = 5)
    {
    }
    public void Log(int v)
    {
    }
    public void UseLog()
    {
        Log(1);
    }
}
"""
    edges = _edges(spark, [("src/App/Caller.cs", caller)])
    assert ("r1:App.Caller.UseLog()", "src__INVOKES",
            "r1:App.Caller.Log(int)") in edges
    assert ("r1:App.Caller.UseLog()", "src__INVOKES",
            "r1:App.Caller.Log(int, int)") not in edges


def test_case_pattern_variable_typing(spark):
    # `case Worker d:` narrows d to Worker (DeclarationPatternSyntax)
    caller = """using Lib;

namespace App;

public class Caller
{
    public void Sort(object o)
    {
        switch (o)
        {
            case Worker d:
                d.Pulse();
                break;
        }
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Worker.cs", WORKER),
        ("src/App/Caller.cs", caller),
    ])
    assert ("r1:App.Caller.Sort(object)", "src__INVOKES",
            "r1:Lib.Worker.Pulse()") in edges


def test_same_type_assignment_is_identity_no_edge(spark):
    # `a = b;` between same-typed locals is an identity conversion ->
    # no user-defined operator is invoked
    caller = """using Lib;

namespace App;

public class Caller
{
    public void Swap(Worker a, Worker b)
    {
        a = b;
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Worker.cs", WORKER),
        ("src/App/Caller.cs", caller),
    ])
    assert not any("operator" in dst for _, _, dst in edges)

"""Expression-receiver INVOKES resolution: target-typed new, object-creation
receivers, parenthesized-cast receivers, and same-typed-ternary receivers.

Reference semantics (MemberDependencyExtractor.cs:77-182): Roslyn binds a
member access through the receiver EXPRESSION's type — `new Dep().Run()`
through the created type, `((Dep)o).Run()` through the cast type,
`(f ? a : b).Run()` through the conditional's best common type — and a
target-typed `Dep d = new();` binds the DECLARED type's constructor
(ImplicitObjectCreationExpressionSyntax). The replica types these receivers
lexer-side and resolves members through the same ranked link-time lookups
as identifier-rooted receivers.
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


DEP = """namespace Lib;

public class Dep
{
    public Dep()
    {
    }
    public Dep Self()
    {
        return this;
    }
    public void Ping()
    {
    }
}
"""


def test_target_typed_new_binds_declared_ctor_and_local_calls(spark):
    caller = """using Lib;

namespace App;

public class Caller
{
    public void Go()
    {
        Dep fresh = new();
        fresh.Ping();
    }
}
"""
    edges = _edges(spark, [("src/Lib/Dep.cs", DEP),
                           ("src/App/Caller.cs", caller)])
    src = "r1:App.Caller.Go()"
    assert (src, "src__INVOKES", "r1:Lib.Dep.Dep()") in edges
    assert (src, "src__INVOKES", "r1:Lib.Dep.Ping()") in edges


def test_target_typed_new_with_args_binds_matching_ctor(spark):
    dep = """namespace Lib;

public class Cfg
{
    public Cfg(int size)
    {
    }
}
"""
    caller = """using Lib;

namespace App;

public class Caller
{
    public void Go()
    {
        Cfg c = new(5);
    }
}
"""
    edges = _edges(spark, [("src/Lib/Cfg.cs", dep),
                           ("src/App/Caller.cs", caller)])
    assert ("r1:App.Caller.Go()", "src__INVOKES", "r1:Lib.Cfg.Cfg(int)") in edges


def test_object_creation_receiver_binds_member_and_chain(spark):
    caller = """using Lib;

namespace App;

public class Caller
{
    public void Go()
    {
        new Dep().Ping();
    }
    public void Chain()
    {
        new Dep().Self().Ping();
    }
}
"""
    edges = _edges(spark, [("src/Lib/Dep.cs", DEP),
                           ("src/App/Caller.cs", caller)])
    go, chain = "r1:App.Caller.Go()", "r1:App.Caller.Chain()"
    assert (go, "src__INVOKES", "r1:Lib.Dep.Dep()") in edges
    assert (go, "src__INVOKES", "r1:Lib.Dep.Ping()") in edges
    # chained form: Self binds directly on the created type, Ping through
    # Self's return (one retsig hop)
    assert (chain, "src__INVOKES", "r1:Lib.Dep.Self()") in edges
    assert (chain, "src__INVOKES", "r1:Lib.Dep.Ping()") in edges


def test_creation_rooted_var_tracking(spark):
    caller = """using Lib;

namespace App;

public class Caller
{
    public void Go()
    {
        var d = new Dep().Self();
        d.Ping();
    }
}
"""
    edges = _edges(spark, [("src/Lib/Dep.cs", DEP),
                           ("src/App/Caller.cs", caller)])
    src = "r1:App.Caller.Go()"
    assert (src, "src__INVOKES", "r1:Lib.Dep.Dep()") in edges
    assert (src, "src__INVOKES", "r1:Lib.Dep.Self()") in edges
    # d carries Self's pending return: Ping binds through the retsig hop
    assert (src, "src__INVOKES", "r1:Lib.Dep.Ping()") in edges


def test_cast_receiver_binds_on_cast_type(spark):
    # the dep DECLARES a user-defined conversion, but `(Box)o` from an
    # `object` operand is a built-in reference conversion — C# forbids
    # user-defined conversions from/to object, so Roslyn binds no method
    dep = """namespace Lib;

public class Box
{
    public static explicit operator Box(int v)
    {
        return null;
    }
    public void Ping()
    {
    }
}
"""
    caller = """using Lib;

namespace App;

public class Caller
{
    public void Go(object o)
    {
        ((Box)o).Ping();
    }
}
"""
    edges = _edges(spark, [("src/Lib/Box.cs", dep),
                           ("src/App/Caller.cs", caller)])
    src = "r1:App.Caller.Go(object)"
    assert (src, "src__INVOKES", "r1:Lib.Box.Ping()") in edges
    # the reference-type cast binds no conversion method -> no extra edge,
    # even though `explicit operator Box(int)` exists on the target type
    assert not any("operator" in d for s, _r, d in edges if s == src)


def test_ternary_receiver_same_typed_operands_bind(spark):
    caller = """using Lib;

namespace App;

public class Caller
{
    private readonly Dep _x;
    private readonly Dep _y;
    public void Go(bool f)
    {
        (f ? _x : _y).Ping();
    }
}
"""
    edges = _edges(spark, [("src/Lib/Dep.cs", DEP),
                           ("src/App/Caller.cs", caller)])
    assert ("r1:App.Caller.Go(bool)", "src__INVOKES",
            "r1:Lib.Dep.Ping()") in edges


def test_ternary_receiver_mixed_types_drops(spark):
    other = """namespace Lib;

public class Other
{
    public void Ping()
    {
    }
}
"""
    caller = """using Lib;

namespace App;

public class Caller
{
    private readonly Dep _x;
    private readonly Other _y;
    public void Go(bool f)
    {
        (f ? _x : _y).Ping();
    }
}
"""
    edges = _edges(spark, [("src/Lib/Dep.cs", DEP),
                           ("src/Lib/Other.cs", other),
                           ("src/App/Caller.cs", caller)])
    # differing operand types: no best common type in the lexer subset ->
    # the receiver stays untyped -> Ping dangles (Roslyn would need a
    # common base; the subset's no-edge outcome matches an unconvertible
    # conditional, which is a compile error -> IErrorTypeSymbol -> no edge)
    src = "r1:App.Caller.Go(bool)"
    assert not any(d.endswith("Ping()") for s, _r, d in edges if s == src)


def test_out_var_local_types_from_out_parameter(spark):
    caller = """using Lib;

namespace App;

public class Caller
{
    public bool TryMake(out Dep made)
    {
        made = null;
        return true;
    }
    public bool Fork(out Dep a)
    {
        a = null;
        return true;
    }
    public bool Fork(out int a)
    {
        a = 0;
        return true;
    }
    public void Scout()
    {
        if (TryMake(out var d))
        {
            d.Ping();
        }
        Fork(out var mixed);
        mixed.Ping();
    }
}
"""
    edges = _edges(spark, [("src/Lib/Dep.cs", DEP),
                           ("src/App/Caller.cs", caller)])
    src = "r1:App.Caller.Scout()"
    # the call INSIDE the if-condition binds (the control-flow keyword must
    # not swallow it), and d takes the out parameter's declared type
    assert (src, "src__INVOKES", "r1:App.Caller.TryMake(out Dep)") in edges
    assert (src, "src__INVOKES", "r1:Lib.Dep.Ping()") in edges
    # Fork's out-var overloads DISAGREE on the out token: Roslyn cannot
    # infer `out var` against two candidates either (CS0121 ambiguity), so
    # Fork emits no edge and `mixed` stays untyped -> mixed.Ping() dangles.
    # Exactly ONE Ping edge total (the typed d.Ping()).
    assert sum(1 for s, _r, d in edges
               if s == src and d.endswith("Ping()")) == 1
    assert not any("Fork" in d for s, _r, d in edges if s == src)


def test_keyword_expression_receivers_drop(spark):
    caller = """namespace App;

public class Caller
{
    public void Go(object o)
    {
        new string('x', 3).Trim();
        ((string)o).Trim();
    }
}
"""
    edges = _edges(spark, [("src/App/Caller.cs", caller)])
    # metadata receivers: member keys dangle -> no edges
    src = "r1:App.Caller.Go(object)"
    assert not any(d.endswith("Trim()") for s, _r, d in edges if s == src)

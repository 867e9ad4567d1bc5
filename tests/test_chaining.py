"""Chained-call and extension-method INVOKES resolution.

Reference semantics (MemberDependencyExtractor.cs:77-182): Roslyn binds
``a.B().C()`` through B's RETURN type, and binds receiver-typed extension
calls (``w.Boost(5)``) to the static method symbol when the receiver type
declares no applicable instance member. The replica reproduces both at link
time: a retsig dictionary carries member return tokens; an extsig
dictionary carries ``this``-parameter targets.
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


TARGET = """namespace Lib;

public class Target
{
    public void Ping()
    {
    }
}
"""

MAKER = """using Lib;

namespace Mid;

public class Maker
{
    public Target Make()
    {
        return null;
    }
    public Maker Self()
    {
        return this;
    }
    public void Run()
    {
    }
}
"""


def test_cross_type_chain_binds_through_return_type(spark):
    caller = """using Lib;
using Mid;

namespace App;

public class Caller
{
    private readonly Maker _dep;
    public void Go()
    {
        _dep.Make().Ping();
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Target.cs", TARGET),
        ("src/Mid/Maker.cs", MAKER),
        ("src/App/Caller.cs", caller),
    ])
    src = "r1:App.Caller.Go()"
    # head call binds normally; the chained call binds through Make()'s
    # return type Target
    assert (src, "src__INVOKES", "r1:Mid.Maker.Make()") in edges
    assert (src, "src__INVOKES", "r1:Lib.Target.Ping()") in edges


def test_own_type_fluent_chain(spark):
    edges = _edges(spark, [("src/Mid/Maker.cs", MAKER.replace(
        "    public void Run()\n    {\n    }",
        "    public void Run()\n    {\n    }\n"
        "    public void Flow()\n    {\n        Self().Run();\n    }"))])
    src = "r1:Mid.Maker.Flow()"
    assert (src, "src__INVOKES", "r1:Mid.Maker.Self()") in edges
    assert (src, "src__INVOKES", "r1:Mid.Maker.Run()") in edges


def test_chain_through_bcl_return_drops(spark):
    caller = """namespace App;

public class Caller
{
    public string Name()
    {
        return null;
    }
    public void Go()
    {
        Name().Trim();
    }
}
"""
    edges = _edges(spark, [("src/App/Caller.cs", caller)])
    src = "r1:App.Caller.Go()"
    assert (src, "src__INVOKES", "r1:App.Caller.Name()") in edges
    # string.Trim() is a metadata member -> dangling key -> no edge
    assert not any(d.endswith("Trim()") for s, _r, d in edges if s == src)


def test_chain_head_overload_ambiguity_drops(spark):
    files = [("src/Lib/Target.cs", TARGET), ("src/App/Amb.cs", """using Lib;

namespace App;

public class Amb
{
    public Target Fork(int a)
    {
        return null;
    }
    public Target Fork(string b)
    {
        return null;
    }
    public void Go()
    {
        Fork(Count + 1).Ping();
    }
    public int Count { get; set; }
}
""")]
    edges = _edges(spark, files)
    # Fork(Count + 1): the argument is unclassifiable -> the same-arity overload
    # tie is a Roslyn ambiguity error -> neither the head nor the chained
    # edge lands
    src = "r1:App.Amb.Go()"
    assert not any(d.endswith("Ping()") for s, _r, d in edges if s == src)


def test_extension_method_binds_to_static_member(spark):
    files = [("src/Lib/Widget.cs", """namespace Lib;

public class Widget
{
    public void Run()
    {
    }
}
"""), ("src/Lib/Ext.cs", """namespace Lib;

public static class Ext
{
    public static int Boost(this Widget w, int amount)
    {
        return amount;
    }
}
"""), ("src/App/User.cs", """using Lib;

namespace App;

public class User
{
    private readonly Widget _w;
    public void Go()
    {
        _w.Boost(5);
    }
}
""")]
    edges = _edges(spark, files)
    src = "r1:App.User.Go()"
    # CSharpErrorMessageFormat drops the `this` modifier from the display
    assert (src, "src__INVOKES", "r1:Lib.Ext.Boost(Widget, int)") in edges


def test_instance_member_wins_over_extension(spark):
    files = [("src/Lib/Widget.cs", """namespace Lib;

public class Widget
{
    public int Boost(int amount)
    {
        return amount;
    }
}
"""), ("src/Lib/Ext.cs", """namespace Lib;

public static class Ext
{
    public static int Boost(this Widget w, int amount)
    {
        return amount;
    }
}
"""), ("src/App/User.cs", """using Lib;

namespace App;

public class User
{
    private readonly Widget _w;
    public void Go()
    {
        _w.Boost(5);
    }
}
""")]
    edges = _edges(spark, files)
    src = "r1:App.User.Go()"
    assert (src, "src__INVOKES", "r1:Lib.Widget.Boost(int)") in edges
    assert (src, "src__INVOKES", "r1:Lib.Ext.Boost(Widget, int)") not in edges


BASE_KID = """namespace Lib;

public class Animal
{
    public void Speak()
    {
    }
    public void Shared(int a)
    {
    }
}

public class Dog : Animal
{
    public void Fetch()
    {
        Speak();
    }
    public void Shared(int a)
    {
    }
}
"""


def test_inherited_member_binds_to_base_declaration(spark):
    """Roslyn binds a call on a derived type to the BASE's declaring member
    symbol; the member dictionary pre-expands base members at depth rank."""
    edges = _edges(spark, [("src/Lib/Animals.cs", BASE_KID), ("src/App/U.cs", """using Lib;

namespace App;

public class U
{
    private readonly Dog _d;
    public void Go()
    {
        _d.Speak();
        _d.Shared(1);
    }
}
""")])
    src = "r1:App.U.Go()"
    # inherited method -> base declaring symbol
    assert (src, "src__INVOKES", "r1:Lib.Animal.Speak()") in edges
    # hiding: the derived re-declaration wins over the base one
    assert (src, "src__INVOKES", "r1:Lib.Dog.Shared(int)") in edges
    assert (src, "src__INVOKES", "r1:Lib.Animal.Shared(int)") not in edges
    # own-type call inside the derived class also binds to the base
    assert ("r1:Lib.Dog.Fetch()", "src__INVOKES", "r1:Lib.Animal.Speak()") in edges


def test_two_level_inheritance(spark):
    files = [("src/Lib/Chain.cs", """namespace Lib;

public class A
{
    public void Root()
    {
    }
}

public class B : A
{
}

public class C : B
{
    public void Leaf()
    {
        Root();
    }
}
""")]
    edges = _edges(spark, files)
    assert ("r1:Lib.C.Leaf()", "src__INVOKES", "r1:Lib.A.Root()") in edges


def test_base_access_and_interface_receiver(spark):
    files = [("src/Lib/Port.cs", """namespace Lib;

public class Holder
{
    public void Run()
    {
    }
}

public class Sub : Holder
{
    public void Go()
    {
        base.Run();
    }
}

public interface IPort
{
    void Start();
}

public class App
{
    private readonly IPort _port;
    public void Use()
    {
        _port.Start();
    }
}
""")]
    edges = _edges(spark, files)
    # base-access binds in the base type's scope
    assert ("r1:Lib.Sub.Go()", "src__INVOKES", "r1:Lib.Holder.Run()") in edges
    # interface-typed receiver binds to the interface member symbol
    assert ("r1:Lib.App.Use()", "src__INVOKES", "r1:Lib.IPort.Start()") in edges


def test_local_bound_from_call_return(spark):
    """`var x = a.B(); x.C()` — the local carries B's pending return, so C
    binds exactly like the literal chain a.B().C() (reference: Roslyn
    type-tracks the local through the semantic model,
    MemberDependencyExtractor.cs:77-182)."""
    caller = """using Lib;
using Mid;

namespace App;

public class Caller
{
    private readonly Maker _dep;
    public void Go()
    {
        var x = _dep.Make();
        x.Ping();
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Target.cs", TARGET),
        ("src/Mid/Maker.cs", MAKER),
        ("src/App/Caller.cs", caller),
    ])
    src = "r1:App.Caller.Go()"
    assert (src, "src__INVOKES", "r1:Mid.Maker.Make()") in edges
    assert (src, "src__INVOKES", "r1:Lib.Target.Ping()") in edges


def test_two_level_chain_with_type_transition(spark):
    """a.B().C().D() binds D through TWO retsig hops, including a hop that
    CHANGES the receiver type (own -> Maker -> Target)."""
    target = TARGET.replace(
        "    public void Ping()",
        "    public Target Again()\n    {\n        return this;\n    }\n"
        "    public void Ping()")
    caller = """using Lib;
using Mid;

namespace App;

public class Caller
{
    public Maker Grab()
    {
        return null;
    }
    public void Deep()
    {
        Grab().Make().Ping();
    }
    public void Local()
    {
        var m = Grab();
        m.Make().Ping();
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Target.cs", target),
        ("src/Mid/Maker.cs", MAKER),
        ("src/App/Caller.cs", caller),
    ])
    deep = "r1:App.Caller.Deep()"
    assert (deep, "src__INVOKES", "r1:App.Caller.Grab()") in edges
    assert (deep, "src__INVOKES", "r1:Mid.Maker.Make()") in edges
    assert (deep, "src__INVOKES", "r1:Lib.Target.Ping()") in edges
    # var-tracked equivalent: m carries Grab()'s return; m.Make().Ping()
    # is a two-hop chain for Ping
    local = "r1:App.Caller.Local()"
    assert (local, "src__INVOKES", "r1:App.Caller.Grab()") in edges
    assert (local, "src__INVOKES", "r1:Mid.Maker.Make()") in edges
    assert (local, "src__INVOKES", "r1:Lib.Target.Ping()") in edges


def test_three_hop_chain_binds_and_five_call_chain_drops(spark):
    """a.B().C().D().E() (three hops) binds end-to-end; a FIVE-call chain's
    final member is beyond the lexer subset (_RE_CHAIN4 caps at four calls)
    and drops — a dangling outcome, not a wrong edge (the reference binds
    arbitrary depth through Roslyn, MemberDependencyExtractor.cs:77-182)."""
    target = TARGET.replace(
        "    public void Ping()",
        "    public Target Again()\n    {\n        return this;\n    }\n"
        "    public void Ping()")
    caller = """using Lib;
using Mid;

namespace App;

public class Caller
{
    private readonly Maker _dep;
    public void Go()
    {
        _dep.Make().Again().Again().Ping();
    }
    public void Far()
    {
        _dep.Make().Again().Again().Again().Ping();
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Target.cs", target),
        ("src/Mid/Maker.cs", MAKER),
        ("src/App/Caller.cs", caller),
    ])
    src = "r1:App.Caller.Go()"
    # all four members of the 3-hop chain bind
    assert (src, "src__INVOKES", "r1:Mid.Maker.Make()") in edges
    assert (src, "src__INVOKES", "r1:Lib.Target.Again()") in edges
    assert (src, "src__INVOKES", "r1:Lib.Target.Ping()") in edges
    # the 5-call chain binds its first four members; the fifth drops
    far = "r1:App.Caller.Far()"
    assert (far, "src__INVOKES", "r1:Mid.Maker.Make()") in edges
    assert (far, "src__INVOKES", "r1:Lib.Target.Again()") in edges
    assert not any(d.endswith("Ping()") for s, _r, d in edges if s == far)


def test_static_type_receiver_chain(spark):
    """Factory-style static chain `Maker.Create().Ping()`: the receiver is
    a TYPE token (no instance in scope) — the head binds as a static
    member, the chained call through its return type."""
    maker = MAKER.replace(
        "    public Target Make()",
        "    public static Target Create()\n    {\n        return null;\n    }\n"
        "    public Target Make()")
    caller = """using Lib;
using Mid;

namespace App;

public class Caller
{
    public void Go()
    {
        Maker.Create().Ping();
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Target.cs", TARGET),
        ("src/Mid/Maker.cs", maker),
        ("src/App/Caller.cs", caller),
    ])
    src = "r1:App.Caller.Go()"
    assert (src, "src__INVOKES", "r1:Mid.Maker.Create()") in edges
    assert (src, "src__INVOKES", "r1:Lib.Target.Ping()") in edges


def test_null_conditional_binds_like_plain_access(spark):
    """`x?.M()` binds the same member symbol as x.M() (Roslyn conditional
    access changes control flow, not binding)."""
    caller = """using Lib;
using Mid;

namespace App;

public class Caller
{
    private readonly Maker _dep;
    public void Go()
    {
        _dep?.Run();
        _dep?.Make().Ping();
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Target.cs", TARGET),
        ("src/Mid/Maker.cs", MAKER),
        ("src/App/Caller.cs", caller),
    ])
    src = "r1:App.Caller.Go()"
    assert (src, "src__INVOKES", "r1:Mid.Maker.Run()") in edges
    assert (src, "src__INVOKES", "r1:Mid.Maker.Make()") in edges
    assert (src, "src__INVOKES", "r1:Lib.Target.Ping()") in edges


def test_inherited_member_wins_over_using_static(spark):
    """C# simple-name lookup stops at the first enclosing-type-or-BASE scope
    that declares the name — using-static imports are only consulted after
    (even when the base overload set has no applicable member, that's an
    error, not a fallback). A bare Snap(4) in a derived class whose BASE
    declares Snap must bind the base member, not the imported static."""
    util = """namespace Glob;

public static class Util
{
    public static int Snap(int v)
    {
        return v;
    }
}
"""
    base = """namespace Lib;

public class BaseThing
{
    public void Snap(int v)
    {
    }
}
"""
    kid = """using Lib;
using static Glob.Util;

namespace App;

public class Kid : BaseThing
{
    public void Trim()
    {
        Snap(4);
    }
}
"""
    edges = _edges(spark, [
        ("src/Glob/Util.cs", util),
        ("src/Lib/BaseThing.cs", base),
        ("src/App/Kid.cs", kid),
    ])
    src = "r1:App.Kid.Trim()"
    assert (src, "src__INVOKES", "r1:Lib.BaseThing.Snap(int)") in edges
    assert (src, "src__INVOKES", "r1:Glob.Util.Snap(int)") not in edges


def test_var_tracked_four_call_chain(spark):
    """var x = a.B().C().D(); x.E() — the local carries THREE pending hops;
    the later call consumes them plus its own lookup (four link rounds)."""
    target = TARGET.replace(
        "    public void Ping()",
        "    public Target Again()\n    {\n        return this;\n    }\n"
        "    public void Ping()")
    caller = """using Lib;
using Mid;

namespace App;

public class Caller
{
    private readonly Maker _dep;
    public void Go()
    {
        var x = _dep.Make().Again().Again();
        x.Ping();
    }
}
"""
    edges = _edges(spark, [
        ("src/Lib/Target.cs", target),
        ("src/Mid/Maker.cs", MAKER),
        ("src/App/Caller.cs", caller),
    ])
    src = "r1:App.Caller.Go()"
    assert (src, "src__INVOKES", "r1:Mid.Maker.Make()") in edges
    assert (src, "src__INVOKES", "r1:Lib.Target.Again()") in edges
    assert (src, "src__INVOKES", "r1:Lib.Target.Ping()") in edges

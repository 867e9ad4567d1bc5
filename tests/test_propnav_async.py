"""Property-hop receivers, awaited calls, and indexer element typing.

Reference semantics (MemberDependencyExtractor.cs:77-182): Roslyn binds
``a.Prop.M()`` through the property symbol's declared type, ``await
x.GetAsync()`` to the awaiter's GetResult type (``Task<T>`` -> ``T``), and
``reg[k].M()`` through the ``this[..]`` indexer's type. The replica routes
property hops through a link-time propsig dictionary (the property-typed
analogue of retsig), marks awaited hops with ``@`` so the link step unwraps
``Task<T>``/``ValueTask<T>``, and types indexer accesses lexer-side from
the collection token's value/element argument.
"""

import pytest

from codegraph import pipeline
from codegraph.extract.csharp import _index_elem_type

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


GEAR = """namespace App;

public class Gear
{
    public int Size { get; set; }
    public Motor Core { get; set; }
    public void Spin()
    {
    }
    public int Weigh(int n)
    {
        return n;
    }
}
"""

MOTOR = """namespace App;

public class Motor
{
    public void Start()
    {
    }
    public int Rev(int n)
    {
        return n;
    }
}
"""

RIG = """using System.Collections.Generic;
using System.Threading.Tasks;

namespace App;

public class Rig
{
    private readonly Gear _gear;
    public Gear Main { get; set; }
    private readonly Dictionary<string, Gear> _reg;
    private readonly List<Gear> _rack;
    public void Nav()
    {
        _gear.Core.Start();
    }
    public void NavThis()
    {
        this.Main.Spin();
    }
    public void NavTwo()
    {
        _gear.Core.Rev(2);
        this.Main.Core.Start();
    }
    public void NavLocal()
    {
        var c = _gear.Core;
        c.Rev(5);
    }
    public async Task<Gear> FetchAsync()
    {
        return _gear;
    }
    public async Task PullAsync()
    {
        var got = await FetchAsync();
        got.Spin();
    }
    public async Task PullValueAsync()
    {
        var fast = await QuickAsync();
        fast.Weigh(3);
    }
    public ValueTask<Gear> QuickAsync()
    {
        return default;
    }
    public async Task BadAwait()
    {
        var none = await Weightless();
        none.Spin();
    }
    public int Weightless()
    {
        return 1;
    }
    public void Index()
    {
        _reg["a"].Spin();
        var v = _reg["b"];
        v.Weigh(7);
        _rack[0].Spin();
    }
}
"""


def test_index_elem_type_tokens():
    assert _index_elem_type("Dictionary<string, Gear>") == "Gear"
    assert _index_elem_type("Dictionary<string, List<Gear>>") == "List<Gear>"
    assert _index_elem_type("List<Gear>") == "Gear"
    assert _index_elem_type("Gear[]") == "Gear"
    assert _index_elem_type("Gear") is None
    assert _index_elem_type(None) is None


def _rig_edges(spark):
    return _edges(spark, [("src/App/Gear.cs", GEAR),
                          ("src/App/Motor.cs", MOTOR),
                          ("src/App/Rig.cs", RIG)])


def test_property_hop_cross_type(spark):
    edges = _rig_edges(spark)
    assert ("r1:App.Rig.Nav()", "src__INVOKES",
            "r1:App.Motor.Start()") in edges


def test_property_hop_this_receiver(spark):
    edges = _rig_edges(spark)
    assert ("r1:App.Rig.NavThis()", "src__INVOKES",
            "r1:App.Gear.Spin()") in edges


def test_two_property_hops(spark):
    edges = _rig_edges(spark)
    assert ("r1:App.Rig.NavTwo()", "src__INVOKES",
            "r1:App.Motor.Rev(int)") in edges
    assert ("r1:App.Rig.NavTwo()", "src__INVOKES",
            "r1:App.Motor.Start()") in edges


def test_property_read_local_tracking(spark):
    edges = _rig_edges(spark)
    assert ("r1:App.Rig.NavLocal()", "src__INVOKES",
            "r1:App.Motor.Rev(int)") in edges


def test_await_task_unwrap(spark):
    edges = _rig_edges(spark)
    # var got = await FetchAsync(); got.Spin() -> Task<Gear> unwraps to Gear
    assert ("r1:App.Rig.PullAsync()", "src__INVOKES",
            "r1:App.Gear.Spin()") in edges
    # the head call itself still gets its own edge
    assert ("r1:App.Rig.PullAsync()", "src__INVOKES",
            "r1:App.Rig.FetchAsync()") in edges


def test_await_valuetask_unwrap(spark):
    edges = _rig_edges(spark)
    assert ("r1:App.Rig.PullValueAsync()", "src__INVOKES",
            "r1:App.Gear.Weigh(int)") in edges


def test_await_non_task_drops(spark):
    edges = _rig_edges(spark)
    # awaiting an int-returning method is a compile error -> no binding
    assert ("r1:App.Rig.BadAwait()", "src__INVOKES",
            "r1:App.Gear.Spin()") not in edges


def test_indexer_dictionary_value_type(spark):
    edges = _rig_edges(spark)
    assert ("r1:App.Rig.Index()", "src__INVOKES",
            "r1:App.Gear.Spin()") in edges


def test_indexer_local_read(spark):
    edges = _rig_edges(spark)
    assert ("r1:App.Rig.Index()", "src__INVOKES",
            "r1:App.Gear.Weigh(int)") in edges


def test_unknown_property_hop_drops(spark):
    src = """namespace App;

public class Loose
{
    private readonly Gear _gear;
    public void Go()
    {
        _gear.Phantom.Spin();
    }
}
"""
    edges = _edges(spark, [("src/App/Gear.cs", GEAR),
                           ("src/App/Motor.cs", MOTOR),
                           ("src/App/Loose.cs", src)])
    # Gear declares no Phantom property -> the propsig lookup finds nothing
    # -> the chain drops (IErrorTypeSymbol -> no edge)
    assert not any(s == "r1:App.Loose.Go()" and d.endswith("Spin()")
                   for s, _r, d in edges)

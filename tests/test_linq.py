"""LINQ / iteration element typing + explicit call-site type arguments.

Reference semantics (MemberDependencyExtractor.cs:77-104): Roslyn binds
``foreach`` iteration variables through ``GetEnumerator().Current``, query
range variables and untyped lambda parameters through the
``IEnumerable<T>`` delegate parameter, and explicit-type-argument calls
(``Echo<string>(..)``) to the generic DEFINITION symbol. The replica's
lexer reproduces the element-type inference for generic-collection
sources (``List<T>``/``IEnumerable<T>``/``T[]``) and strips call-site
type-argument lists before the bare-name + arity link lookup.
"""

import pytest

from codegraph import pipeline
from codegraph.extract.csharp import _elem_type

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


PART = """namespace App;

public class Part
{
    public int Size { get; set; }
    public void Ping()
    {
    }
    public string Label(int n)
    {
        return null;
    }
    public int Area()
    {
        return 1;
    }
}
"""

STORE = """using System.Collections.Generic;
using System.Linq;

namespace App;

public class Store
{
    private readonly List<Part> _parts;
    public void Scan()
    {
        foreach (var p in _parts)
        {
            p.Ping();
        }
    }
    public void ScanTyped()
    {
        foreach (Part q in _parts)
        {
            q.Label(3);
        }
    }
    public void Query()
    {
        var names = _parts.Select(x => x.Label(2));
        var picked = from w in _parts where w.Size > 0 select w.Area();
    }
    public void Explicit()
    {
        Mark<string>("a");
    }
    public T Mark<T>(T v)
    {
        return v;
    }
}
"""


def test_elem_type_tokens():
    assert _elem_type("List<Part>") == "Part"
    assert _elem_type("IEnumerable<Part>") == "Part"
    assert _elem_type("Part[]") == "Part"
    assert _elem_type("List<Part>?") == "Part"
    assert _elem_type("Part") is None
    assert _elem_type("Dictionary<string>") is None
    assert _elem_type(None) is None


def test_foreach_var_takes_element_type(spark):
    edges = _edges(spark, [("src/App/Part.cs", PART),
                           ("src/App/Store.cs", STORE)])
    assert ("r1:App.Store.Scan()", "src__INVOKES",
            "r1:App.Part.Ping()") in edges


def test_foreach_explicit_type_kept(spark):
    edges = _edges(spark, [("src/App/Part.cs", PART),
                           ("src/App/Store.cs", STORE)])
    assert ("r1:App.Store.ScanTyped()", "src__INVOKES",
            "r1:App.Part.Label(int)") in edges


def test_untyped_lambda_param_types_from_element(spark):
    edges = _edges(spark, [("src/App/Part.cs", PART),
                           ("src/App/Store.cs", STORE)])
    assert ("r1:App.Store.Query()", "src__INVOKES",
            "r1:App.Part.Label(int)") in edges


def test_query_range_variable_types_from_element(spark):
    edges = _edges(spark, [("src/App/Part.cs", PART),
                           ("src/App/Store.cs", STORE)])
    assert ("r1:App.Store.Query()", "src__INVOKES",
            "r1:App.Part.Area()") in edges


def test_linq_operator_itself_dangles(spark):
    edges = _edges(spark, [("src/App/Part.cs", PART),
                           ("src/App/Store.cs", STORE)])
    # Select binds a System.Linq metadata symbol -> key dangles -> no edge
    assert not any(d.endswith("Select(…)") or ".Select(" in d
                   for _s, _r, d in edges)


def test_explicit_type_arguments_emit_no_edge(spark):
    """Roslyn binds the CONSTRUCTED method (Mark<string>(string)) and the
    reference keys the edge off its display without .OriginalDefinition
    (SymbolMapper.BuildStableSymbolKey), which matches no declared node ->
    the edge drops at MergeRelationships. The bind still succeeds for
    lookup (suppressing the extension fallback), but no edge lands."""
    edges = _edges(spark, [("src/App/Part.cs", PART),
                           ("src/App/Store.cs", STORE)])
    src = "r1:App.Store.Explicit()"
    assert not any(s == src and "Mark" in d for s, _r, d in edges)


def test_unknown_collection_source_drops(spark):
    src = """namespace App;

public class Loose
{
    public void Go()
    {
        foreach (var z in mystery)
        {
            z.Ping();
        }
        var other = solo.Select(k => k.Ping());
    }
    public void Ping()
    {
    }
}
"""
    edges = _edges(spark, [("src/App/Loose.cs", src)])
    # neither `mystery` nor `solo` resolves to a typed collection -> the
    # body calls dangle (Roslyn: IErrorTypeSymbol -> no symbol -> no edge)
    assert not any(s == "r1:App.Loose.Go()" for s, _r, _d in edges)

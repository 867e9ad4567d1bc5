"""Text/markup extractors vs reference handler semantics (H4-H14)."""

from codegraph.extract.dispatch import _extract_one
from codegraph.schema import ACC_ORDER

PRIV = ACC_ORDER["Private"]
NA = ACC_ORDER["NotApplicable"]


def _syms(rows):
    return [r for r in rows if r["rec"] == "symbol"]


def _rels(rows):
    return {(r["src_key"], r["rel_type"], r["dst_key"])
            for r in rows if r["rec"] == "rel"}


# --- CSS (CssHandler.cs:34-77) ----------------------------------------------

CSS = """.btn {
  color: red;
}
#main .nav > li:hover { top: 0; }
@media (max-width: 600px) { .x { color: blue; } }
"""


def test_css_selectors_including_regex_junk():
    rows = _extract_one("r", "web/a.css", CSS, PRIV, {}, {})
    names = [s["name"] for s in _syms(rows)]
    assert ".btn" in names
    # the reference's naive regex captures the previous declaration block
    assert any("color: red;" in n for n in names)
    # @-rule selectors skipped
    assert not any(n.startswith("@") for n in names)
    # kind/klass/key format
    s = next(s for s in _syms(rows) if s["name"] == ".btn")
    assert s["kind"] == "CssSelector" and s["klass"] == "selector"
    assert s["key"] == "web/a.css:CssSelector:.btn:1"
    assert s["namespace"] == "web"


def test_css_guard_a_disables_at_notapplicable():
    # DocumentHandlerBase.cs:56-57: min==NotApplicable -> no extraction
    rows = _extract_one("r", "web/a.css", CSS, NA, {}, {})
    assert _syms(rows) == []


# --- HTML (HtmlHandler.cs) ----------------------------------------------------

HTML = """<html>
<body id="page">
<script type="module" src="js/main.js"></script>
</body></html>
"""


def test_html():
    rows = _extract_one("r", "web/p.html", HTML, PRIV, {}, {})
    syms = {s["key"]: s for s in _syms(rows)}
    assert "web/p.html:ScriptRef:js/main.js:3" in syms
    assert syms["web/p.html:ScriptRef:js/main.js:3"]["kind"] == "HtmlScriptReference"
    assert "web/p.html:ElementId:page:2" in syms
    rels = _rels(rows)
    assert ("web/p.html", "src__DEPENDS_ON", "web/p.html:ScriptRef:js/main.js:3") in rels
    assert ("web/p.html", "src__CONTAINS", "web/p.html:ElementId:page:2") in rels


# --- JSON (JsonHandler.cs:46-95) ----------------------------------------------

JSON = '{ "name": "demo", "settings": { "debug": true }, "items": [ { "id": 1 } ] }'


def test_json_paths():
    rows = _extract_one("r", "config/c.json", JSON, PRIV, {}, {})
    fqns = [s["fqn"] for s in _syms(rows)]
    assert fqns == ["name", "settings", "settings.debug", "items", "items[0].id"]
    s = _syms(rows)[0]
    assert s["start_line"] == -1 and s["kind"] == "JsonProperty"


def test_json_invalid_is_skipped():
    rows = _extract_one("r", "config/bad.json", "{ nope", PRIV, {}, {})
    assert _syms(rows) == []


# --- Razor (RazorHandler.cs:92-136) --------------------------------------------

RAZOR = """@namespace MyApp.Pages
@using MyApp.Core
@inject Helper Service
@model WidgetModel
@inherits BasePage
<h1>x</h1>
"""


def test_razor_directives():
    rows = _extract_one("r", "src/Pages/P.razor", RAZOR, PRIV, {}, {})
    syms = {s["kind"]: s for s in _syms(rows)}
    assert set(syms) == {"UsingDirective", "InjectDirective", "ModelDirective",
                         "InheritsDirective", "NamedType", "Property"}
    assert syms["InjectDirective"]["name"] == "Helper Service"  # whole rest of line
    # directives are keyed off the PROMOTED file key — the generated type's
    # FQN (RazorHandler.cs:61-72; ExtractDirectives runs after promotion)
    assert syms["UsingDirective"]["key"] == "MyApp.Pages.P:UsingDirective:MyApp.Core"
    fm = [r for r in rows if r["rec"] == "filemeta"][0]
    assert fm["file_namespace"] == "MyApp.Pages"
    assert fm["file_key_override"] == "MyApp.Pages.P"


def test_razor_generated_tree():
    """RazorHandler.cs:36-78: the generated component class + its [Inject]
    properties, with the @inject type emitted as a resolvable type mention."""
    rows = _extract_one("r", "src/Pages/P.razor", RAZOR, PRIV, {}, {})
    syms = {s["key"]: s for s in _syms(rows)}
    assert "r:MyApp.Pages.P" in syms
    assert syms["r:MyApp.Pages.P"]["kind"] == "NamedType"
    assert syms["r:MyApp.Pages.P"]["language"] == "csharp"
    assert "r:MyApp.Pages.P.Service" in syms
    assert syms["r:MyApp.Pages.P.Service"]["accessibility"] == "Private"
    rels = _rels(rows)
    assert ("r:MyApp.Pages.P", "src__CONTAINS", "r:MyApp.Pages.P.Service") in rels
    m = [x for x in rows if x["rec"] == "mention" and x["m_kind"] == "type"]
    assert m and m[0]["m_name"] == "Helper"
    assert m[0]["m_usings"].split("\x1f") == ["MyApp.Pages", "MyApp.Core"]


# --- XML (XmlHandler.cs) --------------------------------------------------------

XML = """<config>
  <server host="localhost" port="8080">
    <timeout>30</timeout>
  </server>
</config>
"""


def test_xml_elements_and_attributes():
    rows = _extract_one("r", "config/app.xml", XML, PRIV, {}, {})
    syms = {s["key"]: s for s in _syms(rows)}
    assert "config/app.xml:XmlElement:config:1" in syms
    assert "config/app.xml:XmlElement:server:2" in syms
    assert "config/app.xml:XmlElement:timeout:3" in syms
    a = syms["config/app.xml:XmlAttribute:server.host:2"]
    assert a["fqn"] == "server.host=localhost" and a["documentation"] == "localhost"
    rels = _rels(rows)
    # HAS_ATTRIBUTE is un-prefixed (passed verbatim to apoc)
    assert ("config/app.xml:XmlElement:server:2", "HAS_ATTRIBUTE",
            "config/app.xml:XmlAttribute:server.host:2") in rels
    # file->element CONTAINS candidates exist (they drop at linking)
    assert ("config/app.xml", "src__CONTAINS", "config/app.xml:XmlElement:config:1") in rels


# --- XAML (XamlHandler.cs) -------------------------------------------------------

XAML = """<ContentPage x:Class="MyApp.Views.MainPage"
             xmlns="http://schemas.microsoft.com/dotnet/2021/maui"
             xmlns:x="http://schemas.microsoft.com/winfx/2009/xaml">
  <Button x:Name="SaveButton" Text="Save"
          Clicked="OnSaveClicked" Command="{Binding Path=SaveCommand}" />
  <Label Text="{Binding Title}" />
</ContentPage>
"""


def test_xaml():
    rows = _extract_one("r", "src/Views/Main.xaml", XAML, PRIV, {}, {})
    syms = {s["key"]: s for s in _syms(rows)}
    rels = _rels(rows)
    # element key embeds x:Name before the line
    assert "src/Views/Main.xaml:Button:SaveButton:4" in syms
    b = syms["src/Views/Main.xaml:Button:SaveButton:4"]
    assert b["name"] == "SaveButton" and b["fqn"] == "Button:SaveButton"
    # namespace from x:Class prefix
    assert b["namespace"] == "MyApp.Views"
    # Command (exact) is an event handler; 'Clicked' is NOT ('Clicked' does
    # not end with 'Click' — IsEventHandler, XamlHandler.cs:230-239)
    assert "src/Views/Main.xaml:EventHandler:{Binding Path=SaveCommand}" in syms
    assert ("src/Views/Main.xaml:Button:SaveButton:4", "BINDS_TO",
            "src/Views/Main.xaml:EventHandler:{Binding Path=SaveCommand}") in rels
    clicked = syms["src/Views/Main.xaml:XamlAttribute:Button.Clicked:4"]
    assert clicked["kind"] == "XamlAttribute"
    # binding path lands in comments (ExtractBindingPath)
    label_text = syms["src/Views/Main.xaml:XamlAttribute:Label.Text:6"]
    assert label_text["comments"] == "Title"
    # x:-namespace attrs + xmlns skipped from SETS_PROPERTY
    assert not any("x:Name" in k or "Class" in k for k in syms
                   if "XamlAttribute" in k)


# --- csproj / package.json / pubspec -------------------------------------------

CSPROJ = """<Project Sdk="Microsoft.NET.Sdk">
  <PropertyGroup>
    <TargetFramework>net10.0</TargetFramework>
  </PropertyGroup>
  <ItemGroup>
    <PackageReference Include="Newtonsoft.Json" Version="13.0.3" />
    <ProjectReference Include="../Core/Core.csproj" />
  </ItemGroup>
</Project>
"""

PKG_META = {
    ("nuspec", "Newtonsoft.Json"): (None, "https://github.com/JamesNK/Newtonsoft.Json", "https://www.newtonsoft.com/json"),
    ("npm", "react"): ("https://react.dev", "git+ssh://git@github.com/facebook/react.git", None),
}


def test_csproj():
    rows = _extract_one("r", "src/App/App.csproj", CSPROJ, PRIV, {}, PKG_META)
    syms = {s["key"]: s for s in _syms(rows)}
    assert syms["src/App/App.csproj:Property:TargetFramework:3"]["fqn"] == \
        "TargetFramework: net10.0"
    assert syms["pkg:Newtonsoft.Json"]["fqn"] == "Newtonsoft.Json (13.0.3)"
    assert syms["pkg:Newtonsoft.Json"]["version"] == "13.0.3"
    urls = [(r["url_dep_key"], r["url_key"]) for r in rows if r["rec"] == "url"]
    # nuspec URLs are NOT normalized (CsprojHandler.cs:146-151)
    assert ("pkg:Newtonsoft.Json", "url:https://www.newtonsoft.com/json") in urls
    assert ("pkg:Newtonsoft.Json", "url:https://github.com/JamesNK/Newtonsoft.Json") in urls
    rels = _rels(rows)
    assert ("src/App/App.csproj", "src__HAS_PROPERTY",
            "src/App/App.csproj:Property:TargetFramework:3") in rels
    assert ("src/App/App.csproj", "src__DEPENDS_ON", "pkg:Newtonsoft.Json") in rels


PKGJSON = """{
  "name": "webapp",
  "dependencies": { "react": "^18.0.0" },
  "devDependencies": { "typescript": "^5.4.0" }
}
"""


def test_packagejson():
    rows = _extract_one("r", "web/package.json", PKGJSON, PRIV, {}, PKG_META)
    syms = {s["key"]: s for s in _syms(rows)}
    assert syms["pkg:react"]["version"] == "^18.0.0"
    assert "pkg:typescript" in syms
    urls = [(r["url_dep_key"], r["url_key"]) for r in rows if r["rec"] == "url"]
    # npm repository URL IS normalized
    assert ("pkg:react", "url:https://github.com/facebook/react") in urls
    assert ("pkg:react", "url:https://react.dev") in urls


PUBSPEC = """name: demo_app
environment:
  sdk: ">=3.0.0 <4.0.0"
dependencies:
  http: ^1.2.0
dev_dependencies:
  test: ^1.25.0
"""


def test_pubspec():
    rows = _extract_one("r", "app/pubspec.yaml", PUBSPEC, PRIV, {}, {})
    syms = {s["key"]: s for s in _syms(rows)}
    assert set(syms) == {"pkg:http", "pkg:test"}  # sdk constraint NOT emitted
    assert syms["pkg:http"]["fqn"] == "http (^1.2.0)"


# --- TS/JS/Dart -----------------------------------------------------------------

TS = """import { Helper } from './helper';

/** doc */
export abstract class Widget extends Base implements IWidget {
  private count: number = 0;
  constructor() { super(); }
  get title(): string { return 't'; }
  render(): void { this.draw(); const h = new Helper(); }
}
export interface IWidget {
}
export enum Mode { A, B }
export type Alias = string;
export function main(): void { run(); }
export const handler = () => main();
"""


def test_typescript_symbols_and_edge_mismatch():
    ts_projects = {("r", "web"): "webapp"}
    rows = _extract_one("r", "web/src/widget.ts", TS, PRIV, ts_projects, {})
    syms = {s["key"]: s for s in _syms(rows)}
    assert "web/src/widget.ts:TypeScriptAbstractClass:Widget:4" in syms
    w = syms["web/src/widget.ts:TypeScriptAbstractClass:Widget:4"]
    assert w["fqn"] == "@webapp/src/widget.ts::Widget"
    assert w["documentation"] == "doc"
    assert "web/src/widget.ts:TypeScriptField:count:5" in syms
    assert syms["web/src/widget.ts:TypeScriptField:count:5"]["accessibility"] == "Private"
    assert "web/src/widget.ts:TypeScriptConstructor:constructor:6" in syms
    assert "web/src/widget.ts:TypeScriptProperty:title:7" in syms
    assert "web/src/widget.ts:TypeScriptMethod:render:8" in syms
    assert "web/src/widget.ts:TypeScriptInterface:IWidget:10" in syms
    assert "web/src/widget.ts:TypeScriptEnum:Mode:12" in syms
    assert "web/src/widget.ts:TypeScriptTypeAlias:Alias:13" in syms
    assert "web/src/widget.ts:TypeScriptFunction:main:14" in syms
    assert "web/src/widget.ts:TypeScriptFunction:handler:15" in syms
    # every relationship uses lowercase kind tokens -> never matches a symbol
    rel_keys = set()
    for r in rows:
        if r["rec"] == "rel":
            rel_keys.add(r["src_key"])
            rel_keys.add(r["dst_key"])
    assert rel_keys.isdisjoint(set(syms))


def test_typescript_skipped_without_package_json():
    rows = _extract_one("r", "tools/orphan.ts", TS, PRIV, {}, {})
    assert _syms(rows) == []  # TypeScriptHandlerBase.cs:36-41


DART = """import 'helper.dart';

/// doc
class Widget extends Base with Mixy implements IWidget {
  final Helper helper;
  Widget(this.helper);
  int get count => 0;
  void render() { helper.fix(); }
}
mixin Mixy {}
enum Mode { a, b }
typedef Handler = void Function();
void _main() { render(); }
final int level = 1;
"""


def test_dart():
    rows = _extract_one("r", "app/lib/w.dart", DART, PRIV, {}, {})
    syms = {s["key"]: s for s in _syms(rows)}
    assert "app/lib/w.dart:DartClass:Widget:4" in syms
    assert "app/lib/w.dart:DartField:helper:5" in syms
    assert "app/lib/w.dart:DartConstructor:Widget:6" in syms
    assert "app/lib/w.dart:DartProperty:count:7" in syms
    assert "app/lib/w.dart:DartMethod:render:8" in syms
    assert "app/lib/w.dart:DartMixin:Mixy:10" in syms
    assert "app/lib/w.dart:DartEnum:Mode:11" in syms
    assert "app/lib/w.dart:DartTypeAlias:Handler:12" in syms
    assert "app/lib/w.dart:DartFunction:_main:13" in syms
    assert syms["app/lib/w.dart:DartFunction:_main:13"]["accessibility"] == "Private"
    assert "app/lib/w.dart:DartField:level:14" in syms
    # edges use lowercase kind tokens -> drop at linking
    rel_keys = set()
    for r in rows:
        if r["rec"] == "rel":
            rel_keys.update((r["src_key"], r["dst_key"]))
    assert rel_keys.isdisjoint(set(syms))


def test_xaml_generated_tree():
    """XamlHandler.cs:62-87: the x:Class partial class, InitializeComponent,
    and one private field per x:Name — file key NOT promoted."""
    rows = _extract_one("r", "src/Views/Main.xaml", XAML, PRIV, {}, {})
    syms = {s["key"]: s for s in _syms(rows)}
    assert "r:MyApp.Views.MainPage" in syms
    assert syms["r:MyApp.Views.MainPage"]["kind"] == "NamedType"
    assert "r:MyApp.Views.MainPage.InitializeComponent()" in syms
    f = syms["r:MyApp.Views.MainPage.SaveButton"]
    assert f["kind"] == "Field" and f["accessibility"] == "Private"
    rels = _rels(rows)
    assert ("r:MyApp.Views.MainPage", "src__CONTAINS",
            "r:MyApp.Views.MainPage.SaveButton") in rels
    # field type (Button) dangles like a BCL dep
    assert ("r:MyApp.Views.MainPage", "src__DEPENDS_ON", "r:Button") in rels
    fm = [r for r in rows if r["rec"] == "filemeta"][0]
    assert fm["file_key_override"] is None


DART_ANN = """class Vault {
  final int size;
  Vault(this.size);
  Vault operator +(Vault other) => this;
  @protected
  void lock() { run(); }
  @visibleForTesting
  void peek() { run(); }
  void _hide() { run(); }
}
extension type Grams(int v) {}
"""


def test_dart_annotations():
    """ast_visitor.dart:39-48: annotation metadata outranks the _-prefix;
    operator declarations get fqn 'operator <op>'; extension types emit."""
    rows = _extract_one("r", "dart_app/lib/vault.dart", DART_ANN, PRIV, {}, {})
    by_name = {s["name"]: s for s in _syms(rows)}
    assert by_name["lock"]["accessibility"] == "Protected"
    assert by_name["peek"]["accessibility"] == "Internal"
    assert by_name["_hide"]["accessibility"] == "Private"
    assert by_name["+"]["kind"] == "DartOperator"
    assert by_name["+"]["fqn"] == "operator +"
    assert by_name["Grams"]["kind"] == "DartExtensionType"


def test_ts_tsconfig_file_selection():
    """analyzer.ts:16-33: tsconfig include/exclude defines the TS program;
    files outside it are never analyzed (symbols suppressed, file kept)."""
    from codegraph.extract.tsdart import _norm_cfg_entry

    assert _norm_cfg_entry("./src/**/*") == "src"
    assert _norm_cfg_entry("src/**") == "src"
    assert _norm_cfg_entry("src/") == "src"
    assert _norm_cfg_entry("src/main.ts") == "src/main.ts"

    ts_projects = {("r", "web"): "webapp"}
    cfg = {("r", "web"): ('["src"]', '["src/legacy"]')}
    kept = _extract_one("r", "web/src/widget.ts", TS, PRIV, ts_projects, {}, cfg)
    assert _syms(kept)
    outside = _extract_one("r", "web/scripts/tool.ts", TS, PRIV, ts_projects, {}, cfg)
    assert not _syms(outside)
    excluded = _extract_one("r", "web/src/legacy/old.ts", TS, PRIV, ts_projects, {}, cfg)
    assert not _syms(excluded)
    # no include key -> everything under the root minus exclude
    cfg2 = {("r", "web"): (None, '["scripts"]')}
    assert _syms(_extract_one("r", "web/src/widget.ts", TS, PRIV, ts_projects, {}, cfg2))
    assert not _syms(_extract_one("r", "web/scripts/t.ts", TS, PRIV, ts_projects, {}, cfg2))
    # no tsconfig at all -> unchanged
    assert _syms(_extract_one("r", "web/src/widget.ts", TS, PRIV, ts_projects, {}, {}))


DART_SETCALL = """class Counter {
  int _n = 0;
  int get n => _n;
  set n(int v) { _n = v; }
  void bump() {
    final cb = makeHandler();
    cb();
    log.write(toString());
    Counter();
    refresh();
    if (true) {}
  }
}
set volume(int v) {}
void main() {
  final go = pick();
  go();
  Counter();
  run();
}
"""


def test_dart_setters_and_invocation_kinds():
    """Setters are DartProperty on both levels (ast_visitor.dart:230-241,
    263-275); invocation candidates carry the resolved-AST node's toKind
    (ast_visitor.dart:431-485): MethodInvocation -> 'method' (with or
    without target), local-function-variable call -> 'function'
    (FunctionExpressionInvocation), uppercase bare -> 'constructor'
    (InstanceCreationExpression); control keywords never emit."""
    rows = _extract_one("r", "dart_app/lib/c.dart", DART_SETCALL, PRIV, {}, {})
    syms = {s["key"]: s for s in _syms(rows)}
    assert "dart_app/lib/c.dart:DartProperty:n:4" in syms  # class setter
    assert "dart_app/lib/c.dart:DartProperty:volume:14" in syms  # top-level
    rels = _rels(rows)
    meth = "dart_app/lib/c.dart:method:bump"
    assert (meth, "src__INVOKES", "dart_app/lib/c.dart:function:cb") in rels
    assert (meth, "src__INVOKES", "dart_app/lib/c.dart:method:write") in rels
    assert (meth, "src__INVOKES", "dart_app/lib/c.dart:constructor:Counter") in rels
    assert (meth, "src__INVOKES", "dart_app/lib/c.dart:method:refresh") in rels
    assert (meth, "src__INVOKES", "dart_app/lib/c.dart:method:makeHandler") in rels
    fn = "dart_app/lib/c.dart:function:main"
    assert (fn, "src__INVOKES", "dart_app/lib/c.dart:function:go") in rels
    assert (fn, "src__INVOKES", "dart_app/lib/c.dart:constructor:Counter") in rels
    assert (fn, "src__INVOKES", "dart_app/lib/c.dart:method:run") in rels
    # control keywords never become callees
    assert not any(d.endswith(":if") for _, _, d in rels)
    # setter CONTAINS rides the class with toKind 'property'
    assert ("dart_app/lib/c.dart:class:Counter:1", "src__CONTAINS",
            "dart_app/lib/c.dart:property:n:4") in rels


TS_EXTRAS = """import React from 'react';

/** docs */
@Injectable()
export class Store {
  private items: number = 0;
  get size(): string { return 's'; }
  set size(v: string) { this.items = 1; }
}
export namespace Logging {
}
"""


def test_ts_setter_namespace_decorator():
    """visitor.ts: set accessors are their own TypeScriptProperty symbols
    (:225-227), namespace declarations emit (:195-213), decorators become
    HAS_TAG candidates (:153-158) that drop at linking like all TS edges."""
    ts_projects = {("r", "web"): "webapp"}
    rows = _extract_one("r", "web/src/store.ts", TS_EXTRAS, PRIV, ts_projects, {})
    syms = {s["key"]: s for s in _syms(rows)}
    assert "web/src/store.ts:TypeScriptProperty:size:7" in syms   # getter
    assert "web/src/store.ts:TypeScriptProperty:size:8" in syms   # setter
    assert "web/src/store.ts:TypeScriptNamespace:Logging:10" in syms
    # doc survives across the decorator line
    assert syms["web/src/store.ts:TypeScriptClass:Store:5"]["documentation"] == "docs"
    rels = _rels(rows)
    assert ("web/src/store.ts:class:Store:5", "src__HAS_TAG",
            "web/src/store.ts:decorator:Injectable") in rels


def test_dart_named_constructors():
    """ast_visitor.dart:319-345: named ctor display '$class.$name',
    accessibility from the SHORT name."""
    src = """class Vault {
  final int size;
  Vault(this.size);
  Vault.wrap(this.size);
  Vault._raw(this.size);
}
"""
    rows = _extract_one("r", "dart_app/lib/v.dart", src, PRIV, {}, {})
    by_name = {s["name"]: s for s in _syms(rows)}
    assert by_name["Vault.wrap"]["kind"] == "DartConstructor"
    assert by_name["Vault.wrap"]["accessibility"] == "Public"
    assert by_name["Vault._raw"]["accessibility"] == "Private"
    rels = _rels(rows)
    assert ("dart_app/lib/v.dart:class:Vault:1", "src__CONTAINS",
            "dart_app/lib/v.dart:constructor:Vault.wrap:4") in rels


def test_dart_mixin_extension_members():
    """Mixins/extensions set _currentClass in the reference, so members
    inside them emit like class members (ast_visitor.dart:113-177)."""
    src = """mixin Lockable {
  void lock() { engage(); }
}
extension Longer on String {
  int twice() => 2;
}
"""
    rows = _extract_one("r", "dart_app/lib/m.dart", src, PRIV, {}, {})
    syms = {s["key"]: s for s in _syms(rows)}
    assert "dart_app/lib/m.dart:DartMixin:Lockable:1" in syms
    assert "dart_app/lib/m.dart:DartMethod:lock:2" in syms
    assert "dart_app/lib/m.dart:DartExtension:Longer:4" in syms
    assert "dart_app/lib/m.dart:DartMethod:twice:5" in syms
    rels = _rels(rows)
    assert ("dart_app/lib/m.dart:mixin:Lockable:1", "src__CONTAINS",
            "dart_app/lib/m.dart:method:lock:2") in rels
    assert ("dart_app/lib/m.dart:extension:Longer:4", "src__CONTAINS",
            "dart_app/lib/m.dart:method:twice:5") in rels


def test_ts_path_alias_resolution():
    """compilerOptions.paths aliases resolve like relative file imports
    (the analyzer's program honors them, analyzer.ts:11-52); non-matching
    bare specifiers stay package imports."""
    from codegraph.extract.tsdart import _resolve_path_alias

    paths = '{"@web/*": ["src/*"], "util": ["lib/util"]}'
    assert _resolve_path_alias("@web/base", paths, ".") == "src/base"
    assert _resolve_path_alias("@web/a/b", paths, None) == "src/a/b"
    assert _resolve_path_alias("util", paths, "app") == "app/lib/util"
    assert _resolve_path_alias("react", paths, ".") is None
    assert _resolve_path_alias("@web/base", None, ".") is None

    src = ("import { Base } from '@web/base';\n"
           "import React from 'react';\n"
           "export class W {\n}\n")
    ts_projects = {("r", "web"): "webapp"}
    cfg = {("r", "web"): (None, None, '{"@web/*": ["src/*"]}', ".")}
    rows = _extract_one("r", "web/src/w.ts", src, PRIV, ts_projects, {}, cfg)
    rels = {(r["src_key"], r["dst_key"]) for r in rows if r["rec"] == "rel"}
    # aliased import resolves to a FILE target under the project root
    assert ("web/src/w.ts:file:src/w.ts:1",
            "web/src/base.ts:file:src/base.ts") in rels
    # bare package import unchanged
    assert any(d == "web/src/w.ts:package:react" for _s, d in rels)
    # without paths, the alias falls back to a package import named '@web'
    cfg2 = {("r", "web"): (None, None)}
    rows2 = _extract_one("r", "web/src/w.ts", src, PRIV, ts_projects, {}, cfg2)
    rels2 = {r["dst_key"] for r in rows2 if r["rec"] == "rel"}
    assert "web/src/w.ts:package:@web" in rels2

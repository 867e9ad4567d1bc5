"""Pure key/namespace/tag/url builders — the identity system of the graph.

Each function replicates a documented reference behavior (cited). They are
plain Python so they can run inside Arrow-batched pandas UDFs, in the
deterministic fixture generator, and in property tests.
"""

from __future__ import annotations

import posixpath

# ---------------------------------------------------------------------------
# repo key: lowercase basename of the input (OptionsBinder.cs:90-99)
# ---------------------------------------------------------------------------


def repo_key(name: str | None) -> str | None:
    return name.lower() if name is not None else None


# ---------------------------------------------------------------------------
# file key + path-inferred namespace (FileService.cs:24-55)
# ---------------------------------------------------------------------------

_ROSLYN_EXTS = (".cs", ".razor", ".xaml")


def infer_file_metadata(relative_path: str) -> tuple[str, str]:
    """Returns (fileKey, namespace). fileKey == the '/'-normalized relative
    path; namespace is the directory path, dotted + src/source-stripped for
    Roslyn extensions (FileService.cs:24-55)."""
    path = relative_path.replace("\\", "/")
    directory = posixpath.dirname(path)
    ns = directory
    ext = posixpath.splitext(path)[1].lower()
    if ext in _ROSLYN_EXTS:
        roslyn_ns = ns.replace("/", ".")
        low = roslyn_ns.lower()
        if low.startswith("src."):
            roslyn_ns = roslyn_ns[4:]
        elif low == "src":
            roslyn_ns = ""
        elif low.startswith("source."):
            roslyn_ns = roslyn_ns[7:]
        elif low == "source":
            roslyn_ns = ""
        return path, roslyn_ns
    return path, ns


def dir_namespace(relative_path: str) -> str:
    """Text handlers' fileNamespace = dirname with forward slashes
    (e.g. CssHandler.cs:28)."""
    return posixpath.dirname(relative_path.replace("\\", "/"))


# ---------------------------------------------------------------------------
# text symbol keys (TextSymbolMapper.cs:6-9)
# ---------------------------------------------------------------------------


def text_key(file_key: str, kind_token: str, name: str, start_line: int | None = None) -> str:
    if start_line is not None:
        return f"{file_key}:{kind_token}:{name}:{start_line}"
    return f"{file_key}:{kind_token}:{name}"


def xaml_element_key(file_key: str, element: str, x_name_or_key: str | None, line: int) -> str:
    """XAML element key embeds the x:Name/x:Key suffix BEFORE the line
    (XamlHandler.cs:96-115)."""
    suffix = f":{x_name_or_key}" if x_name_or_key else ""
    return f"{file_key}:{element}{suffix}:{line}"


def pkg_key(name: str) -> str:
    """Shared, repo-unprefixed package key (PackageDependencyHandlerBase.cs:28)."""
    return f"pkg:{name}"


def url_key(url: str) -> str:
    """URL node key (CsprojHandler.cs:146-151, PackageJsonHandler.cs:145,159)."""
    return f"url:{url}"


def csharp_key(repo: str | None, display: str) -> str:
    """Roslyn symbol key: {repoKey}:{CSharpErrorMessageFormat display}
    (SymbolMapper.cs:43-47). repo may be None (--no-key) -> 'None:' is NOT
    emitted by the reference; C# interpolation of null yields ''."""
    return f"{repo or ''}:{display}" if repo is None else f"{repo}:{display}"


# ---------------------------------------------------------------------------
# multi-TFM project name handling (P10): "App(net8.0)" -> "App"
# (SolutionFileDiscoveryService.cs:135-139, DependencyIngestor.cs:94-98)
# ---------------------------------------------------------------------------

import re as _re

_TFM_RE = _re.compile(r"^(.*)\((.+)\)$")


def strip_tfm(project_name: str) -> str:
    m = _TFM_RE.match(project_name)
    return m.group(1) if m else project_name


# ---------------------------------------------------------------------------
# line number from char offset (DocumentHandlerBase.cs:53-54)
# ---------------------------------------------------------------------------


def line_number(content: str, index: int) -> int:
    return content.count("\n", 0, index) + 1


# ---------------------------------------------------------------------------
# 8000-char truncation for indexed strings (StringExtensions.cs:9-12)
# ---------------------------------------------------------------------------


def truncate(value: str | None, limit: int = 8000) -> str | None:
    if value is None:
        return None
    return value if len(value) <= limit else value[:limit]


# ---------------------------------------------------------------------------
# namespace -> tags (NamespaceTagParser.cs:17,29-98)
# ---------------------------------------------------------------------------

TAG_WHITELIST = frozenset({"DotNet", "iOS"})


def _segment_to_tag(segment: str) -> str:
    if not segment:
        return ""
    if segment in TAG_WHITELIST:
        return segment
    words: list[str] = []
    current: list[str] = []
    n = len(segment)
    for i, c in enumerate(segment):
        if c.isupper():
            if current and current[-1].islower():
                words.append("".join(current))
                current = []
            elif (
                current
                and current[-1].isupper()
                and i + 1 < n
                and segment[i + 1].islower()
            ):
                words.append("".join(current))
                current = []
            current.append(c)
        else:
            current.append(c)
    if current:
        words.append("".join(current))
    return "_".join(words)


def parse_tags(namespace: str | None) -> list[str]:
    """'MyApp.HTTPClient.Core' -> ['My_App', 'HTTP_Client', 'Core'];
    whitelist segments verbatim; empty segments dropped."""
    if namespace is None or not namespace.strip():
        return []
    tags = []
    for segment in namespace.split("."):
        if not segment:
            continue
        tag = _segment_to_tag(segment)
        if tag:
            tags.append(tag)
    return tags


# ---------------------------------------------------------------------------
# npm repository-URL normalization (PackageJsonHandler.cs:18-50,203-228)
# first matching prefix wins; then credential strip; then trailing .git strip
# ---------------------------------------------------------------------------

_REPO_PREFIX_RULES = (
    ("github:", "https://github.com/"),
    ("gitlab:", "https://gitlab.com/"),
    ("bitbucket:", "https://bitbucket.org/"),
    ("git+ssh://git@github.com/", "https://github.com/"),
    ("git+ssh://git@gitlab.com/", "https://gitlab.com/"),
    ("git+ssh://git@bitbucket.org/", "https://bitbucket.org/"),
    ("git+ssh://git@dev.azure.com/", "https://dev.azure.com/"),
    ("ssh://git@github.com/", "https://github.com/"),
    ("ssh://git@gitlab.com/", "https://gitlab.com/"),
    ("ssh://git@bitbucket.org/", "https://bitbucket.org/"),
    ("ssh://git@dev.azure.com/", "https://dev.azure.com/"),
    ("git+https://", "https://"),
    ("git+http://", "http://"),
    ("git://", "https://"),
)


def normalize_repository_url(url: str | None) -> str | None:
    if not url:
        return None
    url = url.strip()
    low = url.lower()
    for frm, to in _REPO_PREFIX_RULES:
        if low.startswith(frm):
            url = to + url[len(frm):]
            break
    # strip embedded credentials: userinfo between scheme:// and host
    scheme_idx = url.find("://")
    if scheme_idx > 0:
        rest = url[scheme_idx + 3:]
        slash = rest.find("/")
        authority = rest if slash < 0 else rest[:slash]
        at = authority.rfind("@")
        if at >= 0:
            userinfo = authority[:at]
            url = url.replace(f"{userinfo}@", "", 1)
    if url.lower().endswith(".git"):
        url = url[:-4]
    return url

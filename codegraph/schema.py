"""Fixed schemas + graph vocabulary.

Mirrors the reference's graph schema (GraphSchema.cs:5-31) and record models
(Graph/Models/Symbol.cs:3-20, Relationship.cs:3-6, FileMetaData.cs:5-15,
VersionControl/CommitMetadata.cs:3-12). Uniqueness constraints of
Cypher/Schema.cypher:2-24 become dedup-by-key (last-write-wins) before write.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- node labels (GraphSchema.cs:5-15) --------------------------------------
L_PROJECT = "src__Project"
L_FILE = "src__File"
L_SYMBOL = "src__Symbol"
L_AUTHOR = "src__Author"
L_COMMIT = "src__Commit"
L_DEPENDENCY = "src__Dependency"
L_TAG = "src__Tag"
L_URL = "src__Url"

# --- relationship types (GraphSchema.cs:17-31) -------------------------------
R_HAS_FILE = "src__HAS_FILE"
R_DECLARES = "src__DECLARES"
R_DEPENDS_ON = "src__DEPENDS_ON"
R_CONTAINS = "src__CONTAINS"
R_PART_OF_PROJECT = "src__PART_OF_PROJECT"
R_COMMITTED = "src__COMMITTED"
R_MODIFIED_FILE = "src__MODIFIED_FILE"
R_AUTHORED = "src__AUTHORED"
R_HAS_TAG = "src__HAS_TAG"
R_HAS_URL = "src__HAS_URL"
R_INVOKES = "src__INVOKES"
R_HAS_PROPERTY = "src__HAS_PROPERTY"
# un-prefixed rel types passed verbatim into apoc.merge.relationship
# (XamlHandler.cs:157,169; XmlHandler via XmlAttributeExtractor "HAS_ATTRIBUTE")
R_BINDS_TO = "BINDS_TO"
R_SETS_PROPERTY = "SETS_PROPERTY"
R_HAS_ATTRIBUTE = "HAS_ATTRIBUTE"

# --- accessibility ordering (Roslyn Microsoft.CodeAnalysis.Accessibility) ----
ACC_NOT_APPLICABLE = 0
ACC_PRIVATE = 1
ACC_PROTECTED_AND_INTERNAL = 2
ACC_PROTECTED = 3
ACC_INTERNAL = 4
ACC_PROTECTED_OR_INTERNAL = 5
ACC_PUBLIC = 6
ACC_ORDER = {
    "NotApplicable": ACC_NOT_APPLICABLE,
    "Private": ACC_PRIVATE,
    "ProtectedAndInternal": ACC_PROTECTED_AND_INTERNAL,
    "Protected": ACC_PROTECTED,
    "Internal": ACC_INTERNAL,
    "ProtectedOrInternal": ACC_PROTECTED_OR_INTERNAL,
    "Public": ACC_PUBLIC,
}

# indexed-string truncation (Extensions/StringExtensions.cs:9-12,
# applied Neo4jFlushService.cs:16,76-77)
MAX_INDEXED_STRING = 8000

# default include extensions (Program.cs:46) + filename handlers
# (config.json PackageJsonHandler/PubspecYamlHandler)
INCLUDE_EXTENSIONS = (
    ".cs", ".razor", ".xaml", ".js", ".ts", ".tsx",
    ".html", ".xml", ".json", ".css", ".csproj", ".dart",
)
FILENAME_HANDLERS = ("package.json", "pubspec.yaml")
# excluded directory segments (SolutionFileDiscoveryService.cs:141-149)
EXCLUDED_DIRS = ("bin", "obj", ".git", ".idea", "node_modules", ".dart_tool", "build")

# handler config: lang -> (language, technology)  (Configuration/config.json)
HANDLER_LANG_TECH = {
    "csharp": ("csharp", "dotnet"),
    "razor": ("csharp", "dotnet"),
    "typescript": ("typescript", "node"),
    "javascript": ("javascript", "node"),
    "css": ("css", "web"),
    "html": ("html", "web"),
    "xaml": ("xaml", "dotnet"),
    "xml": ("xml", "xml"),
    "json": ("json", "json"),
    "dart": ("dart", "flutter"),
    "csproj": ("xml", "dotnet"),
    "packagejson": ("json", "node"),
    "pubspec": ("yaml", "flutter"),
}

# --- input table (BASELINE.json input_hint) ----------------------------------
SOURCE_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("commit", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
    T.StructField("content", T.StringType(), True),
])

# --- commit log side table (GitService.cs:17-94 scan shape) ------------------
COMMIT_LOG_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), False),
    T.StructField("hash", T.StringType(), False),
    T.StructField("author_name", T.StringType(), True),   # "Name <email>" (%an <%ae>)
    T.StructField("author_email", T.StringType(), True),
    T.StructField("date", T.TimestampType(), True),
    T.StructField("message", T.StringType(), True),
    T.StructField("refs", T.ArrayType(T.StringType()), True),  # "tag: v1.2.3" entries
    T.StructField("changed_files", T.ArrayType(T.StructType([
        T.StructField("path", T.StringType(), True),
        T.StructField("is_deleted", T.BooleanType(), True),
    ])), True),
])

# --- unified extraction output (one mapInPandas pass, §2.3) ------------------
# rec: 'symbol' | 'rel' | 'mention' | 'url' | 'filemeta'
EXTRACT_SCHEMA = T.StructType([
    T.StructField("rec", T.StringType(), False),
    T.StructField("repo", T.StringType(), False),
    T.StructField("path", T.StringType(), False),
    T.StructField("lang", T.StringType(), True),
    # symbol fields (Symbol.cs:3-20)
    T.StructField("key", T.StringType(), True),
    T.StructField("name", T.StringType(), True),
    T.StructField("kind", T.StringType(), True),
    T.StructField("klass", T.StringType(), True),
    T.StructField("fqn", T.StringType(), True),
    T.StructField("accessibility", T.StringType(), True),
    T.StructField("namespace", T.StringType(), True),
    T.StructField("start_line", T.IntegerType(), True),
    T.StructField("end_line", T.IntegerType(), True),
    T.StructField("documentation", T.StringType(), True),
    T.StructField("comments", T.StringType(), True),
    T.StructField("version", T.StringType(), True),
    T.StructField("language", T.StringType(), True),
    T.StructField("technology", T.StringType(), True),
    # rel fields (Relationship.cs:3-6)
    T.StructField("src_key", T.StringType(), True),
    T.StructField("dst_key", T.StringType(), True),
    T.StructField("rel_type", T.StringType(), True),
    # mention fields (unresolved C# references; resolved in link.py)
    T.StructField("m_kind", T.StringType(), True),     # 'type' | 'invoke'
    T.StructField("m_from_key", T.StringType(), True),
    T.StructField("m_rel", T.StringType(), True),
    T.StructField("m_name", T.StringType(), True),     # type/method name as written
    T.StructField("m_recv", T.StringType(), True),     # receiver type display ('' = unknown)
    T.StructField("m_usings", T.StringType(), True),   # '\x1f'-joined candidate namespaces
    T.StructField("m_nargs", T.IntegerType(), True),   # invocation arg count
    T.StructField("m_args", T.StringType(), True),     # '\x1f'-joined classified arg type tokens
    # chain/sig payload: for 'chain_*' mentions the '\x1f'-joined head call
    # (name, nargs, arg tokens...); for 'retsig' the return token; for
    # 'extsig' the full member display
    T.StructField("m_head", T.StringType(), True),
    # url fields (UrlNode.cs:3-8)
    T.StructField("url_dep_key", T.StringType(), True),
    T.StructField("url_key", T.StringType(), True),
    T.StructField("url_name", T.StringType(), True),
    # filemeta override (SolutionProcessor.cs:290-291); razor promotes the
    # file key to the generated type's FQN (RazorHandler.cs:36-78)
    T.StructField("file_namespace", T.StringType(), True),
    T.StructField("file_key_override", T.StringType(), True),
])

# --- output tables (FIXTURES.md §4) ------------------------------------------
NODES_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), True),
    T.StructField("key", T.StringType(), False),
    T.StructField("label", T.StringType(), False),
    T.StructField("name", T.StringType(), True),
    T.StructField("kind", T.StringType(), True),
    T.StructField("klass", T.StringType(), True),
    T.StructField("fqn", T.StringType(), True),
    T.StructField("accessibility", T.StringType(), True),
    T.StructField("file_key", T.StringType(), True),
    T.StructField("file_path", T.StringType(), True),
    T.StructField("namespace", T.StringType(), True),
    T.StructField("start_line", T.IntegerType(), True),
    T.StructField("end_line", T.IntegerType(), True),
    T.StructField("documentation", T.StringType(), True),
    T.StructField("comments", T.StringType(), True),
    T.StructField("version", T.StringType(), True),
    T.StructField("language", T.StringType(), True),
    T.StructField("technology", T.StringType(), True),
    T.StructField("deleted", T.BooleanType(), True),
    T.StructField("date", T.TimestampType(), True),   # Commit.date (Schema.cypher:42)
    T.StructField("bucket", T.IntegerType(), True),
])

EDGES_SCHEMA = T.StructType([
    T.StructField("repo", T.StringType(), True),
    T.StructField("src_key", T.StringType(), False),
    T.StructField("rel_type", T.StringType(), False),
    T.StructField("dst_key", T.StringType(), False),
    T.StructField("first_commit", T.TimestampType(), True),   # AUTHORED only
    T.StructField("last_commit", T.TimestampType(), True),
    T.StructField("commit_count", T.LongType(), True),
    T.StructField("bucket", T.IntegerType(), True),
])

N_BUCKETS = 64  # repo-hash buckets for node/edge table partitioning

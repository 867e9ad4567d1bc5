"""codegraph — a from-scratch PySpark-native knowledge-graph construction
pipeline replicating the triple-emission semantics of ChaseFlorell/CodeToNeo4j
(reference read-only at /root/reference; cited by file:line in docstrings).

Architecture (Spark-first, NOT a port):

    source_files (repo, path, commit, lang, content)
        │  discovery filter (S3/F1/F2)  — Catalyst predicate pushdown
        ▼
    extraction  — ONE vectorized mapInPandas stage dispatching per-lang
                  lexers (H1..H14), emitting symbol / edge / mention /
                  url / filemeta records as Arrow batches
        ▼
    entity linking — mention resolution against a broadcast FQN
                  dictionary + dangling-edge drop joins (J1/F9)
        ▼
    canonicalization — last-write-wins key dedup (§1.4.2) +
                  connected components for alias unification
        ▼
    materialize — nodes/edges/files parquet bucketed by repo hash,
                  checkpoint ledger, per-partition lineage metrics
"""

__version__ = "0.1.0"

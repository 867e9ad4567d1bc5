"""Vectorized per-file extraction stage.

One ``mapInPandas`` pass over the source table dispatches per-lang lexers
(the reference's 13 IDocumentHandlers, SolutionProcessor.HandlerLookup:333-379)
and emits a unified record stream (symbols / rels / mentions / urls /
filemeta) as Arrow batches — never per-row Python UDFs.
"""

from codegraph.extract.dispatch import extract_records, handler_for_path  # noqa: F401

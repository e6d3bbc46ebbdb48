"""Python UDTF surface: table functions over the documents corpus.

UDTFs are the ROW-AT-A-TIME Python path — every contract query stays
on JVM-side Catalyst expressions (pinned by the no-BatchEvalPython
plan test), and the native `doc_chunk_windows` HOF formulation is the
production chunker. This module exists because a complete PySpark
engine surface includes the Spark 4 UDTF API: lateral-joinable Python
table functions for logic that genuinely cannot be expressed as
expressions (external parsers, stateful per-row expansion). The demo
chunker is deliberately equivalent to the native operator so tests
can pin the UDTF machinery against a trusted result.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk: string, chunk_idx: int, n_tokens: int")
class ChunkDoc:
    """Split a whitespace-tokenized document into fixed-size token
    windows — one output row per chunk. (Equivalent to the native
    doc_chunk_windows HOF path; exists to exercise the UDTF API.)"""

    def eval(self, text: str, size: int):  # noqa: D102
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), size):
            window = toks[i : i + size]
            yield " ".join(window), i // size, len(window)


def register_udtfs(spark) -> None:
    """Register table functions for SQL use:
    ``SELECT c.* FROM docs, LATERAL chunk_doc(text, 64) c``."""
    spark.udtf.register("chunk_doc", ChunkDoc)

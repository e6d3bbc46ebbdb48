"""Training-data pipeline operators: chunking, packing, incremental dedup.

The ops a pretraining data pipeline runs between "raw corpus" and
"token stream" — none exist in the reference (its surface is one KNN
job, SURVEY.md §2), but they are the reason an engine like this gets
pointed at 100 TB of documents. All pure Catalyst expressions: the
per-document work (chunking, token counts) is embarrassingly parallel,
and the only shuffles are the per-source window in ``pack_greedy``
and the anti-join in ``dedup_incremental`` — both keyed, never global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knn_using_hadoop_spark.functions.hashing import portable_hash64
from knn_using_hadoop_spark.operators.text import tokens


def chunk_windows(
    docs: DataFrame,
    size: int = 50,
    overlap: int = 10,
    *,
    with_key: bool = False,
) -> DataFrame:
    """Split each document into overlapping token windows.

    (doc_id, chunk_id, chunk_text, n_tokens): window ``i`` covers
    tokens ``[i*step, i*step + size)`` with ``step = size - overlap``
    — the standard sliding-window chunking for embedding/RAG indexing.
    The tail window may be shorter; empty documents yield no chunks.
    Per-document arithmetic only — no shuffle at all; the plan is a
    scan + generate, which is what you want when chunking 100 TB.

    ``chunk_id`` is the window POSITION within its document, NOT a
    global key — treating it as one silently merges chunk i of every
    document. ``with_key=True`` (r6 verdict #5) adds a ``chunk_key``
    string column, ``<doc_id>:<chunk_id>`` — globally unique for any
    doc_id type, deterministic, and equi-joinable — so downstream
    per-chunk retrieval (``bm25_topk(id_col="chunk_key")`` →
    ``maxp_doc_topk(chunk_col="chunk_key")``) composes without
    hand-deriving a key. Opt-in and additive only: the registered
    ``doc_chunk_windows`` oracle schema is frozen without it.
    """
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    toks = docs.select("doc_id", tokens("text").alias("t")).filter(
        F.size("t") > 0
    )
    # starts 0, step, 2*step, ... < n (sequence is inclusive and
    # counts DOWN if stop < start, hence the filter above)
    starts = F.sequence(F.lit(0), F.size("t") - 1, F.lit(step))
    out = toks.select(
        "doc_id", "t", F.posexplode(starts).alias("chunk_id", "start")
    ).select(
        "doc_id",
        "chunk_id",
        F.array_join(
            F.slice(F.col("t"), F.col("start") + 1, size), " "
        ).alias("chunk_text"),
        F.least(F.lit(size), F.size("t") - F.col("start"))
        .cast("int")
        .alias("n_tokens"),
    )
    if with_key:
        out = out.withColumn(
            "chunk_key",
            F.concat_ws(
                ":",
                F.col("doc_id").cast("string"),
                F.col("chunk_id").cast("string"),
            ),
        )
    return out


def pack_greedy(docs: DataFrame, capacity: int = 512) -> DataFrame:
    """Assign documents to fixed-capacity token packs, GPT-style.

    Pretraining packing concatenates documents into one token stream
    (per source, in doc_id order) and chops it every ``capacity``
    tokens; a document's pack is the window its first token lands in
    (documents may straddle a boundary, exactly like the real token
    stream does). Returns (source, doc_id, n_tokens, start_offset,
    pack_id).

    The running offset is a window sum PARTITIONED BY source — the
    100 TB-safe shape (a global pack order would serialize; per-source
    streams are how sharded tokenizers consume packs anyway).
    """
    from pyspark.sql import Window

    t = tokens("text")
    base = docs.select(
        "source", "doc_id", F.size(t).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        "source",
        "doc_id",
        "n_tokens",
        (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias(
            "start_offset"
        ),
    ).withColumn(
        "pack_id", F.floor(F.col("start_offset") / capacity).cast("int")
    )


def dedup_incremental(
    corpus: DataFrame, incoming: DataFrame
) -> DataFrame:
    """New documents not already in the corpus (exact-text dedup).

    The daily-ingest shape: hash both sides to the 120-bit content
    key (two 60-bit md5 slices, same contract as ``dedup_exact``) and
    LEFT ANTI join incoming against the corpus — the shuffle carries
    16-byte keys, never document bodies, and at scale the corpus side
    is a pre-bucketed key table so only the small incoming batch
    moves. Returns the surviving incoming rows (doc_id, lang, source).
    """

    def keyed(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "fp64", portable_hash64(F.col("text"))
        ).withColumn("fp64b", portable_hash64(F.col("text"), pos=17))

    seen = keyed(corpus).select("fp64", "fp64b")
    return (
        keyed(incoming)
        .join(seen, ["fp64", "fp64b"], "left_anti")
        .select("doc_id", "lang", "source")
    )


def table_diff(
    s1: DataFrame,
    s2: DataFrame,
    key: str,
    value: str,
) -> DataFrame:
    """Snapshot diff by key: added / removed / changed rows.

    The migration-validation primitive (and the semantic core of CDC
    generation): full outer join on the key, classify each key by
    presence and value equality. One shuffle on the key; output is
    only the differing keys, so it stays small when the snapshots
    mostly agree — exactly the property a 100 TB table comparison
    needs (the identical majority never leaves the join).
    """
    a = s1.select(F.col(key).alias("k"), F.col(value).alias("v1"))
    b = s2.select(F.col(key).alias("k2"), F.col(value).alias("v2"))
    j = a.join(b, a.k == b.k2, "full_outer")
    status = (
        F.when(F.col("k").isNull(), F.lit("added"))
        .when(F.col("k2").isNull(), F.lit("removed"))
        .when(F.col("v1") != F.col("v2"), F.lit("changed"))
    )
    return (
        j.select(
            F.coalesce("k", "k2").alias(key),
            status.alias("status"),
            "v1",
            "v2",
        )
        .filter(F.col("status").isNotNull())
    )

"""North-star extension ops (SURVEY.md §2.11): text analysis, dedup, similarity.

Split from the former monolithic contract.py (round 3); original lines 491-869. Registration order is preserved by contract/__init__.
"""

from __future__ import annotations

from knn_using_hadoop_spark.sources.tables import load_table
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from knn_using_hadoop_spark.contract._base import (_register)
from knn_using_hadoop_spark.contract.knn_core import (load_docs_wide)
from knn_using_hadoop_spark.contract.relational import (queries)

# noqa: E402  (split module: original source follows)
# --------------------------------------------------------------------------
# North-star extension ops (SURVEY.md §2.11): text analysis, dedup,
# similarity search. Shared DuckDB CTEs for tokenized / shingled docs.
# --------------------------------------------------------------------------

from knn_using_hadoop_spark.operators import dedup as _dedup  # noqa: E402
from knn_using_hadoop_spark.operators import similarity as _sim  # noqa: E402
from knn_using_hadoop_spark.operators import text as _text  # noqa: E402

_STOP_SQL = ", ".join(f"'{s}'" for s in _text.STOPWORDS)

_DOC_CTE = """
toks AS (SELECT doc_id, text, lang, string_split(text, ' ') AS t
         FROM documents),
shs AS (SELECT doc_id,
               list_transform(generate_series(1, len(t)-2),
                              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                 AS sh
        FROM toks),
ds AS (SELECT DISTINCT doc_id, shingle FROM
        (SELECT doc_id, unnest(sh) AS shingle FROM shs))
"""

_H32 = "(('0x' || substr(md5({x}), 1, 8))::BIGINT)"
_H64 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


@_register(
    "doc_token_stats",
    f"""WITH {_DOC_CTE}
SELECT doc_id, length(text)::INT AS n_chars, len(t)::INT AS n_tokens,
       len(list_distinct(t))::INT AS n_distinct_tokens,
       list_aggregate(list_transform(t, x -> length(x)), 'sum')::DOUBLE
         / len(t) AS avg_token_len
FROM toks""",
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.token_stats(load_table(spark, "documents", sf_dir))


@_register(
    "doc_quality_score",
    f"""WITH {_DOC_CTE}
SELECT doc_id, len(t)::INT AS n_tokens,
  round(len(list_filter(t, x -> x IN ({_STOP_SQL})))::DOUBLE / len(t), 6)
    AS stop_ratio,
  round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
        ::DOUBLE / length(text), 6) AS punct_ratio,
  round(least(len(t), 100)::DOUBLE / 100.0
        * (1.0 - len(list_filter(t, x -> x IN ({_STOP_SQL})))::DOUBLE
                 / len(t) * 0.5)
        * (1.0 - (length(text)
                  - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                 ::DOUBLE / length(text)), 6) AS quality
FROM toks""",
)
def q_doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.quality_score(load_table(spark, "documents", sf_dir))


def _lang_scores_sql() -> str:
    parts = []
    for lang, markers in _text.LANG_MARKERS.items():
        marks = ", ".join(f"'{m}'" for m in markers)
        parts.append(
            f"len(list_filter(list_distinct(t), x -> x IN ({marks})))"
            f"::INT AS score_{lang}"
        )
    return ", ".join(parts)


def _lang_case_sql() -> str:
    langs = list(_text.LANG_MARKERS)
    whens = []
    for idx, lang in enumerate(langs):
        conds = [f"score_{lang} > 0"]
        for jdx, other in enumerate(langs):
            if jdx < idx:
                conds.append(f"score_{lang} > score_{other}")
            elif jdx > idx:
                conds.append(f"score_{lang} >= score_{other}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


@_register(
    "doc_lang_id",
    f"""WITH {_DOC_CTE},
scored AS (SELECT doc_id, lang, {_lang_scores_sql()} FROM toks)
SELECT doc_id, score_en, score_de, score_fr, score_es,
       {_lang_case_sql()} AS pred_lang, lang,
       ({_lang_case_sql()} = lang)::INT AS is_match
FROM scored""",
)
def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.lang_id(load_table(spark, "documents", sf_dir))


@_register(
    "doc_fingerprint",
    f"""WITH {_DOC_CTE}
SELECT toks.doc_id, {_H64.format(x='text')} AS fp64,
       list_aggregate(list_transform(sh, s -> {_H32.format(x='s')}), 'min')
         AS min_shingle_hash
FROM toks JOIN shs ON toks.doc_id = shs.doc_id""",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _text.doc_fingerprint(load_table(spark, "documents", sf_dir))


@_register(
    "dedup_exact",
    f"""SELECT min(doc_id) AS doc_id, fp64, count(*) AS n_copies
FROM (SELECT doc_id, {_H64.format(x='text')} AS fp64,
             (('0x' || substr(md5(text), 17, 15))::BIGINT) AS fp64b
      FROM documents) h
GROUP BY fp64, fp64b""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.dedup_exact(load_table(spark, "documents", sf_dir))


_MINHASH_SQL = f"""
sigs AS (
  SELECT doc_id, j::INT AS h_idx,
         list_aggregate(
           list_transform(sh, s ->
             ({list(_dedup.MINHASH_A)}[j+1] * {_H32.format(x='s')}
              + {list(_dedup.MINHASH_B)}[j+1]) % 2147483647),
           'min') AS minhash
  FROM shs, generate_series(0, {_dedup.NUM_HASHES - 1}) g(j)
  WHERE len(sh) >= 1)
"""


@_register(
    "dedup_minhash_signatures",
    f"WITH {_DOC_CTE}, {_MINHASH_SQL} "
    "SELECT doc_id, h_idx, minhash FROM sigs",
)
def q_dedup_minhash_signatures(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _dedup.minhash_signatures(
        load_docs_wide(spark, sf_dir)
    )


_JACCARD_TAIL_SQL = """
sz AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM cand c
  JOIN ds x ON x.doc_id = c.doc_a
  JOIN ds y ON y.doc_id = c.doc_b AND y.shingle = x.shingle
  GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b, n_common,
       n_common::DOUBLE / (sa.n + sb.n - n_common) AS jaccard
FROM inter i
JOIN sz sa ON sa.doc_id = i.doc_a
JOIN sz sb ON sb.doc_id = i.doc_b
WHERE n_common::DOUBLE / (sa.n + sb.n - n_common) >= {thr}
"""


_LSH_CAND_SQL = f"""
bands AS (
  SELECT doc_id, h_idx // {_dedup.BAND_ROWS} AS band,
         max(CASE WHEN h_idx % {_dedup.BAND_ROWS} = 0 THEN minhash END)
           AS sig0,
         max(CASE WHEN h_idx % {_dedup.BAND_ROWS} = 1 THEN minhash END)
           AS sig1
  FROM sigs GROUP BY doc_id, h_idx // {_dedup.BAND_ROWS}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig0 = b.sig0 AND a.sig1 = b.sig1
   AND a.doc_id < b.doc_id)
"""


@_register(
    "dedup_minhash_lsh_pairs",
    f"""WITH {_DOC_CTE}, {_MINHASH_SQL}, {_LSH_CAND_SQL},
{_JACCARD_TAIL_SQL.format(thr=0.5)}""",
)
def q_dedup_minhash_lsh_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _dedup.minhash_lsh_pairs(
        load_docs_wide(spark, sf_dir), threshold=0.5
    )


@_register(
    "dedup_minhash_sigonly_pairs",
    f"""WITH {_DOC_CTE}, {_MINHASH_SQL}, {_LSH_CAND_SQL},
agree AS (
  SELECT c.doc_a, c.doc_b,
         sum(CASE WHEN x.minhash = y.minhash THEN 1 ELSE 0 END)::BIGINT
           AS n_agree
  FROM cand c
  JOIN sigs x ON x.doc_id = c.doc_a
  JOIN sigs y ON y.doc_id = c.doc_b AND y.h_idx = x.h_idx
  GROUP BY c.doc_a, c.doc_b)
SELECT doc_a, doc_b, n_agree,
       n_agree::DOUBLE / {_dedup.NUM_HASHES} AS est_jaccard
FROM agree
WHERE n_agree::DOUBLE / {_dedup.NUM_HASHES} >= 0.5""",
)
def q_dedup_minhash_sigonly_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Signature-only near-dup pairs: the fixed-width-shuffle scale
    path (no O(total shingles) verification re-join)."""
    return _dedup.minhash_sig_est_pairs(
        load_docs_wide(spark, sf_dir), threshold=0.5
    )


@_register(
    "dedup_ngram_jaccard_pairs",
    f"""WITH {_DOC_CTE},
freq AS (SELECT shingle, count(*) AS df FROM ds GROUP BY shingle),
gen AS (SELECT ds.doc_id, ds.shingle
        FROM ds JOIN freq USING (shingle) WHERE df <= 50),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM gen a JOIN gen b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
{_JACCARD_TAIL_SQL.format(thr=0.5)}""",
)
def q_dedup_ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _dedup.ngram_jaccard_pairs(
        load_docs_wide(spark, sf_dir),
        threshold=0.5,
        max_shingle_freq=50,
    )


@_register(
    "dedup_simhash",
    f"""WITH tok_h AS (
  SELECT doc_id, {_H32.format(x='tok')} AS h
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents) u),
bs AS (
  SELECT doc_id, j AS bit,
         sum(CASE WHEN (h >> j) % 2 = 1 THEN 1 ELSE -1 END) AS s
  FROM tok_h, generate_series(0, 31) g(j)
  GROUP BY doc_id, j)
SELECT doc_id,
       sum(CASE WHEN s > 0 THEN power(2, bit)::BIGINT ELSE 0 END)::BIGINT
         AS simhash
FROM bs GROUP BY doc_id""",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.simhash(load_docs_wide(spark, sf_dir))


_EMB_DIM = 64
_SIM_QUERY_MOD = 50

_SIM_SUMS_SQL = f"""
q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id % {_SIM_QUERY_MOD} = 0),
pe AS (SELECT e.vec_id, q.query_id, e.embedding AS cv, q.qv
       FROM embeddings e, q WHERE e.vec_id <> q.query_id),
sums AS (
  SELECT query_id, vec_id,
         sum(qv[i]::DOUBLE * cv[i]::DOUBLE) AS dot,
         sum(qv[i]::DOUBLE * qv[i]::DOUBLE) AS qq,
         sum(cv[i]::DOUBLE * cv[i]::DOUBLE) AS cc
  FROM pe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY query_id, vec_id),
scored AS (SELECT query_id, vec_id,
                  round(dot / (sqrt(qq) * sqrt(cc)), 6) AS sim
           FROM sums),
ranked AS (
  SELECT query_id, vec_id, sim,
         (row_number() OVER (PARTITION BY query_id
                             ORDER BY sim DESC, vec_id))::INT AS rank
  FROM scored)
"""


def _sim_queries(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    embs = load_table(spark, "embeddings", sf_dir)
    return embs, embs.filter(F.col("vec_id") % _SIM_QUERY_MOD == 0)


@_register(
    "similarity_topk",
    f"WITH {_SIM_SUMS_SQL} "
    "SELECT query_id, rank, vec_id, sim FROM ranked WHERE rank <= 10",
)
def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.cosine_topk(corpus, queries, 10, _EMB_DIM)


@_register(
    "similarity_classify",
    f"""WITH {_SIM_SUMS_SQL},
votes AS (
  SELECT r.query_id, e.label AS nbr_label, count(*) AS cnt
  FROM ranked r JOIN embeddings e ON e.vec_id = r.vec_id
  WHERE r.rank <= 5
  GROUP BY r.query_id, e.label)
SELECT query_id, nbr_label AS prediction FROM (
  SELECT v.*, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cnt DESC, nbr_label ASC) AS rn
  FROM votes v) t
WHERE rn = 1""",
)
def q_similarity_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.cosine_classify(corpus, queries, 5, _EMB_DIM)


_LSH_SIGN_SQL = (
    "CASE WHEN (('0x' || substr(md5(p || ':' || i), 1, 8))::BIGINT % 2) = 0 "
    "THEN 1.0 ELSE -1.0 END"
)

# plane count shared by the Spark call and the oracle CTE: the
# operator's auto-knob (similarity._auto_n_planes) must NOT reach the
# frozen registry queries, so both sides pin this value explicitly
_LSH_PLANES = 8

_LSH_BUCKETS_SQL = f"""
allb AS (
  SELECT vec_id,
         sum(CASE WHEN proj > 0 THEN power(2, p)::BIGINT ELSE 0 END)
           ::BIGINT AS bucket
  FROM (
    SELECT vec_id, p, sum({_LSH_SIGN_SQL} * embedding[i]::DOUBLE) AS proj
    FROM embeddings, generate_series(0, {_LSH_PLANES - 1}) gp(p),
         generate_series(1, {_EMB_DIM}) gi(i)
    GROUP BY vec_id, p) pr
  GROUP BY vec_id)
"""


@_register(
    "similarity_topk_lsh",
    f"""WITH {_LSH_BUCKETS_SQL},
q AS (SELECT e.vec_id AS query_id, e.embedding AS qv, b.bucket
      FROM embeddings e JOIN allb b ON b.vec_id = e.vec_id
      WHERE e.vec_id % {_SIM_QUERY_MOD} = 0),
pe AS (SELECT e.vec_id, q.query_id, e.embedding AS cv, q.qv
       FROM embeddings e
       JOIN allb b ON b.vec_id = e.vec_id
       JOIN q ON q.bucket = b.bucket
       WHERE e.vec_id <> q.query_id),
sums AS (
  SELECT query_id, vec_id,
         sum(qv[i]::DOUBLE * cv[i]::DOUBLE) AS dot,
         sum(qv[i]::DOUBLE * qv[i]::DOUBLE) AS qq,
         sum(cv[i]::DOUBLE * cv[i]::DOUBLE) AS cc
  FROM pe, generate_series(1, {_EMB_DIM}) g(i)
  GROUP BY query_id, vec_id),
scored AS (SELECT query_id, vec_id,
                  round(dot / (sqrt(qq) * sqrt(cc)), 6) AS sim
           FROM sums)
SELECT query_id, rank, vec_id, sim FROM (
  SELECT s.*, (row_number() OVER (PARTITION BY query_id
                                  ORDER BY sim DESC, vec_id))::INT AS rank
  FROM scored s) r
WHERE rank <= 5""",
)
def q_similarity_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket join + exact rerank (scale path).

    Hyperplanes are derived from the portable hash, so the approximate
    candidate set itself is deterministic and oracle-checkable — rare
    for an ANN method.
    """
    corpus, queries = _sim_queries(spark, sf_dir)
    return _sim.lsh_bucket_topk(
        corpus, queries, 5, _EMB_DIM, n_planes=_LSH_PLANES
    )



"""BPE merge-rule induction — distributed tokenizer training.

The training-data pipeline stage the reference surface has no
counterpart for (SURVEY.md §2.11 north-star): learn byte-pair-
encoding merge rules from the corpus. Classic BPE (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units")
alternates:

1. count adjacent symbol pairs over the vocabulary, weighted by word
   frequency   -> distributed groupBy-sum, the heavy step;
2. pick the most frequent pair (deterministic tie-break)   -> a
   1-row argmax;
3. merge that pair everywhere with a strict left-to-right greedy
   fold   -> row-local array fold, no shuffle.

Design for scale: the corpus collapses to its word-frequency table
first (one shuffle keyed by word; |vocab| rows regardless of corpus
size — at 100 TB the vocab is millions of rows, not trillions), and
every subsequent round operates on that table. The only driver-side
data is ONE row per merge round (the argmax decision — iteration
control, the same pattern as the connected-components convergence
count). The greedy fold runs as a Catalyst ``aggregate`` HOF inside
codegen, so 'aaaa' with merge (a,a) -> 'aa','aa' exactly like the
reference algorithm (a string-replace formulation would under-merge
alternating runs — tested in tests/test_bpe.py).

Determinism contract (oracle-checkable): pair counts are exact
integer sums; argmax ties break by (freq DESC, left ASC, right ASC);
the fold is exact string manipulation. The DuckDB oracle implements
the same fold as a recursive CTE and the same rounds as chained CTE
stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from knn_using_hadoop_spark.operators.text import tokens


def word_freq(docs: DataFrame) -> DataFrame:
    """(w, f): corpus word-frequency table — BPE's working set."""
    return (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
    )


def _char_symbols(wf: DataFrame) -> DataFrame:
    """Initial symbol sequences: each word split into 1-char symbols."""
    return wf.withColumn(
        "s",
        F.expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))"),
    )


def _pair_counts(sym: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies, weighted by word frequency.

    ``sequence(1, n)`` counts DOWN for n < 1 (Spark gotcha), so
    single-symbol words are guarded to an empty pair list.
    """
    pairs = sym.select(
        "f",
        F.explode(
            F.when(
                F.size("s") >= 2,
                F.expr(
                    "transform(sequence(1, size(s) - 1), "
                    "i -> struct(element_at(s, i) AS l, "
                    "element_at(s, i + 1) AS r))"
                ),
            ).otherwise(
                F.array().cast("array<struct<l:string,r:string>>")
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.l", "p.r").agg(F.sum("f").alias("freq"))


def _apply_merge(s: Column, left: str, right: str) -> Column:
    """Strict left-to-right greedy merge of (left, right) in ``s``.

    Catalyst ``aggregate`` fold: if the accumulator ends with ``left``
    and the next symbol is ``right``, replace the tail with the merged
    symbol; else append. Left-to-right greediness makes 'aaaa' with
    (a,a) -> ['aa','aa'] (matching the reference BPE algorithm) where
    a non-overlapping string replace would yield ['aa','a','a'].
    """
    merged = left + right
    return F.aggregate(
        s,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1),
                F.array(F.lit(merged)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _select_batch(cands, m: int) -> list[tuple[str, str, int]]:
    """Greedy scan of the ranked candidate list for up to ``m``
    pairwise NON-INTERACTING merges.

    Two merges interact when either consumes a symbol the other reads
    or produces a symbol the other matches — i.e. their
    {left, right, left+right} sets intersect. Non-interacting merges
    have a useful exactness property: applying one cannot create or
    destroy any instance of the other, so every selected merge's
    recorded ``freq`` is still its true corpus count at application
    time (the pre-round counts stay exact within the batch).
    Conflicting candidates are skipped, not dropped — the next round's
    recount reconsiders them with fresh frequencies.
    """
    chosen: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for row in cands:
        left, right = row["l"], row["r"]
        if {left, right, left + right} & used:
            continue
        chosen.append((left, right, int(row["freq"])))
        used |= {left, right, left + right}
        if len(chosen) == m:
            break
    return chosen


def bpe_learn(
    spark: SparkSession, docs: DataFrame, k: int = 3, batch_m: int = 1
) -> tuple[DataFrame, DataFrame]:
    """Learn ``k`` BPE merges; return (merge table, per-round totals).

    Merge table: (merge_rank, merge_left, merge_right, freq) — one row
    per learned rule, in learning order. Totals: (round, total_symbols)
    for rounds 0..k — the corpus compression curve (round 0 = character
    count), sum over the word-frequency table of f * |symbols|.

    ``batch_m`` is the scale knob (VERDICT r2 ask #2): with the default
    1 the loop is classic sequential BPE — one distributed pair-count
    + one 1-row argmax per merge, bit-identical to the DuckDB oracle.
    With ``batch_m > 1`` each round recounts ONCE and applies up to
    ``batch_m`` non-interacting merges from that count (see
    ``_select_batch``), so a 32k-merge vocabulary needs ~k/m Spark
    jobs instead of k — this is what makes a real tokenizer train
    feasible as a driver-coordinated loop. When the top-m candidates
    happen not to conflict (common in real corpora where the head of
    the pair distribution is spread across disjoint character
    classes), batched learning selects exactly the same merges as
    sequential BPE with the same recorded frequencies; under conflict
    it defers the loser to the next recount, which is the standard
    batched-BPE approximation. All intermediate fold states of a
    round share one localCheckpoint and one combined size aggregate,
    so per-round driver traffic stays O(batch buffer), not O(corpus).
    """
    sym = _char_symbols(word_freq(docs)).localCheckpoint(eager=True)

    def total_symbols(s: DataFrame) -> int:
        return s.agg(
            F.sum(F.col("f") * F.size("s")).cast("bigint")
        ).collect()[0][0]

    merges: list[tuple[int, str, str, int]] = []
    totals: list[tuple[int, int]] = [(0, total_symbols(sym))]
    rank = 0
    while rank < k:
        # m=1 keeps the exact classic plan (limit(1) argmax); batched
        # rounds over-fetch so conflict skips still fill the batch.
        buffer = 1 if batch_m == 1 else 4 * batch_m
        top = (
            _pair_counts(sym)
            .orderBy(F.desc("freq"), F.asc("l"), F.asc("r"))
            .limit(buffer)
            .collect()
        )
        if not top:  # corpus fully merged (degenerate tiny input)
            break
        batch = _select_batch(top, min(batch_m, k - rank))
        # Chain the folds of the round into staged columns s{rank}:
        # one checkpoint materializes every intermediate state, one
        # aggregate reads all their sizes (no per-merge jobs).
        staged_cols = []
        s_col: Column = F.col("s")
        base_rank = rank
        for left, right, freq in batch:
            rank += 1
            merges.append((rank, left, right, freq))
            s_col = _apply_merge(s_col, left, right)
            staged_cols.append(s_col.alias(f"s{rank}"))
        staged = sym.select("w", "f", *staged_cols).localCheckpoint(
            eager=True
        )
        sizes = staged.agg(
            *[
                F.sum(F.col("f") * F.size(f"s{base_rank + j}"))
                .cast("bigint")
                .alias(f"t{j}")
                for j in range(1, len(batch) + 1)
            ]
        ).collect()[0]
        totals.extend(
            (base_rank + j, int(sizes[j - 1]))
            for j in range(1, len(batch) + 1)
        )
        sym = staged.select("w", "f", F.col(f"s{rank}").alias("s"))

    merges_df = spark.createDataFrame(
        merges,
        "merge_rank int, merge_left string, merge_right string, freq bigint",
    )
    totals_df = spark.createDataFrame(
        totals, "round int, total_symbols bigint"
    )
    return merges_df, totals_df


def bpe_segment(docs: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply learned merges to the corpus: (doc_id, n_tokens_bpe).

    The inference half of the tokenizer: every word re-segmented by
    replaying the merge list in learning order (the standard BPE
    apply rule). Pure row-local fold chain — no shuffle at all; at
    100 TB this is a map-only pass.
    """
    def char_split(w: Column) -> Column:
        idx = F.sequence(F.lit(1), F.length(w))
        return F.transform(idx, lambda i: F.substring(w, i, 1))

    def seg_word(w: Column) -> Column:
        s = char_split(w)
        for left, right in merges:
            s = _apply_merge(s, left, right)
        return s

    return docs.select(
        "doc_id",
        F.aggregate(
            F.transform(tokens("text"), lambda w: F.size(seg_word(w))),
            F.lit(0),
            lambda acc, n: acc + n,
        ).alias("n_tokens_bpe"),
    )


# ---------------------------------------------------------------------------
# Oracle SQL generation (chained recursive-CTE stages, one per round)
# ---------------------------------------------------------------------------


def bpe_oracle_sql(k: int = 3, want: str = "merges") -> str:
    """DuckDB twin of ``bpe_learn``: same counts, argmax, greedy fold.

    Emits one (pair-count, argmax, recursive-fold) CTE stage per
    round; ``want`` selects the merge table or the compression curve.
    """
    parts = [
        "WITH RECURSIVE",
        "wf AS (SELECT tok AS w, count(*)::BIGINT AS f"
        " FROM (SELECT unnest(string_split(text, ' ')) AS tok"
        " FROM documents) u GROUP BY tok),",
        "sym0 AS (SELECT w, f,"
        " list_transform(generate_series(1, length(w)), i -> w[i]) AS s"
        " FROM wf),",
    ]
    for j in range(1, k + 1):
        prev = f"sym{j - 1}"
        parts.append(
            f"p{j} AS (SELECT string_split(pr, chr(9))[1] AS l,"
            f" string_split(pr, chr(9))[2] AS r, sum(f)::BIGINT AS freq"
            f" FROM (SELECT f, unnest(list_transform("
            f"generate_series(1, len(s) - 1),"
            f" i -> s[i] || chr(9) || s[i + 1])) AS pr FROM {prev}) u"
            f" GROUP BY 1, 2),"
        )
        parts.append(
            f"m{j} AS (SELECT {j} AS merge_rank, l, r, freq FROM p{j}"
            f" ORDER BY freq DESC, l ASC, r ASC LIMIT 1),"
        )
        parts.append(
            f"f{j} AS ("
            f" SELECT w, f, 1 AS pos, []::VARCHAR[] AS acc FROM {prev}"
            f" UNION ALL"
            f" SELECT f{j}.w, f{j}.f, pos + 1,"
            f" CASE WHEN len(acc) > 0 AND acc[len(acc)] = m{j}.l"
            f"       AND s.s[pos] = m{j}.r"
            f"      THEN list_append(list_slice(acc, 1, len(acc) - 1),"
            f"                       m{j}.l || m{j}.r)"
            f"      ELSE list_append(acc, s.s[pos]) END"
            f" FROM f{j} JOIN {prev} s USING (w) CROSS JOIN m{j}"
            f" WHERE pos <= len(s.s)),"
        )
        parts.append(
            f"sym{j} AS (SELECT f{j}.w, f{j}.f, acc AS s"
            f" FROM f{j} JOIN {prev} USING (w)"
            f" WHERE pos = len({prev}.s) + 1),"
        )
    # strip trailing comma from the last CTE
    parts[-1] = parts[-1].rstrip(",")
    if want == "merges":
        sel = " UNION ALL ".join(
            f"SELECT merge_rank, l AS merge_left, r AS merge_right, freq"
            f" FROM m{j}"
            for j in range(1, k + 1)
        )
    elif want == "totals":
        sel = " UNION ALL ".join(
            f"SELECT {j} AS round,"
            f" (SELECT sum(f * len(s))::BIGINT FROM sym{j})"
            f" AS total_symbols"
            for j in range(0, k + 1)
        )
    else:  # pragma: no cover
        raise ValueError(want)
    return "\n".join(parts) + "\n" + sel

"""Distributed BPE tokenizer training — the vocabulary-learning job a
training-data pipeline runs over the full corpus before packing.

Shape at 100 TB (the part that matters):

1. ONE corpus-wide pass: whitespace words → (word, n) counts, a
   map-side-combinable groupBy. Everything after operates on the
   DISTINCT-WORD table — vocabulary-sized (millions), never
   corpus-sized (trillions). This is the standard distributed BPE
   decomposition (Sennrich et al., ACL'16 trains on exactly this
   count table single-node).
2. Per merge round: adjacent symbol pairs exploded from the symbol
   arrays (JVM ``transform(sequence)``), weighted pair counts as one
   algebraic aggregation (map-side combined), the argmax as a 1-row
   ``max_by`` action — the components.py driver-loop discipline: one
   cheap action per round.
3. The winning pair is applied as a pure-Column ``aggregate`` fold
   over each word's symbol array (greedy leftmost-first, proven
   equivalent to the scan form below) — a narrow map stage on the
   word table, no shuffle. Lineage is truncated with localCheckpoint
   per round.

Greedy-scan equivalence of the fold: the scan form (Sennrich's
``i += 2`` after a merge) never reconsiders a just-merged token as the
LEFT element of another merge in the same round. The fold checks
``out[-1] == left``; a just-merged token equals ``left + right``,
which can equal ``left`` only if ``right`` is empty — impossible. So
fold and scan produce identical symbol sequences.

Determinism: ties on pair count break to the lexicographically
smallest (left, right) — pinned against the pure-Python twin
(tests/test_bpe.py) on multi-tie corpora.

Words carry an explicit end-of-word sentinel symbol ``"</w>"`` (the
classic formulation), so learned merges distinguish word-final from
word-internal contexts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

EOW = "</w>"
BPE_MERGES = 12
_TRUNC_EVERY = 16  # eager-checkpoint barrier cadence in bpe_train


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the single corpus-wide pass."""
    from ophois_spark.operators.textops import tokens_col
    from ophois_spark.plans.layout import fan_out

    return (
        fan_out(docs.select(F.col(text_col)))
        .select(F.explode(tokens_col(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """word → (sym: array<string>, n): characters plus the EOW sentinel."""
    return words.select(
        F.concat(
            F.split(F.col("word"), ""),  # each character
            F.array(F.lit(EOW)),
        ).alias("sym"),
        "n",
    )


def _merge_fold(sym, left: str, right: str):
    """Greedy leftmost-first merge of adjacent (left, right) → left+right
    as a Column fold (see module docstring for scan equivalence)."""
    merged = left + right

    def step(acc, x):
        can = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right))
        )
        replaced = F.concat(
            F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
        )
        return F.when(can, replaced).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(sym, F.array().cast("array<string>"), step)


def _pair_counts(words: DataFrame, weight) -> DataFrame:
    """(l, r, c): adjacent-pair counts of ``words`` with ``weight(n)``."""
    idx = F.sequence(F.lit(1), F.size("sym") - 1)
    return (
        words.filter(F.size("sym") >= 2)
        .select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at("sym", i).alias("l"),
                        F.element_at("sym", i + 1).alias("r"),
                    ),
                )
            ).alias("p"),
            weight(F.col("n")).alias("w"),
        )
        .groupBy("p.l", "p.r")
        .agg(F.sum("w").alias("c"))
    )


def _contains_pair(left: str, right: str):
    """Column predicate: sym has an adjacent (left, right) occurrence."""
    idx = F.sequence(F.lit(1), F.size("sym") - 1)
    return (F.size("sym") >= 2) & F.exists(
        idx,
        lambda i: (F.element_at("sym", i) == F.lit(left))
        & (F.element_at("sym", i + 1) == F.lit(right)),
    )


def bpe_train_incremental(
    docs: DataFrame, n_merges: int = BPE_MERGES, text_col: str = "text"
) -> list[tuple[int, str, str]]:
    """Incremental-pair-count BPE trainer — a MEASURED NEGATIVE RESULT,
    kept as the documented alternative to the default ``bpe_train``.

    Idea (the textbook single-node optimization): maintain the pair
    counts across rounds and per round re-explode only the words that
    CONTAIN the winning pair, subtracting their pre-merge pairs and
    adding their post-merge pairs:

        pc_{r+1} = pc_r  −  pairs(changed)  +  pairs(merge(changed))

    Exactly equivalent to the full re-count by construction (unchanged
    words contribute identical pairs to both sides; pinned against
    ``bpe_train`` in tests/test_bpe.py on tie-heavy corpora).

    Why it LOSES under Spark (measured on this host, one interleaved
    session, identical outputs — see BENCH/BASELINE.md round-5 notes):
    64 merges at 50k distinct words: 28.9 s vs 10.4 s scan; at 400k:
    22.8 s vs 10.5 s; 16 merges at 2M words: 11.9 s vs 4.4 s. The full
    re-count's explode+aggregate is whole-stage-codegen'd with map-side
    combine, so its shuffle is only distinct-pair-sized regardless of
    corpus, while the delta path pays 4 extra predicate scans of the
    word table, two extra small shuffles, and a vocab-sized
    filter+union rewrite per round — bookkeeping that costs more than
    the arithmetic it saves at every scale testable here. The word-
    table rewrite is vocab-sized in BOTH designs, so the asymptotics
    don't diverge either. Kept because the delta bookkeeping is the
    right base for a STREAMING vocabulary trainer (where no full
    re-count is possible), and as the measured record of why the
    default is the scan.
    """
    words = _initial_symbols(word_counts(docs, text_col)).localCheckpoint(
        eager=False
    )
    n_part = words.rdd.getNumPartitions()
    pc = _pair_counts(words, lambda n: n).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str]] = []
    for r in range(n_merges):
        best = pc.filter(F.col("c") > 0).orderBy(
            F.desc("c"), F.asc("l"), F.asc("r")
        ).limit(1).collect()
        if not best:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((r, left, right))
        eager = (r + 1) % _TRUNC_EVERY == 0
        changed = words.filter(_contains_pair(left, right))
        merged = changed.select(
            _merge_fold(F.col("sym"), left, right).alias("sym"), "n"
        )
        delta = _pair_counts(changed, lambda n: -n).unionByName(
            _pair_counts(merged, lambda n: n)
        )
        pc = (
            pc.unionByName(delta)
            .groupBy("l", "r")
            .agg(F.sum("c").alias("c"))
            .filter(F.col("c") != 0)
            .localCheckpoint(eager=eager)
        )
        words = (
            words.filter(~_contains_pair(left, right))
            .unionByName(merged)
            .coalesce(n_part)
            .localCheckpoint(eager=eager)
        )
    return merges


def bpe_train(
    docs: DataFrame, n_merges: int = BPE_MERGES, text_col: str = "text"
) -> list[tuple[int, str, str]]:
    """Learn ``n_merges`` BPE merges → [(rank, left, right), ...] by
    full pair re-count per round — the DEFAULT trainer.

    Driver-side result by design: the merge table IS the trained
    artifact (size = n_merges, independent of corpus scale) and each
    round needs the winner on the driver to build the next round's
    fold anyway.

    Per round: one explode of the word table's adjacent pairs into an
    algebraic map-side-combined aggregation (the shuffle is DISTINCT-
    PAIR-sized, not instance-sized), a 1-row argmax action, and a
    narrow fold rewrite of the word table. This beat the incremental
    delta design (``bpe_train_incremental``) at every measured scale —
    50k/400k/2M distinct words — because whole-stage codegen makes the
    re-count nearly free while the delta pays per-round bookkeeping
    passes; measurements in the twin's docstring.

    Loop hygiene: with one action per round, lazy localCheckpoints may
    never get a job that truncates their serialized RDD graph — at 256
    merges the task deserializer overflowed the stack near round ~150.
    An eager checkpoint barrier every ``_TRUNC_EVERY`` rounds bounds
    graph depth without paying an extra job every round.
    """
    words = _initial_symbols(word_counts(docs, text_col)).localCheckpoint(
        eager=False
    )
    merges: list[tuple[int, str, str]] = []
    for r in range(n_merges):
        pairs = _pair_counts(words, lambda n: n)
        best = pairs.orderBy(F.desc("c"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not best:
            break
        left, right = best[0]["l"], best[0]["r"]
        merges.append((r, left, right))
        words = words.select(
            _merge_fold(F.col("sym"), left, right).alias("sym"), "n"
        ).localCheckpoint(eager=(r + 1) % _TRUNC_EVERY == 0)
    return merges


def bpe_apply(
    docs: DataFrame, merges: list[tuple[int, str, str]], text_col: str = "text"
) -> DataFrame:
    """Tokenize with a learned merge table → (doc_id, n_bpe_tokens):
    the per-doc BPE token count (the packing/pricing quantity).

    The merge chain (one Column fold per merge, rank order) runs ONCE
    PER DISTINCT WORD, not per occurrence — at corpus scale the fold
    cost is vocabulary-sized and occurrences just equi-join the
    per-word length back on the word key (word-keyed hash join; hot
    words like stopwords are one row on the build side, so no skew
    materializes on the fold)."""
    sym = F.concat(
        F.split(F.col("_w"), ""),
        F.array(F.lit(EOW)),
    )
    for _, left, right in sorted(merges):
        sym = _merge_fold(sym, left, right)
    from ophois_spark.operators.textops import tokens_col
    from ophois_spark.plans.layout import fan_out

    occ = (
        fan_out(docs.select("doc_id", F.col(text_col)))
        .select("doc_id", F.explode(tokens_col(F.col(text_col))).alias("_w"))
        .filter(F.col("_w") != "")
    )
    wl = occ.select("_w").distinct().select("_w", F.size(sym).alias("_k"))
    return (
        occ.join(wl, "_w")
        .groupBy("doc_id")
        .agg(F.sum("_k").cast("long").alias("n_bpe_tokens"))
    )

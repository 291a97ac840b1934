"""Iterative BPE merge training [EXT] — the missing middle of the
tokenizer story (``bpe_pair_counts`` selects merge candidates for ONE
round; ``vocab_encode`` applies a frozen vocabulary; this module runs
the loop between them).

No reference counterpart (SURVEY.md §2.11). Algorithm: classic
word-level byte-pair encoding (Sennrich et al. 2016) — train on the
WORD-FREQUENCY table, not the raw corpus:

1. one corpus pass builds ``(word, freq)`` (a wordcount-shape shuffle
   with map-side partial aggregation); every later round touches only
   this vocab-sized table, which is why BPE training is tractable at
   100 TB — a trillion-token corpus has a few tens of millions of
   distinct words, not a trillion;
2. each round: explode adjacent symbol pairs per word (scan-local),
   freq-weighted count per pair (vocab-bounded shuffle), pick the best
   pair with ``TakeOrderedAndProject`` (count desc, pair asc — a total
   order, so the learned merge sequence is deterministic), then
   re-encode every word with a scan-local greedy left-to-right fold
   (``F.aggregate`` over the symbol array; the 1-row best pair is
   broadcast, never collected to the driver);
3. per-round ``localCheckpoint`` severs plan growth, the same pattern
   as the IVF Lloyd loop (operators/similarity.py::kmeans_refine).

The greedy fold's semantics are pinned cross-engine: merging pair
``(l, r)`` appends ``r`` directly onto the accumulator iff the
accumulator's LAST SYMBOL equals ``l`` exactly (comma-guarded suffix
check — symbols are ``\\w`` text and the merge of two symbols, so they
can never contain the comma separator), which reproduces left-to-right
non-overlapping merging including the ``(a, a)`` repeated-symbol case
(``a a a a`` → ``aa aa``). The DuckDB oracle runs the identical fold
via ``list_reduce`` (queries_ext.bpe_train_oracle), unrolled round by
round, so every merge decision is verified bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — BPE training's only corpus pass."""
    return (
        df.select(F.explode(tokenize(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )


def _adjacent_pairs(syms):
    """Array of (l, r) structs for each adjacent symbol position; empty
    for single-symbol words (the explicit guard also keeps Spark's
    ``sequence(1, 0)`` from producing a DESCENDING range)."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), (n - 1).cast("int")),
            lambda i: F.struct(
                F.element_at(syms, i.cast("int")).alias("l"),
                F.element_at(syms, (i + 1).cast("int")).alias("r"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))


def _merge_fold(seg_col, l, r):
    """Greedy left-to-right merge of pair (l, r) over a comma-joined
    segmentation string — the cross-engine-exact re-encode step."""
    return F.aggregate(
        F.split(seg_col, ","),
        F.lit(""),
        lambda acc, x: F.when(acc == "", x)
        .when(
            (x == r) & ((acc == l) | acc.endswith(F.concat(F.lit(","), l))),
            F.concat(acc, x),
        )
        .otherwise(F.concat(acc, F.lit(","), x)),
    )


def bpe_train(
    df: DataFrame, text_col: str = "text", num_merges: int = 8
) -> DataFrame:
    """Learn ``num_merges`` BPE merges from the corpus; returns the merge
    table ``(merge_rank, left_sym, right_sym, pair_cnt)`` in learned
    order — the artifact a tokenizer ships."""
    words = word_frequencies(df, text_col)
    # LAZY checkpoints on the segmentation frame (r11, the kmeans/CC
    # loop idiom — graph.py::_two_star_edges): the next round's
    # pair-count aggregate is the action that materializes it, so each
    # round costs ONE job instead of two; the checkpoint still truncates
    # lineage so plan depth stays O(1) in num_merges. Safe because
    # nothing is written between the checkpoint and that action (the
    # eager pins in the ingest protocols guard table appends, a hazard
    # this loop does not have). `best` stays EAGER: its 1-row result is
    # broadcast into the same round's re-encode AND unioned into the
    # merge table, and the union must not re-run the TakeOrdered job.
    seg = words.select(
        "word", "freq", F.array_join(F.split("word", ""), ",").alias("seg")
    ).localCheckpoint(eager=False)
    merges: DataFrame | None = None
    for rank in range(1, num_merges + 1):
        syms = F.split(F.col("seg"), ",")
        counted = (
            seg.select(F.explode(_adjacent_pairs(syms)).alias("p"), "freq")
            .groupBy(
                F.col("p.l").alias("left_sym"), F.col("p.r").alias("right_sym")
            )
            .agg(F.sum("freq").cast("bigint").alias("pair_cnt"))
        )
        best = (
            counted.orderBy(F.desc("pair_cnt"), "left_sym", "right_sym")
            .limit(1)
            .select(
                F.lit(rank).cast("bigint").alias("merge_rank"),
                "left_sym",
                "right_sym",
                "pair_cnt",
            )
            .localCheckpoint(eager=True)
        )
        merges = best if merges is None else merges.unionByName(best)
        pair = F.broadcast(
            best.select(
                F.col("left_sym").alias("_l"), F.col("right_sym").alias("_r")
            )
        )
        seg = (
            seg.crossJoin(pair)
            .select(
                "word",
                "freq",
                _merge_fold(F.col("seg"), F.col("_l"), F.col("_r")).alias("seg"),
            )
            .localCheckpoint(eager=False)
        )
    assert merges is not None
    return merges


def bpe_word_segments(
    words: DataFrame, merges: DataFrame
) -> DataFrame:
    """Apply a learned merge table to a ``(word, freq)`` vocabulary:
    each word's final segmentation and symbol count — the 'tokenize the
    corpus' step runs over the vocab table (each distinct word encoded
    ONCE), then joins back to documents; never per-occurrence. The merge
    list is tokenizer-sized, so collecting it in rank order is the
    standard 'ship the tokenizer' step, not a data-plane collect."""
    ranked = [
        (row["left_sym"], row["right_sym"])
        for row in merges.orderBy("merge_rank").collect()
    ]
    out = words.select(
        "word", "freq", F.array_join(F.split("word", ""), ",").alias("seg")
    )
    for l, r in ranked:
        out = out.select(
            "word",
            "freq",
            _merge_fold(F.col("seg"), F.lit(l), F.lit(r)).alias("seg"),
        )
    return out.select(
        "word",
        "freq",
        "seg",
        F.size(F.split("seg", ",")).cast("bigint").alias("n_symbols"),
    )

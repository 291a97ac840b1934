"""Behavioral tests for iterative BPE training (operators/bpe.py) — the
oracle-parity suite proves Spark↔DuckDB agreement; these prove the
algorithm itself against a transparent pure-Python reference, including
the greedy-fold edge cases (repeated symbols, cascading merges)."""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from simple_map_reduce_spark.operators.bpe import (
    bpe_train,
    bpe_word_segments,
    word_frequencies,
)


def _py_bpe(texts: list[str], k: int):
    """Reference BPE: word-frequency training, best pair by
    (count desc, left asc, right asc), greedy left-to-right
    non-overlapping re-encode (a merged symbol is not reconsidered as
    the left of the next pair within the same pass)."""
    freq = Counter(w for t in texts for w in re.findall(r"\w+", t.lower()))
    segs = {w: list(w) for w in freq}
    merges = []
    for rank in range(1, k + 1):
        cnt: Counter = Counter()
        for w, f in freq.items():
            s = segs[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        if not cnt:
            break
        (l, r), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, c))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges, segs


CORPORA = [
    # cascading merges: 'lo' then 'low'/'lowe...' style build-ups
    ["low lower lowest low low", "newer newest new low", "wider wide widest"],
    # repeated-symbol runs: (a,a) greedy must pair non-overlapping
    ["aaaa aaa aa aaaa", "aaaa banana bananas"],
    # underscores are \w AND SQL-LIKE wildcards — the fold must not care
    ["foo_bar foo_bar foo_baz", "x_y x_y x_y zz_top"],
]


def _spark_merges(spark, texts, k):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    rows = bpe_train(df, "text", num_merges=k).orderBy("merge_rank").collect()
    return [(r.merge_rank, r.left_sym, r.right_sym, r.pair_cnt) for r in rows]


def test_bpe_train_matches_python_reference(spark):
    for texts in CORPORA:
        want, _ = _py_bpe(texts, 6)
        got = _spark_merges(spark, texts, 6)
        assert got == want, (texts, got, want)


def test_bpe_word_segments_match_reference_and_reassemble(spark):
    texts = CORPORA[0]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["doc_id", "text"])
    merges = bpe_train(df, "text", num_merges=6)
    got = {
        r.word: (tuple(r.seg.split(",")), r.n_symbols)
        for r in bpe_word_segments(word_frequencies(df, "text"), merges).collect()
    }
    _, segs = _py_bpe(texts, 6)
    assert {w: tuple(s) for w, s in segs.items()} == {w: s for w, (s, _) in got.items()}
    for w, (s, n) in got.items():
        assert "".join(s) == w  # segmentation is a partition of the word
        assert n == len(s)


def test_bpe_repeated_symbol_greedy_is_nonoverlapping(spark):
    # 'aaaa' must become (aa, aa) — two merges of the (a, a) pair, never
    # three overlapping ones; 'aaa' becomes (aa, a)
    texts = ["aaaa aaa"]
    df = spark.createDataFrame([(0, texts[0])], ["doc_id", "text"])
    merges = bpe_train(df, "text", num_merges=1)
    row = merges.collect()[0]
    assert (row.left_sym, row.right_sym) == ("a", "a")
    assert row.pair_cnt == 5  # aaaa: pairs at 3 positions; aaa: 2
    segged = {
        r.word: r.seg
        for r in bpe_word_segments(word_frequencies(df, "text"), merges).collect()
    }
    assert segged == {"aaaa": "aa,aa", "aaa": "aa,a"}

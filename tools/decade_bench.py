#!/usr/bin/env python3
"""One-decade scaling harness (SCALE.md § "Measured scaling"): time
registry rows at sf0.1 vs a 10x derivative and print ratio + exponent.

Derivatives (measurement-only, built in /tmp, never used for
correctness; id shifts are multiples of 20 so every %10/%20
split-residue class the queries rely on is preserved; copy 0 is sf0.1
verbatim):

- ``/tmp/sf1x`` — VERBATIM text copies. Preserves every df share
  exactly: the right derivative for BM25 rows, where per-term document
  frequency must scale with N (used by r9's bm25_topk_pruned row and
  r10's bm25_stream_ingest row).
- ``/tmp/sf1xkb`` — DISJOINT-population copies for the dedup/keep-best
  journey class, where verbatim copies would be wrong: every doc would
  gain ~10 cross-copy near-dup twins, growing the match population
  ~100x instead of 10x (a quadratic derivative, not a decade).
  documents: copies 1-9 prefix every word with a per-copy token (same
  token/shingle-set cardinalities, zero cross-copy shingle overlap).
  embeddings: copies 1-9 multiply each component by a deterministic
  per-copy +-1 sign mask — an ORTHOGONAL transform, so every
  intra-copy cosine is preserved bit-for-bit while cross-copy cosines
  collapse toward 0 (random-sign sums); checked at build time against
  the tau=0.3 match threshold on a sample.

Method is bench.py's: fresh local[32] session, per (row, scale) one
unmeasured warmup (memoized standing-index builds land there for _read
rows; journey rows rebuild every call, so every reps prices the full
journey), then min-of-2 measured runs through the no-op sink, tracked
caches + Spark cache cleared between runs.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF01 = "/root/testdata/sf0.1"
D_VERBATIM = "/tmp/sf1x"
D_KB = "/tmp/sf1xkb"
# derivative-artifact control + second decade (the 0.57-exponent
# watch-list row): 10x VERBATIM embeddings reproduce r8's derivative
# (every vector has 9 exact cos=1.0 cross-copy twins — match population
# ~100x, a quadratic artifact); 100x sign-mask embeddings extend the
# natural-match-rate derivative a SECOND decade.
D_VEMB = "/tmp/sf1xvemb"
D_100 = "/tmp/sf100xkb"
N_COPIES = 10
SHIFT = 1_000_000  # multiple of 20: preserves %10/%20 residue classes


def build_derivatives() -> None:
    import duckdb

    con = duckdb.connect()
    os.makedirs(D_VERBATIM, exist_ok=True)
    os.makedirs(D_KB, exist_ok=True)
    if not os.path.exists(f"{D_VERBATIM}/documents.parquet"):
        con.execute(f"""
            COPY (
              SELECT doc_id + i * {SHIFT} AS doc_id, text, lang, source, n_chars
              FROM '{SF01}/documents.parquet',
                   (SELECT unnest(range({N_COPIES})) AS i)
            ) TO '{D_VERBATIM}/documents.parquet' (FORMAT PARQUET)
        """)
    if not os.path.exists(f"{D_KB}/documents.parquet"):
        word_re, backref = r"(\w+)", r"c{i}\1"

        def _text_expr(i: int) -> str:
            if i == 0:
                return "text"
            repl = backref.replace("{i}", str(i))
            return f"regexp_replace(text, '{word_re}', '{repl}', 'g')"

        branches = " UNION ALL ".join(
            f"""SELECT doc_id + {i * SHIFT} AS doc_id,
                       {_text_expr(i)} AS text,
                       lang, source, n_chars
                FROM '{SF01}/documents.parquet'"""
            for i in range(N_COPIES)
        )
        con.execute(
            f"COPY ({branches}) TO '{D_KB}/documents.parquet' (FORMAT PARQUET)"
        )
    if not os.path.exists(f"{D_KB}/embeddings.parquet"):
        branches = " UNION ALL ".join(
            f"""SELECT vec_id + {i * SHIFT} AS vec_id,
                       {'embedding' if i == 0 else
                        f"CAST(list_transform(range(1, 65), j -> "
                        f"embedding[j] * (1 - 2 * CAST(hash({i} * 101 + j) % 2 "
                        f"AS INT))) AS FLOAT[])"} AS embedding,
                       label
                FROM '{SF01}/embeddings.parquet'"""
            for i in range(N_COPIES)
        )
        con.execute(
            f"COPY ({branches}) TO '{D_KB}/embeddings.parquet' (FORMAT PARQUET)"
        )
    def _emb_branches(n: int, mask: bool) -> str:
        return " UNION ALL ".join(
            f"""SELECT vec_id + {i * SHIFT} AS vec_id,
                       {'embedding' if (i == 0 or not mask) else
                        f"CAST(list_transform(range(1, 65), j -> "
                        f"embedding[j] * (1 - 2 * CAST(hash({i} * 101 + j) % 2 "
                        f"AS INT))) AS FLOAT[])"} AS embedding,
                       label
                FROM '{SF01}/embeddings.parquet'"""
            for i in range(n)
        )

    os.makedirs(D_VEMB, exist_ok=True)
    os.makedirs(D_100, exist_ok=True)
    if not os.path.exists(f"{D_VEMB}/embeddings.parquet"):
        con.execute(
            f"COPY ({_emb_branches(N_COPIES, mask=False)}) "
            f"TO '{D_VEMB}/embeddings.parquet' (FORMAT PARQUET)"
        )
    if not os.path.exists(f"{D_100}/embeddings.parquet"):
        con.execute(
            f"COPY ({_emb_branches(100, mask=True)}) "
            f"TO '{D_100}/embeddings.parquet' (FORMAT PARQUET)"
        )
    if not os.path.exists(f"{D_100}/documents.parquet"):
        # 100x disjoint-population documents (the D_KB per-copy word
        # prefix, two decades): prices the LEXICAL streaming keep-best
        # journey's second decade, and supplies the aligned n_chars
        # quality the semantic journey joins on (doc_id == vec_id
        # ranges shift identically)
        word_re, backref = r"(\w+)", r"c{i}\1"

        def _doc_text(i: int) -> str:
            if i == 0:
                return "text"
            repl = backref.replace("{i}", str(i))
            return f"regexp_replace(text, '{word_re}', '{repl}', 'g')"

        branches = " UNION ALL ".join(
            f"""SELECT doc_id + {i * SHIFT} AS doc_id,
                       {_doc_text(i)} AS text,
                       lang, source, n_chars
                FROM '{SF01}/documents.parquet'"""
            for i in range(100)
        )
        con.execute(
            f"COPY ({branches}) TO '{D_100}/documents.parquet' (FORMAT PARQUET)"
        )
    for p in (f"{D_VERBATIM}/documents.parquet", f"{D_KB}/documents.parquet",
              f"{D_KB}/embeddings.parquet", f"{D_VEMB}/embeddings.parquet",
              f"{D_100}/embeddings.parquet"):
        n = con.execute(f"SELECT count(*) FROM '{p}'").fetchone()[0]
        print(f"{p}: {n} rows", flush=True)
    # cross-copy contamination probe: sampled cross-copy cosines vs tau
    probe = con.execute(f"""
        WITH v AS (SELECT vec_id, embedding,
                          sqrt(list_sum(list_transform(embedding, x -> x*x))) AS n
                   FROM '{D_KB}/embeddings.parquet' WHERE vec_id % 97 = 0)
        SELECT count(*) FROM v a JOIN v b
          ON a.vec_id // {SHIFT} != b.vec_id // {SHIFT}
         AND a.vec_id < b.vec_id
        WHERE list_sum(list_transform(range(1, 65),
                  j -> a.embedding[j] * b.embedding[j])) / (a.n * b.n) >= 0.3
    """).fetchone()[0]
    print(f"cross-copy cos>=0.3 sampled pairs: {probe}", flush=True)


# row -> which 10x derivative dir prices it correctly
ROWS = {
    "bm25_stream_ingest": D_VERBATIM,
    "neardup_keep_best": D_KB,
    "semantic_keep_best": D_KB,
    "ivf_delete_search": D_KB,
    "streaming_keep_best": D_KB,
    "streaming_semantic_keep_best": D_KB,
    # r10 batch semantic keep-best + its min-id control: same quantizer,
    # same within-cluster join — measured together so the dominance tier
    # can be shown to add no scale shape of its own. Both are the
    # FIXED-K parity tier (the oracle recomposes the quantizer), so the
    # expected decade reads the N²/K within-cluster shape the √N
    # capacity rule exists to fix — see SCALE.md §"Second decade".
    "semdedup_keep_best": D_KB,
    "semdedup_prune": D_KB,
    # measurement-only auto-sized twin (see measure()); 10x default,
    # --deriv /tmp/sf100xkb for the second decade
    "streaming_semantic_keep_best_auto": D_KB,
}


def measure(rows: list[str], deriv: str | None = None, reps: int = 2) -> None:
    import __spark_entry__ as m
    from simple_map_reduce_spark.cache import release_tracked
    from simple_map_reduce_spark.session import get_session

    spark = get_session()
    spark.sparkContext.setLogLevel("ERROR")
    q = dict(m.queries())
    # measurement-only variant (r11, VERDICT r10 item 4): the semantic
    # streaming keep-best journey on the AUTO-SIZED quantizer — the
    # sizing production runs; the registered row stays on the parity
    # constant its oracle bakes in
    from simple_map_reduce_spark.queries_ext import _streaming_skb_journey

    q["streaming_semantic_keep_best_auto"] = (
        lambda s, sfdir: _streaming_skb_journey(s, sfdir, None)
    )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    for name in rows:
        target = deriv or ROWS[name]
        out = {}
        for sfdir in (SF01, target):
            force(q[name](spark, sfdir))  # warmup
            release_tracked()
            spark.catalog.clearCache()
            best = None
            for _ in range(reps):
                t = time.perf_counter()
                force(q[name](spark, sfdir))
                took = time.perf_counter() - t
                best = took if best is None else min(best, took)
                release_tracked()
                spark.catalog.clearCache()
            out[sfdir] = round(best, 3)
        r = out[target] / out[SF01]
        decades = 2.0 if target == D_100 else 1.0
        print(json.dumps({
            "row": name, "sf0.1_sec": out[SF01],
            "deriv_sec": out[target], "ratio": round(r, 2),
            "exponent": round(math.log10(r) / decades, 2),
            "deriv": target,
            "loadavg": round(os.getloadavg()[0], 1),
        }), flush=True)
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--build", action="store_true")
    ap.add_argument("--rows", nargs="*", default=list(ROWS))
    ap.add_argument("--deriv", default=None,
                    help="override the 10x dir (e.g. the verbatim-"
                         "embeddings control or the 100x second decade)")
    ap.add_argument("--reps", type=int, default=2,
                    help="measured reps per (row, scale) after the one "
                         "warmup (min is reported); --reps 1 bounds the "
                         "wall clock of multi-minute 100x journey runs")
    args = ap.parse_args()
    if args.build:
        build_derivatives()
    else:
        measure(args.rows, deriv=args.deriv, reps=args.reps)

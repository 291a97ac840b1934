"""BM25 keyword retrieval [EXT] — exact, oracle-twinned top-k text
search over the corpus.

No reference counterpart (SURVEY.md §2.11); a training-data pipeline
uses keyword retrieval for targeted corpus audits (find the documents
that mention X), hard-negative mining, and quality spot checks — and it
is the classic inverted-index workload, so it belongs in the engine's
text tier next to tf·idf.

Scoring is the standard Lucene-style BM25 (Robertson et al.;
``idf = ln((N - df + 0.5)/(df + 0.5) + 1)``,
``tf·(k1+1)/(tf + k1·(1 - b + b·dl/avgdl))``).

Scale shape:
- the token stream is filtered to the query terms AT THE SCAN (an
  ``isin`` over the broadcast term list), so the tf shuffle carries only
  posting-list rows — ∝ matched occurrences, never corpus tokens;
- doc lengths are a scan-local projection; N and avgdl are one global
  aggregate (2 bigints) cross-joined back (broadcast);
- df/idf live on a terms-sized frame, broadcast into the contribution
  join;
- per-(query, doc) scores sum a handful of per-term contributions —
  each contribution is QUANTIZED to an exact integer
  (``floor(x·1e6 + 0.5)`` → bigint, the repo's established
  order-independence idiom) before the sum, so the score is bit-stable
  at any parallelism and reproduces exactly in the DuckDB oracle
  (a raw double sum would be partition-order-dependent);
- top-k per query is a bounded window with (score desc, doc_id) total
  order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count, tokenize

BM25_K1 = 1.2
BM25_B = 0.75
BM25_SCALE = 1_000_000


def _query_terms(spark, queries: list[tuple[int, list[str]]]):
    """(qterms frame, sorted distinct term list) — ONE definition of the
    per-query term dedup and the (query_id, tok) schema, shared by both
    rankers so the ensemble (and the shared ``term_tf`` precondition)
    can never drift on term normalization."""
    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in dict.fromkeys(terms)],
        "query_id bigint, tok string",
    )
    all_terms = sorted({t for _, terms in queries for t in terms})
    return qterms, all_terms


def term_tf(
    docs: DataFrame,
    all_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, tok, tf) posting-list frame for the given term list —
    the token stream is filtered to the terms AT THE SCAN, so the
    aggregate shuffles only posting rows. One definition shared by
    :func:`bm25_topk` and :func:`tf_topk`: an ensemble that ranks with
    both (see ``rrf_fuse``) builds this ONCE, persists it, and passes
    it to each ranker — one corpus tokenize pass instead of two."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokenize(text_col)).alias("tok")
        )
        .filter(F.col("tok").isin(all_terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = BM25_K1,
    b: float = BM25_B,
    tf: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` documents per keyword query.

    ``queries``: (query_id, [terms...]) — terms are matched against the
    shared ``\\w+``-lowercase tokenizer's output. Returns
    (query_id, doc_id, score, rank); ``score`` is the quantized-sum BM25
    value (6-decimal resolution). ``tf`` may carry a precomputed
    :func:`term_tf` frame over EXACTLY this query set's terms (the
    ensemble-sharing path); when omitted it is derived (and persisted)
    here."""
    qterms, all_terms = _query_terms(docs.sparkSession, queries)

    from ..cache import tracked_persist

    # persisted: the stats aggregate AND the contribution join both read
    # the per-doc lengths — one tokenization pass, not two
    lengths = tracked_persist(
        docs.select(F.col(id_col).alias("doc_id"), token_count(text_col).alias("dl"))
    )
    stats = lengths.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("dl").cast("bigint").alias("sum_dl"),
    )
    # persisted: BOTH df (per-term doc counts) and the contribution join
    # consume the posting lists — without the persist the corpus token
    # stream is exploded and filtered twice (released by the harness via
    # cache.release_tracked)
    if tf is None:
        tf = tracked_persist(term_tf(docs, all_terms, id_col, text_col))
    df_t = tf.groupBy("tok").agg(F.count("*").cast("bigint").alias("df"))
    return _bm25_score(tf, lengths, stats, df_t, qterms, k, k1, b)


def _bm25_score(
    tf: DataFrame,
    lengths: DataFrame,
    stats: DataFrame,
    df_t: DataFrame,
    qterms: DataFrame,
    k: int,
    k1: float,
    b: float,
) -> DataFrame:
    """The ONE BM25 scoring core behind the recompute form
    (:func:`bm25_topk`) and the standing-index form
    (:class:`Bm25Index`.search): identical expression tree, identical
    integer quantization, identical tiebreaks, so both share the DuckDB
    oracle. Inputs: (doc_id, tok, tf) postings restricted to the query
    terms, (doc_id, dl) lengths, a 1-row (n_docs, sum_dl) stats frame,
    (tok, df) per-term doc counts, and the (query_id, tok) map."""
    contrib = (
        tf.join(lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
        .join(F.broadcast(df_t), "tok")
        .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
                + F.lit(1.0)
            ),
        )
        .withColumn(
            "c",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        # exact-integer quantization BEFORE the per-query sum: bigint
        # addition is associative where double addition is not
        .withColumn(
            "ci", F.floor(F.col("c") * BM25_SCALE + F.lit(0.5)).cast("bigint")
        )
    )
    scored = (
        contrib.join(F.broadcast(qterms), "tok")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("ci").alias("score_q"))
        .withColumn("score", F.col("score_q") / F.lit(float(BM25_SCALE)))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_q"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "score",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def bm25_oracle_sql(
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
    where: str | None = None,
    max_df_share: float | None = None,
) -> str:
    """DuckDB twin of :func:`bm25_topk` — same tokenizer, same idf/tf
    expression tree, same integer quantization, same tiebreaks.
    ``where`` narrows the corpus (the takedown oracle: BM25 over the
    pruned corpus IS the live-view contract — every corpus-global
    statistic recomputed over the survivors). ``max_df_share`` mirrors
    :meth:`Bm25Index.search`'s stopword pruning: terms with
    ``df > max_df_share·N`` contribute nothing. The share literal is
    CAST to DOUBLE (the ``k1+1`` hazard below — a bare ``0.3`` types
    as DECIMAL in DuckDB, making the cap predicate exact-decimal where
    Spark compares in IEEE doubles; ADVICE r9): with both sides double
    and the bigint operands exactly representable, the predicate
    evaluates identically on both engines for any share value, not
    just dyadic ones.

    The ``k1+1`` factor is CAST to DOUBLE: a bare ``2.2`` literal types
    as DECIMAL(2,1) in DuckDB, making ``tf·(k1+1)`` exact decimal where
    Spark computes ``bigint·double`` (``3·2.2`` differs in the last bit)
    — a latent quantization-boundary parity flake. Ratios are safe
    as-is: DuckDB DECIMAL÷DECIMAL promotes to DOUBLE over exactly
    representable x.5 operands, matching Spark's double division."""
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in queries
        for t in dict.fromkeys(terms)
    )
    terms = sorted({t for _, ts in queries for t in ts})
    termlist = ", ".join(f"'{t}'" for t in terms)
    src = f"(SELECT * FROM documents WHERE {where})" if where else "documents"
    cap = (
        f"WHERE df_t.df <= CAST({max_df_share!r} AS DOUBLE) * s.n_docs"
        if max_df_share is not None
        else ""
    )
    return rf"""
        WITH lengths AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS dl
            FROM {src}),
        stats AS (
            SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(dl) AS BIGINT) AS sum_dl
            FROM lengths),
        tf AS (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id,
                         unnest(regexp_extract_all(lower(text), '\w+')) AS tok
                  FROM {src})
            WHERE tok IN ({termlist})
            GROUP BY doc_id, tok),
        df_t AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok),
        contrib AS (
            SELECT tf.doc_id, tf.tok,
                   CAST(floor(
                       ln((s.n_docs - df_t.df + 0.5) / (df_t.df + 0.5) + 1.0)
                       * (tf.tf * CAST({k1 + 1.0!r} AS DOUBLE))
                       / (tf.tf + {k1!r} * ({1.0 - b!r} + {b!r} * l.dl
                                            / (s.sum_dl / CAST(s.n_docs AS DOUBLE))))
                       * {BM25_SCALE} + 0.5) AS BIGINT) AS ci
            FROM tf
            JOIN lengths l ON tf.doc_id = l.doc_id
            CROSS JOIN stats s
            JOIN df_t ON tf.tok = df_t.tok
            {cap}),
        qterms(query_id, tok) AS (VALUES {qvals}),
        scored AS (
            SELECT q.query_id, c.doc_id, sum(c.ci) AS score_q
            FROM contrib c JOIN qterms q ON c.tok = q.tok
            GROUP BY q.query_id, c.doc_id),
        ranked AS (
            SELECT CAST(query_id AS BIGINT) AS query_id, doc_id,
                   score_q / {float(BM25_SCALE)!r} AS score,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score_q DESC, doc_id) AS BIGINT) AS rank
            FROM scored)
        SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= {k}
    """


class Bm25Index:
    """Catalog-persisted BM25 inverted index — the standing-state form of
    :func:`bm25_topk`, completing the serving triple with
    :class:`~.similarity.IvfIndex` (dense) and
    :class:`~.dedup.NearDupIndex` (lexical dedup). The recompute form
    re-tokenizes the corpus per query batch (the oracle convenience); at
    100 TB the tokenize+aggregate IS the job, so the index pays it once:

    - ``{name}__postings``: (tok, doc_id, tf) — BUCKETED on tok, so a
      query-term lookup bucket-prunes the scan (Spark prunes buckets on
      ``isin`` filters over the bucket column) and the per-term df/qterm
      joins read pre-partitioned postings;
    - ``{name}__df``: (tok, df) per-term document counts — precomputed,
      BUCKETED on tok; search broadcasts only the query-terms slice;
    - ``{name}__lengths``: (doc_id, dl) — BUCKETED on doc_id, the
      contribution join's key;
    - ``{name}__stats``: ONE row (n_docs, sum_dl).

    Search math is :func:`_bm25_score` — the same expression tree,
    integer quantization, and tiebreaks as the recompute form, so the
    stored-index path shares its DuckDB oracle verbatim.

    Takedown (:meth:`delete`/:meth:`vacuum`) shares the other two
    indexes' tombstone tier (``operators/tombstones.py``) with one
    BM25-specific wrinkle: scores depend on CORPUS-GLOBAL statistics
    (df, N, avgdl), so hiding a document's postings while serving the
    PRECOMPUTED df/stats tables would mis-weight every query. The
    resolution: while tombstones are outstanding, :meth:`search`
    recomputes df from the live, query-term-filtered postings (the
    frame it already scans — a bounded extra aggregate) and N/avgdl
    from one aggregate over the live lengths table (a 2-column bucketed
    scan) — EXACT at all times, with zero multi-table crash window
    (delete is one atomic append, same as the other indexes).
    :meth:`vacuum` rewrites the state tables and restores the
    precomputed fast path. Degraded-but-exact until vacuum is the
    honest trade at 100 TB: a takedown of 100 ids must not rewrite a
    corpus-sized postings table eagerly."""

    def __init__(
        self,
        catalog,
        name: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        k1: float = BM25_K1,
        b: float = BM25_B,
        num_buckets: int = 32,
    ):
        self.catalog = catalog
        self.name = name
        self.id_col = id_col
        self.text_col = text_col
        self.k1 = k1
        self.b = b
        self.num_buckets = num_buckets

    @property
    def postings_table(self) -> str:
        return f"{self.name}__postings"

    @property
    def df_table(self) -> str:
        return f"{self.name}__df"

    @property
    def lengths_table(self) -> str:
        return f"{self.name}__lengths"

    @property
    def stats_table(self) -> str:
        return f"{self.name}__stats"

    @property
    def tombstones_table(self) -> str:
        from .tombstones import tombstones_table

        return tombstones_table(self.name)

    @property
    def reports_table(self) -> str:
        return f"{self.name}__reports"

    @property
    def epochs_table(self) -> str:
        return f"{self.name}__epochs"

    def build(self, docs: DataFrame) -> None:
        """ONE corpus tokenize pass feeds all four tables: the exploded
        token stream is persisted, aggregated to postings (the full
        inverted index — every term, not a query's slice), then df and
        lengths derive from it without re-reading the corpus."""
        from ..cache import tracked_persist, untrack
        from .tombstones import drop_tombstones

        toks = tracked_persist(
            docs.select(
                F.col(self.id_col).alias("doc_id"),
                F.explode(tokenize(self.text_col)).alias("tok"),
            )
        )
        try:
            postings = toks.groupBy("tok", "doc_id").agg(
                F.count("*").cast("bigint").alias("tf")
            )
            self.catalog.put_bucketed(
                postings, self.postings_table, "tok", self.num_buckets
            )
            stored = self.catalog.get_bucketed(self.postings_table)
            # lengths from the STORED postings (bucketed scan, no second
            # corpus tokenize); zero-token docs have no postings rows
            # but DO count toward N and avgdl — the recompute form's
            # lengths come from the corpus itself, so the index's must
            lengths = stored.groupBy("doc_id").agg(
                F.sum("tf").cast("bigint").alias("dl")
            )
            all_lengths = (
                docs.select(F.col(self.id_col).alias("doc_id"))
                .join(lengths, "doc_id", "left")
                .select(
                    "doc_id",
                    F.coalesce("dl", F.lit(0).cast("bigint")).alias("dl"),
                )
            )
            self.catalog.put_bucketed(
                all_lengths, self.lengths_table, "doc_id", self.num_buckets
            )
            self._rederive_stats()
            # a (re)build REPLACES the index state — drop stale
            # tombstones LAST (the IvfIndex.build ordering argument: a
            # crash mid-build can only leave extra ids hidden, never a
            # deleted id resurrected)
            drop_tombstones(self.catalog, self.name)
        finally:
            untrack(toks)

    def search(
        self,
        queries: list[tuple[int, list[str]]],
        k: int = 10,
        max_df_share: float | None = None,
    ) -> DataFrame:
        """Top-``k`` documents per keyword query against the standing
        index — the serving path: postings and df are FILTERED to the
        query terms at the scan (bucket-prunable on the tok-bucketed
        tables), stats is one broadcast row, and only query-sized frames
        shuffle. Bit-identical to :func:`bm25_topk` over the same
        corpus (shared scoring core ⇒ shared oracle).

        ``max_df_share`` is query-time stopword pruning — the serving
        lever :meth:`term_stats` motivates: a term whose posting list
        spans ``> max_df_share·N`` documents is dropped from scoring
        entirely. In the steady state the decision comes from the
        PRECOMPUTED df table (a bucket-pruned, query-terms-sized read)
        plus the one-row stats table, BEFORE the postings scan — so the
        stopword-class posting lists, exactly the lists that dominate
        BM25 serving cost at 100 TB, are never read (their terms leave
        the scan's ``isin``). A query all of whose terms are pruned
        returns no rows (inner-join semantics, mirrored by the oracle).
        The two driver-side reads this costs are bounded: |query terms|
        df rows + one stats row. Semantics are a pure function of the
        live corpus — ``bm25_oracle_sql(..., max_df_share=)`` is the
        DuckDB twin — not of index layout, so a fresh build scores
        identically.

        With tombstones outstanding (takedown awaiting :meth:`vacuum`)
        the read degrades but stays EXACT: postings and lengths are
        anti-joined against the broadcast tombstone set (no Exchange
        added above the bucketed scans), df is re-aggregated from the
        live query-term postings (the frame this query already scans),
        and N/avgdl from one aggregate over the live lengths — every
        corpus-global statistic reflects the pruned corpus, so the
        result is bit-identical to a fresh build without the deleted
        docs. The df cap, too, is judged on LIVE df/N in this path
        (deletes can move a term across the cap in either direction —
        df falls with each deleted occurrence, N with every deleted
        doc); the cap filter rides the already-computed live df frame,
        so no scan-avoidance is possible (live df IS the scan) and none
        is claimed. With no tombstone table (the steady state) this is
        the plan-identical precomputed fast path."""
        spark = self.catalog.spark
        from .tombstones import read_tombstones

        qterms, all_terms = _query_terms(spark, queries)
        lengths = self.catalog.get_bucketed(self.lengths_table)
        ts = read_tombstones(self.catalog, self.name)
        if ts is None:
            df_t = self.catalog.get_bucketed(self.df_table).filter(
                F.col("tok").isin(all_terms)
            )
            stats = self.catalog.get(self.stats_table)
            if max_df_share is not None:
                # bounded driver-side reads (|query terms| + 1 rows)
                # buy the real prize: pruned terms never reach the
                # postings scan's isin, so their lists are never read
                n_docs = stats.select("n_docs").head()[0]
                all_terms = sorted(
                    r["tok"]
                    for r in df_t.filter(
                        F.col("df") <= max_df_share * n_docs
                    )
                    .select("tok")
                    .collect()
                )
                if not all_terms:
                    return spark.createDataFrame(
                        [],
                        "query_id bigint, doc_id bigint, "
                        "score double, rank bigint",
                    )
                # re-read df with the survivors only (not a filter
                # stacked on the decision frame): otherwise Catalyst
                # infers the ORIGINAL term list across the scoring join
                # and the pruned terms reappear in the postings scan's
                # pushed filters
                df_t = self.catalog.get_bucketed(self.df_table).filter(
                    F.col("tok").isin(all_terms)
                )
            tf = self.catalog.get_bucketed(self.postings_table).filter(
                F.col("tok").isin(all_terms)
            )
        else:
            tf = self.catalog.get_bucketed(self.postings_table).filter(
                F.col("tok").isin(all_terms)
            )
            dead = F.broadcast(ts.select(F.col("id").alias("doc_id")))
            tf = tf.join(dead, "doc_id", "left_anti")
            lengths = lengths.join(dead, "doc_id", "left_anti")
            # the stored df/stats count tombstoned docs — recompute both
            # from the live view (df over the already-filtered postings
            # frame; stats is one 2-column aggregate) so scores stay
            # exact between delete and vacuum
            df_t = tf.groupBy("tok").agg(
                F.count("*").cast("bigint").alias("df")
            )
            stats = lengths.agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("dl").cast("bigint").alias("sum_dl"),
            )
            if max_df_share is not None:
                df_t = (
                    df_t.crossJoin(F.broadcast(stats))
                    .filter(F.col("df") <= max_df_share * F.col("n_docs"))
                    .select("tok", "df")
                )
        return _bm25_score(tf, lengths, stats, df_t, qterms, k, self.k1, self.b)

    def delete(self, ids) -> int:
        """Tombstone ``ids`` — the takedown path, same O(|ids|) single
        atomic append as the other two standing indexes. From the moment
        it commits, :meth:`search` behaves as if the docs were never
        admitted (live postings/lengths + recomputed-exact df/N/avgdl —
        see :meth:`search`); a tombstoned id cannot be re-admitted until
        :meth:`vacuum` (ingest refuses). Returns how many ids were newly
        tombstoned."""
        from .tombstones import append_tombstones

        return append_tombstones(self.catalog, self.name, ids)

    def vacuum(self) -> int:
        """Physically purge tombstoned documents: rewrite postings and
        lengths without them (layout-preserving bucketed overwrites),
        re-derive df/stats from the purged tables (restoring the
        precomputed fast path), then drop the tombstone table LAST —
        every crash prefix leaves the tombstones in force, so
        :meth:`search`'s live view keeps every read exact and a retry
        heals. Returns the number of tombstoned ids purged."""
        from .tombstones import drop_tombstones, read_tombstones

        ts = read_tombstones(self.catalog, self.name)
        if ts is None:
            return 0
        n = ts.count()
        dead = F.broadcast(ts.select(F.col("id").alias("doc_id")))
        post = (
            self.catalog.get_bucketed(self.postings_table)
            .join(dead, "doc_id", "left_anti")
            .localCheckpoint()
        )
        lens = (
            self.catalog.get_bucketed(self.lengths_table)
            .join(dead, "doc_id", "left_anti")
            .localCheckpoint()
        )
        self.catalog.put_bucketed(
            post, self.postings_table, "tok", self.num_buckets
        )
        self.catalog.put_bucketed(
            lens, self.lengths_table, "doc_id", self.num_buckets
        )
        self._rederive_stats()
        drop_tombstones(self.catalog, self.name)
        return n

    def compact(self) -> dict[str, int]:
        """Compact the two append-heavy state tables back to ~one file
        per bucket (layout-preserving ``Catalog.compact_bucketed``) —
        the sparse-retrieval twin of the other indexes' ``compact``.
        df is overwritten whole by every stats re-derive and stats is
        one row, so neither fragments. Returns {table: new_file_count}."""
        return {
            self.postings_table: self.catalog.compact_bucketed(
                self.postings_table, "tok", self.num_buckets
            ),
            self.lengths_table: self.catalog.compact_bucketed(
                self.lengths_table, "doc_id", self.num_buckets
            ),
        }

    def term_stats(self, top_n: int = 20) -> DataFrame:
        """Posting-list skew report — the inverted index's health signal,
        completing the observability triple (``IvfIndex.cluster_stats``
        for quantizer drift, ``NearDupIndex.bucket_stats`` for band
        buckets). Because postings hold one row per (tok, doc_id), a
        term's posting-ROW count IS its df, so the hottest terms by df
        are exactly the terms whose posting lists dominate every scan
        that touches them — the stopword-class cost driver of a BM25
        index at 100 TB.

        Returns the ``top_n`` hottest terms as a BOUNDED frame:
        (tok, df, share, skew, rank) where ``share`` = df / total
        posting rows and ``skew`` = df × n_terms / total (1.0 = the mean
        posting list; the ``cluster_stats`` convention). Top-n is a
        ``TakeOrderedAndProject`` over the terms-sized df frame —
        distributed, never a global single-task sort — and the rank
        window runs on the ``top_n`` survivors only. Counts are LIVE:
        with tombstones outstanding, df re-aggregates from the live
        postings (the same degraded-but-exact trade as :meth:`search`);
        the steady state reads the precomputed df table."""
        from .tombstones import read_tombstones

        ts = read_tombstones(self.catalog, self.name)
        if ts is None:
            df_t = self.catalog.get_bucketed(self.df_table)
        else:
            dead = F.broadcast(ts.select(F.col("id").alias("doc_id")))
            df_t = (
                self.catalog.get_bucketed(self.postings_table)
                .join(dead, "doc_id", "left_anti")
                .groupBy("tok")
                .agg(F.count("*").cast("bigint").alias("df"))
            )
        tot = df_t.agg(
            F.sum("df").cast("bigint").alias("total"),
            F.count("*").cast("bigint").alias("n_terms"),
        )
        top = (
            df_t.crossJoin(F.broadcast(tot))
            .orderBy(F.desc("df"), "tok")
            .limit(top_n)
        )
        w = Window.orderBy(F.desc("df"), "tok")
        return (
            top.withColumn("rank", F.row_number().over(w))
            .select(
                "tok",
                "df",
                # single IEEE divisions of exact integers — bit-stable
                # across engines (the cluster_stats share/skew idiom)
                (F.col("df").cast("double") / F.col("total")).alias("share"),
                (
                    F.col("df").cast("double")
                    * F.col("n_terms")
                    / F.col("total")
                ).alias("skew"),
                F.col("rank").cast("bigint").alias("rank"),
            )
        )

    def maintain(
        self,
        max_tombstone_share: float = 0.2,
        max_files_per_bucket: int = 8,
        max_hot_term_share: float = 0.2,
        hot_terms_n: int = 10,
    ) -> dict:
        """The closed maintenance loop — the sparse-retrieval member of
        the triple (``IvfIndex.maintain`` / ``NearDupIndex.maintain``),
        with the signals that apply to an inverted index (no quantizer
        to drift, no banding semantics to re-tune):

        1. **Hot-term mass** (report-only): the share of posting rows
           held by the ``hot_terms_n`` hottest terms
           (:meth:`term_stats`) above ``max_hot_term_share`` is
           REPORTED as ``stopword_pruning_recommended=True`` but never
           auto-fixed — dropping stopword postings changes every BM25
           score (idf re-weighting), a human decision, exactly the
           ``reband_recommended`` judgment call on the lexical index.
        2. **Tombstone debt**: |tombstones| > ``max_tombstone_share`` ×
           |live docs| → :meth:`vacuum`. Extra urgency here vs the other
           indexes: between delete and vacuum every search pays the
           recomputed-stats path (one live-lengths aggregate per query),
           so vacuum also restores the precomputed fast path. Vacuum
           rewrites both state tables, so check 3 is moot after it.
        3. **File fragmentation**: either state table holding more than
           ``max_files_per_bucket`` × ``num_buckets`` files →
           :meth:`compact`.

        All signals are bounded (a top-n report, two count jobs,
        driver-side file listings). Returns the report dict."""
        from .tombstones import live, read_tombstones

        hot = self.term_stats(top_n=hot_terms_n).collect()  # bounded
        hot_share = sum(r.share for r in hot)
        report: dict = {
            "action": "none",
            "hot_term_share": hot_share,
            "stopword_pruning_recommended": hot_share > max_hot_term_share,
            "tombstone_share": 0.0,
            "max_files_per_bucket": 0.0,
        }
        ts = read_tombstones(self.catalog, self.name)
        if ts is not None:
            n_dead = ts.count()
            n_live = live(
                self.catalog,
                self.name,
                self.catalog.get_bucketed(self.lengths_table),
                "doc_id",
            ).count()
            share = n_dead / n_live if n_live > 0 else float(n_dead > 0)
            report["tombstone_share"] = share
            if share > max_tombstone_share:
                self.vacuum()
                report["action"] = "vacuum"
                return report
        files = max(
            self.catalog.file_count(t) / self.num_buckets
            for t in (self.postings_table, self.lengths_table)
        )
        report["max_files_per_bucket"] = files
        if files > max_files_per_bucket:
            self.compact()
            report["action"] = "compact"
        return report

    def ingest(self, docs: DataFrame) -> int:
        """Admit new documents into the standing inverted index — the
        sparse-retrieval twin of the dedup/ANN indexes' ``ingest``
        (all three standing indexes now share the build/search/ingest
        surface). Returns how many documents were newly admitted.

        Steps, in crash-safety order:

        1. **postings append** — the batch's (tok, doc_id, tf) rows,
           anti-joined against doc_ids PHYSICALLY PRESENT IN THE
           POSTINGS TABLE (broadcast semi-probe restricted to batch
           ids first, the NearDupIndex per-table idiom). Each append
           gates on ITS OWN table (ADVICE r8): gating both appends on
           one lengths-derived set would let a crash between the two
           appends re-append the doc's postings on retry — permanently
           double-counting its tf and df in every subsequent search.
        2. **lengths append** — anti-joined against the LENGTHS table's
           own doc_ids; zero-token docs get their explicit dl=0 row
           (they carry no postings, so lengths is the ADMISSION record
           — which is why ``n_new`` below counts lengths-fresh docs).
        3. **df/stats re-derive** — OVERWRITTEN from the stored
           postings/lengths. Deliberately NOT a delta-merge: add-based
           merges double-count under crash-retry (append succeeded,
           merge crashed, retry re-adds), while re-derivation is
           idempotent under ANY prefix of this sequence. The df
           aggregate reads the tok-bucketed postings pre-partitioned —
           a columnar scan with NO Exchange, not a corpus shuffle —
           and a crash between 2 and 3 leaves df/stats STALE but
           consistent (scores use the pre-ingest corpus statistics;
           the retry heals them), never mixed.

        Unlike the dedup indexes there is no admission GATE here — a
        retrieval corpus admits everything; dedup belongs to the
        NearDupIndex/IvfIndex tier. Re-ingesting an already-admitted
        doc_id is a no-op (the anti-joins); a TOMBSTONED doc_id is
        refused (tombstone wins until vacuum — see
        ``operators/tombstones.py``); ingest composes with the
        marker-last epoch protocol when driven from a stream
        (:meth:`ingest_stream`)."""
        from ..cache import tracked_persist, untrack
        from .tombstones import refuse_tombstoned

        batch_ids = docs.select(
            F.col(self.id_col).alias("doc_id")
        ).distinct()
        refuse_tombstoned(self.catalog, self.name, batch_ids)
        proj = tracked_persist(
            docs.select(
                F.col(self.id_col).alias("doc_id"), F.col(self.text_col)
            )
        )
        try:
            have_len = (
                self.catalog.get_bucketed(self.lengths_table)
                .join(F.broadcast(batch_ids), "doc_id", "left_semi")
                .select("doc_id")
            )
            fresh_len = proj.join(F.broadcast(have_len), "doc_id", "left_anti")
            n_new = fresh_len.count()
            if n_new:
                have_post = (
                    self.catalog.get_bucketed(self.postings_table)
                    .join(F.broadcast(batch_ids), "doc_id", "left_semi")
                    .select("doc_id")
                    .distinct()
                )
                fresh_post = proj.join(
                    F.broadcast(have_post), "doc_id", "left_anti"
                )
                toks = fresh_post.select(
                    "doc_id", F.explode(tokenize(self.text_col)).alias("tok")
                )
                postings = toks.groupBy("tok", "doc_id").agg(
                    F.count("*").cast("bigint").alias("tf")
                )
                self.catalog.append_bucketed(
                    postings, self.postings_table, "tok", self.num_buckets
                )
                lengths = fresh_len.select(
                    "doc_id", token_count(self.text_col).alias("dl")
                )
                self.catalog.append_bucketed(
                    lengths, self.lengths_table, "doc_id", self.num_buckets
                )
            # re-derive even when nothing appended: the n_new == 0 case
            # INCLUDES the crash-retry whose appends landed but whose
            # stats pass didn't — skipping here would leave df/stats
            # stale forever (caught by the crash-heal test). A true
            # no-op ingest pays one bucketed postings scan for it.
            self._rederive_stats()
            return n_new
        finally:
            untrack(proj)

    def ingest_stream(
        self,
        stream_df: DataFrame,
        checkpoint_dir: str,
        maintain_every: int = 0,
        maintain_kwargs: dict | None = None,
    ) -> None:
        """Continuous inverted-index maintenance: drain a streaming
        document source through :meth:`ingest` one micro-batch at a time
        under the marker-last epoch-commit protocol shared by all three
        standing indexes (see :mod:`..streaming.ingest`). :meth:`ingest`
        satisfies the protocol's ``ingest_fn`` contract — per-table
        anti-join healing, idempotent df/stats re-derivation — so a
        replayed epoch converges to the crash-free state.

        The per-epoch report is the batch's admission record
        (doc_id, dl): there is no dedup gate here, so the report is a
        pure function of the batch itself — a crash-replayed epoch
        re-derives it bit-identically regardless of how much state the
        first attempt persisted (protocol point 4's re-derivation
        requirement, trivially satisfied). ``maintain_every=N`` runs
        :meth:`maintain` after every Nth committed epoch."""
        from ..streaming.ingest import run_epoch_idempotent_ingest

        def _ingest_fn(batch: DataFrame) -> DataFrame:
            self.ingest(batch)
            return batch.select(
                F.col(self.id_col).alias("doc_id"),
                token_count(self.text_col).alias("dl"),
            )

        run_epoch_idempotent_ingest(
            stream_df,
            checkpoint_dir,
            self.catalog,
            self.reports_table,
            self.epochs_table,
            _ingest_fn,
            maintain_fn=lambda: self.maintain(**(maintain_kwargs or {})),
            maintain_every=maintain_every,
        )

    def _rederive_stats(self) -> None:
        """Rebuild df and stats from the STORED postings/lengths —
        idempotent (safe under any crash-retry), and the df groupBy
        reads the tok-bucketed postings with no Exchange above the
        scan. Eagerly localCheckpoint-ed before the overwrite: the df
        frame reads the very table it replaces (use ``checkpoint`` on a
        cluster for executor-loss durability)."""
        df_new = (
            self.catalog.get_bucketed(self.postings_table)
            .groupBy("tok")
            .agg(F.count("*").cast("bigint").alias("df"))
            .localCheckpoint()
        )
        self.catalog.put_bucketed(df_new, self.df_table, "tok", self.num_buckets)
        self.catalog.put(
            self.catalog.get_bucketed(self.lengths_table).agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("dl").cast("bigint").alias("sum_dl"),
            ),
            self.stats_table,
        )


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion + hard-negative mining
# ---------------------------------------------------------------------------

RRF_K = 60  # Cormack et al. SIGIR'09 smoothing constant


def rrf_fuse(
    run_a: DataFrame, run_b: DataFrame, k: int = 10, k_rrf: int = RRF_K
) -> DataFrame:
    """Reciprocal-rank fusion of two retriever result sets — the
    standard hybrid-search merge of a RAG / retrieval pipeline
    (canonically dense ANN + keyword BM25; any two ranked runs fuse the
    same way — the operator is retriever-agnostic).

    Inputs carry (query_id, doc_id, rank); ranks are 1-based within
    query. ``rrf = Σ 1/(k_rrf + rank)`` over the lists that retrieved
    the doc. Returns (query_id, doc_id, rank_a, rank_b,
    rrf_score, fused_rank ≤ k); a list that missed the doc reports
    rank 0 and contributes nothing.

    Scale shape: both inputs are already top-k-bounded (|queries|·k
    rows), so the full-outer merge join and the per-query ranking window
    are bounded regardless of corpus size — fusion cost never touches
    the corpus.

    Determinism: each 1/(k_rrf + rank) is ONE correctly-rounded IEEE
    division of exact integers, and the two-retriever sum is ONE
    commutative double add — bit-identical in any engine and at any
    parallelism (no quantization needed; contrast the BM25 sum above,
    whose addend COUNT is unbounded). Ties (e.g. rank-i-dense-only vs
    rank-i-sparse-only) break on doc_id.
    """
    d = run_a.select("query_id", "doc_id", F.col("rank").alias("rank_a"))
    s = run_b.select("query_id", "doc_id", F.col("rank").alias("rank_b"))
    fused = (
        d.join(s, ["query_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf_score",
            F.coalesce(
                F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_a")), F.lit(0.0)
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(k_rrf) + F.col("rank_b")), F.lit(0.0)
            ),
        )
        .withColumn("rank_a", F.coalesce("rank_a", F.lit(0).cast("bigint")))
        .withColumn("rank_b", F.coalesce("rank_b", F.lit(0).cast("bigint")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select(
            "query_id",
            "doc_id",
            "rank_a",
            "rank_b",
            "rrf_score",
            F.col("fused_rank").cast("bigint").alias("fused_rank"),
        )
    )


def hard_negatives(dense: DataFrame, sparse: DataFrame) -> DataFrame:
    """Semantically-near, lexically-unmatched candidates — the classic
    hard-negative mining step for contrastive/embedding training:
    documents the dense retriever ranks highly that the keyword
    retriever did NOT surface for the same query.

    ``dense``: (query_id, doc_id, score, rank); ``sparse``: (query_id,
    doc_id, ...). Returns the dense rows whose (query_id, doc_id) is
    absent from ``sparse``, dense order preserved. Both sides are
    top-k-bounded, so the anti-join is bounded — corpus-size-free.
    """
    return dense.join(
        sparse.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_anti"
    ).select("query_id", "doc_id", "score", "rank")


def rrf_fusion_oracle_sql(
    a_sql: str, b_sql: str, k: int = 10, k_rrf: int = RRF_K
) -> str:
    """DuckDB twin of :func:`rrf_fuse`, composed over the two
    retrievers' own oracle SQL (the same composition the Spark side
    performs over their DataFrames). ``a_sql`` must yield
    (query_id, doc_id, rank); ``b_sql`` likewise."""
    return f"""
        WITH run_a AS MATERIALIZED (SELECT * FROM ({a_sql})),
        run_b AS MATERIALIZED (SELECT * FROM ({b_sql})),
        fused AS (
            SELECT coalesce(d.query_id, s.query_id) AS query_id,
                   coalesce(d.doc_id, s.doc_id) AS doc_id,
                   coalesce(d.rank, 0) AS rank_a,
                   coalesce(s.rank, 0) AS rank_b,
                   coalesce(CAST(1 AS DOUBLE) / ({k_rrf} + d.rank), 0.0)
                     + coalesce(CAST(1 AS DOUBLE) / ({k_rrf} + s.rank), 0.0)
                       AS rrf_score
            FROM run_a d
            FULL OUTER JOIN run_b s
              ON d.query_id = s.query_id AND d.doc_id = s.doc_id),
        ranked AS (
            SELECT query_id, doc_id, rank_a, rank_b, rrf_score,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY rrf_score DESC, doc_id) AS BIGINT) AS fused_rank
            FROM fused)
        SELECT * FROM ranked WHERE fused_rank <= {k}
    """


def hard_negatives_oracle_sql(dense_sql: str, sparse_sql: str) -> str:
    """DuckDB twin of :func:`hard_negatives` (same anti-join over the
    two retrievers' oracle SQL)."""
    return f"""
        WITH dense AS MATERIALIZED (SELECT * FROM ({dense_sql})),
        sparse AS MATERIALIZED (SELECT * FROM ({sparse_sql}))
        SELECT d.query_id, d.doc_id, d.score, d.rank
        FROM dense d
        ANTI JOIN sparse s
          ON d.query_id = s.query_id AND d.doc_id = s.doc_id
    """


def tf_topk(
    docs: DataFrame,
    queries: list[tuple[int, list[str]]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    tf: DataFrame | None = None,
) -> DataFrame:
    """Raw term-frequency ranker: ``score = Σ_t tf(t, d)`` over the
    query's terms — the blunt lexical baseline an ensemble fuses with
    BM25 (their candidate sets coincide, their ORDERS disagree: tf has
    no idf damping or length normalization, so rank fusion has real
    work to do). Same scan-filtered posting-list shape as
    :func:`bm25_topk`; scores are exact integers, so no quantization is
    needed anywhere. Returns (query_id, doc_id, score, rank)."""
    qterms, all_terms = _query_terms(docs.sparkSession, queries)
    if tf is None:
        tf = term_tf(docs, all_terms, id_col, text_col)
    scored = (
        tf.join(F.broadcast(qterms), "tok")
        .groupBy("query_id", "doc_id")
        .agg(F.sum("tf").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "doc_id", "score", F.col("rank").cast("bigint").alias("rank")
        )
    )


def tf_topk_oracle_sql(queries: list[tuple[int, list[str]]], k: int = 10) -> str:
    """DuckDB twin of :func:`tf_topk`."""
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in queries
        for t in dict.fromkeys(terms)
    )
    terms = sorted({t for _, ts in queries for t in ts})
    termlist = ", ".join(f"'{t}'" for t in terms)
    return rf"""
        WITH tf AS (
            SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
            FROM (SELECT doc_id,
                         unnest(regexp_extract_all(lower(text), '\w+')) AS tok
                  FROM documents)
            WHERE tok IN ({termlist})
            GROUP BY doc_id, tok),
        qterms(query_id, tok) AS (VALUES {qvals}),
        scored AS (
            SELECT CAST(q.query_id AS BIGINT) AS query_id, tf.doc_id,
                   sum(tf.tf) AS score
            FROM tf JOIN qterms q ON tf.tok = q.tok
            GROUP BY q.query_id, tf.doc_id),
        ranked AS (
            SELECT query_id, doc_id, score,
                   CAST(row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY score DESC, doc_id) AS BIGINT) AS rank
            FROM scored)
        SELECT query_id, doc_id, score, rank FROM ranked WHERE rank <= {k}
    """

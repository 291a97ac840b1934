"""Overlapping token-window chunking [EXT] — the RAG ingestion step
(split every document into fixed-size, fixed-stride token windows for
embedding + retrieval; LangChain/LlamaIndex call it a "token splitter").

No reference counterpart (SURVEY.md §2.11): a retrieval pipeline over a
100 TB corpus chunks BEFORE embedding, and the chunk table (not the doc
table) is what the ANN tier indexes — this operator produces that table.

Scale shape: entirely **scan-local** — the window arithmetic, slicing,
and re-join are `transform`/`slice` over the bound token array; zero
shuffles, zero UDFs, output rows ∝ input tokens / stride. The chunk
count per doc is exact integer math (no float ceil): for n tokens,
``1 + floor((n - size + stride - 1) / stride)`` windows when n > size,
else one.

Tokenizer: ``functions.text.ws_tokens`` (whitespace, case-preserving) —
the exact-reassembly tokenizer span dedup uses, so a single-space rejoin
of a chunk reproduces the original text run. One definition shared with
the DuckDB oracle (``regexp_extract_all(text, '\\S+')``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import ws_tokens

CHUNK_TOKENS = 32
CHUNK_STRIDE = 16


def token_chunks(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Explode each document into overlapping token windows.

    Returns (doc_id, chunk_id, n_tokens, chunk_text): ``chunk_id`` is
    the 0-based window index, window *i* covers tokens
    ``[i·stride, i·stride + chunk_tokens)``; the last window may be
    short. Empty documents emit one empty chunk (chunk_id 0, n_tokens 0)
    so every doc appears in the chunk table.
    """
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    if stride > chunk_tokens:
        raise ValueError("stride > chunk_tokens would drop tokens between windows")
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        # NULL text tokenizes to a NULL array, which would NULL the
        # window arithmetic and silently DROP the doc at the explode —
        # breaking the every-doc-appears contract the ANN tier relies
        # on; treat it as empty text (one empty chunk) instead
        ws_tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("_toks"),
    ).withColumns(
        {
            "_n": F.size("_toks").cast("bigint"),
            # bigint DIV, never double division (the ADVICE-r4 chunk-math
            # fix class): floor(a/b) on a double quotient can round up
            # across the integer boundary
            "_nc": F.expr(
                f"CASE WHEN _n <= {chunk_tokens} THEN CAST(1 AS BIGINT) "
                f"ELSE 1 + (_n - {chunk_tokens} + {stride} - 1) DIV {stride} END"
            ),
        }
    )
    t = F.col("_toks")
    n = F.col("_n")
    w, s = F.lit(chunk_tokens), F.lit(stride)
    chunks = F.transform(
        F.sequence(F.lit(0), (F.col("_nc") - F.lit(1)).cast("int")),
        lambda i: F.struct(
            i.cast("bigint").alias("chunk_id"),
            F.greatest(
                F.lit(0), F.least(w, n - i * s)
            ).cast("bigint").alias("n_tokens"),
            F.concat_ws(" ", F.slice(t, i * s + F.lit(1), w)).alias("chunk_text"),
        ),
    )
    return toked.select("doc_id", F.explode(chunks).alias("c")).select(
        "doc_id", "c.chunk_id", "c.n_tokens", "c.chunk_text"
    )


def token_chunks_oracle_sql(
    chunk_tokens: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> str:
    """DuckDB twin of :func:`token_chunks` — same tokenizer, same
    integer window arithmetic, same inclusive 1-based slicing."""
    w, s = chunk_tokens, stride
    return rf"""
        WITH toks AS (
            SELECT doc_id,
                   regexp_extract_all(coalesce(text, '') , '\S+') AS t,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '\S+'))
                        AS BIGINT) AS n
            FROM documents),
        base AS (
            SELECT doc_id, t, n,
                   CASE WHEN n <= {w} THEN 1
                        ELSE 1 + (n - {w} + {s} - 1) // {s} END AS nc
            FROM toks)
        SELECT doc_id,
               CAST(i AS BIGINT) AS chunk_id,
               CAST(greatest(0, least({w}, n - i * {s})) AS BIGINT) AS n_tokens,
               array_to_string(t[i * {s} + 1 : i * {s} + {w}], ' ') AS chunk_text
        FROM (SELECT doc_id, t, n, unnest(range(0, nc)) AS i FROM base)
    """


# chunk-id packing: cid = doc_id * CHUNK_ID_SPAN + chunk_id. A 32/16
# window layout yields ~n_tokens/16 chunks per doc, so one million chunk
# slots per doc is ~16M tokens per document of headroom — far beyond any
# real document — while doc_id ≤ ~9.2e12 stays exact in a signed BIGINT.
CHUNK_ID_SPAN = 1_000_000
CHUNK_EMB_DIMS = 8


def chunk_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    dims: int = CHUNK_EMB_DIMS,
) -> DataFrame:
    """The chunk-level embedding table the ANN tier indexes (the table
    this module's header promises): every document's overlapping token
    windows (:func:`token_chunks`), each with a packed BIGINT chunk id
    and a deterministic md5-derived pseudo-embedding
    (``functions.hashes.md5_slice_embedding`` — a learned encoder slots
    into the same column contract; the hash form keeps the whole
    pipeline oracle-twinnable). Entirely scan-local: windowing is
    ``transform``/``slice`` over the bound token array, the embedding is
    one md5 per chunk — zero shuffles, zero UDFs.

    Returns (vec_id, doc_id, chunk_id, embedding) keyed for
    :class:`~.similarity.IvfIndex` (id column ``vec_id``, vector column
    ``embedding``).
    """
    from ..functions.hashes import md5_slice_embedding

    chunks = token_chunks(
        docs, id_col=id_col, text_col=text_col,
        chunk_tokens=chunk_tokens, stride=stride,
    )
    return chunks.select(
        (F.col("doc_id") * F.lit(CHUNK_ID_SPAN) + F.col("chunk_id")).alias(
            "vec_id"
        ),
        "doc_id",
        "chunk_id",
        md5_slice_embedding(F.col("chunk_text"), dims=dims).alias("embedding"),
    )


def chunk_ann_doc_topk(
    docs: DataFrame,
    catalog,
    index_name: str,
    query_doc_ids: list[int],
    k_chunks: int = 20,
    k_docs: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_centroids: int = 16,
    nprobe: int = 4,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """The end-to-end RAG read path: chunk the corpus, index the chunk
    vectors with the standing :class:`~.similarity.IvfIndex`, retrieve
    each query's top-``k_chunks`` chunks, and roll them up to documents
    — max-sim per doc, min-chunk tiebreak, doc-id-tiebroken doc ranking.
    The query for document *d* is its FIRST chunk (``chunk_id`` 0 —
    every document has one, including empty docs), the conventional
    query-by-example form; a free-text query embeds one extra row
    through the same ``chunk_vectors`` contract.

    Scale shape: the chunk table is scan-local to produce; the index
    build pays the one broadcast-quantizer assignment pass
    (``IvfIndex.build``); the search shuffles only the query/probe/
    candidate funnel against bucketed posting lists; the rollup is two
    windows over ≤ |queries|·k_chunks rows. Nothing corpus-sized
    shuffles after the build.

    Returns (query_doc, doc_id, best_score, best_chunk_id, doc_rank):
    one row per retrieved document per query, ``doc_rank`` ≤ ``k_docs``.
    """
    from pyspark.sql import Window

    from .similarity import IvfIndex

    vecs = chunk_vectors(
        docs, id_col=id_col, text_col=text_col,
        chunk_tokens=chunk_tokens, stride=stride,
    )
    idx = IvfIndex(
        catalog, index_name, n_centroids=n_centroids, nprobe=nprobe
    )
    idx.build(vecs.select("vec_id", "embedding"))
    return chunk_ann_doc_search(
        catalog, index_name, query_doc_ids,
        k_chunks=k_chunks, k_docs=k_docs,
        n_centroids=n_centroids, nprobe=nprobe,
    )


def chunk_ann_doc_search(
    catalog,
    index_name: str,
    query_doc_ids: list[int],
    k_chunks: int = 20,
    k_docs: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """The SEARCH half of :func:`chunk_ann_doc_topk` against a STANDING
    chunk index — the serving-path form: no chunking, no build, just the
    probe/rescore funnel plus the doc rollup. This is what a retrieval
    service pays per query once the index exists; the build-included
    sibling prices the pipeline bootstrap."""
    from .similarity import IvfIndex

    idx = IvfIndex(
        catalog, index_name, n_centroids=n_centroids, nprobe=nprobe
    )
    qids = [int(d) * CHUNK_ID_SPAN for d in query_doc_ids]
    hits = idx.search_ids(qids, k=k_chunks)
    # bigint DIV, never double division (the repo's chunk-math idiom):
    # the packed id decodes exactly in 64-bit integer arithmetic
    return _doc_rollup(
        hits, F.expr(f"query_id DIV {CHUNK_ID_SPAN}"), "query_doc", k_docs
    )


def _doc_rollup(hits, query_key, qname: str, k_docs: int) -> DataFrame:
    """The shared chunk→document rollup: max-sim per doc, min-chunk
    tiebreak within a doc, doc-id-tiebroken per-query ranking.
    ``query_key`` decodes the query column (aliased ``qname``);
    ``hits`` is a search result (query_id, neighbor_id, score, rank)
    over packed chunk ids. Two windows over ≤ |queries|·k_chunks rows."""
    from pyspark.sql import Window

    per_doc = hits.select(
        query_key.alias(qname),
        F.expr(f"neighbor_id DIV {CHUNK_ID_SPAN}").alias("doc_id"),
        F.expr(f"neighbor_id % {CHUNK_ID_SPAN}").alias("chunk_id"),
        "score",
    )
    w_chunk = Window.partitionBy(qname, "doc_id").orderBy(
        F.col("score").desc(), F.col("chunk_id")
    )
    best = per_doc.withColumn("rn", F.row_number().over(w_chunk)).filter(
        F.col("rn") == 1
    )
    w_doc = Window.partitionBy(qname).orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        best.withColumn("doc_rank", F.row_number().over(w_doc))
        .filter(F.col("doc_rank") <= k_docs)
        .select(
            qname,
            "doc_id",
            F.col("score").alias("best_score"),
            F.col("chunk_id").alias("best_chunk_id"),
            F.col("doc_rank").cast("bigint").alias("doc_rank"),
        )
    )


def chunk_ann_text_topk(
    spark,
    catalog,
    index_name: str,
    query_texts: list[str],
    k_chunks: int = 20,
    k_docs: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    dims: int = CHUNK_EMB_DIMS,
) -> DataFrame:
    """Free-text retrieval against a STANDING chunk index (built by
    :func:`chunk_ann_doc_topk` or ``chunk_vectors`` + ``IvfIndex.build``
    — this function never rebuilds): each query string embeds through
    the SAME contract as the indexed chunks
    (``functions.hashes.md5_slice_embedding``; a learned encoder slots
    in identically) and searches via :meth:`IvfIndex.search`, the
    arbitrary-vector path. Query ids are NEGATIVE (-(i+1) for the i-th
    text) — outside the packed chunk-id space, so the self-exclusion
    rule can never hide a corpus chunk from an external query.

    Returns (query_idx, doc_id, best_score, best_chunk_id, doc_rank):
    ``query_idx`` is the 0-based position in ``query_texts``."""
    from ..functions.hashes import md5_slice_embedding
    from .similarity import IvfIndex

    if not query_texts:
        raise ValueError("query_texts must be non-empty")
    qdf = spark.createDataFrame(
        [(-(i + 1), t) for i, t in enumerate(query_texts)],
        "vec_id bigint, qtext string",
    ).select(
        "vec_id", md5_slice_embedding(F.col("qtext"), dims=dims).alias("embedding")
    )
    idx = IvfIndex(
        catalog, index_name, n_centroids=n_centroids, nprobe=nprobe
    )
    hits = idx.search(qdf, k=k_chunks)
    return _doc_rollup(
        hits,
        (-F.col("query_id") - F.lit(1)).cast("bigint"),
        "query_idx",
        k_docs,
    )

"""Composed training-data pipelines [EXT]: the operators of this engine
chained the way a 100 TB corpus-preparation job actually runs.

``prepare_corpus`` is the canonical LLM-data shape: score → filter →
dedup → cost. Every stage is a Catalyst-expression operator from this
package (no Python in the hot path), so the whole pipeline is ONE logical
plan — Catalyst fuses the per-row scoring stages into a single pass over
the scan, and the only shuffles are the two the semantics require (exact
dedup groupBy + representative semi-join).

Stage order matters at scale: per-row filters (quality, language) run
FIRST so the dedup shuffle only carries surviving rows; token costing
runs LAST so it prices only the corpus you keep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.text import lang_id, quality_score, token_count_bpe, token_count_ws
from .operators.dedup import drop_exact_dups


def prepare_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.45,
    langs: tuple[str, ...] = ("en",),
    dedup: bool = True,
) -> DataFrame:
    """Corpus preparation: quality-score + language-ID every document,
    keep ``langs`` above ``min_quality``, drop exact duplicates (min-id
    representative), and attach token-count costing.

    Output: (id, lang_pred, quality, n_ws, n_bpe) for every surviving
    document — the manifest a downstream tokenizer/trainer consumes.
    """
    scored = lang_id(quality_score(docs, text_col), text_col)
    kept = scored.filter(
        (F.col("quality") >= F.lit(min_quality))
        & F.col("lang_pred").isin(*langs)
    )
    if dedup:
        kept = drop_exact_dups(kept, text_col, id_col)
    return kept.select(
        F.col(id_col),
        "lang_pred",
        "quality",
        token_count_ws(text_col).alias("n_ws"),
        token_count_bpe(text_col).alias("n_bpe"),
    )


def pretraining_manifest(
    docs: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    neardup_threshold: float = 0.3,
    max_bucket: int = 1000,
    chunk_tokens: int = 512,
    span: int = 1_000_000,
) -> DataFrame:
    """The WHOLE pretraining data-prep pipeline as one DataFrame program:

    1. **quality filter** — Gopher-rule flags
       (``functions.text.gopher_rule_flags``), keep ``p_all`` docs only;
    2. **near-dup prune** — MinHash-LSH pairs over the *surviving* docs
       → two-star connected components → one representative per cluster
       (``id == component``);
    3. **split assignment** — deterministic frozen-eval-set
       train/val/test (``operators.sampling.split_assign``);
    4. **packing layout** — range-sharded concatenate-and-chunk per
       ``(lang, split)`` (``operators.packing.chunk_assignment_sharded``
       — the 100 TB two-level prefix sum).

    Output manifest: ``(doc_id, lang, split, n_tokens, chunk_id,
    chunk_offset)`` — what a trainer's data loader consumes.

    Stage order is the scale order: the per-row filter runs at the scan
    so the dedup shuffles only price surviving rows; packing runs last so
    context windows are laid over exactly the corpus being trained on.
    """
    from .functions.text import gopher_rule_flags, token_count
    from .operators.dedup import minhash_dup_pairs
    from .operators.graph import connected_components
    from .operators.packing import chunk_assignment_sharded
    from .operators.sampling import split_assign

    kept = (
        gopher_rule_flags(docs, text_col)
        .filter(F.col("p_all"))
        .select(id_col, lang_col, text_col)
    )
    pairs = minhash_dup_pairs(
        kept, id_col, text_col, threshold=neardup_threshold, max_bucket=max_bucket
    )
    cc = connected_components(
        kept.select(F.col(id_col).alias("id")),
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
    )
    survivors = kept.join(
        cc.filter(F.col("id") == F.col("component")).select(
            F.col("id").alias(id_col)
        ),
        id_col,
    )
    sized = split_assign(survivors, id_col, splits).select(
        id_col, lang_col, "split", token_count(text_col).alias("n_tokens")
    )
    return chunk_assignment_sharded(
        sized,
        group_col=(lang_col, "split"),
        id_col=id_col,
        chunk_tokens=chunk_tokens,
        span=span,
    )

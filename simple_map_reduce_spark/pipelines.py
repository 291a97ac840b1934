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

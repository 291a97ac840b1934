from .filters import regex_filter, column_filter
from .joins import equi_join
from .aggregates import (
    wordcount,
    wordcount_total,
    distinct_tokens,
    filter_group_count_percent,
)
from .maple_juice import maple, juice

__all__ = [
    "regex_filter",
    "column_filter",
    "equi_join",
    "wordcount",
    "wordcount_total",
    "distinct_tokens",
    "filter_group_count_percent",
    "maple",
    "juice",
]

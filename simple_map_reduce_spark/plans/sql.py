"""The reference's 2-statement SQL layer (SURVEY.md §3.1, §2.5).

Grammar (token-shape match, exactly as ``main.rs:294-299``):
- ``SELECT ALL FROM <dataset> WHERE <regex>``            → regex filter
  (regex is quote-free and space-free, ``README.md:113``)
- ``SELECT ALL FROM <d1> <d2> WHERE <d1.f1> = <d2.f2>``  → inner equi-join
  (fields written ``dataset.column``, ``README.md:125``)

The reference freezes a physical plan per statement (7 map + 7 reduce
tasks, ``client.rs:505-541``); here each statement lowers to a declarative
DataFrame plan and Catalyst/AQE choose the physical strategy.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..operators.filters import regex_filter
from ..operators.joins import equi_join


@dataclass(frozen=True)
class FilterQuery:
    dataset: str
    regex: str


@dataclass(frozen=True)
class JoinQuery:
    left: str
    right: str
    left_field: str
    right_field: str


def parse(statement: str) -> FilterQuery | JoinQuery:
    """Token-shape parser mirroring ``main.rs:294-299``."""
    toks = statement.split()
    if len(toks) >= 3 and [t.upper() for t in toks[:2]] == ["SELECT", "ALL"] and toks[2].upper() == "FROM":
        rest = toks[3:]
        if len(rest) == 3 and rest[1].upper() == "WHERE":
            return FilterQuery(dataset=rest[0], regex=rest[2])
        if len(rest) == 6 and rest[2].upper() == "WHERE" and rest[4] == "=":
            lf, rf = rest[3], rest[5]
            left, right = rest[0], rest[1]
            lt, _, lcol = lf.partition(".")
            rt, _, rcol = rf.partition(".")
            if lcol and rcol and {lt, rt} == {left, right}:
                if lt == right:  # fields written in swapped order
                    lcol, rcol = rcol, lcol
                return JoinQuery(left=left, right=right, left_field=lcol, right_field=rcol)
    raise ValueError(
        "expected 'SELECT ALL FROM <d> WHERE <regex>' or "
        "'SELECT ALL FROM <d1> <d2> WHERE <d1.f>=<d2.f>', got: " + statement
    )


def run(query: FilterQuery | JoinQuery, tables: dict[str, DataFrame]) -> DataFrame:
    """Lower a parsed statement onto provided DataFrames.

    For ``FilterQuery`` the dataset must expose the whole-line ``value``
    column (use ``sources.lines_view`` for tabular data) — the reference
    regex matches the raw line (``executors/selectmap.py:14``)."""
    if isinstance(query, FilterQuery):
        return regex_filter(tables[query.dataset], query.regex)
    return equi_join(
        tables[query.left],
        tables[query.right],
        query.left_field,
        query.right_field,
        prefixes=(query.left, query.right),
    )

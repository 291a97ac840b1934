"""MapleJuice engine facade: the reference's end-user API surface on
Spark.

Maps the reference CLI (``main.rs:209-308``) one-to-one:

| reference command                                  | here |
|----------------------------------------------------|------|
| ``put <local> <sdfs>``                             | :meth:`MapleJuice.put` |
| ``get <sdfs> <local>``                             | :meth:`MapleJuice.get` |
| ``delete <sdfs>``                                  | :meth:`MapleJuice.delete` |
| ``ls <sdfs>`` / ``store``                          | :meth:`MapleJuice.ls` |
| ``maple <exe> <n> <prefix> <input> [args...]``     | :meth:`MapleJuice.maple` |
| ``juice <exe> <n> <prefix> <out> <delete?>``       | :meth:`MapleJuice.juice` |
| ``SELECT ALL FROM ...`` (filter / join)            | :meth:`MapleJuice.sql` |
| ``multiread`` / ``multiwrite``                     | not needed: concurrent reads of an immutable table are always safe (SURVEY.md §2.1 S8) |

Deviations (documented, deliberate — SURVEY.md §7 risk 4):
- maple's input prefix unions ALL matching tables, not just the first
  file (``leader.rs:253`` take-first quirk).
- juice's ``delete`` flag actually deletes the intermediate prefix
  tables (the reference parses it and ignores it,
  ``messages.proto:94`` vs ``leader.rs:476-635``).
- percent/total-style reducers see the full key group regardless of
  task count (no per-partition totals bug, SURVEY.md §2.4 A3).

Executable arguments: a callable runs Arrow-batched (native mode); a
string is treated as a shell command for Hadoop-streaming-style pipe
mode (stdin lines → ``key\\tvalue`` stdout), which is how the
reference's ``Hdemo1*`` scripts run unmodified.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .catalog import Catalog
from .operators.maple_juice import juice as juice_fn
from .operators.maple_juice import juice_pipe, maple_pipe
from .operators.maple_juice import maple as maple_fn
from .plans.sql import FilterQuery, parse
from .plans.sql import run as run_sql
from .sources.readers import lines_view


class MapleJuice:
    def __init__(self, spark: SparkSession, warehouse: str):
        self.spark = spark
        self.catalog = Catalog(spark, warehouse)

    # -- data lifecycle (§3.3) -------------------------------------------
    def put(self, local_path: str, name: str, fmt: str = "text") -> None:
        self.catalog.put(local_path, name, fmt)

    def get(self, name: str, local_path: str | None = None) -> DataFrame:
        if local_path:
            self.catalog.export(name, local_path)
        return self.catalog.get(name)

    def delete(self, name: str) -> bool:
        return self.catalog.delete(name)

    def ls(self) -> list[str]:
        return self.catalog.ls()

    # -- generic map/reduce (§3.2) ---------------------------------------

    #: Hard cap on the key list :meth:`maple` returns. The reference's
    #: stdout-keys contract collects every distinct key to one place —
    #: fine for its demo vocabularies, an unbounded driver OOM at 100 TB
    #: (a web-corpus wordcount has billions of keys). Callers with larger
    #: key spaces use :meth:`maple_keys`, which stays distributed.
    MAX_COLLECTED_KEYS = 1_000_000

    def maple(
        self,
        executable: Callable | str,
        num_tasks: int,
        out_prefix: str,
        input_prefix: str,
        args: tuple = (),
        max_keys: int = MAX_COLLECTED_KEYS,
    ) -> list[str]:
        """Map phase over every table matching ``input_prefix``; the keyed
        result is stored as table ``out_prefix`` and the distinct key set
        is returned (the reference's stdout-keys contract,
        ``Sdemo1map.py:33-34``).

        Raises ``ValueError`` if the distinct key count exceeds
        ``max_keys`` — collecting an unbounded vocabulary to the driver
        is the one part of the reference contract that cannot scale;
        :meth:`maple_keys` is the DataFrame-returning escape hatch."""
        src = self.catalog.read_prefix(input_prefix)
        if callable(executable):
            kv = maple_fn(executable, src, num_tasks=num_tasks, args=args)
        else:
            kv = maple_pipe(executable, src, num_tasks=num_tasks)
        self.catalog.put(kv, out_prefix)
        keys = (
            self.catalog.get(out_prefix)
            .select("key")
            .distinct()
            .limit(max_keys + 1)
            .collect()
        )
        if len(keys) > max_keys:
            raise ValueError(
                f"maple produced more than {max_keys} distinct keys; the "
                f"collected key-list contract does not scale to this key "
                f"space — use maple_keys({out_prefix!r}) for a distributed "
                f"DataFrame of keys, or raise max_keys explicitly"
            )
        return sorted(r["key"] for r in keys)

    def maple_keys(self, out_prefix: str) -> DataFrame:
        """Distributed form of the stdout-keys contract: the distinct key
        set of a completed maple round as a DataFrame (no driver
        materialization — safe at any key cardinality)."""
        return self.catalog.get(out_prefix).select("key").distinct()

    def juice(
        self,
        executable: Callable | str,
        num_tasks: int,
        in_prefix: str,
        out_name: str,
        delete: bool = False,
    ) -> DataFrame:
        """Reduce phase over the keyed tables under ``in_prefix``; output
        stored as ``out_name``. ``delete=True`` removes the intermediate
        prefix tables (implemented — the reference's flag is dead)."""
        kv = self.catalog.read_prefix(in_prefix)
        if callable(executable):
            out = juice_fn(executable, kv, num_tasks=num_tasks)
        else:
            out = juice_pipe(executable, kv, num_tasks=num_tasks)
        self.catalog.put(out, out_name)
        if delete:
            for name in [n for n in self.catalog.ls() if n.startswith(in_prefix) and n != out_name]:
                self.catalog.delete(name)
        return self.catalog.get(out_name)

    # -- 2-statement SQL layer (§3.1) ------------------------------------
    def sql(self, statement: str, out_name: str | None = None) -> DataFrame:
        """Run a reference SQL statement against catalog tables. Filter
        statements match the RAW LINE (``executors/selectmap.py:14``):
        multi-column tables are viewed as comma-joined lines first.
        Output stored as ``{dataset}_filter`` / ``{d1}_{d2}_join``
        (``README.md:114,127``) unless ``out_name`` overrides."""
        q = parse(statement)
        if isinstance(q, FilterQuery):
            df = self.catalog.get(q.dataset)
            if df.columns != ["value"]:
                df = lines_view(df)
            result = run_sql(q, {q.dataset: df})
            default_out = f"{q.dataset}_filter"
        else:
            tables = {q.left: self.catalog.get(q.left), q.right: self.catalog.get(q.right)}
            result = run_sql(q, tables)
            default_out = f"{q.left}_{q.right}_join"
        self.catalog.put(result, out_name or default_out)
        return self.catalog.get(out_name or default_out)

    # -- incremental near-dup ingest [EXT] --------------------------------
    def neardup_index(self, name: str, **params) -> "NearDupIndex":
        """Catalog-backed MinHash-LSH corpus index for incremental ingest
        (operators.dedup.NearDupIndex): ``build(corpus)`` once, then
        ``ingest(batch)`` per arrival — the corpus is kept as hashed
        shingle/bucket parquet tables and never re-tokenized."""
        from .operators.dedup import NearDupIndex

        return NearDupIndex(self.catalog, name, **params)

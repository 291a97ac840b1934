"""Registry hygiene lints.

Both rounds' red driver rows (`image_features` r1, `nation_segment_list`
r2) were the same failure class: a registered query emitting an
array-typed column, which the driver's pandas-based canonicalizer cannot
hash. This lint makes that class unshippable: every ``queries()`` entry
must project to scalar columns only (no array/map/struct/binary at the
top level) — scalarize with ``array_join``/element projection/``hex``.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

FORBIDDEN = (T.ArrayType, T.MapType, T.StructType, T.BinaryType)

# building these DataFrames executes a streaming drain; schema checked in
# its own test below so the cheap lazy lint stays fast
_STREAMING = tuple(k for k in entrymod.queries() if k.startswith("streaming_"))

BATCH_KEYS = sorted(k for k in entrymod.queries() if k not in _STREAMING)


def _assert_scalar_schema(name, schema):
    bad = [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, FORBIDDEN)
    ]
    assert not bad, (
        f"{name} emits non-scalar column(s) {bad} — the driver's "
        "canonicalizer cannot hash them (this exact class produced the "
        "red rows of rounds 1 and 2); scalarize with array_join/hex/"
        "element projection"
    )


@pytest.mark.parametrize("name", BATCH_KEYS)
def test_registered_query_emits_scalars_only(spark, name):
    sdf = entrymod.queries()[name](spark, SF_SMOKE)
    _assert_scalar_schema(name, sdf.schema)


@pytest.mark.parametrize("name", sorted(_STREAMING))
def test_streaming_query_emits_scalars_only(spark, name):
    sdf = entrymod.queries()[name](spark, SF_SMOKE)
    _assert_scalar_schema(name, sdf.schema)


def test_changed_queries_are_inside_verification_window():
    """The driver hash-checks only the FIRST 50 registry entries per
    round. Any query whose semantics changed this round MUST be in that
    window — otherwise the change ships on a stale green row (this
    happened to jaccard_pairs in round 2). The discipline: a behavior
    change adds its keys to queries._CHANGED_THIS_ROUND; this test pins
    them into the window."""
    from simple_map_reduce_spark.queries import _CHANGED_THIS_ROUND

    window = list(entrymod.queries().keys())[:50]
    missing = [k for k in _CHANGED_THIS_ROUND if k not in window]
    assert not missing, (
        f"queries changed this round but outside the 50-slot driver "
        f"verification window: {missing}"
    )


# The ONLY rows allowed in the window without an oracle: the rows-only
# sketches, deliberately given three TAIL slots in the r10 window
# (VERDICT r9 item 6 — none had executed under the driver since r1; the
# driver records rows>0/err=None for them, a weaker but real check).
# Their correctness lives in tests/test_sketches.py's error bounds.
ROWS_ONLY_WINDOW_TAIL = {
    "vocab_sketch",
    "value_quantiles_sketch",
    "bigram_lm_quality_sketch",
}


def test_window_slots_are_all_oracle_backed():
    """A window slot given to an oracle-less query is a guaranteed `err`
    row — round 3 burned its one non-green row exactly this way
    (embedding_neardup_lsh rotated in while registered without an
    oracle). Approximate-but-deterministic queries get generated-SQL
    oracles instead (see the ANN tier); only genuinely engine-internal
    algorithms (the HLL/GK sketches) stay rows-only, allowlisted above
    and pinned to the window TAIL so they can never displace an
    oracle-backed row from the front."""
    window = list(entrymod.queries().keys())[:50]
    oracles = entrymod.oracle_sql()
    missing = [
        k for k in window if k not in oracles and k not in ROWS_ONLY_WINDOW_TAIL
    ]
    assert not missing, (
        f"oracle-less queries occupy driver verification slots: {missing}"
    )
    # the allowlisted rows-only slots must sit at the very tail
    tail_positions = [
        i for i, k in enumerate(window) if k in ROWS_ONLY_WINDOW_TAIL
    ]
    assert all(i >= 50 - len(ROWS_ONLY_WINDOW_TAIL) for i in tail_positions), (
        f"rows-only sketch slots must be the window tail, got positions "
        f"{tail_positions}"
    )


def test_changed_round_list_tracks_module_edits():
    """If any engine module changed since the last round-marker commit
    ('round N: ...'), _CHANGED_THIS_ROUND must be non-empty — an edited
    operator with an empty changed-list means a behavior change is about
    to ship on stale green rows. (Heuristic by design: it cannot tell
    WHICH queries changed, only that claiming 'nothing changed' while
    code changed is wrong.)"""
    import subprocess

    from simple_map_reduce_spark.queries import _CHANGED_THIS_ROUND

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    base = subprocess.run(
        ["git", "log", "--grep", "^round [0-9]*:", "--format=%H", "-n", "1"],
        capture_output=True, text=True, cwd=repo,
    ).stdout.strip()
    if not base:
        pytest.skip("no round-marker commit yet (round 1)")
    changed = subprocess.run(
        ["git", "diff", "--name-only", base, "HEAD", "--", "simple_map_reduce_spark"],
        capture_output=True, text=True, cwd=repo,
    ).stdout.split()
    if changed:
        assert _CHANGED_THIS_ROUND, (
            f"engine modules changed since the last round marker "
            f"({changed[:10]}…) but _CHANGED_THIS_ROUND is empty"
        )

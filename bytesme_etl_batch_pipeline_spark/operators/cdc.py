"""Change-data-capture shaping operators (engine extension).

The reference pipeline materializes only current state (keyed upserts into
warehouse tables, ``etl_insert_data.py``-style); real warehouses also need
the two standard derived shapes: SCD Type-2 history (every version of a key
with its validity interval) and snapshot diffs (what changed between two
loads). Both are pure window/join compositions — one shuffle on the key —
so they scale exactly like the engine's keyed dedup.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    payload_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Collapse a change feed (I/U/D rows with a monotone ``seq_col``) into
    SCD Type-2 history: one row per surviving VERSION of each key, with
    ``valid_from`` (the change's sequence) and ``valid_to`` (the next
    change's sequence for the key — any op, including the delete that ends
    it; NULL = still current) and ``is_current``.

    Single shuffle: everything is one window over ``key_col`` ordered by
    ``seq_col``. Delete rows contribute their sequence as the predecessor's
    ``valid_to`` and are then dropped — a deleted key has history but no
    current row. Deterministic under any partitioning (the window order is
    the total order of the change feed).

    A NULL op is an UPSERT, not a delete: the delete filter is null-safe —
    a plain ``op != 'D'`` would three-valued-logic a corrupt/unknown op
    row out of the output, silently turning junk into a delete (the row's
    payload would vanish with no signal).
    """
    w = Window.partitionBy(key_col).orderBy(F.col(seq_col).asc())
    out = (
        changes.withColumn("valid_to", F.lead(F.col(seq_col)).over(w))
        .filter(~F.col(op_col).eqNullSafe(delete_op))
        .select(
            F.col(key_col),
            *[F.col(c) for c in payload_cols],
            F.col(seq_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
    return out


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    compare_cols: Sequence[str],
) -> DataFrame:
    """Diff two snapshots of a keyed table: full-outer join on the key, then
    classify each key as added / removed / changed (null-safe column
    compare). Unchanged keys are dropped — the diff is the (usually tiny)
    change set, which is what an incremental downstream load consumes.

    Both sides shuffle once on ``key_col`` and the join is co-partitioned;
    with bucketed/pre-partitioned snapshots the exchanges are elided
    entirely. Output: key, status, and old_/new_ prefixed compare columns.
    """
    o = old.select(
        F.col(key_col), *[F.col(c).alias(f"old_{c}") for c in compare_cols]
    ).withColumn("__in_old", F.lit(True))
    n = new.select(
        F.col(key_col), *[F.col(c).alias(f"new_{c}") for c in compare_cols]
    ).withColumn("__in_new", F.lit(True))
    joined = o.join(n, key_col, "full_outer")
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(changed, F.lit("changed"))
    )  # no otherwise → unchanged is NULL and filtered
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .drop("__in_old", "__in_new")
    )

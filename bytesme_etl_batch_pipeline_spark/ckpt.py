"""Tracked localCheckpoint for iterative loops.

``DataFrame.localCheckpoint(eager=True)`` pins its materialized blocks at
the RDD level — NOT in the SQL CacheManager — so ``DataFrame.unpersist()``
on the result is a silent no-op (verified on PySpark 4.1.2: the persistent
RDD survives). An iterative loop that checkpoints every few rounds
therefore accumulates one dictionary/label-table-sized block set per
checkpoint for the life of the app unless it frees them at the RDD level.

These helpers diff ``sc.getPersistentRDDs()`` around the checkpoint to
learn which RDD ids it pinned, and free superseded ones explicitly.

SAFETY: freeing a local checkpoint's blocks destroys the ONLY copy of that
data (lineage was truncated) — only free a checkpoint that is fully
superseded, i.e. after the NEXT eager checkpoint has materialized and the
old DataFrame will never be touched again. The id diff assumes no
concurrent checkpointing in the same SparkContext (true for the engine's
single-threaded iterative loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def tracked_local_checkpoint(df: DataFrame) -> tuple[DataFrame, list[int]]:
    """Eager localCheckpoint returning ``(checkpointed_df, new_rdd_ids)`` —
    the ids of the persistent RDDs the checkpoint pinned, for a later
    ``free_checkpoint``."""
    sc = df.sparkSession.sparkContext
    before = set(sc._jsc.getPersistentRDDs().keySet().toArray())
    out = df.localCheckpoint(eager=True)
    after = sc._jsc.getPersistentRDDs().keySet().toArray()
    return out, [int(i) for i in after if i not in before]


def free_checkpoint(df_or_session, ids: list[int]) -> None:
    """Release the blocks a superseded ``tracked_local_checkpoint`` pinned.
    Missing ids (already collected by the ContextCleaner) are skipped."""
    spark = getattr(df_or_session, "sparkSession", df_or_session)
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    for i in ids:
        rdd = jmap.get(i)
        if rdd is not None:
            rdd.unpersist(False)

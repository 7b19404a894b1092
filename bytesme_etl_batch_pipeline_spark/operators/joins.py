"""Join operators (SURVEY §2.4: J1–J6).

Every reference join is a dict probe against a small dimension — broadcast
hash join semantics. The engine makes that explicit with ``F.broadcast`` on
dim sides, and leaves big-big joins to Catalyst (sort-merge / shuffled-hash,
with AQE skew splitting) — those come free and correct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_key(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "inner",
    broadcast_dim: bool = True,
) -> DataFrame:
    """J1/J2/J3: dimension-key resolution (``category_name -> category_id``
    style, reference ``seperate_tables.py:111-117,141-143``).

    Broadcasting the dim avoids shuffling the 100 TB fact side entirely —
    the probe runs map-side, exactly like the reference's dict lookup but
    distributed.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def lookup_map_join(df: DataFrame, mapping: dict[str, str], key_col: str, out_col: str) -> DataFrame:
    """J5: literal map lookup (reference ``dict(zip(...))`` probes,
    ``generate_embeddings.py:499-501``). For small static maps a
    ``create_map`` literal beats even a broadcast join: zero extra scan,
    folded into the projection."""
    pairs: list = []
    for k, v in mapping.items():
        pairs += [F.lit(k), F.lit(v)]
    return df.withColumn(out_col, F.create_map(*pairs)[F.col(key_col)])


def zip_join(df: DataFrame, left_col: str, right_col: str, out_col: str, sep: str = r"\|") -> DataFrame:
    """J6: positional zip of two parallel pipe-delimited strings
    (reference ``zip(images, image_names)``, ``seperate_tables.py:85``).
    Pure expression: split both and ``arrays_zip`` — no shuffle, no UDF.
    """
    return df.withColumn(
        out_col,
        F.arrays_zip(
            F.split(F.col(left_col), sep).alias("left"),
            F.split(F.col(right_col), sep).alias("right"),
        ),
    )

"""Connected components for near-dup clustering (engine extension).

Pairwise near-dup verdicts (MinHash/SimHash/embedding pairs) only say "a
looks like b"; deduping a corpus needs the TRANSITIVE clusters — if a~b and
b~c, all three are one group and one representative survives. The reference
has no equivalent (its pandas dedup is exact-key only); every large-scale
training-data pipeline needs this step after candidate verification.

Algorithm: iterative min-label propagation — every node starts labeled with
itself; each round every node takes the min label among itself and its
neighbors; fixpoint = components labeled by their smallest member. Rounds
needed = graph diameter, and near-dup graphs are shallow (dup clusters are
dense and tiny), so a handful of rounds suffices. Each round is one
shuffle-on-node join + a map-side min-agg; lineage is cut per round with
``localCheckpoint`` so the plan does not grow unboundedly. For
billion-edge general graphs prefer the alternating small-star/large-star
variant (same join primitive, fewer rounds); for dedup clusters this simple
form is the right cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """→ (node, cluster_id): cluster_id = min node id reachable from node.

    Deterministic for any partitioning (min is order-insensitive). Raises if
    ``max_iter`` rounds do not reach the fixpoint — for near-dup clusters
    that means the candidate graph is pathological (e.g. unblocked pairs)
    and should be inspected, not silently mislabeled.
    """
    # Materialize the (symmetrized) edge list ONCE — without this every
    # round's join re-executes the upstream pipeline that produced the edges
    # (for near-dup input that is the whole MinHash-LSH cascade, turning an
    # O(rounds·|E|) loop into O(rounds·cost(LSH)); measured 15 s → 3 s at
    # sf0.1). At cluster scale this is a persisted shuffle-safe snapshot.
    sym = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select("node").distinct().withColumn("label", F.col("node"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr_min = (
            sym.alias("s")
            .join(labels.alias("l"), F.col("s.nbr") == F.col("l.node"))
            .groupBy(F.col("s.node").alias("node"))
            .agg(F.min(F.col("l.label")).alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select("node", F.col("label").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "candidate graph diameter is unexpectedly large"
    )


def cluster_representatives(components: DataFrame) -> DataFrame:
    """→ (cluster_id, keep_node): the survivor (smallest id) per cluster —
    the keep-lowest policy the near-dup decision stage uses."""
    return components.groupBy("cluster_id").agg(
        F.min("node").alias("keep_node")
    )

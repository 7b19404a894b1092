"""Vector similarity search (SURVEY §2.12 E4 + engine extension surface).

The reference runs top-k L2 search inside pgvector
(``generate_embeddings.py:418,438-452``) and scores ``1 - distance``
(``:487``). Here the search runs natively in Spark:

* Brute-force — exact, pure expressions (``zip_with`` dot product folded
  sequentially, so results are bit-deterministic). O(n·d) per query: the
  correctness baseline and fine for dim-table-sized corpora.
* LSH ANN — random-hyperplane signatures → bucket equi-join. Candidate
  generation cost tracks bucket density, not n². The 100 TB path; recall is
  validated against brute force in tests.
* IVF ANN — k-means-style coarse quantizer (deterministic seeded centroids) →
  probe nearest cells only.

All floats fold in ascending index order in both engines, so oracle value
hashes are stable; scores are rounded to 6 decimals as the cross-engine
equality contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.arrays import lit_doubles, lit_doubles_2d
from .textops import md5_hash48


def _dots(a: Column, b: Column) -> Column:
    """Sequential-fold dot product over double-cast arrays."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(_dots(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """NULL (not NaN) for zero-norm vectors: the embedder emits zero vectors
    for empty text (embed.py), and double 0.0/0.0 is IEEE NaN even under
    ANSI — which Spark sorts ABOVE every number in descending order and
    passes through ``>= threshold`` filters, so junk would fill top-k and
    near-dup pair lists. NULL instead drops out of filters and sorts last
    (desc default), and matches DuckDB's x/0 → NULL oracle behavior."""
    denom = _norm(a) * _norm(b)
    return F.when(denom != 0, _dots(a, b) / denom)


def l2_distance(a: Column, b: Column) -> Column:
    diffs = F.zip_with(
        a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
    )
    return F.sqrt(F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x))


def topk_brute_force(
    vectors: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "q",
    metric: str = "cosine",
) -> DataFrame:
    """E4 brute-force top-k: broadcast the single-row query, score every
    vector map-side, TakeOrderedAndProject picks k. ``metric``: cosine
    (descending score) or l2 (ascending distance, score = 1 - distance as in
    the reference)."""
    if metric not in ("cosine", "l2"):
        raise ValueError(f"metric must be 'cosine' or 'l2', got {metric!r}")
    joined = vectors.crossJoin(F.broadcast(query))
    a, q = F.col(vec_col), F.col(query_col)
    if metric == "cosine":
        # desc is NULLS LAST — a NULL embedding (NULL score) sorts out
        scored = joined.withColumn("score", F.round(cosine_similarity(a, q), 6))
        order = [F.col("score").desc(), F.col(id_col)]
    else:
        scored = joined.withColumn("distance", F.round(l2_distance(a, q), 6)).withColumn(
            "score", F.lit(1.0) - F.col("distance")
        )
        # ascending is NULLS FIRST: without nulls_last a NULL embedding
        # (NULL distance) would displace every real candidate from top-k
        order = [F.col("distance").asc_nulls_last(), F.col(id_col)]
    return scored.orderBy(*order).limit(k).drop(query_col)


def pairs_above_threshold(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.9,
    salt_chunks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key (exact verify
    step of an LSH/IVF pipeline; never run unblocked at scale).

    Parallelism (r11): a join keyed on the block alone has at most
    |distinct blocks| non-empty partitions — with coarse blocks (the
    catalog's 10 labels) the O(block²) cosine stage ran on ≤10 of 32
    cores no matter the shuffle setting (guide §2.5: a handful of keys
    own all the work). The probe side therefore carries a deterministic
    salt (``pmod(xxhash64(id), S)``) and the build side replicates S
    ways, spreading each block's pair work over S·|blocks| partitions.
    Pair set is unchanged: each unordered pair surfaces exactly once,
    through the a-side row's single salt. The trade is S extra copies of
    the build side through the exchange — linear in the corpus, amortized
    by the quadratic per-block verify whenever avg block size ≫ S; for
    fine blocking (blocks ≫ cores) pass ``salt_chunks=1`` to skip it.
    """
    if salt_chunks is None:
        try:
            salt_chunks = int(
                vectors.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):
            salt_chunks = vectors.sparkSession.sparkContext.defaultParallelism
    salt_chunks = max(1, salt_chunks)
    # Precompute each vector's norm ONCE (n folds) instead of per pair
    # (2·n² folds) — same arithmetic, ~3× less work on the O(n²) stage.
    with_norm = vectors.select(
        F.col(id_col), F.col(vec_col), F.col(block_col).alias("__blk"),
        _norm(F.col(vec_col)).alias("__nrm"),
    )
    a = with_norm.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
        F.col("__blk"), F.col("__nrm").alias("n_a"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_chunks)).alias("__salt"),
    )
    b = with_norm.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
        F.col("__blk"), F.col("__nrm").alias("n_b"),
        F.explode(
            F.sequence(F.lit(0), F.lit(salt_chunks - 1)).cast("array<bigint>")
        ).alias("__salt"),
    )
    # PIN both exchanges at salt_chunks partitions: the shuffled bytes are
    # tiny (vectors + norms), so AQE's byte-targeted coalescing folds the
    # join back to ~1 partition — but the work here is the QUADRATIC
    # per-block fold downstream of the exchange, invisible to the byte
    # target (same lesson as lsh_band_window_pairs' candidate dedup, r10).
    # An explicit width keyed to the shuffle setting scales with the
    # session; the join reuses the pinned partitioning, adding no exchange.
    a = a.repartition(salt_chunks, "__blk", "__salt")
    b = b.repartition(salt_chunks, "__blk", "__salt")
    return (
        a.join(b, ["__blk", "__salt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            # NULL for zero-norm operands (see cosine_similarity) — a NaN
            # here would pass the >= threshold filter below
            F.round(
                F.when(
                    F.col("n_a") * F.col("n_b") != 0,
                    _dots(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")),
                ),
                6,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# ANN: random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplane(dim: int, plane: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 bits (python-side
    constant — broadcast as a literal array)."""
    import hashlib

    comps = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}|{plane}|{i}".encode()).hexdigest()
        comps.append((int(h[:12], 16) / float(2**48)) * 2.0 - 1.0)
    return comps


def lsh_signature(vec_col: Column, dim: int, n_planes: int = 8, seed: int = 7) -> Column:
    """Sign-of-dot-product bit signature: bit j = 1 iff v · h_j > 0.
    A NULL vector, one with a NULL element, or one of the WRONG LENGTH
    (its dot products are all or partially NULL, so every ``when`` would
    fall through) — gets a NULL signature: mapping corrupt vectors to 0
    would pile them into bucket 0 and let them survive Hamming pruning
    near signature 0.

    Built as ONE transform over a 2-D plane literal + ONE sum fold rather
    than n_planes independent dot/when chains: per-plane arithmetic and the
    bit weights are identical (2^j from the element index), but plan
    construction drops from ~3·n_planes higher-order-function round trips
    (~0.7 s at n_planes=16 — half this operator's sf0.1 build wall) to 3."""
    planes = lit_doubles_2d([_hyperplane(dim, j, seed) for j in range(n_planes)])
    weights = F.expr(
        "array(" + ",".join(str(2**j) + "L" for j in range(n_planes)) + ")"
    )
    bits = F.zip_with(
        planes,
        weights,
        lambda p, w: F.when(_dots(vec_col, p) > 0, w).otherwise(
            F.lit(0).cast("long")
        ),
    )
    sig = F.aggregate(bits, F.lit(0).cast("long"), lambda acc, x: acc + x)
    valid = (
        vec_col.isNotNull()
        & ~F.exists(vec_col, lambda x: x.isNull())
        & (F.size(vec_col) == F.lit(dim))
    )
    return F.when(valid, sig)


def lsh_band_window_pairs(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 16,
    n_bands: int = 4,
    window: int = 8,
    seed: int = 7,
    threshold: float | None = None,
    num_chunks: int | None = None,
) -> DataFrame:
    """LSH-candidate near-dup pairs with BOUNDED per-row fan-out — the
    production shape of the exact-verify stage (`pairs_above_threshold`
    is the raw-block variant whose work grows with block²; this one is
    linear in the corpus at every scale).

    Candidate generation: an ``n_planes``-bit hyperplane signature is
    split into ``n_bands`` bands; within each (band, band_value) bucket,
    rows sorted by id pair ONLY with their next ``window`` neighbors
    (sorted-neighborhood blocking — Hernández & Stolfo 1995 — composed
    with banded LSH). Per-row candidate fan-out is therefore at most
    ``n_bands * window`` regardless of bucket size, so total candidate
    volume is O(n) even when near-duplicate families grow with the
    corpus (the regime where all-bucket-pairs LSH degrades to block²).
    Exact cosine verification runs only on the deduplicated candidate
    set. Corrupt vectors (NULL / NULL element / wrong length) get a NULL
    signature and can never become candidates.

    Parallelism (round-9 fix): a window partitioned by (band, band_value)
    alone has at most ``n_bands * 2**(n_planes/n_bands)`` partitions (64
    with the defaults) — each window task would sort ~corpus/16 rows, a
    single-task scale-killer at 100 TB. Instead the exploded (band, bval,
    id) rows are RANGE-partitioned into ``num_chunks`` id-contiguous
    chunks (default: ``spark.sql.shuffle.partitions``, i.e. sized like
    every other shuffle) and the sorted-neighborhood ``lead()`` runs per
    chunk — each task sorts ~corpus·n_bands/num_chunks rows regardless of
    bucket cardinality. Chunk-boundary rows (the last ``window`` of each
    chunk) can have successors in following chunks; they are re-windowed
    in a second pass over ONLY the boundary subset (first + last
    ``window`` rows of every chunk, ≤ 2·num_chunks·window rows — bounded
    by the parallelism setting, not the data). Because range order is
    (band, bval, id) and bucket rows are therefore globally contiguous, a
    tail row's true next-``window`` bucket successors all lie in that
    subset (own-chunk tail rows, then following chunks' heads, chaining
    through undersized chunks), so the union of the two passes emits the
    EXACT pair set of the single-window formulation — verified against it
    property-wise in tests and by the unchanged DuckDB oracles.

    Returns (id_a, id_b, cosine) with id_a < id_b; ``threshold`` filters
    on the exact verified cosine when given.
    """
    from pyspark.sql import Window

    if n_planes % n_bands != 0:
        # silently dropping the high signature bits (e.g. 3 bands over 16
        # planes using only 15 bits) would weaken candidate recall with no
        # signal; the DuckDB oracle generator shares this contract
        raise ValueError(
            f"n_planes ({n_planes}) must be divisible by n_bands ({n_bands})"
        )
    r_bits = n_planes // n_bands
    base = vectors.select(
        F.col(id_col).alias("__id"),
        lsh_signature(F.col(vec_col), dim, n_planes, seed).alias("__sig"),
    ).filter(F.col("__sig").isNotNull())
    bands = F.array(
        *[
            F.shiftright(F.col("__sig"), r_bits * b).bitwiseAND(
                F.lit(2**r_bits - 1)
            )
            for b in range(n_bands)
        ]
    )
    exploded = base.select(
        "__id", F.posexplode(bands).alias("__band", "__bval")
    ).localCheckpoint(eager=True)
    # ^ eager: repartitionByRange runs a SAMPLING job over its child to
    # pick range boundaries, then the real exchange computes the child
    # AGAIN — without materialization the n_planes interpreted hyperplane
    # folds per row (the most expensive map work in this operator) run
    # twice per corpus row. The checkpointed rows are three longs each
    # (id, band, bval) — the guide-§8 "decide with small rows" proxy — so
    # materializing once is the scale-correct trade at any corpus size.
    # Exactness is boundary-agnostic (the two-pass window proof holds for
    # ANY chunking), so pinning sampled boundaries changes nothing.
    if num_chunks is None:
        try:
            num_chunks = int(
                vectors.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):  # e.g. "auto" under some AQE setups
            num_chunks = vectors.sparkSession.sparkContext.defaultParallelism
    # Range partitioning on (band, bval, id) makes global order == (chunk,
    # local rank) order and keeps every bucket's rows contiguous across
    # chunk boundaries — the two facts the boundary pass's exactness proof
    # rests on. localCheckpoint (lazy) pins the sampled range boundaries /
    # partition ids and computes the signature map exactly once even
    # though two passes consume it. ids only through the windows (the
    # vectors re-join below) — leading the embedding arrays themselves
    # would push window*dim doubles per row through the sorts.
    w_loc = Window.partitionBy("__pid").orderBy("__band", "__bval", "__id")
    w_cnt = Window.partitionBy("__pid")
    # rn + the chunk-local leads share w_loc, sz shares its partitioning —
    # all three resolve to ONE exchange + ONE sort of the bulk data.
    nb = F.array(
        *[
            F.lead(
                F.struct(
                    F.col("__band").alias("b"),
                    F.col("__bval").alias("v"),
                    F.col("__id").alias("i"),
                ),
                i,
            ).over(w_loc)
            for i in range(1, window + 1)
        ]
    )
    marked = (
        exploded.repartitionByRange(num_chunks, "__band", "__bval", "__id")
        .withColumn("__pid", F.spark_partition_id())
        .withColumn("__rn", F.row_number().over(w_loc))
        .withColumn("__sz", F.count(F.lit(1)).over(w_cnt))
        .withColumn("__nb", nb)
        .localCheckpoint(eager=False)
    )
    # Pass 1 (bulk, num_chunks-way parallel): interior rows — all
    # ``window`` leads live in the same chunk; a lead that crossed into
    # the next bucket is discarded by the (band, bval) match, exactly as
    # the bucket-scoped lead() returned NULL past the bucket end.
    is_tail = F.col("__rn") > F.col("__sz") - window
    interior_pairs = (
        marked.filter(~is_tail)
        .select(
            "__band", "__bval", F.col("__id").alias("id_a"),
            F.explode("__nb").alias("__n"),
        )
        .filter(
            F.col("__n").isNotNull()
            & (F.col("__n.b") == F.col("__band"))
            & (F.col("__n.v") == F.col("__bval"))
        )
        .select("id_a", F.col("__n.i").alias("id_b"))
    )
    # Pass 2 (boundary, ≤ 2·num_chunks·window rows): chunk-tail rows get
    # their true bucket successors from the bucket-scoped window over the
    # boundary subset — head rows participate only as lead targets.
    boundary = marked.filter((F.col("__rn") <= window) | is_tail).drop("__nb")
    w_bnd = Window.partitionBy("__band", "__bval").orderBy("__id")
    nb_bnd = F.array(
        *[F.lead("__id", i).over(w_bnd) for i in range(1, window + 1)]
    )
    tail_pairs = (
        boundary.withColumn("__nb", nb_bnd)
        .filter(is_tail)
        .select(F.col("__id").alias("id_a"), F.explode("__nb").alias("id_b"))
        .filter(F.col("id_b").isNotNull())
    )
    cand = (
        interior_pairs.unionByName(tail_pairs)
        # a pair can surface from several bands — dedup BEFORE paying the
        # exact verification. The dedup shuffle is pinned at num_chunks
        # partitions (hash on the pair key; dropDuplicates then needs no
        # second exchange) instead of `.distinct()`: the candidate rows are
        # two longs each, so AQE's byte-targeted coalescing folds them into
        # one or two partitions and the interpreted cosine folds of the
        # verify stage — the most expensive per-row work in the operator —
        # would run nearly serially. An explicit width keyed to the shuffle
        # setting scales with the session like every other exchange here.
        .repartition(num_chunks, "id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    # Precompute each vector's norm ONCE on the corpus side of the joins (n
    # sqrt-folds) instead of inside cosine_similarity per candidate pair.
    # The inline form costs 5 interpreted 64-element folds per pair — dots
    # plus both norms, with the norms appearing twice (the zero-denominator
    # guard AND the division) — and a downstream ``cosine >= t`` filter gets
    # pushed into the join condition, re-evaluating the whole expression a
    # second time for surviving rows (10 folds/pair total). With norms as
    # plain join-carried columns only the dots fold remains per evaluation.
    # Bit-exact: denom is the same sqrt(fold(a·a)) * sqrt(fold(b·b)) doubles
    # in the same order, just materialized per vector instead of per pair.
    va = vectors.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        _norm(F.col(vec_col)).alias("__na"),
    )
    vb = vectors.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        _norm(F.col(vec_col)).alias("__nb"),
    )
    denom = F.col("__na") * F.col("__nb")
    verified = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.when(
                    denom != 0,
                    _dots(F.col("__va"), F.col("__vb")) / denom,
                ),
                6,
            ).alias("cosine"),
        )
    )
    if threshold is not None:
        verified = verified.filter(F.col("cosine") >= threshold)
    return verified


def topk_ann_lsh(
    vectors: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "q",
    n_planes: int = 8,
    max_hamming: int = 2,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: prune to vectors whose LSH signature is within
    ``max_hamming`` bits of the query's, then exact-score the survivors.

    At 100 TB the signature is a partition/bucket key — the scan prunes to
    matching buckets instead of filtering post-hoc; the shape below keeps the
    same semantics on the local tables.
    """
    sig_v = vectors.withColumn("__sig", lsh_signature(F.col(vec_col), dim, n_planes, seed))
    sig_q = query.withColumn("__qsig", lsh_signature(F.col(query_col), dim, n_planes, seed))
    joined = sig_v.crossJoin(F.broadcast(sig_q))
    pruned = joined.filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.col("__qsig"))) <= max_hamming
    )
    scored = pruned.withColumn(
        "score", F.round(cosine_similarity(F.col(vec_col), F.col(query_col)), 6)
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
        .drop(query_col, "__sig", "__qsig")
    )


# ---------------------------------------------------------------------------
# ANN: IVF (inverted file over a coarse quantizer)
# ---------------------------------------------------------------------------

def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (coarse quantization).
    Centroids are a driver-side constant list (trained offline / sampled);
    assignment is map-side only. At scale, write the table partitioned by
    ``cell`` so probes prune at the scan."""
    # Linear expression tree: one distances array + argmin. (A chained
    # when(d < best).otherwise(best) fold embeds the running best twice per
    # step — O(2^k) Catalyst nodes, which hangs analysis for k ≳ 20.)
    # One transform over the 2-D centroid literal instead of k independent
    # zip_with/aggregate chains: same per-centroid arithmetic in the same
    # order, k× fewer higher-order-function construction round trips.
    dists = F.transform(
        lit_doubles_2d([[float(x) for x in c] for c in centroids]),
        lambda c: l2_distance(F.col(vec_col), c),
    )
    cell = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
    return vectors.withColumn(out_col, cell)


# Above this many centroids the literal-expression assign embeds a multi-MB
# array tree in the plan (k × dim literals) and Catalyst analysis time blows
# up — switch to the Arrow-vectorized argmin, whose plan size is O(1).
IVF_EXPRESSION_MAX_K = 16


def ivf_assign_pandas(
    vectors: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Production-k coarse quantization: nearest-centroid assignment as an
    Arrow-batched pandas UDF. The centroid matrix rides the closure (one
    copy per executor, not per row or per plan node), and each batch is one
    BLAS matmul: ``d² = |v|² - 2·V·Cᵀ + |c|²`` over (batch × k) — no n×k×dim
    intermediate. Map-side only; at scale the output ``cell`` is the
    partition key the corpus is written under, so probes prune at the scan.

    Ties: argmin takes the first index, matching ``ivf_assign``'s
    array_position-of-min. (The expanded-form distance can differ from the
    direct form in the last ulp, so EXACT tie behavior across the two paths
    is not contractual — quantizer cells are equivalent under ties.)
    """
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    @pandas_udf("int")
    def _assign(col: pd.Series) -> pd.Series:
        vals = list(col)
        # NULL vector -> NULL cell, matching the expression twin (whose
        # NULL distances propagate); vstack over None would crash the job
        mask = [v is not None for v in vals]
        out = [None] * len(vals)
        live = [np.asarray(v, dtype=np.float64) for v, m in zip(vals, mask) if m]
        if live:
            V = np.vstack(live)
            # a NULL ELEMENT arrives as NaN: its d2 row is all-NaN and
            # argmin would return index 0 — a garbage cell that silently
            # diverges from the expression twin's NULL. NaN rows -> NULL
            # cell, so both paths agree on junk at any quantizer size.
            nan_rows = np.isnan(V).any(axis=1)
            d2 = (V * V).sum(axis=1)[:, None] - 2.0 * (V @ C.T) + c_sq[None, :]
            cells = np.argmin(np.where(nan_rows[:, None], np.inf, d2), axis=1)
            it = iter(zip(cells, nan_rows))
            def nxt():
                c, nr = next(it)
                return None if nr else int(c)
            out = [nxt() if m else None for m in mask]
        return pd.Series(out, dtype="Int32")

    return vectors.withColumn(out_col, _assign(F.col(vec_col)))


def topk_ivf(
    vectors: DataFrame,
    query: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_col: str = "q",
) -> DataFrame:
    """IVF top-k: score only vectors in the ``n_probe`` cells nearest to the
    query. Exact within probed cells; recall grows with n_probe. Assignment
    runs as pure expressions for small quantizers (oracle-replayable,
    whole-stage codegen) and switches to the Arrow argmin above
    ``IVF_EXPRESSION_MAX_K`` centroids (plan size stays O(1) at k=256+)."""
    if len(centroids) <= IVF_EXPRESSION_MAX_K:
        assigned = ivf_assign(vectors, centroids, vec_col)
    else:
        assigned = ivf_assign_pandas(vectors, centroids, vec_col)
    qrows = query.select(query_col).collect()
    if not qrows or qrows[0][0] is None:
        raise ValueError("topk_ivf requires one row with a non-NULL query vector")
    qrow = qrows[0][0]
    import math

    def dist(c):
        return math.sqrt(sum((float(a) - float(b)) ** 2 for a, b in zip(qrow, c)))

    probe_cells = sorted(range(len(centroids)), key=lambda i: dist(centroids[i]))[:n_probe]
    pruned = assigned.filter(F.col("cell").isin(probe_cells))
    return topk_brute_force(pruned, query, k, id_col, vec_col, query_col).drop("cell")


def train_ivf_centroids(
    vectors: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_fraction: float = 1.0,
    engine: str = "mllib",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Train the IVF coarse quantizer. ``engine="mllib"`` uses MLlib KMeans
    (seeded — fast, but results vary with partitioning); ``engine="exact"``
    uses the engine's own trainer (``operators/ml.kmeans``) whose means and
    inertia fold through DECIMAL, so the quantizer — and therefore every
    IVF cell assignment downstream — is bit-identical on any cluster
    layout. At 100 TB, train on a sample (``sample_fraction``) — quantizer
    quality saturates long before full-data training pays off — then
    assign the full corpus map-side via ``ivf_assign``."""
    train = vectors if sample_fraction >= 1.0 else vectors.sample(sample_fraction, seed)
    if engine == "exact":
        from .ml import kmeans

        _, centroids, _ = kmeans(
            train, k=k, vec_col=vec_col, id_col=id_col, max_iter=20
        )
        return centroids
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = train.select(array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"))
    model = KMeans(k=k, seed=seed, maxIter=20).fit(feats)
    return [c.tolist() for c in model.clusterCenters()]


def quantize_int8(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector int8 scalar quantization: the storage-scale path for
    embedding columns (4× smaller than float32, 8× than float64; the usual
    first step before IVF/PQ indexes). Each vector is min/max-normalized to
    [0, 255] and shifted to [-128, 127]; the (vmin, vmax) pair rides along
    so dequantization is local to the row — no global codebook, map-side
    only, zero shuffles at any corpus size.

    Returns (id, vmin, vmax, codes array<int>, max_abs_err) where
    max_abs_err is the per-vector max |dequantize(code) - x| reconstruction
    error (≤ half a quantization step by construction — property-tested).

    Float contract (oracle-exact): all arithmetic in double with the same
    association both engines — code = round((x - vmin) * 255 / (vmax -
    vmin)) - 128, dequant = vmin + (code + 128) * (vmax - vmin) / 255 —
    and round() is half-away-from-zero on non-negative inputs in both Spark
    (HALF_UP) and DuckDB (C round). Constant vectors (vmax == vmin) quantize
    to all-zero codes with zero error rather than dividing by zero.
    """
    e = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    df = vectors.select(F.col(id_col), e.alias("__e"))
    vmin, vmax = F.array_min("__e"), F.array_max("__e")
    df = df.withColumn("__vmin", vmin).withColumn("__vmax", vmax)
    lo, hi = F.col("__vmin"), F.col("__vmax")
    spread = hi != lo

    def _code(x):
        return F.when(
            spread,
            F.round((x - lo) * F.lit(255.0) / (hi - lo)).cast("int") - F.lit(128),
        ).otherwise(F.lit(0))

    def _dequant(c):
        return lo + (c + F.lit(128)).cast("double") * (hi - lo) / F.lit(255.0)

    codes = F.transform(F.col("__e"), _code)
    errs = F.zip_with(F.col("__e"), codes, lambda x, c: F.abs(_dequant(c) - x))
    return df.select(
        F.col(id_col),
        lo.alias("vmin"),
        hi.alias("vmax"),
        codes.alias("codes"),
        F.round(F.array_max(errs), 6).alias("max_abs_err"),
    )

"""Product Quantization (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search") — the vector-compression half of a large-scale
ANN index, next to the coarse IVF quantizer (``similarity.topk_ivf``) and
scalar int8 compression (``similarity.quantize_int8``).

Engine extension (the reference stops at pgvector brute-force top-k).

Scale design:
* TRAIN (driver-coordinated, sample-sized): the vector space splits into
  ``m`` subspaces; each gets its own k-codeword codebook from the engine's
  deterministic k-means (``operators/ml.kmeans``) run on the column SLICE —
  m small trainings over a sample, centroids held driver-side (m·k·(d/m) =
  d·k floats — KBs).
* ENCODE (map-side, zero shuffles): per subspace, argmin over the k
  codewords as a pure array expression — each vector compresses to m small
  ints (m bytes at k ≤ 256), a 32× compression at d=64/m=8 vs float32.
* SEARCH (ADC — asymmetric distance computation): the query builds an m×k
  lookup table of exact subspace distances ONCE driver-side; per encoded
  vector the approximate distance is m table lookups + a fold. No decode,
  no float vector ever re-materializes; TakeOrderedAndProject for top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ml import kmeans


def _subvector(vec_col, j: int, d_sub: int):
    """1-based slice of subspace j, elements cast to double."""
    return F.transform(
        F.slice(vec_col, j * d_sub + 1, d_sub), lambda x: x.cast("double")
    )


def train_pq(
    vectors: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 8,
    k: int = 16,
    max_iter: int = 5,
    sample_fraction: float = 1.0,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train m per-subspace codebooks of k codewords each. Deterministic:
    the underlying k-means seeds on the lowest ids and folds its means
    through DECIMAL, so codebooks are identical under any partitioning.
    Returns ``codebooks[m][k][d/m]``. The vector dimensionality must be
    divisible by ``m``."""
    dim = len(vectors.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d_sub = dim // m
    train = (
        vectors
        if sample_fraction >= 1.0
        else vectors.sample(sample_fraction, seed)
    )
    codebooks = []
    for j in range(m):
        sub = train.select(
            F.col(id_col), _subvector(F.col(vec_col), j, d_sub).alias("__sub")
        )
        _, cents, _ = kmeans(
            sub, k=k, vec_col="__sub", id_col=id_col, max_iter=max_iter
        )
        codebooks.append(cents)
    return codebooks


def _sq_l2_lit(vec_expr, centroid: list[float]):
    lit_c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(vec_expr, lit_c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode(
    vectors: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Add ``codes`` (array<int>, length m): per subspace, the id of the
    nearest codeword (ties break on the lower code). Pure map-side
    expressions — zero shuffles at any corpus size."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    per_sub = []
    for j, book in enumerate(codebooks):
        sub = _subvector(F.col(vec_col), j, d_sub)
        pairs = F.array(
            *[
                F.struct(_sq_l2_lit(sub, c).alias("d"), F.lit(i).alias("code"))
                for i, c in enumerate(book)
            ]
        )
        per_sub.append(F.array_min(pairs)["code"])
    return vectors.withColumn("codes", F.array(*per_sub))


def pq_adc_topk(
    encoded: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query's exact distance
    to every codeword of every subspace becomes an m×k literal lookup
    table; each row's approximate squared-L2 is m table lookups summed in
    ascending subspace order. Returns (id, adc_dist) ascending — the
    candidate stage a production index re-ranks with exact distances."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    lut = []
    for j, book in enumerate(codebooks):
        qs = [float(x) for x in query_vec[j * d_sub : (j + 1) * d_sub]]
        lut.append(
            [sum((a - b) * (a - b) for a, b in zip(qs, c)) for c in book]
        )
    lut_lit = F.array(
        *[F.array(*[F.lit(v) for v in row]) for row in lut]
    )
    dist = F.aggregate(
        F.transform(
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda j: F.element_at(
                F.element_at(lut_lit, j + 1), F.element_at(F.col("codes"), j + 1) + 1
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        encoded.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


def pq_search(
    vectors: DataFrame,
    encoded: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    candidates: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full production PQ search: ADC prunes the corpus to
    ``candidates`` ids (compressed domain, no float vectors touched), then
    ONLY those rows re-rank with exact L2 against the original vectors —
    the two-stage shape every PQ/IVF-PQ index uses. Recall is the candidate
    stage's; precision of the final ordering is exact. The re-rank join is
    a broadcast of the tiny candidate set, so the original vector column is
    read for ~``candidates`` rows, not the corpus."""
    from .similarity import topk_brute_force

    cand = pq_adc_topk(encoded, query_vec, codebooks, k=candidates, id_col=id_col)
    pruned = vectors.join(F.broadcast(cand.select(id_col)), id_col)
    spark = vectors.sparkSession
    qdf = spark.createDataFrame(
        [([float(x) for x in query_vec],)], "q array<double>"
    )
    return topk_brute_force(
        pruned, qdf, k=k, id_col=id_col, vec_col=vec_col, metric="l2"
    )

"""Similarity search over the ``embeddings`` table (vec_id, embedding:
array<float>, label).

* ``cosine_topk_bruteforce`` — exact top-k neighbors for a set of query
  vectors: broadcast the (small) query side, dot products via Catalyst
  higher-order ``aggregate``/``zip_with`` (JVM-side), window top-k.
  This is the correctness baseline and the oracle-checkable path.
* ``cosine_topk_lsh`` — scale path: random-hyperplane LSH bucketing
  (sign-bit sketch, deterministic planes), candidates from bucket equi-join,
  exact re-rank inside buckets. At 10^12 rows the bucket join bounds the
  candidate set; multi-probe = more sketches.
* ``near_dup_pairs_cosine`` — embedding near-dup pairs (cos >= τ) within the
  corpus via the same LSH blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> DataFrame:
    ca, cb = F.col(a), F.col(b)
    cos = _dot(ca, cb) / (_norm(ca) * _norm(cb))
    return df.withColumn(out, cos)


def cosine_topk_bruteforce(embeddings: DataFrame, queries: DataFrame,
                           k: int = 5) -> DataFrame:
    """queries(query_id, embedding) x embeddings(vec_id, embedding) -> exact
    top-k by cosine. Query side is broadcast; ranking window is partitioned
    by query_id (bounded state). Deterministic tie-break on vec_id."""
    q = queries.select(F.col("query_id"), F.col("embedding").alias("q_emb"))
    cand = (embeddings.alias("e")
            .join(F.broadcast(q), F.col("e.vec_id") != F.col("query_id")))
    cand = with_cosine(cand, "q_emb", "embedding", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "rank", "cosine"))


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (seeded LCG, no RNG state)."""
    planes = []
    state = 88172645463325252
    for _ in range(n_planes):
        v = []
        for _ in range(dim):
            # xorshift64
            state ^= (state << 13) & 0xFFFFFFFFFFFFFFFF
            state ^= state >> 7
            state ^= (state << 17) & 0xFFFFFFFFFFFFFFFF
            v.append(((state % 2000001) - 1000000) / 1000000.0)
        planes.append(v)
    return planes


def lsh_bucket(embedding, planes: list[list[float]]):
    """Sign-bit sketch of the embedding against fixed hyperplanes -> bigint."""
    bucket = F.lit(0).cast("bigint")
    for i, p in enumerate(planes):
        dot = _dot(embedding, F.array(*[F.lit(float(x)) for x in p]))
        bit = F.when(dot >= 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint"))
        bucket = bucket + bit * F.lit(1 << i).cast("bigint")
    return bucket


def cosine_topk_lsh(embeddings: DataFrame, queries: DataFrame, k: int = 5,
                    n_planes: int = 8, dim: int | None = None) -> DataFrame:
    """ANN top-k: candidates share the LSH bucket; exact rerank in-bucket.
    (Recall < 1; production would multi-probe neighboring buckets.)"""
    if dim is None:
        dim = len(embeddings.select("embedding").first()[0])
    planes = _hyperplanes(dim, n_planes)
    e = embeddings.withColumn("bucket", lsh_bucket(F.col("embedding"), planes))
    q = (queries.select("query_id", F.col("embedding").alias("q_emb"))
         .withColumn("bucket", lsh_bucket(F.col("q_emb"), planes)))
    cand = (e.join(F.broadcast(q), "bucket")
            .where(F.col("vec_id") != F.col("query_id")))
    cand = with_cosine(cand, "q_emb", "embedding", "cosine")
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(),
                                               F.col("vec_id").asc())
    return (cand.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "vec_id", "rank", "cosine"))


def near_dup_pairs_cosine(embeddings: DataFrame, threshold: float = 0.95,
                          n_planes: int = 8, dim: int | None = None) -> DataFrame:
    """Embedding near-duplicate pairs via LSH blocking + exact verify."""
    if dim is None:
        dim = len(embeddings.select("embedding").first()[0])
    planes = _hyperplanes(dim, n_planes)
    e = embeddings.withColumn("bucket", lsh_bucket(F.col("embedding"), planes))
    a = e.select(F.col("vec_id").alias("vec_a"),
                 F.col("embedding").alias("emb_a"), "bucket")
    b = e.select(F.col("vec_id").alias("vec_b"),
                 F.col("embedding").alias("emb_b"), "bucket")
    pairs = a.join(b, "bucket").where(F.col("vec_a") < F.col("vec_b"))
    pairs = with_cosine(pairs, "emb_a", "emb_b", "cosine")
    return (pairs.where(F.col("cosine") >= threshold)
            .select("vec_a", "vec_b", "cosine").distinct())

"""Similarity search over an embedding column (array<float>).

- :func:`cosine_topk` — brute-force exact top-k: the correctness baseline.
  Dot products are pure Column math (zip_with + aggregate, JVM-side);
  top-k per query via a window rank over the scored pairs. O(N²) — fine
  for verification scales, NOT the 100 TB path.

- :func:`lsh_ann_topk` — the scale path: random-hyperplane LSH (signed
  projections → bit signature → band buckets); candidates only within
  shared buckets, then exact re-rank. Sub-quadratic: shuffle is keyed by
  bucket, per-bucket fan-out bounded by bucket size. Hyperplanes are
  generated from a seeded RNG on the driver and shipped as literals —
  deterministic, no RNG on executors.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    # cast elements BEFORE multiplying: float32*float32 then cast loses
    # precision vs double math and breaks cross-engine argmax parity
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    df: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector: (vec_id, nn_id, rank).

    ``block_col`` restricts candidate pairs to equal-block rows (e.g. a
    coarse IVF cell) — the practical way to keep brute force usable as a
    re-rank stage. Deterministic tie-break: higher sim first, then smaller
    neighbor id.
    """
    q = df.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qv"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    c = df.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cv"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    pairs = q.join(c, on=(["blk"] if block_col else None)) if block_col else q.crossJoin(c)
    pairs = pairs.filter(F.col("qid") != F.col("cid"))
    sim = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = pairs.select("qid", "cid", sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("cid").alias("nn_id"),
            "rank",
            F.round("sim", 6).alias("cosine"),
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_ann_topk(
    df: DataFrame,
    dim: int,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via random-hyperplane LSH.

    signature bit i = sign(v · h_i); band buckets of n_planes/bands bits;
    candidates share ≥1 band bucket; exact cosine re-rank inside candidates.
    Recall rises with bands (more, smaller bands → more candidates).
    """
    rows_per_band = n_planes // bands
    planes = _hyperplanes(dim, n_planes, seed)

    def bit(i: int):
        h = F.array(*[F.lit(x) for x in planes[i]])
        return F.when(_dot(F.col(vec_col), h) >= 0, F.lit(1)).otherwise(F.lit(0))

    sig = F.array(*[bit(i) for i in range(n_planes)])
    with_sig = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sig.alias("sig"))

    banded = with_sig.select(
        "id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.array_join(
                            F.transform(
                                F.slice("sig", b * rows_per_band + 1, rows_per_band),
                                lambda x: x.cast("string"),
                            ),
                            "",
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "v", "bb.band", "bb.bucket")

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("qid"),
            F.col("a.v").alias("qv"),
            F.col("b.id").alias("cid"),
            F.col("b.v").alias("cv"),
        )
        .distinct()
    )
    sim = _dot(F.col("qv"), F.col("cv")) / (_norm(F.col("qv")) * _norm(F.col("cv")))
    scored = cand.select("qid", "cid", sim.alias("sim"))
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("vec_id"),
            F.col("cid").alias("nn_id"),
            "rank",
            F.round("sim", 6).alias("cosine"),
        )
    )

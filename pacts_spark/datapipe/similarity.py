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
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per vector: (vec_id, nn_id, rank, cosine).

    Vectorized mapInPandas: the candidate set (default: the whole input) is
    collected to a numpy matrix and shipped to executors in the UDF
    closure; each Arrow batch of queries does ONE BLAS matmul against it.
    This is the exact-scoring half of an IVF design — at 100 TB the
    candidate matrix is a partition's IVF cell (pass ``candidates``), not
    the full corpus. Queries never shuffle; work is embarrassingly
    parallel over input partitions.

    Deterministic tie-break: higher sim first, then smaller neighbor id
    (ties broken by numpy lexsort on (-sim, id)).
    """
    import numpy as np
    import pandas as pd

    cand = candidates if candidates is not None else df
    cand_pdf = cand.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).toPandas()
    cand_ids = cand_pdf["id"].to_numpy()
    M = np.array([np.asarray(v, dtype=np.float64) for v in cand_pdf["v"]])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)

    kk = k

    def score(batches):
        for pdf in batches:
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            S = Qn @ Mn.T  # (batch, n_candidates)
            qids = pdf[id_col].to_numpy()
            self_mask = qids[:, None] == cand_ids[None, :]
            S[self_mask] = -np.inf
            out_q, out_n, out_r, out_s = [], [], [], []
            for i in range(S.shape[0]):
                order = np.lexsort((cand_ids, -S[i]))[:kk]
                for r, j in enumerate(order, start=1):
                    if S[i, j] == -np.inf:
                        continue
                    out_q.append(qids[i])
                    out_n.append(cand_ids[j])
                    out_r.append(r)
                    out_s.append(round(float(S[i, j]), 6))
            yield pd.DataFrame(
                {"vec_id": out_q, "nn_id": out_n, "rank": out_r, "cosine": out_s}
            )

    return df.select(id_col, vec_col).mapInPandas(
        score, "vec_id long, nn_id long, rank int, cosine double"
    )


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine >= threshold — the exact
    near-duplicate detector over embeddings. Same vectorized design as
    :func:`cosine_topk`: one BLAS matmul per Arrow batch against the
    broadcast candidate matrix; O(N^2) scoring but only threshold-passing
    pairs are emitted. At corpus scale, run per LSH/IVF bucket."""
    import numpy as np
    import pandas as pd

    cand_pdf = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).toPandas()
    cand_ids = cand_pdf["id"].to_numpy()
    M = np.array([np.asarray(v, dtype=np.float64) for v in cand_pdf["v"]])
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            Q = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            S = Qn @ Mn.T
            qids = pdf[id_col].to_numpy()
            out_a, out_b, out_s = [], [], []
            for i in range(S.shape[0]):
                hits = np.nonzero((S[i] >= threshold) & (cand_ids > qids[i]))[0]
                for j in hits:
                    out_a.append(qids[i])
                    out_b.append(cand_ids[j])
                    out_s.append(round(float(S[i, j]), 6))
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_s})

    return df.select(id_col, vec_col).mapInPandas(
        score, "id_a long, id_b long, cosine double"
    )


def ivf_topk(
    df: DataFrame,
    block_col: str,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style exact top-k WITHIN coarse cells: candidates are restricted
    to rows sharing ``block_col`` (a cluster/label id). The scale shape of
    ANN: shuffle once on the cell id, then each cell is an independent
    dense matmul inside applyInPandas — no cross-cell pairs ever
    materialize. Deterministic tie-break (sim desc, id asc)."""
    import numpy as np
    import pandas as pd

    kk = k

    def per_block(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        M = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        S = Mn @ Mn.T
        np.fill_diagonal(S, -np.inf)
        out_q, out_n, out_r, out_s, out_b = [], [], [], [], []
        block = pdf[block_col].iloc[0]
        for i in range(len(ids)):
            order = np.lexsort((ids, -S[i]))[:kk]
            for r, j in enumerate(order, start=1):
                if S[i, j] == -np.inf:
                    continue
                out_q.append(ids[i])
                out_n.append(ids[j])
                out_r.append(r)
                out_s.append(round(float(S[i, j]), 6))
                out_b.append(block)
        return pd.DataFrame(
            {
                "vec_id": out_q,
                "nn_id": out_n,
                "rank": out_r,
                "cosine": out_s,
                block_col: out_b,
            }
        )

    out_schema = f"vec_id long, nn_id long, rank int, cosine double, {block_col} int"
    return df.select(id_col, vec_col, block_col).groupBy(block_col).applyInPandas(
        per_block, out_schema
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

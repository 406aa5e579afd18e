"""Deterministic k-means (datapipe/clusters.kmeans_assign): rounding
helper pinned against DuckDB, separable known-answer fixture, direct
differential vs the generated SQL twin, empty/degenerate edges."""

from __future__ import annotations


def test_kmeans_round_half_away_matches_duckdb():
    import duckdb

    from pacts_spark.datapipe.clusters import _round_half_away

    cases = [
        (3, 2),  # 1.5
        (-3, 2),  # -1.5
        (5, 2),  # 2.5
        (-5, 2),  # -2.5
        (7, 3),
        (-7, 3),
        (1, 3),
        (999_999_999, 7),
        (-123_456_789, 11),
        (0, 5),
        (1_000_001, 2),
        (-1_000_001, 2),
    ]
    rows = duckdb.sql(
        "SELECT "
        + ", ".join(
            f"CAST(round(CAST({s} AS DOUBLE) / {n}) AS BIGINT)" for s, n in cases
        )
    ).fetchone()
    for (s, n), want in zip(cases, rows):
        assert _round_half_away(s / n) == want, (s, n)


def test_kmeans_separates_two_blobs_and_is_deterministic(spark):
    from pacts_spark.datapipe.clusters import kmeans_assign

    # two well-separated 4-dim blobs; any 2-means must split them
    blob_a = [[0.9, 0.9, 0.9, 0.9], [0.8, 0.9, 0.8, 0.9], [0.95, 0.85, 0.9, 0.9]]
    blob_b = [[-0.9, -0.9, -0.9, -0.9], [-0.8, -0.9, -0.8, -0.9], [-0.85, -0.95, -0.9, -0.9]]
    rows = [(i, v) for i, v in enumerate(blob_a + blob_b)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, k=2, iters=2).collect()}
    assert len(set(got.values())) == 2
    assert got[0] == got[1] == got[2]
    assert got[3] == got[4] == got[5]
    assert got[0] != got[3]
    again = {r["vec_id"]: r["cluster"] for r in kmeans_assign(df, k=2, iters=2).collect()}
    assert got == again


def test_kmeans_matches_duckdb_twin_on_fixture(spark):
    import duckdb
    import pandas as pd

    from pacts_spark.datapipe.clusters import kmeans_assign, kmeans_oracle_sql

    # 20 vectors, 5 dims, deterministic pseudo-random-ish values; k=3,
    # 2 iterations — exercises reassignment and the centroid update
    vecs = [
        [((i * 7 + j * 13) % 19 - 9) / 10.0 for j in range(5)] for i in range(20)
    ]
    pdf = pd.DataFrame({"vec_id": list(range(20)), "embedding": vecs})
    df = spark.createDataFrame(
        [(i, v) for i, v in zip(pdf.vec_id, pdf.embedding)],
        "vec_id long, embedding array<float>",
    )
    got = (
        kmeans_assign(df, k=3, iters=2)
        .toPandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    # DuckDB must see the same float32 values Spark reads
    import pyarrow as pa

    tbl = pa.table(
        {
            "vec_id": pa.array(pdf.vec_id.tolist(), pa.int64()),
            "embedding": pa.array(vecs, pa.list_(pa.float32())),
        }
    )
    con.register("embeddings", tbl)
    want = (
        con.execute(kmeans_oracle_sql(k=3, iters=2, d=5))
        .df()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert got["vec_id"].tolist() == want["vec_id"].tolist()
    assert got["cluster"].tolist() == want["cluster"].tolist()


def test_kmeans_empty_and_fewer_rows_than_k(spark):
    from pacts_spark.datapipe.clusters import kmeans_assign

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert kmeans_assign(empty, k=4, iters=1).collect() == []
    tiny = spark.createDataFrame(
        [(1, [0.1, 0.2]), (2, [0.9, 0.8])], "vec_id long, embedding array<float>"
    )
    got = {r["vec_id"]: r["cluster"] for r in kmeans_assign(tiny, k=5, iters=2).collect()}
    assert set(got) == {1, 2}
    assert len(set(got.values())) == 2  # each row its own seed cluster

"""Near-duplicate CLUSTERING: connected components over dup pairs.

Pair detectors (exact, Jaccard, MinHash, SimHash, cosine) emit edges;
training-data pipelines need the GROUPS — one canonical document per
connected component, everything else dropped. This module turns an edge
list into (doc_id, cluster_id = min reachable id).

Scale design: iterative min-label propagation expressed as DataFrame
joins — per round, every node takes the min of its own label and its
neighbors' labels. Each round is one shuffle join (edges x labels) plus
one groupBy; rounds needed = component diameter, which for dedup graphs
is tiny (near-dup clusters are dense blobs, not chains). The round-count
cap + convergence check (a cheap count action on changed labels) bounds
the loop; at 10^12-doc scale swap the propagation step for the
alternating large-star/small-star rounds (Kiveris et al., "Connected
Components in MapReduce and Beyond") — same label algebra, O(log n)
rounds; the per-round plan here is already shaped for it (edge-keyed
shuffle, aggregate-only combine).

Determinism: labels are min(doc_id) — no RNG, no iteration-order
dependence (min is commutative/associative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_rounds: int = 20,
) -> DataFrame:
    """(node, cluster_id) for every node appearing in ``pairs``;
    cluster_id = the minimum node id in the node's connected component.

    Raises if the propagation has not converged after ``max_rounds`` —
    a diameter that large means the input is not a dedup graph.
    """
    # persist the (symmetrized) edge list: every round's convergence count
    # re-evaluates the edge lineage otherwise — when pairs come from a
    # candidate-generation pipeline (minhash/LSH), that re-runs the WHOLE
    # sketch per round (measured 20.7 s -> ~5 s for a 256-edge graph)
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_rounds):
        # neighbor minimum: push each node's label across its edges
        neighbor_min = (
            edges.join(labels, edges["src"] == labels["node"])
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
        )
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()  # no-op on round 0's unpersisted frame
        labels = new_labels
        if changed == 0:
            # the returned frame stays persisted: its lineage spans every
            # round, so dropping the cache would re-run the whole loop on
            # the caller's first action
            break
    else:
        labels.unpersist()
        edges.unpersist()
        raise RuntimeError(f"connected_components: no convergence in {max_rounds} rounds")
    edges.unpersist()  # final labels are materialized; edge cache done
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def dedup_clusters(
    df: DataFrame | None,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster assignment for deduplication: (doc_id, cluster_id,
    is_canonical); canonical = the min-id member, the row a dedup pipeline
    KEEPS. With ``df`` given, EVERY document gets a row — documents in no
    dup pair are their own singleton cluster (canonical); with ``df=None``
    only paired documents are returned."""
    cc = connected_components(pairs)
    if df is not None:
        cc = (
            df.select(F.col(id_col).alias("doc_id"))
            .join(cc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
            )
        )
    return cc.select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )

"""Duplicate-cluster assignment: connected components over near-dup pairs.

Pair detectors (MinHash-LSH, SimHash, embedding-LSH, exact-hash) emit EDGES;
dedup at corpus scale needs the transitive closure — a doc chained to a
cluster only through intermediates (a~b, b~c) must land in the same cluster
as its endpoints, which a per-pair keep/drop policy cannot guarantee a
canonical-id for.

Spark-first shape: the alternating large-star / small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14 —
public paper). Each round is two hash aggregations + two equi-joins over the
edge list; the edge set provably converges in O(log^2 n) rounds (O(log n) in
practice) to a star forest where every node points at its component minimum.
No collect of the edge list, no per-row Python; skewed high-degree nodes are
exactly what large-star is designed to flatten. Lineage is truncated per
round with ``localCheckpoint`` (an iterative plan otherwise grows without
bound); at cluster scale swap for ``checkpoint`` on reliable storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canonical_pairs(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Distinct (u, v) with u >= v — self-loops KEPT so the node set is
    derivable from this one table (they are filtered out of the working
    edge set separately)."""
    return pairs.select(
        F.greatest(id_a, id_b).alias("u"), F.least(id_a, id_b).alias("v")
    ).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """For every node u, connect its strictly-larger neighbours to
    min(N(u) ∪ {u}). Input/output: directed edge list (u, v)."""
    bidir = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = (
        bidir.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("mv", "u").alias("m"))
    )
    return (
        bidir.join(m, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For every node u over its smaller neighbours N(u) (edges directed
    u > v), connect N(u) ∪ {u} to the minimum neighbour."""
    d = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    m = d.groupBy("u").agg(F.min("v").alias("m"))
    out = d.join(m, "u").select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        m.select(F.col("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _checksum(edges: DataFrame) -> tuple[int, int]:
    # bit_xor, not sum: order-insensitive, cannot overflow under ANSI mode,
    # and collision-safe because the edge list is distinct
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 50,
) -> DataFrame:
    """(id, cluster_id) for every node that appears in ``pairs``; cluster_id
    is the component's minimum member id (deterministic, orderable ids).

    Each round: large-star then small-star, each a groupBy-min + equi-join
    (two shuffles) over the current edge list. Convergence is detected by an
    order-insensitive (count, xxhash64-sum) checksum — two scalar aggregates,
    no edge-list collect. Raises RuntimeError if ``max_rounds`` is exhausted
    (cannot happen for max_rounds ≥ ~2·log2(n) by the SoCC'14 bound).

    The upstream ``pairs`` plan is often EXPENSIVE (an LSH or Jaccard
    detector); it is materialized exactly once — the canonicalized pair
    table is checkpointed first and both the node set and the working edge
    set derive from that checkpoint (r4: the node set used to re-run the
    whole detector a second time)."""
    base = _canonical_pairs(pairs, id_a, id_b).localCheckpoint(eager=True)
    nodes = base.select(F.col("u").alias("id")).union(
        base.select(F.col("v").alias("id"))).distinct()
    edges = base.where(F.col("u") != F.col("v"))
    prev = _checksum(edges)
    for _ in range(max_rounds):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        cur = _checksum(edges)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
    # converged star forest: every non-min node points at its component min
    labels = edges.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    return (
        nodes.join(labels, "id", "left")
        .select("id", F.coalesce("cluster_id", "id").alias("cluster_id"))
    )


def duplicate_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Cluster assignment for a whole corpus: every row of ``df`` gets a
    cluster_id (= the minimum doc id of its duplicate cluster; singletons map
    to themselves) and is_canonical. Downstream dedup = filter is_canonical."""
    cc = connected_components(pairs, id_a, id_b)
    return (
        df.select(id_col)
        .join(cc.withColumnRenamed("id", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
            (F.coalesce("cluster_id", F.col(id_col)) == F.col(id_col)).alias("is_canonical"),
        )
    )

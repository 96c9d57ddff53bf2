"""Distributed connected components (E19f) — turns the dedup ladder's PAIR
output (minhash/jaccard/embedding candidates) into per-document CLUSTER
assignments, the final step of dedup accounting: "this corpus is N docs in
M clusters; keep one canonical doc per cluster".

Algorithm: iterative min-label propagation with pointer jumping — the
public MapReduce CC recipe (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14; same family as GraphX's
ConnectedComponents, which is not available to PySpark DataFrames without
GraphFrames). Each round:

  1. neighbor step: every node takes min(own label, neighbors' labels)
     — one shuffle on node id;
  2. pointer-jump step: label <- label(label), halving chain depth
     — a second self-join shuffle.

Rounds needed: O(log diameter) thanks to (2); dedup-cluster graphs have
tiny diameters, so 3-5 rounds in practice. Each round ends in an eager
``localCheckpoint`` — without it the logical plan doubles every iteration
and Catalyst analysis time explodes (the classic iterative-DataFrame trap).
The convergence test is one ``limit(1).count()`` action per round on the
changed-label set, so the loop does no driver-side data movement: labels
never leave the cluster.

At 100 TB: the state is one (id, comp) row per node — partitioned by id,
orders of magnitude smaller than the corpus itself; the edge table is the
candidate-pair output, already pruned by LSH banding / df-caps upstream.
Replace localCheckpoint with a reliable checkpoint dir on a real cluster
(executor loss mid-loop re-runs from the last checkpoint, not from zero).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """Label every node with the MINIMUM node id reachable from it.

    ``edges`` is an undirected pair list (direction ignored, self-loops
    dropped). ``nodes`` optionally supplies the full node universe so
    isolated nodes (docs with no duplicate) still get a component — their
    own id. Returns (id, component); the fixpoint is unique, so the result
    is deterministic regardless of iteration order.
    """
    e = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).filter(F.col("a") != F.col("b"))
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()

    if nodes is not None:
        node_df = nodes.select(F.col(id_col).alias("id")).distinct()
        # restrict edges to the caller's universe: a stale edge referencing
        # a filtered-out doc must neither resurrect it in the output nor
        # leak its id as a component label (both endpoints checked)
        sym = sym.join(
            node_df.withColumnRenamed("id", "a"), on="a", how="left_semi"
        ).join(node_df.withColumnRenamed("id", "b"), on="b", how="left_semi")
    else:
        node_df = sym.select(F.col("a").alias("id")).distinct()
    # the edge table feeds every round: cut its lineage ONCE so the
    # symmetrize + distinct shuffle does not re-run per iteration
    sym = sym.localCheckpoint(eager=False)
    labels = node_df.select("id", F.col("id").alias("comp")).localCheckpoint()

    for _ in range(max_iter):
        # 1. neighbor step: min over own + neighbors' labels
        nbr = sym.join(labels, sym["b"] == labels["id"]).select(
            sym["a"].alias("id"), "comp"
        )
        new = (
            nbr.unionAll(labels)
            .groupBy("id")
            .agg(F.min("comp").alias("comp"))
            .localCheckpoint()
        )
        # 2. pointer jump: comp <- label(comp). Every comp value IS a node
        # id (labels only ever take values from the initial id set), so the
        # lookup is a join against the label table itself.
        jump = new.select(F.col("id").alias("cid"), F.col("comp").alias("ccomp"))
        new = (
            new.join(jump, new["comp"] == jump["cid"], "left")
            .select("id", F.coalesce("ccomp", "comp").alias("comp"))
            .localCheckpoint()
        )
        changed = (
            new.withColumnRenamed("comp", "nc")
            .join(labels, "id")
            .filter(F.col("nc") != F.col("comp"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    return labels.select("id", F.col("comp").alias("component"))


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a directed edge list — the canonical
    iterative-numeric workload (importance scoring over a link/citation/
    interaction graph). ``iterations`` is fixed rather than
    convergence-tested so the computation is a finite, replayable operation
    tree: an external oracle can unroll exactly the same N rounds.

    Per round, each node's rank becomes ``(1−d)/n + d·Σ in-neighbors
    rank/outdeg`` — one join of the rank table to the edge list and one
    aggregation on the destination, both partitioned by node id. The rank
    state is |nodes| rows, tiny next to the edges; ``localCheckpoint``
    after each round cuts the growing lineage (same iterative-DataFrame
    trap as ``connected_components``). Dangling nodes (no in-edges) settle
    at the teleport term. The node count is the one driver-side scalar
    (bounded metadata)."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint(
        eager=False  # scanned every round — cut the upstream lineage once
    )
    nodes = e.select(F.col("src").alias("id")).union(
        e.select(F.col("dst").alias("id"))
    ).distinct().localCheckpoint(eager=False)
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("__outdeg")).localCheckpoint(
        eager=False  # ditto: the out-degree table is loop-invariant
    )
    ranks = nodes.select("id", (F.lit(1.0) / F.lit(float(n))).alias("r"))
    teleport = F.lit((1.0 - damping)) / F.lit(float(n))
    for _ in range(iterations):
        contrib = (
            ranks.join(e, ranks["id"] == e["src"])
            .join(deg, on="src")
            .select(F.col("dst").alias("id"), (F.col("r") / F.col("__outdeg")).alias("__c"))
            .groupBy("id")
            .agg(F.sum("__c").alias("__in"))
        )
        ranks = nodes.join(contrib, on="id", how="left").select(
            "id",
            (teleport + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))).alias("r"),
        ).localCheckpoint(eager=False)
    return ranks


def label_propagation(
    edges: DataFrame,
    iterations: int = 4,
    src: str = "src",
    dst: str = "dst",
    nodes: DataFrame | None = None,
    id_col: str = "id",
) -> DataFrame:
    """Fixed-iteration synchronous min-label propagation over an undirected
    edge list — community seeding on the dedup ladder's similarity graph.

    Where :func:`connected_components` runs to FIXPOINT (with pointer
    jumping, for exact transitive closure), this is the bounded-round
    variant: after N rounds every node carries the smallest label within N
    hops, the standard label-propagation seeding for near-dup community
    detection where the effective diameter is known-small. The fixed round
    count makes the operation tree finite and replayable, so an external
    oracle can unroll exactly the same N rounds (the same contract as
    ``pagerank``); min-label updates are order-free, hence deterministic.

    Per round: one join of the label table to the symmetrized edges + one
    min-aggregate on node id — a single shuffle on the id, state |nodes|
    rows, lineage cut per round with ``localCheckpoint`` (the iterative-
    DataFrame discipline shared by the other graph loops). At 100 TB the
    edge list is the LSH/fingerprint candidate output, already pruned
    upstream; labels never leave the cluster.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).filter(
        F.col("a") != F.col("b")
    )
    sym = e.unionAll(e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    if nodes is not None:
        node_df = nodes.select(F.col(id_col).alias("id")).distinct()
        # same universe restriction as connected_components: stale edges
        # outside the caller's node set are ignored, not propagated
        sym = sym.join(
            node_df.withColumnRenamed("id", "a"), on="a", how="left_semi"
        ).join(node_df.withColumnRenamed("id", "b"), on="b", how="left_semi")
    else:
        node_df = sym.select(F.col("a").alias("id")).distinct()
    sym = sym.localCheckpoint(eager=False)  # one symmetrize, not one per round
    labels = node_df.select("id", F.col("id").alias("label")).localCheckpoint()
    for _ in range(iterations):
        nbr = sym.join(labels, sym["b"] == labels["id"]).select(
            sym["a"].alias("id"), "label"
        )
        labels = (
            nbr.unionAll(labels)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .localCheckpoint()
        )
    return labels

"""Graph algorithms over pair tables: connected components for duplicate
clustering.

Near-dup detection (MinHash/SimHash/embedding LSH — operators/
dedup_approx.py) emits PAIRS; a training-data pipeline needs CLUSTERS:
"these 17 documents are one logical document, keep exactly one". That is
connected components over the pair graph, then a deterministic canonical
pick per component.

Implementation: iterative min-label propagation as a driver-controlled
loop of DataFrame joins — the canonical Spark shape for iterative graph
algorithms (a driver loop over DISTRIBUTED steps is not a driver-side
data loop; each iteration is one shuffle join + one aggregation, and the
per-iteration ``count()`` action only reads a 1-row convergence metric).
Iterations are bounded by the component diameter, which for near-dup
graphs is tiny (clusters are cliques-ish: every member collides with
most others in some LSH band). Each iteration's labels are persisted and
the previous iteration unpersisted, so lineage stays O(1) instead of
growing a 2^iter plan.

At 10^9+ edges you would switch the propagation step to the
large-star/small-star formulation (alternating, skew-resistant — each
round connects every node to its component minimum faster than plain
propagation) — same driver-loop skeleton, different join step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Label each vertex with the minimum vertex id reachable from it
    (the component id). ``pairs`` is an undirected edge list; isolated
    vertices may be supplied via ``vertices`` (one ``id`` column) and
    come back as their own singleton component.

    Returns (id, cluster_id). Deterministic: min-id labels do not depend
    on join or partition order. Raises RuntimeError if a fixpoint is not
    OBSERVED within ``max_iter`` rounds — silently returning partial
    labels would split one logical cluster into several, which
    downstream canonical-pick logic cannot detect. Convergence detection
    costs one confirming round (changed == 0), so the largest component
    diameter guaranteed to pass is ``max_iter - 1``; a diameter of
    exactly ``max_iter`` raises even though the final labels happen to
    be complete (raise ``max_iter`` rather than reasoning about that
    edge).

    Cache ownership: the returned labels DataFrame is persisted (the
    iteration requires it — unpersisted lineage doubles per round).
    Spark's cache manager keys entries by analyzed plan, so repeated
    invocations over the same input reuse one entry rather than
    accumulating; callers that are done with the result may
    ``.unpersist()`` it.
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = edges.select(F.col("a").alias("id")).distinct()
    if vertices is not None:
        labels = labels.union(vertices.select(F.col(vertices.columns[0]).alias("id"))).distinct()
    labels = labels.select("id", F.col("id").alias("label")).persist()
    labels.count()  # materialize before the loop
    edges = edges.persist()

    converged = False
    for _ in range(max_iter):
        # candidate labels arriving over edges, merged with current labels
        prop = labels.join(edges, labels["id"] == edges["a"]).select(
            F.col("b").alias("id"), "label"
        )
        new_labels = (
            labels.select("id", "label").union(prop)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
            .persist()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "_old"), "id")
            .filter(F.col("label") != F.col("_old"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    edges.unpersist()
    if not converged:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components observed no fixpoint within {max_iter} "
            f"rounds (guaranteed-supported component diameter is "
            f"{max_iter - 1}); raise max_iter, or switch the propagation "
            "step to large-star/small-star for long-chain graphs"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))


def shared_neighbor_pairs(
    edges: DataFrame,
    hub: str = "hub",
    member: str = "member",
    max_bucket: int = 1000,
) -> DataFrame:
    """Enumerate pairs of distinct members that share a hub vertex
    (member -edge-> hub <-edge- member): the generic two-hop
    pair-ENUMERATION shape (co-collection objects, co-author pairs,
    co-citation). Output (hub, member_a, member_b) with
    member_a < member_b.

    A hub with n members materializes n(n-1)/2 join rows, so an
    unbounded self-join is the same O(n^2) failure mode LSH banding
    guards against (dedup_approx.minhash_lsh_candidates): one
    10^6-member hub is 5*10^11 intermediate rows. Hubs larger than
    ``max_bucket`` are therefore DROPPED before the join — counted as a
    window on the same (hub) key the self-join shuffles on, so the
    bound rides the join's own exchange instead of adding one. Real
    pipelines route oversized hubs to a dedicated pass (or, when only
    pair COUNTS are needed, skip enumeration entirely:
    ``groupBy(hub).count()`` then n*(n-1)/2 — zero joins; see
    queries.kg_graph_shared_collection_pairs).

    Callers whose ``edges`` lineage contains a Python UDF should
    persist it first — the self-join's two sides do not share
    exchanges (verified on Spark 4.1), so each side re-evaluates the
    child."""
    from pyspark.sql import Window

    dedup = edges.select(
        F.col(hub).alias("hub"), F.col(member).alias("member")
    ).distinct()
    w = Window.partitionBy("hub")
    bounded = (
        dedup.withColumn("_n", F.count("*").over(w))
        .filter(F.col("_n") <= max_bucket)
        .drop("_n")
    )
    a = bounded.select("hub", F.col("member").alias("member_a"))
    b = bounded.select("hub", F.col("member").alias("member_b"))
    return (
        a.join(b, "hub")
        .filter(F.col("member_a") < F.col("member_b"))
        .select("hub", "member_a", "member_b")
    )


def dedup_clusters(
    pairs: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Resolve near-dup PAIRS into per-document cluster assignments over
    the full corpus: every document gets (doc_id, cluster_id, keep) where
    cluster_id is the min doc id of its component (singletons cluster
    with themselves) and ``keep`` marks the one canonical survivor per
    cluster — the deterministic min-id pick a dedup pipeline drops
    against."""
    comps = connected_components(
        pairs, vertices=docs.select(id_col), src="doc_a", dst="doc_b"
    )
    return (
        comps.select(F.col("id").alias(id_col), "cluster_id")
        .withColumn("keep", (F.col(id_col) == F.col("cluster_id")))
    )

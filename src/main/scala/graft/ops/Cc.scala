package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared connected-components kernel: min-label propagation with
  * POINTER JUMPING (label(x) := label(label(x)) each round), so the
  * round count is O(log diameter) rather than O(diameter). Used by
  * the text near-dup cluster engine (dedup_clusters,
  * dedup_semantic's label stage) and the graph family
  * (graph_connected_components) — one loop, not per-family forks.
  *
  * Scale shape per round: one |E|-sized hash join against the label
  * relation + one |V|-keyed min-aggregate + one |V|⋈|V| label-lut
  * join — every relation is keyed by vertex id, nothing is ever
  * collected. localCheckpoint truncates lineage (per-round replans
  * stay O(1) over an unbounded round count); superseded rounds are
  * unpersisted explicitly (ContextCleaner GC is too lazy to rely on
  * across a multi-round loop), tracked by diffing
  * sc.getPersistentRDDs ids around each checkpoint — safe under
  * concurrent ops because only ids inside this loop's own lineage
  * are ever freed (see Rounds.scala for the convention's rationale).
  * Convergence = the label-sum fixpoint (labels only ever decrease,
  * so an unchanged sum means an unchanged labeling); a silent cap
  * exit would emit WRONG labels, so the cap throws loudly.
  */
private[graft] object Cc {

  /** @param edges    directed edge list with columns (src, dst);
    *                 pass a symmetrized relation for undirected CC
    *                 (both callers do)
    * @param maxRounds loud-failure bound on pointer-jumping rounds
    *                 (covers component diameter ~2^maxRounds)
    * @param opName   used in the failure message
    * @return one row per vertex appearing in `edges`: (v, label)
    *         where label = min vertex id in the component
    */
  def minLabelComponents(edges0: DataFrame, maxRounds: Int, opName: String): DataFrame = {
    val s = edges0.sparkSession
    val edges = edges0.select(col("src"), col("dst")).cache()
    val sc = s.sparkContext
    def persistedIds: Set[Int] = sc.getPersistentRDDs.keySet.toSet
    var before = persistedIds
    var labels = edges.select(col("src").as("v")).distinct()
      .withColumn("label", col("v"))
      .localCheckpoint()
    var labelIds = persistedIds -- before
    // null-safe: sum over an EMPTY vertex set is NULL (an empty edge
    // relation is a legal input — every vertex is then a singleton
    // for the caller to fill in); 0 makes the loop converge round 1
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum(col("label"))).head()
      if (r.isNullAt(0)) 0L else r.getLong(0)
    }
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < maxRounds) {
      val viaNeighbors = edges
        .join(labels, edges("dst") === labels("v"))
        .select(edges("src").as("v"), col("label"))
      val minned = labels.unionByName(viaNeighbors)
        .groupBy("v").agg(min(col("label")).as("label"))
      // pointer jump: follow the label to ITS label (label(x) <= x
      // monotonically, so the jump only ever lowers labels further)
      val lut = minned.select(col("v").as("lid"), col("label").as("llabel"))
      before = persistedIds
      val next = minned.join(lut, minned("label") === lut("lid"))
        .select(minned("v"), col("llabel").as("label"))
        .localCheckpoint() // eager: materialized before the old round is freed
      val nextIds = persistedIds -- before
      val nextSum = labelSum(next)
      labelIds.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
      labelIds = nextIds
      labels = next
      converged = nextSum == prevSum // labels only ever decrease
      prevSum = nextSum
      rounds += 1
    }
    // the FINAL round's checkpoint stays persisted — the returned plan
    // reads it; ContextCleaner reclaims it when the plan is GC'd
    if (!converged)
      throw new IllegalStateException(
        s"$opName: min-label propagation did not converge in $maxRounds " +
          s"pointer-jumping rounds (component diameter > ~2^$maxRounds?)")
    edges.unpersist()
    labels
  }
}

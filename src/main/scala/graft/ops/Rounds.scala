package graft.ops

import org.apache.spark.sql.DataFrame

/** Bookkeeping for iterative-loop checkpoints. `localCheckpoint`
  * truncates lineage (keeps per-round replans O(1)) but parks the
  * round's blocks in executor storage, and the checkpointed RDD is
  * not reachable through a public Dataset API — so superseded rounds
  * are tracked by diffing `sc.getPersistentRDDs` ids around the
  * checkpoint call and freed explicitly (ContextCleaner GC is too
  * lazy to rely on across a loop; same convention as the dedup CC
  * engine at Dedup.clustersComputed). Under concurrent op execution
  * the id diff can over-capture a neighbor's blocks; unpersist is
  * correctness-neutral (Spark recomputes), so the worst case is a
  * perf hiccup, not a wrong result.
  */
private[ops] object Rounds {

  /** Eagerly checkpoint `df`, returning it plus the RDD ids the call
    * persisted (pass them to [[free]] once the round is superseded).
    */
  def checkpoint(df: DataFrame): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val before = sc.getPersistentRDDs.keySet.toSet
    val out = df.localCheckpoint()
    (out, sc.getPersistentRDDs.keySet.toSet -- before)
  }

  def free(df: DataFrame, ids: Set[Int]): Unit = {
    val sc = df.sparkSession.sparkContext
    ids.foreach(id => sc.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }
}

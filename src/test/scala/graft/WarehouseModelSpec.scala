package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the warehouse-modeling + selection ops
  * added in round 6 (meta_table_stats, etl_surrogate_key,
  * etl_data_vault, graph_lpa, exp_token_budget) — properties the
  * DuckDB hash gate can't see: cross-op consistency, key density,
  * budget feasibility, community sanity.
  */
class WarehouseModelSpec extends AnyFunSuite with SparkSuite {

  private def run(name: String) = Registry.byName(name).run(spark, sfDir)

  test("meta_table_stats: counts agree with the raw tables") {
    val stats = run("meta_table_stats").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val nCust = Tables.load(spark, sfDir, "customer").count()
    val nOrd = Tables.load(spark, sfDir, "orders").count()
    assert(stats(("customer", "c_custkey")).getLong(2) == nCust)
    assert(stats(("orders", "o_orderkey")).getLong(2) == nOrd)
    // business keys are unique: NDV == non-null == rows
    val ck = stats(("customer", "c_custkey"))
    assert(ck.getLong(3) == nCust && ck.getLong(4) == nCust)
    // canonical min/max on a decimal column carries 2 decimals
    val bal = stats(("customer", "c_acctbal"))
    assert(bal.getString(5).matches("-?\\d+\\.\\d{2}"))
    assert(bal.getString(6).matches("-?\\d+\\.\\d{2}"))
  }

  test("etl_surrogate_key: keys are dense 1..N and functionally map the business key") {
    val sk = run("etl_surrogate_key").cache()
    val perCust = sk.select("o_custkey", "cust_sk").distinct()
    // one surrogate per business key
    assert(perCust.groupBy("o_custkey").count().filter(col("count") > 1).count() == 0)
    val mn = perCust.agg(min("cust_sk")).head().getLong(0)
    val mx = perCust.agg(max("cust_sk")).head().getLong(0)
    val nDim = Tables.load(spark, sfDir, "customer").select("c_custkey").distinct().count()
    // dense: sk range is 1..|dimension| (facts may not touch every key,
    // but every minted key is within the dense range)
    assert(mn >= 1 && mx <= nDim)
    // every fact row got exactly one sk
    assert(sk.count() == Tables.load(spark, sfDir, "orders").count())
    sk.unpersist()
  }

  test("etl_data_vault: hub/link/sat cardinalities and hashdiff change detection") {
    val v = run("etl_data_vault").cache()
    val byTable = v.groupBy("vault_table").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCust = Tables.load(spark, sfDir, "customer").count()
    val nOrd = Tables.load(spark, sfDir, "orders").count()
    assert(byTable("hub_customer") == nCust)
    assert(byTable("sat_customer") == nCust)
    assert(byTable("hub_order") == nOrd)
    assert(byTable("link_customer_order") == nOrd)
    // hash keys are unique within each hub (md5 collision-free here)
    assert(v.filter(col("vault_table") === "hub_customer")
      .select("hk").distinct().count() == nCust)
    // the satellite hashdiff DETECTS CHANGE: same key + changed
    // attribute ⇒ different hashdiff (recompute one row perturbed)
    val one = v.filter(col("vault_table") === "sat_customer").limit(1).collect()(0)
    val perturbed = Tables.load(spark, sfDir, "customer")
      .filter(col("c_custkey").cast("string") === one.getString(2))
      .select(md5(concat_ws("|", col("c_name"), col("c_nationkey").cast("string"),
        (col("c_acctbal") + 1.0).cast("decimal(18,2)").cast("string"),
        col("c_mktsegment"))).as("hd"))
      .head().getString(0)
    assert(perturbed != one.getString(3))
    v.unpersist()
  }

  test("graph_lpa: full vertex coverage, size bookkeeping, and coarser-than-CC communities") {
    val lpa = run("graph_lpa").cache()
    val verts = run("sim_knn_graph")
    val allV = verts.select(col("vec_id")).unionAll(verts.select(col("neighbor_id")))
      .distinct().count()
    assert(lpa.count() == allV)
    // community_size bookkeeping is exact
    val bad = lpa.groupBy("community").agg(
        count(lit(1)).as("n"), first("community_size").as("sz"))
      .filter(col("n") =!= col("sz")).count()
    assert(bad == 0)
    // LPA labels propagate: strictly fewer communities than vertices
    val nComm = lpa.select("community").distinct().count()
    assert(nComm < allV && nComm > 1)
    lpa.unpersist()
  }

  test("etl_wap: staged rows are exactly published + quarantined") {
    val m = run("etl_wap").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("staged_rows") == m("published_rows") + m("quarantined_rows"))
    // the injected violations really are rejected
    assert(m("null_key_rows") > 0 && m("dup_key_rows") > 0)
    assert(m("quarantined_rows") >= m("null_key_rows"))
  }

  test("etl_calendar_dim: dense spine conserving total activity") {
    val cal = run("etl_calendar_dim").cache()
    val n = cal.count()
    val mn = cal.agg(min("day_num")).head().getLong(0)
    val mx = cal.agg(max("day_num")).head().getLong(0)
    assert(n == mx - mn + 1) // no gaps, no dups
    val total = cal.agg(sum("n_events")).head().getLong(0)
    assert(total == Tables.events(spark, sfDir).count())
    assert(cal.filter(col("dow") < 0 || col("dow") > 6).count() == 0)
    cal.unpersist()
  }

  test("samp_hard_negatives: sims in the negative band, below the near-dup threshold") {
    val hn = run("samp_hard_negatives").cache()
    assert(hn.count() > 0)
    assert(hn.filter(col("sim4") < 2000L || col("sim4") >= 4000L).count() == 0)
    assert(hn.groupBy("vec_id").count().agg(max("count")).head().getLong(0) <= 2)
    hn.unpersist()
  }

  test("graph_modularity: edge and degree mass bookkeeping closes") {
    val q = run("graph_modularity").cache()
    val g = run("sim_knn_graph")
    val m = g.select(
        least(col("vec_id"), col("neighbor_id")).as("a"),
        greatest(col("vec_id"), col("neighbor_id")).as("b"))
      .distinct().count()
    val sums = q.agg(sum("internal_edges"), sum("degree_sum")).head()
    assert(sums.getLong(0) <= m) // internal edges can never exceed all edges
    assert(sums.getLong(1) == 2 * m) // handshake lemma over the partition
    q.unpersist()
  }

  test("emb_coreset: distinct centers and a monotone coverage curve") {
    val cs = run("emb_coreset").collect()
    assert(cs.length == 8)
    assert(cs.map(_.getLong(1)).distinct.length == 8)
    // farthest-point traversal: once the globally farthest point is
    // taken (step 2), every later pick is nearer its closest center —
    // the coverage sim at selection is non-decreasing from step 2 on
    val curve = cs.sortBy(_.getLong(0)).map(_.getLong(2)).drop(1)
    assert(curve.zip(curve.tail).forall { case (a, b) => a <= b },
      s"coverage curve not monotone: ${curve.toSeq}")
  }

  test("exp_token_budget: per-lang totals within budget and selection is the quality prefix") {
    val sel = run("exp_token_budget").cache()
    // budget respected per language
    val over = sel.groupBy("lang").agg(max("cum_tokens").as("m"))
      .filter(col("m") > 2000L).count()
    assert(over == 0)
    // every language is represented (budget ≫ one doc)
    assert(sel.select("lang").distinct().count() ==
      Tables.load(spark, sfDir, "documents").select("lang").distinct().count())
    // prefix property: a doc with STRICTLY higher quality than the
    // worst selected doc of its lang sorts strictly earlier, and the
    // cumulative sum is monotone along that order — so its own prefix
    // sum is ≤ the worst selected doc's, which fit. It MUST therefore
    // be selected; any counterexample breaks greedy-prefix semantics.
    val worst = sel.groupBy("lang").agg(min("quality_ppm").as("wq"))
    val docs = run("txt_quality").select("doc_id", "quality_ppm")
      .join(Tables.load(spark, sfDir, "documents").select("doc_id", "lang"), "doc_id")
    val skippedBetter = docs.join(worst, "lang")
      .join(sel.select(col("doc_id"), lit(1).as("in_sel")), Seq("doc_id"), "left")
      .filter(col("in_sel").isNull && col("quality_ppm") > col("wq"))
    assert(skippedBetter.count() == 0)
    sel.unpersist()
  }
}

package graft.ops

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph algebra over warehouse relations — the capability
  * class (Pregel-style fixed-point computation) that none of the
  * single-pass operators exercise. The dedup family's connected
  * components is one instance; this adds the other canonical one.
  */
object GraphOps {

  // ---------------------------------------------------------------
  // graph_pagerank — PageRank over the bipartite customer–supplier
  // purchase graph (who-bought-from-whom, undirected as two directed
  // edges so the walk has no sinks), THE canonical iterative
  // join-aggregate workload. Three damped iterations, unrolled, in
  // EXACT integer ppm mass: r₀ = 10⁶ per vertex;
  // r_{i+1}(v) = 150000 + (85 · Σ_{u→v} (r_i(u) DIV outdeg(u))) DIV 100
  // — truncating integer division at both steps makes every engine
  // compute bit-identical masses (a float PageRank would hash-drift
  // on summation order), which is what lets an ITERATIVE algorithm
  // face the hash gate at all.
  //
  // Plan shape per iteration: join mass to edges on src (shuffle on
  // an 8-byte key; outdeg rides the same partitioning) + one
  // map-side-combined aggregate on dst — the textbook Pregel
  // superstep as two bounded shuffles, linear in |E| per iteration.
  // The edge list is DISTINCT (cust, supp) pairs — one fact-table
  // pass, then every iteration runs on the edge relation only. At
  // 100 TB: iterations would persist/checkpoint the mass relation and
  // pre-partition edges by src so every superstep reuses one
  // partitioning; with 3 unrolled iterations Catalyst's plan is
  // bounded and needs neither.
  // ---------------------------------------------------------------
  private val Iters = 3

  private def pagerank(s: SparkSession, dir: String): DataFrame = {
    val co = Tables.load(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.load(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp")).distinct()
    // materialize the edge relation ONCE: the unrolled supersteps
    // reference it 7× (outdeg + 2 joins × 3 iterations) and Catalyst
    // does not dedupe common subplans, so without this the fact-table
    // join would execute 7 times (A/B at sf0.1: 3.0 s → 2.76 s —
    // modest here because |E| is small, but at 100 TB it is the
    // difference between one fact pass and seven)
    val edges = co.select((col("c") * 2).as("src"), (col("sp") * 2 + 1).as("dst"))
      .unionByName(co.select((col("sp") * 2 + 1).as("src"), (col("c") * 2).as("dst")))
      .localCheckpoint()
    val outdeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint()
    var mass = outdeg.select(col("src").as("v"), lit(1000000L).as("mass"))
    for (_ <- 1 to Iters) {
      mass = edges
        .join(mass.withColumnRenamed("v", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("v"), expr("mass DIV outdeg").as("contrib"))
        .groupBy("v").agg(sum(col("contrib")).as("inflow"))
        .select(col("v"), expr("150000L + (85 * inflow) DIV 100").as("mass"))
    }
    mass.select(col("v"),
        when(col("v") % 2 === 0, "customer").otherwise("supplier").as("entity"),
        expr("v DIV 2").as("key"), col("mass").as("mass_ppm"))
      .orderBy("v")
  }

  private val pagerankSql = {
    def step(i: Int): String =
      s"""c$i AS (SELECT e.dst AS v, sum(m.mass // od.outdeg) AS inflow
        |  FROM e JOIN m${i - 1} m ON e.src = m.v JOIN od ON e.src = od.src GROUP BY 1),
        |m$i AS (SELECT v, CAST(150000 + (85 * inflow) // 100 AS BIGINT) AS mass FROM c$i)""".stripMargin
    s"""WITH co AS (SELECT DISTINCT o.o_custkey AS c, l.l_suppkey AS sp
      |  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
      |e AS (SELECT c*2 AS src, sp*2+1 AS dst FROM co
      |      UNION ALL SELECT sp*2+1, c*2 FROM co),
      |od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
      |m0 AS (SELECT src AS v, CAST(1000000 AS BIGINT) AS mass FROM od),
      |${(1 to Iters).map(step).mkString(",\n")}
      |SELECT v, CASE WHEN v % 2 = 0 THEN 'customer' ELSE 'supplier' END AS entity,
      |  v // 2 AS key, mass AS mass_ppm
      |FROM m$Iters
      |ORDER BY v""".stripMargin
  }

  val ops: Seq[Op] = Seq(
    Op("graph_pagerank", pagerank, Some(pagerankSql)))
}

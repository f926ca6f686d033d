package graft.ops

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Scratch probe: time the converged-PageRank superstep loop under
  * different join strategies (r15 optimization experiment; deleted or
  * kept as tooling only — not an op).
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val variant = if (args.length > 1) args(1) else "A"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]").config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    val (edges, outdeg) = GraphOps.purchaseGraph(spark, dir)
    edges.count(); outdeg.count() // stage the bucketed tables outside the timed loop
    val tol = GraphOps.PrTolPpm
    def loop(useBroadcast: Boolean): (Int, Double) = {
      val t0 = System.nanoTime()
      var (mass, massIds) = Rounds.checkpoint(
        outdeg.select(col("src").as("v"), lit(1000000L).as("mass")))
      var residual = Long.MaxValue
      var rounds = 0
      while (residual > tol && rounds < 80) {
        val prevMass = if (useBroadcast) F.broadcast(mass) else mass
        val (next, ids) = Rounds.checkpoint(eager = false, df = edges
          .join(prevMass.withColumnRenamed("v", "src"), "src")
          .join(outdeg, "src")
          .select(col("dst").as("v"), expr("mass DIV outdeg").as("contrib"))
          .groupBy("v").agg(sum(col("contrib")).as("inflow"))
          .select(col("v"), expr("150000L + (85 * inflow) DIV 100").as("mass"))
          .join(prevMass.select(col("v"), col("mass").as("prev")), "v"))
        residual = next.agg(max(abs(col("mass") - col("prev")))).head().getLong(0)
        Rounds.free(mass, massIds)
        mass = next.select(col("v"), col("mass"))
        massIds = ids
        rounds += 1
      }
      val out = mass.agg(sum(col("mass"))).head().getLong(0)
      Rounds.free(mass, massIds)
      println(s"checksum=$out")
      (rounds, (System.nanoTime() - t0) / 1e9)
    }
    def withConf(k: String, v: String)(body: => (Int, Double)): (Int, Double) = {
      val prev = spark.conf.get(k)
      spark.conf.set(k, v)
      try body finally spark.conf.set(k, prev)
    }
    def run(): (Int, Double) = variant match {
      case "B" => loop(true)
      case "C" => withConf("spark.sql.adaptive.enabled", "false")(loop(false))
      case "D" => withConf("spark.sql.shuffle.partitions", "8")(loop(false))
      case "E" => withConf("spark.sql.adaptive.enabled", "false")(
        withConf("spark.sql.shuffle.partitions", "8")(loop(false)))
      case "F" => withConf("spark.sql.adaptive.enabled", "false")(loop(true))
      case _ => loop(false)
    }
    // one untimed warm loop, then two timed per requested variant
    run()
    (1 to 2).foreach { i =>
      val (r, t) = run()
      println(f"variant=$variant pass=$i rounds=$r wall=$t%.2f s")
    }
    spark.stop()
  }
}

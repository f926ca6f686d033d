package graft.queries

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fourth analytics pack — operator classes the TPC-H shapes don't
  * exercise, each with an explicitly scale-bounded plan.
  */
object Analytics4 {

  // ---------------------------------------------------------------
  // q_skyline — 2-D Pareto frontier (skyline operator): the parts no
  // other part dominates on (size, retail price), where x dominates y
  // iff x.size <= y.size AND x.price <= y.price with at least one
  // strict. The classic skyline needs a self-join (quadratic) or a
  // global sort (one task owns the corpus); for 2-D the frontier is a
  // running min over the size axis, and the scale-right plan splits
  // it:
  //   1. min(price) per size — fact-sized shuffle on a LOW-CARD key,
  //      map-side combined (the only corpus-wide pass);
  //   2. strict-predecessor running min over the per-size minima — an
  //      unpartitioned RANGE window, but above the |sizes|-row
  //      aggregate (PlanGuard's rule), never over the fact table;
  //   3. broadcast the |sizes|-row frontier stats back and filter:
  //      kept iff price == its size's min AND every strictly smaller
  //      size's min is strictly greater (equal-(size,price) rows are
  //      mutually non-dominating and all kept).
  // ---------------------------------------------------------------
  private def skyline(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = Tables.load(s, dir, "part")
      .select(col("p_partkey"), col("p_size"),
        col("p_retailprice").cast("decimal(12,2)").as("price"))
    val sizeMin = p.groupBy("p_size").agg(min(col("price")).as("size_min"))
    val strictW = Window.orderBy("p_size")
      .rangeBetween(Window.unboundedPreceding, -1)
    val stats = sizeMin.withColumn("strict_min", min(col("size_min")).over(strictW))
    p.join(broadcast(stats), "p_size")
      .filter(col("price") === col("size_min") &&
        (col("strict_min").isNull || col("strict_min") > col("price")))
      .select(col("p_partkey"), col("p_size"), col("price").cast("double"))
      .orderBy("p_partkey")
  }

  private val skylineSql =
    """WITH p AS (SELECT p_partkey, p_size, CAST(p_retailprice AS DECIMAL(12,2)) AS price FROM part),
      |m AS (SELECT p_size, min(price) AS size_min FROM p GROUP BY 1),
      |st AS (SELECT *, min(size_min) OVER (ORDER BY p_size
      |         RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS strict_min FROM m)
      |SELECT p.p_partkey, p.p_size, CAST(p.price AS DOUBLE) AS price
      |FROM p JOIN st ON p.p_size = st.p_size
      |WHERE p.price = st.size_min AND (st.strict_min IS NULL OR st.strict_min > p.price)
      |ORDER BY p.p_partkey""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q_skyline", skyline, Some(skylineSql)))
}

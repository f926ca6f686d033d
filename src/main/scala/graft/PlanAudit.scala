package graft

/** Scratch plan auditor: prints condensed physical-plan facts for the
  * named ops (joins chosen, pushed filters) at a given SF dir.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build(master = "local[8]")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q7_nation_volume", "q8_market_share", "q12_late_lines",
        "q13_customer_distribution", "q15_top_supplier", "q19_disjunctive",
        "q21_sole_blame", "q22_idle_customers", "txt_tfidf", "ev_retention")
    names.foreach { n =>
      val plan = Registry.byName(n).run(spark, dir).queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l =>
        l.contains("Join") || l.contains("Exchange")).map(_.trim.takeWhile(_ != '[')
          .replaceAll("\\(\\d+\\)", "").trim).toSeq
      val pushed = plan.linesIterator.filter(_.contains("PushedFilters: ["))
        .map(_.trim.take(300)).toSeq
      println(s"=== $n")
      joins.groupBy(identity).toSeq.sortBy(_._1).foreach { case (k, v) => println(s"  ${v.size}x $k") }
      pushed.take(3).foreach(p => println(s"  $p"))
    }
    spark.stop()
  }
}

package graft
object OneOp {
  def main(args: Array[String]): Unit = {
    // comma-separated op names: one session, one oracle_sql.json
    // covering every requested op (single-name runs unchanged)
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = args(1); val out = args(2)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      Registry.byName(name).run(spark, dir).write.mode("overwrite").parquet(out + "/" + name)
    }
    val sql = SparkEntry.oracleSql.filter(kv => names.contains(kv._1))
    val json = sql.map { case (k, v) =>
      "\"" + k + "\": " + "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\"" }
      .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out + "/oracle_sql.json"), json.getBytes("UTF-8"))
    spark.stop()
  }
}

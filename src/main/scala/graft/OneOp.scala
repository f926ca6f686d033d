package graft
object OneOp {
  def main(args: Array[String]): Unit = {
    val name = args(0); val dir = args(1); val out = args(2)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    Registry.byName(name).run(spark, dir).write.mode("overwrite").parquet(out + "/" + name)
    val sql = SparkEntry.oracleSql.filter(_._1 == name)
    val json = sql.map { case (k, v) =>
      "\"" + k + "\": " + "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\"" }
      .mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(out + "/oracle_sql.json"), json.getBytes("UTF-8"))
    spark.stop()
  }
}

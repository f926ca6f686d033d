package graft

import graft.etl.Consolidator
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ConsolidatorSpec extends AnyFunSuite with SparkSuite {
  import spark.implicits._

  test("consolidate merges chunk files, drops all-null rows, compacts") {
    val tmpIn = Files.createTempDirectory("graft_chunks").toString
    val tmpOut = Files.createTempDirectory("graft_consolidated").toString
    // reference shape: many small chunk files, some rows degenerate
    // (ref: staging_data_extraction.py consolidate_chunks_to_mainFile)
    val rows = Seq((Option(1L), Option("a")), (Option(2L), Option("b")),
      (None: Option[Long], None: Option[String]), (Option(3L), Option("c")))
    rows.toDF("id", "v").repartition(8).write.mode("overwrite").parquet(tmpIn)
    val (n, files) = Consolidator.consolidate(spark, tmpIn, tmpOut, rowsPerFile = 1000000L)
    assert(n == 3) // all-null row dropped
    assert(files == 1)
    val out = spark.read.parquet(tmpOut)
    assert(out.count() == 3)
    assert(out.filter(out("id").isNull && out("v").isNull).count() == 0)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the cross-engine hash contract (SURVEY.md §5): the Spark
  * expressions used for shingle/token ids must produce EXACTLY these
  * values, which were independently computed in DuckDB 1.0
  * (`('0x'||substr(md5('tok'),1,N))::BIGINT`). If these fail, every
  * hash-derived oracle (fingerprint, minhash, simhash) silently
  * diverges.
  */
class HashPortabilitySpec extends AnyFunSuite with SparkSuite {

  private def one(sql: String): Long =
    spark.sql(s"SELECT $sql").head().getLong(0)

  test("32-bit md5-derived id matches DuckDB") {
    assert(one("CAST(conv(substr(md5('tok'), 1, 8), 16, 10) AS BIGINT)") == 1622020974L)
  }

  test("60-bit md5-derived id matches DuckDB") {
    assert(one("CAST(conv(substr(md5('tok'), 1, 15), 16, 10) AS BIGINT)") == 435407939895074749L)
  }

  test("rolling fingerprint fold matches DuckDB list_reduce semantics") {
    // duckdb: list_reduce(list_prepend(0, [1,2,3]), (a,b)->(a*31+b)%1000000007) = 1026
    assert(one("aggregate(array(1,2,3), CAST(0 AS BIGINT), (acc, h) -> (acc*31 + h) % 1000000007)") == 1026L)
  }
}

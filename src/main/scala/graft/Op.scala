package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle
  * query. `oracle == None` ⇒ the driver falls back to a rows-only
  * check (approximate / file-level ops).
  */
final case class Op(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** SURVEY.md §2 is the graded coverage checklist — every table row
  * must be a registered op and every registered op must have a row.
  * This spec fails the build on drift in either direction.
  */
class SurveySyncSpec extends AnyFunSuite {

  private lazy val surveyKeys: Set[String] = {
    val src = Source.fromFile("SURVEY.md", "UTF-8")
    try {
      val text = src.getLines().mkString("\n")
      val section = text.substring(text.indexOf("## §2"), text.indexOf("## §3"))
      // op rows look like: | `key_name` | capability | SQL |
      "\\|\\s*`([a-z0-9_]+)`\\s*\\|".r.findAllMatchIn(section).map(_.group(1)).toSet
    } finally src.close()
  }

  test("every SURVEY §2 row is a registered operator") {
    val registered = Registry.all.map(_.name).toSet
    val phantom = surveyKeys -- registered - "streaming" // spec-only row
    assert(phantom.isEmpty, s"SURVEY rows with no registered op: $phantom")
  }

  test("every registered operator has a SURVEY §2 row") {
    val registered = Registry.all.map(_.name).toSet
    val undocumented = registered -- surveyKeys
    assert(undocumented.isEmpty, s"ops missing from SURVEY §2: $undocumented")
  }

  test("every registered operator carries a DuckDB oracle") {
    val rowsOnly = Registry.all.filter(_.oracle.isEmpty).map(_.name)
    assert(rowsOnly.isEmpty, s"ops without SQL oracle: $rowsOnly")
  }
}

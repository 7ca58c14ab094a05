package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.sys.process._

import org.scalatest.funsuite.AnyFunSuite

/** Gate-side dtype lint over EVERY oracle SQL, run as part of `sbt test`.
  *
  * DuckDB widens SUM(BIGINT) → HUGEINT and exact division → DECIMAL;
  * those cross the driver's pandas hash boundary as float64/object while
  * Spark emits int64, so the values match and the gate still fails. The
  * class ate t37 (round 10) and o13/t44 (round 11) — three green-looking
  * queries across two rounds. This spec dumps [[SparkEntry.oracleSql]]
  * and DESCRIBEs each statement in DuckDB (tools/oracle_lint.py) against
  * the sf0.001 views, failing the build on any banned output dtype, so a
  * new integer-sum oracle can't reintroduce the class.
  *
  * DuckDB is the driver's tool, not a library dependency — the lint
  * shells out to the host python3, and cancels (rather than fails) on a
  * machine without it.
  */
class OracleLintSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def haveDuckDb: Boolean =
    try {
      Process(Seq("python3", "-c", "import duckdb")).!(ProcessLogger(_ => ())) == 0
    } catch { case _: Exception => false }

  test("every battery query has an oracle — the lint's coverage IS the battery") {
    // The dtype lint below only sees entries present in oracleSql. If a
    // future query were added without one, the driver would silently fall
    // back to a weaker rows-only check AND the dtype lint would silently
    // skip it — two downgrades with no failing signal. Pin the key sets
    // equal so that state can only be entered deliberately (by also
    // updating this assertion with a justification).
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet,
      "queries without oracles: " +
        (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted.mkString(",") +
        "; oracles without queries: " +
        (SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).toSeq.sorted.mkString(","))
  }

  test("no oracle SQL emits HUGEINT/DECIMAL columns") {
    assume(haveDuckDb && Files.isDirectory(Paths.get(sfDir)),
      "host python3+duckdb and testdata required")
    val json = SparkEntry.oracleSql.toSeq.sortBy(_._1).map { case (k, v) =>
      "  " + quote(k) + ": " + quote(v)
    }.mkString("{\n", ",\n", "\n}")
    val tmp = Files.createTempFile("oracle_sql_lint", ".json")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    val out = new StringBuilder
    val code = Process(
      Seq("python3", "tools/oracle_lint.py", tmp.toString, sfDir))
      .!(ProcessLogger(l => out.append(l).append('\n')))
    Files.deleteIfExists(tmp)
    assert(code == 0, s"oracle dtype lint failed:\n$out")
  }

  private def quote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'  => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c    => b.append(c)
    }
    b.append("\"").toString
  }
}

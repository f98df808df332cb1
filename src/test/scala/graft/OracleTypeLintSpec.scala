package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Build-time guard for the oracle OUTPUT-TYPE contract.
  *
  * The driver hashes oracle results after DuckDB typing, and DuckDB
  * silently promotes `sum(BIGINT)` → HUGEINT (windowed sums included;
  * `//` division keeps it). HUGEINT canonicalizes differently from
  * BIGINT in the driver's hasher, so a query can match on rows AND
  * schema yet stay hash-red forever — q50/t25 burned three rounds on
  * exactly this. This spec shells every `SparkEntry.oracleSql` through
  * `tools/oracle_lint.py` (DuckDB DESCRIBE) and fails on any output
  * column typed outside {BIGINT, INTEGER, DOUBLE, VARCHAR, DATE,
  * TIMESTAMP, BOOLEAN}. House fix when it fires: CAST the offending
  * expression in the oracle SQL (see q49's
  * `CAST(sum(delta) OVER (...) AS BIGINT)`).
  *
  * Cancels (does not fail) when python3+duckdb or the testdata
  * directory is absent, so `sbt test` stays portable.
  */
class OracleTypeLintSpec extends AnyFunSuite {

  test("every oracle output column types within the canonical hash-stable set") {
    val sfDir = SharedSpark.sfDir
    assume(Files.isDirectory(Paths.get(sfDir)), s"testdata missing: $sfDir")
    val duckOk = try {
      new ProcessBuilder("python3", "-c", "import duckdb").start().waitFor() == 0
    } catch { case _: Exception => false }
    assume(duckOk, "python3+duckdb unavailable; lint runs driver-side only")

    val json = Files.createTempFile("oracle_sql", ".json")
    Files.writeString(json, Verify.oracleJson)
    val pb = new ProcessBuilder(
      "python3", "tools/oracle_lint.py", sfDir, json.toString)
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val code = p.waitFor()
    Files.deleteIfExists(json)
    assert(code == 0, s"oracle type lint violations:\n$out")
  }
}

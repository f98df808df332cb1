package graft

import org.scalatest.funsuite.AnyFunSuite

/** The BENCH.json minima protocol's load-bearing piece: Bench writes
  * the element-wise per-query MINIMA of (committed file, this run),
  * so a contended run — the driver's round-end run included — can
  * only improve the committed file, and a subset run can't drop other
  * queries' entries.
  */
class BenchMergeSpec extends AnyFunSuite {

  private def json(qs: (String, Double)*): String =
    s"""{"metric":"total","value":1.0,"unit":"sec","queries":{${
      qs.map { case (k, v) => s"\"$k\":$v" }.mkString(",")
    }},"sf":"x","reps":3,"load_at_start":0.50,"gate_waited_sec":0.0}"""

  test("element-wise minima: keeps the better side per query") {
    val prev = json("a" -> 1.0, "b" -> 2.0, "c" -> 3.0)
    val got = Bench.mergeMinima(prev, Map("a" -> 1.5, "b" -> 0.5, "d" -> 9.0))
    assert(got == Map("a" -> 1.0, "b" -> 0.5, "c" -> 3.0, "d" -> 9.0))
  }

  test("subset run cannot drop other queries' committed entries") {
    val prev = json("a" -> 1.0, "b" -> 2.0)
    val got = Bench.mergeMinima(prev, Map("a" -> 0.9))
    assert(got == Map("a" -> 0.9, "b" -> 2.0))
  }

  test("empty or garbage prior file: the run stands alone") {
    assert(Bench.mergeMinima("", Map("a" -> 1.0)) == Map("a" -> 1.0))
    assert(Bench.mergeMinima("not json at all", Map("a" -> 1.0)) == Map("a" -> 1.0))
  }

  test("top-level numeric fields are never mistaken for query timings") {
    // value/reps/load_at_start sit OUTSIDE the queries object and the
    // parser must not absorb them as query keys.
    val got = Bench.mergeMinima(json("q01" -> 0.25), Map("q02" -> 0.5))
    assert(got == Map("q01" -> 0.25, "q02" -> 0.5))
  }

  test("scientific-notation and integer timings parse") {
    val prev = json()
      .replace("\"queries\":{}", "\"queries\":{\"a\":2,\"b\":1.5e-1}")
    val got = Bench.mergeMinima(prev, Map("a" -> 3.0, "b" -> 3.0))
    assert(got == Map("a" -> 2.0, "b" -> 0.15))
  }
}

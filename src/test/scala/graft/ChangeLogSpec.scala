package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.ChangeLog

/** Pins the CDC changelog algebra: asOfVersion(MaxValue) ==
  * latestState, prefix monotonicity (k−1 → k applies exactly version
  * k's ops), delete/re-upsert visibility at a bound, insert path for
  * base-absent keys, and empty-changelog identity.
  */
class ChangeLogSpec extends AnyFunSuite {
  import SharedSpark.spark
  import spark.implicits._

  private val base = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0))
    .toDF("k", "price")
  // key 1: U@1 then D@2 then U@3 (delete visible only at k=2)
  // key 2: D@1 (deleted from version 1 on)
  // key 3: untouched (base)
  // key 5: base-absent, U@2 (insert appears at k>=2)
  private val cl = Seq(
    (1L, 1L, "U", 11.0), (1L, 2L, "D", 0.0), (1L, 3L, "U", 13.0),
    (2L, 1L, "D", 0.0),
    (5L, 2L, "U", 55.0)).toDF("k", "ver", "op", "new_price")

  private def rows(d: org.apache.spark.sql.DataFrame) =
    d.orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq

  test("asOfVersion(MaxValue) == latestState; final state correct") {
    assert(rows(ChangeLog.asOfVersion(base, cl, Long.MaxValue)) ==
      rows(ChangeLog.latestState(base, cl)))
    assert(rows(ChangeLog.latestState(base, cl)) == Seq(
      (1L, 13.0, "updated"), (3L, 30.0, "base"), (4L, 40.0, "base"),
      (5L, 55.0, "inserted")))
  }

  test("prefix snapshots: each version bound shows exactly the sealed state") {
    assert(rows(ChangeLog.asOfVersion(base, cl, 0L)) == Seq(
      (1L, 10.0, "base"), (2L, 20.0, "base"), (3L, 30.0, "base"),
      (4L, 40.0, "base"))) // empty prefix == base
    assert(rows(ChangeLog.asOfVersion(base, cl, 1L)) == Seq(
      (1L, 11.0, "updated"), (3L, 30.0, "base"), (4L, 40.0, "base")))
    // at k=2: key 1 deleted (D@2 wins), key 5 inserted
    assert(rows(ChangeLog.asOfVersion(base, cl, 2L)) == Seq(
      (3L, 30.0, "base"), (4L, 40.0, "base"), (5L, 55.0, "inserted")))
    // at k=3: key 1 resurrected by U@3
    assert(rows(ChangeLog.asOfVersion(base, cl, 3L)) == Seq(
      (1L, 13.0, "updated"), (3L, 30.0, "base"), (4L, 40.0, "base"),
      (5L, 55.0, "inserted")))
  }

  test("version ties resolve deterministically: 'U' over 'D', then higher new value") {
    // two entries at the SAME (k, ver): the documented tiebreak is
    // op DESC ('U' beats 'D'), then new_price DESC — so key 1
    // survives with 99.0 and key 2 takes the larger of its two Us,
    // identically on every run.
    val tied = Seq(
      (1L, 1L, "D", 0.0), (1L, 1L, "U", 99.0),
      (2L, 1L, "U", 5.0), (2L, 1L, "U", 7.0)).toDF("k", "ver", "op", "new_price")
    val expect = Seq((1L, 99.0, "updated"), (2L, 7.0, "updated"),
      (3L, 30.0, "base"), (4L, 40.0, "base"))
    (1 to 3).foreach { _ =>
      assert(rows(ChangeLog.latestState(base, tied)) == expect)
    }
  }

  test("NULL semantics: NULL base value still reads 'base'/'updated'; NULL-new 'U' is a touch") {
    val baseN = Seq((1L, Some(10.0)), (2L, None), (3L, None))
      .toDF("k", "price")
    // key 2 (base value NULL) touched by a NULL-new 'U' keeps NULL
    // and reads 'updated' (NOT 'inserted' — it IS in base); key 3
    // (base value NULL) untouched reads 'base'; key 9 inserted by a
    // NULL-new 'U' appears with NULL value.
    val clN = Seq((2L, 1L, "U", None: Option[Double]),
      (9L, 1L, "U", None: Option[Double])).toDF("k", "ver", "op", "new_price")
    val got = ChangeLog.latestState(baseN, clN).orderBy("k").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getString(2))).toSeq
    assert(got == Seq(
      (1L, Some(10.0), "base"), (2L, None, "updated"),
      (3L, None, "base"), (9L, None, "inserted")))
  }

  test("updateImages: null-key feed rows pass through instead of vanishing") {
    // version 1 updates key 1 (delete+insert pair), pure-inserts key 2,
    // and carries TWO null-key rows (an insert and a delete) — an
    // equality join on the key would drop both on the floor; they must
    // survive, and because the null group has both sides at v1 they
    // reclassify as an update pair like any other key
    val feed = Seq(
      (Some(1L), 1L, "delete", 10.0), (Some(1L), 1L, "insert", 11.0),
      (Some(2L), 1L, "insert", 20.0),
      (None: Option[Long], 1L, "insert", 90.0),
      (None: Option[Long], 2L, "delete", 91.0))
      .toDF("k", "_commit_version", "_change_type", "price")
    val out = ChangeLog.updateImages(feed, "k")
    assert(out.count() == 5L, "no feed row may vanish")
    val got = out.collect().map(r =>
      (if (r.isNullAt(0)) -1L else r.getLong(0), r.getLong(1),
        r.getString(2))).toSet
    assert(got == Set(
      (1L, 1L, "update_preimage"), (1L, 1L, "update_postimage"),
      (2L, 1L, "insert"),
      (-1L, 1L, "insert"),   // null key, only insert at v1 → unchanged
      (-1L, 2L, "delete")))  // null key, only delete at v2 → unchanged
  }
}

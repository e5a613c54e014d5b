package graft

import org.apache.spark.sql.functions._
import graft.queries.QCommon

/** QCommon.multisetEqual / multisetDiff (r21): the one-job replacement
  * for the capstones' two-sided exceptAll parity checks. The contract
  * is MULTISET equality — duplicates count, order doesn't — and must
  * agree with the exceptAll pair on every shape the capstones compare
  * (long ids, (id, band, key) index rows, array-typed sig/vec columns,
  * null keys, empty frames).
  */
class QCommonSpec extends SparkSuite {
  import spark.implicits._

  private def viaExceptAll(a: org.apache.spark.sql.DataFrame,
                           b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L

  test("multisetEqual agrees with the exceptAll pair on ids, duplicates and order") {
    val a = Seq(1L, 2L, 2L, 3L).toDF("id")
    val same = Seq(3L, 2L, 1L, 2L).toDF("id")      // reordered, equal
    val fewer = Seq(1L, 2L, 3L).toDF("id")          // multiplicity differs
    val other = Seq(1L, 2L, 2L, 4L).toDF("id")      // element differs
    for ((x, y) <- Seq((a, same), (a, fewer), (a, other), (fewer, a)))
      assert(QCommon.multisetEqual(x, y) == viaExceptAll(x, y))
    assert(QCommon.multisetEqual(a, same))
    assert(!QCommon.multisetEqual(a, fewer))
    assert(!QCommon.multisetEqual(a, other))
  }

  test("multisetEqual: multi-column rows, null keys, column-order alignment") {
    val a = Seq((1L, Some("x")), (2L, None), (2L, None)).toDF("id", "t")
    val b = Seq((2L, None), (1L, Some("x")), (2L, None)).toDF("id", "t")
    assert(QCommon.multisetEqual(a, b))
    assert(viaExceptAll(a, b))
    // b's columns in a different ORDER still compare by name
    val bSwapped = b.select($"t", $"id")
    assert(QCommon.multisetEqual(a, bSwapped))
    val c = Seq((1L, Some("x")), (2L, None)).toDF("id", "t") // one null row fewer
    assert(!QCommon.multisetEqual(a, c))
    assert(!viaExceptAll(a, c))
  }

  test("multisetEqual: array-typed columns (the sig/vec store shapes) and empty frames") {
    val a = Seq((1L, Seq(1L, 2L)), (2L, Seq(3L))).toDF("id", "sig")
    val b = Seq((2L, Seq(3L)), (1L, Seq(1L, 2L))).toDF("id", "sig")
    val c = Seq((2L, Seq(3L)), (1L, Seq(1L, 9L))).toDF("id", "sig")
    assert(QCommon.multisetEqual(a, b))
    assert(!QCommon.multisetEqual(a, c))
    val e = a.limit(0)
    assert(QCommon.multisetEqual(e, a.limit(0)))
    assert(!QCommon.multisetEqual(e, a))
    assert(!QCommon.multisetEqual(a, e))
  }

  test("multisetDiff reports the differing rows with signed multiplicity deltas") {
    val a = Seq(1L, 2L, 2L).toDF("id")
    val b = Seq(2L, 3L).toDF("id")
    val d = QCommon.multisetDiff(a, b)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(d == Map(1L -> 1L, 2L -> 1L, 3L -> -1L))
  }

  test("multisetDiff fails loudly on schema drift and reserved columns (r21 ADVICE)") {
    val a = Seq(1L, 2L).toDF("id")
    // b carries an EXTRA column: the old exceptAll pair errored on the
    // arity mismatch; the by-name form must not silently project it
    // away and compare equal
    val wide = Seq((1L, "x"), (2L, "y")).toDF("id", "extra")
    val e1 = intercept[IllegalArgumentException](QCommon.multisetDiff(a, wide))
    assert(e1.getMessage.contains("column sets differ"))
    val e2 = intercept[IllegalArgumentException](QCommon.multisetDiff(wide, a))
    assert(e2.getMessage.contains("column sets differ"))
    // reserved helper names in an input would corrupt the tagged union
    val clash = Seq((1L, 1L)).toDF("id", "graft_mse_side")
    val e3 = intercept[IllegalArgumentException](QCommon.multisetDiff(clash, clash))
    assert(e3.getMessage.contains("graft_mse_side"))
  }

  test("parJobs runs independent Spark jobs concurrently and rethrows the cause (r22)") {
    // three independent writes land correctly when submitted in parallel
    Seq("pj_a", "pj_b", "pj_c").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    QCommon.parJobs(
      () => graft.ops.Bucketed.writeBucketed(
        Seq(1L, 2L).toDF("k"), "pj_a", Seq("k"), 2),
      () => graft.ops.Bucketed.writeBucketed(
        Seq(3L).toDF("k"), "pj_b", Seq("k"), 2),
      () => graft.ops.Bucketed.writeBucketed(
        Seq(4L, 5L, 6L).toDF("k"), "pj_c", Seq("k"), 2))
    assert(spark.table("pj_a").count() == 2)
    assert(spark.table("pj_b").count() == 1)
    assert(spark.table("pj_c").count() == 3)
    // parallel APPENDS to distinct tables preserve contents
    QCommon.parJobs(
      () => graft.ops.Bucketed.appendBucketed(
        Seq(10L).toDF("k"), "pj_a", Seq("k"), 2),
      () => graft.ops.Bucketed.appendBucketed(
        Seq(20L).toDF("k"), "pj_b", Seq("k"), 2),
      () => graft.ops.Bucketed.appendBucketed(
        Seq(30L).toDF("k"), "pj_c", Seq("k"), 2))
    assert(spark.table("pj_a").as[Long].collect().toSet == Set(1L, 2L, 10L))
    assert(spark.table("pj_b").as[Long].collect().toSet == Set(3L, 20L))
    assert(spark.table("pj_c").as[Long].collect().toSet == Set(4L, 5L, 6L, 30L))
    Seq("pj_a", "pj_b", "pj_c").foreach(t => spark.sql(s"DROP TABLE $t"))
    // a failing task surfaces its CAUSE, not the ExecutionException
    val boom = intercept[IllegalArgumentException](
      QCommon.parJobs(
        () => (),
        () => throw new IllegalArgumentException("pj-boom")))
    assert(boom.getMessage == "pj-boom")
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.dsl.{JoinHint, Rel}

/** Pig statement semantics of the Rel DSL (SURVEY.md §2.1 gotchas). */
class RelSpec extends SparkSuite {
  import spark.implicits._

  test("FLATTEN eliminates rows with empty or null bags (explode, not explode_outer)") {
    val df = Seq(
      (1, Seq("a", "b")), (2, Seq.empty[String]), (3, null)
    ).toDF("id", "bag")
    val got = Rel(df).flatten("bag", "x").df.select("id", "x").as[(Int, String)].collect().toSet
    assert(got == Set((1, "a"), (1, "b")))
  }

  test("multi-FLATTEN is the cross product of the bags") {
    val df = Seq((1, Seq("a", "b"), Seq("x", "y"))).toDF("id", "b1", "b2")
    val got = Rel(df).flattenAll(Seq("b1" -> "e1", "b2" -> "e2")).df.count()
    assert(got == 4)
  }

  test("GROUP keeps null keys as a group; JOIN drops null keys") {
    val l = Seq((Some(1), "a"), (None, "b"), (None, "c")).toDF("k", "v")
    val grouped = Rel(l).group($"k").agg(count(lit(1)).as("n")).df
    assert(grouped.count() == 2) // group for k=1 and group for k=null
    val r = Seq((Some(1), "x"), (None, "y")).toDF("k", "w")
    val joined = Rel(l).join(Rel(r.withColumnRenamed("k", "k2")), Seq("k"), Seq("k2")).df
    assert(joined.count() == 1) // only k=1 matches; nulls never join
  }

  test("COGROUP is full-outer with empty (not null) bags") {
    val a = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val b = Seq((2, "p"), (3, "q")).toDF("k", "w")
    val cg = Rel(a).cogroup(Rel(b), "k", "k").df
      .select($"group", size($"bag1"), size($"bag2")).as[(Int, Int, Int)]
      .collect().toSet
    assert(cg == Set((1, 1, 0), (2, 1, 1), (3, 0, 1)))
  }

  test("UNION is positional and keeps duplicates; ONSCHEMA matches by name") {
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq((1, "x")).toDF("id", "v")
    assert(Rel(a).union(Rel(b)).df.count() == 2)
    val c = Seq("y").toDF("v")
    val u = Rel(a).unionOnSchema(Rel(c)).df
    assert(u.columns.toSeq == Seq("id", "v") && u.count() == 2)
    assert(u.filter($"id".isNull).count() == 1)
  }

  test("SPLIT routes rows to all matching branches plus OTHERWISE") {
    val df = Seq(1, 5, 10, 50).toDF("x")
    val Seq(lo, hi, other) =
      Rel(df).split(Seq($"x" < 10, $"x" > 3), otherwise = true)
    assert(col0(lo.df).toSet == Set(1, 5))
    assert(col0(hi.df).toSet == Set(5, 10, 50)) // 5 reaches both branches
    assert(col0(other.df).toSet == Set[Any]())  // everything matched something
  }

  test("replicated join hint produces a broadcast hash join") {
    val big = spark.range(1000).toDF("k")
    val small = Seq((1L, "a")).toDF("k2", "v")
    val plan = Rel(big).join(Rel(small), Seq("k"), Seq("k2"),
      hint = JoinHint.Replicated).df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("ASSERT passes when the predicate holds and throws when violated") {
    val df = Seq(1, 2, 3).toDF("x")
    Rel(df).assertBy($"x" > 0) // no throw
    val e = intercept[IllegalStateException](Rel(df).assertBy($"x" > 1, "x must exceed 1"))
    assert(e.getMessage.contains("x must exceed 1"))
  }

  test("LIMIT after ORDER BY plans as a top-k (TakeOrderedAndProject)") {
    val df = spark.range(10000).toDF("x")
    val plan = Rel(df).orderBy($"x".desc).limitRel(5).df
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("STREAM THROUGH pipes rows through an external command") {
    val df = Seq("a", "b").toDF("s")
    val got = col0(Rel(df).streamThrough("cat").df).toSet
    assert(got == Set("a", "b"))
  }

  test("CUBE produces all grouping subsets") {
    val df = Seq(("a", "x", 1), ("a", "y", 2), ("b", "x", 3)).toDF("d1", "d2", "m")
    val got = Rel(df).cube(Seq($"d1", $"d2"), Seq(sum($"m").as("s"))).df
    assert(got.count() == 8) // 3 (d1,d2) pairs + 2 d1 + 2 d2 + 1 total
  }

  test("flatten keeping the bag's own name does not drop the result (r15)") {
    val df = Seq((1, Seq("a", "b"))).toDF("id", "tags")
    val got = Rel(df).flatten("tags", "tags").df
    assert(got.columns.toSeq == Seq("id", "tags"))
    assert(got.select("tags").as[String].collect().toSet == Set("a", "b"))
  }

  test("streamThrough writes nulls as empty fields — no misalignment (r15)") {
    val df = Seq((1L, Option.empty[String], 3L), (2L, Option("mid"), 4L))
      .toDF("a", "b", "c")
    val got = col0(Rel(df).streamThrough("cat").df).map(_.asInstanceOf[String]).toSet
    // the null field must HOLD ITS PLACE between the delimiters
    assert(got == Set("1\t\t3", "2\tmid\t4"))
  }
}

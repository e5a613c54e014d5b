package graft

import org.apache.spark.sql.functions._

/** BagSizeFusion optimizer rule (graft.plans): size(collect_list(x))
  * must rewrite to count(x) — and must NOT fire when the bag is used
  * for anything else.
  */
class PlansSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = Seq((1, "a"), (1, "b"), (2, "c"), (2, null))
    .toDF("k", "v")

  test("size(collect_list) fuses to count and matches the bag result") {
    val q = df.groupBy("k")
      .agg(collect_list($"v").as("bag"))
      .select($"k", size($"bag").as("n"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("collect_list"), optimized)
    assert(optimized.contains("count"), optimized)
    // collect_list skips nulls, so count(v): k=2 has n=1
    assert(q.as[(Int, Int)].collect().toMap == Map(1 -> 2, 2 -> 1))
  }

  test("bag projected raw keeps its collect_list; only the size use fuses") {
    val q = df.groupBy("k")
      .agg(collect_list($"v").as("bag"))
      .select($"k", size($"bag").as("n"), $"bag")
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("collect_list")) // the raw bag remains
    val row = q.filter($"k" === 1).collect()(0)
    assert(row.getInt(1) == 2 && row.getSeq[String](2).toSet == Set("a", "b"))
  }

  test("pig front-end SIZE(bag) query benefits without source change") {
    val e = new graft.piglatin.PigEngine(spark, Some("/root/testdata/sf0.001"))
    e.run("""
      o = LOAD 'orders.parquet';
      g = GROUP o BY o_custkey;
      out = FOREACH g GENERATE group, SIZE(o) AS n;
      """)
    val q = e.relation("out")
    assert(!q.queryExecution.optimizedPlan.toString.contains("collect_list"))
    val got = q.as[(Long, Long)].collect().toMap
    val want = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .groupBy("o_custkey").count().as[(Long, Long)].collect().toMap
    assert(got == want)
  }
}

/** Native graft_dot expression: codegen'd, bit-identical to the kernel. */
class DotProductFSpec extends SparkSuite {
  import spark.implicits._

  test("graft_dot matches the JVM kernel bit-for-bit and runs in codegen") {
    val rnd = new scala.util.Random(9)
    val rows = (1 to 200).map(_ => (Array.fill(64)(rnd.nextFloat() - 0.5f),
      Array.fill(64)(rnd.nextFloat() - 0.5f)))
    val tmp = java.nio.file.Files.createTempDirectory("dotf").toString + "/v"
    rows.toDF("a", "b").write.parquet(tmp)
    val df = spark.read.parquet(tmp) // file-backed: not constant-folded
    val got = df.select($"a", call_function("graft_dot", $"a", $"b")).collect()
      .map(r => (r.getSeq[Float](0).toVector, r.getDouble(1))).toMap
    val want = rows.map { case (a, b) =>
      (a.toVector, graft.llm.Similarity.dotK(a, b)) }.toMap
    assert(got == want) // exact equality, not approx
    val plan = df.select(call_function("graft_dot", $"a", $"b"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project")) // *(n) = whole-stage codegen stage
  }

  test("graft_dot rejects wrong input types at analysis") {
    val df = Seq((Seq(1.0), "x")).toDF("a", "b")
    intercept[Exception](df.select(call_function("graft_dot", $"a", $"b")).collect())
  }
}

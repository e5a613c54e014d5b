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

  test("DISTINCT and FILTER collect_lists do NOT fuse — their semantics differ from count") {
    Seq((1, "a"), (1, "a"), (1, "b")).toDF("k", "v")
      .createOrReplaceTempView("bsf_dup")
    val q = spark.sql("SELECT k, size(collect_list(DISTINCT v)) AS n FROM bsf_dup GROUP BY k")
    assert(q.as[(Int, Int)].head() == ((1, 2))) // 2 distinct, not 3
    val qf = spark.sql(
      "SELECT k, size(collect_list(v) FILTER (WHERE v = 'a')) AS n FROM bsf_dup GROUP BY k")
    assert(qf.as[(Int, Int)].head() == ((1, 2))) // only the two 'a's
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

/** DelayFlattenPastJoin optimizer rule (graft.plans): a Generate under
  * a join whose condition ignores the generated columns must hoist
  * above the join — the PushDownForEachFlatten analog.
  */
class DelayFlattenSpec extends SparkSuite {
  import spark.implicits._

  private lazy val fact = Seq(
    (1, Seq("x", "y", "z")), (2, Seq("p")), (2, Seq.empty[String]), (3, Seq("q", "r")))
    .toDF("k", "arr")
  private lazy val dim = Seq((1, "one"), (2, "two"), (2, "dos"), (4, "four"))
    .toDF("k", "name")

  /** The Generate node must sit ABOVE the Join in the optimized plan. */
  private def generateAboveJoin(q: org.apache.spark.sql.DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan}
    def containsJoin(p: LogicalPlan): Boolean =
      p.collectFirst { case j: Join => j }.isDefined
    val gens = q.queryExecution.optimizedPlan.collect { case g: Generate => g }
    gens.nonEmpty && gens.forall(g => containsJoin(g.child))
  }

  test("explode below an inner join hoists past it, same result") {
    val q = fact.select($"k", explode($"arr").as("w")).join(dim, "k")
    assert(generateAboveJoin(q), q.queryExecution.optimizedPlan.toString)
    val got = q.select($"k", $"w", $"name").as[(Int, String, String)].collect().sorted
    val want = fact.join(dim, "k")
      .select($"k", explode($"arr").as("w"), $"name")
      .select($"k", $"w", $"name").as[(Int, String, String)].collect().sorted
    assert(got.sameElements(want) && got.length == 5) // k=1: 3, k=2: 1 arr × 2 dims... = 2
  }

  test("left-outer join with left-side explode hoists, preserves unmatched") {
    val q = fact.select($"k", explode($"arr").as("w"))
      .join(dim, Seq("k"), "left_outer")
    assert(generateAboveJoin(q), q.queryExecution.optimizedPlan.toString)
    // k=3 has no dim match: its 2 exploded rows survive with null name
    val rows = q.as[(Int, String, Option[String])].collect()
    assert(rows.count(_._1 == 3) == 2 && rows.filter(_._1 == 3).forall(_._3.isEmpty))
  }

  test("join condition on the exploded column blocks the rewrite") {
    val words = Seq((10, "x"), (11, "q")).toDF("wid", "w")
    val q = fact.select($"k", explode($"arr").as("w")).join(words, "w")
    assert(!generateAboveJoin(q), q.queryExecution.optimizedPlan.toString)
    assert(q.count() == 2) // "x" from k=1, "q" from k=3
  }

  test("right-outer with left-side explode is NOT rewritten (null-pad side)") {
    val q = fact.select($"k", explode($"arr").as("w"))
      .join(dim, Seq("k"), "right_outer")
    assert(!generateAboveJoin(q), q.queryExecution.optimizedPlan.toString)
    // k=4 dim row survives with null w
    assert(q.filter($"name" === "four").count() == 1)
  }

  test("explode_outer hoists too and keeps empty-array rows") {
    val q = fact.select($"k", explode_outer($"arr").as("w")).join(dim, "k")
    assert(generateAboveJoin(q), q.queryExecution.optimizedPlan.toString)
    // k=2 empty-arr row: explode_outer keeps it (null w) × 2 dim rows
    assert(q.filter($"w".isNull).count() == 2)
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

  test("graft_fingerprint and graft_might_contain reject wrong arity with a clear error (r17 review)") {
    // extra args were silently discarded; zero args threw a bare
    // NoSuchElementException instead of the sibling builders' message
    val e1 = intercept[Exception] {
      spark.sql("SELECT graft_fingerprint('a', 2)").collect()
    }
    assert(e1.getMessage.contains("expects 1 argument"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_might_contain(cast('x' as binary))").collect()
    }
    assert(e2.getMessage.contains("expects 2 arguments"), e2.getMessage)
  }

  test("graft_dot rejects wrong input types at analysis") {
    val df = Seq((Seq(1.0), "x")).toDF("a", "b")
    intercept[Exception](df.select(call_function("graft_dot", $"a", $"b")).collect())
  }
}

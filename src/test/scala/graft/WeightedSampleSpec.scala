package graft

import org.apache.spark.sql.functions._
import graft.llm.Text

/** Efraimidis–Spirakis weighted sampling: exact top-k by key,
  * determinism, weight-proportional inclusion, degenerate weights. */
class WeightedSampleSpec extends SparkSuite {
  import spark.implicits._

  test("selection IS the k largest A-ES keys (sort reference), any partitioning") {
    val df = (1L to 300L).map(i => (i, (i % 7 + 1).toDouble)).toDF("id", "w")
    val got = Text.weightedSample(df, "id", "w", 20)
      .select("doc", "key").as[(Long, Double)].collect().toSet
    val want = df.select(col("id").as("doc"),
        Text.esKey(col("id"), col("w"), 42L).as("key"))
      .orderBy(col("key").desc, col("doc"))
      .limit(20).as[(Long, Double)].collect().toSet
    assert(got == want)
    val repart = Text.weightedSample(df.repartition(11), "id", "w", 20)
      .select("doc", "key").as[(Long, Double)].collect().toSet
    assert(repart == got)
  }

  test("inclusion tracks weight: a 10000x-heavy row appears in (almost) every draw") {
    val df = ((1L to 200L).map(i => (i, 1.0)) :+ (999L, 10000.0))
      .toDF("id", "w")
    val hits = (1 to 20).count { seed =>
      Text.weightedSample(df, "id", "w", 5, seed = seed.toLong)
        .filter(col("doc") === 999L).count() == 1L
    }
    assert(hits >= 19, s"heavy row drawn only $hits/20 times")
  }

  test("null, zero and negative weights are never drawn; k beyond candidates returns all") {
    val df = Seq[(Long, java.lang.Double)](
      (1L, 2.0), (2L, null), (3L, 0.0), (4L, -5.0), (5L, 1.0))
      .toDF("id", "w")
    val got = Text.weightedSample(df, "id", "w", 10)
      .select("doc").as[Long].collect().toSet
    assert(got == Set(1L, 5L))
  }

  test("weights ride through unchanged") {
    val df = (1L to 50L).map(i => (i, i * 1.5)).toDF("id", "w")
    val got = Text.weightedSample(df, "id", "w", 8)
      .select("doc", "weight").as[(Long, Double)].collect()
    got.foreach { case (d, w) => assert(w == d * 1.5) }
  }
}

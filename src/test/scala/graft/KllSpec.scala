package graft

import org.apache.spark.sql.functions._
import graft.ops.QuantileSketch

/** Uniform-capacity KLL quantile sketch: rank-error bound, exact
  * weight conservation, persisted re-merge, null/NaN skipping. */
class KllSpec extends SparkSuite {
  import spark.implicits._

  /** True rank band check: every φ-estimate's exact rank within
    * ±eps·n. Returns max relative rank error for reporting. */
  private def maxRankErr(values: Seq[Double], sk: Seq[Seq[Double]],
                         phis: Seq[Double]): Double = {
    val sorted = values.sorted
    val n = values.size
    val skDf = Seq(Tuple1(sk)).toDF("kll")
    phis.map { p =>
      val est = skDf.select(QuantileSketch.quantile($"kll", p)).as[Double].head()
      assert(!est.isNaN, s"phi=$p estimate is NaN")
      val rankLe = sorted.count(_ <= est)
      val rankLt = sorted.count(_ < est)
      // any rank in [rankLt+1, rankLe] is a valid rank of est; take the
      // closest to the target
      val target = math.max(1, math.ceil(p * n))
      val closest = math.max(math.min(target, rankLe), rankLt + 1)
      math.abs(closest - target) / n.toDouble
    }.max
  }

  private val phis = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  test("rank error stays under 0.02 at k=800 across sizes, orders and partitionings") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(500, 5000, 120000)) {
      // lognormal-ish skew: harder than uniform for quantiles
      val values = Seq.fill(n)(math.exp(rnd.nextGaussian() * 2))
      val df = values.toDF("v").repartition(13)
      val sk = QuantileSketch.sketch(df, $"v").as[Seq[Seq[Double]]].head()
      val err = maxRankErr(values, sk, phis)
      assert(err <= 0.02, s"n=$n rank error $err > 0.02")
      // weight conservation is exact at any n
      val tw = Seq(Tuple1(sk)).toDF("kll")
        .select(QuantileSketch.totalWeight($"kll")).as[Long].head()
      assert(tw == n.toLong, s"n=$n total weight $tw != $n")
    }
  }

  test("small inputs are EXACT (no compaction below capacity)") {
    val values = (1 to 700).map(_.toDouble)
    val sk = QuantileSketch.sketch(values.toDF("v").repartition(7), $"v")
      .as[Seq[Seq[Double]]].head()
    val skDf = Seq(Tuple1(sk)).toDF("kll")
    for (p <- phis) {
      val est = skDf.select(QuantileSketch.quantile($"kll", p)).as[Double].head()
      val target = math.max(1, math.ceil(p * 700).toInt)
      assert(est == target.toDouble, s"phi=$p: $est != $target")
    }
  }

  test("re-merging persisted per-group sketches obeys the same bound over the union") {
    val rnd = new scala.util.Random(5)
    val rows = Seq.fill(40000)((rnd.nextInt(6), rnd.nextGaussian() * 100))
    val df = rows.toDF("g", "v").repartition(11)
    val perGroup = QuantileSketch.sketchBy(df, Seq("g"), $"v")
    val merged = QuantileSketch.mergeSketches(perGroup, Nil)
      .as[Seq[Seq[Double]]].head()
    val err = maxRankErr(rows.map(_._2), merged, phis)
    assert(err <= 0.02, s"merged rank error $err > 0.02")
    val tw = Seq(Tuple1(merged)).toDF("kll")
      .select(QuantileSketch.totalWeight($"kll")).as[Long].head()
    assert(tw == 40000L)
  }

  test("null and NaN inputs are skipped; empty input estimates NaN") {
    val df = (Seq[java.lang.Double](1.0, null, 2.0, Double.NaN, 3.0))
      .toDF("v")
    val sk = QuantileSketch.sketch(df, $"v")
    val (tw, med) = sk.select(
        QuantileSketch.totalWeight($"kll"),
        QuantileSketch.quantile($"kll", 0.5)).as[(Long, Double)].head()
    assert(tw == 3L)
    assert(med == 2.0)
    val empty = QuantileSketch.sketch(df.filter($"v" > 100), $"v")
      .select(QuantileSketch.quantile($"kll", 0.5)).as[Double].head()
    assert(empty.isNaN)
  }

  test("a bigger-k sketch merges into a smaller k: weight conserved, smaller k's bound") {
    // pre-r17-review this refused via a level-0 capacity require; the
    // re-insert/cascade path handles it for free — the merged sketch
    // obeys the SMALLER k's bound (the weaker of the two)
    val vals = (1 to 5000).map(_.toDouble)
    val bigK = QuantileSketch.sketch(vals.toDF("v"), $"v", k = 1600)
      .as[Seq[Seq[Double]]].head()
    val merged = QuantileSketch.mergeSketches(
        Seq(Tuple1(bigK)).toDF("kll"), Nil, k = 64)
      .as[Seq[Seq[Double]]].head()
    val tw = Seq(Tuple1(merged)).toDF("kll")
      .select(QuantileSketch.totalWeight($"kll")).as[Long].head()
    assert(tw == 5000L)
    val err = maxRankErr(vals, merged, phis)
    assert(err <= 2.0 * merged.length / 64, s"rank error $err over the k=64 bound")
  }

  test("re-merge of persisted sketches is deterministic (content-hash parity seed)") {
    val rnd = new scala.util.Random(7)
    val df = Seq.fill(9000)((rnd.nextInt(4), rnd.nextGaussian()))
      .toDF("g", "v").repartition(7)
    val perGroup = QuantileSketch.sketchBy(df, Seq("g"), $"v")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    perGroup.count()
    val a = QuantileSketch.mergeSketches(perGroup.coalesce(1), Nil)
      .as[Seq[Seq[Double]]].head()
    val b = QuantileSketch.mergeSketches(perGroup.coalesce(1), Nil)
      .as[Seq[Seq[Double]]].head()
    perGroup.unpersist()
    assert(a == b)
  }

  test("NULL or NaN phi yields SQL NULL, never the sketch minimum (r17 review)") {
    val sk = QuantileSketch.sketch((1 to 100).map(_.toDouble).toDF("v"), $"v")
    val got = sk.select(
        QuantileSketch.quantileAt(QuantileSketch.weightedItems($"kll"),
          QuantileSketch.totalWeight($"kll"),
          lit(null).cast("double")).as("qn"),
        QuantileSketch.quantileAt(QuantileSketch.weightedItems($"kll"),
          QuantileSketch.totalWeight($"kll"),
          lit(Double.NaN)).as("qnan"),
        QuantileSketch.quantile($"kll", 0.5).as("med"))
      .as[(Option[Double], Option[Double], Double)].head()
    assert(got._1.isEmpty, s"null phi gave ${got._1}")
    assert(got._2.isEmpty, s"NaN phi gave ${got._2}")
    assert(got._3 == 50.0)
  }
}

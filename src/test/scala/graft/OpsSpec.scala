package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Rank

/** 2-pass global rank vs the single-partition window reference. */
class RankSpec extends SparkSuite {
  import spark.implicits._

  private lazy val df = {
    val rnd = new scala.util.Random(7)
    (1 to 500).map(i => (i, rnd.nextInt(50))).toDF("id", "score")
  }

  test("rowNumber matches window row_number over the same total order") {
    val got = Rank.rowNumber(df, Seq($"score".desc, $"id".asc), "rn")
      .select("id", "rn").as[(Int, Long)].collect().toMap
    val want = df.select($"id",
        row_number().over(Window.orderBy($"score".desc, $"id".asc)).cast("long"))
      .as[(Int, Long)].collect().toMap
    assert(got == want)
  }

  test("rank matches window rank (ties share min row number, with gaps)") {
    val got = Rank.rank(df, Seq("score"), ascending = false, "rnk")
      .select("id", "rnk").as[(Int, Long)].collect().toMap
    val want = df.select($"id",
        rank().over(Window.orderBy($"score".desc)).cast("long"))
      .as[(Int, Long)].collect().toMap
    assert(got == want)
  }

  test("denseRank matches window dense_rank") {
    val got = Rank.denseRank(df, Seq("score"), ascending = true, "drk")
      .select("id", "drk").as[(Int, Long)].collect().toMap
    val want = df.select($"id",
        dense_rank().over(Window.orderBy($"score".asc)).cast("long"))
      .as[(Int, Long)].collect().toMap
    assert(got == want)
  }

  test("rowNumber plan has no single-partition window exchange") {
    val plan = Rank.rowNumber(df, Seq($"score".asc, $"id".asc), "rn")
      .queryExecution.logical.toString
    assert(!plan.toLowerCase.contains("window"))
  }

  test("rank/denseRank keep null-key rows as their own rank group") {
    val withNulls = Seq((1, Some(5)), (2, None), (3, Some(5)), (4, None))
      .toDF("id", "score")
    val r = Rank.rank(withNulls, Seq("score"), ascending = true, "rnk")
      .select("id", "rnk").as[(Int, Long)].collect().toMap
    assert(r.keySet == Set(1, 2, 3, 4)) // nothing dropped
    assert(r(2) == r(4) && r(1) == r(3)) // nulls share a group, 5s share a group
    assert(r(2) == 1L) // nulls order first (asc)
    val d = Rank.denseRank(withNulls, Seq("score"), ascending = true, "drk")
      .select("id", "drk").as[(Int, Long)].collect().toMap
    assert(d.keySet == Set(1, 2, 3, 4) && d(2) == 1L && d(1) == 2L)
  }

  test("prefixSum guards: non-Long value column and duplicate sort keys fail loudly") {
    val ints = Seq((1, 10), (2, 20)).toDF("id", "v") // v is IntegerType
    val ex = intercept[IllegalArgumentException] {
      Rank.prefixSum(ints, Seq($"id".asc), "v")
    }
    assert(ex.getMessage.contains("LongType"))
    val dups = Seq((1L, 10L), (1L, 20L)).toDF("id", "v") // id not unique
    val ex2 = intercept[IllegalArgumentException] {
      Rank.prefixSum(dups, Seq($"id".asc), "v", checkUniqueSort = true)
    }
    assert(ex2.getMessage.contains("unique total order"))
    // the happy path with the debug check on still matches the window form
    val ok = Seq((3L, 5L), (1L, 2L), (2L, 4L)).toDF("id", "v")
    val got = Rank.prefixSum(ok, Seq($"id".asc), "v", "cum", checkUniqueSort = true)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 6L, 3L -> 11L))
  }
}

/** Misra–Gries heavy-hitters: exact under capacity, MG guarantees over
  * capacity, partition-order-invariant guarantees. */
class HeavyHittersSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.HeavyHitters

  private def sketch(df: org.apache.spark.sql.DataFrame, cap: Int): Map[String, Long] =
    df.agg(HeavyHitters.heavyHitters(cap)($"k").as("hh"))
      .selectExpr("explode(hh) AS e").select("e._1", "e._2")
      .as[(String, Long)].collect().toMap

  test("distinct keys within capacity: exact counts, sorted output") {
    val df = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("k")
    assert(sketch(df, 10) == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("null keys are ignored, not counted (and never NPE the tie sort)") {
    val df = (Seq("a", null, "a", null, "b", "c") : Seq[String]).toDF("k")
    val got = sketch(df, 10)
    assert(got == Map("a" -> 2L, "b" -> 1L, "c" -> 1L)) // b/c tie at 1 sorts fine
  }

  test("over capacity: every heavy item reported, estimates within the MG bound") {
    val rnd = new scala.util.Random(13)
    // zipf-ish: key i with frequency ~ 3000/i over 60 keys
    val data = (1 to 60).flatMap(i => Seq.fill(3000 / i)(s"k$i"))
    val shuffled = rnd.shuffle(data)
    val n = shuffled.size.toLong
    val exact = shuffled.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 13); cap <- Seq(8, 20)) {
      val df = shuffled.toDF("k").repartition(parts)
      val got = sketch(df, cap)
      val bound = n / (cap + 1)
      assert(got.size <= cap)
      got.foreach { case (k, est) =>
        assert(est <= exact(k), s"overestimate $k parts=$parts cap=$cap")
        assert(exact(k) - est <= bound, s"error bound $k parts=$parts cap=$cap")
      }
      exact.filter(_._2 > bound).keys.foreach { k =>
        assert(got.contains(k), s"heavy item $k missing parts=$parts cap=$cap")
      }
    }
  }
}

/** Salted join must produce exactly the rows of the plain join. */
class SaltSpec extends SparkSuite {
  import spark.implicits._

  test("saltedJoin equals the unsalted join on skewed data") {
    val rnd = new scala.util.Random(11)
    // 90% of rows hit one hot key — the salting use case
    val big = (1 to 5000).map(i =>
      (if (rnd.nextDouble() < 0.9) 1L else rnd.nextInt(50).toLong, i)).toDF("k", "v")
    val small = (0L to 50L).map(k => (k, s"dim$k")).toDF("k2", "name")
    val got = graft.ops.Salt.saltedJoin(big, "k", small, "k2", salts = 8)
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    val want = big.join(small, $"k" === $"k2")
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    assert(got == want && got.size == 5000)
  }

  test("saltedJoin works when the big side carries map columns (r17 ADVICE)") {
    import org.apache.spark.sql.functions._
    // hashing struct(all cols) fails analysis on MapType (and on maps
    // nested in structs); the salt must skip map-bearing columns
    val big = (1 to 500).map(i => (1L, i)).toDF("k", "v")
      .withColumn("m", map(lit("a"), col("v")))
      .withColumn("nested", struct(col("v").as("x"), map(lit("b"), col("v")).as("mm")))
    val small = Seq((1L, "dim1"), (2L, "dim2")).toDF("k2", "name")
    val got = graft.ops.Salt.saltedJoin(big, "k", small, "k2", salts = 4)
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    val want = big.join(small, $"k" === $"k2")
      .select("k", "v", "name").as[(Long, Int, String)].collect().toSet
    assert(got == want && got.size == 500)
    // the salt still spreads the hot key over multiple salt values
    val spread = big.withColumn("s",
        pmod(xxhash64(struct(col("k"), col("v"))), lit(4L)))
      .select("s").distinct().count()
    assert(spread > 1)
  }
}

/** Bloom semi-join: exact result, native (non-UDF) probe. */
class BloomJoinSpec extends SparkSuite {
  import spark.implicits._

  test("bloom semiJoin equals the exact left-semi join, for long and string keys") {
    val left = (1 to 2000).map(i => (i.toLong, s"s${i % 97}", i)).toDF("k", "sk", "v")
    val right = (1 to 400).map(i => (i * 3L, s"s${i % 41}")).toDF("k2", "sk2")
    val gotL = graft.ops.BloomJoin.semiJoin(left, "k", right, "k2", 10000L, 0.03)
      .select("k", "v").as[(Long, Int)].collect().toSet
    val wantL = left.join(right, $"k" === $"k2", "left_semi")
      .select("k", "v").as[(Long, Int)].collect().toSet
    assert(gotL == wantL)
    val gotS = graft.ops.BloomJoin.semiJoin(left, "sk", right, "sk2", 10000L, 0.03)
      .select("k", "v").as[(Long, Int)].collect().toSet
    val wantS = left.join(right, $"sk" === $"sk2", "left_semi")
      .select("k", "v").as[(Long, Int)].collect().toSet
    assert(gotS == wantS)
  }

  test("semiJoin with differing key types still equals the exact semi-join (r17 review)") {
    // "042" (string) vs 42 (bigint): the exact join coerces and
    // matches; a cast-then-hash bloom would read hash("042") vs
    // hash("42") — a false NEGATIVE — so the pre-filter must be
    // skipped, never trusted, across types
    val left = Seq("042", "42", "7", "xyz").toDF("k")
    val right = Seq(42L, 8L).toDF("k2")
    val got = graft.ops.BloomJoin.semiJoin(left, "k", right, "k2")
      .select("k").as[String].collect().toSet
    val want = left.join(right, $"k" === $"k2", "left_semi")
      .select("k").as[String].collect().toSet
    assert(got == want, s"got $got want $want")
  }

  test("bloom probe is the native might_contain expression, not a Scala UDF") {
    // range-backed inputs: LocalRelation would let ConvertToLocalRelation
    // evaluate the probe filter at optimization time and hide it
    val left = spark.range(100).select($"id".as("k"), ($"id" * 2).as("v"))
    val right = spark.range(10).select(($"id" * 2).as("k2"), $"id".as("w"))
    val plan = graft.ops.BloomJoin.semiJoin(left, "k", right, "k2", 1000L, 0.03)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(2000))
    assert(!plan.contains("UDF"), plan.take(2000))
  }
}

/** Exact-median Aggregator vs a driver-side sort. */
class MedianAggSpec extends SparkSuite {
  import spark.implicits._

  test("median matches driver-side computation for odd/even group sizes") {
    val rnd = new scala.util.Random(13)
    val data = (1 to 999).map(i => (i % 7, rnd.nextInt(1000).toDouble))
    val got = data.toDF("k", "v").groupBy($"k")
      .agg(graft.ops.MedianAgg.median($"v").as("med"))
      .as[(Int, Double)].collect().toMap
    val want = data.groupBy(_._1).map { case (k, vs) =>
      val s = vs.map(_._2).sorted
      val n = s.length
      k -> (if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0)
    }
    assert(got == want)
  }

  test("median ignores SQL NULLs, matching DuckDB/Postgres median") {
    val df = Seq((1, Some(1.0)), (1, Some(2.0)), (1, Some(3.0)), (1, None))
      .toDF("k", "v")
    val got = df.groupBy($"k").agg(graft.ops.MedianAgg.median($"v").as("med"))
      .as[(Int, Double)].head()
    assert(got == ((1, 2.0))) // not 1.5 (which a null→0.0 decode would give)
  }

  test("an all-NULL group yields SQL NULL, not NaN (r17 review)") {
    val df = Seq((1, Some(1.0)), (2, None), (2, None)).toDF("k", "v")
    val got = df.groupBy($"k").agg(graft.ops.MedianAgg.median($"v").as("med"))
      .orderBy($"k").as[(Int, Option[Double])].collect().toSeq
    assert(got == Seq((1, Some(1.0)), (2, None)))
  }

  test("NaN inputs are skipped like NULL, never poison the median (r17 review pass 3)") {
    // even-count group: [1, NaN] would mean (1+NaN)/2 = NaN; odd-count
    // group: [1, 2, NaN] would report 2 (NaN sorts last) — both must
    // instead drop the NaN, matching KllAgg/TopKAgg
    val df = Seq((1, 1.0), (1, Double.NaN),
      (2, 1.0), (2, 2.0), (2, Double.NaN)).toDF("k", "v")
    val got = df.groupBy($"k").agg(graft.ops.MedianAgg.median($"v").as("med"))
      .orderBy($"k").as[(Int, Double)].collect().toSeq
    assert(got == Seq((1, 1.0), (2, 1.5)))
  }
}

/** Partitioned store sink: hive-style dirs + partition pruning on read. */
class StorePartitionedSpec extends SparkSuite {
  import spark.implicits._

  test("storePartitioned writes hive dirs and readers prune partitions") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString + "/out"
    val df = (1 to 100).map(i => (i, s"g${i % 3}")).toDF("v", "g")
    graft.dsl.Rel(df).storePartitioned(tmp, Seq("g"))
    val dirs = new java.io.File(tmp).listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs == Set("g=g0", "g=g1", "g=g2"))
    val back = spark.read.parquet(tmp).filter($"g" === "g1")
    assert(back.count() == df.filter($"g" === "g1").count())
    // partition filter must reach the scan as a partition filter, not a data filter
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("g1"), scan.take(1500))
  }
}

/** As-of join: backward-inclusive point-in-time match, LEFT semantics,
  * deterministic tie-break, single-shuffle plan shape.
  */
class AsofJoinSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.AsofJoin

  private lazy val left = Seq(
    (1L, 10L, 100L), // user 10, t=100
    (2L, 10L, 205L),
    (3L, 20L, 50L),  // user 20: no purchase at or before 50
    (4L, 30L, 300L)  // user 30: no right rows at all
  ).toDF("event_id", "user_id", "t")

  private lazy val right = Seq(
    (100L, 10L, 100L, 1.0), // exactly at left t=100 → inclusive match
    (101L, 10L, 200L, 2.0),
    (102L, 10L, 201L, 3.0), // latest ≤205
    (103L, 20L, 60L, 4.0)   // after left t=50 → no match
  ).toDF("pid", "user_id", "t", "value")

  private def run(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame) =
    AsofJoin.asof(l, r, Seq("user_id"), "t", "t", Seq("pid", "value"), "prior_")
      .select("event_id", "prior_pid", "prior_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, p, v) => k -> (p, v) }.toMap

  test("backward-inclusive latest match; null when nothing at-or-before") {
    val got = run(left, right)
    assert(got(1L) == (Some(100L), Some(1.0)))   // equal timestamp matches
    assert(got(2L) == (Some(102L), Some(3.0)))   // latest of three priors
    assert(got(3L) == (None, None))              // right exists but only later
    assert(got(4L) == (None, None))              // key absent on right
  }

  test("ties on right time break to the greatest payload, deterministically") {
    val tied = Seq((200L, 10L, 100L, 9.0), (201L, 10L, 100L, 8.0))
      .toDF("pid", "user_id", "t", "value")
    val got = run(left.filter($"event_id" === 1L), tied)
    assert(got(1L) == (Some(201L), Some(8.0)))   // max pid wins (struct order)
  }

  test("plan has exactly one shuffle and no cartesian/broadcast-nested-loop") {
    val plan = AsofJoin.asof(left, right, Seq("user_id"), "t", "t",
      Seq("pid"), "p_").queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, plan.take(2000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }

  private def runBucketed(l: org.apache.spark.sql.DataFrame,
                          r: org.apache.spark.sql.DataFrame, width: Long) =
    AsofJoin.asof(l, r, Seq("user_id"), "t", "t", Seq("pid", "value"), "prior_",
        bucketWidth = Some(width))
      .select("event_id", "prior_pid", "prior_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, p, v) => k -> (p, v) }.toMap

  test("hot-key bucketed form equals the single-window form, across widths") {
    // widths chosen so matches land within-bucket (1000), one bucket per
    // row (1), and mixed (64: some matches cross bucket boundaries and
    // must ride the carry-in prefix scan)
    val want = run(left, right)
    for (w <- Seq(1L, 64L, 1000L))
      assert(runBucketed(left, right, w) == want, s"width $w")
    // randomized cross-check: many keys, duplicate timestamps, left rows
    // before/after all right rows
    val rnd = new scala.util.Random(3)
    val bigL = (1 to 400).map(i =>
      (i.toLong, (rnd.nextInt(5) + 10).toLong, rnd.nextInt(500).toLong))
      .toDF("event_id", "user_id", "t")
    val bigR = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(6) + 10).toLong, rnd.nextInt(500).toLong, rnd.nextInt(9).toDouble))
      .toDF("pid", "user_id", "t", "value")
    val wantBig = run(bigL, bigR)
    for (w <- Seq(7L, 100L))
      assert(runBucketed(bigL, bigR, w) == wantBig, s"width $w")
  }

  private def runDir(l: org.apache.spark.sql.DataFrame, r: org.apache.spark.sql.DataFrame,
                     dir: String, width: Option[Long] = None) =
    AsofJoin.asof(l, r, Seq("user_id"), "t", "t", Seq("pid", "value"), "prior_",
        bucketWidth = width, direction = dir)
      .select("event_id", "prior_pid", "prior_value")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map { case (k, p, v) => k -> (p, v) }.toMap

  test("forward direction: smallest right time at-or-after; ties to smallest payload") {
    val got = runDir(left, right, "forward")
    assert(got(1L) == (Some(100L), Some(1.0)))  // equal timestamp still inclusive
    assert(got(2L) == (None, None))             // nothing at-or-after 205
    assert(got(3L) == (Some(103L), Some(4.0)))  // t=60 is the first ≥ 50
    assert(got(4L) == (None, None))
    val tied = Seq((201L, 10L, 150L, 9.0), (200L, 10L, 150L, 8.0))
      .toDF("pid", "user_id", "t", "value")
    val g2 = runDir(left.filter($"event_id" === 1L), tied, "forward")
    assert(g2(1L) == (Some(200L), Some(8.0)))   // min payload struct wins
  }

  test("forward equals backward under time negation (mirror property)") {
    val rnd = new scala.util.Random(5)
    val bigL = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(4) + 10).toLong, rnd.nextInt(400).toLong))
      .toDF("event_id", "user_id", "t")
    val bigR = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(5) + 10).toLong, rnd.nextInt(400).toLong, rnd.nextInt(9).toDouble))
      .toDF("pid", "user_id", "t", "value")
    val fwd = runDir(bigL, bigR, "forward")
    // mirror: negate all times and run backward — matched ROW TIMES
    // mirror exactly; payload tie-break mirrors too (greatest payload on
    // negated-backward vs smallest on forward differ), so compare on
    // the matched pid SET per (event, |t|) only where times are unique
    val uniqR = bigR.groupBy($"user_id", $"t").count().filter($"count" === 1)
      .select($"user_id", $"t")
    val bigRu = bigR.join(uniqR, Seq("user_id", "t"))
    val fwdU = runDir(bigL, bigRu, "forward")
    val mirrored = runDir(
      bigL.withColumn("t", -$"t"), bigRu.withColumn("t", -$"t"), "backward")
    assert(fwdU == mirrored)
    assert(fwd.size == bigL.count()) // all left rows survive regardless
  }

  test("nearest direction: closer of the two matches; equal distance breaks backward") {
    val got = runDir(left, right, "nearest")
    assert(got(1L) == (Some(100L), Some(1.0)))  // exact hit → backward d=0
    assert(got(2L) == (Some(102L), Some(3.0)))  // only backward exists
    assert(got(3L) == (Some(103L), Some(4.0)))  // only forward exists
    assert(got(4L) == (None, None))             // no right rows at all
    val sides = Seq((300L, 10L, 90L, 1.5), (301L, 10L, 110L, 2.5))
      .toDF("pid", "user_id", "t", "value")
    val g2 = runDir(left.filter($"event_id" === 1L), sides, "nearest")
    assert(g2(1L) == (Some(300L), Some(1.5)))   // d=10 both ways → backward
    val closer = Seq((300L, 10L, 80L, 1.5), (301L, 10L, 105L, 2.5))
      .toDF("pid", "user_id", "t", "value")
    val g3 = runDir(left.filter($"event_id" === 1L), closer, "nearest")
    assert(g3(1L) == (Some(301L), Some(2.5)))   // forward d=5 beats backward d=20
  }

  test("null times: null-time right rows never match; null-time left rows get nulls") {
    val nl = Seq((1L, 10L, Some(100L)), (2L, 10L, None))
      .toDF("event_id", "user_id", "t")
    val nr = Seq(
      (500L, 10L, None, 7.0),        // null-time right row — must be ignored
      (501L, 10L, Some(90L), 1.0))
      .toDF("pid", "user_id", "t", "value")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val got = AsofJoin.asof(nl, nr, Seq("user_id"), "t", "t",
          Seq("pid", "value"), "m_", direction = dir)
        .select("event_id", "m_pid").as[(Long, Option[Long])].collect().toMap
      assert(got(2L).isEmpty, s"null-time left row matched in $dir")
      assert(got(1L) != Some(500L), s"null-time right row matched in $dir")
    }
    // and the real match still works where direction semantics allow
    val back = AsofJoin.asof(nl, nr, Seq("user_id"), "t", "t",
        Seq("pid", "value"), "m_", direction = "backward")
      .select("event_id", "m_pid").as[(Long, Option[Long])].collect().toMap
    assert(back(1L) == Some(501L))
    // BUCKETED form: identical null handling — null-time/null-key left
    // rows must survive with null payloads, not vanish in the carry join
    val nlk = Seq((1L, Some(10L), Some(100L)), (2L, Some(10L), None),
      (3L, None, Some(50L)))
      .toDF("event_id", "user_id", "t")
    val nrk = Seq((501L, Some(10L), Some(90L), 1.0))
      .toDF("pid", "user_id", "t", "value")
    for (dir <- Seq("backward", "forward", "nearest")) {
      val single = AsofJoin.asof(nlk, nrk, Seq("user_id"), "t", "t",
          Seq("pid", "value"), "m_", direction = dir)
        .select("event_id", "m_pid").as[(Long, Option[Long])].collect().toMap
      val bucketed = AsofJoin.asof(nlk, nrk, Seq("user_id"), "t", "t",
          Seq("pid", "value"), "m_", direction = dir, bucketWidth = Some(64L))
        .select("event_id", "m_pid").as[(Long, Option[Long])].collect().toMap
      assert(bucketed.keySet == Set(1L, 2L, 3L), s"rows dropped in bucketed $dir")
      assert(bucketed == single, s"bucketed != single for $dir: $bucketed vs $single")
      assert(bucketed(2L).isEmpty && bucketed(3L).isEmpty)
    }
    // null KEYS group together (window semantics) and their carry must
    // flow ACROSS buckets too: left (null, t=100) matches right
    // (null, t=5) nine buckets earlier — the summary-attach join must
    // be null-safe, not just the final carry join
    val nullKeyL = Seq((1L, Option.empty[Long], Some(100L)))
      .toDF("event_id", "user_id", "t")
    val nullKeyR = Seq((700L, Option.empty[Long], Some(5L), 3.0))
      .toDF("pid", "user_id", "t", "value")
    for (dir <- Seq("backward", "nearest")) {
      val single = AsofJoin.asof(nullKeyL, nullKeyR, Seq("user_id"), "t", "t",
          Seq("pid", "value"), "m_", direction = dir)
        .select("m_pid").as[Option[Long]].head()
      val bucketed = AsofJoin.asof(nullKeyL, nullKeyR, Seq("user_id"), "t", "t",
          Seq("pid", "value"), "m_", direction = dir, bucketWidth = Some(10L))
        .select("m_pid").as[Option[Long]].head()
      assert(single == Some(700L), s"single-window null-key match lost in $dir")
      assert(bucketed == single, s"bucketed cross-bucket null-key carry lost in $dir")
    }
  }

  test("forward and nearest bucketed forms equal their single-window forms") {
    val rnd = new scala.util.Random(9)
    val bigL = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(4) + 10).toLong, rnd.nextInt(400).toLong))
      .toDF("event_id", "user_id", "t")
    val bigR = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(5) + 10).toLong, rnd.nextInt(400).toLong, rnd.nextInt(9).toDouble))
      .toDF("pid", "user_id", "t", "value")
    for (dir <- Seq("forward", "nearest"); w <- Seq(7L, 100L))
      assert(runDir(bigL, bigR, dir, Some(w)) == runDir(bigL, bigR, dir),
        s"$dir width $w")
  }

  test("bucketed plan windows on (key, bucket) — no whole-key window partition") {
    val plan = AsofJoin.asof(left, right, Seq("user_id"), "t", "t",
      Seq("pid"), "p_", bucketWidth = Some(64L)).queryExecution.executedPlan.toString
    // the big row-level window must partition by key AND time bucket;
    // the only per-key window runs over the bucket-summary stream
    assert(plan.contains("graft_asof_b"), plan.take(3000))
    val rowWindow = "windowspecdefinition\\(user_id[^)]*graft_asof_b".r
    assert(rowWindow.findFirstIn(plan.toLowerCase).isDefined
      || plan.contains("partitionBy: [user_id"), plan.take(3000))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"))
  }
}

/** Bucketized range join: equals the naive quadratic join, zero-match
  * rows kept, no nested-loop/cartesian in the plan.
  */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.RangeJoin

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000) // ms precision inputs

  test("counts match the naive cross filter, including zero-match rows") {
    val rnd = new scala.util.Random(11)
    val lefts = (1L to 200L).map(i => (i, rnd.nextInt(100000).toLong * 1000))
    val rights = (1 to 300).map(_ => rnd.nextInt(100000).toLong * 1000)
    val l = lefts.map { case (i, us) => (i, ts(us)) }.toDF("id", "t")
    val r = rights.map(us => Tuple1(ts(us))).toDF("t")
    val radius = 5000L * 1000 // 5s in us

    val got = RangeJoin.countWithinRadius(l, r, "id", "t", "t", radius, as = "n")
      .select("id", "n").as[(Long, Long)].collect().toMap
    val want = lefts.map { case (i, us) =>
      i -> rights.count(ru => math.abs(us - ru) <= radius).toLong }.toMap
    assert(got == want)
    assert(got.values.exists(_ == 0L) || want.values.forall(_ > 0L))
  }

  test("odd bucket width (width != radius) still exact") {
    val l = Seq((1L, ts(10000000L)), (2L, ts(99000000L))).toDF("id", "t")
    val r = Seq(ts(9000000L), ts(11500000L), ts(50000000L)).map(Tuple1(_)).toDF("t")
    val got = RangeJoin.countWithinRadius(l, r, "id", "t", "t",
        2000000L, widthUs = 700000L, as = "n")
      .select("id", "n").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L, 2L -> 0L))
  }

  test("timestamps beyond 2^53 us bucket exactly (decimal division, r17 review)") {
    // at ~9.1e15 us a double's ulp is 2 us > 0: double-divided buckets
    // can disagree between the two sides and drop an in-range pair
    val base = 9100000000000000L // > 2^53 ~ 9.007e15
    val radius = 5000000L
    val l = Seq((1L, ts(base))).toDF("id", "t")
    val r = Seq(ts(base + radius), ts(base + radius + 1000),
      ts(base - radius), ts(base - radius - 1000)).map(Tuple1(_)).toDF("t")
    val got = RangeJoin.countWithinRadius(l, r, "id", "t", "t", radius, as = "n")
      .select("id", "n").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 2L), got)
    val gotOdd = RangeJoin.countWithinRadius(l, r, "id", "t", "t", radius,
        widthUs = 777000L, as = "n")
      .select("id", "n").as[(Long, Long)].collect().toMap
    assert(gotOdd == Map(1L -> 2L), gotOdd)
  }

  test("plan is a hash equi-join on buckets, not a nested loop") {
    val l = Seq((1L, ts(1000L))).toDF("id", "t")
    val r = Seq(Tuple1(ts(2000L))).toDF("t")
    val plan = RangeJoin.countWithinRadius(l, r, "id", "t", "t", 1000000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan.take(2000))
  }
}

/** Mergeable HLL distinct sketches: error band + exact merge identity. */
class SketchesSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.Sketches

  private lazy val vals = (1 to 20000).map(i => (i % 4, s"v${i % 7919}")).toDF("g", "x")

  test("approxDistinct lands within 5% of the exact distinct count per group") {
    val approx = Sketches.approxDistinct(vals, Seq("g"), "x")
      .as[(Int, Long)].collect().toMap
    val exact = vals.groupBy($"g").agg(countDistinct($"x").cast("long"))
      .as[(Int, Long)].collect().toMap
    exact.foreach { case (g, nd) =>
      assert(math.abs(approx(g) - nd) <= nd * 0.05, s"group $g: ${approx(g)} vs $nd")
    }
  }

  test("merging per-part sketches equals the single whole-set sketch exactly") {
    val perPart = Sketches.distinctSketch(
      vals.withColumn("part", pmod(length($"x"), lit(3))), Seq("g", "part"), "x")
    val merged = Sketches.mergeSketches(perPart, Seq("g"))
      .select($"g", Sketches.estimate($"sketch").as("nd")).as[(Int, Long)].collect().toMap
    val whole = Sketches.distinctSketch(vals, Seq("g"), "x")
      .select($"g", Sketches.estimate($"sketch").as("nd")).as[(Int, Long)].collect().toMap
    assert(merged == whole)
  }

  test("global merge (no group cols) unions every sketch") {
    val perGroup = Sketches.distinctSketch(vals, Seq("g"), "x")
    val global = Sketches.mergeSketches(perGroup, Nil)
      .select(Sketches.estimate($"sketch").cast("long")).as[Long].head()
    val exact = vals.select(countDistinct($"x").cast("long")).as[Long].head()
    assert(math.abs(global - exact) <= exact * 0.05, s"$global vs $exact")
  }
}

/** Count-Min sketch: CMS guarantees, merge=union, partition
  * insensitivity, null handling. */
class CountMinSpec extends SparkSuite {
  import spark.implicits._
  import graft.ops.CountMin

  private val depth = 4
  private val width = 512

  test("estimates never undercount and stay within the CMS bound") {
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle((1 to 80).flatMap(i => Seq.fill(2000 / i)(s"w$i")))
    val n = data.size.toLong
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val df = data.toDF("k").repartition(9)
    val sk = CountMin.sketch(df, $"k", depth, width)
    val keys = exact.keys.toSeq.sorted.toDF("k")
    val got = keys.crossJoin(broadcast(sk))
      .select($"k", CountMin.estimate($"cm", $"k", depth, width).as("est"))
      .as[(String, Long)].collect().toMap
    val bound = 3L * n / width
    exact.foreach { case (k, c) =>
      assert(got(k) >= c, s"undercount $k: ${got(k)} < $c")
      assert(got(k) <= c + bound, s"over bound $k: ${got(k)} > $c + $bound")
    }
  }

  test("re-merging persisted per-group sketches equals the whole-input sketch") {
    val df = (1 to 500).map(i => (s"g${i % 3}", s"w${i % 37}")).toDF("g", "k")
    val whole = CountMin.sketch(df, $"k", depth, width)
      .as[Seq[Long]].head()
    val merged = CountMin.mergeSketches(
        CountMin.sketchBy(df, Seq("g"), $"k", depth, width), Nil)
      .as[Seq[Long]].head()
    assert(merged == whole) // addition IS union — bit-identical
    // and differing partitioning changes nothing (exact integer sums)
    val repart = CountMin.sketch(df.repartition(17), $"k", depth, width)
      .as[Seq[Long]].head()
    assert(repart == whole)
  }

  test("null keys are skipped on build and estimate to null") {
    val df = (Seq("a", null, "a", null, "b"): Seq[String]).toDF("k")
    val sk = CountMin.sketch(df, $"k", depth, width)
    // total mass per hash row = the 3 non-null keys
    val grid = sk.as[Seq[Long]].head()
    (0 until depth).foreach { d =>
      assert(grid.slice(d * width, (d + 1) * width).sum == 3L, s"row $d mass")
    }
    val est = df.limit(1).crossJoin(broadcast(sk))
      .select(CountMin.estimate($"cm", lit(null).cast("string"), depth, width))
      .collect()(0)
    assert(est.isNullAt(0))
  }

  test("mismatched sketch sizes fail loudly at merge") {
    val a = CountMin.sketch(Seq("x").toDF("k"), $"k", 2, 64)
    val b = CountMin.sketch(Seq("x").toDF("k"), $"k", 2, 128)
    val err = intercept[Exception] {
      CountMin.mergeSketches(a.union(b), Nil).collect()
    }
    assert(err.getMessage.contains("sketch size mismatch")
      || err.getCause != null)
  }
}

/** Secondary-sort run iterator (r17 review regressions). */
class SecondarySortSpec extends SparkSuite {
  import spark.implicits._
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  test("binary group keys compare by content, not reference") {
    // Row.get returns a fresh Array[Byte] per access; reference
    // equality would split every row into its own run
    val df = Seq(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L), ("c", 5L))
      .toDF("g", "v")
      .select(org.apache.spark.sql.functions.expr("cast(g as binary)").as("gb"),
        $"v")
    val schema = StructType(Seq(
      StructField("n", LongType), StructField("s", LongType)))
    val got = graft.ops.SecondarySort.sortedGroups(
        df, Seq("gb"), Seq("v"), schema) { (_, rows) =>
        var n = 0L; var s = 0L
        rows.foreach { r => n += 1; s += r.getLong(1) }
        Iterator(Row(n, s))
      }
      .as[(Long, Long)].collect().toSet
    assert(got == Set((2L, 3L), (2L, 7L), (1L, 5L)), got)
  }

  test("unconsumed run rows drain; output streams without whole-group buffering") {
    val df = (1 to 100).map(i => (i % 4, i)).toDF("g", "v")
    val schema = StructType(Seq(StructField("g", IntegerType),
      StructField("first_v", IntegerType)))
    // callback reads only the FIRST row of each run: the drain must
    // land the outer iterator on the next key
    val got = graft.ops.SecondarySort.sortedGroups(
        df, Seq("g"), Seq("v"), schema) { (key, rows) =>
        val h = rows.next()
        Iterator(Row(key.head, h.getInt(1)))
      }
      .as[(Int, Int)].collect().toSet
    assert(got == Set((0, 4), (1, 1), (2, 2), (3, 3)), got)
  }
}

/** Profile over degenerate inputs (r17 review regression). */
class ProfileEmptySpec extends SparkSuite {
  import spark.implicits._

  test("an empty table profiles n_null = 0, not NULL") {
    val empty = Seq.empty[(Long, String)].toDF("a", "b")
    val got = graft.ops.Profile.profile(empty, Seq("a", "b"))
    val rows = got.collect()
    assert(rows.nonEmpty)
    val nullIdx = got.columns.indexOf("n_null")
    assert(nullIdx >= 0 && rows.forall(r => !r.isNullAt(nullIdx) && r.getLong(nullIdx) == 0L),
      rows.mkString(","))
  }
}

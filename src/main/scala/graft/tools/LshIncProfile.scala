package graft.tools

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Graft, Tables}
import graft.llm.Dedup

/** Stage profile for the q119 iteration bimodality (r17): the 64×
  * curve's repeated iterations swing 23 s ↔ 180 s inside one JVM with
  * no warning-level signal. This probe replays lshIncremental's
  * stages (the DedupProfile replica discipline — same kernels, same
  * shapes, each stage forced behind its own action) per iteration, so
  * the swing lands on a named stage instead of the whole operator.
  */
object LshIncProfile {
  private def time[A](f: => A): (Double, A) = {
    val t0 = System.nanoTime(); val r = f; ((System.nanoTime() - t0) / 1e9, r)
  }

  private def multiply(base: DataFrame, m: Int): DataFrame =
    (1 until m).map { c =>
      base.select((col("doc_id") + c.toLong * 10000000L).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), " "),
          w => concat(lit(s"x${c}_"), w))).as("text"))
    }.foldLeft(base.select(col("doc_id"), col("text")))(_ union _)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(64)
    val iters = args.drop(2).headOption.map(_.toInt).getOrElse(6)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val numHashes = 64
    val bands = 16
    val spark = Graft.localSession(cpus, "lshinc-profile")
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.load(spark, dir, "documents")
    val docs = multiply(base, m)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    spark.range(1000000).selectExpr("sum(id)").collect()

    def estJaccard(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / numHashes

    // derived copy-id base (QCommon.copyBase, the r20 single
    // definition) — the old +1e9 aliased store ids at 256×
    val cb = graft.queries.QCommon.copyBase(docs, "doc_id")
    for (iter <- 1 to iters) {
      val evens = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      val batch = docs.select(col("doc_id"), col("text"))
        .filter(pmod(col("doc_id"), lit(2)) === 1)
        .unionByName(evens.select(
          (col("doc_id") + cb).as("doc_id"), col("text")))

      // (a) store signature derivation, forced alone
      val (tStoreSig, nStore) = time {
        Dedup.minhashSignatures(evens, "doc_id", "text").count()
      }
      val store = Dedup.minhashSignatures(evens, "doc_id", "text")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      store.count()

      // (b) batch signatures + exact-signature collapse (= reps)
      val (tReps, nReps) = time {
        Dedup.minhashSignatures(batch, "doc_id", "text")
          .groupBy(xxhash64(col("sig")).as("fp_a"),
            xxhash64(lit("graft-fp2"), col("sig")).as("fp_b"))
          .agg(min(col("id")).as("id"), min_by(col("sig"), col("id")).as("sig"))
          .count()
      }
      val reps = Dedup.minhashSignatures(batch, "doc_id", "text")
        .groupBy(xxhash64(col("sig")).as("fp_a"),
          xxhash64(lit("graft-fp2"), col("sig")).as("fp_b"))
        .agg(min(col("id")).as("id"), min_by(col("sig"), col("id")).as("sig"))
        .select(col("id"), col("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      reps.count()

      val repBands = reps.select(col("id"),
          posexplode(call_function("graft_band_keys_sig", col("sig"), lit(bands))))
        .toDF("id", "band", "key")

      // (c) within-batch: bucket agg + pair expansion + sig verify
      val (tWithin, nWithin) = time {
        repBands.groupBy(col("band"), col("key"))
          .agg(collect_list(col("id")).as("ds"))
          .filter(size(col("ds")).between(2, 10000))
          .select(explode(col("ds")).as("a"), col("ds"))
          .select(col("a"), explode(col("ds")).as("b"))
          .filter(col("a") < col("b"))
          .distinct()
          .join(reps.toDF("a", "sa"), "a")
          .join(reps.toDF("b", "sb"), "b")
          .filter(estJaccard(col("sa"), col("sb")) >= 0.9)
          .count()
      }

      // (d) store bucket index derivation
      val (tStoreBuckets, nBuckets) = time {
        store.select(col("id").as("sid"),
            posexplode(call_function("graft_band_keys_sig", col("sig"), lit(bands))))
          .toDF("sid", "band", "key")
          .groupBy(col("band"), col("key"))
          .agg(collect_list(col("sid")).as("ds"))
          .filter(size(col("ds")) <= 10000)
          .count()
      }

      // (e) cross: batch bands vs store buckets + sig verify
      val (tCross, nCross) = time {
        val storeBuckets = store.select(col("id").as("sid"),
            posexplode(call_function("graft_band_keys_sig", col("sig"), lit(bands))))
          .toDF("sid", "band", "key")
          .groupBy(col("band"), col("key"))
          .agg(collect_list(col("sid")).as("ds"))
          .filter(size(col("ds")) <= 10000)
        repBands.join(storeBuckets, Seq("band", "key"))
          .select(col("id"), explode(col("ds")).as("sid"))
          .distinct()
          .join(reps, "id")
          .join(store.select(col("id").as("sid"), col("sig").as("ssig")), "sid")
          .filter(estJaccard(col("sig"), col("ssig")) >= 0.9)
          .count()
      }

      // (f) the real operator end to end (fresh lineage, store persisted)
      val (tFull, nFull) = time {
        Dedup.lshIncremental(batch, "doc_id", "text", store).count()
      }
      graft.dsl.Rel.releaseTracked()
      reps.unpersist(); store.unpersist()
      println(f"LSHINC iter=$iter m=$m storeSig=${tStoreSig}%.2f($nStore) " +
        f"reps=${tReps}%.2f($nReps) within=${tWithin}%.2f($nWithin) " +
        f"storeBuckets=${tStoreBuckets}%.2f($nBuckets) cross=${tCross}%.2f($nCross) " +
        f"full=${tFull}%.2f($nFull)")
    }
    spark.stop()
  }
}

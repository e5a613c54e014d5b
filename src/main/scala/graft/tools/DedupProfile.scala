package graft.tools

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{Graft, Tables}
import graft.llm.Dedup

/** Scratch profiler for the minhash-LSH regression hunt: times each
  * stage of the q31 pipeline at sf0.1. Not part of the library surface.
  */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession(4, "dedup-profile")
    spark.sparkContext.setLogLevel("INFO")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val d = Tables.load(spark, dir, "documents")
    // derived mutated-copy base (QCommon.copyBase, the r20 single
    // definition) — fixed constants alias real ids on scaled id spaces
    val cb = graft.queries.QCommon.copyBase(d, "doc_id")
    val mutated = d.filter(pmod(col("doc_id"), lit(10)) === 0)
      .select((col("doc_id") + cb).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 4, 1000000)).as("text"))
    val docs = d.select(col("doc_id"), col("text")).union(mutated)
    docs.count() // warmup

    (1 to 3).foreach { i =>
      time(s"full minhashLsh run $i") {
        Dedup.minhashLsh(docs, "doc_id", "text", 3, 64, 32, 0.6).count()
      }
      spark.catalog.clearCache()
    }

    // stage-by-stage replica of the CURRENT pipeline
    val src = docs.select(col("doc_id"), col("text"))
    val groups = src.groupBy(col("text"))
      .agg(min(col("doc_id")).as("rep"), collect_list(col("doc_id")).as("ids"))
    val mem = time("mem persist+count") {
      val m = groups.select(col("rep"), explode(col("ids")).as("id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      m.count(); m
    }
    val shingleSchema = StructType(Seq(
      StructField("doc", LongType), StructField("sh", ArrayType(StringType))))
    val shingled = time("shingled persist+count") {
      val s = spark.createDataFrame(
        groups.select(col("rep"), col("text")).rdd.mapPartitions(_.map { r =>
          Row(r.get(0), Dedup.shingleSet(r.getString(1), 3).toSeq)
        }), shingleSchema)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      s.count(); s
    }
    val bandSchema = StructType(Seq(
      StructField("doc", LongType),
      StructField("band", IntegerType), StructField("key", LongType)))
    val banded = spark.createDataFrame(
      shingled.rdd.mapPartitions(_.flatMap { r =>
        val doc = r.get(0)
        val sh = r.getSeq[String](1).toArray
        val keys = Dedup.bandKeys(sh, 64, 32)
        keys.iterator.zipWithIndex.map { case (k, b) => Row(doc, b, k) }
      }), bandSchema)
    val cand = time("bucket pairs + distinct") {
      val c = banded
        .groupBy(col("band"), col("key"))
        .agg(collect_list(col("doc")).as("ds"))
        .filter(size(col("ds")).between(2, 10000))
        .select(explode(col("ds")).as("a"), col("ds"))
        .select(col("a"), explode(col("ds")).as("b"))
        .filter(col("a") < col("b"))
        .select(col("a").as("id_a"), col("b").as("id_b"))
        .distinct()
      println(s"  cand rows = ${c.count()}")
      c
    }
    val repPairs = time("verify jaccard") {
      val w = cand
        .join(shingled.withColumnRenamed("doc", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(shingled.withColumnRenamed("doc", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
        .filter(col("jaccard") >= 0.6)
      println(s"  repPairs rows = ${w.count()}")
      w
    }
    time("expandPairs tail") {
      val cross = repPairs
        .join(mem.toDF("rep_a", "m_a"), col("rep_a") === col("id_a"))
        .join(mem.toDF("rep_b", "m_b"), col("rep_b") === col("id_b"))
        .select(least(col("m_a"), col("m_b")).as("id_a"),
          greatest(col("m_a"), col("m_b")).as("id_b"), col("jaccard"))
      val intra = mem.toDF("rep", "m_a").as("x")
        .join(mem.toDF("rep", "m_b").as("y"), col("x.rep") === col("y.rep") &&
          col("m_a") < col("m_b"))
        .select(col("m_a").as("id_a"), col("m_b").as("id_b"),
          lit(1.0).as("jaccard"))
      println(s"  expanded rows = ${cross.unionByName(intra).filter(col("jaccard") >= 0.6).count()}")
    }
    spark.stop()
  }
}

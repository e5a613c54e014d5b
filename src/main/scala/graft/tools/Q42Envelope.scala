package graft.tools

import org.apache.spark.sql.functions._
import graft.{Graft, Tables}
import graft.llm.Similarity

/** Measures q42's validation-cost envelope (VERDICT r8 item 8): the
  * property oracle deliberately doubles q42's work, so regression hunts
  * need the BARE pipeline's cost recorded separately from the
  * oracle-carrying t2 entry. Times, with the Bench methodology
  * (median of 5, raw arrays, clearCache between iterations):
  *   - `bare`: `Similarity.ivfKmeansTopK` alone (count action)
  *   - `with_oracle`: the full q42_ann_ivf t2 entry
  * and prints one JSON line. BENCH_NOTES.md's envelope table is
  * authored from this output.
  */
object Q42Envelope {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "5").toInt
    val spark = Graft.localSession(cpus.toInt, "q42-envelope")
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warmup

    def bench(run: () => Unit): Vector[Double] =
      (1 to iters).map { _ =>
        val t0 = System.nanoTime()
        run()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        graft.dsl.Rel.releaseTracked()
        dt
      }.toVector

    val bare = bench { () =>
      val v = Tables.load(spark, sfDir, "embeddings")
      Similarity.ivfKmeansTopK(v.filter(col("vec_id") < 10), v,
        "vec_id", "vec_id", "embedding", k = 5, nCells = 16, nprobe = 3)
        .count()
    }
    val withOracle = bench { () =>
      graft.SparkEntry.queries("q42_ann_ivf")(spark, sfDir).count()
    }

    def f(v: Double) = BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP)
    def arr(ts: Vector[Double]) = ts.map(f).mkString("[", ",", "]")
    def med(ts: Vector[Double]) = f(ts.sorted.apply(ts.size / 2))
    println(s"""{"metric":"q42_envelope","sf":"$sfDir","cpus":$cpus,""" +
      s""""bare_median":${med(bare)},"bare_iterations":${arr(bare)},""" +
      s""""oracle_median":${med(withOracle)},"oracle_iterations":${arr(withOracle)}}""")
    spark.stop()
  }
}

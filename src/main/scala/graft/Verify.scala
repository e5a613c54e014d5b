package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. An optional
  * third comma-separated-names arg restricts the dump (local fast
  * iteration — tools/check_oracle.py only checks the dirs present). */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(',').toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the shared session recipe (see Bench — r17 review)
    val spark = Graft.localSession(cpus.toInt, "graft-verify")
    new java.io.File(outDir).mkdirs()
    val status = SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val s = try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        "ok"
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        s"failed: ${e.getClass.getSimpleName}"
      }
      // queries are independent: don't let one query's persisted
      // intermediates pressure the next 50. localCheckpoint blocks
      // (raw RDD persists) are invisible to clearCache — drop the
      // orphans explicitly (the bench_r18_run1 finding)
      spark.catalog.clearCache()
      graft.dsl.Rel.releaseTracked()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      name -> s
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // per-query status — a query failing BEFORE its write job creates
    // no dump dir, and a dir-globbing checker would silently skip it
    // (or worse, compare a stale dump from a previous run). The status
    // file makes every attempted query's outcome explicit;
    // tools/check_oracle.py fails the gate on any non-ok entry (r17
    // review).
    val statusJson = status
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/status.json"), statusJson)
    spark.stop()
  }
}

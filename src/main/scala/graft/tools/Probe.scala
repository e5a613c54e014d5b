package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{Graft, SparkEntry}

/** Smoke probe of the driver contract: entry() rows>0 + plan shape. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession(4, "probe")
    val df = SparkEntry.entry(spark)
    println(s"ENTRY_ROWS=${df.count()}")
    df.show(5, truncate = false)
    df.explain("formatted")
    spark.stop()
  }
}

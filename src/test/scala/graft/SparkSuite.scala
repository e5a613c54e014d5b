package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for all suites (one JVM, one session). */
object SparkTestSession {
  lazy val spark: SparkSession = Graft.localSession(4, "graft-test")
}

trait SparkSuite extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestSession.spark
  import scala.jdk.CollectionConverters._

  def rowsOf(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  /** Single-column convenience. */
  def col0(df: DataFrame): Seq[Any] = df.collect().toSeq.map(_.get(0))
}

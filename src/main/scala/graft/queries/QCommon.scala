package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Shared helpers for the driver-contract query objects — ONE home for
  * the table loader and the oracle-determinism decimal cast (they were
  * copy-pasted per object, so a change to the determinism contract
  * could silently apply to only some query groups; r17 review). */
private[queries] object QCommon {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    graft.Tables.load(s, dir, name)

  /** Money-sum determinism: exact decimal(18,2) accumulation, cast to
    * double only at the end — bit-identical across engines. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Manual key-salting for joins whose skew exceeds what AQE's
  * skew-join splitting handles (one pathological key hot enough that
  * even split partitions of it overwhelm a task). The reference ships
  * this as its skewed-join implementation
  * [R: …/relationalOperators/POSkewedJoin.java,
  *  R: …/mapReduceLayer/SkewedPartitioner.java]; here AQE is the
  * default path (JoinHint.Skewed) and salting is the explicit escape
  * hatch.
  *
  * The skewed (big) side gets a deterministic per-row salt in
  * [0, salts); the build side is replicated `salts` ways — so a hot
  * key's rows spread over `salts` tasks at the cost of `salts`× the
  * build side, which must therefore be the small side.
  */
object Salt {

  def saltedJoin(big: DataFrame, bigKey: String,
                 small: DataFrame, smallKey: String,
                 salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    // outer-preserving the REPLICATED side would emit `salts` copies of
    // every unmatched small-side row — only join types that never
    // null-pad the replicated side are sound under salting
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
        "semi", "anti")(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: joinType '$joinType' would duplicate unmatched replicated rows " +
        "(use inner/left/left_outer/left_semi/left_anti, or AQE's skew join for outer)")
    val saltCol = "_graft_salt"
    require(!big.columns.contains(saltCol) && !small.columns.contains(saltCol),
      s"saltedJoin: inputs must not already carry a '$saltCol' column")
    // content-derived salt, NOT monotonically_increasing_id: the id is
    // order-dependent, and if `big` sits downstream of a shuffle a
    // retried map task can recompute rows with DIFFERENT salts after
    // some reducers fetched the old output — rows duplicated or lost
    // (the nondeterministic-shuffle-key hazard). Hashing the row
    // is deterministic under any recomputation; rows identical on the
    // hashed columns share a salt, which only matters if the hot key's
    // rows are duplicates there (collapse those first — they are a
    // dedup problem, not a skew problem). Map-typed columns (including
    // maps nested in structs/arrays) are excluded: Spark rejects hash
    // functions over MapType at analysis time (r17 ADVICE), and the
    // remaining columns — the join key is never map-typed, equi-join
    // equality on maps is itself unsupported — keep the salt content-
    // derived and deterministic.
    val hashable = big.schema.fields
      .filterNot(f => containsMapType(f.dataType))
      .map(f => col(f.name)).toIndexedSeq
    require(hashable.nonEmpty,
      "saltedJoin: every big-side column contains a MapType — no hashable salt source")
    val salted = big.withColumn(saltCol,
      pmod(xxhash64(struct(hashable: _*)), lit(salts.toLong)).cast("int"))
    val replicated = small.withColumn(saltCol,
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
        salted(bigKey) === replicated(smallKey) &&
          salted(saltCol) === replicated(saltCol),
        joinType)
      .drop(saltCol)
  }

  private def containsMapType(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType     => true
      case s: StructType  => s.fields.exists(f => containsMapType(f.dataType))
      case a: ArrayType   => containsMapType(a.elementType)
      case _              => false
    }
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Load/Store function surface (SURVEY.md §2.4 "Load/Store functions"):
  * the reference's pluggable LoadFunc/StoreFunc pairs
  * [R: src/org/apache/pig/LoadFunc.java, StoreFunc.java] map onto
  * Spark's built-in DataSource formats — which already provide the
  * pushdown hooks LoadMetadata/LoadPushDown expose (partition pruning,
  * projection and predicate pushdown come from the format, SURVEY.md
  * §4.1).
  *
  * | reference | here |
  * |---|---|
  * | PigStorage(delim) | delimited csv (+ explicit or inferred schema) |
  * | TextLoader        | text (one chararray column) |
  * | JsonLoader/JsonStorage | json |
  * | BinStorage/InterStorage | parquet (the engine's binary format) |
  * | OrcStorage        | spark's builtin orc format |
  * | AvroStorage       | splittable avro-mapred reader/writer ([[AvroStorage]]) |
  */
object Loaders {

  def pigStorage(spark: SparkSession, path: String, delim: String = "\t",
                 schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.option("sep", delim)
    schema.map(r.schema).getOrElse(r.option("inferSchema", "true")).csv(path)
  }

  def textLoader(spark: SparkSession, path: String,
                 colName: String = "line"): DataFrame =
    spark.read.text(path).toDF(colName)

  def jsonLoader(spark: SparkSession, path: String,
                 schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).json(path)
  }

  def binStorage(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** OrcStorage analog — Spark's builtin ORC source (predicate pushdown
    * and column pruning come with it, like parquet).
    */
  def orcLoader(spark: SparkSession, path: String,
                schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.map(r.schema).getOrElse(r).orc(path)
  }

  /** AvroStorage analog. The spark-avro connector jar is absent in this
    * offline environment, so this is NOT `spark.read.format("avro")` —
    * it's a direct splittable reader/writer on `avro` + `avro-mapred`
    * (which DO ship with the distribution); see
    * [[graft.sources.AvroStorage]] for the type surface and scale notes.
    */
  def avroLoader(spark: SparkSession, path: String): DataFrame =
    AvroStorage.avroLoader(spark, path)

  /** Column-pruned Avro load: only `columns` are decoded (projected
    * reader schema; dropped fields are binary-skipped). */
  def avroLoader(spark: SparkSession, path: String,
                 columns: Seq[String]): DataFrame =
    AvroStorage.avroLoader(spark, path, Some(columns))

  def storeAvro(df: DataFrame, path: String): Unit =
    AvroStorage.storeAvro(df, path)

  def storeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** PigStorage sink; `codec` mirrors Pig's transparent Hadoop
    * compression (a `.gz`/`.bz2` path compresses on write, and ANY
    * loader reads compressed parts back transparently
    * [R: src/org/apache/pig/builtin/PigStorage.java] — splittability
    * caveat: gzip parts are one split each, so at 100 TB prefer many
    * medium parts or a splittable codec).
    */
  def storePigStorage(df: DataFrame, path: String, delim: String = "\t",
                      codec: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").option("sep", delim)
    codec.fold(w)(c => w.option("compression", c)).csv(path)
  }

  def storeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def storeBin(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)
}

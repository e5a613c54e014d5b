package graft

import graft.sources.{AvroStorage, Loaders}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** AvroStorage round-trip coverage (SURVEY §2.4): every supported Spark
  * type survives store→load bit-exactly, nullability is preserved via
  * `union[null, T]`, and the Pig-Latin front-end's `USING AvroStorage`
  * path works end-to-end. The splittable-read claim is structural
  * (AvroKeyInputFormat); these specs pin the value fidelity.
  */
class AvroStorageSpec extends SparkSuite {
  import spark.implicits._

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/data"

  test("all supported types round-trip store -> load") {
    val schema = StructType(Seq(
      StructField("b", BooleanType, nullable = false),
      StructField("i", IntegerType, nullable = false),
      StructField("l", LongType, nullable = false),
      StructField("f", FloatType, nullable = false),
      StructField("d", DoubleType, nullable = false),
      StructField("s", StringType, nullable = false),
      StructField("bin", BinaryType, nullable = false),
      StructField("ts", TimestampType, nullable = false),
      StructField("dt", DateType, nullable = false),
      StructField("arr", ArrayType(LongType), nullable = false),
      StructField("m", MapType(StringType, DoubleType), nullable = false),
      StructField("st", StructType(Seq(
        StructField("x", LongType), StructField("y", StringType))), nullable = false)))
    val ts = java.sql.Timestamp.valueOf("2024-03-01 12:34:56.123456")
    val rows = Seq(
      Row(true, 7, 42L, 1.5f, 2.25, "héllo", Array[Byte](1, 2, 3), ts,
        java.sql.Date.valueOf("2024-03-01"), Seq(1L, 2L, 3L),
        Map("a" -> 0.5, "b" -> 1.5), Row(9L, "nested")),
      Row(false, -1, -42L, -1.5f, -2.25, "", Array[Byte](), ts,
        java.sql.Date.valueOf("1969-12-31"), Seq.empty[Long],
        Map.empty[String, Double], Row(0L, "")))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val path = tmpDir("graft_avro_all")
    Loaders.storeAvro(df, path)
    val back = Loaders.avroLoader(spark, path)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq)
    val got = back.collect().map(r => r.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case v => v
    }).toSet
    val want = rows.map(r => r.toSeq.map {
      case a: Array[Byte] => a.toSeq
      case v => v
    }).toSet
    assert(got == want)
  }

  test("nullable smallint/tinyint columns store and round-trip as Avro int (r17 review)") {
    // GenericData.resolveUnion checks `instanceof Integer`: a boxed
    // Short/Byte in union[null,int] threw UnresolvedUnionException
    val schema = StructType(Seq(
      StructField("sh", ShortType, nullable = true),
      StructField("by", ByteType, nullable = true)))
    val rows = Seq(Row(7.toShort, 3.toByte), Row(null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val dir = tmpDir("avro_short")
    AvroStorage.storeAvro(df, dir)
    val got = AvroStorage.avroLoader(spark, dir)
      .select($"sh".cast("int"), $"by".cast("int"))
      .as[(Option[Int], Option[Int])].collect().toSet
    assert(got == Set((Some(7), Some(3)), (None, None)), got)
  }

  test("storeAvro over the path a frame is read from keeps the data (r17 review)") {
    // the old eager fs.delete(target) destroyed the input before the
    // lazy write job computed its splits: self-overwrite lost the
    // dataset AND failed the job
    val dir = tmpDir("avro_selfow")
    AvroStorage.storeAvro((1L to 100L).toDF("v"), dir)
    val filtered = AvroStorage.avroLoader(spark, dir).filter($"v" <= 40L)
    AvroStorage.storeAvro(filtered, dir)
    val back = AvroStorage.avroLoader(spark, dir).as[Long].collect().toSet
    assert(back == (1L to 40L).toSet, s"got ${back.size} rows")
  }

  test("nulls ride union[null, T] and come back as nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StringType, nullable = true),
      StructField("arr", ArrayType(StringType, containsNull = true), nullable = true)))
    val rows = Seq(
      Row(1L, null, null),
      Row(2L, "x", Seq("a", null, "c")),
      Row(3L, "", Seq.empty[String]))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val path = tmpDir("graft_avro_nulls")
    Loaders.storeAvro(df, path)
    val back = Loaders.avroLoader(spark, path).orderBy("id").collect()
    assert(back(0).isNullAt(1) && back(0).isNullAt(2))
    assert(back(1).getSeq[String](2) == Seq("a", null, "c"))
    assert(back(2).getString(1) == "" && back(2).getSeq[String](2).isEmpty)
  }

  test("column-pruned load decodes only the projected fields") {
    val df = Seq((1L, "wide text payload one", 10.5), (2L, "wide text payload two", 20.5))
      .toDF("id", "text", "score")
    val path = tmpDir("graft_avro_prune")
    Loaders.storeAvro(df, path)
    val pruned = Loaders.avroLoader(spark, path, Seq("score", "id"))
    // projected order and fields, values intact
    assert(pruned.schema.fieldNames.toSeq == Seq("score", "id"))
    assert(pruned.orderBy("id").collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq ==
      Seq((10.5, 1L), (20.5, 2L)))
    // unknown column is a loud error, not a silent null column
    intercept[IllegalArgumentException] {
      Loaders.avroLoader(spark, path, Seq("nope")).collect()
    }
  }

  test("unsupported shapes are rejected loudly") {
    // decimal store
    val dec = spark.range(1).select($"id".cast("decimal(10,2)").as("d"))
    intercept[IllegalArgumentException] {
      AvroStorage.storeAvro(dec, tmpDir("graft_avro_dec"))
    }
    // multi-branch union read
    val u = org.apache.avro.Schema.createUnion(
      org.apache.avro.Schema.create(org.apache.avro.Schema.Type.INT),
      org.apache.avro.Schema.create(org.apache.avro.Schema.Type.STRING))
    intercept[IllegalArgumentException] { AvroStorage.avroToSpark(u) }
  }

  test("Avro store + load round-trip through the Pig-Latin front-end") {
    val dir = "/root/testdata/sf0.001"
    val tmp = java.nio.file.Files.createTempDirectory("graft_avro_fe").toString
    new graft.piglatin.PigEngine(spark, Some(dir)).run(s"""
      r = LOAD 'region.parquet';
      STORE r INTO '$tmp/region_avro' USING AvroStorage;
      """)
    val e2 = new graft.piglatin.PigEngine(spark, Some(dir)).run(s"""
      r2 = LOAD '$tmp/region_avro' USING AvroStorage;
      out = FOREACH r2 GENERATE r_regionkey, r_name;
      """)
    assert(rowsOf(e2.relation("out")).toSet ==
      rowsOf(Tables.load(spark, dir, "region").select($"r_regionkey", $"r_name")).toSet)
  }
}

/** PigStorage transparent compression: gzip parts write and read back
  * with no loader-side configuration (Hadoop codec inference by file
  * extension, as in the reference's PigStorage).
  */
class CompressedStorageSpec extends SparkSuite {
  import spark.implicits._
  import graft.sources.Loaders

  test("gzip PigStorage round-trip: .gz parts on disk, transparent read-back") {
    val df = Seq((1L, "alpha"), (2L, "beta"), (3L, "with,comma")).toDF("k", "v")
    val tmp = "/tmp/graft_gz_roundtrip"
    Loaders.storePigStorage(df, tmp, delim = "\t", codec = Some("gzip"))
    val parts = new java.io.File(tmp).listFiles.map(_.getName).filter(_.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.endsWith(".gz")), parts.mkString(","))
    val back = Loaders.pigStorage(spark, tmp, delim = "\t")
      .toDF("k", "v").as[(Long, String)].collect().toSet
    assert(back == df.as[(Long, String)].collect().toSet)
  }
}

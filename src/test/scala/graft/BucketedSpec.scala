package graft

import graft.ops.Bucketed

/** Bucketed co-located join: same-bucketed tables must join and
  * aggregate with no Exchange in the plan. */
class BucketedSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bucketed join and groupBy plan without a shuffle") {
    Seq("li_b", "o_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    Bucketed.writeBucketed(
      Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
      "li_b", "l_orderkey", buckets = 4)
    Bucketed.writeBucketed(
      Tables.load(spark, dir, "orders").select("o_orderkey", "o_totalprice"),
      "o_b", "o_orderkey", buckets = 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    val joined = Bucketed.join(spark, "li_b", "o_b", "l_orderkey", "o_orderkey")
    val joinPlan = joined.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(joinPlan.contains("SortMergeJoin"), joinPlan)
    assert(!joinPlan.contains("Exchange"), joinPlan) // co-located: no shuffle
    assert(joined.count() ==
      Tables.load(spark, dir, "lineitem").count()) // FK join keeps all lineitems

    val grouped = Bucketed.groupBucketed(spark, "li_b", "l_orderkey")
    val groupPlan = grouped.queryExecution.executedPlan.toString
    assert(!groupPlan.contains("Exchange"), groupPlan)
    val expected = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey").distinct().count()
    assert(grouped.count() == expected)

    // COLLECTED group with real aggregates (q96): still zero Exchange,
    // and values equal the plain shuffled groupBy on the raw table
    import org.apache.spark.sql.functions._
    val collected = Bucketed.collectedGroup(spark, "li_b", "l_orderkey", Seq(
      count(lit(1)).as("n"),
      sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty")))
    val cPlan = collected.queryExecution.executedPlan.toString
    assert(!cPlan.contains("Exchange"), cPlan)
    val plain = Tables.load(spark, dir, "lineitem")
      .groupBy($"l_orderkey").agg(
        count(lit(1)).as("n"),
        sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"))
    assert(collected.exceptAll(plain).isEmpty && plain.exceptAll(collected).isEmpty)
  }

  test("incremental-dedup store bucketed on fp_a: anti-join reads it shuffle-free") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS fp_store")
    val loc = new java.io.File("spark-warehouse/fp_store")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    val docs = Tables.load(spark, dir, "documents")
    Bucketed.writeBucketed(
      docs.filter($"doc_id" % 2 === 0).select(
        xxhash64($"text").as("fp_a"),
        xxhash64(lit("graft-fp2"), $"text").as("fp_b")),
      "fp_store", "fp_a", buckets = 4)
    val batch = docs.filter($"doc_id" % 2 === 1).select($"doc_id", $"text")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle path
    val res = graft.llm.Dedup.exactIncremental(
      batch, "text", "doc_id", spark.table("fp_store"))
    val plan = res.queryExecution.executedPlan.toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    // the STORE side (the only corpus-sized input) must read its
    // buckets directly — exactly the batch-side exchanges remain
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(plan.contains("LeftAnti"), plan.take(2000))
    assert(exchanges <= 2, s"store side shuffled: $exchanges exchanges\n" + plan.take(3000))
    // and the result equals the text-level derivation
    val got = res.select($"id").as[Long].collect().toSet
    val storeTexts = docs.filter($"doc_id" % 2 === 0).select($"text")
    val want = batch.groupBy($"text").agg(min($"doc_id").as("id"))
      .join(storeTexts, Seq("text"), "left_anti")
      .select($"id").as[Long].collect().toSet
    assert(got == want)
  }

  test("lshBandIndex bucketed by (band, key): bucket aggregation is zero-Exchange") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS lsh_idx")
    val loc = new java.io.File("spark-warehouse/lsh_idx")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    val docs = Tables.load(spark, dir, "documents")
    val storeDocs = docs.filter($"doc_id" % 2 === 0).select($"doc_id", $"text")
    val store = graft.llm.Dedup.minhashSignatures(storeDocs, "doc_id", "text")
      .persist()
    store.count()
    graft.ops.Bucketed.writeBucketed(
      graft.llm.Dedup.lshBandIndex(store), "lsh_idx", Seq("band", "key"), 4)
    // the indexed path's only corpus-sized stage: groupBy over the
    // bucketed index plans without any Exchange
    val agg = spark.table("lsh_idx").groupBy($"band", $"key")
      .agg(collect_list($"id").as("ds"))
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange"), aggPlan.take(2000))
    // and the full indexed ingest over the bucketed table matches the
    // signature-derivation path end to end
    val batch = docs.filter($"doc_id" % 2 === 1 && $"doc_id" < 600)
      .select($"doc_id", $"text")
    val viaIdx = graft.llm.Dedup.lshIncrementalIndexed(
        batch, "doc_id", "text", store, spark.table("lsh_idx"))
      .select($"id").as[Long].collect().toSet
    val viaSig = graft.llm.Dedup.lshIncremental(
        batch, "doc_id", "text", store)
      .select($"id").as[Long].collect().toSet
    store.unpersist()
    assert(viaIdx == viaSig)
  }

  test("writeBucketed handles db-qualified names: DROP targets the real table (r17 ADVICE)") {
    import org.apache.spark.sql.functions._
    // pre-fix, DROP TABLE IF EXISTS `db.tbl` treated the whole name as
    // a single-part identifier in the CURRENT database, so the intended
    // table was never dropped while the location delete DID hit it —
    // an inconsistent catalog/filesystem pair for qualified names
    spark.sql("CREATE DATABASE IF NOT EXISTS graft_qdb")
    spark.sql("DROP TABLE IF EXISTS graft_qdb.qt")
    val df1 = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    Bucketed.writeBucketed(df1, "graft_qdb.qt", "k", buckets = 2)
    assert(spark.table("graft_qdb.qt").count() == 2)
    // overwrite through the same path must drop + rewrite cleanly
    val df2 = Seq((3L, "c"), (4L, "d"), (5L, "e")).toDF("k", "v")
    Bucketed.writeBucketed(df2, "graft_qdb.qt", "k", buckets = 2)
    assert(spark.table("graft_qdb.qt").select("k").as[Long].collect().toSet
      == Set(3L, 4L, 5L))
    // and no stray single-part table named "graft_qdb.qt" materialized
    // in the default database
    assert(!spark.catalog.tableExists("`graft_qdb.qt`"))
    spark.sql("DROP TABLE IF EXISTS graft_qdb.qt")
    spark.sql("DROP DATABASE IF EXISTS graft_qdb")
  }

  test("appendBucketed: table-backed store appends keep the zero-Exchange contract (r18)") {
    import org.apache.spark.sql.functions._
    Seq("sig_store_t", "band_idx_t").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    val b0 = docs.filter($"doc_id" % 3 === 0)
    val b1 = docs.filter($"doc_id" % 3 === 1)
    // bootstrap: batch-0 signatures + band index as bucketed TABLES
    val sig0 = graft.llm.Dedup.minhashSignatures(b0, "doc_id", "text").persist()
    sig0.count()
    Bucketed.writeBucketed(sig0, "sig_store_t", Seq("id"), 4)
    Bucketed.writeBucketed(graft.llm.Dedup.lshBandIndex(sig0),
      "band_idx_t", Seq("band", "key"), 4)
    // ingest batch 1 against the TABLES, append its admits to both
    val admitted = graft.llm.Dedup.lshIncrementalIndexed(
      b1, "doc_id", "text", spark.table("sig_store_t"), spark.table("band_idx_t"))
      .persist()
    val nAdmit = admitted.count()
    assert(nAdmit > 0)
    Bucketed.appendBucketed(admitted.select($"id", $"sig"), "sig_store_t", Seq("id"), 4)
    Bucketed.appendBucketed(graft.llm.Dedup.lshBandIndex(admitted.select($"id", $"sig")),
      "band_idx_t", Seq("band", "key"), 4)
    // appended counts add up, and the post-append index equals the
    // index of the post-append signature store
    assert(spark.table("sig_store_t").count() == sig0.count() + nAdmit)
    val fullIdx = graft.llm.Dedup.lshBandIndex(spark.table("sig_store_t"))
    assert(spark.table("band_idx_t").exceptAll(fullIdx).isEmpty &&
      fullIdx.exceptAll(spark.table("band_idx_t")).isEmpty)
    // the zero-Exchange contract SURVIVES the append: the indexed
    // ingest's store-side bucket aggregation still plans shuffle-free
    val agg = spark.table("band_idx_t").groupBy($"band", $"key")
      .agg(collect_list($"id").as("ds"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
    // and a further ingest over the appended tables matches the
    // signature-derivation path on the same (grown) store
    val b2 = docs.filter($"doc_id" % 3 === 2 && $"doc_id" < 900)
    val viaIdx = graft.llm.Dedup.lshIncrementalIndexed(
        b2, "doc_id", "text", spark.table("sig_store_t"), spark.table("band_idx_t"))
      .select($"id").as[Long].collect().toSet
    val viaSig = graft.llm.Dedup.lshIncremental(
        b2, "doc_id", "text", spark.table("sig_store_t"))
      .select($"id").as[Long].collect().toSet
    assert(viaIdx == viaSig)
    // mismatched spec / missing table fail loudly
    val e1 = intercept[IllegalArgumentException](
      Bucketed.appendBucketed(admitted.select($"id", $"sig"), "sig_store_t", Seq("sig"), 4))
    assert(e1.getMessage.contains("bucket spec"))
    val e2 = intercept[IllegalArgumentException](
      Bucketed.appendBucketed(admitted.select($"id", $"sig"), "sig_store_t", Seq("id"), 8))
    assert(e2.getMessage.contains("bucket spec"))
    val e3 = intercept[IllegalArgumentException](
      Bucketed.appendBucketed(admitted.select($"id", $"sig"), "no_such_store", Seq("id"), 4))
    assert(e3.getMessage.contains("does not exist"))
    sig0.unpersist(); admitted.unpersist()
  }

  test("appendBucketed read-modify-write: persist recomputes on refresh, localCheckpoint is immune (r19)") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS rmw_t")
    val loc = new java.io.File("spark-warehouse/rmw_t")
    if (loc.exists()) new scala.reflect.io.Directory(loc).deleteRecursively()
    import spark.implicits._
    Bucketed.writeBucketed(Seq((1L, "a")).toDF("k", "v"), "rmw_t", Seq("k"), 2)
    // a frame whose lineage READS the table (the ingest-loop admit
    // shape): new rows = not yet in the store
    val incoming = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    def fresh = incoming.join(spark.table("rmw_t"), Seq("k"), "left_anti")
    // persisted: the append's catalog refresh RECACHES the dependent
    // plan, so the frame silently recomputes against the mutated table
    val persisted = fresh.persist()
    assert(persisted.count() == 2)
    Bucketed.appendBucketed(persisted, "rmw_t", Seq("k"), 2)
    assert(persisted.count() == 0, "persist does NOT pin a table-derived " +
      "frame across an append — this documents the Spark behavior the " +
      "appendBucketed scaladoc warns about")
    persisted.unpersist()
    // localCheckpoint: lineage severed to an RDD scan — immune
    spark.sql("DROP TABLE IF EXISTS rmw_t")
    Bucketed.writeBucketed(Seq((1L, "a")).toDF("k", "v"), "rmw_t", Seq("k"), 2)
    val pinned = fresh.localCheckpoint()
    assert(pinned.count() == 2)
    Bucketed.appendBucketed(pinned, "rmw_t", Seq("k"), 2)
    assert(pinned.count() == 2, "localCheckpoint frame must survive the append")
    assert(spark.table("rmw_t").count() == 3)
    spark.sql("DROP TABLE IF EXISTS rmw_t")
  }

  test("compact: file count collapses, co-location preserved, content identical (r19)") {
    import org.apache.spark.sql.functions._
    Seq("cmp_t", "cmp_t_compacting").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val docs = Tables.load(spark, dir, "documents").select($"doc_id", $"text")
    // bootstrap + 3 appends: the appendBucketed small-files shape
    Bucketed.writeBucketed(docs.filter($"doc_id" % 4 === 0), "cmp_t", Seq("doc_id"), 4)
    (1 to 3).foreach { i =>
      Bucketed.appendBucketed(docs.filter($"doc_id" % 4 === i), "cmp_t", Seq("doc_id"), 4)
    }
    val before = rowsOf(spark.table("cmp_t").orderBy($"doc_id"))
    def dataFiles(t: String): Seq[java.io.File] =
      new java.io.File(s"spark-warehouse/$t").listFiles().toSeq
        .filter(f => f.getName.endsWith(".parquet"))
    val nBefore = dataFiles("cmp_t").size
    assert(nBefore > 4, s"appends should have left >buckets files, got $nBefore")

    Bucketed.compact(spark, "cmp_t")

    // one file per bucket, content bit-identical, spec unchanged
    assert(dataFiles("cmp_t").size == 4, dataFiles("cmp_t").map(_.getName))
    assert(rowsOf(spark.table("cmp_t").orderBy($"doc_id")) == before)
    val spec = spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("cmp_t")).bucketSpec
    assert(spec.exists(s => s.numBuckets == 4 &&
      s.bucketColumnNames == Seq("doc_id") && s.sortColumnNames == Seq("doc_id")))
    // co-location preserved: zero-Exchange aggregation still plans
    val agg = spark.table("cmp_t").groupBy($"doc_id").agg(count(lit(1)).as("n"))
    assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))
    // and further appends keep working against the compacted table
    Bucketed.appendBucketed(
      docs.filter($"doc_id" % 4 === 0).select($"doc_id" + 1000000L as "doc_id", $"text"),
      "cmp_t", Seq("doc_id"), 4)
    assert(spark.table("cmp_t").count() == before.size +
      docs.filter($"doc_id" % 4 === 0).count())

    // guards: non-bucketed and leftover-_compacting fail loudly
    spark.sql("DROP TABLE IF EXISTS cmp_flat")
    docs.limit(5).write.mode("overwrite").format("parquet").saveAsTable("cmp_flat")
    val e1 = intercept[IllegalArgumentException](Bucketed.compact(spark, "cmp_flat"))
    assert(e1.getMessage.contains("not bucketed"))
    spark.sql("DROP TABLE cmp_flat")
    spark.sql("CREATE TABLE cmp_t_compacting (x INT) USING parquet")
    val e2 = intercept[IllegalArgumentException](Bucketed.compact(spark, "cmp_t"))
    assert(e2.getMessage.contains("leftover"))
    spark.sql("DROP TABLE cmp_t_compacting")
    // crash-AFTER-the-drop shape: original gone, _compacting present —
    // the error must name the RENAME that finishes the swap, not read
    // as a bare missing table
    spark.sql("ALTER TABLE cmp_t RENAME TO cmp_t_compacting")
    val e3 = intercept[IllegalArgumentException](Bucketed.compact(spark, "cmp_t"))
    assert(e3.getMessage.contains("RENAME TO"), e3.getMessage)
    spark.sql("ALTER TABLE cmp_t_compacting RENAME TO cmp_t")
    assert(spark.table("cmp_t").count() > 0)
    spark.sql("DROP TABLE cmp_t")
  }

  test("compactIfNeeded: metadata-only under budget, rewrites past it (r22)") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS cin_t")
    val loc = new java.io.File("spark-warehouse/cin_t")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    def dataFiles(): Int =
      new java.io.File("spark-warehouse/cin_t").listFiles().toSeq
        .count(_.getName.endsWith(".parquet"))
    // bootstrap + 3 appends accumulate sorted runs (appendBucketed
    // writes ONE file per NON-EMPTY bucket per append — which buckets
    // a row hashes to is murmur3's business, so the thresholds below
    // derive from the OBSERVED file count rather than assuming it)
    Bucketed.writeBucketed(Seq((1L, "a"), (2L, "b")).toDF("k", "v"),
      "cin_t", Seq("k"), 2)
    (1 to 3).foreach(i => Bucketed.appendBucketed(
      Seq((i * 10L, "x"), (i * 10L + 1L, "y")).toDF("k", "v"),
      "cin_t", Seq("k"), 2))
    val nBefore = dataFiles()
    assert(nBefore > 2, s"appends should have left >buckets files, got $nBefore")
    // under budget (files <= budget × buckets): no rewrite
    assert(!Bucketed.compactIfNeeded(spark, "cin_t", maxRunsPerBucket = nBefore))
    assert(dataFiles() == nBefore)
    // past the budget → compact runs, one file per bucket, content kept
    val before = rowsOf(spark.table("cin_t").orderBy($"k"))
    assert(Bucketed.compactIfNeeded(spark, "cin_t", maxRunsPerBucket = 1))
    assert(dataFiles() == 2)
    assert(rowsOf(spark.table("cin_t").orderBy($"k")) == before)
    // immediately after a compact the budget is satisfied again
    assert(!Bucketed.compactIfNeeded(spark, "cin_t", maxRunsPerBucket = 1))
    spark.sql("DROP TABLE cin_t")
    // non-bucketed tables fail loudly
    spark.sql("DROP TABLE IF EXISTS cin_flat")
    Seq(1L).toDF("k").write.mode("overwrite").format("parquet").saveAsTable("cin_flat")
    val e = intercept[IllegalArgumentException](
      Bucketed.compactIfNeeded(spark, "cin_flat"))
    assert(e.getMessage.contains("not bucketed"))
    spark.sql("DROP TABLE cin_flat")
  }

  test("compact refuses a non-parquet bucketed table (r19 ADVICE: provider check)") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS cmp_orc")
    val loc = new java.io.File("spark-warehouse/cmp_orc")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    // an externally-written ORC table whose bucket/sort spec mimics a
    // graft-managed store — pre-fix, compact silently rewrote it as
    // parquet, changing the table's format
    Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      .limit(10).write.bucketBy(2, "l_orderkey").sortBy("l_orderkey")
      .format("orc").saveAsTable("cmp_orc")
    val e = intercept[IllegalArgumentException](Bucketed.compact(spark, "cmp_orc"))
    assert(e.getMessage.contains("not parquet"), e.getMessage)
    // untouched: still readable, still ORC
    assert(spark.table("cmp_orc").count() == 10)
    assert(spark.sessionState.catalog.getTableMetadata(
      spark.sessionState.sqlParser.parseTableIdentifier("cmp_orc"))
      .provider.exists(_.equalsIgnoreCase("orc")))
    spark.sql("DROP TABLE cmp_orc")
  }

  test("collectedGroup refuses a table not bucketed by the group key") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS li_flat")
    val loc = new java.io.File("spark-warehouse/li_flat")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity")
      .limit(10).write.format("parquet").saveAsTable("li_flat")
    val ex = intercept[IllegalArgumentException] {
      Bucketed.collectedGroup(spark, "li_flat", "l_orderkey", Seq(count(lit(1)).as("n")))
    }
    assert(ex.getMessage.contains("not bucketed"))
    // wrong bucket key is also refused (li_b is bucketed by l_orderkey)
    val ex2 = intercept[IllegalArgumentException] {
      Bucketed.collectedGroup(spark, "li_b", "l_quantity", Seq(count(lit(1)).as("n")))
    }
    assert(ex2.getMessage.contains("not bucketed"))
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.piglatin.PigEngine

/** PigMix-shaped e2e scripts (SURVEY.md §6: the reference's own perf
  * workload classes [R: test/perf/pigmix/]) run through the Pig Latin
  * front-end and checked differentially against direct DataFrame
  * queries.
  */
class PigMixSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def engine = new PigEngine(spark, Some(dir))

  test("L2-shape: replicated join executes as broadcast and matches") {
    val e = engine.run("""
      li = LOAD 'lineitem.parquet';
      s  = LOAD 'supplier.parquet';
      j  = JOIN li BY l_suppkey, s BY s_suppkey USING 'replicated';
      g  = GROUP j BY s_name;
      out = FOREACH g GENERATE group, COUNT(j) AS n;
      """)
    val df = e.relation("out")
    assert(df.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val got = df.as[(String, Long)].collect().toMap
    val want = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "supplier"), $"l_suppkey" === $"s_suppkey")
      .groupBy("s_name").count().as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("L1-shape: FLATTEN(TOKENIZE) before a JOIN hoists past it (DelayFlattenPastJoin)") {
    // PigMix L1 explodes a bag and then joins on the ORIGINAL key — the
    // exact shape PushDownForEachFlatten rewrites in the reference. The
    // front-end compiles FLATTEN to a Generate; our Catalyst rule must
    // hoist it above the join so un-exploded rows ride the shuffle.
    val e = engine.run("""
      d = LOAD 'documents.parquet';
      w = FOREACH d GENERATE doc_id, FLATTEN(TOKENIZE(text)) AS word;
      d2 = LOAD 'documents.parquet';
      m = FOREACH d2 GENERATE doc_id AS did, source;
      j = JOIN w BY doc_id, m BY did;
      out = FOREACH j GENERATE doc_id, word, source;
      """)
    val df = e.relation("out")
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan}
    def containsJoin(p: LogicalPlan): Boolean =
      p.collectFirst { case jj: Join => jj }.isDefined
    val gens = df.queryExecution.optimizedPlan.collect { case g: Generate => g }
    assert(gens.nonEmpty && gens.forall(g => containsJoin(g.child)),
      df.queryExecution.optimizedPlan.toString.take(3000))
    // and the hoisted plan still computes the un-hoisted result
    val docs = Tables.load(spark, dir, "documents")
    val want = docs.select($"doc_id", explode(split(coalesce($"text", lit("")), "\\s+")).as("word"))
      .filter($"word" =!= "")
      .join(docs.select($"doc_id".as("did"), $"source"), $"doc_id" === $"did")
      .select($"doc_id", $"word", $"source")
    assert(df.count() == want.count() && df.exceptAll(want).isEmpty)
  }

  test("L5-shape: anti-join via COGROUP + ISEMPTY filter") {
    val e = engine.run("""
      c = LOAD 'customer.parquet';
      o = LOAD 'orders.parquet';
      cg = COGROUP c BY c_custkey, o BY o_custkey;
      anti = FILTER cg BY ISEMPTY(o) AND NOT ISEMPTY(c);
      out = FOREACH anti GENERATE group AS custkey;
      """)
    val got = col0(e.relation("out")).map(_.asInstanceOf[Long]).toSet
    val want = Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .select("c_custkey").as[Long].collect().toSet
    assert(got == want) // may be empty at sf0.001 — equality is the check
  }

  test("L17-shape: multi-key GROUP with group.field deref, fused aggregation") {
    val e = engine.run("""
      li = LOAD 'lineitem.parquet';
      g = GROUP li BY (l_returnflag, l_linestatus);
      out = FOREACH g GENERATE group.l_returnflag AS rf, group.l_linestatus AS ls,
                               COUNT(li) AS n;
      """)
    val df = e.relation("out")
    assert(!df.queryExecution.optimizedPlan.toString.contains("collect_list"))
    val got = df.as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val want = Tables.load(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus").count()
      .as[(String, String, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got == want)
  }

  test("L9/L10-shape: total order by a single key and by mixed-direction keys") {
    val e = engine.run("""
      o = LOAD 'orders.parquet';
      p = FOREACH o GENERATE o_orderkey, o_custkey, o_totalprice;
      out = ORDER p BY o_totalprice DESC, o_orderkey;
      """)
    val got = rowsOf(e.relation("out"))
    val want = rowsOf(Tables.load(spark, dir, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey"))
    assert(got == want && got.nonEmpty)
  }

  test("L12-shape: SPLIT + multiple STOREs (multi-store, one shared scan)") {
    val tmp = java.nio.file.Files.createTempDirectory("pigmix_l12").toString
    engine.run(s"""
      o = LOAD 'orders.parquet';
      SPLIT o INTO hi IF o_totalprice >= 150000.0, lo IF o_totalprice < 150000.0;
      STORE hi INTO '$tmp/hi';
      STORE lo INTO '$tmp/lo';
      """)
    val hi = spark.read.parquet(s"$tmp/hi")
    val lo = spark.read.parquet(s"$tmp/lo")
    val n = Tables.load(spark, dir, "orders").count()
    assert(hi.count() + lo.count() == n)
    assert(hi.filter($"o_totalprice" < 150000.0).count() == 0)
    assert(lo.filter($"o_totalprice" >= 150000.0).count() == 0)
  }

  test("L11-shape: union then distinct") {
    val e = engine.run("""
      c = LOAD 'customer.parquet';
      s = LOAD 'supplier.parquet';
      cn = FOREACH c GENERATE c_nationkey AS k;
      sn = FOREACH s GENERATE s_nationkey AS k;
      u = UNION cn, sn;
      out = DISTINCT u;
      """)
    val got = col0(e.relation("out")).map(_.asInstanceOf[Int]).toSet
    val want = (col0(Tables.load(spark, dir, "customer").select("c_nationkey")) ++
      col0(Tables.load(spark, dir, "supplier").select("s_nationkey")))
      .map(_.asInstanceOf[Int]).toSet
    assert(got == want)
  }
}

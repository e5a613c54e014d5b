package graft

import org.apache.spark.sql.functions._
import graft.piglatin.{Parser, PigEngine}

/** Pig Latin front-end: parse → compile → execute against the sf0.001
  * testdata, asserted against the equivalent direct DataFrame query
  * (differential, like the reference's e2e harness [R: test/e2e/pig/]).
  */
class PigLatinSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def engine = new PigEngine(spark, Some(dir))

  test("parser handles the full statement surface") {
    val script = """
      -- comment
      a = LOAD 'x.parquet' AS (f1:int, f2:chararray);
      b = FILTER a BY f1 > 3 AND f2 MATCHES 'ab.*';
      c = FOREACH b GENERATE f1, UPPER(f2) AS uf, FLATTEN(TOKENIZE(f2)) AS tok;
      d = GROUP c BY f1;
      e = FOREACH d GENERATE group, COUNT(c), SUM(c.f1) AS s;
      f = ORDER e BY s DESC, group;
      g = LIMIT f 10;
      h = DISTINCT g;
      i = JOIN e BY group, g BY group USING 'replicated';
      j = UNION ONSCHEMA g, h;
      k = CROSS g, h;
      l = SAMPLE g 0.5;
      m = RANK g BY s DESC DENSE;
      SPLIT g INTO hi IF s > 10, lo IF s <= 10;
      STORE g INTO '/tmp/pig_out' USING PigStorage(',');
      """
    Parser.parse(script) match {
      case Right(stmts) => assert(stmts.size == 15)
      case Left(e) => fail(e)
    }
  }

  test("SIZE/COUNT of a NULL bag/tuple/scalar is NULL, not -1 or static arity (r18 review)") {
    // ANSI-off legacy size(null) = -1 leaked through the bare size()
    // calls, and the struct-arity/scalar-1 SIZE branches ignored
    // nullness entirely; Pig's SIZE/COUNT return null on null input
    val p = "/tmp/pig_nullbag"
    Seq((1L, Option(Seq(10L, 20L)), Option((1L, "x")), Option(5L)),
        (2L, None: Option[Seq[Long]], None: Option[(Long, String)], None: Option[Long]))
      .toDF("k", "b", "t", "s").write.mode("overwrite").parquet(p)
    val e = engine.run(s"""
      a = LOAD '$p';
      out = FOREACH a GENERATE k, SIZE(b) AS szb, COUNT(b) AS cnt,
                               SIZE(t) AS szt, SIZE(s) AS szs;
      """)
    val got = e.relation("out").orderBy("k")
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(got == Seq(
      (1L, Some(2L), Some(2L), Some(2L), Some(1L)),
      (2L, None, None, None, None)), got)
  }

  test("unterminated block comment is a lex error, not silent truncation (r18 review)") {
    val r = Parser.parse("a = LOAD 'x.parquet'; /* oops, never closed\nb = FILTER a BY 1 == 1;")
    assert(r.isLeft && r.left.exists(_.contains("unterminated block comment")), r)
    // a properly terminated comment still parses
    assert(Parser.parse("a = LOAD 'x.parquet'; /* fine */ b = FILTER a BY $0 > 1;").isRight)
  }

  test("LOAD/FILTER/FOREACH computes the same rows as the DataFrame query") {
    val e = engine.run("""
      li = LOAD 'lineitem.parquet';
      cheap = FILTER li BY l_quantity < 5.0 AND l_discount > 0.05;
      out = FOREACH cheap GENERATE l_orderkey, l_extendedprice * (1.0 - l_discount) AS rev;
      """)
    val got = e.relation("out").as[(Long, Double)].collect().toSet
    val want = Tables.load(spark, dir, "lineitem")
      .filter($"l_quantity" < 5.0 && $"l_discount" > 0.05)
      .select($"l_orderkey", ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      .as[(Long, Double)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("GROUP … USING 'collected' / COGROUP … USING 'merge' accepted as physical hints; unknown hint rejected") {
    // hints never change results — same rows as the unhinted group
    val e = engine.run("""
      li = LOAD 'lineitem.parquet';
      g = GROUP li BY l_returnflag USING 'collected';
      out = FOREACH g GENERATE group, COUNT(li) AS n;
      """)
    val got = e.relation("out").as[(String, Long)].collect().toMap
    val want = Tables.load(spark, dir, "lineitem").groupBy("l_returnflag")
      .agg(count(lit(1))).as[(String, Long)].collect().toMap
    assert(got == want)
    val e2 = engine.run("""
      o = LOAD 'orders.parquet';
      c = LOAD 'customer.parquet';
      g = COGROUP o BY o_custkey, c BY c_custkey USING 'merge';
      out = FOREACH g GENERATE group, SIZE(o) AS n_orders;
      """)
    assert(e2.relation("out").count() > 0)
    intercept[Exception] {
      engine.run("""
        li = LOAD 'lineitem.parquet';
        g = GROUP li BY l_returnflag USING 'hashed';
        """)
    }
  }

  test("GROUP + FOREACH aggregates fuse to groupBy().agg() (combiner path)") {
    val e = engine.run("""
      li = LOAD 'lineitem.parquet';
      g = GROUP li BY l_returnflag;
      out = FOREACH g GENERATE group, COUNT(li) AS n, SUM(li.l_quantity) AS sq;
      """)
    val df = e.relation("out")
    // fused: no collect_list in the plan
    assert(!df.queryExecution.optimizedPlan.toString.contains("collect_list"))
    val got = df.as[(String, Long, Double)].collect().toMap3
    val want = Tables.load(spark, dir, "lineitem").groupBy("l_returnflag")
      .agg(count(lit(1)), sum("l_quantity")).as[(String, Long, Double)].collect().toMap3
    assert(got == want)
  }

  private implicit class Map3[A, B, C](rows: Array[(A, B, C)]) {
    def toMap3: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("GROUP ALL + COUNT gives the global count") {
    val e = engine.run("""
      o = LOAD 'orders.parquet';
      g = GROUP o ALL;
      out = FOREACH g GENERATE COUNT(o) AS n;
      """)
    assert(col0(e.relation("out")) == Seq(1500L))
  }

  test("materialized bag path: SIZE of the bag without aggregate fusion") {
    val e = engine.run("""
      o = LOAD 'orders.parquet';
      g = GROUP o BY o_custkey;
      out = FOREACH g GENERATE group, SIZE(o) AS n;
      """)
    val got = e.relation("out").as[(Long, Long)].collect().toMap
    val want = Tables.load(spark, dir, "orders").groupBy("o_custkey").count()
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("aliases bind at definition: reassigning an input does not change prior relations (r15)") {
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      a = LOAD 'nation.parquet';
      u = UNION a, a;
      d = DISTINCT a;
      a = FILTER a BY n_nationkey < 3;
      """)
    // u and d were defined over the FULL nation — the later filter on
    // `a` must not retroactively shrink them (Pig binds at definition)
    assert(e.relation("u").count() == 50)
    assert(e.relation("d").count() == 25)
    assert(e.relation("a").count() == 3)
  }

  test("bincond with a null condition yields null, not the false branch (r15)") {
    // write a tiny parquet with a null field and run the ?: through the
    // real front-end — Pig's POBinCond returns null when the condition
    // is null; when().otherwise() returned the false branch
    val tmp = java.nio.file.Files.createTempDirectory("graft_bincond").toString
    Seq((1L, Option(150L)), (2L, Option(50L)), (3L, Option.empty[Long]))
      .toDF("id", "n").write.mode("overwrite").parquet(s"$tmp/probe.parquet")
    val e = new graft.piglatin.PigEngine(spark, Some(tmp)).run("""
      p = LOAD 'probe.parquet';
      out = FOREACH p GENERATE id, (n > 100L ? 'big' : 'small') AS cls;
      """)
    val rows = e.relation("out").orderBy("id").collect()
    assert(rows(0).getString(1) == "big" && rows(1).getString(1) == "small")
    assert(rows(2).isNullAt(1), "null condition must yield null")
  }

  test("self-join: BOTH sides' colliding columns get alias:: qualification (r15)") {
    import spark.implicits._
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      a = LOAD 'region.parquet';
      b = LOAD 'region.parquet';
      j = JOIN a BY r_regionkey, b BY r_regionkey;
      out = FOREACH j GENERATE a::r_regionkey AS k, b::r_name AS nm;
      """)
    val got = e.relation("out").as[(Long, String)].collect().toSet
    val want = Tables.load(spark, dir, "region")
      .select($"r_regionkey", $"r_name").as[(Long, String)].collect().toSet
    assert(got == want && want.size == 5)
  }

  test("GROUP key inside arithmetic falls back to the bag path, correctly (r15)") {
    import spark.implicits._
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      n = LOAD 'nation.parquet';
      g = GROUP n BY n_regionkey;
      out = FOREACH g GENERATE group + 100 AS k2, COUNT(n) AS c;
      """)
    val got = e.relation("out").as[(Long, Long)].collect().toMap
    val want = Tables.load(spark, dir, "nation")
      .groupBy($"n_regionkey").count()
      .select(($"n_regionkey" + 100).as("k2"), $"count")
      .as[(Long, Long)].collect().toMap
    assert(got == want && got.nonEmpty)
  }

  test("JOIN with alias:: disambiguation and outer join") {
    val e = engine.run("""
      c = LOAD 'customer.parquet';
      o = LOAD 'orders.parquet';
      j = JOIN c BY c_custkey LEFT OUTER, o BY o_custkey;
      g = GROUP j BY c_custkey;
      out = FOREACH g GENERATE group, COUNT(j.o_orderkey) AS n;
      """)
    val got = e.relation("out").as[(Long, Long)].collect().toMap
    val want = Tables.load(spark, dir, "customer")
      .join(Tables.load(spark, dir, "orders"),
        $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy("c_custkey").agg(count($"o_orderkey"))
      .as[(Long, Long)].collect().toMap
    assert(got == want) // includes COUNT(null)=skip semantics on the outer side
  }

  test("3-way JOIN qualifies a 2nd/3rd-relation collision by its TRUE owner alias (ADVICE r15)") {
    // "name" collides between b2 and c2 only — the fold must rename the
    // accumulated side's copy to b2::name (its owning alias), not
    // a2::name (the first alias, which owns no such column)
    val e = engine.run("""
      n = LOAD 'nation.parquet';
      a2 = FOREACH n GENERATE n_nationkey AS ak, n_regionkey AS aval;
      b2 = FOREACH n GENERATE n_nationkey AS nk, n_name AS name;
      c2 = FOREACH n GENERATE n_nationkey AS nk2, n_name AS name;
      j = JOIN a2 BY ak, b2 BY nk, c2 BY nk2;
      out = FOREACH j GENERATE ak, b2::name AS bn, c2::name AS cn;
      """)
    val got = e.relation("out").as[(Long, String, String)].collect().toSet
    val want = Tables.load(spark, dir, "nation")
      .select($"n_nationkey".as("ak"), $"n_name".as("bn"), $"n_name".as("cn"))
      .as[(Long, String, String)].collect().toSet
    assert(got == want)
  }

  test("FLATTEN(TOKENIZE) wordcount equals direct explode") {
    val e = engine.run("""
      d = LOAD 'documents.parquet';
      words = FOREACH d GENERATE FLATTEN(TOKENIZE(text)) AS word;
      g = GROUP words BY word;
      out = FOREACH g GENERATE group, COUNT(words) AS n;
      """)
    val got = e.relation("out").as[(String, Long)].collect().toMap
    val want = Tables.load(spark, dir, "documents")
      .select(explode(split($"text", " ")).as("word"))
      .groupBy("word").count().as[(String, Long)].collect().toMap
    assert(got == want)
  }

  test("ORDER BY + LIMIT + bincond + cast") {
    val e = engine.run("""
      o = LOAD 'orders.parquet';
      b = FOREACH o GENERATE o_orderkey, (o_totalprice > 150000.0 ? 'big' : 'small') AS sz,
                             (long) o_totalprice AS rounded;
      top = ORDER b BY rounded DESC, o_orderkey;
      out = LIMIT top 5;
      """)
    val got = e.relation("out").as[(Long, String, Long)].collect().toSeq
    val want = Tables.load(spark, dir, "orders")
      .select($"o_orderkey",
        when($"o_totalprice" > 150000.0, "big").otherwise("small").as("sz"),
        $"o_totalprice".cast("long").as("rounded"))
      .orderBy($"rounded".desc, $"o_orderkey").limit(5)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == want && got.head._2 == "big")
  }

  test("SPLIT + UNION round-trips all rows") {
    val e = engine.run("""
      o = LOAD 'orders.parquet';
      SPLIT o INTO hi IF o_totalprice >= 100000.0, lo IF o_totalprice < 100000.0;
      u = UNION hi, lo;
      """)
    assert(e.relation("u").count() == 1500)
  }

  test("COGROUP produces per-input bags with empty bags for missing keys") {
    val e = engine.run("""
      c = LOAD 'customer.parquet';
      o = LOAD 'orders.parquet';
      cg = COGROUP c BY c_custkey, o BY o_custkey;
      out = FOREACH cg GENERATE group, SIZE(c) AS nc, SIZE(o) AS no;
      """)
    val got = e.relation("out")
    assert(got.count() == 150)
    assert(got.agg(max($"no")).as[Long].head() > 1) // bags hold all matching rows
  }

  test("RANK BY DENSE matches dense_rank") {
    val e = engine.run("""
      n = LOAD 'nation.parquet';
      r = RANK n BY n_regionkey DENSE;
      """)
    val got = e.relation("r").select("n_nationkey", "rank_n")
      .as[(Int, Long)].collect().toMap
    val want = Tables.load(spark, dir, "nation")
      .select($"n_nationkey", dense_rank().over(
        org.apache.spark.sql.expressions.Window.orderBy($"n_regionkey")).cast("long"))
      .as[(Int, Long)].collect().toMap
    assert(got == want)
  }

  test("nested FOREACH block: FILTER + ORDER + LIMIT inside the group") {
    // top-2 orders by totalprice per customer, only orders >= 50k
    val e = engine.run("""
      o = LOAD 'orders.parquet';
      g = GROUP o BY o_custkey;
      out = FOREACH g {
        big = FILTER o BY o_totalprice >= 50000.0;
        srt = ORDER big BY o_totalprice DESC;
        top2 = LIMIT srt 2;
        GENERATE group AS cust, COUNT(big) AS n_big, FLATTEN(top2.o_orderkey) AS okey;
      };
      """)
    val got = e.relation("out").select("cust", "okey").as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy($"o_totalprice".desc)
    val want = Tables.load(spark, dir, "orders")
      .filter($"o_totalprice" >= 50000.0)
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .select($"o_custkey", $"o_orderkey").as[(Long, Long)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("nested FOREACH: DISTINCT + projection with integral SUM") {
    val e = engine.run("""
      li = LOAD 'lineitem.parquet';
      g = GROUP li BY l_orderkey;
      out = FOREACH g {
        lines = li.l_linenumber;
        d = DISTINCT lines;
        GENERATE group AS okey, COUNT(d) AS n_distinct, SUM(d) AS sum_ln;
      };
      """)
    val got = e.relation("out").as[(Long, Long, Long)].collect().toMap3b
    val want = Tables.load(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(countDistinct($"l_linenumber").cast("long"),
        sum_distinct($"l_linenumber").cast("long"))
      .as[(Long, Long, Long)].collect().toMap3b
    assert(got == want)
  }

  private implicit class Map3b(rows: Array[(Long, Long, Long)]) {
    def toMap3b: Map[Long, (Long, Long)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("ASSERT throws on violation, passes otherwise") {
    val e = engine.run("o = LOAD 'orders.parquet';")
    e.run("ASSERT o BY o_totalprice > 0.0, 'prices positive';")
    intercept[IllegalStateException] {
      e.run("ASSERT o BY o_totalprice > 1000000.0, 'unreachable bar';")
    }
  }

  test("STORE PigStorage writes delimited output") {
    val tmp = java.nio.file.Files.createTempDirectory("pigstore").toString + "/out"
    engine.run(s"""
      n = LOAD 'nation.parquet';
      small = FILTER n BY n_nationkey < 3;
      STORE small INTO '$tmp' USING PigStorage(',');
      """)
    val lines = spark.read.text(tmp).count()
    assert(lines == 3)
  }

  test("MAP lookup with # on a parsed JSON map") {
    // map type via JsonLoader-ish path: build a map column relation first
    val df = Seq((1, Map("k" -> 5L)), (2, Map("k" -> 7L))).toDF("id", "props")
    df.write.mode("overwrite").parquet("/tmp/pig_map_test")
    val e = new PigEngine(spark)
    e.run("""
      m = LOAD '/tmp/pig_map_test';
      out = FOREACH m GENERATE id, props#'k' AS kv;
      """)
    assert(e.relation("out").as[(Int, Long)].collect().toMap == Map(1 -> 5L, 2 -> 7L))
  }

  test("common user mistakes produce clean error messages") {
    val e1 = intercept[RuntimeException] {
      engine.run("out = FILTER nope BY x > 1;")
    }
    assert(e1.getMessage.contains("unknown alias"))
    Parser.parse("a = LOAD ;") match {
      case Left(msg) => assert(msg.contains("offset")) // position, not a stack trace
      case Right(_) => fail("expected a parse error")
    }
    Parser.parse("a = JOIN x BY k") match { // missing second input
      case Left(msg) => assert(msg.nonEmpty)
      case Right(stmts) => // single-input JOIN parses; compile rejects it
        val e2 = intercept[RuntimeException] {
          engine.run("x = LOAD 'region.parquet'; out = JOIN x BY r_regionkey;")
            .relation("out")
        }
        assert(e2.getMessage.contains("at least two"))
    }
  }

  test("IN operator desugars to membership and filters correctly") {
    val e = engine.run("""
      n = LOAD 'nation.parquet';
      f = FILTER n BY n_regionkey IN (0, 2);
      out = FOREACH f GENERATE n_nationkey;
      """)
    val got = col0(e.relation("out")).map(_.asInstanceOf[Int]).toSet
    val want = Tables.load(spark, dir, "nation")
      .filter($"n_regionkey".isin(0, 2)).select("n_nationkey")
      .as[Int].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("simple-form CASE x WHEN v THEN r desugars to equality branches") {
    val e = engine.run("""
      o = LOAD 'orders.parquet';
      out = FOREACH o GENERATE o_orderkey,
        (CASE o_orderstatus WHEN 'F' THEN 'finished'
                            WHEN 'O' THEN 'open'
                            ELSE 'partial' END) AS status_word;
      """)
    val got = e.relation("out").as[(Long, String)].collect().toMap
    val want = Tables.load(spark, dir, "orders")
      .select($"o_orderkey",
        when($"o_orderstatus" === "F", "finished")
          .when($"o_orderstatus" === "O", "open")
          .otherwise("partial").as("w"))
      .as[(Long, String)].collect().toMap
    assert(got == want)
  }

  test("SUBTRACT removes bag2's members; SIZE of a tuple is its arity") {
    val e = engine.run("""
      r = LOAD 'region.parquet';
      out = FOREACH r GENERATE r_regionkey,
        SIZE(SUBTRACT(TOBAG(1, 2, 3), TOBAG(2))) AS n_left,
        SIZE(TOTUPLE(r_regionkey, r_name)) AS arity;
      """)
    val rows = e.relation("out").as[(Int, Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (_, nLeft, arity) =>
      nLeft == 2L && arity == 2L })
  }

  test("SUBTRACT preserves bag1's duplicate tuples (membership test, not set diff)") {
    // Pig: SUBTRACT({1,1,3},{2}) has 3 elements — bag1 is NOT deduped
    val e = engine.run("""
      r = LOAD 'region.parquet';
      out = FOREACH r GENERATE
        SIZE(SUBTRACT(TOBAG(1, 1, 3), TOBAG(2))) AS n_kept,
        SIZE(SUBTRACT(TOBAG(1, 1, 3), TOBAG(1))) AS n_dropped;
      """)
    val rows = e.relation("out").as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (kept, dropped) =>
      kept == 3L && dropped == 1L })
  }

  test("SUBTRACT keeps null elements of bag1 when bag2 has no null (HashSet semantics)") {
    // Pig's SUBTRACT probes a HashSet of bag2's tuples: null ∈ {2}? no →
    // null survives; null ∈ {null}? yes → dropped. The old
    // !array_contains predicate NULL-poisoned and dropped it either way.
    val e = engine.run("""
      r = LOAD 'region.parquet';
      out = FOREACH r GENERATE
        SIZE(SUBTRACT(TOBAG(1, NULL, 3), TOBAG(2))) AS n_kept,
        SIZE(SUBTRACT(TOBAG(1, NULL, 3), TOBAG(NULL))) AS n_no_null;
      """)
    val rows = e.relation("out").as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (kept, noNull) =>
      kept == 3L && noNull == 2L })
  }

  test("registerFunction: user function callable from scripts, incl. through DEFINE") {
    val e = engine
      .registerFunction("ADD_TAX", cs => cs.head.cast("double") * 1.1)
      .run("""
        DEFINE tax ADD_TAX;
        o = LOAD 'orders.parquet';
        f = FOREACH o GENERATE o_orderkey, tax(o_totalprice) AS taxed;
        out = ORDER f BY o_orderkey;
        """)
    val got = e.relation("out").as[(Long, Double)].collect().toSeq
    val want = Tables.load(spark, dir, "orders")
      .select($"o_orderkey", ($"o_totalprice".cast("double") * 1.1).as("taxed"))
      .orderBy("o_orderkey").as[(Long, Double)].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("registerAggregate: user aggregate fuses into groupBy().agg()") {
    val e = engine
      .registerAggregate("SUMSQ", cs => sum(cs.head * cs.head))
      .run("""
        li = LOAD 'lineitem.parquet';
        g = GROUP li BY l_returnflag;
        out = FOREACH g GENERATE group AS rf, SUMSQ(li.l_quantity) AS sq, COUNT(li) AS n;
        """)
    val df = e.relation("out")
    // fused: the combiner path, no bag materialization
    assert(!df.queryExecution.optimizedPlan.toString.contains("collect_list"))
    val got = df.as[(String, Double, Long)].collect().toMap3
    val want = Tables.load(spark, dir, "lineitem").groupBy($"l_returnflag")
      .agg(sum($"l_quantity" * $"l_quantity"), count(lit(1)))
      .as[(String, Double, Long)].collect().toMap3
    assert(got == want)
  }

  test("unknown function names a registration path in the error") {
    val ex = intercept[RuntimeException] {
      engine.run("""
        o = LOAD 'orders.parquet';
        out = FOREACH o GENERATE NOSUCHFN(o_orderkey);
        """).relation("out")
    }
    assert(ex.getMessage.contains("registerFunction"))
  }

  test("ORDER ... USING sorts by the registered comparator's key transform") {
    val e = engine.registerComparator("REVKEY", reverse)
      .run("""
        s = LOAD 'supplier.parquet';
        f = FOREACH s GENERATE s_suppkey, s_name;
        out = ORDER f BY s_name USING revkey;
        """)
    val got = e.relation("out").select("s_suppkey").as[Long].collect().toSeq
    val want = Tables.load(spark, dir, "supplier")
      .orderBy(reverse($"s_name")).select("s_suppkey").as[Long].collect().toSeq
    assert(got == want && got.nonEmpty)
  }

  test("ORDER ... USING an unregistered comparator fails with a clear error") {
    val ex = intercept[RuntimeException] {
      engine.run("""
        s = LOAD 'supplier.parquet';
        out = ORDER s BY s_name USING nosuchcmp;
        """).relation("out")
    }
    assert(ex.getMessage.contains("registerComparator"))
  }

  test("JOIN USING 'merge-sparse' is accepted and joins correctly") {
    val e = engine.run("""
      o = LOAD 'orders.parquet';
      c = LOAD 'customer.parquet';
      j = JOIN o BY o_custkey, c BY c_custkey USING 'merge-sparse';
      g = GROUP j ALL;
      out = FOREACH g GENERATE COUNT(j) AS n;
      """)
    val want = Tables.load(spark, dir, "orders").count()
    assert(col0(e.relation("out")) == Seq(want))
  }

  test("REGEX_EXTRACT_ALL in a FOREACH yields the group array, null when unmatched") {
    val e = engine.run("""
      d = LOAD 'documents.parquet';
      out = FOREACH d GENERATE doc_id, REGEX_EXTRACT_ALL(source, '([a-z]+)([0-9]+)') AS parts;
      """)
    val got = e.relation("out").selectExpr("doc_id", "parts[0]", "parts[1]")
      .as[(Long, String, String)].collect().toSet
    val want = Tables.load(spark, dir, "documents")
      .select($"doc_id",
        regexp_extract($"source", "^([a-z]+)([0-9]+)$", 1),
        regexp_extract($"source", "^([a-z]+)([0-9]+)$", 2))
      .as[(Long, String, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("CACHE persists the relation: statement and relational forms") {
    val e = engine.run("""
      li = LOAD 'lineitem.parquet';
      small = FILTER li BY l_quantity < 10.0;
      CACHE small;
      c2 = CACHE small;
      out = FOREACH small GENERATE l_orderkey;
      """)
    assert(e.relation("small").storageLevel.useMemory, "CACHE stmt must persist")
    assert(e.relation("c2").storageLevel.useMemory, "CACHE relop must persist")
    assert(e.relation("out").count() == e.relation("small").count())
    // an alias literally named cache still assigns (disambiguation guard)
    val e2 = engine.run("""
      li = LOAD 'lineitem.parquet';
      cache = FILTER li BY l_quantity < 5.0;
      out = FOREACH cache GENERATE l_orderkey;
      """)
    assert(e2.relation("out").count() == e2.relation("cache").count())
  }
}

/** Preprocessor: %declare/%default parameters, DEFINE aliases, macros. */
class PigPreprocessorSpec extends SparkSuite {
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("%declare parameters substitute into paths and predicates") {
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      %declare TABLE 'orders.parquet'
      %default MIN_PRICE 100000.0
      o = LOAD '$TABLE';
      out = FILTER o BY o_totalprice >= $MIN_PRICE;
      """)
    val want = Tables.load(spark, dir, "orders")
      .filter($"o_totalprice" >= 100000.0).count()
    assert(e.relation("out").count() == want && want > 0)
  }

  test("DEFINE aliases a function name") {
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      DEFINE shout UPPER;
      n = LOAD 'nation.parquet';
      out = FOREACH n GENERATE shout(n_name) AS nn;
      """)
    assert(col0(e.relation("out")).forall(s =>
      s.asInstanceOf[String] == s.asInstanceOf[String].toUpperCase))
  }

  test("macros expand with parameter substitution and alias hygiene") {
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      DEFINE count_by(rel, key) RETURNS counted {
        g = GROUP $rel BY $key;
        counted = FOREACH g GENERATE group, COUNT($rel) AS n;
      };
      o = LOAD 'orders.parquet';
      c = LOAD 'customer.parquet';
      by_status = count_by(o, o_orderstatus);
      by_nation = count_by(c, c_nationkey);
      """)
    val gotStatus = e.relation("by_status").as[(String, Long)].collect().toMap
    val wantStatus = Tables.load(spark, dir, "orders")
      .groupBy("o_orderstatus").count().as[(String, Long)].collect().toMap
    assert(gotStatus == wantStatus)
    assert(e.relation("by_nation").count() == 25)
  }

  test("Pig-standard `$ret = ...` macro body form lexes after expansion (r15)") {
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      DEFINE keyrange(rel) RETURNS bounds {
        g = GROUP $rel ALL;
        $bounds = FOREACH g GENERATE MIN($rel.n_nationkey) AS lo, MAX($rel.n_nationkey) AS hi;
      };
      n = LOAD 'nation.parquet';
      out = keyrange(n);
      """)
    val r = e.relation("out").collect()(0)
    assert(r.getAs[Number](0).longValue == 0L && r.getAs[Number](1).longValue == 24L)
  }

  test("a macro body may call another top-level macro (r15)") {
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      DEFINE small(rel) RETURNS y {
        $y = FILTER $rel BY n_nationkey < 10;
      };
      DEFINE small_distinct(rel) RETURNS z {
        t = small($rel);
        $z = DISTINCT t;
      };
      n = LOAD 'nation.parquet';
      out = small_distinct(n);
      """)
    assert(e.relation("out").count() == 10)
  }

  test("nested macro definitions expand recursively with hygiene (r15)") {
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      DEFINE outer(rel) RETURNS res {
        DEFINE inner(x) RETURNS y {
          y = FILTER $x BY n_nationkey < 10;
        };
        t = inner($rel);
        res = DISTINCT t;
      };
      n = LOAD 'nation.parquet';
      small = outer(n);
      small2 = outer(n);
      """)
    val want = Tables.load(spark, dir, "nation")
      .filter($"n_nationkey" < 10).distinct().count()
    assert(e.relation("small").count() == want && want > 0)
    // two call sites must not cross-wire their nested copies
    assert(e.relation("small2").count() == want)
  }

  test("STREAM serializers: PigStreaming custom delimiter reaches the pipe (r15)") {
    import org.apache.spark.sql.functions._
    // cut -d, only works if the INPUT serializer really joins with ','
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      DEFINE second_field `cut -d, -f2` INPUT(stdin USING PigStreaming(',')) OUTPUT(stdout USING PigStreaming(','));
      r = LOAD 'region.parquet';
      p = FOREACH r GENERATE r_regionkey, r_name;
      s = STREAM p THROUGH second_field AS (name:chararray);
      """)
    val got = col0(e.relation("s")).map(_.asInstanceOf[String]).toSet
    val want = col0(Tables.load(spark, dir, "region").select(col("r_name"))).toSet
    assert(got == want && want.size == 5)
  }

  test("multi-line stream DEFINE: clauses spanning lines accumulate to one definition (r15)") {
    import org.apache.spark.sql.functions._
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      DEFINE first_field `cut -d, -f1`
        INPUT(stdin USING PigStreaming(','))
        OUTPUT(stdout USING PigStreaming(','));
      r = LOAD 'region.parquet';
      p = FOREACH r GENERATE r_name, r_regionkey;
      s = STREAM p THROUGH first_field AS (name:chararray);
      """)
    val got = col0(e.relation("s")).map(_.asInstanceOf[String]).toSet
    val want = col0(Tables.load(spark, dir, "region").select(col("r_name"))).toSet
    assert(got == want)
  }

  test("multi-line stream DEFINE: a quoted ';' delimiter does not truncate accumulation (ADVICE r15)") {
    import org.apache.spark.sql.functions._
    // the continuation lines' PigStreaming(';') contain ';' — the
    // old accumulator stopped at the first one, feeding the parser
    // half a DEFINE; the ';'-delimited round trip proves both clauses
    // survived accumulation intact
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      DEFINE semi `cat`
        INPUT(stdin USING PigStreaming(';'))
        OUTPUT(stdout USING PigStreaming(';'));
      r = LOAD 'region.parquet';
      p = FOREACH r GENERATE r_name, r_regionkey;
      s = STREAM p THROUGH semi AS (name:chararray, k:long);
      """)
    val got = e.relation("s").as[(String, Long)].collect().toSet
    val want = Tables.load(spark, dir, "region")
      .select(col("r_name"), col("r_regionkey"))
      .as[(String, Long)].collect().toSet
    assert(got == want)
  }

  test("malformed stream DEFINE diagnoses at the source instead of feeding the parser garbage") {
    val err = intercept[RuntimeException] {
      new graft.piglatin.PigEngine(spark, Some(dir)).run("""
        DEFINE bad `cat` INPUT(stdin USING PigStreaming(','
          OUTPUT(stdout);
        r = LOAD 'region.parquet';
        """)
    }
    assert(err.getMessage.contains("malformed stream DEFINE"))
  }
}

/** Diagnostics statements execute without error and TOP works. */
class PigDiagnosticsSpec extends SparkSuite {
  private val dir = "/root/testdata/sf0.001"

  test("DUMP / DESCRIBE / EXPLAIN / ILLUSTRATE run without error") {
    new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      r = LOAD 'region.parquet';
      DESCRIBE r;
      EXPLAIN r;
      ILLUSTRATE r;
      DUMP r;
      """)
  }

  test("ILLUSTRATE lineage: filter example repaired with a real passing row") {
    import spark.implicits._
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      n = LOAD 'nation.parquet';
      f = FILTER n BY n_nationkey == 23;
      out = FOREACH f GENERATE n_name;
      """)
    val ex = e.illustrate("out").toMap
    assert(ex.keySet == Set("n", "f", "out"))
    // the 4-row LOAD sample (keys 0..3) cannot satisfy the filter — the
    // repair must pull the real key-23 row so every operator on the
    // path shows a non-empty example
    assert(ex("f").count() >= 1)
    assert(ex("f").filter($"n_nationkey" === 23).count() == 1)
    assert(ex("n").filter($"n_nationkey" === 23).count() == 1) // witness visible upstream
    assert(ex("n").count() >= 5) // base sample + repair row
    assert(ex("out").columns.toSeq == Seq("n_name"))
    assert(ex("out").count() >= 1)
  }

  test("ILLUSTRATE lineage: join example has matching rows (repaired if needed)") {
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      c = LOAD 'customer.parquet';
      o = LOAD 'orders.parquet';
      j = JOIN c BY c_custkey, o BY o_custkey;
      """)
    val ex = e.illustrate("j").toMap
    assert(ex("j").count() >= 1) // completeness: the join path is exercised
  }

  test("ILLUSTRATE lineage: group example shows a multi-row group") {
    import spark.implicits._
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      c = LOAD 'customer.parquet';
      g = GROUP c BY c_nationkey;
      out = FOREACH g GENERATE group, COUNT(c) AS n;
      """)
    val ex = e.illustrate("out").toMap
    // at least one example group aggregates more than one row — the
    // GROUP semantic path (a real multi-row bag), not just singletons
    assert(ex("out").agg(max($"n")).as[Long].head() >= 2)
  }

  test("FOREACH over a GROUP generating only the key yields distinct keys") {
    import spark.implicits._
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      n = LOAD 'nation.parquet';
      g = GROUP n BY n_regionkey;
      k = FOREACH g GENERATE group;
      """)
    val got = e.relation("k").as[Long].collect().toSet
    val want = Tables.load(spark, dir, "nation")
      .select($"n_regionkey").distinct().as[Long].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("ILLUSTRATE lineage: self-reassigned alias diagnosed, not stack-overflowed") {
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      a = LOAD 'nation.parquet';
      a = FILTER a BY n_nationkey < 5;
      """)
    val ex = intercept[IllegalArgumentException] { e.illustrate("a") }
    assert(ex.getMessage.contains("reassigned"))
  }

  test("ILLUSTRATE synthesis: a filter no real row satisfies gets a fabricated witness") {
    import spark.implicits._
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      n = LOAD 'nation.parquet';
      f = FILTER n BY n_nationkey == 999;
      """)
    val ex = e.illustrate("f").toMap
    // no nation has key 999 — pen's last step fabricates one (r15);
    // non-constrained columns carry type defaults, marking it synthetic
    assert(ex("f").filter($"n_nationkey" === 999).count() == 1)
    assert(ex("f").filter($"n_nationkey" === 999)
      .select($"n_name").as[String].head() == "syn")
  }

  test("ILLUSTRATE synthesis: conjunctions solve; contradictions fail closed") {
    import spark.implicits._
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      n = LOAD 'nation.parquet';
      band = FILTER n BY n_nationkey > 100 AND n_nationkey < 200;
      """)
    val ex = e.illustrate("band").toMap
    val k = ex("band").select($"n_nationkey").as[Long].collect()
    assert(k.length == 1 && k(0) > 100 && k(0) < 200)
    // a contradictory predicate must stay empty — the fabricated row is
    // re-verified against the operator's own compiled filter
    val e2 = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      n = LOAD 'nation.parquet';
      none = FILTER n BY n_nationkey > 10 AND n_nationkey < 5;
      """)
    assert(e2.illustrate("none").toMap.apply("none").count() == 0)
    // and an unsupported constraint form (MATCHES) also fails closed
    val e3 = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      n = LOAD 'nation.parquet';
      m = FILTER n BY n_name MATCHES 'zzz_no_such_name.*';
      """)
    assert(e3.illustrate("m").toMap.apply("m").count() == 0)
  }

  test("ILLUSTRATE synthesis: equality pins beat soft conjuncts; qualified names never crash") {
    import spark.implicits._
    // k == 20 AND k != 3: the equality is the hard pin — a last-wins
    // solver would let != overwrite it with 4 and fail verification
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      n = LOAD 'nation.parquet';
      f = FILTER n BY n_nationkey == 999 AND n_nationkey != 3;
      """)
    val ex = e.illustrate("f").toMap
    assert(ex("f").select($"n_nationkey").as[Long].collect().toSeq == Seq(999L))
    // a self-join collides every column into alias::-qualified names;
    // synthesis over the bare names must resolve via the suffix rule or
    // fail closed — never throw out of illustrate()
    val e2 = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      a = LOAD 'region.parquet';
      b = LOAD 'region.parquet';
      j = JOIN a BY r_regionkey, b BY r_regionkey;
      f = FILTER j BY r_name == 'zzz_not_a_region';
      g = GROUP f BY r_name;
      """)
    val ex2 = e2.illustrate("g").toMap // must complete, witness or not
    assert(ex2.contains("g"))
  }

  test("ILLUSTRATE synthesis: a join with no real matching pair gets a fabricated one") {
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      r = LOAD 'region.parquet';
      n = LOAD 'nation.parquet';
      big = FOREACH r GENERATE r_regionkey + 1000 AS k;
      j = JOIN big BY k, n BY n_nationkey;
      """)
    val ex = e.illustrate("j").toMap
    // keys 1000+ match no nation anywhere — the fabricated nation row
    // copies a real key from the left side so the join path is exercised
    assert(ex("j").count() >= 1)
  }

  test("ILLUSTRATE synthesis: a group whose key never repeats gets a fabricated second member") {
    import spark.implicits._
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      r = LOAD 'region.parquet';
      g = GROUP r BY r_regionkey;
      out = FOREACH g GENERATE group, COUNT(r) AS n;
      """)
    val ex = e.illustrate("out").toMap
    // r_regionkey is unique across ALL of region — repair can't find a
    // repeated key, so a duplicate of an example row (one non-key
    // column mutated) is fabricated
    assert(ex("out").agg(max($"n")).as[Long].head() >= 2)
  }

  test("TOP builtin keeps the n largest tuples of a bag by field") {
    import spark.implicits._
    val e = new graft.piglatin.PigEngine(spark, Some(dir)).run("""
      o = LOAD 'orders.parquet';
      g = GROUP o BY o_custkey;
      out = FOREACH g GENERATE group, SIZE(TOP(2, 'o_totalprice', o)) AS n;
      """)
    assert(e.relation("out").agg(max($"n")).as[Long].head() <= 2)
  }
}

/** r17 front-end review regressions. */
class PigFrontendR17Spec extends SparkSuite {
  import spark.implicits._

  private def withTmp(dfs: (String, org.apache.spark.sql.DataFrame)*): String = {
    val tmp = java.nio.file.Files.createTempDirectory("graft_r17fe").toString
    dfs.foreach { case (n, d) =>
      d.write.mode("overwrite").parquet(s"$tmp/$n.parquet") }
    tmp
  }

  test("TOKENIZE honors the 2-arg custom delimiter set (was silently ignored)") {
    val tmp = withTmp("t" -> Seq((1L, "a|b,c|d")).toDF("id", "s"))
    val e = new graft.piglatin.PigEngine(spark, Some(tmp)).run("""
      t = LOAD 't.parquet';
      w = FOREACH t GENERATE FLATTEN(TOKENIZE(s, '|')) AS tok;
      """)
    val got = e.relation("w").as[String].collect().toSet
    assert(got == Set("a", "b,c", "d"), got)
  }

  test("INDEXOF honors the 3-arg start index (was silently dropped)") {
    val tmp = withTmp("t" -> Seq((1L, "abcabc")).toDF("id", "s"))
    val e = new graft.piglatin.PigEngine(spark, Some(tmp)).run("""
      t = LOAD 't.parquet';
      r = FOREACH t GENERATE INDEXOF(s, 'a', 1) AS i1, INDEXOF(s, 'a', 4) AS i2,
          INDEXOF(s, 'a') AS i0;
      """)
    val row = e.relation("r").collect()(0)
    assert((row.getInt(0), row.getInt(1), row.getInt(2)) == ((3, -1, 0)), row)
  }

  test("STRSPLIT drops trailing empty strings like java split (Pig semantics)") {
    val tmp = withTmp("t" -> Seq((1L, "a,b,,")).toDF("id", "s"))
    val e = new graft.piglatin.PigEngine(spark, Some(tmp)).run("""
      t = LOAD 't.parquet';
      r = FOREACH t GENERATE SIZE(STRSPLIT(s, ',')) AS n;
      """)
    assert(e.relation("r").as[Long].collect().toSeq == Seq(2L))
  }

  test("non-fused bag AVG skips nulls; bag COUNT skips null-first-field tuples") {
    val tmp = withTmp("t" ->
      Seq((1L, Option(1.0)), (1L, Option.empty[Double]), (1L, Option(3.0)))
        .toDF("k", "x"))
    val e = new graft.piglatin.PigEngine(spark, Some(tmp)).run("""
      t = LOAD 't.parquet';
      g = GROUP t BY k;
      -- FLATTEN alongside the aggregates forces the non-fused bag path
      r = FOREACH g GENERATE group, AVG(t.x) AS a, COUNT(t.x) AS c,
          FLATTEN(MAX(t.x)) AS mx;
      """)
    val row = e.relation("r").collect()(0)
    assert(row.getDouble(1) == 2.0, s"AVG: ${row.getDouble(1)}") // not null, not 4/3
    assert(row.getLong(2) == 2L, s"COUNT: ${row.getLong(2)}")
  }

  test("FLATTEN(group) on a multi-key plain GROUP splats into key columns (fused path)") {
    val tmp = withTmp("t" ->
      Seq((1L, "x", 10L), (1L, "x", 20L), (2L, "y", 5L)).toDF("a", "b", "v"))
    val e = new graft.piglatin.PigEngine(spark, Some(tmp)).run("""
      t = LOAD 't.parquet';
      g = GROUP t BY (a, b);
      r = FOREACH g GENERATE FLATTEN(group), COUNT(t) AS n;
      s = FILTER r BY a > 1L;
      """)
    val got = e.relation("s").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((2L, "y", 1L)), got)
  }

  test("FLATTEN(group) AS (k1, k2) multi-name parses and renames") {
    val tmp = withTmp("t" ->
      Seq((1L, "x", 10L), (2L, "y", 5L)).toDF("a", "b", "v"))
    val e = new graft.piglatin.PigEngine(spark, Some(tmp)).run("""
      t = LOAD 't.parquet';
      g = GROUP t BY (a, b);
      r = FOREACH g GENERATE FLATTEN(group) AS (k1, k2), COUNT(t) AS n;
      s = FILTER r BY k1 > 1L;
      """)
    val got = e.relation("s").as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((2L, "y", 1L)), got)
  }

  test("%declare bare value does not swallow the statement terminator") {
    val tmp = withTmp("t" -> Seq((1L, 150L), (2L, 50L)).toDF("id", "n"))
    val e = new graft.piglatin.PigEngine(spark, Some(tmp)).run("""
      %declare N 100;
      t = LOAD 't.parquet';
      r = FILTER t BY n > $N AND id > 0L;
      """)
    assert(e.relation("r").count() == 1L)
  }

  test("scheme-qualified LOAD paths bypass the base directory") {
    val tmp = withTmp("t" -> Seq((1L, "x")).toDF("id", "s"))
    // baseDir points elsewhere; the file: URI must win
    val e = new graft.piglatin.PigEngine(spark, Some("/nonexistent_base")).run(s"""
      t = LOAD 'file:$tmp/t.parquet';
      """)
    assert(e.relation("t").count() == 1L)
  }
}

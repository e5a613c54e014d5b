package graft

import org.scalacheck.{Gen, Prop, Test => ScTest}
import graft.piglatin.{Lexer, Parser}

/** Front-end robustness fuzz — the parser must never crash with a
  * non-parse-error exception: any byte soup either tokenizes+parses or
  * is rejected with a diagnostic (Left / a "parse error"-style
  * exception), and generated VALID scripts always parse AND compile to
  * runnable DataFrames. The reference leans on ANTLR's generated
  * recovery [R: src/org/apache/pig/parser/QueryParser.g]; a hand-rolled
  * recursive-descent parser earns the same confidence by fuzz.
  */
class PigFuzzSpec extends SparkSuite {

  private val dir = "/root/testdata/sf0.001"

  // -------------------------------------------------- generators

  private val identGen: Gen[String] =
    for {
      h <- Gen.alphaLowerChar
      t <- Gen.listOfN(4, Gen.oneOf(Gen.alphaNumChar, Gen.const('_')))
    } yield (h :: t).mkString

  private val colGen: Gen[String] =
    Gen.oneOf("r_regionkey", "r_name")

  /** One random statement producing `out` from `in` over region cols. */
  private def stmtGen(in: String, out: String): Gen[String] = Gen.oneOf(
    colGen.map(c => s"$out = FILTER $in BY $c IS NOT NULL;"),
    colGen.map(c => s"$out = FOREACH $in GENERATE $c;"),
    Gen.zip(colGen, colGen).map { case (a, b) =>
      s"$out = FOREACH $in GENERATE $a, $b;" },
    colGen.map(c => s"$out = ORDER $in BY $c;"),
    Gen.chooseNum(1, 10).map(n => s"$out = LIMIT $in $n;"),
    Gen.const(s"$out = DISTINCT $in;"),
    Gen.chooseNum(1, 9).map(n =>
      s"$out = FILTER $in BY r_regionkey < $n;"),
    Gen.const(s"$out = FOREACH $in GENERATE r_regionkey * 2 AS dbl, r_name;"),
    Gen.const(s"$out = FOREACH $in GENERATE ..r_name;"),
    Gen.const(s"$out = SAMPLE $in 0.9;"))

  /** A full random-but-valid script: LOAD then a chain of 1–5 ops.
    * Only projection-stable ops chain after a FOREACH may have narrowed
    * the schema — the generator tracks which columns survive.
    */
  private val scriptGen: Gen[(String, String)] = for {
    n <- Gen.chooseNum(1, 5)
    names <- Gen.listOfN(n, identGen).map(_.distinct)
  } yield {
    val aliases = ("rel0" +: names.zipWithIndex.map { case (s, i) => s"${s}_$i" })
    val sb = new StringBuilder("rel0 = LOAD 'region.parquet';\n")
    var narrowed = false
    var prev = "rel0"
    val rnd = new scala.util.Random(names.hashCode)
    for (a <- aliases.tail) {
      // once a FOREACH narrowed the schema, only schema-free ops follow
      val stmt =
        if (narrowed) rnd.nextInt(3) match {
          case 0 => s"$a = DISTINCT $prev;"
          case 1 => s"$a = LIMIT $prev ${1 + rnd.nextInt(9)};"
          case _ => s"$a = $prev;"
        }
        else stmtGen(prev, a).sample.getOrElse(s"$a = DISTINCT $prev;")
      if (stmt.contains("GENERATE")) narrowed = true
      sb.append(stmt).append('\n')
      prev = a
    }
    (sb.toString, prev)
  }

  // -------------------------------------------------- properties

  test("generated valid scripts parse, compile, and run (ScalaCheck)") {
    val prop = Prop.forAllNoShrink(scriptGen) { case (script, last) =>
      val e = new graft.piglatin.PigEngine(spark, Some(dir)).run(script)
      e.relation(last).count() >= 0L
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------- differential: script ≡ DataFrame

  /** Deterministic op alphabet rendered BOTH as a Pig statement and as
    * the equivalent DataFrame transform — the differential form of the
    * hand-written PigMix specs, over random chains. (No LIMIT/SAMPLE
    * here: their row CHOICE is legitimately nondeterministic without a
    * total order, so they stay in the run-only property above.)
    */
  private sealed trait DOp
  private case class DFilterLt(n: Int) extends DOp
  private case object DFilterNotNull extends DOp
  private case object DProjName extends DOp
  private case object DProjDbl extends DOp
  private case object DDistinct extends DOp
  private case object DOrder extends DOp

  private val dOpGen: Gen[DOp] = Gen.oneOf(
    Gen.chooseNum(0, 6).map(DFilterLt),
    Gen.const(DFilterNotNull), Gen.const(DProjName),
    Gen.const(DProjDbl), Gen.const(DDistinct), Gen.const(DOrder))

  test("random op chains: front-end result equals the direct DataFrame result") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    def stmt(op: DOp, in: String, out: String): String = op match {
      case DFilterLt(n) => s"$out = FILTER $in BY r_regionkey < $n;"
      case DFilterNotNull => s"$out = FILTER $in BY r_name IS NOT NULL;"
      case DProjName => s"$out = FOREACH $in GENERATE r_regionkey;"
      case DProjDbl => s"$out = FOREACH $in GENERATE r_regionkey, r_regionkey * 2 AS dbl;"
      case DDistinct => s"$out = DISTINCT $in;"
      case DOrder => s"$out = ORDER $in BY r_regionkey DESC;"
    }
    def apply(op: DOp, df: DataFrame): DataFrame = op match {
      case DFilterLt(n) => df.filter(col("r_regionkey") < n)
      case DFilterNotNull => df.filter(col("r_name").isNotNull)
      case DProjName => df.select(col("r_regionkey"))
      case DProjDbl => df.select(col("r_regionkey"), (col("r_regionkey") * 2).as("dbl"))
      case DDistinct => df.distinct()
      case DOrder => df.orderBy(col("r_regionkey").desc)
    }
    // a projection can drop r_name; later ops referencing it must not
    // be generated — the generator filters chains to schema-valid ones
    def valid(ops: List[DOp]): Boolean = {
      var hasName = true
      ops.forall { op =>
        val ok = op match {
          case DFilterNotNull => hasName
          case _ => true
        }
        op match { case DProjName | DProjDbl => hasName = false; case _ => () }
        ok
      }
    }
    val chainGen = Gen.chooseNum(1, 6)
      .flatMap(n => Gen.listOfN(n, dOpGen)).retryUntil(valid, 100)
    val prop = Prop.forAllNoShrink(chainGen) { ops =>
      val script = new StringBuilder("rel0 = LOAD 'region.parquet';\n")
      var prev = "rel0"
      ops.zipWithIndex.foreach { case (op, i) =>
        script.append(stmt(op, prev, s"rel${i + 1}")).append('\n')
        prev = s"rel${i + 1}"
      }
      val e = new graft.piglatin.PigEngine(spark, Some(dir)).run(script.toString)
      val got = e.relation(prev)
      val want = ops.foldLeft(Tables.load(spark, dir, "region")) {
        (df, op) => apply(op, df)
      }
      got.columns.toSeq == want.columns.toSeq &&
        got.collect().map(_.toSeq).sortBy(_.toString())
          .sameElements(want.collect().map(_.toSeq).sortBy(_.toString()))
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(25), prop)
    assert(res.passed, res.status.toString)
  }

  // ------------------- differential: TWO-relation plans (r15, task 5)

  /** Per-source pre-op alphabet — schema-stable (filters/distinct only)
    * so the downstream combiner's column references always resolve. */
  private sealed trait PreOp
  private case class PreKeyLt(n: Int) extends PreOp
  private case object PreNameNotNull extends PreOp
  private case object PreDistinct extends PreOp

  private val preGen: Gen[List[PreOp]] =
    Gen.chooseNum(0, 2).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(0, 30).map(PreKeyLt),
      Gen.const(PreNameNotNull), Gen.const(PreDistinct))))

  private sealed trait Combiner
  private case class CJoin(typ: String) extends Combiner // inner/left/right/full
  private case object CUnion extends Combiner
  private case object CCogroup extends Combiner

  private val combinerGen: Gen[Combiner] = Gen.oneOf(
    Gen.const(CJoin("inner")), Gen.const(CJoin("left")),
    Gen.const(CJoin("right")), Gen.const(CJoin("full")),
    Gen.const(CUnion), Gen.const(CCogroup))

  test("two-relation plans: JOIN (incl. outer) / UNION ONSCHEMA / GROUP+agg ≡ direct DataFrame") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._

    def preStmts(ops: List[PreOp], in: String, prefix: String,
                 key: String, name: String): (String, String) = {
      val sb = new StringBuilder
      var prev = in
      ops.zipWithIndex.foreach { case (op, i) =>
        val out = s"$prefix$i"
        val stmt = op match {
          case PreKeyLt(n) => s"$out = FILTER $prev BY $key < $n;"
          case PreNameNotNull => s"$out = FILTER $prev BY $name IS NOT NULL;"
          case PreDistinct => s"$out = DISTINCT $prev;"
        }
        sb.append(stmt).append('\n'); prev = out
      }
      (sb.toString, prev)
    }
    def preApply(ops: List[PreOp], df: DataFrame,
                 key: String, name: String): DataFrame =
      ops.foldLeft(df) { (d, op) => op match {
        case PreKeyLt(n) => d.filter(col(key) < n)
        case PreNameNotNull => d.filter(col(name).isNotNull)
        case PreDistinct => d.distinct()
      }}

    // post = 0: plain projection; 1: single-key GROUP+agg; 2:
    // multi-key GROUP + FLATTEN(group) AS (…, …) + agg — the fused
    // splat shape the r17 front-end review fixed, kept under fuzz
    val caseGen = for {
      pa <- preGen; pb <- preGen; c <- combinerGen
      post <- Gen.choose(0, 2)
    } yield (pa, pb, c, post)

    val prop = Prop.forAllNoShrink(caseGen) { case (pa, pb, c, post) =>
      val (sa, lastA) = preStmts(pa, "ra", "fa", "r_regionkey", "r_name")
      val (sb, lastB) = preStmts(pb, "rb", "fb", "n_regionkey", "n_name")
      val script = new StringBuilder(
        "ra = LOAD 'region.parquet';\nrb = LOAD 'nation.parquet';\n")
      script.append(sa).append(sb)
      c match {
        case CJoin(typ) =>
          val outerKw = typ match {
            case "inner" => ""
            case t => s" ${t.toUpperCase} OUTER"
          }
          script.append(
            s"j = JOIN $lastA BY r_regionkey$outerKw, $lastB BY n_regionkey;\n")
          if (post == 1) script.append(
            """g = GROUP j BY r_name;
              |out = FOREACH g GENERATE group, COUNT_STAR(j) AS n, SUM(j.n_nationkey) AS s;
              |""".stripMargin)
          else if (post == 2) script.append(
            """g = GROUP j BY (r_name, n_regionkey);
              |out = FOREACH g GENERATE FLATTEN(group) AS (nm, rk), COUNT_STAR(j) AS n;
              |""".stripMargin)
          else script.append("out = FOREACH j GENERATE r_name, n_nationkey;\n")
        case CUnion =>
          script.append(s"pa = FOREACH $lastA GENERATE r_regionkey AS k, r_name AS v;\n")
          script.append(s"pb = FOREACH $lastB GENERATE n_regionkey AS k, n_name AS v;\n")
          script.append("u = UNION ONSCHEMA pa, pb;\n")
          if (post >= 1) script.append(
            """g = GROUP u BY v;
              |out = FOREACH g GENERATE group, COUNT_STAR(u) AS n, SUM(u.k) AS s;
              |""".stripMargin)
          else script.append("out = u;\n")
        case CCogroup =>
          // full-outer per-key bags, empty bags → SIZE 0 (`post` has no
          // effect: the SIZE projection is already the aggregate form)
          script.append(
            s"""cg = COGROUP $lastA BY r_regionkey, $lastB BY n_regionkey;
               |out = FOREACH cg GENERATE group, SIZE($lastA) AS na, SIZE($lastB) AS nb;
               |""".stripMargin)
      }
      val e = new graft.piglatin.PigEngine(spark, Some(dir)).run(script.toString)
      val got = e.relation("out")

      val a = preApply(pa, Tables.load(spark, dir, "region"), "r_regionkey", "r_name")
      val b = preApply(pb, Tables.load(spark, dir, "nation"), "n_regionkey", "n_name")
      val want = c match {
        case CJoin(typ) =>
          val jt = typ match {
            case "inner" => "inner"; case "left" => "left_outer"
            case "right" => "right_outer"; case "full" => "full_outer"
          }
          val j = a.join(b, a("r_regionkey") === b("n_regionkey"), jt)
          if (post == 1)
            j.groupBy(col("r_name")).agg(
                count(lit(1)).as("n"), sum(col("n_nationkey")).as("s"))
              .withColumnRenamed("r_name", "group")
          else if (post == 2)
            j.groupBy(col("r_name").as("nm"), col("n_regionkey").as("rk"))
              .agg(count(lit(1)).as("n"))
          else j.select(col("r_name"), col("n_nationkey"))
        case CUnion =>
          val u = a.select(col("r_regionkey").as("k"), col("r_name").as("v"))
            .unionByName(b.select(col("n_regionkey").as("k"), col("n_name").as("v")))
          if (post >= 1)
            u.groupBy(col("v")).agg(
                count(lit(1)).as("n"), sum(col("k")).as("s"))
              .withColumnRenamed("v", "group")
          else u
        case CCogroup =>
          val ac = a.groupBy(col("r_regionkey").as("g")).agg(count(lit(1)).as("na"))
          val bc = b.groupBy(col("n_regionkey").as("g")).agg(count(lit(1)).as("nb"))
          ac.join(bc, Seq("g"), "full_outer")
            .select(col("g").as("group"),
              coalesce(col("na"), lit(0L)).as("na"),
              coalesce(col("nb"), lit(0L)).as("nb"))
      }
      val colsOk = got.columns.toSeq == want.columns.toSeq
      val rowsOk = got.collect().map(_.toSeq).sortBy(_.toString())
        .sameElements(want.collect().map(_.toSeq).sortBy(_.toString()))
      if (!colsOk || !rowsOk)
        println(s"FUZZ MISMATCH colsOk=$colsOk rowsOk=$rowsOk\n$script")
      colsOk && rowsOk
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("arbitrary garbage never escapes as a non-diagnostic crash (ScalaCheck)") {
    val junkGen = Gen.listOfN(40, Gen.frequency(
      8 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', ';', '=', '(', ')', ',', '.', '\'', '`', '$',
        '{', '}', '#', ':', '*', '+', '-', '<', '>', '!'),
      1 -> Gen.oneOf('\n', '\t'))).map(_.mkString)
    val prop = Prop.forAllNoShrink(junkGen) { junk =>
      // Parser.parse returns Left(diagnostic) for anything it rejects
      // (lexer errors and ParseErrors both); ANY thrown exception is a
      // crash escaping the diagnostic channel
      try { Parser.parse(junk); true }
      catch { case scala.util.control.NonFatal(_) => false }
    }
    val res = ScTest.check(ScTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.llm.Retrieval

/** BM25 retrieval: hand-computed scores, partition invariance, top-k
  * parity with the window formulation, no Window in the plan. */
class RetrievalSpec extends SparkSuite with org.scalatest.BeforeAndAfterEach {
  import spark.implicits._

  // bm25 persists tf via Rel.track; honor its release contract after
  // every test so the suite never accumulates cached corpus frames
  override protected def afterEach(): Unit = {
    graft.dsl.Rel.releaseTracked()
    super.afterEach()
  }

  private val docs = Seq(
    (1L, "a b a"), (2L, "b c"), (3L, "c c c c")).toDF("doc_id", "text")
  private val query = Seq((1, "a"), (1, "c")).toDF("qid", "term")

  /** The same formula in plain Scala — same JVM Math.log as codegen. */
  private def nano(tf: Long, df: Long, dl: Long, n: Long, avgdl: Double): Long = {
    val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    val c = idf * ((tf * (1.2 + 1)) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
    math.floor(c * 1e9 + 0.5).toLong
  }

  test("scores match the hand-derived BM25 nanos") {
    val got = Retrieval.bm25(docs, "doc_id", "text", query)
      .as[(Int, Long, Long)].collect().map { case (q, d, s) => (q, d) -> s }.toMap
    // N=3, avgdl=3.0; df(a)=1, df(c)=2; dl: 3, 2, 4
    val want = Map(
      (1, 1L) -> nano(2, 1, 3, 3, 3.0),          // 'a' in d1
      (1, 2L) -> nano(1, 2, 2, 3, 3.0),          // 'c' in d2
      (1, 3L) -> nano(4, 2, 4, 3, 3.0))          // 'c' in d3
    assert(got == want)
  }

  test("scores are partition-order independent (exact long sums)") {
    val base = Retrieval.bm25(docs, "doc_id", "text", query)
      .collect().map(_.toSeq).toSet
    val repart = Retrieval.bm25(docs.repartition(7), "doc_id", "text",
      query.repartition(3)).collect().map(_.toSeq).toSet
    assert(base == repart)
  }

  test("bm25TopK equals the window row_number formulation, ties on (score desc, doc asc)") {
    // wider corpus with score ties: duplicate docs force ties broken by id
    val rnd = new scala.util.Random(3)
    val vocab = Vector("a", "b", "c", "d", "e")
    val wide = (1L to 200L).map { i =>
      (i, Seq.fill(8)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val q2 = Seq((1, "a"), (1, "d"), (2, "e")).toDF("qid", "term")
    val got = Retrieval.bm25TopK(wide, "doc_id", "text", q2, k = 5)
      .select("qid", "rank", "doc", "score_nano")
      .collect().map(_.toSeq).toSet
    val want = Retrieval.bm25(wide, "doc_id", "text", q2)
      .withColumn("rank", row_number().over(
        Window.partitionBy($"qid").orderBy($"score_nano".desc, $"doc".asc)))
      .filter($"rank" <= 5)
      .select("qid", "rank", "doc", "score_nano")
      .collect().map(_.toSeq).toSet
    assert(got == want)
  }

  test("the top-k plan has no Window operator (bounded TopKAgg, not a per-query sort)") {
    val plan = Retrieval.bm25TopK(docs, "doc_id", "text", query, k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("tf is persisted: one tokenize scan feeds both remaining branches (r22 shape)") {
    val plan = Retrieval.bm25(docs, "doc_id", "text", query)
      .queryExecution.executedPlan.toString
    // r22: dl rides the tf aggregation itself (a narrow size() on the
    // scan) and stats derives narrowly from the docs scan, so exactly
    // TWO branches read the cached tf — dfreq and the scoring join —
    // and NO doc-keyed exchange of tf remains. Structural, not
    // ReuseExchange luck (a partial rewire back to raw toks would drop
    // the count and fail here).
    val scans = "InMemoryTableScan".r.findAllIn(plan).length
    assert(scans >= 2, s"expected >=2 InMemoryTableScans, got $scans:\n$plan")
    // the r21 shape's corpus-scale waste must be GONE: no exchange
    // hash-partitioned by doc alone (the old dl groupBy + tf⋈dl join
    // both shuffled by doc; the remaining exchanges key on (doc, term)
    // and (qid, doc))
    val docExchange = "Exchange hashpartitioning\\(doc#\\d+L?, \\d+\\)".r
    assert(docExchange.findFirstIn(plan).isEmpty,
      s"doc-keyed exchange should be gone:\n$plan")
  }
}

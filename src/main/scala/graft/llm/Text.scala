package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dsl.PigFunctions.roundCompat

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All deterministic
  * column compositions (codegen'd, reproducible in any SQL engine).
  */
object Text {

  private val Mod = 2147483647L // 2^31 - 1, keeps the rolling hash in range

  /** Whitespace token array. */
  def words(text: Column): Column = split(text, " ")

  /** Whitespace token count. NULL text counts NULL (unknown content
    * has no token count — the SQL count convention; pre-r17 the
    * ANSI-off `size(null) = -1` leaked a NEGATIVE count into budget
    * prefix sums). */
  def tokenCountWs(text: Column): Column =
    when(text.isNotNull, size(words(text)).cast("long"))

  /** BPE-ish token estimate: word-ish runs, digit runs, and individual
    * non-alphanumeric symbols each count as one token — the classic
    * ~4-chars-per-token regex estimate used before real tokenizers.
    */
  def tokenCountRegex(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")).cast("long")

  /** Heuristic language ID from marker-token hits; deterministic
    * tie-break by fixed language order. A real system would use n-gram
    * profiles; the heuristic is the SQL-expressible stand-in with the
    * same pipeline shape (per-row scoring → argmax).
    */
  def langIdHeuristic(text: Column): Column = {
    val ws = words(text)
    def hits(markers: Seq[String]): Column =
      size(filter(ws, w => markers.map(m => w === m).reduce(_ || _)))
    val en = hits(Seq("the", "a", "of", "and"))
    val es = hits(Seq("el", "la", "los", "de"))
    val fr = hits(Seq("le", "la", "les", "des"))
    val de = hits(Seq("der", "die", "das", "und"))
    // NULL text identifies as NULL, not "en": under ANSI-off every
    // hits() count is size(null) = -1, so the first branch's
    // -1 >= -1 comparisons were all true (the qualityScore r17 rule,
    // extended here by the second r17 review pass)
    when(text.isNull, lit(null).cast("string"))
      .when(en >= es && en >= fr && en >= de, "en")
      .when(es >= fr && es >= de, "es")
      .when(fr >= de, "fr")
      .otherwise("de")
  }

  /** Quality score in [0,1]: blends type-token ratio, mean word length
    * (clamped to [0,8]/8), and a length prior. Weights fixed;
    * deterministic per-row arithmetic.
    */
  def qualityScore(text: Column): Column = {
    val ws = words(text)
    val n = size(ws).cast("double")
    val ttr = size(array_distinct(ws)).cast("double") / n
    val meanLen = least(length(text).cast("double") / n, lit(8.0)) / 8.0
    val lengthPrior = least(n / 100.0, lit(1.0))
    // NULL text scores NULL (the Classifier.score rule): pre-r17 the
    // ANSI-off size(null) = -1 made ttr = 1.0 and least() skipped the
    // null meanLen term, so unknown content scored ~0.697 and sailed
    // through every >= 0.5 quality gate
    when(text.isNotNull,
      roundCompat(ttr * 0.4 + meanLen * 0.3 + lengthPrior * 0.3, 4))
  }

  /** Stopword ratio against a fixed small list. NULL text is NULL —
    * (-1)/(-1) under ANSI-off size(null) semantics scored unknown
    * content 1.0, the value of maximally natural prose (r17 review). */
  def stopwordRatio(text: Column): Column = {
    val ws = words(text)
    val stop = Seq("the", "a", "of", "and", "to", "in")
    when(text.isNotNull,
      roundCompat(size(filter(ws, w => stop.map(s => w === s).reduce(_ || _)))
        .cast("double") / size(ws), 4))
  }

  /** PII scrubbing: replace emails, international-ish phone numbers and
    * IPv4 addresses with fixed placeholder tokens — the standard
    * curation pass before training-corpus publication. Pure
    * regexp_replace chain (codegen'd, scan-bound, no shuffle); the
    * patterns avoid constructs whose semantics differ between Java
    * regex and RE2 so a SQL oracle can replay them verbatim.
    */
  def scrubPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
    val ip = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    val phone = "\\+[0-9][0-9 -]{7,14}[0-9]"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        ip, "<IP>"),
      phone, "<PHONE>")
  }

  /** C4-style boilerplate removal: drop sentences (segments split on
    * `sep`) that occur in more than `maxDocFreq` distinct documents,
    * then reassemble each document in original sentence order.
    * Documents whose every sentence is boilerplate are dropped — the C4
    * behavior.
    *
    * Scale shape: the frequency aggregation and the join back are keyed
    * on `xxhash64(line)` — 8-byte keys — so sentence TEXT never rides a
    * shuffle as a key and the keepable side carries one long per rare
    * sentence; strings stay only on the doc-side rows that reassembly
    * needs anyway. Three shuffles total (df-agg, join back, per-doc
    * reassembly), none quadratic. A 64-bit collision between two
    * distinct sentences merges their document frequencies (may
    * over-drop a rare sentence that collides with boilerplate) —
    * ≈ n²/2⁶⁵ over DISTINCT sentences, irrelevant below trillions.
    */
  def removeBoilerplate(df: DataFrame, idCol: String, textCol: String,
                        sep: String = ". ", maxDocFreq: Int = 3,
                        passthrough: Seq[String] = Nil): DataFrame = {
    // passthrough columns (constant per doc) ride the explode and come
    // back via first() in the reassembly — so a caller needing them
    // (Curate.curate's srcCol) doesn't pay a second corpus scan plus a
    // corpus-wide re-attach join (r17 review)
    val arr = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val lines = df.select(col(idCol).as("doc") +: passthrough.map(col) :+
        posexplode(arr).as(Seq("pos", "line")): _*)
      .withColumn("lh", xxhash64(col("line")))
    val keepable = lines.select(col("lh"), col("doc")).distinct()
      .groupBy(col("lh")).agg(count(lit(1)).as("docs"))
      .filter(col("docs") <= maxDocFreq)
      .select(col("lh"))
    val reassemble = array_join(
      transform(array_sort(collect_list(struct(col("pos"), col("line")))),
        x => x.getField("line")),
      sep).as("clean")
    val aggs = reassemble +: passthrough.map(c => first(col(c)).as(c))
    lines.join(keepable, "lh")
      .groupBy(col("doc"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Polynomial rolling hash of the whole text (mod 2^31-1, base 31) —
    * a deterministic document fingerprint computable in plain SQL.
    * h = fold over characters: h*31 + codepoint (mod M).
    *
    * Computed by the native codegen'd [[graft.plans.FingerprintF]]
    * expression (the old interpreted per-character `aggregate()` fold —
    * kept below as [[fingerprintColumnForm]] — was the last
    * CodegenFallback on a scan hot path). Equivalence evidence: a
    * KernelPropsSpec ScalaCheck property (kernel ≡ code-point fold
    * spec, incl. non-BMP) plus a TextSpec example test against the
    * Column form.
    */
  def fingerprint(text: Column): Column =
    call_function("graft_fingerprint", text)

  /** Unicode canonicalization for dedup keys (CCNet/C4 lineage):
    * NFKC → lowercase → accent-strip → whitespace-collapse, as the
    * native codegen'd [[graft.plans.NormalizeTextF]] kernel. Compose
    * as `fingerprint(normalize(text))` for case/accent-robust exact
    * dedup (q124). */
  def normalize(text: Column): Column =
    call_function("graft_normalize", text)

  /** The SQL-expressible fold [[fingerprint]] is bit-identical to —
    * interpreted (CodegenFallback), so only the equivalence spec and
    * SQL-oracle documentation should use it.
    */
  private[graft] def fingerprintColumnForm(text: Column): Column =
    aggregate(split(text, ""), lit(0L),
      (h, c) => pmod(h * 31L + ascii(c), lit(Mod)))

  /** Winnowing-style shingle fingerprint: minimum rolling hash over the
    * document's k-word shingles — robust to local edits, used for
    * near-dup candidate keys. The per-shingle hash is the codegen'd
    * [[graft.plans.FingerprintF]] kernel; only the cheap per-SHINGLE
    * dispatch stays in the interpreted `transform` lambda (the
    * per-character fold it used to wrap was the expensive part).
    */
  def shingleFingerprint(text: Column, k: Int = 5): Column =
    array_min(transform(Dedup.shingles(text, k),
      s => call_function("graft_fingerprint", s)))

  /** Deterministic token-budget sampling: keep, per source, the prefix
    * of documents (in a pseudo-random but fully deterministic order)
    * whose cumulative whitespace-token count stays within
    * `budgetTokens` — how a training mix caps each source's
    * contribution while staying reproducible across runs and engines.
    *
    * The order key is the polynomial [[fingerprint]] of the text
    * (ties broken by id): a fixed pseudo-random permutation that any
    * SQL engine can re-derive — unlike an RNG — so the sample is
    * oracle-checkable row-for-row. A document that would cross the
    * budget is excluded (as is everything after it in hash order).
    *
    * Scale: one hash exchange by source + a per-source sort of
    * (fingerprint, id, n_tokens) records — 24-byte rows, text never
    * shuffles. A skewed giant source serializes its own sort
    * (Window.partitionBy puts the whole source in one task); pass
    * `buckets > 1` to switch to the TWO-PHASE form: bucket the order
    * key by fingerprint RANGE (bucket = fp div width, monotone in fp,
    * so (bucket, fp, doc) order ≡ (fp, doc) order), pre-aggregate
    * per-(source, bucket) token totals, budget whole buckets from the
    * tiny totals table, then prefix-sum INSIDE each surviving bucket
    * in parallel with the bucket's exclusive offset added back.
    * Buckets whose offset already exceeds the budget are dropped
    * before any sort — the per-source serial sort becomes `buckets`
    * parallel sorts, and rows past the boundary never sort at all.
    * Output is IDENTICAL to the single-phase form (same order key,
    * same cumulative sums — spec-tested), so the knob is purely a
    * physical choice. It stays a caller knob rather than a row-count
    * trigger because auto-detection would cost a counting pass over
    * the input at plan time.
    *
    * MEASURED guidance for the knob (local[32] sf0.1,
    * bench/scalecurve_r11_q78_frag32.jsonl): two-phase pays one extra
    * fingerprint scan (phase 1 re-aggregates from its own projection —
    * persisting the scan instead was measured ~2x worse, r10), so it
    * LOSES ~1.2-1.6x while the dominant source's ROW COUNT is small
    * relative to scan bytes (~54-token docs, ≤1.3M rows: 3.5 vs
    * 4.1 s at the largest measured point) and WINS once the
    * single-task sort dominates the scan — the many-short-docs shape:
    * the same corpus re-cut into 8-token fragments in ONE source
    * crosses over at ~2M rows (4.9 vs 6.0 s) and reaches 1.54x at
    * ~9M rows (13.1 vs 20.2 s), the gap widening with scale since the
    * serial sort is one task at ANY cluster size while every
    * two-phase stage parallelizes. Flip it when one source holds
    * multi-million short records; leave it off otherwise.
    *
    * @return (doc, src, n_tokens, cum_tokens) for kept docs.
    */
  def sampleByTokenBudget(df: DataFrame, idCol: String, textCol: String,
                          srcCol: String, budgetTokens: Long,
                          buckets: Int = 0): DataFrame = {
    val rec = df.filter(col(textCol).isNotNull) // uncountable -> unbudgetable
      .select(col(idCol).as("doc"), col(srcCol).as("src"),
        tokenCountWs(col(textCol)).as("n_tokens"),
        fingerprint(col(textCol)).as("fp"))
    if (buckets <= 1) {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("fp"), col("doc"))
      rec.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
        .filter(col("cum_tokens") <= budgetTokens)
        .select(col("doc"), col("src"), col("n_tokens"), col("cum_tokens"))
    } else {
      // fp ∈ [0, Mod): integer `div` by the ceil-width keeps bucket ids
      // in [0, buckets) and monotone in fp
      val width = (Mod + buckets - 1) / buckets
      // NOT persisted: r10 measured the MEMORY_AND_DISK persist of the
      // full fingerprint scan as a ~2x pessimization at every factor
      // (bench/scalecurve_r10_q78.jsonl — materializing the corpus
      // records cost more than the serial sort it parallelized). The
      // offsets subplan instead re-derives its tiny aggregate from a
      // FRESH pass: phase 1's groupBy is map-side combinable down to
      // |sources|·buckets partial rows, so its only real cost is a
      // second fingerprint scan — the cheaper trade (measured:
      // bench/scalecurve_r11_q78.jsonl).
      val b = rec.withColumn("bkt", expr(s"fp div ${width}L"))
      // phase 1: per-(source, bucket) token totals — |sources|·buckets
      // rows — then each bucket's EXCLUSIVE prefix (its offset in the
      // source's global order). A bucket whose offset exceeds the
      // budget can contain no kept doc (cum ≥ offset for every doc in
      // it); the ones at or under it include the boundary bucket and
      // every fully-kept bucket before it.
      val wB = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src")).orderBy(col("bkt"))
      val offsets = b.groupBy(col("src"), col("bkt"))
        .agg(sum(col("n_tokens")).as("btoks"))
        .withColumn("boff", sum(col("btoks")).over(wB) - col("btoks"))
        .filter(col("boff") <= budgetTokens)
        .select(col("src"), col("bkt"), col("boff"))
      // phase 2: the surviving-bucket offsets broadcast back onto the
      // records (dropping dead buckets pre-sort), and the prefix sum
      // runs per (source, bucket) — parallel across buckets
      val wIn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("src"), col("bkt")).orderBy(col("fp"), col("doc"))
      b.join(broadcast(offsets), Seq("src", "bkt"))
        .withColumn("cum_tokens", col("boff") + sum(col("n_tokens")).over(wIn))
        .filter(col("cum_tokens") <= budgetTokens)
        .select(col("doc"), col("src"), col("n_tokens"), col("cum_tokens"))
    }
  }

  /** Deterministic MIXTURE sampling — per-source token budgets
    * proportional to caller-supplied weights (the published-recipe
    * shape: a target corpus mixture like 50% web / 20% books / …,
    * applied as hard token quotas). Each source keeps its
    * fingerprint-ordered prefix up to `floor(total × w_s / Σw)`
    * tokens — the same RNG-free, any-engine-re-derivable order as
    * [[sampleByTokenBudget]] (q78), so the selection is reproducible
    * row-for-row. Sources absent from `weights` get budget 0 and are
    * excluded entirely.
    *
    * Scale shape: one fingerprint scan + one per-source window prefix
    * sum (map-side-combinable, no driver materialization); per-source
    * budgets ride as a literal when-chain (codegen'd, no join). For a
    * skewed giant source, the q78 two-phase bucketed refinement
    * applies unchanged — compose via [[sampleByTokenBudget]] per
    * source if that regime appears.
    */
  def sampleByMixture(df: DataFrame, idCol: String, textCol: String,
                      srcCol: String, totalTokens: Long,
                      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty, "mixture sampling needs at least one weight")
    val wsum = weights.values.sum
    require(wsum > 0, "mixture weights must sum to a positive value")
    val budgets: Seq[(String, Long)] = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => s -> math.floor(totalTokens * w / wsum).toLong }
    val budgetCol = budgets.foldLeft(lit(0L)) {
      case (acc, (s, b)) => when(col("src") === s, lit(b)).otherwise(acc)
    }
    val rec = df.filter(col(textCol).isNotNull) // uncountable -> unbudgetable
      .select(col(idCol).as("doc"), col(srcCol).as("src"),
        tokenCountWs(col(textCol)).as("n_tokens"),
        fingerprint(col(textCol)).as("fp"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("fp"), col("doc"))
    rec.withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetCol)
      .select(col("doc"), col("src"), col("n_tokens"), col("cum_tokens"))
  }

  /** Quality-stratified deterministic subsample — the curation recipe
    * that keeps high-quality documents at a higher rate than low-quality
    * ones instead of applying one hard threshold. Each document is
    * assigned its quality-score stratum s ∈ [0, strata) (equal-count
    * strata over the corpus-wide (quality, id) order) and kept iff
    * `id mod strata < s + 1` — so stratum 0 keeps 1/strata of its docs
    * and the top stratum keeps all of them. Entirely RNG-free: the
    * stratum comes from a deterministic global rank and the keep rule
    * from the id, so any engine re-derives the exact row set.
    *
    * Scale shape: the global rank uses [[graft.ops.Rank.rowNumber]]'s
    * 2-pass range-partition + per-partition-offset pipeline — fully
    * parallel, NOT a single-partition `row_number()` window. The rank
    * input is the narrow (id, quality) projection (16 bytes/row), never
    * the text. One count action on the persisted projection supplies
    * the corpus size as a literal. For the regime where even the
    * narrow sort is unwelcome, [[qualityStrataApprox]] trades exact
    * equal-count strata for percentile_approx boundaries with no
    * global sort at all.
    */
  def sampleByQualityStrata(df: DataFrame, idCol: String, textCol: String,
                            strata: Int = 10): DataFrame = {
    require(strata >= 2, "stratified sampling needs at least two strata")
    // unknown content is unbudgetable: null-quality (null-text) docs
    // are excluded, not parked in stratum 0 by nulls-first ordering
    // (the sampleByTokenBudget rule; r17 review)
    val scored = graft.dsl.Rel.track(
      df.select(col(idCol), qualityScore(col(textCol)).as("quality"))
        .filter(col("quality").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val n = scored.count()
    val rn = graft.ops.Rank.rowNumber(
      scored, Seq(col("quality").asc, col(idCol).asc), "_rn")
    rn.withColumn("stratum",
        floor(lit(strata) * (col("_rn") - 1).cast("double") / lit(n.toDouble))
          .cast("int"))
      .filter(pmod(col(idCol), lit(strata)) < col("stratum") + 1)
      .select(col(idCol), col("stratum"), col("quality"))
  }

  /** Sort-free variant of [[sampleByQualityStrata]] for the 100 TB
    * regime: stratum boundaries from `percentile_approx` (fixed-size
    * QuantileSummaries sketch, partial/final merge — one combiner-
    * friendly aggregation instead of a corpus-wide sort), broadcast
    * back as a literal when-chain. Strata are approximately equal-count
    * (sketch error) rather than exactly; the keep rule is unchanged.
    */
  def qualityStrataApprox(df: DataFrame, idCol: String, textCol: String,
                          strata: Int = 10, accuracy: Int = 10000): DataFrame = {
    require(strata >= 2, "stratified sampling needs at least two strata")
    // null-quality exclusion, as in the exact twin above (also keeps
    // the bounds collect from NPE-ing on an all-null corpus)
    val scored = graft.dsl.Rel.track(
      df.select(col(idCol), qualityScore(col(textCol)).as("quality"))
        .filter(col("quality").isNotNull)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val qs = (1 until strata).map(_.toDouble / strata)
    val bounds = scored.select(
        percentile_approx(col("quality"),
          array(qs.map(lit): _*), lit(accuracy)).as("b"))
      .head().getSeq[Double](0)
    val stratum = bounds.foldLeft(lit(0)) {
      (acc, b) => acc + when(col("quality") >= b, 1).otherwise(0)
    }
    scored.withColumn("stratum", stratum.cast("int"))
      .filter(pmod(col(idCol), lit(strata)) < col("stratum") + 1)
      .select(col(idCol), col("stratum"), col("quality"))
  }

  /** Per-document analysis record: one pass producing the standard text
    * statistics (used by quality filtering pipelines). */
  def analyze(df: DataFrame, idCol: String, textCol: String,
              extras: Seq[(String, Column => Column)] = Nil): DataFrame = {
    val t = col(textCol)
    // extras ride the SAME projection (one scan) — appending another
    // per-row signal must not cost a second scan plus a join-back
    df.select((Seq(
      col(idCol),
      tokenCountWs(t).as("n_tokens_ws"),
      tokenCountRegex(t).as("n_tokens_re"),
      length(t).cast("long").as("n_chars"),
      langIdHeuristic(t).as("lang_pred"),
      qualityScore(t).as("quality"),
      stopwordRatio(t).as("stopword_ratio"),
      fingerprint(t).as("fingerprint"))
      ++ extras.map { case (n, fn) => fn(t).as(n) }): _*)
  }

  /** Unigram log-probability score — the perplexity-style quality
    * filter: each document scored by the mean ln(count(w)/N) of its
    * tokens under the corpus's own unigram distribution (N = total
    * token count). Low scores = texts full of corpus-rare tokens
    * (gibberish, OCR noise); the cheap stand-in for an n-gram LM
    * filter.
    *
    * Determinism: each ln term is cast to decimal(28,12) before the
    * per-doc sum, so the aggregate is order-independent and matches a
    * SQL oracle bit-for-bit despite float addition non-associativity.
    *
    * Scale shape: token explode → word-count aggregation (combiner
    * bounds the shuffle by vocabulary size) → join tokens to counts on
    * word → per-doc sum. Real-text vocabularies are tiny next to the
    * corpus (Heaps' law), so when the aggregated vocabulary is under
    * `broadcastVocabRows` the count side BROADCASTS and the token
    * explode never shuffles by word at all — which also deletes the
    * stop-word join skew. Deciding needs the vocab size, and
    * `wc.count()` costs nothing extra: it materializes the persisted
    * aggregation both downstream consumers need anyway. Oversized
    * vocabularies fall back to the shuffle join (AQE handles the
    * stop-word skew; the count side is 1 row/word). N rides along via
    * a broadcast 1-row cross join.
    *
    * NOTE: the `wc.count()` makes this method EAGER — a Spark job (the
    * vocabulary aggregation) runs at DataFrame-construction time, so
    * even explain-only callers (PlanCheck on q68) execute that stage,
    * and the broadcast-vs-shuffle choice is frozen when the plan is
    * built rather than left to AQE. Accepted trade: the persisted
    * aggregation is needed by both downstream consumers anyway, and a
    * statistics-based deferral would leave the skew-prone shuffle in
    * the plan whenever stats are missing.
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String,
                     broadcastVocabRows: Long = 250000): DataFrame = {
    val toks = df.select(col(idCol).as("doc"),
      explode(words(col(textCol))).as("word"))
    // persisted: the vocabulary counts feed both the corpus total and
    // the per-token join — one aggregation over the corpus, not two
    val wc = graft.dsl.Rel.track(
      toks.groupBy(col("word")).agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val wcSide = if (wc.count() <= broadcastVocabRows) broadcast(wc) else wc
    val total = wc.agg(sum(col("c")).as("n_total"))
    toks.join(wcSide, "word")
      .crossJoin(broadcast(total))
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(log(col("c").cast("double") / col("n_total"))
          .cast("decimal(28,12)")).as("sum_lp"))
      .select(col("doc"), col("n_tokens"),
        roundCompat(col("sum_lp").cast("double") / col("n_tokens"), 6)
          .as("mean_logprob"))
  }

  /** Sequence packing — the concat-and-chunk bin assignment a training
    * pipeline runs to pack tokenized documents into fixed-length
    * sequences: documents in a deterministic global order (by id), each
    * assigned to the training sequence its FIRST token lands in, i.e.
    * bin = exclusive-prefix-tokens div seqTokens.
    *
    * The prefix sum is [[graft.ops.Rank.prefixSum]] — the reference's
    * POCounter 2-pass shape generalized to sums: per-partition totals
    * (one tiny job, numPartitions longs on the driver), then offsets
    * embedded map-side. NO single-partition window, so the operator
    * holds at 100 TB where `SUM() OVER (ORDER BY …)` without a
    * PARTITION BY would collapse onto one task. A SQL oracle, which
    * doesn't have that constraint, re-derives it exactly with the
    * windowed form.
    *
    * Output: (doc, n_tokens, cum_tokens inclusive, bin 0-based).
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqTokens: Long): DataFrame = {
    require(seqTokens > 0, "seqTokens must be positive")
    val rec = df.filter(col(textCol).isNotNull) // the tokenPack rule
      .select(col(idCol).as("doc"),
        tokenCountWs(col(textCol)).as("n_tokens"))
    graft.ops.Rank.prefixSum(rec, Seq(col("doc")), "n_tokens", "cum_tokens")
      .withColumn("bin", expr(s"(cum_tokens - n_tokens) div ${seqTokens}L"))
  }

  /** Deterministic fixed-count per-group sample: the "k docs per
    * source" sampler (inspection sets, eval slices, few-shot pools).
    * RNG-free — rows rank by (fingerprint, id) inside each group and
    * the first k win, so any SQL engine re-derives the selection
    * row-for-row and reruns are identical.
    *
    * Scale shape: ONE window partitioned by the group key — parallel
    * across groups (this is the partitioned-window form that is fine
    * at scale; it is the GLOBAL window with no partitioning that
    * serializes). A skewed giant group ranks within one task but only
    * until k winners emerge upstream of the filter; for pathological
    * group sizes compose with the bucketed two-phase trick of
    * [[sampleByTokenBudget]].
    */
  def samplePerGroup(df: DataFrame, idCol: String, textCol: String,
                     groupCol: String, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    df.select(col(idCol), col(groupCol).as("grp"),
        fingerprint(col(textCol)).as("fp"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("grp")).orderBy(col("fp"), col(idCol))))
      .filter(col("rk") <= k)
      .select(col(idCol), col("grp"), col("rk").cast("long").as("rk"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling" — public paper):
    * each document scored by its mean per-token
    * ln p_target(w) − ln p_raw(w) under bag-of-words unigram models,
    * where the target model is estimated from the rows matching
    * `targetPred` (the small high-quality corpus) and the raw model
    * from the whole input. Documents whose vocabulary looks like the
    * target score high; resampling proportional to the weight shifts
    * the corpus mixture toward the target domain without training a
    * classifier. (DSIR proper uses hashed n-gram features; unigram
    * features keep the weight exactly re-derivable by a SQL oracle —
    * documented simplification, same pipeline shape.)
    *
    * Laplace smoothing `alpha` on BOTH models over the raw vocabulary
    * V, so target-unseen words stay finite:
    *   p_m(w) = (c_m(w) + α) / (N_m + α·|V|).
    *
    * Determinism: per-token log-ratio terms are cast to decimal(28,12)
    * before the per-doc sum (the [[unigramLogProb]] trick), so the
    * aggregate is partition-order-exact and matches a SQL oracle
    * bit-for-bit.
    *
    * Scale shape: ONE token explode; ONE vocabulary aggregation
    * carries both models' counts (the target count is a conditional
    * sum in the same pass — the target subset never re-scans); the
    * three scalars (N_raw, N_tgt, |V|) ride a broadcast 1-row cross
    * join; the token→counts join broadcasts below
    * `broadcastVocabRows` exactly as [[unigramLogProb]] (and shares
    * its documented EAGER `wc.count()` trade).
    */
  def importanceWeights(df: DataFrame, idCol: String, textCol: String,
                        targetPred: Column, alpha: Double = 0.5,
                        broadcastVocabRows: Long = 250000): DataFrame = {
    val toks = df.select(col(idCol).as("doc"),
      targetPred.as("is_target"),
      explode(words(col(textCol))).as("word"))
    val wc = graft.dsl.Rel.track(
      toks.groupBy(col("word"))
        .agg(count(lit(1)).as("c_raw"),
          sum(when(col("is_target"), 1L).otherwise(0L)).as("c_tgt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val wcSide = if (wc.count() <= broadcastVocabRows) broadcast(wc) else wc
    val scalars = wc.agg(
      sum(col("c_raw")).as("n_raw"),
      sum(col("c_tgt")).as("n_tgt"),
      count(lit(1)).as("v"))
    toks.join(wcSide, "word")
      .crossJoin(broadcast(scalars))
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum((log((col("c_tgt") + alpha) / (col("n_tgt") + col("v") * alpha))
            - log((col("c_raw") + alpha) / (col("n_raw") + col("v") * alpha)))
          .cast("decimal(28,12)")).as("sum_lr"))
      .select(col("doc"), col("n_tokens"),
        roundCompat(col("sum_lr").cast("double"), 6).as("logratio"),
        roundCompat(col("sum_lr").cast("double") / col("n_tokens"), 6)
          .as("mean_logratio"))
  }

  /** Sliding-window document chunking — the context-window splitter a
    * training/embedding pipeline runs before tokenize-and-pack or
    * chunk-embedding: each document becomes overlapping word windows of
    * `chunkWords` words advancing by `stride`.
    *
    * Start-index rule (the tokenizer "overflow" convention, chosen so a
    * SQL oracle re-derives chunk boundaries exactly):
    *  - n ≤ chunkWords → one chunk, the whole document;
    *  - else strided starts k·stride while k·stride + chunkWords < n,
    *    then a final chunk anchored at n − chunkWords, so the tail is
    *    always a FULL window and no chunk is a suffix of another.
    *
    * Output: (doc, chunk_id 0-based, start_word, n_words, chunk_text).
    * Deterministic, no RNG, pure column math.
    *
    * Scale shape: per-row transform + posexplode — embarrassingly
    * parallel, no shuffle at all (Verify's ORDER BY is presentation).
    * The words array is materialized ONCE as an attribute before the
    * lambda ([[repetitionSignals]]'s lesson: inlining split() into a
    * higher-order function re-evaluates it per element, O(words²)).
    * Row blowup is bounded by ~n/stride per doc — the explode feeds
    * the next stage without materializing bags.
    */
  def chunk(df: DataFrame, idCol: String, textCol: String,
            chunkWords: Int = 32, stride: Int = 24): DataFrame = {
    require(chunkWords > 0 && stride > 0, "chunkWords and stride must be positive")
    // the packSequences/tokenPack rule: null text emits NO chunks —
    // un-filtered it produced a bogus (n_words = -1, null chunk_text)
    // row per null doc via size(null) = -1 (r17 review)
    val pre = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc"), words(col(textCol)).as("graft_chunk_w"))
    val w = col("graft_chunk_w")
    val n = size(w)
    // m strided starts strictly before the anchored tail start (n - cw):
    // k·stride + cw < n  ⟺  k < (n-cw)/stride  ⟹  m = ceil((n-cw)/stride)
    val m = when(n <= chunkWords, 0)
      .otherwise(ceil((n - chunkWords).cast("double") / stride).cast("int"))
    val starts = transform(sequence(lit(0), m),
      k => when(k < m, k * stride).otherwise(greatest(n - chunkWords, lit(0))))
    pre.select(col("doc"), w, posexplode(starts).as(Seq("chunk_id", "start_word")))
      .select(col("doc"), col("chunk_id").cast("long").as("chunk_id"),
        col("start_word").cast("long").as("start_word"),
        least(lit(chunkWords), size(w) - col("start_word")).cast("long").as("n_words"),
        array_join(slice(w, col("start_word") + 1, lit(chunkWords)), " ").as("chunk_text"))
  }

  /** Bigram-LM quality score — the perplexity-style filter one step up
    * from [[unigramLogProb]] (the CCNet-lineage shape: score text under
    * an n-gram LM, drop the tails): each document's mean
    * ln p(w_i | w_{i-1}) under the corpus's own bigram model with
    * unigram-backoff smoothing,
    *
    *   p(w | v) = (c(v,w) + α·p1(w)) / (c(v) + α),   p1(w) = c(w)/N
    *
    * so unseen bigrams fall back to the unigram distribution instead
    * of −∞. Documents with fewer than two words have no bigrams and
    * are dropped (documented; the corpus tables have none).
    *
    * Determinism: per-bigram terms cast to decimal(28,12) before the
    * per-doc sum — partition-order-exact, bit-matched by the SQL
    * oracle.
    *
    * Scale shape: ONE bigram explode (the words array is materialized
    * before the transform — the [[repetitionSignals]] lambda-capture
    * lesson); bigram and unigram counts partial-aggregate map-side and
    * are vocabulary-bounded; both count sides BROADCAST below
    * `broadcastVocabRows` (Heaps' law — same rationale and same eager
    * `count()` trade as [[unigramLogProb]]); N rides a broadcast 1-row
    * cross join.
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
                    alpha: Double = 0.5,
                    broadcastVocabRows: Long = 250000): DataFrame = {
    val pre = df.select(col(idCol).as("doc"), words(col(textCol)).as("graft_bg_w"))
    val w = col("graft_bg_w")
    val pairs = pre.select(col("doc"),
        explode(when(size(w) >= 2,
            transform(sequence(lit(1), size(w) - 1),
              i => struct(element_at(w, i).as("prev"), element_at(w, i + 1).as("cur"))))
          .otherwise(array().cast("array<struct<prev:string,cur:string>>"))).as("bg"))
      .select(col("doc"), col("bg.prev").as("prev"), col("bg.cur").as("cur"))
    val toks = df.select(explode(words(col(textCol))).as("word"))
    val ug = graft.dsl.Rel.track(
      toks.groupBy(col("word")).agg(count(lit(1)).as("c_w"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val bgc = graft.dsl.Rel.track(
      pairs.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c_vw"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val vocabSmall = ug.count() <= broadcastVocabRows
    val bgSmall = bgc.count() <= broadcastVocabRows
    val ugPrev = ug.select(col("word").as("prev"), col("c_w").as("c_prev"))
    val ugCur = ug.select(col("word").as("cur"), col("c_w").as("c_cur"))
    val total = ug.agg(sum(col("c_w")).as("n_total"))
    pairs
      .join(if (bgSmall) broadcast(bgc) else bgc, Seq("prev", "cur"))
      .join(if (vocabSmall) broadcast(ugPrev) else ugPrev, Seq("prev"))
      .join(if (vocabSmall) broadcast(ugCur) else ugCur, Seq("cur"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc"))
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(log((col("c_vw") + (col("c_cur").cast("double") / col("n_total")) * alpha)
              / (col("c_prev") + alpha))
          .cast("decimal(28,12)")).as("sum_lp"))
      .select(col("doc"), col("n_bigrams"),
        roundCompat(col("sum_lp").cast("double") / col("n_bigrams"), 6)
          .as("mean_logprob"))
  }

  /** Gopher-style quality-rule signals (Rae et al. 2021, "Scaling
    * Language Models" appendix A1.1 — public paper): per-document
    * repetition and composition statistics used as training-data
    * filters. All deterministic integer/double column math, so a SQL
    * oracle can re-derive every value:
    *
    *  - `n_words`      whitespace token count
    *  - `mean_word_len` characters-per-word (round 4)
    *  - `frac_alpha`   fraction of words containing a letter (round 4)
    *  - `frac_top_word` occurrences of the most frequent word / n_words
    *    (round 4) — the cheap repetition detector
    *
    * The per-row stats are pure column folds; frac_top_word is the
    * explode→count→max two-phase aggregation (combiner-friendly, no
    * bags). At 100 TB both paths partial-aggregate map-side.
    */
  def qualityRules(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // null text is dropped EXPLICITLY (unknown content must not be
    // scored — the Dedup rule): the inner join below silently erased
    // those docs anyway (the explode side emits nothing for them), so
    // the filter makes the contract visible instead of incidental
    // (r17 review)
    val in = df.filter(col(textCol).isNotNull)
    val ws = words(col(textCol))
    val n = size(ws).cast("double")
    val perRow = in.select(
      col(idCol),
      size(ws).cast("long").as("n_words"),
      roundCompat(length(regexp_replace(col(textCol), " ", "")).cast("double") / n, 4)
        .as("mean_word_len"),
      roundCompat(size(filter(ws, w => w.rlike("[A-Za-z]"))).cast("double") / n, 4)
        .as("frac_alpha"))
    val topWord = in
      .select(col(idCol), explode(words(col(textCol))).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(max(col("c")).as("top_c"), sum(col("c")).as("n_w"))
      .select(col(idCol),
        roundCompat(col("top_c").cast("double") / col("n_w"), 4).as("frac_top_word"))
    perRow.join(topWord, idCol)
  }

  /** Gopher repetition signals (Rae et al. 2021 appendix A1.1 — public
    * paper): the duplicate-n-gram filters that catch boilerplate-heavy
    * and loop-generated documents, complementing [[qualityRules]]'s
    * single-word `frac_top_word`:
    *
    *  - `frac_chars_top_2gram`  max over word-2-grams of
    *    occurrences × gram-chars, over total chars — "how much of the
    *    document is its single most repetition-heavy 2-gram". (Gopher
    *    takes the char share of the MOST FREQUENT n-gram; maximising
    *    count×chars directly is tie-break-free and therefore exactly
    *    re-derivable by a SQL oracle — documented deviation.)
    *  - `frac_chars_dup_5gram` / `frac_chars_dup_10gram`  sum over
    *    n-grams occurring ≥2 times of (occurrences − 1) × gram-chars,
    *    over total chars — the duplicated-n-gram char fraction. The
    *    first occurrence is excluded (it is not a duplicate, matching
    *    Gopher A1.1); overlapping grams can still double-count a
    *    character, so all three fractions are clamped to 1.0.
    *
    * Documents with fewer than n words have no n-grams → fraction 0,
    * including the empty document (0 chars → 0, not null).
    *
    * Scale shape: ONE explode emits (n, gram) rows for all three n in a
    * single pass (three passes would triple the shuffle); the
    * (doc, n, gram) count partial-aggregates map-side, and the per-doc
    * rollup is a second combiner-friendly aggregation. Gram TEXT rides
    * one shuffle — bounded at ~3 rows per word; at 100 TB this is the
    * same explode→count shape as wordcount, the canonical map-side-
    * combine workload. All column math, whole-stage codegen.
    */
  /** Char-fraction for repetition signals: null-safe numerator, clamped
    * to [0, 1], and 0.0 (not null) for the zero-char document.
    */
  private def fracOfChars(num: Column, nChars: Column): Column =
    when(nChars > 0,
      roundCompat(least(coalesce(num, lit(0L)).cast("double") / nChars, lit(1.0)), 4))
      .otherwise(0.0)

  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // The words array MUST be a materialized attribute, not an inline
    // split(...) expression: a lambda body re-evaluates its captured
    // expressions per array element, so inlining `split` into the
    // transform below is O(words²) per document — measured 9.7 s vs
    // ~1 s at sf0.1 for this query. Referencing `w` three times (one
    // per n) also stops CollapseProject from inlining it back.
    val pre = df.select(col(idCol),
      length(col(textCol)).cast("double").as("n_chars"),
      words(col(textCol)).as("graft_rep_w"))
    val w = col("graft_rep_w")
    def grams(n: Int): Column =
      when(size(w) >= n,
        transform(sequence(lit(0), size(w) - n),
          i => struct(lit(n).as("n"), array_join(slice(w, i + 1, lit(n)), " ").as("gram"))))
        .otherwise(array().cast("array<struct<n:int,gram:string>>"))
    val exploded = pre.select(
        col(idCol), col("n_chars"),
        explode_outer(concat(grams(2), grams(5), grams(10))).as("g"))
      .select(col(idCol), col("n_chars"), col("g.n").as("n"), col("g.gram").as("gram"))
    val perGram = exploded
      .groupBy(col(idCol), col("n_chars"), col("n"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .select(col(idCol), col("n_chars"), col("n"), col("c"),
        (col("c") * length(col("gram"))).as("prod"),
        ((col("c") - 1) * length(col("gram"))).as("dup_prod"))
    perGram
      .groupBy(col(idCol), col("n_chars"))
      .agg(
        max(when(col("n") === 2, col("prod"))).as("top2"),
        sum(when(col("n") === 5 && col("c") >= 2, col("dup_prod"))).as("dup5"),
        sum(when(col("n") === 10 && col("c") >= 2, col("dup_prod"))).as("dup10"))
      .select(col(idCol),
        fracOfChars(col("top2"), col("n_chars")).as("frac_chars_top_2gram"),
        fracOfChars(col("dup5"), col("n_chars")).as("frac_chars_dup_5gram"),
        fracOfChars(col("dup10"), col("n_chars")).as("frac_chars_dup_10gram"))
  }

  /** Line-level quality signals (RefinedWeb/FineWeb-lineage document
    * filters — line statistics, complementing [[qualityRules]]'s
    * word-level Gopher signals): per document, over segments split on
    * `sep` —
    *  - `n_lines`          segment count
    *  - `mean_line_words`  mean whitespace-word count per segment
    *  - `frac_short_lines` segments with < `shortWords` words
    *  - `frac_dup_lines`   1 − distinct/total segments WITHIN the doc
    *    (a high value flags listicle/boilerplate-shaped pages)
    *
    * Pure per-row array math — NO explode, no shuffle: at 100 TB this
    * is scan-bound column work like the other quality signals. All
    * values roundCompat'd so a SQL oracle replays them bit-for-bit.
    */
  def lineSignals(df: DataFrame, idCol: String, textCol: String,
                  sep: String = ". ", shortWords: Int = 3): DataFrame = {
    val arr = split(col(textCol), java.util.regex.Pattern.quote(sep))
    val wordCounts = transform(arr, l => size(split(l, " ")))
    val n = size(arr).cast("double")
    // null text: every signal NULL (size(null) = -1 leaked n_lines =
    // -1 into aggregations and a fabricated frac_short_lines = 1.0;
    // r17 review — the analyze() convention)
    val nn = col(textCol).isNotNull
    df.select(
      col(idCol),
      when(nn, size(arr).cast("long")).as("n_lines"),
      when(nn, roundCompat(
        aggregate(wordCounts, lit(0L), (acc, c) => acc + c).cast("double") / n,
        4)).as("mean_line_words"),
      when(nn, roundCompat(
        size(filter(wordCounts, c => c < shortWords)).cast("double") / n,
        4)).as("frac_short_lines"),
      when(nn, roundCompat(
        (n - size(array_distinct(arr)).cast("double")) / n,
        4)).as("frac_dup_lines"))
  }

  /** Deterministic train/val/test split assignment — the standard
    * corpus partition every training pipeline needs, RNG-free: each
    * row's split comes from `xxhash64(salt, id) mod 10⁶` against the
    * cumulative weight boundaries, so the assignment is reproducible
    * run-to-run and machine-to-machine, stable under repartitioning,
    * and adding documents later never moves an existing document's
    * split (the property a random split lacks and leakage audits
    * need). Change `salt` for an independent re-split.
    *
    * Pure column math — no shuffle, no state; proportions hold to
    * binomial accuracy (q112's property oracle pins ±6σ).
    */
  /** The conventional default corpus partition — shared with q112's
    * oracle-side expectations so the two can never drift. */
  val DefaultSplits: Seq[(String, Double)] =
    Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)

  def assignSplit(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)] = DefaultSplits,
                  salt: String = "graft-split",
                  as: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0), "weights must be positive")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9, "split weights must sum to 1")
    val buckets = 1000000L
    val h = pmod(xxhash64(lit(salt), col(idCol)), lit(buckets))
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail.init
      .map(c => math.round(c * buckets))
    val label = splits.map(_._1).zip(bounds)
      .foldRight(lit(splits.last._1): Column) { case ((name, b), rest) =>
        when(h < b, name).otherwise(rest)
      }
    df.withColumn(as, label)
  }

  /** Top-`size` corpus vocabulary with cumulative coverage — the
    * vocabulary-construction / OOV-rate pass a tokenizer pipeline runs
    * before committing to a token inventory: words ranked by corpus
    * frequency (ties break lexicographically, so the ranking is a
    * deterministic total order), each row carrying the cumulative
    * fraction of all token occurrences the vocabulary up to that rank
    * covers (1 − cum_coverage at rank k = the OOV rate of a k-word
    * vocab).
    *
    * Scale shape: one word-count aggregation (map-side combine), a
    * TakeOrdered top-`size` (per-partition top-k, no global sort), and
    * a window over the RESULT — `size` rows by construction, so the
    * unpartitioned window is bounded by the parameter, not the data.
    *
    * @return (rank, word, cnt, cum_coverage), `size` rows.
    */
  def vocabulary(df: DataFrame, textCol: String, size: Int = 100): DataFrame = {
    require(size > 0, "vocabulary size must be positive")
    val counts = graft.dsl.Rel.track(
      df.select(explode(words(col(textCol))).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    // sum over zero rows is NULL: an empty/all-blank corpus yields the
    // empty vocabulary, not an NPE or a 0-division
    val total = Option(counts.agg(sum(col("cnt"))).head().getAs[java.lang.Long](0))
      .map(_.toLong).getOrElse(0L)
    if (total == 0L)
      return counts.limit(0).select(lit(0L).as("rank"), col("word"), col("cnt"),
        lit(0.0).as("cum_coverage"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("word").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    counts.orderBy(col("cnt").desc, col("word").asc).limit(size)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("word").asc)).cast("long"))
      .withColumn("cum_coverage",
        roundCompat(sum(col("cnt")).over(w).cast("double") / total.toDouble, 6))
      .select(col("rank"), col("word"), col("cnt"), col("cum_coverage"))
  }

  /** TF-IDF over the corpus: classic two-aggregation pipeline (term
    * frequencies per doc, document frequencies per term, log-idf join).
    * Returns (doc, term, tf, df, tfidf).
    */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // corpus size counts only SCORABLE (non-null-text) docs — the
    // explode drops null-text rows, so counting them in nDocs inflated
    // every idf by log(total/scorable) and corpus-wide stopwords no
    // longer zeroed out (r17 review)
    val in = df.filter(col(textCol).isNotNull)
    val nDocs = in.count() // one scalar action, then broadcast-folded
    val terms = in.select(col(idCol).as("doc"), explode(words(col(textCol))).as("term"))
    // persisted: the (doc, term) aggregation feeds both the df
    // derivation and the final join — one aggregation, not two
    val tf = graft.dsl.Rel.track(
      terms.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    tf.join(dfreq, "term")
      .select(col("doc"), col("term"), col("tf"), col("df"),
        roundCompat(col("tf") * log(lit(nDocs.toDouble) / col("df")), 6).as("tfidf"))
  }

  /** Lexical-diversity signals: the vocabulary-richness filters used
    * alongside repetition stats when curating training text (a
    * low-diversity document is boilerplate or template spam even when
    * no single n-gram repeats):
    *
    *  - `n_words`           whitespace token count
    *  - `type_token_ratio`  distinct words / total words (round 4)
    *  - `word_entropy`      Shannon entropy of the word distribution in
    *    bits (round 4), via H = log2(n) − (Σ c·ln c) / (n·ln 2) so the
    *    only corpus-order-dependent term is a sum
    *
    * Determinism: the Σ c·ln c partial sums would drift with partition
    * order in double; each term is cast to decimal(28,12) first (the
    * [[unigramLogProb]] trick), so the sum is exact and the result is
    * bit-identical to a SQL oracle regardless of parallelism.
    *
    * Scale shape: explode → (doc, word) count → per-doc rollup. Both
    * aggregations partial-aggregate map-side; nothing is holistic, no
    * bags materialize. The empty document tokenizes to one empty word
    * (split semantics), giving TTR 1.0 and entropy 0 — consistent on
    * both sides of the oracle.
    */
  def lexicalDiversity(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val c = col("c").cast("double")
    df.select(col(idCol), explode(words(col(textCol))).as("word"))
      .groupBy(col(idCol), col("word")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(
        sum(col("c")).as("n_words"),
        count(lit(1)).as("n_types"),
        sum((c * log(c)).cast("decimal(28,12)")).as("sum_clnc"))
      .select(col(idCol),
        col("n_words"),
        roundCompat(col("n_types").cast("double") / col("n_words"), 4)
          .as("type_token_ratio"),
        roundCompat(
          (log(col("n_words").cast("double"))
            - col("sum_clnc").cast("double") / col("n_words")) / math.log(2.0), 4)
          .as("word_entropy"))
  }

  /** The A-ES key `ln(u)/w` with
    * `u = (((xxhash64(id, seed) & MaxLong) >>> 11) + 0.5) / 2^52` —
    * the masked hash keeps its top 52 bits, so the +0.5 shift and the power-of-two
    * division are both EXACT in double and `u ∈ (0,1)` strictly (a
    * plain `/2^63` form rounds hashes near 2^63 up to u = 1.0 →
    * `ln(u) = 0`, the global-maximum key, breaking the
    * inclusion-∝-weight contract for ~1-in-2^53 rows). ONE definition
    * shared by [[weightedSample]] and the q123 exact-top-k
    * verification, so they cannot drift. */
  def esKey(id: Column, weight: Column, seed: Long): Column = {
    val u = (shiftrightunsigned(
      xxhash64(id, lit(seed)).bitwiseAND(lit(Long.MaxValue)), 11)
      .cast("double") + lit(0.5)) / lit(4.503599627370496E15) // 2^52
    log(u) / weight.cast("double")
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    * 2006, algorithm A-ES): each row gets the key `ln(u)/w` for a
    * per-row uniform `u ∈ (0,1)`, and the k largest keys are an exact
    * weighted-without-replacement draw — inclusion probability
    * proportional to weight, no sequential pass, no rejection. The
    * missing slot in the sampling family: q26 uniform, q78/q88
    * budget/mixture prefixes, q90 stratified, q103 k-per-group are all
    * either uniform or quota-based; this one is importance-weighted
    * (the "sample documents ∝ quality score" recipe from the DoReMi /
    * DSIR lineage).
    *
    * RNG-free like every sampler here: `u` derives from
    * `xxhash64(id, seed)` (see [[esKey]]), so the draw is reproducible
    * row-for-row and a re-run with a different `seed` is an
    * independent draw.
    *
    * Scale shape: one scan computing (key, id), then [[graft.ops.TopKAgg]]
    * — k rows per map task, `O(k·partitions)` on the wire, never a
    * global sort. Rows with null id or null/non-positive weight are
    * excluded (a zero-weight row must never be drawn); an id that is
    * NOT castable to long raises at runtime — a silent null key would
    * otherwise vanish through the final join and return an empty
    * "sample" (the null-key-join sharp edge).
    *
    * @return (doc, weight, key) for the k selected rows.
    */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, "weighted sample size must be positive")
    val docId = col(idCol).cast("long")
    val keyed = df
      .filter(col(idCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .select(
        when(docId.isNull, raise_error(lit(
          s"weightedSample: id column '$idCol' is not castable to long")))
          .otherwise(docId).as("doc"),
        col(weightCol).cast("double").as("weight"),
        esKey(col(idCol), col(weightCol), seed).as("key"))
    val top = graft.ops.TopKAgg.topK(k)
    val sel = keyed.agg(top(col("key"), col("doc")).as("tk"))
      .select(explode(col("tk")).as("hit"))
      .select(col("hit._2").as("doc"), col("hit._1").as("key"))
    // re-attach weights with the k-row side broadcast — the corpus
    // streams, nothing re-shuffles
    broadcast(sel).join(keyed.select(col("doc"), col("weight")), Seq("doc"))
      .select(col("doc"), col("weight"), col("key"))
  }
}

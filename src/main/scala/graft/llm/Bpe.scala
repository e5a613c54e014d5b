package graft.llm

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subword (BPE) vocabulary training + encode — Sennrich et al. 2016,
  * "Neural Machine Translation of Rare Words with Subword Units": learn
  * `numMerges` symbol-pair merge rules from corpus word frequencies,
  * then segment text into subword tokens by applying the merges
  * greedily (lowest rank first). Complements [[Text.vocabulary]]
  * (q108): that builds WORD vocabularies; real tokenizer pipelines
  * need the subword inventory that covers rare words by character
  * fallback.
  *
  * Scale shape — the model-sized-object rule: the corpus-sized pass is
  * ONE combiner-friendly word-count aggregation (the q108/q17 shape,
  * words shuffle once as (word, count)); merge learning runs
  * driver-side on the word-frequency DICTIONARY, capped at `maxWords`
  * entries by (freq desc, word asc) — bounded like the PQ/IVFPQ 16k
  * training sample, and exactly how the public subword-nmt reference
  * learns (from a collected word-freq dict, not by re-scanning text
  * per merge: each of the `numMerges` iterations only re-counts pairs
  * over the dict). The merge table IS the model; the distributed
  * encode pass ships it as a foldable plan literal into the codegen'd
  * `graft_bpe_tokens` expression ([[graft.plans.BpeTokensF]]) — no UDF,
  * no broadcast handle, corpus rows never leave whole-stage codegen.
  *
  * Determinism: every step picks the pair with (count desc, pair asc)
  * total order, so the merge sequence is reproducible across runs,
  * partitionings, and engines (the q116 oracle's first invariant).
  *
  * Conventions: words are space-split; each word's symbol sequence is
  * its characters plus a final `</w>` end-of-word marker (reserved —
  * corpus text must not contain the literal marker), so
  * [[decode]] ∘ [[encodeText]] reconstructs text exactly, including
  * repeated separators. Training stops early when no pair occurs ≥ 2
  * times (merging singleton pairs would just memorize the dict tail).
  */
object Bpe {

  val EndOfWord = "</w>"

  private[graft] def wordSymbols(w: String): Array[String] = {
    // split by CODE POINT, not Java char: a lone surrogate half from a
    // split pair is not a valid string — UTF8String would mangle it to
    // replacement bytes in the codegen kernel, breaking kernel/driver
    // parity and byte-exact decode∘encode on any non-BMP character
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length + 1)
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      val n = Character.charCount(cp)
      out += w.substring(i, i + n)
      i += n
    }
    out += EndOfWord
    out.toArray
  }

  /** Learn up to `numMerges` merge rules from a word-frequency dict.
    * Deterministic: each step merges the (count desc, pair asc)-first
    * pair across the dict, rewriting all adjacent occurrences
    * left-to-right (the Sennrich reference semantics). Stops early when
    * the best pair occurs < 2 times.
    */
  private[graft] def learnMerges(wordFreq: Seq[(String, Long)],
                                 numMerges: Int): Vector[(String, String)] = {
    var words: Array[(Array[String], Long)] =
      wordFreq.iterator.map { case (w, f) => (wordSymbols(w), f) }.toArray
    val merges = Vector.newBuilder[(String, String)]
    var step = 0
    var exhausted = false
    while (step < numMerges && !exhausted) {
      val pc = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pc.update(p, pc.getOrElse(p, 0L) + f)
          i += 1
        }
      }
      if (pc.isEmpty) exhausted = true
      else {
        val best = pc.minBy { case ((a, b), c) => (-c, a, b) }
        if (best._2 < 2L) exhausted = true
        else {
          val (a, b) = best._1
          merges += best._1
          words = words.map { case (syms, f) =>
            (mergePair(syms, a, b), f)
          }
          step += 1
        }
      }
    }
    merges.result()
  }

  /** Rewrite all adjacent (a, b) occurrences to the fused symbol,
    * left-to-right (so "x x x" under merge (x,x) → "xx x"). */
  private[graft] def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Greedy BPE apply: repeatedly merge the lowest-rank adjacent pair
    * (leftmost on rank ties — the left-to-right order training used)
    * until no adjacent pair has a learned rank. */
  private[graft] def encodeWord(w: String,
                                ranks: Map[(String, String), Int]): Array[String] = {
    var syms = wordSymbols(w)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = i }
        i += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms = syms.take(bestIdx) ++
          Array(syms(bestIdx) + syms(bestIdx + 1)) ++ syms.drop(bestIdx + 2)
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  private[graft] def ranksOf(merges: Seq[(String, String)]): Map[(String, String), Int] =
    merges.iterator.zipWithIndex.map { case (p, i) => p -> i }.toMap

  /** Encode a whole text: space-split, per-word greedy apply,
    * concatenated. The JVM kernel `graft_bpe_tokens` delegates to. */
  private[graft] def encodeText(text: String,
                                ranks: Map[(String, String), Int]): Array[String] = {
    val words = text.split(" ", -1)
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < words.length) { out ++= encodeWord(words(i), ranks); i += 1 }
    out.toArray
  }

  /** Exact inverse of [[encodeText]]: every word contributes exactly one
    * trailing [[EndOfWord]], so dropping the final separator restores
    * the text byte-exact (repeated separators included). */
  def decode(tokens: Seq[String]): String = {
    val s = tokens.mkString("").replace(EndOfWord, " ")
    if (s.isEmpty) s else s.substring(0, s.length - 1)
  }

  /** Train merge rules on a corpus column. ONE distributed word-count
    * aggregation; the dict collect is bounded at `maxWords` rows by
    * (freq desc, word asc) — deterministic, model-sized. */
  /** Reserved-marker guard riding the existing scan: text containing
    * the literal `</w>` would train/encode without error but
    * decode∘encode would silently return DIFFERENT text (the in-word
    * marker becomes a space) — fail loudly instead, the
    * checkedSig/prefixSum discipline (r17 review). Null text passes
    * through (contains → null → otherwise). */
  private def checkedText(text: Column): Column =
    when(text.contains(EndOfWord),
      raise_error(lit(s"bpe: text contains the reserved end-of-word " +
        s"marker '$EndOfWord' — the decode/encode round trip would " +
        "silently corrupt; strip or escape it upstream")))
      .otherwise(text)

  def train(df: DataFrame, textCol: String, numMerges: Int,
            maxWords: Int = 5000): Vector[(String, String)] = {
    require(numMerges > 0 && maxWords > 0, "bpe: numMerges/maxWords must be positive")
    val wf = df.select(explode(split(checkedText(col(textCol)), " ")).as("w"))
      .filter(col("w") =!= "" && col("w").isNotNull)
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .toSeq
    learnMerges(wf, numMerges)
  }

  /** Distributed encode: (doc, tokens, n_tokens) through the codegen'd
    * `graft_bpe_tokens` expression; the merge table rides as a foldable
    * `array<array<string>>` literal (rank = index). Null text yields
    * null tokens, like the other per-row text ops. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: Seq[(String, String)]): DataFrame = {
    val mergeLit = typedLit(merges.map(p => Seq(p._1, p._2)))
    df.select(col(idCol).as("doc"),
      call_function("graft_bpe_tokens", checkedText(col(textCol)), mergeLit).as("tokens"))
      .withColumn("n_tokens",
        // size(null) is -1 here, not null: Graft sessions run with
        // spark.sql.ansi.enabled=false, which flips the implied
        // spark.sql.legacy.sizeOfNull default to true (probed
        // empirically this session) — propagate the null explicitly
        when(col("tokens").isNull, lit(null))
          .otherwise(size(col("tokens"))).cast("long"))
  }

  /** Column form of the subword-token COUNT alone — for consumers that
    * budget by tokens without materializing them ([[Curate.tokenPack]]):
    * the kernel runs once per row inside whole-stage codegen and only
    * the size survives the projection. Null text → null count (the
    * [[encode]] sizeOfNull note). */
  def tokenCount(text: Column, merges: Seq[(String, String)]): Column = {
    val mergeLit = typedLit(merges.map(p => Seq(p._1, p._2)))
    val toks = call_function("graft_bpe_tokens", checkedText(text), mergeLit)
    when(toks.isNull, lit(null)).otherwise(size(toks)).cast("long")
  }
}

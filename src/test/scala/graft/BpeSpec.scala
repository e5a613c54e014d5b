package graft

import org.apache.spark.sql.functions._
import graft.llm.Bpe

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("learnMerges: the Sennrich worked example, deterministic order") {
    // the classic dict from the paper's running example
    val dict = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.learnMerges(dict, 4)
    // pair counts step 1: (e,s)=9, (s,t)=9, (t,</w>)=9, (w,e)=8 ... —
    // count ties broken by pair asc, so (e,s) wins, then (es,t), then
    // (est,</w>), then the 8s: (l,o)=7,(o,w)=7,(w,e)... recount after
    // merges: (l,o)=7, (o,w)=7, (n,e)=6, (w,i)=3 ... top is 7 tie →
    // (l,o) before (o,w) lexicographically
    assert(merges == Vector("e" -> "s", "es" -> "t", "est" -> "</w>", "l" -> "o"))
    // deterministic: same input, same sequence
    assert(Bpe.learnMerges(dict, 4) == merges)
  }

  test("learnMerges stops when no pair repeats") {
    val merges = Bpe.learnMerges(Seq("ab" -> 1L, "cd" -> 1L), 100)
    assert(merges.isEmpty) // every pair occurs once — nothing to learn
    // and a single repeated word merges down to one symbol then stops
    // (tie (a,a)=3 vs (a,</w>)=3 → pair-asc picks (a,</w>): '<' < 'a')
    val m2 = Bpe.learnMerges(Seq("aa" -> 3L), 100)
    assert(m2 == Vector("a" -> "</w>", "a" -> "a</w>"))
  }

  test("encodeWord reproduces merges greedily; unseen chars fall back to singles") {
    val ranks = Bpe.ranksOf(Vector("e" -> "s", "es" -> "t", "est" -> "</w>", "l" -> "o"))
    assert(Bpe.encodeWord("newest", ranks).toSeq ==
      Seq("n", "e", "w", "est</w>"))
    assert(Bpe.encodeWord("lowest", ranks).toSeq == Seq("lo", "w", "est</w>"))
    // a word with none of the learned pairs stays character-level
    assert(Bpe.encodeWord("zq", ranks).toSeq == Seq("z", "q", "</w>"))
  }

  test("decode inverts encodeText byte-exact, repeated separators included") {
    val ranks = Bpe.ranksOf(Vector("a" -> "b", "ab" -> "</w>"))
    for (t <- Seq("ab ab cd", "ab", "", "a  b", "ab cd ", " ab")) {
      assert(Bpe.decode(Bpe.encodeText(t, ranks).toSeq) == t, s"roundtrip of '$t'")
    }
  }

  test("train + distributed encode: kernel/Column parity, counts, roundtrip") {
    val docs = Seq(
      (1L, "the lowest bid was the newest bid"),
      (2L, "newest lowest widest"),
      (3L, "the the the low low"),
      (4L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 20)
    assert(merges.nonEmpty && merges == Bpe.train(docs, "text", numMerges = 20))
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy($"doc").as[(Long, Seq[String], Long)].collect().toSeq
    val ranks = Bpe.ranksOf(merges)
    enc.foreach { case (d, toks, n) =>
      val text = Seq("the lowest bid was the newest bid",
        "newest lowest widest", "the the the low low", "")(d.toInt - 1)
      assert(toks == Bpe.encodeText(text, ranks).toSeq, s"doc $d kernel/Column parity")
      assert(n == toks.length.toLong)
      assert(Bpe.decode(toks) == text, s"doc $d roundtrip")
    }
    // null text → null tokens, null count (per-row text op convention)
    val withNull = Seq((9L, Option.empty[String])).toDF("doc_id", "text")
    val r = Bpe.encode(withNull, "doc_id", "text", merges).collect()(0)
    assert(r.isNullAt(1) && r.isNullAt(2))
  }

  test("non-BMP characters survive encode/decode and kernel/Column parity") {
    // code-point split: a Java-char split would break the surrogate
    // pair and UTF8String would mangle the lone halves to '?'
    val emoji = new String(Character.toChars(0x1F600)) // astral plane
    val text = s"ab $emoji$emoji cd $emoji"
    val docs = Seq((1L, text), (2L, s"$emoji$emoji $emoji$emoji")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 10)
    val ranks = Bpe.ranksOf(merges)
    assert(Bpe.decode(Bpe.encodeText(text, ranks).toSeq) == text)
    // every driver token is a well-formed string (no lone surrogates)
    Bpe.encodeText(text, ranks).foreach { t =>
      assert(!t.exists(c => Character.isSurrogate(c) &&
        (t.length == 1 || !Character.isHighSurrogate(t.head) && t.length < 2)))
      assert(t.codePointCount(0, t.length) >= 1)
    }
    val got = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy($"doc").as[(Long, Seq[String], Long)].collect()
    assert(got(0)._2 == Bpe.encodeText(text, ranks).toSeq, "kernel/Column parity on non-BMP")
    assert(Bpe.decode(got(0)._2) == text)
  }

  test("graft_bpe_tokens rejects a non-foldable merges column at analysis (ADVICE r15)") {
    // the rank memo is keyed on the literal's object identity — a
    // per-row merges column could reuse a buffer object with different
    // contents and return stale ranks, so non-constants are rejected
    val df = Seq(("ab", Seq(Seq("a", "b")))).toDF("text", "merges")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(call_function("graft_bpe_tokens", $"text", $"merges")).collect()
    }
    assert(e.getMessage.contains("foldable"))
    // and the literal form still works (parity with the driver encoder)
    val ok = df.select(call_function("graft_bpe_tokens", $"text",
      typedLit(Seq(Seq("a", "b")))).as("t")).as[Seq[String]].head()
    assert(ok == Bpe.encodeText("ab", Map(("a", "b") -> 0)).toSeq)
  }

  test("tokenPack: bins assigned by TRUE subword counts, chunk-exact vs driver replay") {
    // 3 docs, chunkWords=2/stride=1 → chunks are word pairs (tail
    // anchored); merges learned from the corpus itself; budget 8 tokens
    val docs = Seq(
      (1L, "low low lower"),
      (2L, "newest widest"),
      (3L, null.asInstanceOf[String]), // excluded: cannot be budgeted
      (4L, "low")
    ).toDF("doc_id", "text")
    val merges = Bpe.train(docs, "text", numMerges = 6)
    val ranks = Bpe.ranksOf(merges)
    val got = graft.llm.Curate.tokenPack(docs, "doc_id", "text", merges,
        chunkWords = 2, stride = 1, seqTokens = 8L)
      .orderBy($"doc", $"chunk_id")
      .select($"doc", $"chunk_id", $"chunk_text", $"n_tokens", $"cum_tokens", $"bin")
      .as[(Long, Long, String, Long, Long, Long)].collect()
    // driver replay: same chunking rule, driver encode, running sum
    val chunksWant = Seq(
      (1L, 0L, "low low"), (1L, 1L, "low lower"),
      (2L, 0L, "newest widest"), (4L, 0L, "low"))
    var cum = 0L
    val want = chunksWant.map { case (d, c, txt) =>
      val n = Bpe.encodeText(txt, ranks).length.toLong
      cum += n
      (d, c, txt, n, cum, (cum - n) / 8L)
    }
    assert(got.toSeq == want)
    // tokenizer-awareness: at least one chunk's subword count differs
    // from its whitespace word count (else this test proves nothing)
    assert(want.exists { case (_, _, txt, n, _, _) =>
      n != txt.split(" ", -1).length.toLong })
  }

  test("multi-char BPE tokens only ever come from learned merges") {
    // invariant behind q116's all_oov_single_char check: encoding ANY
    // text under a merge table can only produce multi-char symbols that
    // are concatenations recorded in the table
    val merges = Bpe.train(Seq((1L, "banana bandana")).toDF("id", "text"), "text", 10)
    val inventory = merges.map { case (a, b) => a + b }.toSet
    val toks = Bpe.encodeText("bananas and bandanas unseen", Bpe.ranksOf(merges))
    toks.filter(t => t.length > 1 && t != Bpe.EndOfWord).foreach { t =>
      assert(inventory.contains(t), s"unlearned multi-char token '$t'")
    }
  }
}

/** r17 review regressions for Bpe and the llm-layer entry guards. */
class LlmGuardsR17Spec extends SparkSuite {
  import spark.implicits._

  test("text containing the reserved </w> marker fails loudly at encode") {
    val merges = graft.llm.Bpe.train(
      Seq("clean words only here").toDF("text"), "text", numMerges = 5)
    val bad = Seq((1L, "escaped html with </w> inside")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.llm.Bpe.encode(bad, "doc_id", "text", merges).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("reserved"), e.getMessage)
    // null text still passes through as null tokens
    val ok = graft.llm.Bpe.encode(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text", merges).collect()(0)
    assert(ok.isNullAt(1) && ok.isNullAt(2))
  }

  test("incrementalCurate works when idCol is literally named 'id' (r17 review)") {
    val good = (1 to 60).map(i => s"w$i").mkString(" ")
    val novel = (1 to 60).map(i => s"z$i").mkString(" ")
    val storeDocs = Seq((2L, good)).toDF("id", "text")
    val fpStore = storeDocs.select(
      xxhash64($"text").as("fp_a"),
      xxhash64(lit("graft-fp2"), $"text").as("fp_b"))
    val sigStore = graft.llm.Dedup.minhashSignatures(storeDocs, "id", "text")
      .persist()
    sigStore.count()
    val batch = Seq((11L, good), (21L, novel)).toDF("id", "text")
    try {
      val got = graft.llm.Curate.incrementalCurate(
          batch, "id", "text", fpStore, sigStore, threshold = 0.5)
        .select($"id").as[Long].collect().toSet
      assert(got == Set(21L), got) // pre-fix: AMBIGUOUS_REFERENCE crash
    } finally {
      graft.dsl.Rel.releaseTracked(); sigStore.unpersist()
    }
  }

  test("trainLogReg ignores null-text rows: model equals training on the filtered corpus") {
    val base = (1 to 40).map(i =>
      (i.toLong, s"w$i " + (if (i % 2 == 0) "spark good" else "noise bad"), i % 2))
    val withNulls = base ++ Seq((98L, null.asInstanceOf[String], 1),
      (99L, null.asInstanceOf[String], 1))
    val m1 = graft.llm.Classifier.trainLogReg(
      base.toDF("doc_id", "text", "label"), "doc_id", "text", "label",
      dim = 64, iters = 3)
    graft.dsl.Rel.releaseTracked()
    val m2 = graft.llm.Classifier.trainLogReg(
      withNulls.toDF("doc_id", "text", "label"), "doc_id", "text", "label",
      dim = 64, iters = 3)
    graft.dsl.Rel.releaseTracked()
    assert(m1.bias == m2.bias && m1.weights.toSeq == m2.weights.toSeq,
      s"null-text rows moved the model: bias ${m1.bias} vs ${m2.bias}")
  }

  test("sampleFrames: zero frameBytes refuses; empty payload emits no frames") {
    val media = Seq((1L, Array[Byte](1, 2, 3, 4, 5)),
      (2L, Array.empty[Byte]), (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("media_id", "payload")
    intercept[IllegalArgumentException] {
      graft.llm.Multimodal.sampleFrames(media, frameBytes = 0)
    }
    val got = graft.llm.Multimodal.sampleFrames(media, frameBytes = 2, everyN = 1)
      .select($"media_id").as[Long].collect().toSeq
    assert(got.forall(_ == 1L) && got.size == 3, got) // ceil(5/2) frames, ids 2/3 none
  }

  test("bm25TopK rejects non-integral doc ids with a clear message") {
    val docs = Seq(("a", "hello world")).toDF("doc_id", "text")
    val qs = Seq((1, "hello")).toDF("qid", "term")
    val e = intercept[IllegalArgumentException] {
      graft.llm.Retrieval.bm25TopK(docs, "doc_id", "text", qs, 5)
    }
    assert(e.getMessage.contains("integral doc ids"), e.getMessage)
  }
}

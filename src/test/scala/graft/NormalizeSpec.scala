package graft

import org.apache.spark.sql.functions._
import graft.llm.Text

/** graft_normalize: NFKC + lowercase + accent-strip + ws-collapse. */
class NormalizeSpec extends SparkSuite {
  import spark.implicits._

  private def norm(ss: String*): Seq[String] =
    ss.toDF("t").select(Text.normalize($"t")).as[String].collect().toSeq

  test("accents strip, case folds, compatibility forms expand") {
    assert(norm("Café") == Seq("cafe"))
    assert(norm("ÀÉÎÕÜ ñ ç Śś") == Seq("aeiou n c ss"))
    assert(norm("ﬁsh ＦＵＬＬｗｉｄｔｈ") == Seq("fish fullwidth"))
    assert(norm("Straße") == Seq("straße")) // ß is not a mark, survives
  }

  test("whitespace runs collapse; leading/trailing trim; empty stays empty") {
    assert(norm("  a\t\n b   c  ") == Seq("a b c"))
    assert(norm("") == Seq(""))
    assert(norm(" \t ") == Seq(""))
  }

  test("non-BMP code points survive (surrogate-pair safety)") {
    assert(norm("𝄞  Clef 🎵") == Seq("𝄞 clef 🎵"))
  }

  test("null propagates") {
    val out = Seq[(Integer, String)]((1, null)).toDF("i", "t")
      .select(Text.normalize($"t")).collect()(0)
    assert(out.isNullAt(0))
  }

  test("idempotent on arbitrary strings") {
    val rnd = new scala.util.Random(13)
    // code-point pool (no lone surrogate halves from char indexing) —
    // extended beyond Latin after the r16 advice pass: Hangul syllables
    // (NFD → conjoining jamo, category Lo, NOT stripped) and Devanagari/
    // Bengali spacing combining marks (Mc, NOT stripped; Bengali ো has
    // a two-Mc canonical decomposition NFC recomposes), plus precomposed
    // Hangul and a standalone jamo sequence
    val pool = Vector("a", "A", " ", "é", "É", "\t", "ﬁ", "𝄞", "ñ", "Ü", ".", "z", "!",
      "한", "글", "가", "가", "क", "का", "ो", "ো", "দো")
    val strs = Seq.fill(120)(
      (0 until rnd.nextInt(30)).map(_ => pool(rnd.nextInt(pool.size))).mkString)
    val once = norm(strs: _*)
    val twice = norm(once: _*)
    assert(once == twice)
  }

  test("output is NFC-composed (Hangul recomposes after jamo round-trip)") {
    // without the final NFC pass the kernel left conjoining jamo
    // decomposed, so a second pass's NFKC changed the string
    val out = norm("한글 Programming  ÇAFÉ", "가나다")
    assert(out == Seq("한글 programming cafe", "가나다"))
    out.foreach { s =>
      assert(java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC))
    }
  }
}

package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import graft.llm.Dedup
import graft.ops.TopKAgg

/** ScalaCheck properties for the JVM kernels whose distributed
  * correctness depends on algebraic laws (partition order must not
  * matter) — the Aggregator/combiner contract the reference encodes as
  * `Algebraic` UDFs [R: src/org/apache/pig/EvalFunc.java].
  */
object KernelPropsSpec extends Properties("kernels") {

  private val pairGen = Gen.zip(Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(0L, 1000L))
  private val pairsGen = Gen.listOf(pairGen)

  // TopKAgg takes boxed input since r17 (NULL scores/ids skip instead
  // of aborting the stage); the properties drive it with primitives
  private def red(agg: TopKAgg)(b: graft.ops.TopKBuf, x: (Double, Long)) =
    agg.reduce(b, (x._1, x._2))

  // buffers are mutable-array-backed (TopKBuf) — compare observable
  // output via finish, never buffer ==
  property("TopKAgg: merge is commutative") = forAll(pairsGen, pairsGen) { (xs, ys) =>
    val agg = new TopKAgg(5)
    def buf(zs: List[(Double, Long)]) = zs.foldLeft(agg.zero)(red(agg))
    agg.finish(agg.merge(buf(xs), buf(ys))) ==
      agg.finish(agg.merge(buf(ys), buf(xs)))
  }

  property("TopKAgg: any partitioning yields the sequential result") =
    forAll(pairsGen, Gen.chooseNum(1, 5)) { (xs, splits) =>
      val agg = new TopKAgg(3)
      val sequential = agg.finish(xs.foldLeft(agg.zero)(red(agg)))
      val parts = if (xs.isEmpty) Seq(xs) else xs.grouped(math.max(1, xs.size / splits)).toSeq
      val merged = parts.map(_.foldLeft(agg.zero)(red(agg))).foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == sequential
    }

  property("TopKAgg: output is the global top-k under (score desc, id asc)") =
    forAll(pairsGen) { xs =>
      val agg = new TopKAgg(4)
      val got = agg.finish(xs.foldLeft(agg.zero)(red(agg)))
      val want = xs.distinct.sortBy { case (s, i) => (-s, i) }.take(4)
      // duplicates in input are kept; compare against non-deduped sort
      val wantAll = xs.sortBy { case (s, i) => (-s, i) }.take(4)
      got == wantAll || got == want
    }

  // the r17 mutable-buffer rework must be output-identical to the r16
  // immutable-Seq form for every k, input and partitioning (the
  // HeavyHitters-rework bit-identity rule); duplicate pairs included
  private val dupPairsGen =
    Gen.listOf(Gen.zip(Gen.chooseNum(-3, 3).map(_ / 2.0), Gen.chooseNum(0L, 5L)))

  property("TopKAgg: bit-identical to the sortWith reference for any k and split") =
    forAll(dupPairsGen, Gen.chooseNum(1, 7), Gen.chooseNum(1, 5)) { (xs, k, splits) =>
      def better(a: (Double, Long), b: (Double, Long)): Boolean =
        a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
      def refInsert(buf: Seq[(Double, Long)], x: (Double, Long)) =
        if (buf.size >= k && better(buf.last, x)) buf
        else (buf :+ x).sortWith(better).take(k)
      def refMerge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]) =
        (a ++ b).sortWith(better).take(k)
      val parts = if (xs.isEmpty) Seq(xs) else xs.grouped(math.max(1, xs.size / splits)).toSeq
      val want = parts.map(_.foldLeft(Seq.empty[(Double, Long)])(refInsert))
        .foldLeft(Seq.empty[(Double, Long)])(refMerge)
      val agg = new TopKAgg(k)
      val got = agg.finish(
        parts.map(_.foldLeft(agg.zero)(red(agg))).foldLeft(agg.zero)(agg.merge))
      got == want
    }

  property("TopKAgg: NULL score or id is skipped, not a stage abort (r17 review)") =
    forAll(pairsGen) { xs =>
      val agg = new TopKAgg(4)
      val clean = agg.finish(xs.foldLeft(agg.zero)(red(agg)))
      val withNulls = agg.finish(xs.foldLeft(
        agg.reduce(agg.reduce(agg.zero, (null, 7L: java.lang.Long)),
          (1.0: java.lang.Double, null)))(red(agg)))
      clean == withNulls
    }

  // empty tokens INCLUDED: trailing/double separators must tokenize
  // identically to the Column form (Spark split keeps empties; the r14
  // full-repo review caught the kernel dropping trailing ones)
  private val wordGen = Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "d", "e", ""))
    .map(_.mkString(" "))

  property("shingleSet: distinct sliding k-grams, whole text when short") =
    forAll(wordGen, Gen.chooseNum(1, 5)) { (text, k) =>
      val words = text.split(" ", -1) // the Column-form tokenization
      val got = Dedup.shingleSet(text, k).toSeq
      val want =
        if (words.length < k) Seq(text)
        else words.sliding(k).map(_.mkString(" ")).toSeq.distinct
      got == want
    }

  property("bandKeys: deterministic and identical sets collide on all bands") =
    forAll(Gen.nonEmptyListOf(Gen.alphaStr.suchThat(_.nonEmpty))) { shingles =>
      val sh = shingles.toArray
      val k1 = Dedup.bandKeys(sh, 64, 32)
      val k2 = Dedup.bandKeys(sh.reverse.reverse, 64, 32)
      k1.toSeq == k2.toSeq && k1.length == 32
    }

  property("hash64 avalanche: distinct short strings rarely collide") =
    forAll(Gen.listOfN(50, Gen.alphaStr)) { ss =>
      val distinct = ss.distinct
      distinct.map(Dedup.hash64).distinct.size == distinct.size
    }

  property("simhashK: word order and duplicated words don't change the fingerprint") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "bb", "ccc", "dd", "e", "ff"))) { ws =>
      val t1 = ws.mkString(" ")
      val t2 = (ws.reverse ++ List(ws.head)).mkString(" ") // same distinct set
      Dedup.simhashK(t1) == Dedup.simhashK(t2)
    }

  // the prefix-filter lemma ngramJaccard's candidate generation rests
  // on (Bayardo et al. WWW'07): if J(x,y) ≥ t then x's FULL set hits
  // y's prefixLen(|y|, t)-prefix under ANY fixed total order — so
  // indexing only prefixes and probing with full sets has recall 1
  private val elemSetGen =
    Gen.nonEmptyListOf(Gen.chooseNum(0, 40)).map(_.toSet)

  property("prefix filter: a full-set probe always hits a J>=t pair's prefix") =
    forAll(elemSetGen, elemSetGen, Gen.chooseNum(0.05, 0.95)) { (x, y, t) =>
      val j = x.intersect(y).size.toDouble / x.union(y).size
      val sortedY = y.toSeq.sorted // the fixed total order
      val prefY = sortedY.take(Dedup.prefixLen(sortedY.size, t)).toSet
      j < t || x.intersect(prefY).nonEmpty
    }

  property("SignLshF kernel is bit-identical to bucketK for any vector/planes/offset") =
    forAll(Gen.listOf(Gen.chooseNum(-1.0f, 1.0f)), Gen.chooseNum(1, 16),
      Gen.chooseNum(0, 64)) { (v, planes, offset) =>
      val arr = v.toArray
      graft.plans.SignLshF.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr), planes, offset) ==
        graft.llm.Similarity.bucketK(arr, planes, offset)
    }

  // arbitrary strings over ASCII + BMP accents + supplementary-plane
  // code points — the unit split('')/ascii see is the CODE POINT, so
  // surrogate pairs must hash as one step, not two
  private val cpStringGen: Gen[String] = Gen.listOf(Gen.oneOf(
    Gen.chooseNum(0x20, 0x7e).map(_.toChar.toString),
    Gen.oneOf("é", "ß", "中", "λ"),
    Gen.oneOf("😀", "𝕏", "💩"))).map(_.mkString)

  property("FingerprintF kernel equals the code-point fold spec (incl. non-BMP)") =
    forAll(cpStringGen) { s =>
      val spec = s.codePoints().toArray
        .foldLeft(0L)((h, cp) => (h * 31L + cp) % 2147483647L)
      graft.plans.FingerprintF.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s)) == spec
    }

  // random (vec, codebook, n) cases for the IVF assignment kernel;
  // half the time a centroid row is duplicated so the (distance, index)
  // tie order is actually exercised, not just reachable
  private val cellCaseGen = for {
    dim <- Gen.chooseNum(1, 8)
    nc <- Gen.chooseNum(1, 10)
    v <- Gen.listOfN(dim, Gen.chooseNum(-1.0f, 1.0f))
    cb0 <- Gen.listOfN(nc, Gen.listOfN(dim, Gen.chooseNum(-1.0, 1.0)))
    dup <- Gen.oneOf(true, false)
    cb = if (dup && cb0.size > 1) cb0.updated(cb0.size - 1, cb0.head) else cb0
    n <- Gen.chooseNum(1, cb.size)
  } yield (v, cb, n)

  property("NearestCellsF kernel is bit-identical to nearestCells (incl. distance ties)") =
    forAll(cellCaseGen) { case (v, cb, n) =>
      val cents = cb.map(_.toArray).toArray
      val cbData = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        cents.map(a =>
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a): Any))
      val got = graft.plans.NearestCellsF.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v.toArray),
        cbData, n)
      got.toIntArray().toSeq == graft.llm.Similarity.nearestCells(v, cents, n)
    }

  // ADVICE r10: a NaN element used to leave best = -1 in the selection
  // scan (strict < never fires against a NaN) and crash the generated
  // stage with ArrayIndexOutOfBounds; the expression must instead
  // mirror the kernel's sortBy total order (NaN greatest, index ties)
  property("NearestCellsF matches the kernel on NaN/Inf distances (no crash)") = {
    val cases = Seq(
      // NaN in the vector → every distance NaN
      (Seq(Float.NaN, 1.0f), Seq(Seq(0.0, 0.0), Seq(1.0, 1.0), Seq(2.0, 2.0)), 3),
      // NaN in ONE centroid → mixed NaN / finite distances
      (Seq(0.5f, 0.5f), Seq(Seq(Double.NaN, 0.0), Seq(1.0, 1.0), Seq(0.5, 0.5)), 3),
      // infinite distances (overflowed diff²) — the old +Inf sentinel
      // also left best = -1 here
      (Seq(Float.MaxValue, 0.0f), Seq(Seq(-1.7e308, 0.0), Seq(1.7e308, 0.0)), 2))
    cases.forall { case (v, cb, n) =>
      val cents = cb.map(_.toArray).toArray
      val cbData = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        cents.map(a =>
          org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(a): Any))
      val got = graft.plans.NearestCellsF.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(v.toArray),
        cbData, n)
      got.toIntArray().toSeq == graft.llm.Similarity.nearestCells(v, cents, n)
    }
  }

  property("prefixLen is positive and never exceeds the set size") =
    forAll(Gen.chooseNum(1, 10000), Gen.chooseNum(0.01, 1.0)) { (n, t) =>
      val p = Dedup.prefixLen(n, t)
      p >= 1 && p <= n
    }
}

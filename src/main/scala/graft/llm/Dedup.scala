package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.dsl.PigFunctions.roundCompat

/** Deduplication operators for large-scale training-data pipelines.
  *
  * The reference has only whole-tuple DISTINCT
  * [R: …/relationalOperators/PODistinct.java]; these extend that to the
  * document-dedup family a 100 TB text pipeline needs. All variants are
  * pure DataFrame/HOF compositions (no UDFs): per-row shingling and
  * signatures stay inside whole-stage codegen, and the only shuffles are
  * the candidate-pair groupBys — the minimum any LSH scheme needs.
  *
  * Scale design: signatures are computed per-row (map-side, no shuffle);
  * candidate generation shuffles (band_key) pairs — tiny rows — not the
  * documents; verification re-joins the shingle sets by doc id rather
  * than carrying them through the shuffle.
  */
object Dedup {

  /** Exact dedup by key columns: one surviving row id per group plus the
    * duplicate count (hash-aggregate; fully combiner-friendly).
    */
  def exact(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col).toIndexedSeq: _*)
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** k-word shingle set of a whitespace-tokenized text column; documents
    * shorter than k words contribute their whole text as one shingle.
    */
  def shingles(text: Column, k: Int = 3): Column = {
    val words = split(text, " ")
    val grams = transform(
      sequence(lit(0), greatest(size(words) - k, lit(0))),
      i => concat_ws(" ", slice(words, i + 1, lit(k))))
    array_distinct(when(size(words) >= k, grams).otherwise(array(text)))
  }

  /** MinHash signature: numHashes independent hash functions, each the
    * min over the shingle set of xxhash64(seed_i, shingle). Computed as
    * nested array HOFs — one pass over the row, no explode, no shuffle.
    */
  def minhashSignature(shinglesCol: Column, numHashes: Int = 64): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shinglesCol, s => xxhash64(i, s))))

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: shingle → signature → band keys → explode bands →
    * group docs per (band, key) → same-bucket pairs → exact-Jaccard
    * verification ≥ threshold. The emitted pairs are exact (every
    * candidate is verified); LSH only bounds recall.
    *
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard in [0,1].
    */
  def minhashLsh(df: DataFrame, idCol: String, textCol: String,
                 shingleK: Int = 3, numHashes: Int = 64, bands: Int = 16,
                 threshold: Double = 0.9): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands

    val shingled = df.select(
      col(idCol).as("doc"),
      shingles(col(textCol), shingleK).as("sh"))

    val sig = shingled.select(
      col("doc"), col("sh"),
      minhashSignature(col("sh"), numHashes).as("sig"))

    // band key = hash of the band's signature slice; explode to (band, key, doc)
    val banded = sig.select(
      col("doc"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(col("sig"), b * rows + 1, lit(rows))))))
      .toDF("doc", "band", "key")

    // same-bucket candidate pairs (small rows through the shuffle)
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .distinct()

    // verification: fetch shingle sets by id, exact Jaccard
    val withSets = cand
      .join(shingled.withColumnRenamed("doc", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
      .join(shingled.withColumnRenamed("doc", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")

    withSets
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b")))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash: 64-bit fingerprint — per bit, sign of the sum over tokens
    * of ±1 weighted by whether the token's hash has that bit set.
    * Near-dups = fingerprints within `maxHamming`; candidates via 4
    * 16-bit band buckets (any pair with hamming ≤ 3 shares ≥ 1 band).
    */
  def simhash(text: Column): Column = {
    val words = array_distinct(split(text, " "))
    val hashes = transform(words, w => xxhash64(w))
    // bit j of fingerprint = 1 if sum over tokens of (bit_j ? 1 : -1) > 0
    val bits = transform(sequence(lit(0), lit(63)), j =>
      when(aggregate(hashes, lit(0L),
        (acc, h) => acc + when(call_function("shiftright", h, j).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)) > 0, 1L)
        .otherwise(0L))
    aggregate(sequence(lit(0), lit(63)), lit(0L),
      (acc, j) => acc + element_at(bits, j + 1) * call_function("shiftleft", lit(1L), j))
  }

  private def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming distance ≤ maxHamming (≤ 3 with
    * the 4-band scheme guarantees exact candidate recall). */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-band scheme guarantees recall only for hamming <= 3")
    val fp = df.select(col(idCol).as("doc"), simhash(col(textCol)).as("fp"))
    val banded = fp.select(col("doc"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(3)),
        b => call_function("shiftright", col("fp"), b * 16).bitwiseAND(0xFFFFL))))
      .toDF("doc", "fp", "band", "key")
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        hamming(col("a.fp"), col("b.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exhaustive n-gram Jaccard within a blocking key (e.g. source):
    * exact pairwise similarity, blocked to stay sub-quadratic. */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   blockCol: String, k: Int = 3, minJaccard: Double = 0.1): DataFrame = {
    val s = df.select(col(blockCol).as("blk"), col(idCol).as("doc"),
      shingles(col(textCol), k).as("sh"))
    s.as("a").join(s.as("b"),
        col("a.blk") === col("b.blk") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        (size(array_intersect(col("a.sh"), col("b.sh"))).cast("double") /
          size(array_union(col("a.sh"), col("b.sh")))).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Embedding near-dup: pairs with cosine ≥ threshold, candidates from
    * sign-LSH buckets (see [[Similarity.lshBucket]]), verified exactly.
    */
  def embeddingNearDup(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double = 0.95, planes: Int = 8): DataFrame = {
    val b = df.select(col(idCol).as("doc"), col(vecCol).as("v"),
      Similarity.lshBucket(col(vecCol), planes).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("id_a"), col("b.doc").as("id_b"),
        roundCompat(Similarity.cosine(col("a.v"), col("b.v")), 6).as("cosine"))
      .filter(col("cosine") >= threshold)
  }
}

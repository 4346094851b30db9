package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora.
  *
  * Scale shape: every variant reduces to (signature → band → hash-partition
  * join on band keys), the standard MinHash-LSH factoring — the only shuffle
  * is the groupBy/join on band buckets; signatures are computed map-side with
  * no driver involvement. Hot buckets (boilerplate-heavy corpora) are the
  * skew risk; `candidatePairs` caps bucket width defensively.
  */
object Dedup {

  /** Exact dedup: representative per md5(text) group. */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("rep_id"))

  // -------------------------------------------------------------------
  // MinHash

  /** 64-bit hash of one shingle (word n-gram), FNV-1a over chars. */
  def shingleHash(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  /** Word shingles of width `n` (whole text as one shingle when shorter). */
  def shingles(text: String, n: Int): Array[Long] = {
    val words = text.split(' ')
    if (words.length < n) Array(shingleHash(text))
    else {
      val out = new Array[Long](words.length - n + 1)
      var i = 0
      while (i + n <= words.length) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(words(i + j)); j += 1 }
        out(i) = shingleHash(sb.toString)
        i += 1
      }
      out
    }
  }

  private val MersennePrime = (1L << 61) - 1

  /** k-permutation MinHash signature over the shingle set. Seeded linear
    * hashes h_i(x) = (a_i * x + b_i) mod 2^61-1, deterministic in `seed`.
    */
  def minhashSignature(text: String, k: Int, shingleN: Int, seed: Long): Array[Long] = {
    val sh = shingles(text, shingleN)
    val sig = Array.fill(k)(Long.MaxValue)
    val rnd = new java.util.Random(seed)
    val as = Array.fill(k)(rnd.nextLong() & Long.MaxValue | 1L)
    val bs = Array.fill(k)(rnd.nextLong() & Long.MaxValue)
    var i = 0
    while (i < sh.length) {
      val x = sh(i) & Long.MaxValue
      var j = 0
      while (j < k) {
        val h = (as(j) * x + bs(j)) % MersennePrime
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  final case class MinhashSig(doc_id: Long, sig: Seq[Long])
  final case class BandRow(doc_id: Long, band: Int, band_hash: Long)

  def minhashSignatures(docs: DataFrame, k: Int = 64, shingleN: Int = 3,
                        seed: Long = 42L,
                        idCol: String = "doc_id", textCol: String = "text"): Dataset[MinhashSig] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        MinhashSig(id, minhashSignature(if (text == null) "" else text, k, shingleN, seed))
      })
  }

  /** LSH banding: signature rows → (doc, band, band-hash) — the join key. */
  def lshBands(sigs: Dataset[MinhashSig], bands: Int): Dataset[BandRow] = {
    val spark = sigs.sparkSession
    import spark.implicits._
    sigs.flatMap { s =>
      val rowsPerBand = s.sig.length / bands
      (0 until bands).iterator.map { b =>
        var h = 0xcbf29ce484222325L
        var j = b * rowsPerBand
        while (j < (b + 1) * rowsPerBand) {
          h ^= s.sig(j); h *= 0x100000001b3L; j += 1
        }
        BandRow(s.doc_id, b, h)
      }
    }
  }

  /** Candidate near-duplicate pairs: docs sharing any LSH band bucket.
    * `maxBucket` drops degenerate buckets (all-identical boilerplate) that
    * would otherwise explode quadratically — the dropped buckets are exact
    * duplicates by construction and are caught by [[exactGroups]].
    */
  def candidatePairs(bandRows: Dataset[BandRow], maxBucket: Int = 64): DataFrame = {
    val buckets = bandRows.groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))
    buckets.select(explode(expr(
      "filter(transform(flatten(transform(ids, a -> transform(ids, b -> struct(a, b)))), p -> p), p -> p.a < p.b)"
    )).as("p"))
      .select(col("p.a").as("id_a"), col("p.b").as("id_b"))
      .distinct()
  }

  /** Exact Jaccard over word n-gram shingle sets, for verifying candidates. */
  def jaccard(a: String, b: String, shingleN: Int = 3): Double = {
    val sa = shingles(a, shingleN).toSet
    val sb = shingles(b, shingleN).toSet
    if (sa.isEmpty && sb.isEmpty) 1.0
    else sa.intersect(sb).size.toDouble / sa.union(sb).size.toDouble
  }

  // -------------------------------------------------------------------
  // SimHash

  /** 64-bit SimHash over word hashes (bit-vote aggregation). */
  def simhash64(text: String): Long = {
    val votes = new Array[Int](64)
    if (text != null) text.split(' ').foreach { w =>
      val h = shingleHash(w)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  final case class SimhashRow(doc_id: Long, simhash: Long)

  def simhashes(docs: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): Dataset[SimhashRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol)).as[(Long, String)]
      .mapPartitions(_.map { case (id, t) => SimhashRow(id, simhash64(t)) })
  }

  /** Near-dup pairs with Hamming distance <= maxHamming, found by the
    * pigeonhole banding trick: split 64 bits into (maxHamming+1) chunks —
    * any pair within distance must agree on at least one chunk → join on
    * (chunk index, chunk value), then verify distance exactly.
    */
  def simhashPairs(rows: Dataset[SimhashRow], maxHamming: Int = 3): DataFrame = {
    val spark = rows.sparkSession
    import spark.implicits._
    val chunks = maxHamming + 1
    val width = 64 / chunks
    val keyed = rows.flatMap { r =>
      (0 until chunks).iterator.map { c =>
        (r.doc_id, r.simhash, c, (r.simhash >>> (c * width)) & ((1L << width) - 1))
      }
    }.toDF("doc_id", "simhash", "chunk", "chunk_val")
    keyed.as("a").join(keyed.as("b"),
        col("a.chunk") === col("b.chunk") &&
        col("a.chunk_val") === col("b.chunk_val") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(expr("a.simhash").bitwiseXOR(expr("b.simhash"))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }
}

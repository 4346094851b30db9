package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale shape: the query set is broadcast (small side), each base partition
  * computes a bounded per-partition top-k with a heap (map-side combine for
  * top-k), and only `partitions * queries * k` candidate rows enter the final
  * shuffle — never the full similarity matrix. The LSH variant adds a
  * hyperplane bucket key so, at 100 TB, base vectors hash-partition by bucket
  * and a query only scans matching buckets.
  */
object Similarity {

  final case class Neighbor(query_id: Long, neighbor_id: Long, sim: Double)

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Exact brute-force top-k cosine neighbors of each query vector.
    * `base`/`queries`: (vec_id: long, embedding: array<float>). Self-matches
    * (same vec_id) are excluded.
    *
    * The query side is collected and broadcast, so it must be small;
    * `maxQueries` guards the collect — exceeding it fails fast instead of
    * OOM-ing the driver. For large query sets use [[lshTopK]].
    */
  def bruteForceTopK(base: DataFrame, queries: DataFrame, k: Int,
                     maxQueries: Int = 100000): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val q = queries.select(col("vec_id").cast("long"), col("embedding"))
      .limit(maxQueries + 1).as[(Long, Array[Float])].collect()
    require(q.length <= maxQueries,
      s"bruteForceTopK query side exceeds maxQueries=$maxQueries; use lshTopK")
    val qB = spark.sparkContext.broadcast(q)

    val candidates = base.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = qB.value
        // per-query bounded min-heap of (sim, id)
        val heaps = Array.fill(qs.length)(
          new java.util.PriorityQueue[(Double, Long)](k + 1,
            Ordering.by[(Double, Long), (Double, Long)](t => (t._1, -t._2))))
        it.foreach { case (id, emb) =>
          var qi = 0
          while (qi < qs.length) {
            if (qs(qi)._1 != id) {
              val s = cosine(qs(qi)._2, emb)
              val h = heaps(qi)
              h.add((s, id))
              if (h.size > k) h.poll()
            }
            qi += 1
          }
        }
        heaps.iterator.zipWithIndex.flatMap { case (h, qi) =>
          import scala.jdk.CollectionConverters._
          h.iterator.asScala.map { case (s, id) => Neighbor(qs(qi)._1, id, s) }
        }
      }

    // global top-k over the bounded candidate set; deterministic tie-break
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    candidates.toDF()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
  }

  // -------------------------------------------------------------------
  // LSH (random hyperplane) bucketing — the scale path

  /** Deterministic pseudo-random hyperplanes (no java.util.Random state
    * ambiguity across JVMs: plain xorshift on (seed, plane, dim)).
    */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Float]] =
    Array.tabulate(nPlanes) { p =>
      Array.tabulate(dim) { d =>
        var x = seed ^ (p * 0x9e3779b97f4a7c15L) ^ (d * 0xc2b2ae3d27d4eb4fL)
        x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
        ((x * 0x2545f4914f6cdd1dL) >>> 40).toFloat / (1 << 23).toFloat - 1.0f
      }
    }

  /** Hyperplane sign pattern of one embedding. The dot product accumulates
    * in Double over the float32 values, left to right — deterministic and
    * exactly replayable by an external (double-precision) oracle.
    */
  def bucketOf(emb: Array[Float], planes: Array[Array[Float]]): Int = {
    var b = 0
    var p = 0
    while (p < planes.length) {
      var dot = 0.0; var i = 0
      val pl = planes(p)
      while (i < emb.length) { dot += emb(i).toDouble * pl(i).toDouble; i += 1 }
      if (dot >= 0.0) b |= (1 << p)
      p += 1
    }
    b
  }

  final case class BucketedVec(vec_id: Long, bucket: Int)

  /** Plane count that keeps the EXPECTED hyperplane-bucket width near
    * `targetBucketWidth` for a corpus of `corpusSize` vectors:
    * nPlanes ≈ log2(n) − log2(width). The default 8 planes (256 buckets) is
    * right for ~10^4-10^5 vectors; a 10^9-vector corpus wants ~24 planes.
    * Clamped to [1, 30] so the bucket id stays a positive Int.
    */
  def nPlanesFor(corpusSize: Long, targetBucketWidth: Int = 64): Int = {
    val n = math.max(1L, corpusSize)
    val w = math.max(1, targetBucketWidth)
    val p = math.ceil(math.log(n.toDouble / w) / math.log(2.0)).toInt
    math.min(30, math.max(1, p))
  }

  /** Resolve the embedding dimensionality: prefer the caller-supplied value
    * (no Spark job); fall back to a single bounded probe of the first row.
    */
  private def resolveDim(base: DataFrame, dim: Option[Int]): Int = dim.getOrElse {
    val spark = base.sparkSession
    import spark.implicits._
    base.select(col("embedding")).as[Array[Float]].head().length
  }

  /** Bucket every base vector. Pass `dim` to avoid the one probe job. */
  def lshBuckets(base: DataFrame, nPlanes: Int = 8, seed: Long = 42L,
                 dim: Option[Int] = None): Dataset[BucketedVec] = {
    val spark = base.sparkSession
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(hyperplanes(nPlanes, resolveDim(base, dim), seed))
    base.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, emb) => BucketedVec(id, bucketOf(emb, planes.value)) })
  }

  /** ANN via LSH buckets: a query scans only base vectors in its own bucket
    * and in buckets at Hamming distance 1 (multi-probe), then exact-ranks.
    * Pass `dim` to avoid any driver probe job.
    *
    * Load bounding: size the bucket space with [[nPlanesFor]] at corpus
    * scale, and `maxBucket` drops base buckets wider than the cap from
    * scoring (a degenerate bucket would otherwise make one probe scan
    * millions of vectors); [[lshOverflowBuckets]] reports the drops so the
    * recall loss is accounted, mirroring the dedup operators' cap pattern.
    */
  def lshTopK(base: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 8, seed: Long = 42L,
              dim: Option[Int] = None,
              maxBucket: Int = 1 << 20): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val planes = spark.sparkContext.broadcast(hyperplanes(nPlanes, resolveDim(base, dim), seed))

    val baseB = base.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .map { case (id, emb) => (id, emb, bucketOf(emb, planes.value)) }
      .toDF("vec_id", "embedding", "bucket")

    val okBuckets = baseB.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") <= maxBucket)
      .select(col("bucket"))

    val probes = queries.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .flatMap { case (id, emb) =>
        val b = bucketOf(emb, planes.value)
        (b +: (0 until nPlanes).map(p => b ^ (1 << p))).distinct
          .map(probe => (id, emb, probe))
      }
      .toDF("query_id", "q_embedding", "bucket")

    val scored = probes.join(okBuckets, Seq("bucket")).join(baseB, Seq("bucket"))
      .filter(col("query_id") =!= col("vec_id"))
      .as[(Int, Long, Array[Float], Long, Array[Float])]
      .map { case (_, qid, qe, nid, ne) => Neighbor(qid, nid, cosine(qe, ne)) }

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.toDF()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("sim"))
  }

  /** Base buckets dropped by [[lshTopK]]'s width cap: (bucket, n_docs) for
    * every bucket wider than `maxBucket`.
    */
  def lshOverflowBuckets(base: DataFrame,
                         nPlanes: Int = 8, seed: Long = 42L,
                         dim: Option[Int] = None,
                         maxBucket: Int = 1 << 20): DataFrame =
    lshBuckets(base, nPlanes, seed, dim).toDF()
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > maxBucket)
}

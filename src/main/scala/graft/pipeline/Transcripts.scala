package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transcripts.
  *
  * Two sources:
  *  1. [[generate]] — a seeded, skewed, closed-vocabulary generator used by
  *     benchmarks and scale tests (no wall clock, no external data; same
  *     row for the same (seed, conv, turn) regardless of parallelism).
  *  2. [[fromDocuments]] — a SQL-expressible derivation from the driver's
  *     `documents.parquet`, used by the correctness queries so a DuckDB
  *     oracle can reconstruct the exact same table.
  */
object Transcripts {

  // -------------------------------------------------------------------
  // 1. Seeded generator (bench / scale path)

  /** xorshift64* — splittable, allocation-free seeded PRNG. */
  private def mix(seed: Long): Long = {
    var x = seed ^ 0x9e3779b97f4a7c15L
    x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
    x * 0x2545f4914f6cdd1dL
  }

  private val Vocab: Array[String] =
    ("key agg row scan slow fast table value part hash merge batch spark line sort window " +
      "order data column join small customer query big the a stream filter group dup vector " +
      "alpha beta gamma delta epsilon zeta theta lambda sigma omega").split(' ')

  private def words(seed: Long, n: Int): String = {
    val sb = new java.lang.StringBuilder(n * 6)
    var s = seed
    var i = 0
    while (i < n) {
      s = mix(s)
      if (i > 0) sb.append(' ')
      sb.append(Vocab(((s >>> 33) % Vocab.length).toInt))
      i += 1
    }
    sb.toString
  }

  /** HTML template vocabulary — one branch per visibleText rule family
    * (blocks, tables, pre, entities, hidden subtrees, controls, misnesting,
    * noscript, svg foreign content), so the bench corpus exercises the whole
    * extraction surface (reference rule set: src/public/mod.ts:1002-1372).
    */
  def htmlFor(seed: Long, turnIdx: Int): String = {
    val a = words(mix(seed + 1), 8)
    val b = words(mix(seed + 2), 12)
    val c = words(mix(seed + 3), 5)
    (java.lang.Math.floorMod(seed, 10L).toInt: @annotation.switch) match {
      case 0 => s"<div><h2>$c</h2><p>$a</p><p>$b</p></div>"
      case 1 => s"<table><tr><th>$c</th><th>id $turnIdx</th></tr><tr><td>$a</td><td>$b</td></tr></table>"
      case 2 => s"<pre>$a\n  $b\n\t$c</pre>"
      case 3 => s"<p>$a &amp; $b &#169; &copy; &copy &lt;tag&gt;</p>"
      case 4 => s"<p>$a</p><div hidden><p>$b</p></div><p style=\"display:none\">$c</p><p aria-hidden=\"true\">$c</p><p>$c</p>"
      case 5 => s"<p><img alt=\"$c\" src=\"x.png\"> $a <input type=\"submit\" value=\"$c\"><button value=\"$c\">$b</button></p>"
      case 6 => s"<p><b>$a <i>$b</b> $c</i></p>"
      case 7 => s"<p>$a</p><noscript>&lt;b&gt;$c&lt;/b&gt;</noscript><script>var x='<p>$b</p>';</script>"
      case 8 => s"<ul><li>$a</li><li>$b<br>$c</li></ul><svg><title>skip</title><text>$c</text></svg>"
      case _ => s"<article><h1>$c</h1><p>$a</p><blockquote>$b</blockquote><p>$a $c</p></article>"
    }
  }

  /** Turns for one conversation index. Skew: every 403rd conversation is
    * "long" (256 turns); otherwise 2..17 turns (median ~9) — exercises the
    * north rule's skewed-long-conversation handling deterministically.
    */
  def turnsOf(seed: Long, convIdx: Long): Seq[TranscriptTurn] = {
    val convSeed = mix(seed ^ mix(convIdx))
    val nTurns =
      if (convIdx % 403L == 17L) 256
      else 2 + java.lang.Math.floorMod(convSeed, 16L).toInt
    val convId = f"c${convIdx}%08d"
    (0 until nTurns).map { t =>
      val ts = mix(convSeed + t)
      val role = java.lang.Math.floorMod(ts, 3L).toInt match {
        case 0 => "user"; case 1 => "assistant"; case _ => "tool"
      }
      TranscriptTurn(
        conv_id = convId,
        turn_idx = t,
        role = role,
        text = htmlFor(ts, t),
        tool = if (role == "tool") "browser" else "",
        ts = new java.sql.Timestamp(1700000000000L + convIdx * 3600000L + t * 60000L)
      )
    }
  }

  /** Distributed deterministic generation: `spark.range` over conversation
    * indices, flatMapped to turns. Output is identical for any parallelism.
    */
  def generate(spark: SparkSession, nConversations: Long, seed: Long = 42L,
               partitions: Int = 0): Dataset[TranscriptTurn] = {
    import spark.implicits._
    val base = if (partitions > 0) spark.range(0L, nConversations, 1L, partitions)
               else spark.range(nConversations)
    base.flatMap(convIdx => turnsOf(seed, convIdx))
  }

  // -------------------------------------------------------------------
  // 2. Derivation from the driver's documents table (oracle-checkable)

  /** documents.parquet → transcripts of shape `input_hint`, with `text`
    * holding `<p>`-wrapped HTML. Every expression here has an exact ANSI-SQL
    * twin used in `SparkEntry.oracleSql`, so DuckDB can rebuild this table:
    *   conv_id  = 'c' || lpad(CAST(doc_id % 40 AS VARCHAR), 4, '0')
    *   turn_idx = doc_id // 40
    *   role     = CASE doc_id % 3 ...
    *   text     = '<p>' || text || '</p>'
    */
  def fromDocuments(spark: SparkSession, sfDir: String): DataFrame = {
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        concat(lit("c"), lpad((col("doc_id") % 40).cast("string"), 4, "0")).as("conv_id"),
        expr("CAST(doc_id DIV 40 AS BIGINT)").as("turn_idx"),
        expr("CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END").as("role"),
        concat(lit("<p>"), col("text"), lit("</p>")).as("text"),
        expr("CASE WHEN doc_id % 3 = 2 THEN 'browser' ELSE '' END").as("tool"),
        expr("CAST(timestamp'2023-11-14 00:00:00' + make_interval(0,0,0,0,0,0,doc_id*60) AS TIMESTAMP)").as("ts")
      )
  }

  /** The SQL twin of [[fromDocuments]] minus html wrapping — shared prefix
    * for oracle queries (DuckDB dialect; `//` is integer division).
    */
  val OracleCte: String =
    """WITH transcripts AS (
      |  SELECT 'c' || lpad(CAST(doc_id % 40 AS VARCHAR), 4, '0') AS conv_id,
      |         doc_id // 40 AS turn_idx,
      |         CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'user' WHEN 1 THEN 'assistant' ELSE 'tool' END AS role,
      |         text
      |  FROM documents
      |)""".stripMargin
}

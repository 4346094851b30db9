package graft.pipeline

import graft.core._
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.util.LongAccumulator

/** Per-turn extraction: the reference's `visibleText(parse(html))` +
  * provenance-token spans, run distributed via typed `mapPartitions`.
  *
  * Design notes (scale):
  *  - extraction is embarrassingly parallel — no shuffle is introduced here;
  *    callers choose partitioning (`repartition(conv_id)` only when a
  *    downstream per-conversation stage needs co-location);
  *  - rows are processed in batches on a dedicated 64 MiB-stack worker
  *    thread: the tree builder and the node converter recurse over the DOM
  *    (reference recursion: src/internal/tree/build.ts:420-490), and
  *    adversarial deeply-nested inputs overflow executor default stacks.
  *    One thread per ~512-row batch amortizes thread start-up to noise;
  *  - a poison document can never kill a task: budget violations and any
  *    unexpected error land in the `budget_error` column (north rule:
  *    per-row guard, reference budget semantics src/public/mod.ts:165-180).
  */
object Extraction {

  /** Defensive per-row budgets for untrusted web-scale HTML. */
  val DefaultBudgets: Budgets = Budgets(
    maxInputBytes = Some(32 * 1024 * 1024),
    maxNodes = Some(2 * 1024 * 1024),
    maxDepth = Some(65536)
  )

  final case class Metrics(
      turnsIn: LongAccumulator,
      turnsOk: LongAccumulator,
      turnsFailed: LongAccumulator,
      parseErrors: LongAccumulator,
      bytesIn: LongAccumulator,
      bytesOut: LongAccumulator
  )

  object Metrics {
    def register(spark: SparkSession): Metrics = {
      val sc = spark.sparkContext
      Metrics(
        turnsIn = sc.longAccumulator("graft.extract.turnsIn"),
        turnsOk = sc.longAccumulator("graft.extract.turnsOk"),
        turnsFailed = sc.longAccumulator("graft.extract.turnsFailed"),
        parseErrors = sc.longAccumulator("graft.extract.parseErrors"),
        bytesIn = sc.longAccumulator("graft.extract.bytesIn"),
        bytesOut = sc.longAccumulator("graft.extract.bytesOut")
      )
    }
  }

  private val BatchSize = 512
  private val WorkerStackBytes = 64L * 1024 * 1024

  /** One long-lived deep-stack worker thread per task: batches of work are
    * handed over via synchronous queues. A thread PER BATCH would re-mmap a
    * 64 MiB stack thousands of times per task and serialize on the process
    * memory-map lock at high core counts — one thread per task amortizes it
    * to nothing while keeping the deep stack for recursive tree work.
    */
  final class BigStackWorker {
    private val in = new java.util.concurrent.SynchronousQueue[AnyRef]
    private val out = new java.util.concurrent.SynchronousQueue[AnyRef]
    private object Poison
    private val thread = new Thread(null, () => {
      var running = true
      while (running) {
        in.take() match {
          case f: Function0[_] =>
            out.put(try Right(f()) catch { case t: Throwable => Left(t) })
          case _ => running = false
        }
      }
    }, "graft-extract-worker", WorkerStackBytes)
    thread.setDaemon(true)
    thread.start()

    def apply[T](f: () => T): T =
      { in.put(f); out.take() } match {
        case Right(v) => v.asInstanceOf[T]
        case Left(t: Throwable) => throw t
        case other => throw new IllegalStateException(s"unexpected $other")
      }

    def close(): Unit = in.offer(Poison, 1, java.util.concurrent.TimeUnit.SECONDS)
  }

  /** Extract one turn. Total for data-shaped failures: budget trips, parse
    * surprises and recursion overflow degrade to the `budget_error` column;
    * genuinely fatal VM errors (OOM, internal JVM errors) propagate and fail
    * the task so Spark retries it — same contract as
    * [[graft.functions.VisibleTextEval]]'s guard.
    */
  private[graft] def guardedExtract(t: TranscriptTurn, htmlLen: Long)
                                   (body: => ExtractedTurn): ExtractedTurn =
    try body
    catch {
      case e: BudgetExceededException =>
        ExtractedTurn(t.conv_id, t.turn_idx, t.role, "", Nil,
          0, "", s"budget:${e.payload.budget}", htmlLen, 0L)
      case scala.util.control.NonFatal(e) =>
        ExtractedTurn(t.conv_id, t.turn_idx, t.role, "", Nil,
          0, "", s"internal:${e.getClass.getSimpleName}", htmlLen, 0L)
      case e: StackOverflowError =>
        ExtractedTurn(t.conv_id, t.turn_idx, t.role, "", Nil,
          0, "", s"internal:${e.getClass.getSimpleName}", htmlLen, 0L)
    }

  def extractOne(t: TranscriptTurn, budgets: Budgets,
                 options: VisibleTextOptions): ExtractedTurn = {
    val html = if (t.text == null) "" else t.text
    guardedExtract(t, html.length.toLong) {
      val tree = HtmlParser.parse(html,
        ParseOptions(captureSpans = true, budgets = Some(budgets)))
      val (text, provTokens) = VisibleText.extractWithProvenance(tree.children, options)
      // node id -> input span, for provenance-token char spans (direct
      // recursion: the generic walk's per-node closure showed up at ~9% of
      // extraction in profiles)
      val spanById = scala.collection.mutable.HashMap.empty[Int, Span]
      def collectSpans(n: HtmlNode): Unit = {
        if (n.spanProvenance == "input" && n.span.isDefined)
          spanById.put(n.id, n.span.get)
        n match {
          case e: ElementNode =>
            var i = 0
            while (i < e.children.length) { collectSpans(e.children(i)); i += 1 }
          case _ =>
        }
      }
      var ci = 0
      while (ci < tree.children.length) { collectSpans(tree.children(ci)); ci += 1 }
      val spans = provTokens.map { tok =>
        val sp = tok.sourceNodeId.flatMap(spanById.get)
        TokenSpan(tok.kind, tok.value,
          sp.map(_.start).getOrElse(-1), sp.map(_.end).getOrElse(-1),
          tok.sourceNodeId.getOrElse(-1))
      }
      ExtractedTurn(t.conv_id, t.turn_idx, t.role, text, spans,
        tree.errors.length,
        tree.errors.headOption.map(_.parseErrorId).getOrElse(""),
        "", html.length.toLong, text.length.toLong)
    }
  }

  /** Extract one turn, keeping only the main-content block (north-star
    * boilerplate strip: text-density, link-density, tag/class scoring —
    * [[graft.core.MainContent]]). The `spans` column carries one
    * `mainContent` record with the winner's source char span; turns with no
    * qualifying block fall back to whole-document extraction (empty spans).
    */
  def extractMainOne(t: TranscriptTurn, budgets: Budgets,
                     options: MainContentOptions): ExtractedTurn = {
    val html = if (t.text == null) "" else t.text
    guardedExtract(t, html.length.toLong) {
      val tree = HtmlParser.parse(html,
        ParseOptions(captureSpans = true, budgets = Some(budgets)))
      val (text, spans) = MainContent.extract(tree, options) match {
        case Some(r) =>
          (r.text, r.span.map(sp =>
            TokenSpan("mainContent", r.tagName, sp.start, sp.end, r.nodeId)).toSeq)
        case None =>
          (VisibleText.ofDocument(tree, options.visibleText), Nil)
      }
      ExtractedTurn(t.conv_id, t.turn_idx, t.role, text, spans,
        tree.errors.length,
        tree.errors.headOption.map(_.parseErrorId).getOrElse(""),
        "", html.length.toLong, text.length.toLong)
    }
  }

  /** Shared distributed plumbing: shuffle-free `mapPartitions`, one
    * amortized deep-stack worker per task, batched handoff, accumulators.
    */
  private def extractWith(ds: Dataset[TranscriptTurn], metrics: Option[Metrics])
                         (rowFn: TranscriptTurn => ExtractedTurn): Dataset[ExtractedTurn] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      val worker = new BigStackWorker
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => worker.close()))
      val batched = it.grouped(BatchSize).flatMap { batch =>
        val out = worker(() => batch.map(rowFn))
        metrics.foreach { m =>
          m.turnsIn.add(batch.size.toLong)
          out.foreach { e =>
            if (e.budget_error.isEmpty) m.turnsOk.add(1L) else m.turnsFailed.add(1L)
            m.parseErrors.add(e.n_parse_errors.toLong)
            m.bytesIn.add(e.n_chars_in)
            m.bytesOut.add(e.n_chars_out)
          }
        }
        out
      }
      batched
    }
  }

  /** Distributed extraction. No shuffle; preserves input partitioning. */
  def extract(ds: Dataset[TranscriptTurn],
              metrics: Option[Metrics] = None,
              budgets: Budgets = DefaultBudgets,
              options: VisibleTextOptions = VisibleTextOptions()): Dataset[ExtractedTurn] =
    extractWith(ds, metrics)(extractOne(_, budgets, options))

  /** Distributed main-content extraction (same plumbing, boilerplate
    * stripped per turn). No shuffle; preserves input partitioning.
    */
  def extractMain(ds: Dataset[TranscriptTurn],
                  metrics: Option[Metrics] = None,
                  budgets: Budgets = DefaultBudgets,
                  options: MainContentOptions = MainContentOptions()): Dataset[ExtractedTurn] =
    extractWith(ds, metrics)(extractMainOne(_, budgets, options))

  // -------------------------------------------------------------------
  // Lineage & digests

  /** FNV-1a 64-bit over the identity of one extracted row. */
  def rowDigest(convId: String, turnIdx: Int, text: String): Long = {
    var h = 0xcbf29ce484222325L
    def mixStr(s: String): Unit = {
      var i = 0
      while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
      h ^= 0x1fL; h *= 0x100000001b3L
    }
    mixStr(convId)
    h ^= turnIdx.toLong; h *= 0x100000001b3L
    mixStr(text)
    h
  }

  /** One lineage row per task partition: partition id, files, counts and an
    * order-independent XOR digest (stable across parallelism levels — the
    * global XOR of all partition digests is the dataset digest).
    */
  def lineage(extracted: Dataset[ExtractedTurn]): Dataset[LineageRow] = {
    import extracted.sparkSession.implicits._
    extracted.mapPartitions { it =>
      val pid = TaskContext.getPartitionId()
      var n = 0L; var errs = 0L; var digest = 0L
      it.foreach { e =>
        n += 1
        if (e.budget_error.nonEmpty) errs += 1
        digest ^= rowDigest(e.conv_id, e.turn_idx, e.extracted_text)
      }
      if (n == 0L) Iterator.empty
      else Iterator.single(LineageRow(pid, n, errs, Nil, digest))
    }
  }

  /** Order-independent digest of the whole extracted dataset. */
  def datasetDigest(extracted: Dataset[ExtractedTurn]): Long = {
    import extracted.sparkSession.implicits._
    extracted
      .map(e => rowDigest(e.conv_id, e.turn_idx, e.extracted_text))
      .reduce(_ ^ _)
  }
}

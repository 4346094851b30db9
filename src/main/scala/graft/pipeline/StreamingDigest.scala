package graft.pipeline

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.core.{Budgets, VisibleTextOptions}

/** Stateful Structured-Streaming variant of the conversation digest:
  * `readStream → withWatermark(ts) → groupByKey(conv_id) →
  * mapGroupsWithState`, carrying the same constant-size [[ConvDigestState]]
  * per conversation that the batch [[ConvDigest.Agg]] computes.
  *
  * Scale shape: state is O(1) per conversation (three longs), the digest is
  * an order-independent XOR so late/out-of-order turns within the watermark
  * fold in without re-reading history, and extraction runs inline per row
  * (total — poison rows degrade to an error inside extractOne, never fail
  * the query). Each micro-batch emits the updated running digest per
  * touched conversation (OutputMode.Update).
  */
object StreamingDigest {

  final case class ConvUpdate(conv_id: String, n_turns: Long, digest: Long,
                              n_chars: Long)

  private val DefaultBudgets = Budgets(
    maxInputBytes = Some(32 * 1024 * 1024),
    maxNodes = Some(2 * 1024 * 1024))

  /** Per-turn extracted-text digests over a (possibly streaming) typed
    * transcript Dataset. Call `.withWatermark("ts", ...)` upstream when
    * reading from an unbounded source.
    */
  def updates(turns: Dataset[TranscriptTurn]): Dataset[ConvUpdate] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .groupByKey(_.conv_id)
      .mapGroupsWithState[ConvDigestState, ConvUpdate](GroupStateTimeout.NoTimeout) {
        (convId: String, rows: Iterator[TranscriptTurn], state: GroupState[ConvDigestState]) =>
          var st = state.getOption.getOrElse(ConvDigestState(0L, 0L, 0L))
          rows.foreach { t =>
            val extracted = Extraction.extractOne(t, DefaultBudgets, VisibleTextOptions())
            st = ConvDigestState(
              st.n_turns + 1L,
              st.digest ^ ConvDigest.turnHash(t.turn_idx.toLong, extracted.extracted_text),
              st.n_chars + extracted.extracted_text.length.toLong)
          }
          state.update(st)
          ConvUpdate(convId, st.n_turns, st.digest, st.n_chars)
      }
  }
}

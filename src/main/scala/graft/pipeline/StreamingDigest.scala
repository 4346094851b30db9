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
  * an order-independent XOR so out-of-order turns fold in without re-reading
  * history, and extraction runs inline per row (total — poison rows degrade
  * to an error inside extractOne, never fail the query). Each micro-batch
  * emits the updated running digest per touched conversation
  * (OutputMode.Update).
  *
  * State eviction: the input stream MUST carry a watermark on `ts` (the
  * caller's `.withWatermark("ts", ...)`); each update arms an event-time
  * timeout at watermark + `stateTtlMs`, so a conversation idle past the TTL
  * emits its digest once more and is evicted — state is bounded by ACTIVE
  * conversations, not all conversations ever seen. A turn arriving after
  * eviction starts a fresh digest for that conversation (callers that need
  * exactly-once-per-conversation folds must XOR the emitted updates
  * downstream, which is associative and order-independent).
  */
object StreamingDigest {

  final case class ConvUpdate(conv_id: String, n_turns: Long, digest: Long,
                              n_chars: Long)

  private val DefaultBudgets = Budgets(
    maxInputBytes = Some(32 * 1024 * 1024),
    maxNodes = Some(2 * 1024 * 1024))

  /** Per-turn extracted-text digests over a streaming typed transcript
    * Dataset. The input must have `.withWatermark("ts", ...)` applied
    * upstream — the watermark drives state eviction (see object scaladoc).
    */
  def updates(turns: Dataset[TranscriptTurn],
              stateTtlMs: Long = 3600000L): Dataset[ConvUpdate] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns
      .groupByKey(_.conv_id)
      .mapGroupsWithState[ConvDigestState, ConvUpdate](GroupStateTimeout.EventTimeTimeout) {
        (convId: String, rows: Iterator[TranscriptTurn], state: GroupState[ConvDigestState]) =>
          if (state.hasTimedOut) {
            // watermark passed last activity + TTL: emit the final running
            // digest once more and evict
            val st = state.get
            state.remove()
            ConvUpdate(convId, st.n_turns, st.digest, st.n_chars)
          } else {
            var st = state.getOption.getOrElse(ConvDigestState(0L, 0L, 0L))
            rows.foreach { t =>
              val extracted = Extraction.extractOne(t, DefaultBudgets, VisibleTextOptions())
              st = ConvDigestState(
                st.n_turns + 1L,
                st.digest ^ ConvDigest.turnHash(t.turn_idx.toLong, extracted.extracted_text),
                st.n_chars + extracted.extracted_text.length.toLong)
            }
            state.update(st)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + stateTtlMs)
            ConvUpdate(convId, st.n_turns, st.digest, st.n_chars)
          }
      }
  }
}

package graft.pipeline

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Streaming per-conversation digest: a typed [[Aggregator]] that folds
  * turns into a constant-size state (count, order-independent XOR digest,
  * char total) instead of materializing whole conversations with
  * `collect_list` — at 10^12 turns a mega-conversation stays O(1) memory
  * per group, and partial aggregation (map-side combine) applies because
  * the merge is commutative/associative.
  *
  * The digest XORs a per-turn FNV-1a hash of "turnIdx:text", so it is
  * insensitive to aggregation order yet pins every (turn_idx, text) pair —
  * and is exactly replayable by an external oracle (bit_xor over the same
  * per-row hash).
  */
final case class ConvDigestState(n_turns: Long, digest: Long, n_chars: Long)

object ConvDigest {

  def turnHash(turnIdx: Long, text: String): Long =
    graft.ops.Dedup.shingleHash(s"$turnIdx:${if (text == null) "" else text}")

  final class Agg extends Aggregator[(Long, String), ConvDigestState, ConvDigestState] {
    override def zero: ConvDigestState = ConvDigestState(0L, 0L, 0L)

    override def reduce(b: ConvDigestState, turn: (Long, String)): ConvDigestState =
      ConvDigestState(
        b.n_turns + 1L,
        b.digest ^ turnHash(turn._1, turn._2),
        b.n_chars + (if (turn._2 == null) 0L else turn._2.length.toLong))

    override def merge(a: ConvDigestState, b: ConvDigestState): ConvDigestState =
      ConvDigestState(a.n_turns + b.n_turns, a.digest ^ b.digest, a.n_chars + b.n_chars)

    override def finish(reduction: ConvDigestState): ConvDigestState = reduction

    override def bufferEncoder: Encoder[ConvDigestState] = Encoders.product[ConvDigestState]
    override def outputEncoder: Encoder[ConvDigestState] = Encoders.product[ConvDigestState]
  }
}

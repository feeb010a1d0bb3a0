package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator over (score, id) pairs, ordered by
  * (score desc, id asc) — the same total order as the window-rank form, so
  * results are identical, but with MAP-SIDE PARTIAL AGGREGATION: each
  * partition reduces its candidates to k rows before the shuffle, so a
  * per-probe top-k over a huge candidate set moves k·partitions rows instead
  * of every candidate — the difference between a merge of heaps and a full
  * sort at 100 TB.
  *
  * Buffer is a sorted Vector capped at k (k is small; insertion cost O(k)
  * beats heap constant-factor at these sizes and keeps the encoder simple).
  */
class TopKAggregator(k: Int)
    extends Aggregator[TopKAggregator.Entry, Seq[TopKAggregator.Entry], Seq[TopKAggregator.Entry]] {
  import TopKAggregator.Entry

  // fail at construction, not as a NoSuchElementException inside an
  // executor task (buf.last on the empty buffer when k = 0) — same guard
  // convention as the other kernels (MinHashSignature, WinnowFingerprints)
  require(k > 0, "TopKAggregator needs k > 0")

  private def better(a: Entry, b: Entry): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def insert(buf: Seq[Entry], e: Entry): Seq[Entry] =
    if (buf.size >= k && better(buf.last, e)) buf
    else ((buf :+ e).sortWith(better)).take(k)

  override def zero: Seq[Entry] = Vector.empty
  override def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] = insert(buf, e)
  override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
    (a ++ b).sortWith(better).take(k)
  override def finish(buf: Seq[Entry]): Seq[Entry] = buf
  override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
  override def outputEncoder: Encoder[Seq[Entry]] = bufferEncoder
}

object TopKAggregator {
  case class Entry(score: Double, id: Long)
}

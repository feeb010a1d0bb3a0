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

/** [[TopKAggregator]] with id-DEDUP folded into the heap: an id already in
  * the buffer is skipped on reduce and collapsed on merge, so a candidate
  * relation whose duplicates score identically (the HNSW scored pairs —
  * multi-probe overlap emits the same (src, dst) from up to nProbe² shared
  * lists, and the score is a pure function of the pair) needs NO upstream
  * `distinct`: the r11 sf1 smoke's 22.5M-row pair distinct was a full-width
  * hash aggregate that spilled at the 16 GiB heap, doing exactly the work
  * these map-side partial heaps already do in O(k) memory per group.
  *
  * Contract: duplicate ids carry EQUAL scores (sim is functional on the
  * pair). A contract-violating feed still yields a deterministic result —
  * the surviving entry is the better (score desc, id asc) one on merge —
  * but per-id score retraction is out of scope, like the adjacency fold's
  * same-id⇒same-vector rule.
  */
class TopKDistinctAggregator(k: Int)
    extends Aggregator[TopKAggregator.Entry, Seq[TopKAggregator.Entry], Seq[TopKAggregator.Entry]] {
  import TopKAggregator.Entry

  require(k > 0, "TopKDistinctAggregator needs k > 0")

  private def better(a: Entry, b: Entry): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  /** Keep the first (= best, input sorted) occurrence of each id. */
  private def dedupSorted(s: Seq[Entry]): Seq[Entry] = {
    val seen = scala.collection.mutable.LongMap.empty[Unit]
    s.filter(e => seen.put(e.id, ()).isEmpty)
  }

  override def zero: Seq[Entry] = Vector.empty
  override def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] =
    if (buf.exists(_.id == e.id)) buf // equal-score duplicate by contract
    else if (buf.size >= k && better(buf.last, e)) buf
    else ((buf :+ e).sortWith(better)).take(k)
  override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] =
    dedupSorted((a ++ b).sortWith(better)).take(k)
  override def finish(buf: Seq[Entry]): Seq[Entry] = buf
  override def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
  override def outputEncoder: Encoder[Seq[Entry]] = bufferEncoder
}

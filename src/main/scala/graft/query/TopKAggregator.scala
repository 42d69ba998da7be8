package graft.query

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One scored document; ordering contract everywhere in the engine is
  * (score DESC, docId ASC) — the fixed tie-break chosen in SURVEY.md §5.2
  * (the reference's argpartition top-k is order-unspecified under ties:
  * benchmark/on_rank_bm25.py:25-46).
  */
final case class ScoredDoc(docId: Long, score: Double)

/** Bounded min-heap buffer: root = current worst of the kept k. Primitive
  * arrays keep the shuffled partial-aggregate rows compact.
  */
final case class TopKBuf(var docIds: Array[Long], var scores: Array[Double], var size: Int)

/** Grouped top-k as a typed Aggregator — the Spark-native analogue of the
  * reference's per-query `np.argpartition(scores, -k)` O(N) selection
  * (benchmark/on_rank_bm25.py:25-46): each partition keeps a bounded heap
  * (≙ the reference's per-thread heaps), partial buffers merge at the
  * shuffle (≙ its result concatenation), so per-group work is O(N log k)
  * with O(k) state instead of a full sort.
  *
  * Usage: `val topk = functions.udaf(new TopKAggregator(k), Encoders.product[ScoredDoc])`
  * then `df.groupBy("qid").agg(topk(col("docId"), col("score")))`.
  */
class TopKAggregator(k: Int)
    extends Aggregator[ScoredDoc, TopKBuf, Seq[ScoredDoc]] with Serializable {
  require(k > 0)

  override def zero: TopKBuf = TopKBuf(new Array[Long](k), new Array[Double](k), 0)

  /** true if (s1,d1) ranks WORSE than (s2,d2) under (score DESC, docId ASC). */
  @inline private def worse(s1: Double, d1: Long, s2: Double, d2: Long): Boolean =
    s1 < s2 || (s1 == s2 && d1 > d2)

  private def siftUp(b: TopKBuf, i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(b.scores(i), b.docIds(i), b.scores(p), b.docIds(p))) {
        val ts = b.scores(i); b.scores(i) = b.scores(p); b.scores(p) = ts
        val td = b.docIds(i); b.docIds(i) = b.docIds(p); b.docIds(p) = td
        i = p
      } else return
    }
  }

  private def siftDown(b: TopKBuf): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var m = i
      if (l < b.size && worse(b.scores(l), b.docIds(l), b.scores(m), b.docIds(m))) m = l
      if (r < b.size && worse(b.scores(r), b.docIds(r), b.scores(m), b.docIds(m))) m = r
      if (m == i) return
      val ts = b.scores(i); b.scores(i) = b.scores(m); b.scores(m) = ts
      val td = b.docIds(i); b.docIds(i) = b.docIds(m); b.docIds(m) = td
      i = m
    }
  }

  def insert(b: TopKBuf, docId: Long, score: Double): TopKBuf = {
    if (b.size < k) {
      b.docIds(b.size) = docId; b.scores(b.size) = score; b.size += 1
      siftUp(b, b.size - 1)
    } else if (worse(b.scores(0), b.docIds(0), score, docId)) {
      b.docIds(0) = docId; b.scores(0) = score
      siftDown(b)
    }
    b
  }

  override def reduce(b: TopKBuf, in: ScoredDoc): TopKBuf =
    insert(b, in.docId, in.score)

  override def merge(a: TopKBuf, c: TopKBuf): TopKBuf = {
    var i = 0
    while (i < c.size) { insert(a, c.docIds(i), c.scores(i)); i += 1 }
    a
  }

  override def finish(b: TopKBuf): Seq[ScoredDoc] = {
    val out = new Array[ScoredDoc](b.size)
    var i = 0
    while (i < b.size) { out(i) = ScoredDoc(b.docIds(i), b.scores(i)); i += 1 }
    scala.collection.immutable.ArraySeq.unsafeWrapArray(
      out.sortWith((x, y) =>
        x.score > y.score || (x.score == y.score && x.docId < y.docId)))
  }

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[ScoredDoc]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ScoredDoc]]()
}

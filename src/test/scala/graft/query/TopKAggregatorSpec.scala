package graft.query

import org.scalatest.funsuite.AnyFunSuite

/** Bounded-heap top-k vs the sort-based oracle (SURVEY.md §5.2): for any
  * input and any partitioning into partial buffers, insert+merge+finish
  * must equal sortBy((-score, docId)).take(k) — the engine's canonical
  * (score DESC, docId ASC) order, including tie groups and duplicates.
  * Deterministic seed, many random shapes (the CodecSpec idiom).
  */
class TopKAggregatorSpec extends AnyFunSuite {

  private def oracle(xs: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    xs.sortBy { case (d, s) => (-s, d) }.take(k)

  test("insert+merge+finish == sort-take oracle over random shapes (seed 42)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 200) {
      val n = rnd.nextInt(300)
      val k = 1 + rnd.nextInt(20)
      // small value/id ranges force score ties and duplicate doc ids
      val xs = Seq.fill(n)((rnd.nextInt(40).toLong, rnd.nextInt(8) / 2.0))
      val agg = new TopKAggregator(k)
      // random partitioning into partial buffers, merged in random order
      val nParts = 1 + rnd.nextInt(5)
      val bufs = Array.fill(nParts)(agg.zero)
      xs.foreach { case (d, s) => agg.reduce(bufs(rnd.nextInt(nParts)), ScoredDoc(d, s)) }
      val merged = rnd.shuffle(bufs.toSeq).reduce(agg.merge)
      val got = agg.finish(merged).map(h => (h.docId, h.score))
      assert(got == oracle(xs, k), s"trial $trial (n=$n k=$k)")
    }
  }

  test("pre-loaded heap keeps global top-k when later inserts arrive") {
    // the r3 kernel contract: one heap per query accumulates across salts
    val agg = new TopKAggregator(3)
    val h = agg.zero
    Seq((1L, 5.0), (2L, 4.0), (3L, 3.0)).foreach { case (d, s) => agg.insert(h, d, s) }
    // next "salt": one better, one worse, one tie on the boundary score
    Seq((10L, 4.5), (11L, 0.1), (2L, 3.0)).foreach { case (d, s) => agg.insert(h, d, s) }
    assert(agg.finish(h).map(x => (x.docId, x.score)) ==
      Seq((1L, 5.0), (10L, 4.5), (2L, 4.0)))
  }
}

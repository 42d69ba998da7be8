package graft.ops

import graft.SparkTestBase

/** Reciprocal-rank fusion: hand-computed oracle over two small runs —
  * overlap docs sum both reciprocal ranks, single-run docs keep one, ties
  * break doc ASC, output truncates to k.
  */
class FusionSpec extends SparkTestBase {

  test("rrf fuses two runs with the published formula") {
    import spark.implicits._
    // run A: q1 ranks d1,d2,d3 ; run B: q1 ranks d2,d1,d4
    val a = Seq(("q1", 1L, 1), ("q1", 2L, 2), ("q1", 3L, 3)).toDF("qid", "doc_id", "rank")
    val b = Seq(("q1", 2L, 1), ("q1", 1L, 2), ("q1", 4L, 3)).toDF("qid", "doc_id", "rank")
    val got = Fusion.rrf(Seq(a, b), k = 10, c = 60)
      .collect().sortBy(_.getInt(3))
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    def rr(ranks: Int*): Double =
      BigDecimal(ranks.map(r => 1.0 / (60 + r)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // d1: 1/61+1/62 ; d2: 1/62+1/61 (tie with d1 → doc ASC) ; d3: 1/63 ; d4: 1/63 (tie → doc ASC)
    assert(got.toSeq == Seq(
      (1L, rr(1, 2), 1), (2L, rr(2, 1), 2), (3L, rr(3), 3), (4L, rr(3), 4)))
  }

  test("rrf truncates to k per query and keeps queries independent") {
    import spark.implicits._
    val a = Seq(("q1", 1L, 1), ("q1", 2L, 2), ("q2", 7L, 1)).toDF("qid", "doc_id", "rank")
    val b = Seq(("q1", 3L, 1), ("q2", 8L, 1)).toDF("qid", "doc_id", "rank")
    val got = Fusion.rrf(Seq(a, b), k = 2, c = 60)
    val byQid = got.collect().groupBy(_.getString(0))
    assert(byQid("q1").length == 2) // d2 (rank 3 overall) truncated
    assert(byQid("q2").map(_.getLong(1)).toSet == Set(7L, 8L))
    // q1 winners: d1 and d3 share 1/61 → tie-break doc ASC puts d1 first
    val q1 = byQid("q1").sortBy(_.getInt(3)).map(_.getLong(1)).toSeq
    assert(q1 == Seq(1L, 3L))
  }

  test("combSum min-max normalizes per run and CombMNZ weights by agreement") {
    import spark.implicits._
    // run A scores: d1=10, d2=6, d3=2 → normalized 1.0, 0.5, 0.0
    // run B scores: d2=4, d4=1      → normalized 1.0, 0.0
    val a = Seq(("q1", 1L, 10.0), ("q1", 2L, 6.0), ("q1", 3L, 2.0))
      .toDF("qid", "doc_id", "score")
    val b = Seq(("q1", 2L, 4.0), ("q1", 4L, 1.0)).toDF("qid", "doc_id", "score")
    val sum = Fusion.combSum(Seq(a, b), k = 10)
      .collect().sortBy(_.getInt(3))
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // CombSUM: d2 = 0.5+1.0 = 1.5 ; d1 = 1.0 ; d3 = d4 = 0.0 (tie → doc ASC)
    assert(sum.toSeq == Seq((2L, 1.5, 1), (1L, 1.0, 2), (3L, 0.0, 3), (4L, 0.0, 4)))
    val mnz = Fusion.combSum(Seq(a, b), k = 10, mnz = true)
      .collect().sortBy(_.getInt(3))
      .map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
    // CombMNZ: d2 = 2×1.5 = 3.0 ; singles keep weight 1
    assert(mnz.toSeq == Seq((2L, 3.0, 1), (1L, 1.0, 2), (3L, 0.0, 3), (4L, 0.0, 4)))
  }

  test("combSum maps an all-equal-score run to 1.0 and truncates to k") {
    import spark.implicits._
    val a = Seq(("q1", 1L, 7.0), ("q1", 2L, 7.0), ("q2", 9L, 3.0))
      .toDF("qid", "doc_id", "score")
    val got = Fusion.combSum(Seq(a), k = 1)
    val rows = got.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // q1: both docs normalize to 1.0, tie-break doc ASC keeps d1; q2 single
    // doc (max==min) also 1.0
    assert(rows.toSet == Set(("q1", 1L, 1.0), ("q2", 9L, 1.0)))
  }
}

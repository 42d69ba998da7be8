package graft.tools

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}
import graft.tokenize.Tokenizer
import graft.util.SynthCorpus

/** Detection-rate evidence for the near-dup families (r6 VERDICT stretch
  * #9) — the IVF recall sweep's counterpart for minhash / simhash /
  * winnowing: synthetic (base, mutant) pairs at varying token-mutation
  * rates, ground truth = EXACT 3-gram shingle Jaccard computed in plain
  * Scala with the same tokenizer regex, detection = what each family's
  * production pipeline reports.
  *
  *  - minhash: `Dedup.minhashLsh` (n=3, m=32, bands=8, threshold 0.5) —
  *    recall over pairs with exact J >= 0.5, false-alarm rate over pairs
  *    with exact J < 0.35, plus the banding theory prediction
  *    1-(1-J^r)^b averaged over the pairs for comparison.
  *  - simhash: `Dedup.simhashNearDups` (maxDist 3) — detection rate per
  *    mutation rate (its "near" definition is Hamming<=3 on 64-bit token
  *    votes, not a Jaccard threshold; reported per-rate for the curve).
  *  - winnowing: `TextAnalysis.fingerprints` (k=8, w=4) — fingerprint-set
  *    Jaccard >= 0.5 over pairs with exact shingle J >= 0.5.
  *
  * Env: GRAFT_RECALL_PAIRS (default 2000), GRAFT_RECALL_RATES
  * (default "0.02,0.05,0.1,0.2,0.4"), GRAFT_RECALL_SEED (42).
  */
object NearDupRecall {
  private val TokRe = java.util.regex.Pattern.compile(Tokenizer.AsciiTokenPattern)

  def toks(text: String): Vector[String] = {
    val m = TokRe.matcher(text.toLowerCase)
    val b = Vector.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  def shingleSet(ts: Vector[String], n: Int): Set[Seq[String]] =
    if (ts.length < n) Set.empty else ts.sliding(n).map(_.toSeq).toSet

  def exactJaccard(a: String, b: String, n: Int = 3): Double = {
    val sa = shingleSet(toks(a), n); val sb = shingleSet(toks(b), n)
    val un = (sa ++ sb).size
    if (un == 0) 0.0 else (sa & sb).size.toDouble / un
  }

  /** Word-level mutation: each whitespace token replaced with a fresh
    * synthetic token with probability `rate` (deterministic in `rng`).
    */
  def mutate(text: String, rate: Double, rng: scala.util.Random): String =
    text.split("\\s+").map { w =>
      if (rng.nextDouble() < rate) "mut" + rng.nextInt(100000) else w
    }.mkString(" ")

  def main(args: Array[String]): Unit = {
    val nPairs = sys.env.getOrElse("GRAFT_RECALL_PAIRS", "2000").toInt
    val rates = sys.env.getOrElse("GRAFT_RECALL_RATES", "0.02,0.05,0.1,0.2,0.4")
      .split(',').map(_.trim.toDouble).toSeq
    val seed = sys.env.getOrElse("GRAFT_RECALL_SEED", "42").toLong
    val spark = graft.BenchCore.probeSession(32, "ndrecall")
    import spark.implicits._

    val bases = (0 until nPairs).map(i =>
      SynthCorpus.docOf(i / 100, i % 100).content)

    for (rate <- rates) {
      val rng = new scala.util.Random(seed * 1000 + (rate * 1000).toInt)
      val mutants = bases.map(t => mutate(t, rate, rng))
      val exact = bases.indices.map(i => exactJaccard(bases(i), mutants(i)))
      val corpus = (bases.indices.map(i => (f"b$i%05d", bases(i))) ++
        bases.indices.map(i => (f"m$i%05d", mutants(i)))).toDF("doc_id", "text")
        .repartition(64)
      val tokens = Tokenizer.splitTokens(col("text"), Tokenizer.AsciiTokenPattern)

      // minhash LSH, production family, default banding
      val mh = Dedup.minhashLsh(corpus, tokens, "doc_id",
          n = 3, m = 32, bands = 8, threshold = 0.5)
        .where(substring(col("id_a"), 1, 1) === "b" &&
          substring(col("id_b"), 1, 1) === "m" &&
          substring(col("id_a"), 2, 5) === substring(col("id_b"), 2, 5))
        .select(substring(col("id_a"), 2, 5).cast("int").as("i"),
          col("est_jaccard"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
      val hi = exact.zipWithIndex.filter(_._1 >= 0.5)
      val lo = exact.zipWithIndex.filter(_._1 < 0.35)
      val mhRecall =
        if (hi.isEmpty) -1.0
        else hi.count { case (_, i) => mh.contains(i) }.toDouble / hi.size
      val mhFalse =
        if (lo.isEmpty) -1.0
        else lo.count { case (_, i) => mh.contains(i) }.toDouble / lo.size
      // banding theory: P(candidate) = 1-(1-J^r)^b at r=4, b=8; est>=0.5
      // then filters candidates by signature agreement
      val theory =
        if (hi.isEmpty) -1.0
        else hi.map { case (j, _) => 1.0 - math.pow(1.0 - math.pow(j, 4), 8) }
          .sum / hi.size
      val estErr = mh.toSeq.collect {
        case (i, est) if i < exact.size => math.abs(est - exact(i)) }
      val meanErr = if (estErr.isEmpty) -1.0 else estErr.sum / estErr.size

      // simhash pigeonhole, production family
      val sh = Dedup.simhashNearDups(corpus, tokens, "doc_id", maxDist = 3)
        .where(substring(col("id_a"), 1, 1) === "b" &&
          substring(col("id_b"), 1, 1) === "m" &&
          substring(col("id_a"), 2, 5) === substring(col("id_b"), 2, 5))
        .count()

      // winnowing fingerprint-set Jaccard >= 0.5
      val fps = TextAnalysis.fingerprints(corpus, "doc_id", "text", k = 8, w = 4)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
      def fpJ(i: Int): Double = {
        val a = fps.getOrElse(f"b$i%05d", Set.empty[Long])
        val b = fps.getOrElse(f"m$i%05d", Set.empty[Long])
        val un = (a ++ b).size
        if (un == 0) 0.0 else (a & b).size.toDouble / un
      }
      val wnRecall =
        if (hi.isEmpty) -1.0
        else hi.count { case (_, i) => fpJ(i) >= 0.5 }.toDouble / hi.size

      spark.catalog.clearCache()
      println(f"[ndrecall] rate=$rate%.2f pairs=$nPairs " +
        f"meanExactJ=${exact.sum / exact.size}%.3f nJ>=0.5=${hi.size} " +
        f"| minhash recall=$mhRecall%.3f (theory=$theory%.3f) " +
        f"falseAlarm(J<0.35)=$mhFalse%.4f meanEstErr=$meanErr%.3f " +
        f"| simhash(d<=3)=${sh.toDouble / nPairs}%.3f " +
        f"| winnow(fpJ>=0.5) recall=$wnRecall%.3f")
    }
    spark.stop()
  }
}

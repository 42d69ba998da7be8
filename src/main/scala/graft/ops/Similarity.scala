package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.query.{ScoredDoc, TopKAggregator}

/** Similarity search over an embedding column (ArrayType(FloatType)) — the
  * approximate-nearest-neighbor counterpart of the BM25 engine for a
  * training-data pipeline. Two paths, mirroring the exact/pruned duality of
  * QueryEngine:
  *
  *  - `bruteForceTopK`: exact cosine top-k. Queries are broadcast (small
  *    side) against the full corpus; per-partition bounded heaps merge via
  *    TopKAggregator, so the shuffle carries at most k rows per (query,
  *    partition) — never the full similarity matrix.
  *
  *  - `lshTopK`: random-hyperplane LSH (deterministic seed). Vectors bucket
  *    by the sign-bit signature prefix; only same-bucket candidates are
  *    scored, then exactly re-ranked. Recall < 1 by construction — the
  *    scale path when the corpus no longer admits a full scan; `probes`
  *    multi-probe (flipping low bits) trades compute for recall.
  *
  * All math in double (sequential, order-deterministic) via the native
  * codegen dot-product Expression (graft.ops.expr.OpsExprs), no UDFs.
  */
object Similarity {

  /** Sequential dot product (native codegen Expression; accepts float or
    * double arrays, accumulates in double, left-to-right order).
    */
  def dotCol(a: Column, b: Column): Column =
    graft.ops.expr.OpsExprs.dot(a, b)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  private def toDouble(a: Column): Column =
    transform(a, x => x.cast("double"))

  /** cosine(a, b) over float arrays, computed in double. */
  def cosineCol(a: Column, b: Column): Column = {
    val ad = toDouble(a); val bd = toDouble(b)
    dotCol(ad, bd) / (normCol(ad) * normCol(bd))
  }

  /** Exact brute-force cosine top-k.
    *
    * @param corpus  (id LONG, embedding ARRAY<FLOAT>)
    * @param queries (qid LONG, embedding ARRAY<FLOAT>)
    * @return (qid, id, sim, rank) — rank on rounded sim, id tie-break
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     roundTo: Int = 6): DataFrame = {
    val q = broadcast(queries
      .select(col("qid"), toDouble(col("embedding")).as("qe"))
      .withColumn("qnorm", normCol(col("qe"))))
    val c = corpus
      .select(col("id"), toDouble(col("embedding")).as("ce"))
      .withColumn("cnorm", normCol(col("ce")))
    val scored = c.crossJoin(q)
      .select(col("qid"), col("id"),
        round(dotCol(col("qe"), col("ce")) / (col("qnorm") * col("cnorm")), roundTo)
          .as("sim"))
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredDoc])
    scored
      .groupBy("qid")
      .agg(topk(col("id"), col("sim")).as("hits"))
      .select(col("qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("qid"), col("hit.docId").as("id"), col("hit.score").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** LSH sizing rule: hyperplane count such that the EXPECTED bucket
    * population stays near `targetBucket` — nBits = ceil(log2(n /
    * targetBucket)). The within-bucket verify is quadratic in bucket
    * population, so bucket count MUST grow with n: fixed nBits at 1000×
    * the corpus turns the verify stage into an all-pairs join. (Skewed
    * real-world buckets still warrant a df-cap-style guard on top; the
    * rule bounds the expectation.)
    */
  def autoBits(n: Long, targetBucket: Int = 1024): Int =
    math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(
      math.max(1L, (n + targetBucket - 1) / targetBucket - 1)))

  /** Deterministic pseudo-random hyperplane component for (seed, bit, dim):
    * a fixed hash-mix mapped to [-1, 1).
    */
  private def planeComponent(seed: Long, bit: Int, dim: Int): Double = {
    val m = graft.util.SynthCorpus.mix(seed * 1000003L + bit * 10007L + dim)
    (m >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
  }

  /** The literal hyperplane matrix behind `lshSignature`, exposed so an
    * external oracle (the driver's DuckDB compare) can replicate bucket
    * assignment exactly from the same constants.
    */
  def planes(seed: Long, nBits: Int, dims: Int): Seq[Seq[Double]] =
    (0 until nBits).map(bit => (0 until dims).map(d => planeComponent(seed, bit, d)))

  /** Sign-bit LSH signature of `nBits` hyperplanes as a Column (bit i set
    * iff dot(v, plane_i) >= 0). Pure expressions: planes are literal arrays.
    */
  def lshSignature(embedding: Column, dims: Int, nBits: Int, seed: Long): Column = {
    val e = toDouble(embedding)
    (0 until nBits).map { bit =>
      val plane = array((0 until dims).map(d => lit(planeComponent(seed, bit, d))): _*)
      when(dotCol(e, plane) >= 0.0, lit(1L << bit)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Deterministic IVF coarse centroids: the corpus vectors whose
    * md5(id-as-string) sorts smallest — a reproducible uniform sample
    * (md5 is order-independent of ingestion layout and computable by any
    * SQL engine, so an external oracle can re-derive the exact cells).
    * Lloyd refinement would move cell BOUNDARIES but not the operator
    * shape; a data-independent rule keeps the op byte-reproducible.
    * Runs one TakeOrderedAndProject job (top-nCells by hash — no global
    * sort, no window); the result is driver-held and broadcast, exactly
    * like any IVF implementation ships its centroid table.
    *
    * @return (cid 1..nCells, centroid, norm) — tiny (≤ nCells rows)
    */
  def ivfCentroids(corpus: DataFrame, nCells: Int): Seq[(Long, Seq[Double], Double)] =
    corpus
      .select(col("id"), toDouble(col("embedding")).as("ce"))
      .withColumn("h", md5(col("id").cast("string").cast("binary")))
      .orderBy("h", "id").limit(nCells)
      .select(col("ce"), normCol(col("ce")).as("n"))
      .collect()
      .zipWithIndex
      .map { case (r, i) => ((i + 1).toLong, r.getSeq[Double](0), r.getDouble(1)) }
      .toSeq

  /** IVF (inverted-file) approximate top-k: same output shape as
    * bruteForceTopK. Corpus vectors are assigned to Voronoi cells around
    * [[ivfCentroids]]; a query scores ONLY the vectors of its `nProbe`
    * nearest cells. The coarse-quantization scale path: where LSH prunes
    * by random sign-bits, IVF prunes by data-located cells — recall
    * concentrates on the nearest cells, and `nProbe` trades compute for
    * recall.
    *
    * Scale shape: assignment is ONE broadcast-nested-loop pass over the
    * corpus with a map-side partial argmax (shuffle = 1 row per vector —
    * the ×nCells candidate rows never cross the network); the cell id is
    * the candidate join key (in a persisted deployment: the partition
    * key of the stored inverted lists, so probes prune partitions); the
    * finish is the same bounded-heap merge as every top-k here — ≤ k rows
    * per (query, partition) shuffle, no windows anywhere.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 256, nProbe: Int = 8,
              roundTo: Int = 6): DataFrame = {
    val spark = corpus.sparkSession
    val cents = centroidsDf(spark, ivfCentroids(corpus, nCells))
    val assigned = assignCells(corpus, cents, roundTo)
    scoreProbed(assigned, probeCells(queries, cents, nProbe, roundTo), k, roundTo)
  }

  private def centroidsDf(spark: org.apache.spark.sql.SparkSession,
                          cents: Seq[(Long, Seq[Double], Double)]): DataFrame =
    spark.createDataFrame(cents.map { case (cid, ce, n) => (cid, ce, n) })
      .toDF("cid", "cent", "centNorm")

  private def cellSim(ve: Column, vnorm: Column, roundTo: Int): Column =
    round(dotCol(ve, col("cent")) / (vnorm * col("centNorm")), roundTo)

  /** Voronoi assignment: argmax cell per vector — struct max orders by
    * (sim, -cid), ties to the smaller cid, mirroring the oracle's
    * (sim DESC, cid ASC). One broadcast pass, map-side partial argmax:
    * the shuffle carries 1 row per vector.
    */
  private def assignCells(corpus: DataFrame, cents: DataFrame,
                          roundTo: Int): DataFrame =
    corpus
      .select(col("id"), toDouble(col("embedding")).as("ce"))
      .withColumn("cnorm", normCol(col("ce")))
      .crossJoin(broadcast(cents))
      .select(col("id"), col("ce"), col("cnorm"), col("cid"),
        cellSim(col("ce"), col("cnorm"), roundTo).as("csim"))
      .groupBy("id")
      .agg(
        max(struct(col("csim"), (-col("cid")).as("ncid"))).as("best"),
        first(col("ce")).as("ce"), first(col("cnorm")).as("cnorm"))
      .select(col("id"), col("ce"), col("cnorm"), (-col("best.ncid")).as("cid"))

  /** Top-nProbe cells per query via the same bounded heap as the finish:
    * (qid, qe, qnorm, cid) — one row per probed cell.
    */
  private def probeCells(queries: DataFrame, cents: DataFrame, nProbe: Int,
                         roundTo: Int): DataFrame = {
    val probeK = udaf(new TopKAggregator(nProbe), Encoders.product[ScoredDoc])
    broadcast(queries
      .select(col("qid"), toDouble(col("embedding")).as("qe"))
      .withColumn("qnorm", normCol(col("qe")))
      .crossJoin(broadcast(cents))
      .select(col("qid"), col("qe"), col("qnorm"), col("cid"),
        cellSim(col("qe"), col("qnorm"), roundTo).as("csim"))
      .groupBy("qid")
      .agg(probeK(col("cid"), col("csim")).as("cells"),
        first(col("qe")).as("qe"), first(col("qnorm")).as("qnorm"))
      .select(col("qid"), col("qe"), col("qnorm"),
        explode(col("cells.docId")).as("cid")))
  }

  /** Candidates = vectors in probed cells only (cells are disjoint, so no
    * candidate dedup is needed, unlike multi-probe LSH), bounded-heap
    * finish.
    */
  private def scoreProbed(assigned: DataFrame, probes: DataFrame, k: Int,
                          roundTo: Int): DataFrame = {
    val scored = assigned.join(probes, "cid")
      .select(col("qid"), col("id"),
        round(dotCol(col("qe"), col("ce")) / (col("qnorm") * col("cnorm")), roundTo)
          .as("sim"))
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredDoc])
    scored
      .groupBy("qid")
      .agg(topk(col("id"), col("sim")).as("hits"))
      .select(col("qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("qid"), col("hit.docId").as("id"), col("hit.score").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  // ---- persisted IVF index (storable artifact, like the BM25 index) ------

  /** Handle over a persisted IVF index: a tiny centroid table (driver-held
    * on open, as any IVF ships its centroids) + cell-partitioned inverted
    * lists, with params pinned in the store's properties so query-time
    * rounding/probing can't drift from the build.
    */
  final class IvfIndex(val spark: org.apache.spark.sql.SparkSession,
                       val indexDir: String) {
    private val store = new graft.store.IcebergLikeStore(indexDir)
    require(store.isComplete, s"IVF index at $indexDir is incomplete")
    val props: Map[String, String] = store.readProperties()
    val nCells: Int = props("nCells").toInt
    val roundTo: Int = props("roundTo").toInt
    /** (cid, centroid, norm) — ≤ nCells rows, one bounded collect. */
    lazy val centroids: Seq[(Long, Seq[Double], Double)] =
      spark.read.parquet(s"$indexDir/centroids").collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1), r.getDouble(2))).toSeq
    /** cid comes back as a PARTITION column whose type is inferred (int by
      * default, string when partitionColumnTypeInference is disabled) —
      * cast it to the long the probes/centroids carry so the probe join
      * never depends on the inference setting or on implicit casts.
      */
    def cells: DataFrame = spark.read.parquet(s"$indexDir/cells")
      .withColumn("cid", col("cid").cast("long"))
  }

  /** Build (or no-op over) a persisted IVF index at `indexDir`: centroids
    * via [[ivfCentroids]], assignment written PARTITIONED BY cell id — the
    * layout that turns a probe into partition pruning instead of a scan.
    */
  def ivfBuild(corpus: DataFrame, indexDir: String, nCells: Int = 256,
               roundTo: Int = 6): IvfIndex = {
    val spark = corpus.sparkSession
    val store = new graft.store.IcebergLikeStore(indexDir)
    if (!store.isComplete) {
      val cents = ivfCentroids(corpus, nCells)
      centroidsDf(spark, cents).coalesce(1)
        .write.mode("overwrite").parquet(s"$indexDir/centroids")
      assignCells(corpus, centroidsDf(spark, cents), roundTo)
        // one writer task per cell value; cells ≈ uniform by construction
        .repartition(col("cid")).sortWithinPartitions("cid", "id")
        .write.mode("overwrite").partitionBy("cid").parquet(s"$indexDir/cells")
      store.writeProperties(Map(
        "engine" -> "graft-ivf", "nCells" -> nCells.toString,
        "roundTo" -> roundTo.toString))
    }
    new IvfIndex(spark, indexDir)
  }

  def ivfOpen(spark: org.apache.spark.sql.SparkSession, indexDir: String): IvfIndex =
    new IvfIndex(spark, indexDir)

  /** Query a persisted IVF index: the probed cell ids (≤ nQueries × nProbe,
    * collected bounded) prune the cell PARTITIONS before the candidate
    * join — at corpus scale a probe reads nProbe/nCells of the stored
    * lists, never the whole table.
    */
  def ivfSearch(index: IvfIndex, queries: DataFrame, k: Int,
                nProbe: Int = 8): DataFrame = {
    val cents = centroidsDf(index.spark, index.centroids)
    val probes = probeCells(queries, cents, nProbe, index.roundTo)
    // bounded collect (≤ nCells distinct values by construction); the probe
    // table itself is a broadcast-small frame, so recomputing it for the
    // candidate join is cheaper than pinning a cache entry per call
    val cids = probes.select("cid").distinct().collect().map(_.getLong(0)).toSeq
    val pruned = index.cells.where(col("cid").isInCollection(cids))
    scoreProbed(pruned, probes, k, index.roundTo)
  }

  /** LSH-bucketed approximate top-k: same output shape as bruteForceTopK.
    * Candidates = corpus vectors sharing the query's bucket (plus buckets
    * at Hamming distance 1 when `probes` > 0), re-ranked exactly.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              dims: Int, nBits: Int = 12, seed: Long = 42L,
              probes: Int = 1, roundTo: Int = 6): DataFrame = {
    val sig = (c: Column) => lshSignature(c, dims, nBits, seed)
    val c = corpus
      .select(col("id"), toDouble(col("embedding")).as("ce"),
        sig(col("embedding")).as("bucket"))
      .withColumn("cnorm", normCol(col("ce")))
    // query probes: own bucket + single-bit flips of the lowest `probes` bits
    val probeBuckets = (base: Column) =>
      array((lit(0L) +: (0 until probes).map(b => lit(1L << b)))
        .map(f => base.bitwiseXOR(f)): _*)
    val q = broadcast(queries
      .select(col("qid"), toDouble(col("embedding")).as("qe"),
        explode(probeBuckets(sig(col("embedding")))).as("bucket"))
      .withColumn("qnorm", normCol(col("qe"))))
    val scored = c.join(q, "bucket")
      .select(col("qid"), col("id"),
        round(dotCol(col("qe"), col("ce")) / (col("qnorm") * col("cnorm")), roundTo)
          .as("sim"))
      .dropDuplicates("qid", "id") // multi-probe can hit the same candidate
    // bounded-heap finish (same as bruteForceTopK): ≤ k rows per (query,
    // partition) cross the final shuffle — a window row_number here would
    // instead move EVERY candidate of a query onto one task
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredDoc])
    scored
      .groupBy("qid")
      .agg(topk(col("id"), col("sim")).as("hits"))
      .select(col("qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("qid"), col("hit.docId").as("id"), col("hit.score").as("sim"),
        (col("pos") + 1).cast("int").as("rank"))
  }
}

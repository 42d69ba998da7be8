package graft.query

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._

import graft.index.{Codec, IndexBuilder}
import graft.index.expr.CodecExprs
import graft.score.BM25Params
import graft.store.IcebergLikeStore
import graft.tokenize.Tokenizer

/** Handle over a built index (tables + scoring metadata from the commit
  * log, so query-side params can't drift from the build — the lesson of the
  * reference's Elasticsearch settings dance, benchmark/on_elastic.py:72-112).
  */
class BM25Index(val spark: SparkSession, val indexDir: String) {
  val store = new IcebergLikeStore(indexDir)
  require(store.isComplete, s"index at $indexDir has no _properties.json (incomplete build)")
  val props: Map[String, String] = store.readProperties()
  val params: BM25Params = BM25Params(
    k1 = props("k1").toDouble, b = props("b").toDouble,
    delta = props("delta").toDouble, method = props("method"))
  val tokenPattern: String = props("tokenPattern")
  /** Stemming on/off, read from the build's properties (pre-stem-toggle
    * indexes recorded "snowball-en" unconditionally).
    */
  val stem: Boolean = props.getOrElse("stemmer", "snowball-en") != "none"
  val numDocs: Long = props("numDocs").toLong
  val avgdl: Double = props("avgdl").toDouble
  val numBuckets: Int = props("numBuckets").toInt
  val numSalts: Int = props.getOrElse("numSalts", "1").toInt
  val saltShift: Int = props.getOrElse("saltShift", "20").toInt

  def postings: DataFrame = spark.read.parquet(s"$indexDir/postings")

  /** Per-term global stats (term, df, ctf) — the query-side term
    * dictionary. Full-vocabulary scans of this table are the FALLBACK
    * path; bounded term sets resolve df through the bucket-pruned
    * postings scan instead (QueryEngine.postingTermDf).
    */
  def termstats: DataFrame = spark.read.parquet(s"$indexDir/termstats")

  /** Whether this index stores per-document term vectors (the Pyserini
    * `--storeDocvectors` analogue; IndexBuilder.Config.storeDocVectors).
    * Indexes built before the docvecs stage existed report false.
    */
  val hasDocVectors: Boolean = props.get("docVectors").contains("true")

  /** Docvecs layout: "packed" (one row per doc — docIntId, salt, terms[],
    * tfs[]) for indexes built/backfilled from round 6 on; "rows" for legacy
    * round-5 indexes (one row per (doc, term)). Rm3.feedbackVectors
    * branches on this when unpacking.
    */
  val docvecsFormat: String =
    props.getOrElse("docvecsFormat", if (hasDocVectors) "rows" else "none")

  /** Stored doc term vectors, salt-partitioned and docIntId-sorted within
    * files (see [[docvecsFormat]] for the row layout) — fetch through
    * Rm3.feedbackVectors so partition + row-group pruning apply.
    */
  def docvecs: DataFrame = {
    require(hasDocVectors,
      s"index at $indexDir was built without doc vectors " +
        "(IndexBuilder.Config.storeDocVectors = false)")
    spark.read.parquet(s"$indexDir/docvecs")
  }

  /** docs dimension (docIntId → docId, len): cached MEMORY_AND_DISK — it is
    * re-read by every query's finish join (spills to disk if the corpus is
    * too large to pin, so this stays safe at scale). Deliberately cached
    * UNpartitioned: pre-repartitioning by docIntId was tried and measured
    * SLOWER end to end (the cached exchange cost more than the per-batch
    * shuffle it saved).
    */
  lazy val docs: DataFrame = {
    val d = spark.read.parquet(s"$indexDir/docs")
    d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    d
  }
}

/** Batch top-k retrieval over a BM25Index. Two physical paths, cross-checked
  * in tests exactly like the reference cross-asserts its numpy/numba/jax
  * backends with np.allclose (benchmark/on_bm25s.py:163-211):
  *
  *  - `searchExact`: declarative Catalyst plan — query terms broadcast-join
  *    postings (with bucket partition pruning + term predicate pushdown),
  *    block decode via native codegen expressions, hash-agg score sum,
  *    bounded-heap grouped top-k. The Spark-native analogue of the
  *    reference's dense score-all + argpartition (Q1+Q2, SURVEY.md §2.5) —
  *    sparse by construction: only docs containing a query term are touched.
  *
  *  - `searchWand`: per-(term,salt) posting runs are repartitioned by salt
  *    (contiguous doc ranges), and each task runs document-at-a-time WAND
  *    with block-max skipping and a bounded heap per query; per-salt top-k
  *    candidates then merge through the same heap aggregate. The analogue of
  *    PISA's `block_max_maxscore` (benchmark/on_pisa.py:51,98-100).
  *
  * Query semantics pinned by the reference (benchmark/on_bm25s.py:131-150):
  * duplicate query tokens contribute once per occurrence (qtf multiplier);
  * OOV query terms contribute 0; queries whose tokens are all stopwords /
  * OOV produce no result rows (the reference returns arbitrary zero-score
  * docs there — under-determined, see SURVEY.md §5.2).
  *
  * Result ordering: (score DESC, docId ASC by surrogate id) with rank 1..k.
  */
object QueryEngine {

  /** Tokenized, term-frequency-weighted queries: (qid, term, qtf). */
  private def queryTerms(index: BM25Index, queries: DataFrame): DataFrame =
    queries
      .select(col("qid"),
        explode(Tokenizer.tokens(col("query"), index.tokenPattern, index.stem))
          .as("term"))
      .groupBy("qid", "term").agg(count(lit(1)).cast("double").as("qtf"))

  /** Above this many distinct terms, the candidate filter switches from an
    * In() literal (term pushdown to parquet row groups) to a broadcast
    * semi-join: a 100k-term In literal bloats plan size/planning time and
    * the row-group stats stop helping at that selectivity anyway.
    */
  def maxInTerms(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.maxInTerms").map(_.toInt).getOrElse(8192)

  /** Candidate posting rows for the given term set, with bucket partition
    * pruning (terms hash to a known bucket subset) and term pushdown.
    */
  private def candidates(index: BM25Index, terms: Seq[String]): DataFrame = {
    val buckets = terms
      .map(t => graft.util.Hashing.bucketOfTerm(t, index.numBuckets)).distinct
    val byBucket = index.postings
      .where(col("bucket").isInCollection(buckets))
    if (terms.size <= maxInTerms(index.spark))
      byBucket.where(col("term").isInCollection(terms))
    else {
      import index.spark.implicits._
      byBucket.join(
        broadcast(terms.toDF("term").distinct()), Seq("term"), "left_semi")
    }
  }

  /** Exact global df for a bounded term set via the bucket-pruned,
    * term-pushed postings scan (df rides on every posting row) — no
    * vocabulary-wide termstats scan. Result: (term, df), one row per
    * term present in the index.
    */
  private[query] def postingTermDf(index: BM25Index, terms: Seq[String]): DataFrame =
    candidates(index, terms)
      .select(col("term"), col("df"))
      .dropDuplicates("term")

  /** Max allowed-doc rows a query-time doc filter may collect and broadcast
    * into the WAND/TAAT kernels (sorted long array; 2M docs ≈ 16 MiB).
    * Filters selecting more docs than this fall back to the declarative
    * semi-join scoring path — still exact, fully distributed, no driver
    * materialization of the allowed set.
    */
  def filterMaxBroadcastDocs(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.filterMaxBroadcastDocs")
      .map(_.toInt).getOrElse(1 << 21)

  /** The allowed docIntId set for a query-time doc filter, as a sorted
    * array IF it fits `filterMaxBroadcastDocs` (one bounded limit-collect
    * job against the cached docs dimension), else None — callers then use
    * a distributed semi-join instead of a kernel-side membership test.
    */
  private[graft] def collectAllowed(index: BM25Index,
                                    docFilter: Column): Option[Array[Long]] = {
    val bound = filterMaxBroadcastDocs(index.spark)
    // bound + 1 would wrap negative at Int.MaxValue ("no cap" config)
    val lim = math.min(bound.toLong + 1L, Int.MaxValue.toLong).toInt
    val rows = index.docs.where(docFilter).select(col("docIntId"))
      .limit(lim).collect()
    if (rows.length > bound) None
    else {
      val arr = rows.map(_.getLong(0))
      java.util.Arrays.sort(arr)
      Some(arr)
    }
  }

  /** Max hit rows (nQueries × k) the finish join may broadcast; above this
    * it becomes a shuffled hash join (hits as build side — docs is never
    * sorted or broadcast). 10k queries × k=1000 would otherwise push a
    * 10M-row broadcast to the driver + every executor.
    */
  def broadcastHitsMaxRows(spark: SparkSession): Long =
    spark.conf.getOption("spark.graft.broadcastHitsMaxRows")
      .map(_.toLong).getOrElse(1L << 20)

  /** Finish: grouped bounded-heap top-k, rank assignment, docId resolution.
    * `nHitsUpperBound` = nQueries × k, known cheaply by both callers — gates
    * the docId-resolution join strategy.
    */
  private def finishTopK(index: BM25Index, scored: DataFrame, k: Int,
                         nHitsUpperBound: Long): DataFrame = {
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredDoc])
    val hits = scored
      .groupBy("qid")
      .agg(topk(col("docIntId"), col("score")).as("hits"))
      .select(col("qid"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(col("qid"), col("hit.docId").as("docIntId"),
        col("hit.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
    val joined =
      if (nHitsUpperBound <= broadcastHitsMaxRows(index.spark))
        index.docs.join(broadcast(hits), "docIntId")
      else // shuffled hash join, hits as the (small) hash build side
        index.docs.join(hits.hint("shuffle_hash"), "docIntId")
    joined.select(col("qid"), col("docId"), col("score"), col("rank"))
  }

  /** WAND-path finish over int-indexed partials (qidx = position in the
    * chunk's query array): the heap aggregate groups on a 4-byte int
    * instead of a per-row UTF8 string, and qid strings are resolved only
    * AFTER top-k selection, on the bounded hit set, by an O(1)
    * `element_at` into the chunk's qid array literal — no extra join
    * stage. The literal is bounded by wandQueryChunkRows, the same bound
    * that already caps the chunk's broadcast query array.
    */
  private def finishTopKIdx(index: BM25Index, partials: DataFrame, k: Int,
                            qids: Array[String]): DataFrame = {
    val spark = index.spark
    val nHitsUpperBound = qids.length.toLong * k
    val topk = udaf(new TopKAggregator(k), Encoders.product[ScoredDoc])
    val qidOf = element_at(typedLit(qids.toSeq), col("qidx") + 1)
    val hits = partials
      .groupBy("qidx")
      .agg(topk(col("docIntId"), col("score")).as("hits"))
      .select(col("qidx"), posexplode(col("hits")).as(Seq("pos", "hit")))
      .select(qidOf.as("qid"), col("hit.docId").as("docIntId"),
        col("hit.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
    val joined =
      if (nHitsUpperBound <= broadcastHitsMaxRows(spark))
        index.docs.join(broadcast(hits), "docIntId")
      else
        index.docs.join(hits.hint("shuffle_hash"), "docIntId")
    joined.select(col("qid"), col("docId"), col("score"), col("rank"))
  }

  /** Exact path: join + aggregate over decoded blocks.
    *
    * This is the declarative cross-check twin (the role rank_bm25 /
    * bm25s's numpy backend plays in the reference), not the batch
    * engine: the postings⋈query-terms join fans out each posting once
    * per query sharing the term, so batches with many term-overlapping
    * queries pay #postings × #sharing-queries — use searchWand for
    * throughput work.
    */
  def searchExact(index: BM25Index, queries: DataFrame, k: Int,
                  docFilter: Option[Column] = None): DataFrame =
    searchExactImpl(index, queries, k, docFilter, tryBroadcastFilter = true)

  /** `tryBroadcastFilter = false` is the over-bound fallback from
    * `searchWand`: its `collectAllowed` already proved the filter exceeds
    * the broadcast bound, so re-running the bounded limit-collect here
    * would repeat a multi-million-row driver job just to rediscover None.
    */
  private def searchExactImpl(index: BM25Index, queries: DataFrame, k: Int,
                              docFilter: Option[Column],
                              tryBroadcastFilter: Boolean): DataFrame =
    searchExactTerms(index, queryTerms(index, queries), k, docFilter,
      tryBroadcastFilter)

  /** Exact path over pre-tokenized weighted terms (qid, term, qtf) — the
    * declarative twin shared by the text entry point and the weighted
    * path's over-bound filter fallback.
    */
  private def searchExactTerms(index: BM25Index, qt: DataFrame, k: Int,
                               docFilter: Option[Column],
                               tryBroadcastFilter: Boolean): DataFrame = {
    if (index.numDocs == 0) return emptyResult(index.spark)
    // ONE job collects the distinct term set AND the distinct-qid count
    // (the finish-join row bound) — previously a separate queries.count()
    // job ran per call (searchWand's limit-collect lesson, ported)
    val agg = qt.agg(collect_set(col("term")), countDistinct(col("qid"))).head()
    val terms = agg.getSeq[String](0)
    val nQueries = agg.getLong(1)
    if (terms.isEmpty) return emptyResult(index.spark)
    // pair expansion via posexplode + element_at (both codegen): zip_with
    // is CodegenFallback — interpreted per element, measured 460s vs ~8s
    // for the whole path at 480k docs / 9.5M candidate postings
    val cand = candidates(index, terms)
      .select(col("term"), explode(col("blocks")).as("block"))
      .select(col("term"),
        CodecExprs.varbyteDecode(col("block.ids"), col("block.n")).as("ids"),
        CodecExprs.floatsDecode(col("block.imps")).as("imps"))
      .join(broadcast(qt), "term")
      .select(col("qid"), col("qtf"), col("imps"),
        posexplode(col("ids")).as(Seq("pos", "docIntId")))
      .select(col("qid"), col("docIntId"),
        (element_at(col("imps"), col("pos") + 1) * col("qtf")).as("contrib"))
    // filtered retrieval (Lucene filter semantics: stats stay global): the
    // allowed set semi-joins the candidate stream BEFORE aggregation and
    // top-k — broadcast when it fits the bound, shuffled hash otherwise
    // (the scale path for low-selectivity filters; never a driver set)
    val flt = docFilter match {
      case None => cand
      case Some(f) =>
        val spark = index.spark
        val allowed = if (tryBroadcastFilter) collectAllowed(index, f) else None
        allowed match {
          case Some(arr) =>
            import spark.implicits._
            cand.join(broadcast(arr.toSeq.toDF("docIntId")),
              Seq("docIntId"), "left_semi")
          case None =>
            cand.join(
              index.docs.where(f).select("docIntId").hint("shuffle_hash"),
              Seq("docIntId"), "left_semi")
        }
    }
    val scored = flt.groupBy("qid", "docIntId")
      .agg(sum("contrib").as("score"))
    finishTopK(index, scored, k, nQueries * k)
  }

  /** Driver-side query chunk size for the WAND path: each chunk's tokenized
    * query terms are broadcast to executors (the WAND kernel needs a whole
    * query's cursors in one task). Chunking bounds driver + broadcast memory
    * at training-pipeline query volumes; `toLocalIterator` streams chunks so
    * the full query set is never materialized on the driver at once.
    */
  def wandQueryChunkRows(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.wandQueryChunkRows")
      .map(_.toInt).getOrElse(20000)

  /** At k ≥ this, the per-salt kernel switches from document-at-a-time WAND
    * to term-at-a-time dense accumulation (Wand.SaltTaat): deep-k thresholds
    * rise too slowly for block-max skipping to pay for cursor overhead —
    * the regime where the reference's own fast engine (bm25s) scores all
    * docs and argpartitions (benchmark/on_bm25s.py:144-150).
    */
  def scoreAllMinK(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.scoreAllMinK")
      .map(_.toInt).getOrElse(128)

  /** At ≥ this many queries per chunk, TAAT is selected even at small k:
    * a large batch amortizes each (term,salt) run's decode across many
    * queries and raw array accumulation beats per-query cursor machinery
    * (measured 2.6× at 2.4M docs × 5000 queries × k=10). Small batches /
    * single queries keep DAAT WAND, whose block-max skipping wins when
    * decode sharing is moot.
    */
  def taatMinBatchQueries(spark: SparkSession): Int =
    spark.conf.getOption("spark.graft.taatMinBatchQueries")
      .map(_.toInt).getOrElse(128)

  /** Tokenized query chunks for the WAND/TAAT path (driver-side arrays).
    * Small batches: one collect (the common interactive/bench case).
    * Large batches: stream partition-sized chunks through the driver —
    * toLocalIterator runs a job per partition, so size partitions to the
    * chunk target first; driver memory stays bounded by one chunk.
    */
  private def groupedQueryTerms(index: BM25Index, queries: DataFrame): DataFrame =
    queryTerms(index, queries)
      .groupBy("qid").agg(collect_list(struct(col("term"), col("qtf"))).as("ts"))

  private def decodeGrouped(r: Row): (String, Array[(String, Double)]) =
    (r.getString(0),
      r.getSeq[Row](1).map(t => (t.getString(0), t.getDouble(1))).toArray)

  /** Tokenized query chunks for the WAND/TAAT path (driver-side arrays).
    * Large batches stream partition-sized chunks through the driver —
    * toLocalIterator runs a job per partition, so size partitions to the
    * chunk target first; driver memory stays bounded by one chunk.
    */
  private[graft] def queryChunks(index: BM25Index, queries: DataFrame,
                                 nQueries: Long): Iterator[Array[(String, Array[(String, Double)])]] =
    groupedChunks(index, groupedQueryTerms(index, queries), nQueries)

  /** As queryChunks, over an already-grouped (qid, ts[(term, weight)])
    * frame — shared by the tokenizing and the weighted-query paths.
    */
  private def groupedChunks(index: BM25Index, grouped: DataFrame,
                            nQueries: Long): Iterator[Array[(String, Array[(String, Double)])]] = {
    val chunkRows = wandQueryChunkRows(index.spark)
    if (nQueries <= chunkRows) Iterator(grouped.collect().map(decodeGrouped))
    else {
      val nParts = math.max(1, ((nQueries + chunkRows - 1) / chunkRows).toInt)
      grouped.repartition(nParts).toLocalIterator().asScala
        .map(decodeGrouped).grouped(chunkRows).map(_.toArray)
    }
  }

  /** WAND path: per-salt pruned scan (kernel chosen by depth). The common
    * case (batch fits one chunk) is ONE optimistic limit-collect job that
    * ships the RAW (qid, query) rows — tokenization/qtf for a bounded
    * batch runs driver-side through the scalar twin of TokenizeExpr
    * (behavior-identical, tested), so no per-call tokenize job or
    * count() job exists; only over-chunk batches fall back to a counted
    * distributed streaming pass.
    */
  /** Filtered retrieval (searchWand): the allowed docIntId set rides into
    * the kernels as one broadcast sorted array; membership is checked at
    * heap/accum insertion, so WAND's threshold pruning stays exact (upper
    * bounds are unchanged; the threshold only ever reflects allowed docs).
    * Left = terminal result: an empty filter short-circuits, and a filter
    * too large for the broadcast bound falls back to the declarative
    * semi-join path (exact and distributed at any selectivity) — with the
    * broadcast retry suppressed, since this call just proved it over-bound.
    */
  private def resolveDocFilter(index: BM25Index, docFilter: Option[Column],
                               overBoundFallback: => DataFrame)
      : Either[DataFrame, Option[org.apache.spark.broadcast.Broadcast[Array[Long]]]] =
    docFilter match {
      case None => Right(None)
      case Some(f) => collectAllowed(index, f) match {
        case Some(arr) if arr.isEmpty => Left(emptyResult(index.spark))
        case Some(arr) => Right(Some(index.spark.sparkContext.broadcast(arr)))
        case None => Left(overBoundFallback)
      }
    }

  def searchWand(index: BM25Index, queries: DataFrame, k: Int,
                 docFilter: Option[Column] = None): DataFrame = {
    val spark = index.spark
    // empty index: its postings table has no partitions, so the candidate
    // scan's bucket/term columns would not even resolve
    if (index.numDocs == 0) return emptyResult(spark)
    // the doc filter is resolved only AFTER the cheap batch probes below:
    // an empty or all-stopword batch must not pay the docs-dimension
    // filter job, and every early return must precede broadcast creation
    // (a broadcast minted before these returns would leak undestroyed)
    val chunkRows = wandQueryChunkRows(spark)
    val head = queries.select(col("qid"), col("query")).limit(chunkRows + 1).collect()
    if (head.isEmpty) return emptyResult(spark)
    if (head.length <= chunkRows) {
      // duplicate qid rows merge their token multisets (parity with the
      // distributed groupBy(qid, term) path)
      val qArr: Array[(String, Array[(String, Double)])] = head
        .map(r => (r.getString(0), Option(r.getString(1)).getOrElse("")))
        .groupBy(_._1).iterator
        .map { case (qid, rows) =>
          val counts = scala.collection.mutable.LinkedHashMap.empty[String, Double]
          rows.foreach { case (_, text) =>
            Tokenizer.tokenizeScalar(text, index.tokenPattern, index.stem)
              .foreach(t => counts.update(t, counts.getOrElse(t, 0.0) + 1.0))
          }
          (qid, counts.toArray)
        }
        .filter(_._2.nonEmpty) // all-stopword/empty queries produce no rows
        .toArray
      if (qArr.isEmpty) return emptyResult(spark)
      val allowedBc = resolveDocFilter(index, docFilter,
        searchExactImpl(index, queries, k, docFilter, tryBroadcastFilter = false)) match {
        case Left(terminal) => return terminal
        case Right(bc) => bc
      }
      val (partials, bq) = wandPartialsWithHandle(index, qArr, k, allowedBc)
      val finished = finishTopKIdx(index, partials, k, qArr.map(_._1))
      return allowedBc match {
        case Some(bc) => finishEagerDestroy(index, finished, Seq(bc, bq))
        case None => finished
      }
    }
    val allowedBc = resolveDocFilter(index, docFilter,
      searchExactImpl(index, queries, k, docFilter, tryBroadcastFilter = false)) match {
      case Left(terminal) => return terminal
      case Right(bc) => bc
    }
    searchGroupedChunked(index, groupedQueryTerms(index, queries), k, allowedBc)
  }

  /** Eagerly materialize a small-batch finish into the chunk spill dir and
    * destroy the broadcasts it referenced. Used by the FILTERED small-batch
    * paths only: the plain path stays fully lazy, but an allowed-set
    * broadcast is up to ~16 MiB per call — relying on ContextCleaner GC
    * would pin them across a long-lived session of repeated filtered
    * queries. Result size is bounded by nQueries × k.
    */
  private def finishEagerDestroy(index: BM25Index, finished: DataFrame,
      toDestroy: Seq[org.apache.spark.broadcast.Broadcast[_]]): DataFrame = {
    val spark = index.spark
    val dir = s"${chunkSpillRoot(index)}/${java.util.UUID.randomUUID()}"
    graft.util.TempFs.registerForCleanup(spark, dir)
    // destroy in a finally: a failed spill write (disk full, task failure)
    // must still release the broadcasts — pinning them until ContextCleaner
    // GC is the exact leak this method exists to avoid
    try finished.write.parquet(dir)
    finally toDestroy.foreach(_.destroy())
    spark.read.parquet(dir)
  }

  /** Large batch: count once, then stream partition-sized chunks through
    * the driver. Chunks partition the QUERY set, so each chunk's results
    * are final on their own: every chunk runs kernel + finish as its OWN
    * job whose finished (≤ nChunkQueries × k) rows land in a temp
    * parquet, and the chunk's query-array broadcast is destroyed before
    * the next chunk is collected. A lazy union of chunk DataFrames would
    * instead keep EVERY chunk's driver array + executor broadcast
    * resident for the whole job; this way driver and executor memory
    * really are bounded by one chunk. Temp files are removed at JVM exit
    * (the result DataFrame reads them lazily until then).
    */
  private def searchGroupedChunked(index: BM25Index, grouped: DataFrame, k: Int,
      allowedBc: Option[org.apache.spark.broadcast.Broadcast[Array[Long]]]): DataFrame = {
    val spark = index.spark
    val nQueries = grouped.count()
    val tmp = s"${chunkSpillRoot(index)}/${java.util.UUID.randomUUID()}"
    graft.util.TempFs.registerForCleanup(spark, tmp) // removed at JVM exit
    val chunkDirs = scala.collection.mutable.ArrayBuffer.empty[String]
    groupedChunks(index, grouped, nQueries).map(_.filter(_._2.nonEmpty))
      .filter(_.nonEmpty).foreach { qArr =>
      val (partials, bq) = wandPartialsWithHandle(index, qArr, k, allowedBc)
      val dir = s"$tmp/chunk-${chunkDirs.size}"
      finishTopKIdx(index, partials, k, qArr.map(_._1)).write.parquet(dir)
      bq.destroy()
      chunkDirs += dir
    }
    // every chunk's job has run; the allowed-set broadcast is done with
    allowedBc.foreach(_.destroy())
    if (chunkDirs.isEmpty) return emptyResult(spark)
    spark.read.parquet(chunkDirs.toSeq: _*)
  }

  /** Weighted-term batch retrieval: `weighted` rows (qid, term, qtf) stand
    * in for tokenized query text — `qtf` is any NON-NEGATIVE per-term
    * weight (RM3 expansion weights, field boosts), generalizing the
    * duplicate-token count the text path produces. Negative weights are
    * rejected: the DAAT kernel's block-max pruning relies on
    * maxImpact × weight being an UPPER bound of a term's contribution,
    * which only holds for weight ≥ 0 (a negative weight could silently
    * drop valid results under WAND while TAAT stayed exact). Scoring is
    * Σ weight × impact through the same WAND/TAAT kernels and finish as
    * [[searchWand]]; terms absent from the index contribute 0 (OOV
    * semantics unchanged). `docFilter` composes exactly as in
    * [[searchWand]] (broadcast allowed set at kernel insertion; over-bound
    * filters fall back to the declarative semi-join path over the same
    * weighted terms) — so RM3/boosted queries can run within a doc subset.
    */
  def searchWandWeighted(index: BM25Index, weighted: DataFrame, k: Int,
                         docFilter: Option[Column] = None): DataFrame = {
    val spark = index.spark
    if (index.numDocs == 0) return emptyResult(spark)
    val wt = weighted.select(col("qid"), col("term").cast("string").as("term"),
      col("qtf").cast("double").as("qtf"))
    val grouped = wt
      .groupBy("qid")
      .agg(collect_list(struct(col("term"), col("qtf"))).as("ts"))
    val chunkRows = wandQueryChunkRows(spark)
    val head = grouped.limit(chunkRows + 1).collect()
    if (head.isEmpty) return emptyResult(spark)
    // over-bound filters score through the SAME weighted terms declaratively
    def exactFallback =
      searchExactTerms(index, wt, k, docFilter, tryBroadcastFilter = false)
    if (head.length <= chunkRows) {
      val qArr = head.map(decodeGrouped).filter(_._2.nonEmpty)
      if (qArr.isEmpty) return emptyResult(spark)
      val allowedBc = resolveDocFilter(index, docFilter, exactFallback) match {
        case Left(terminal) => return terminal
        case Right(bc) => bc
      }
      val (partials, bq) = wandPartialsWithHandle(index, qArr, k, allowedBc)
      val finished = finishTopKIdx(index, partials, k, qArr.map(_._1))
      return allowedBc match {
        case Some(bc) => finishEagerDestroy(index, finished, Seq(bc, bq))
        case None => finished
      }
    }
    val allowedBc = resolveDocFilter(index, docFilter, exactFallback) match {
      case Left(terminal) => return terminal
      case Right(bc) => bc
    }
    // over-chunk: the probe above already paid one full aggregation of
    // `grouped`; persist so the count and chunk stream inside reuse it
    // (the chunk jobs all run eagerly in there, so the unpersist is safe)
    grouped.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try searchGroupedChunked(index, grouped, k, allowedBc)
    finally grouped.unpersist()
  }

  /** One chunk's WAND partial candidates: (qid, docIntId, score), ≤ k per
    * (query, salt) before the global heap merge in finishTopKIdx.
    */
  private[graft] def wandPartials(index: BM25Index,
                           qArr: Array[(String, Array[(String, Double)])],
                           k: Int): DataFrame =
    wandPartialsWithHandle(index, qArr, k, None)._1

  /** As wandPartials, but also returns the chunk's query-array broadcast so
    * the chunked large-batch path can destroy it between chunk jobs.
    * `allowedBc`: optional broadcast sorted allowed-docIntId array (query-
    * time doc filter) checked at kernel insertion.
    */
  private def wandPartialsWithHandle(index: BM25Index,
                           qArr: Array[(String, Array[(String, Double)])],
                           k: Int,
                           allowedBc: Option[org.apache.spark.broadcast.Broadcast[Array[Long]]]): (DataFrame,
                             org.apache.spark.broadcast.Broadcast[Array[(String, Array[(String, Double)])]]) = {
    val spark = index.spark
    // DAAT correctness precondition (see searchWandWeighted scaladoc);
    // O(batch terms) on the driver, negligible next to the kernel job
    require(qArr.forall(_._2.forall(_._2 >= 0.0)),
      "query term weights must be non-negative (WAND upper-bound pruning)")
    val terms = qArr.flatMap(_._2.map(_._1)).distinct.toSeq
    val bq = spark.sparkContext.broadcast(qArr)
    val kk = k

    val useTaat = k >= scoreAllMinK(spark) ||
      qArr.length >= taatMinBatchQueries(spark)
    val shift = index.saltShift
    val P2 = spark.sparkContext.defaultParallelism * 2

    // Parallelism = salt buckets × query groups. At index scale salts ≫
    // cores and G = 1 (no replicated decode); on a small index queries
    // split into G groups so the kernel still fills the cluster — posting
    // rows replicate G× through the shuffle.
    // Each task's kernels insert into ONE heap per query covering every
    // salt the task holds, so shuffled emission is nQueries × S × k rows —
    // bounded by the BUCKET count S, not numSalts. TAAT mode caps S
    // (deepKSaltBuckets) and raises G to keep S×G ≈ 2·parallelism: a
    // little replicated block decode buys 4× less emission + finish
    // traffic. At 10^12-doc scale the same cap keeps emission independent
    // of the million-salt index layout.
    // `spark.graft.wandGroups` overrides G (perf experiments).
    // default 4: swept {8,6,4,2,1} at 480k docs × 1200 queries × k=1000
    // (r2 per-salt-heap kernel: 4.6s at S=4 vs 6.6s at S=8 and 76s at
    // S=1/G=64; r3 direct-heap kernel re-checked S∈{2,4,6} — S=4 still
    // best, batch min 2.7s)
    val sCap = spark.conf.getOption("spark.graft.deepKSaltBuckets")
      .map(_.toInt).getOrElse(4)
    var G = spark.conf.getOption("spark.graft.wandGroups").map(_.toInt)
      .getOrElse(math.max(1, math.min(qArr.length,
        (P2 + index.numSalts - 1) / math.max(1, index.numSalts))))
    var S = math.min(index.numSalts.toLong, math.max(1L, P2.toLong / G)).toInt
    if (useTaat) {
      // S CONSTANT in deep-k mode — emission per query (S × k rows) must
      // not grow with cluster size, or per-query merge work rises with
      // cores and caps throughput scaling; G alone carries parallelism
      // (the wandGroups override stays respected for perf experiments)
      S = math.min(index.numSalts, sCap)
      G = spark.conf.getOption("spark.graft.wandGroups").map(_.toInt)
        .getOrElse(math.max(1, math.min(qArr.length, P2 / S)))
    }
    val nParts = S * G

    val cand = candidates(index, terms)
      .select(col("term"), col("salt"), col("maxImpact"), col("blocks"))
      .crossJoin(broadcast(spark.range(G).select(col("id").cast("int").as("qgrp"))))
      // hash the salt before bucketing: salt VALUES are sparse multiples
      // (docIntId's high bits = docmap partition id << bits), so a plain
      // pmod(salt, S) collapses every salt into bucket 0
      .withColumn("sbucket", pmod(hash(col("salt")), lit(S)))
      .repartition(nParts, col("sbucket"), col("qgrp"))
      // sorted runs let mapPartitions stream one (salt, qgrp) group at a
      // time instead of materializing the whole partition (external sort —
      // spills, never OOMs)
      .sortWithinPartitions("salt", "qgrp")
      .drop("sbucket")

    // Cap on buffered per-task heap rows before an early emit-and-clear.
    // Bounds task memory for huge query chunks. Correctness invariant:
    // each (qid, docId) pair is emitted AT MOST ONCE per task — drains
    // happen only at (salt, qgrp) group boundaries, where a doc has been
    // scored exactly once for a query, so the drain merely re-partitions
    // the emission. finishTopKIdx's heap has NO docId dedup; a mid-group
    // drain (same doc scored before and after) would surface duplicates.
    val maxHeapRows = spark.conf.getOption("spark.graft.taskHeapMaxRows")
      .map(_.toLong).getOrElse(4L << 20)

    // Emission rows carry qidx (the query's position in the chunk array) —
    // a 4-byte int groupBy/shuffle key instead of a per-row UTF8 string;
    // finishTopKIdx resolves qid strings only on the post-top-k hit set.
    implicit val enc = Encoders.product[(Int, Long, Double)]
    val nQ = qArr.length
    val out = cand.mapPartitions { rows =>
      // rows arrive sorted by (salt, qgrp): buffer exactly one run at a time
      // — the same working set the WAND cursors need anyway.
      // TAAT accumulator buffers are reused across every group of the task.
      val allowed: Array[Long] = allowedBc.map(_.value).orNull
      lazy val taat = new Wand.SaltTaat(shift)
      val agg = new TopKAggregator(kk)
      // array-indexed per-query heaps (no hashing): a task only ever
      // touches the qidx values of its own query groups
      val heaps = new Array[TopKBuf](nQ)
      var heapRows = 0L
      def drainHeaps(): Iterator[(Int, Long, Double)] = {
        val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
        var qi = 0
        while (qi < nQ) {
          val h = heaps(qi)
          if (h != null) {
            var i = 0
            while (i < h.size) { out += ((qi, h.docIds(i), h.scores(i))); i += 1 }
            heaps(qi) = null
          }
          qi += 1
        }
        heapRows = 0L
        out.iterator
      }

      val runs = new RunGroupIterator(rows, r => (r.getInt(1), r.getInt(4)))
      val perGroup = runs.flatMap { case ((salt, qgrp), srows) =>
        // unpack each (term, salt) run ONCE; all queries of the group share
        // its decoded blocks through SharedRun's cache
        val byTerm: Map[String, Wand.SharedRun] =
          srows.map(r => r.getString(0) -> Wand.runOf(r)).toMap
        // a group's queries are exactly the indices ≡ qgrp (mod G): step
        // through them directly instead of filtering the whole chunk.
        // Kernels insert DIRECTLY into the task-level per-query heap — no
        // per-(query,salt) heap, finish-sort, or boxed hand-off (that
        // machinery processed numSalts×k entries per query and dominated
        // the batch kernel); for DAAT the heap arriving pre-loaded from
        // the task's earlier salts RAISES the pruning threshold (any doc
        // worse than the global k-th so far can never surface — exactness
        // unchanged, strictly more block skipping).
        var qidx = qgrp
        while (qidx < nQ) {
          val qterms = bq.value(qidx)._2
          var h = heaps(qidx)
          if (h == null) { h = agg.zero; heaps(qidx) = h }
          val before = h.size
          if (useTaat) taat.topkInto(qterms, byTerm, salt, agg, h, allowed)
          else Wand.topkInto(qterms, byTerm, agg, h, allowed)
          heapRows += h.size - before
          qidx += G
        }
        if (heapRows > maxHeapRows) drainHeaps() else Iterator.empty
      }
      perGroup ++ drainHeaps()
    }.toDF("qidx", "docIntId", "score")
    (out, bq)
  }

  /** Streams consecutive runs of rows sharing a key from a SORTED iterator —
    * grouping without materializing the partition (the round-1 `toSeq`
    * buffered every posting payload of the task on heap).
    */
  private final class RunGroupIterator[K](rows: Iterator[Row], keyOf: Row => K)
      extends Iterator[(K, Seq[Row])] {
    private val it = rows.buffered
    def hasNext: Boolean = it.hasNext
    def next(): (K, Seq[Row]) = {
      val k = keyOf(it.head)
      val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
      while (it.hasNext && keyOf(it.head) == k) buf += it.next()
      (k, buf.toSeq)
    }
  }

  /** Root for over-chunk batch result spills. MUST be visible to every
    * executor AND the driver — on a multi-node cluster a driver-local
    * temp dir would scatter task output across executor-local disks and
    * the driver-side read-back would silently miss rows. Default: a
    * `_tmp-query` dir under the index's own filesystem (wherever the
    * index lives, all nodes can read/write it); `spark.graft.chunkSpillDir`
    * overrides — REQUIRED when the index location is read-only (published
    * index on a read-only mount / read-only bucket creds): point it at any
    * shared-writable scratch location. Spill run dirs are removed at JVM
    * exit; after a crash-killed driver (no shutdown hook), leftovers under
    * the root are inert and safe to sweep — nothing under `_tmp-query` is
    * ever part of the index itself.
    */
  private[graft] def chunkSpillRoot(index: BM25Index): String =
    index.spark.conf.getOption("spark.graft.chunkSpillDir")
      .getOrElse(s"${index.indexDir}/_tmp-query")

  private def emptyResult(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(Seq(
      StructField("qid", StringType), StructField("docId", StringType),
      StructField("score", DoubleType), StructField("rank", IntegerType))))
  }
}

/** Document-at-a-time WAND with block-max skipping over one salt's posting
  * runs (decoded lazily per block). Pure JVM — runs inside mapPartitions.
  *
  * Hot-loop engineering (this is the analogue of the reference's numba /
  * PISA C++ kernels, benchmark/on_bm25s.py:144-150, on_pisa.py:51):
  * block metadata is unpacked once into primitive arrays (no Row field
  * lookups in the skip loop), the cursor ordering is maintained
  * incrementally (bounded insertion-sort passes) instead of re-sorting and
  * re-allocating per document step, and decoded blocks are SHARED across
  * the queries of a batch group (SharedRun) — a 2000-query batch touching
  * the same hot terms decodes each block once, not 2000 times (the batch
  * analogue of bm25s's reusable score matrix).
  */
object Wand {

  /** One (term,salt) posting run unpacked from its Row once per task, with
    * a per-block decode cache shared by every query cursor in the group.
    * `maxCachedBlocks` soft-caps cache memory: beyond it, decodes fall
    * through uncached (correct, just slower) so a pathological run can't
    * hold the whole decoded posting space on heap.
    */
  final class SharedRun(val maxImpact: Float,
                        val firsts: Array[Long], val lasts: Array[Long],
                        val maxs: Array[Float], val ns: Array[Int],
                        idBytes: Array[Array[Byte]], impBytes: Array[Array[Byte]],
                        maxCachedBlocks: Int = 1 << 16) {
    val nBlocks: Int = firsts.length
    private val idCache = new Array[Array[Long]](nBlocks)
    private val impCache = new Array[Array[Float]](nBlocks)
    private var cached = 0

    def ids(bi: Int): Array[Long] = {
      val c = idCache(bi)
      if (c != null) c
      else {
        val d = Codec.decodeDeltaVarByte(idBytes(bi), ns(bi))
        if (cached < maxCachedBlocks) { idCache(bi) = d; cached += 1 }
        d
      }
    }

    def imps(bi: Int): Array[Float] = {
      val c = impCache(bi)
      if (c != null) c
      else {
        val d = Codec.decodeFloats(impBytes(bi))
        if (idCache(bi) != null) impCache(bi) = d
        d
      }
    }
  }

  /** A query-term cursor over a SharedRun. Skipping to a target docId never
    * decodes blocks whose `last < target`.
    */
  final class Cursor(val qtf: Double, run: SharedRun) {
    val ubTotal: Double = run.maxImpact * qtf
    private val nBlocks = run.nBlocks
    private var bi = 0
    private var ids: Array[Long] = null
    private var imps: Array[Float] = null
    private var pos = 0
    var curDoc: Long = if (nBlocks > 0) run.firsts(0) else Long.MaxValue
    private var decoded = false

    @inline def exhausted: Boolean = bi >= nBlocks

    @inline private def decodeCur(): Unit = {
      if (!decoded) {
        ids = run.ids(bi)
        imps = null
        pos = 0
        decoded = true
      }
    }

    def curContrib: Double = {
      decodeCur()
      if (imps == null) imps = run.imps(bi)
      imps(pos) * qtf
    }
    /** max impact of the current block × qtf (block-max refinement). */
    def curBlockUb: Double = if (exhausted) 0.0 else run.maxs(bi) * qtf

    def advance(): Unit = {
      if (exhausted) return
      decodeCur()
      pos += 1
      if (pos >= ids.length) {
        bi += 1; decoded = false
        curDoc = if (bi < nBlocks) run.firsts(bi) else Long.MaxValue
      } else curDoc = ids(pos)
    }

    /** Skip to first doc >= target without decoding skipped blocks. */
    def advanceTo(target: Long): Unit = {
      if (exhausted || curDoc >= target) return
      // skip whole blocks via metadata (primitive array reads)
      if (run.lasts(bi) < target) {
        decoded = false
        while (bi < nBlocks && run.lasts(bi) < target) bi += 1
        if (bi >= nBlocks) { curDoc = Long.MaxValue; return }
        if (run.firsts(bi) >= target) { curDoc = run.firsts(bi); return }
      }
      decodeCur()
      // binary search within block
      var lo = pos; var hi = ids.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (ids(mid) < target) lo = mid + 1 else hi = mid
      }
      pos = lo
      if (pos >= ids.length) {
        bi += 1; decoded = false
        curDoc = if (bi < nBlocks) run.firsts(bi) else Long.MaxValue
      } else curDoc = ids(pos)
    }
  }

  /** Unpack a postings Row (term, salt, df, count, maxImpact, blocks) into a
    * SharedRun — once per (term, salt) per task, shared by all queries.
    */
  def runOf(r: Row): SharedRun = {
    val maxImpact = r.getAs[Float]("maxImpact")
    val blocks = r.getSeq[Row](r.fieldIndex("blocks"))
    val nb = blocks.length
    val firsts = new Array[Long](nb); val lasts = new Array[Long](nb)
    val maxs = new Array[Float](nb); val ns = new Array[Int](nb)
    val idB = new Array[Array[Byte]](nb); val impB = new Array[Array[Byte]](nb)
    var i = 0
    while (i < nb) {
      val b = blocks(i)
      firsts(i) = b.getLong(0); lasts(i) = b.getLong(1)
      maxs(i) = b.getFloat(2); ns(i) = b.getInt(3)
      idB(i) = b.getAs[Array[Byte]](4); impB(i) = b.getAs[Array[Byte]](5)
      i += 1
    }
    new SharedRun(maxImpact, firsts, lasts, maxs, ns, idB, impB)
  }

  /** Document-at-a-time WAND for one query over one salt's term→run map,
    * inserting survivors into the caller's task-level heap. The heap may
    * arrive pre-loaded from the task's earlier salts: its root then prunes
    * ACROSS salts (a doc worse than the global k-th so far can never reach
    * the final top-k — exactness unchanged, strictly more skipping).
    *
    * `allowed` (nullable): sorted docIntId array of a query-time doc
    * filter. Disallowed pivots skip full evaluation AND insertion; cursor
    * upper bounds are unchanged and the threshold only ever reflects
    * allowed docs, so pruning remains exact over the allowed subset.
    */
  def topkInto(qterms: Array[(String, Double)],
               byTerm: Map[String, SharedRun],
               agg: TopKAggregator, heap: TopKBuf,
               allowed: Array[Long] = null): Unit = {
    val cs: Array[Cursor] = qterms.flatMap { case (t, qtf) =>
      byTerm.get(t).map(run => new Cursor(qtf, run))
    }
    if (cs.isEmpty) return
    // hoisted: the common unfiltered path never re-tests allowed per pivot
    val noFilter = allowed == null
    val k = heap.docIds.length // buffer capacity == the aggregator's k
    var live = 0

    /** keep cs sorted by curDoc (exhausted cursors sink to the end): plain
      * insertion sort — O(m) when nearly sorted, m = #query terms, zero
      * allocation per document step (unlike a per-iteration sortBy).
      */
    def resort(): Unit = {
      var i = 1
      while (i < cs.length) {
        val c = cs(i); val d = c.curDoc
        var j = i - 1
        while (j >= 0 && cs(j).curDoc > d) { cs(j + 1) = cs(j); j -= 1 }
        cs(j + 1) = c
        i += 1
      }
      live = cs.length
      while (live > 0 && cs(live - 1).curDoc == Long.MaxValue) live -= 1
    }
    resort()

    while (live > 0) {
      val threshold = if (heap.size < k) Double.NegativeInfinity else heap.scores(0)
      // pivot: first prefix whose summed upper bounds exceed the threshold
      var acc = 0.0; var pi = 0; var found = -1
      while (pi < live && found < 0) {
        acc += cs(pi).ubTotal
        if (acc > threshold) found = pi
        pi += 1
      }
      if (found < 0) return // no doc can beat threshold
      val pivotDoc = cs(found).curDoc

      if (cs(0).curDoc == pivotDoc) {
        // all cursors 0..found sit on pivotDoc: block-max refinement, then
        // full evaluation (skipped outright for filtered-out docs)
        var blockUb = 0.0
        var i = 0
        while (i < live && cs(i).curDoc == pivotDoc) { blockUb += cs(i).curBlockUb; i += 1 }
        val onPivot = i
        if (blockUb > threshold &&
            (noFilter ||
              java.util.Arrays.binarySearch(allowed, pivotDoc) >= 0)) {
          var score = 0.0
          i = 0
          while (i < onPivot) { score += cs(i).curContrib; i += 1 }
          agg.insert(heap, pivotDoc, score)
        }
        i = 0
        while (i < onPivot) { cs(i).advance(); i += 1 }
        resort()
      } else {
        // advance lagging cursors up to the pivot
        var i = 0
        while (i < found) { cs(i).advanceTo(pivotDoc); i += 1 }
        resort()
      }
    }
  }

  /** Term-at-a-time dense-accumulator kernel over one salt — the deep-k
    * twin of WAND's document-at-a-time loop (selected by
    * QueryEngine.scoreAllMinK). At k=1000 over a corpus-scale index the
    * heap threshold rises too slowly for block-max skipping to recoup
    * cursor costs; dense accumulation pays ~one FMA + one array write per
    * posting instead — the same regime call the reference's fast engine
    * makes with its score-all + argpartition (benchmark/on_bm25s.py:144-150,
    * on_rank_bm25.py:25-46).
    *
    * One instance per task, buffers reused across (salt, qgrp) groups and
    * queries: acc is O(2^saltShift) doubles (8 MiB at the default shift —
    * per TASK, not per query), the epoch array makes per-query reset O(1),
    * and the touched list bounds the selection pass by docs actually hit,
    * not salt width. Decoded blocks are shared across the group's queries
    * via SharedRun exactly as in the WAND path.
    */
  final class SaltTaat(saltShift: Int) {
    private val width = 1 << saltShift
    private val mask = (1L << saltShift) - 1
    private val acc = new Array[Double](width)
    private val epoch = new Array[Int](width)
    private val touched = new Array[Int](width)
    private var cur = 0

    /** Accumulate one query over one salt, inserting the touched docs into
      * the caller's task-level heap (pre-loaded from earlier salts — its
      * root filters most insertions in O(1)).
      */
    def topkInto(qterms: Array[(String, Double)],
                 byTerm: Map[String, SharedRun], salt: Int,
                 agg: TopKAggregator, heap: TopKBuf,
                 allowed: Array[Long] = null): Unit = {
      cur += 1
      var nTouched = 0
      var ti = 0
      while (ti < qterms.length) {
        val (t, qtf) = qterms(ti)
        byTerm.get(t) match {
          case Some(run) =>
            var bi = 0
            while (bi < run.nBlocks) {
              val ids = run.ids(bi); val imps = run.imps(bi)
              var i = 0
              while (i < ids.length) {
                val off = (ids(i) & mask).toInt
                if (epoch(off) != cur) {
                  epoch(off) = cur
                  acc(off) = imps(i) * qtf
                  touched(nTouched) = off; nTouched += 1
                } else acc(off) += imps(i) * qtf
                i += 1
              }
              bi += 1
            }
          case None => ()
        }
        ti += 1
      }
      if (nTouched == 0) return
      val saltBase = salt.toLong << saltShift
      var i = 0
      if (allowed == null) {
        // specialized no-filter loop: the common (unfiltered) selection
        // pass carries no per-doc branch or binarySearch call at all —
        // keeping the filtered-search feature free for ordinary queries
        while (i < nTouched) {
          val off = touched(i)
          agg.insert(heap, saltBase | off, acc(off))
          i += 1
        }
      } else {
        // doc-filter membership is tested per TOUCHED doc (not per
        // posting): accumulation for disallowed docs is wasted FMAs, but
        // the test in the posting loop would cost more than it saves
        while (i < nTouched) {
          val off = touched(i)
          val doc = saltBase | off
          if (java.util.Arrays.binarySearch(allowed, doc) >= 0)
            agg.insert(heap, doc, acc(off))
          i += 1
        }
      }
    }
  }
}

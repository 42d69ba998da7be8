package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's analysis pipeline re-expressed on DataFrames
  * (analysis/combine_results.py): load per-run JSON reports, derive
  * throughput, aggregate mean/std per (model, dataset), pivot to wide
  * dataset×model tables, normalize against a baseline model, and render
  * csv/markdown sinks.
  */
object Analysis {

  /** S7: results glob scan — one JSON object per run file
    * (combine_results.py:77-79).
    */
  def loadRuns(spark: SparkSession, resultsDir: String): DataFrame =
    spark.read.option("multiLine", value = true)
      .json(s"$resultsDir/*/*.json")

  /** Flatten nested save_dict-schema reports (RunReport / the reference's
    * own result files) into the processed-record shape of
    * combine_results.py:82-133: prefer the numba query timing, else
    * min(default, numpy); fold corpus/query tokenization into
    * index/query time; derive qps/dps; carry ndcg@10 and r@1000.
    * Fields absent from the whole input schema resolve to NULL (the
    * coalesce chain then falls through, exactly like the reference's
    * per-run `.get` checks).
    */
  def flattenRuns(runs: DataFrame): DataFrame = {
    def opt(path: String): org.apache.spark.sql.Column = {
      // walk the schema; absent fields become a NULL literal so the
      // coalesce chains below stay valid on any report subset
      val parts = path.split('.')
      var t: org.apache.spark.sql.types.DataType = runs.schema
      val ok = parts.forall { p =>
        t match {
          case s: org.apache.spark.sql.types.StructType
              if s.fieldNames.contains(p) =>
            t = s(p).dataType; true
          case _ => false
        }
      }
      if (ok) col(parts.map(p => s"`$p`").mkString(".")) else lit(null)
    }
    val qDefault = opt("timing.query.elapsed")
    val qNumba = opt("timing.query_numba.elapsed")
    val qNumpy = opt("timing.query_numpy.elapsed")
    val qBest = coalesce(qNumba,
      when(qNumpy.isNotNull, least(qDefault, qNumpy)), qDefault)
    val cTok = coalesce(opt("timing.tokenize_corpus_(class).elapsed"),
      opt("timing.tokenize_corpus.elapsed"), lit(0.0))
    val qTok = coalesce(opt("timing.tokenize_queries_(class).elapsed"),
      opt("timing.tokenize_queries.elapsed"), lit(0.0))
    val indexTime = opt("timing.index.elapsed") + cTok
    val queryTime = qBest + qTok
    runs.select(
      col("model"), col("dataset"),
      coalesce(opt("n_threads"), lit(1L)).as("n_threads"),
      coalesce(opt("ndcg.10"), opt("scores.ndcg.10")).as("ndcg@10"),
      coalesce(opt("recall.1000"), opt("scores.recall.1000")).as("r@1000"),
      (opt("stats.num_queries") / queryTime).as("qps"),
      (opt("stats.num_docs") / indexTime).as("dps"),
      coalesce(opt("max_mem_gb"), lit(-1.0)).as("max_mem_gb"))
  }

  /** Per-run normalization (combine_results.py:88-133): prefer the best
    * query timing, fold tokenization into both phases, derive
    * qps = n_queries / query_time and dps = n_docs / index_time.
    * Expects columns: model, dataset, n_queries, n_docs,
    * query_time, index_time, [qtok_time, ctok_time, n_threads].
    */
  def withThroughput(runs: DataFrame): DataFrame = {
    val qtok = coalesce(col("qtok_time"), lit(0.0))
    val ctok = coalesce(col("ctok_time"), lit(0.0))
    runs
      .withColumn("qps", col("n_queries") / (col("query_time") + qtok))
      .withColumn("dps", col("n_docs") / (col("index_time") + ctok))
  }

  /** P3: single-thread filter (combine_results.py:85-86). */
  def singleThreaded(runs: DataFrame): DataFrame =
    runs.filter(coalesce(col("n_threads"), lit(1)) === 1)

  /** P4: model exclusion filter (combine_results.py:120-121). */
  def excludeModels(runs: DataFrame, removed: Seq[String]): DataFrame =
    runs.filter(!col("model").isInCollection(removed))

  // ---- multicore grid (analysis/combine_multicore.py) -------------------

  /** Complement of [[singleThreaded]]: the reference routes its
    * multi-threaded runs to a separate results tree consumed by
    * combine_multicore.py (loaded at combine_multicore.py:30-34); over a
    * unified report store the same split is a filter.
    */
  def multiThreaded(runs: DataFrame): DataFrame =
    runs.filter(coalesce(col("n_threads"), lit(1)) =!= 1)

  /** Model-abbreviation projection (combine_multicore.py:17-23): rows whose
    * model has no abbreviation keep their full name (the reference would
    * KeyError there; unified stores carry engines it never abbreviated).
    */
  def abbreviateModels(runs: DataFrame, abbrev: Map[String, String]): DataFrame = {
    val mapped = abbrev.foldLeft(lit(null).cast("string")) { case (acc, (k, v)) =>
      when(col("model") === k, lit(v)).otherwise(acc)
    }
    runs.withColumn("model", coalesce(mapped, col("model")))
  }

  /** combine_multicore.py's per-(model, dataset) aggregation: quality MEANS
    * alongside throughput mean/std (combine_multicore.py:103-121) — the
    * multicore grid keeps ndcg@10 / r@1000 in the same table where the
    * single-thread pipeline tracks only throughput.
    */
  def aggregateWithQuality(runs: DataFrame): DataFrame =
    runs.groupBy("model", "dataset")
      .agg(
        round(avg("ndcg@10"), 4).as("ndcg@10"),
        round(avg("r@1000"), 4).as("r@1000"),
        round(avg("qps"), 4).as("qps"),
        round(coalesce(stddev_samp("qps"), lit(0.0)), 4).as("qps_std"),
        round(avg("dps"), 4).as("dps"),
        round(coalesce(stddev_samp("dps"), lit(0.0)), 4).as("dps_std"))

  /** groupBy(model, dataset).agg(mean, std) (combine_results.py:152-164). */
  def aggregate(runs: DataFrame): DataFrame =
    runs.groupBy("model", "dataset")
      .agg(
        round(avg("qps"), 4).as("qps_mean"),
        round(coalesce(stddev_samp("qps"), lit(0.0)), 4).as("qps_std"),
        round(avg("dps"), 4).as("dps_mean"),
        round(coalesce(stddev_samp("dps"), lit(0.0)), 4).as("dps_std"))

  /** Wide dataset×model pivot of one metric (combine_results.py:174-184). */
  def pivotMetric(agg: DataFrame, metric: String, models: Seq[String]): DataFrame =
    agg.groupBy("dataset").pivot("model", models).agg(first(col(metric)))

  /** Normalize a pivoted table by one model's column
    * (qps_df.div(qps_df["Rank"]), combine_results.py:179-180).
    */
  def normalizeBy(pivoted: DataFrame, baselineModel: String,
                  models: Seq[String]): DataFrame = {
    val cols = col("dataset") +: models.map(m =>
      round(col(m) / col(baselineModel), 4).as(m))
    pivoted.select(cols: _*)
  }

  // ---- comparisons grids (analysis/generate_comparisons.py:123-210) ----

  /** ×100 rescale + round — `df["ndcg@10"] * 100 ... .round(1)`
    * (generate_comparisons.py:141-144).
    */
  def rescalePercent(df: DataFrame, cols: Seq[String], dp: Int = 1): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, round(col(c) * 100.0, dp)))

  /** Multi-index pivot_table: groupBy(indexCols).pivot(columnCol)
    * .avg(valueCol) — the reference's
    * `pivot_table(index=[...], columns="dataset", values="ndcg@10")`
    * (generate_comparisons.py:152-155, 192-195), whose pandas default
    * aggfunc is MEAN — multiple runs per key average instead of picking
    * an arbitrary one. `columnVals` pins the output columns (explicit
    * values keep the plan one pass).
    */
  def pivotTable(df: DataFrame, indexCols: Seq[String], columnCol: String,
                 columnVals: Seq[String], valueCol: String): DataFrame =
    df.groupBy(indexCols.map(col): _*)
      .pivot(columnCol, columnVals)
      .agg(avg(col(valueCol)))

  /** Prepend the row-average column (`Avg.` first,
    * generate_comparisons.py:157-163,196-203): NULL when any value column
    * is missing — the reference blanks Avg. for incomplete rows.
    */
  def withRowAvg(pivoted: DataFrame, valueCols: Seq[String],
                 indexCols: Seq[String], dp: Int = 1): DataFrame = {
    val anyNull = valueCols.map(c => col(c).isNull).reduce(_ || _)
    val mean = valueCols.map(col).reduce(_ + _) / valueCols.size
    val avg = when(anyNull, lit(null)).otherwise(round(mean, dp)).as("Avg.")
    pivoted.select(indexCols.map(col) ++ (avg +: valueCols.map(col)): _*)
  }

  /** `fillna("--")` for rendering (generate_comparisons.py:205): value
    * columns become strings with missing cells dashed.
    */
  def fillMissing(df: DataFrame, valueCols: Seq[String],
                  filler: String = "--"): DataFrame =
    valueCols.foldLeft(df)((d, c) =>
      // backtick-quote: rendered column names may contain dots ("Avg.")
      d.withColumn(c, coalesce(col(s"`$c`").cast("string"), lit(filler))))

  /** S8 sinks: csv via the writer; markdown/latex rendered driver-side (the
    * pivot output is small by construction — datasets × models).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Latex tabular sink (save_as_csv_latex_markdown's third format,
    * analysis/generate_comparisons.py:80-97 / pandas to_latex shape).
    */
  def toLatex(df: DataFrame): String = {
    val cols = df.columns
    def esc(s: String) = s.replace("_", "\\_").replace("%", "\\%").replace("&", "\\&")
    val header = cols.map(esc).mkString(" & ") + " \\\\"
    val rows = df.collect().map(_.toSeq.map {
      case null => ""
      case v => esc(v.toString)
    }.mkString(" & ") + " \\\\")
    (Seq(s"\\begin{tabular}{${"l" * cols.length}}", "\\toprule", header, "\\midrule") ++
      rows ++ Seq("\\bottomrule", "\\end{tabular}")).mkString("\n")
  }

  def toMarkdown(df: DataFrame): String = {
    val cols = df.columns
    val header = cols.mkString("| ", " | ", " |")
    val sep = cols.map(_ => "---").mkString("| ", " | ", " |")
    val rows = df.collect().map(_.toSeq.map {
      case null => ""
      case v => v.toString
    }.mkString("| ", " | ", " |"))
    (header +: sep +: rows).mkString("\n")
  }
}

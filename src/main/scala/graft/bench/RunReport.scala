package graft.bench

import java.nio.file.{Files, Paths}

/** One run's report in the reference's save_dict schema
  * (benchmark/on_bm25s.py:228-254): flat config fields + nested
  * `stats{num_docs,num_queries,num_tokens}` +
  * `timing{name:{elapsed}}` + `scores{metric:{cutoff:value}}`.
  * Written as `results/<model>/<dataset>-<suffix>.json`
  * (save path shape, on_bm25s.py:256-260) so Analysis.loadRuns can glob
  * OUR runs exactly as combine_results globs the reference's.
  */
final case class RunReport(
    model: String,
    dataset: String,
    stemmer: String,
    tokenizer: String,
    method: String,
    stopwords: String,
    k1: Double,
    b: Double,
    delta: Double,
    date: String,
    nThreads: Int,
    topK: Int,
    maxMemGb: Double,
    numDocs: Long,
    numQueries: Long,
    numTokens: Long,
    timing: Map[String, Double],
    scores: Map[String, Map[String, Double]])

object RunReport {

  private def q(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  // always decimal form ("1.0", never "1") so JSON schema inference types
  // every score/timing as double, like Python json.dump of floats
  private def num(d: Double): String = d.toString

  /** save_dict-schema JSON (stable field order; timing values wrapped as
    * {"elapsed": secs} exactly like the reference Timer's to_dict).
    */
  def toJson(r: RunReport): String = {
    val timing = r.timing
      .map { case (n, s) => s"${q(n)}: {${q("elapsed")}: ${num(s)}}" }
      .mkString("{", ", ", "}")
    val scores = r.scores
      .map { case (m, byCut) =>
        s"${q(m)}: " + byCut.toSeq.sortBy(_._1.toInt)
          .map { case (c, v) => s"${q(c)}: ${num(v)}" }.mkString("{", ", ", "}")
      }
      .mkString("{", ", ", "}")
    s"""{
       |  ${q("model")}: ${q(r.model)},
       |  ${q("dataset")}: ${q(r.dataset)},
       |  ${q("stemmer")}: ${q(r.stemmer)},
       |  ${q("tokenizer")}: ${q(r.tokenizer)},
       |  ${q("method")}: ${q(r.method)},
       |  ${q("stopwords")}: ${q(r.stopwords)},
       |  ${q("k1")}: ${num(r.k1)},
       |  ${q("b")}: ${num(r.b)},
       |  ${q("delta")}: ${num(r.delta)},
       |  ${q("date")}: ${q(r.date)},
       |  ${q("n_threads")}: ${r.nThreads},
       |  ${q("top_k")}: ${r.topK},
       |  ${q("max_mem_gb")}: ${num(r.maxMemGb)},
       |  ${q("stats")}: {${q("num_docs")}: ${r.numDocs}, ${q("num_queries")}: ${r.numQueries}, ${q("num_tokens")}: ${r.numTokens}},
       |  ${q("timing")}: $timing,
       |  ${q("scores")}: $scores
       |}""".stripMargin
  }

  /** Write under `<resultDir>/<model>/<dataset>-<suffix>.json`. The suffix
    * defaults to a content hash (deterministic — the reference's
    * os.urandom hex only exists to avoid collisions).
    */
  def write(r: RunReport, resultDir: String, suffix: String = ""): String = {
    val json = toJson(r)
    val sfx =
      if (suffix.nonEmpty) suffix
      else f"${graft.util.Hashing.xxhash64(json)}%016x"
    val dir = Paths.get(resultDir, r.model)
    Files.createDirectories(dir)
    val path = dir.resolve(s"${r.dataset}-$sfx.json")
    Files.writeString(path, json)
    path.toString
  }
}

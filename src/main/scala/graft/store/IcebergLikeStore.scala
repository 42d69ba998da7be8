package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Minimal Iceberg-style table layer: parquet data files under a table dir
  * plus an append-only `_commits/` JSON manifest log carrying per-partition
  * lineage and metrics. Provides the north rule's checkpoint/resume
  * semantics (killed build resumes from the last committed partition group)
  * without the Iceberg runtime jar, which does not ship in this offline
  * image (SURVEY.md §7.3). The trait boundary is narrow so a real Iceberg
  * catalog can replace it where available.
  *
  * Mirrors the reference's index-persistence contract: engine params are
  * index-level metadata applied before querying (Elasticsearch settings
  * dance at benchmark/on_elastic.py:72-112; bm25s `model.save(dir)` at
  * inference/build_index.py:25-28).
  *
  * Commit protocol: data is written to `_tmp-<group>/`, moved into place,
  * then a manifest `_commits/<seq>-<group>.json` is atomically renamed in.
  * A group is committed iff its manifest exists; partially-written data
  * without a manifest is ignored and overwritten on resume.
  */
final case class PartitionCommit(
    group: String,
    files: Seq[String],
    rowCount: Long,
    metrics: Map[String, String],
    elapsedSec: Double)

class IcebergLikeStore(tableDir: String) {
  private val root: Path = Paths.get(tableDir)
  private val commitsDir: Path = root.resolve("_commits")

  def dataPath: String = root.toString

  private def listManifests(): Seq[Path] =
    if (!Files.isDirectory(commitsDir)) Nil
    else Files.list(commitsDir).iterator.asScala.toSeq
      .filter(_.getFileName.toString.endsWith(".json")).sortBy(_.getFileName.toString)

  /** Groups already durably committed (resume skips these). */
  def committedGroups(): Set[String] =
    listManifests().map { p =>
      val name = p.getFileName.toString.stripSuffix(".json")
      name.substring(name.indexOf('-') + 1)
    }.toSet

  def readCommits(): Seq[PartitionCommit] = listManifests().map { p =>
    val s = Files.readString(p)
    def field(k: String): String = {
      val m = java.util.regex.Pattern
        .compile("\"" + k + "\"\\s*:\\s*(\"((?:[^\"\\\\]|\\\\.)*)\"|[-0-9.Ee]+)")
        .matcher(s)
      if (m.find()) Option(m.group(2)).getOrElse(m.group(1)) else ""
    }
    // round-trip the metrics map: stage metadata recorded at commit time
    // (e.g. the docvecs stage's format key) must be readable on resume —
    // IndexBuilder derives docvecsFormat from it rather than assuming the
    // current layout, so a legacy (pre-packed) docvecs commit resumes with
    // its own format stamped
    val metrics = {
      val mm = java.util.regex.Pattern
        .compile("\"metrics\"\\s*:\\s*\\{([^}]*)\\}").matcher(s)
      if (!mm.find()) Map.empty[String, String]
      else {
        val kv = java.util.regex.Pattern
          .compile("\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"")
          .matcher(mm.group(1))
        val b = Map.newBuilder[String, String]
        while (kv.find()) b += (kv.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
          -> kv.group(2).replace("\\\"", "\"").replace("\\\\", "\\"))
        b.result()
      }
    }
    PartitionCommit(field("group"), Nil, field("rowCount").toLong,
      metrics + ("sha256" -> field("sha256")), field("elapsedSec").toDouble)
  }

  /** Durably record a completed partition group. */
  def commit(c: PartitionCommit): Unit = {
    Files.createDirectories(commitsDir)
    val seq = listManifests().size
    def js(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val metricsJson = c.metrics.map { case (k, v) => s"${js(k)}: ${js(v)}" }
      .mkString("{", ",", "}")
    val body =
      s"""{"group": ${js(c.group)}, "rowCount": ${c.rowCount},
         | "files": [${c.files.map(js).mkString(",")}],
         | "metrics": $metricsJson, "elapsedSec": ${c.elapsedSec},
         | "sha256": ${js(c.metrics.getOrElse("sha256", ""))}}""".stripMargin
    val tmp = commitsDir.resolve(s".tmp-${c.group}.json")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    val target = commitsDir.resolve(f"$seq%05d-${c.group}.json")
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Table-level properties (scoring params etc.), written once at finish. */
  def writeProperties(props: Map[String, String]): Unit = {
    Files.createDirectories(root)
    def js(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val body = props.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${js(k)}: ${js(v)}" }.mkString("{", ",\n", "}")
    val tmp = root.resolve(".tmp-properties.json")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, root.resolve("_properties.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def readProperties(): Map[String, String] = {
    val p = root.resolve("_properties.json")
    if (!Files.exists(p)) return Map.empty
    val s = Files.readString(p)
    val m = java.util.regex.Pattern
      .compile("\"((?:[^\"\\\\]|\\\\.)*)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"")
      .matcher(s)
    val out = Map.newBuilder[String, String]
    while (m.find()) out += (m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
      -> m.group(2).replace("\\\"", "\"").replace("\\\\", "\\"))
    out.result()
  }

  def isComplete: Boolean = Files.exists(root.resolve("_properties.json"))
}

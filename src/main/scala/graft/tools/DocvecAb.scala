package graft.tools

import graft.BenchCore
import graft.index.IndexBuilder

/** Same-session A/B of the stored-doc-vectors cost at index build: full
  * builds with storeDocVectors ON vs OFF, interleaved across rounds (the
  * repo's host-noise protocol — co-tenant slowdown waves last minutes, so
  * paired samples minutes apart beat back-to-back reps), best-of per arm.
  * Also reports the committed docvecs stage seconds and the table's disk
  * footprint, so the overhead decomposes into stage time vs write volume.
  *
  * Round-5 verdict measured the row-per-term layout at ~22% of build; the
  * packed layout's target is ≤10%.
  *
  * Env: GRAFT_PROBE_DOCS (default 480000), GRAFT_PROBE_ROUNDS (default 3),
  * GRAFT_TMPDIR (work dir, tmpfs default).
  */
object DocvecAb {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("GRAFT_PROBE_DOCS", "480000").toInt
    val rounds = sys.env.getOrElse("GRAFT_PROBE_ROUNDS", "3").toInt
    val spark = BenchCore.probeSession(32, "dvab")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    import spark.implicits._

    val corpusDir = s"${BenchCore.workBase}/dvab-corpus-$nDocs"
    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      spark.range(0, nDocs, 1, 64).as[Long]
        .map(i => graft.util.SynthCorpus.docOf((i / 100).toInt, (i % 100).toInt))
        .write.mode("overwrite").parquet(corpusDir)
    }
    val corpus = spark.read.parquet(corpusDir)
      .selectExpr("concat(repo, ':', path, '@', commit) as docId", "content")

    def du(f: java.io.File): Long =
      if (f.isDirectory) f.listFiles().map(du).sum else f.length()

    // JIT/codegen warmup build outside the measurement
    val warmDir = s"${BenchCore.workBase}/dvab-warm"
    graft.util.Dirs.deleteRecursively(new java.io.File(warmDir))
    IndexBuilder.build(spark, corpus.limit(20000), warmDir,
      IndexBuilder.Config(numSegmentGroups = 1, numBuckets = 16,
        docmapPartitions = 64))
    graft.util.Dirs.deleteRecursively(new java.io.File(warmDir))

    val dpsOn = scala.collection.mutable.ArrayBuffer.empty[Double]
    val dpsOff = scala.collection.mutable.ArrayBuffer.empty[Double]
    var stageSec = Double.MaxValue
    var tableMb = 0.0
    // alternate arm order per round: a fixed order hands the second arm a
    // warmer JIT/page-cache every time (observed as a one-sided trend)
    for (r <- 1 to rounds;
         on <- if (r % 2 == 1) Seq(true, false) else Seq(false, true)) {
      val dir = s"${BenchCore.workBase}/dvab-index-$r-$on"
      graft.util.Dirs.deleteRecursively(new java.io.File(dir))
      val (_, sec) = BenchCore.time {
        IndexBuilder.build(spark, corpus, dir,
          IndexBuilder.Config(numSegmentGroups = 1, numBuckets = 16,
            docmapPartitions = 64, storeDocVectors = on))
      }
      val dps = nDocs / sec
      val st = new graft.store.IcebergLikeStore(dir)
      val stages = st.readCommits().map(c => f"${c.group}=${c.elapsedSec}%.1f")
        .mkString(" ")
      if (on) {
        dpsOn += dps
        st.readCommits().find(_.group == "docvecs")
          .foreach(c => stageSec = math.min(stageSec, c.elapsedSec))
        tableMb = du(new java.io.File(s"$dir/docvecs")) / 1e6
      } else dpsOff += dps
      println(f"[dvab] round $r storeDocVectors=$on: $dps%.1f docs/s ($sec%.1f s; $stages)")
      graft.util.Dirs.deleteRecursively(new java.io.File(dir))
    }
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.0f").mkString("/")
    val ratio = dpsOff.max / dpsOn.max
    println(f"[dvab] $nDocs docs, best-of-$rounds interleaved: " +
      f"ON ${dpsOn.max}%.0f docs/s (rounds ${fmt(dpsOn.toSeq)}), " +
      f"OFF ${dpsOff.max}%.0f docs/s (rounds ${fmt(dpsOff.toSeq)}), " +
      f"overhead ${(ratio - 1) * 100}%.1f%% " +
      f"(docvecs stage ${stageSec}%.1f s, table $tableMb%.1f MB)")
    spark.stop()
  }
}

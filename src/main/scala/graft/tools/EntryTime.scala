package graft.tools

import org.apache.spark.sql.SparkSession

/** Times driver entries N times in a single JVM (bisection helper for
  * per-entry suite timings; the full Bench re-runs everything).
  * Comma-separate names to INTERLEAVE a family per rep — same-minute
  * samples make sibling entries comparable under co-tenant noise waves.
  *
  * Usage: runMain graft.tools.EntryTime <name[,name...]> [reps sfDir cpus]
  */
object EntryTime {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 3) args(3).toInt else 32
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to reps; name <- names) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"[entrytime] $name rep$r: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

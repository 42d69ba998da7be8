package graft.util

import org.apache.spark.sql.SparkSession

/** JVM-lifetime temp locations on ANY Hadoop-visible filesystem (the index
  * store's FS, a scratch bucket, local disk in tests). Results that are
  * consumed lazily (chunk-spill parquet, the final connected-components
  * label table) must outlive the call that wrote them, so deletion is
  * deferred to JVM exit — through the Hadoop FileSystem API, so the SAME
  * path Spark wrote is the one removed whatever filesystem it resolves to.
  */
object TempFs {

  private val dirs = java.util.Collections.synchronizedMap(
    new java.util.HashMap[String, org.apache.hadoop.conf.Configuration]())

  /** Register `dir` for recursive deletion at JVM exit. */
  def registerForCleanup(spark: SparkSession, dir: String): Unit =
    dirs.put(dir, spark.sparkContext.hadoopConfiguration): Unit

  /** Best-effort immediate recursive delete (no-op if absent). */
  def delete(conf: org.apache.hadoop.conf.Configuration, dir: String): Unit =
    try {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(conf).delete(p, true): Unit
    } catch { case _: Throwable => () }

  locally {
    sys.addShutdownHook {
      dirs.forEach((d, conf) => delete(conf, d))
    }
  }
}

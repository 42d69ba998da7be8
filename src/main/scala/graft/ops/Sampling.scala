package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic seeded sampling — the distributed contract of the
  * reference's `random.seed(42); random.sample(query_keys, n)`
  * (benchmark/on_rank_bm25.py:72-76): same seed + same keys → same sample,
  * independent of partitioning, executor count, or row order.
  *
  * Mechanism: rank rows by a seeded hash of the key and keep the n
  * smallest. Catalyst plans orderBy+limit as TakeOrderedAndProject — a
  * distributed per-partition top-n + driver merge of n×partitions rows,
  * never a global sort, so this holds at any corpus size.
  */
object Sampling {

  def seededSample(df: DataFrame, keyCol: String, n: Int,
                   seed: Long = 42L): DataFrame =
    df.withColumn("__sample_h",
        md5(concat(lit(s"$seed:"), col(keyCol).cast("string"))))
      .orderBy(col("__sample_h"), col(keyCol))
      .limit(n)
      .drop("__sample_h")
}

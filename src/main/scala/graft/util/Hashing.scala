package graft.util

import org.apache.spark.sql.catalyst.expressions.XxHash64Function
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

/** Driver-side twins of the Catalyst hash/partitioning expressions used in
  * the index layout, so query planning can compute bucket pruning sets that
  * agree bit-for-bit with what `IndexBuilder.bucketOf` wrote.
  */
object Hashing {
  /** Same as Catalyst `xxhash64(col)` (seed 42). */
  def xxhash64(s: String): Long =
    XxHash64Function.hash(UTF8String.fromString(s), StringType, 42L)

  /** Same as `pmod(xxhash64(term), numBuckets)`. */
  def bucketOfTerm(term: String, numBuckets: Int): Int = {
    val m = xxhash64(term) % numBuckets
    (if (m < 0) m + numBuckets else m).toInt
  }
}

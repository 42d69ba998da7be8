package graft.index

import java.nio.{ByteBuffer, ByteOrder}

/** Posting-list codecs: delta + variable-byte docId compression and packed
  * float32 impact payloads with per-block max metadata.
  *
  * Plays the role of the compressed index layouts the reference delegates to
  * its engines — bm25s's CSC sparse score matrix
  * (benchmark/on_bm25s.py:124-129) and PISA's compressed inverted index with
  * `precompute_impact=True` block-max metadata (benchmark/on_pisa.py:47-51).
  * Pure JVM so the same code runs in Catalyst expressions, mapPartitions
  * tasks, and scalar tests.
  */
object Codec {

  /** Variable-byte encode deltas of a sorted array of non-negative longs.
    * Layout: continuation-bit varint (7 data bits/byte, high bit = more).
    */
  def encodeDeltaVarByte(sortedIds: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(sortedIds.length * 2)
    var prev = 0L
    var i = 0
    while (i < sortedIds.length) {
      var v = if (i == 0) sortedIds(0) else sortedIds(i) - prev
      require(v >= 0, s"ids must be sorted ascending, got delta $v at $i")
      prev = sortedIds(i)
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
      i += 1
    }
    out.toByteArray
  }

  def decodeDeltaVarByte(bytes: Array[Byte], n: Int): Array[Long] = {
    val out = new Array[Long](n)
    var pos = 0; var prev = 0L; var i = 0
    while (i < n) {
      var v = 0L; var shift = 0; var b = 0
      do {
        b = bytes(pos) & 0xff; pos += 1
        v |= (b & 0x7fL) << shift; shift += 7
      } while ((b & 0x80) != 0)
      prev = if (i == 0) v else prev + v
      out(i) = prev
      i += 1
    }
    out
  }

  /** Pack float32 impacts little-endian. */
  def encodeFloats(xs: Array[Float]): Array[Byte] = {
    val bb = ByteBuffer.allocate(xs.length * 4).order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < xs.length) { bb.putFloat(xs(i)); i += 1 }
    bb.array()
  }

  def decodeFloats(bytes: Array[Byte]): Array[Float] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Float](bytes.length / 4)
    var i = 0
    while (i < out.length) { out(i) = bb.getFloat(); i += 1 }
    out
  }

  /** Block size for block-max metadata (PISA-style). */
  val BlockSize = 128

  /** Per-block max of impacts, blocks of `BlockSize` postings. */
  def blockMax(impacts: Array[Float]): Array[Float] = {
    if (impacts.isEmpty) return Array.empty
    val nBlocks = (impacts.length + BlockSize - 1) / BlockSize
    val out = new Array[Float](nBlocks)
    var b = 0
    while (b < nBlocks) {
      var m = Float.MinValue
      var i = b * BlockSize
      val end = math.min(i + BlockSize, impacts.length)
      while (i < end) { if (impacts(i) > m) m = impacts(i); i += 1 }
      out(b) = m
      b += 1
    }
    out
  }
}

package graft.index

import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  test("varbyte+delta round-trip (randomized, seed 42)") {
    for (_ <- 0 until 200) {
      val n = rnd.nextInt(400)
      val xs = Array.fill(n)(math.abs(rnd.nextLong()) % (1L << 40)).sorted
      val enc = Codec.encodeDeltaVarByte(xs)
      assert(Codec.decodeDeltaVarByte(enc, n).toSeq == xs.toSeq)
    }
  }

  test("float pack round-trip (randomized, seed 42)") {
    for (_ <- 0 until 100) {
      val xs = Array.fill(rnd.nextInt(300))(rnd.nextFloat() * 100f)
      assert(Codec.decodeFloats(Codec.encodeFloats(xs)).toSeq == xs.toSeq)
    }
  }

  test("unsorted input rejected") {
    intercept[IllegalArgumentException] {
      Codec.encodeDeltaVarByte(Array(5L, 3L))
    }
  }

  test("blockMax") {
    val imps = Array.tabulate(300)(i => i.toFloat)
    val bm = Codec.blockMax(imps)
    assert(bm.toSeq == Seq(127f, 255f, 299f))
    assert(Codec.blockMax(Array.empty[Float]).isEmpty)
  }

  test("varbyte compactness: small deltas are 1 byte") {
    val ids = Array.tabulate(1000)(i => i.toLong * 2)
    assert(Codec.encodeDeltaVarByte(ids).length == 1000)
  }

  test("duplicate ids (delta 0) round-trip") {
    val xs = Array(7L, 7L, 7L, 130L, 130L)
    assert(Codec.decodeDeltaVarByte(Codec.encodeDeltaVarByte(xs), 5).toSeq == xs.toSeq)
  }
}

package graft.tokenize

import org.scalatest.funsuite.AnyFunSuite
import scala.io.Source

/** Validates the pure-Scala Porter2 implementation against published
  * snowballstem.org English sample vectors plus spec-text worked examples
  * (fixture: src/test/resources/snowball_en_vectors.tsv).
  */
class SnowballEnStemmerSpec extends AnyFunSuite {

  test("published snowball english vectors") {
    val src = Source.fromInputStream(
      getClass.getResourceAsStream("/snowball_en_vectors.tsv"), "UTF-8")
    val failures = try {
      src.getLines().filter(_.nonEmpty).toSeq.flatMap { line =>
        val Array(in, expect) = line.split("\t")
        val got = SnowballEnStemmer.stem(in)
        if (got != expect) Some(s"$in -> $got (expected $expect)") else None
      }
    } finally src.close()
    assert(failures.isEmpty, s"\n${failures.mkString("\n")}")
  }

  test("step 1b short-word e restoration") {
    assert(SnowballEnStemmer.stem("hopping") == "hop")
    assert(SnowballEnStemmer.stem("hoping") == "hope")
    assert(SnowballEnStemmer.stem("luxuriated") == "luxuri")
    assert(SnowballEnStemmer.stem("filing") == "file")
  }

  test("tokens of length <= 2 unchanged") {
    assert(SnowballEnStemmer.stem("ab") == "ab")
    assert(SnowballEnStemmer.stem("x") == "x")
    assert(SnowballEnStemmer.stem("") == "")
  }

  test("y-consonant marking") {
    assert(SnowballEnStemmer.stem("boy") == "boy")      // y after vowel = Y, kept
    assert(SnowballEnStemmer.stem("boys") == "boy")
    assert(SnowballEnStemmer.stem("saying") == "say")
    assert(SnowballEnStemmer.stem("crying") == "cri")
  }

  test("fixture table from FIXTURES.md") {
    assert(Tokenizer.tokenizeScalar("The Binary Search-Trees!") ==
      Seq("binari", "search", "tree"))
    assert(Tokenizer.tokenizeScalar("A B c2 the _id x") == Seq("c2", "_id"))
    assert(Tokenizer.tokenizeScalar("running runner runs") ==
      Seq("run", "runner", "run"))
  }
}

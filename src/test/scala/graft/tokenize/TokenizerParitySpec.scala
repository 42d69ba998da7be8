package graft.tokenize

import org.apache.spark.sql.functions.col

import graft.SparkTestBase

/** The scalar twin must be BEHAVIOR-IDENTICAL to the Catalyst
  * TokenizeExpr across patterns and the stem toggle — QueryEngine's
  * small-batch fast path tokenizes queries driver-side through the twin,
  * so any drift would silently change retrieval results.
  */
class TokenizerParitySpec extends SparkTestBase {

  private val samples = Seq(
    "Binary Search TREE insert",
    "the of to a an and",                  // all stopwords
    "",                                    // empty
    "running runner runs ran easily",      // stemming-sensitive
    "x yz_id2 CamelCase snake_case a1b2",  // identifiers, short tokens
    "naïve café über straße",              // unicode word chars
    "merge merge merge join",              // duplicates
    "punct! (parens) [brackets] a-b c.d")  // separators

  test("tokenizeScalar == TokenizeExpr for both patterns × stem on/off") {
    import spark.implicits._
    for {
      pattern <- Seq(Tokenizer.TokenPattern, Tokenizer.AsciiTokenPattern)
      stem <- Seq(true, false)
    } {
      val viaSpark = samples.toDF("text")
        .select(Tokenizer.tokens(col("text"), pattern, stem).as("toks"))
        .collect().map(_.getSeq[String](0).toList)
      val viaScalar = samples.map(s =>
        Tokenizer.tokenizeScalar(s, pattern, stem).toList)
      assert(viaSpark.toSeq == viaScalar,
        s"drift for pattern=$pattern stem=$stem")
    }
  }
}

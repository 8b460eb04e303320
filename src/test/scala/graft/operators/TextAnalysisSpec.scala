package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("t").select(c.as("r")).head().getAs[T]("r")

  test("tokenCount counts non-space runs") {
    assert(one[Int](TextAnalysis.tokenCount($"t"), "a  bb\tccc\nd") == 4)
    assert(one[Int](TextAnalysis.tokenCount($"t"), "   ") == 0)
  }

  test("bpeTokenCount: contractions, digit/symbol runs, unconsumed whitespace") {
    // "I" "'m" " can" "'t" " 123" " foo" "-" "bar" "!" → 9
    assert(one[Int](TextAnalysis.bpeTokenCount($"t"), "I'm can't 123 foo-bar!") == 9)
    // double space leaves one \s+ match that must not count
    assert(one[Int](TextAnalysis.bpeTokenCount($"t"), "a  b") == 2)
    assert(one[Int](TextAnalysis.bpeTokenCount($"t"), "   ") == 0)
  }

  test("avgTokenLen = non-space chars / tokens") {
    assert(one[Double](TextAnalysis.avgTokenLen($"t"), "ab cd ef") == 2.0)
  }

  test("stopword and punct counts respect word boundaries") {
    assert(one[Int](TextAnalysis.stopwordCount($"t"), "The theme of the thing is it") == 5)
    assert(one[Int](TextAnalysis.punctCount($"t"), "a, b; c! d? e.") == 5)
  }

  test("langId picks marker-word majority; CJK wins immediately") {
    assert(one[String](TextAnalysis.langId($"t"), "the cat and the dog is here") == "en")
    assert(one[String](TextAnalysis.langId($"t"), "der hund und die katze ist gut") == "de")
    assert(one[String](TextAnalysis.langId($"t"), "le chat et la maison est grande") == "fr")
    assert(one[String](TextAnalysis.langId($"t"), "los gatos y las casas es grande") == "es")
    assert(one[String](TextAnalysis.langId($"t"), "这 是 中文 文本") == "zh")
  }

  test("fingerprint is whitespace/case-insensitive") {
    val a = one[String](TextAnalysis.fingerprint($"t"), "  Hello   World ")
    val b = one[String](TextAnalysis.fingerprint($"t"), "hello world")
    assert(a == b)
  }

  test("rollingHash is order-sensitive, fingerprint is not") {
    val h1 = one[Long](TextAnalysis.rollingHash($"t"), "a b c")
    val h2 = one[Long](TextAnalysis.rollingHash($"t"), "c b a")
    assert(h1 != h2)
    val f1 = one[String](TextAnalysis.fingerprint($"t"), "a b c")
    assert(f1 == one[String](TextAnalysis.fingerprint($"t"), "A  B c"))
  }

  test("qualityScore lands in [0,1] and orders junk below prose") {
    val prose = "the cat sat on the mat and it was a good day for all of us in the sun"
    val junk = "!!! ??? ,,, ... ;;; x y z"
    val qp = one[Double](TextAnalysis.qualityScore($"t"), prose)
    val qj = one[Double](TextAnalysis.qualityScore($"t"), junk)
    assert(qp > qj && qp <= 1.0 && qj >= 0.0)
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Presentation/parsing helpers: readable formats, the bar gauge's
  * eighth-block rendering, key-value extraction, and the tokenizers.
  */
class ReadableSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.spark

  private def s1(sql: String): String = spark.sql(sql).head().getString(0)

  test("formatReadableSize: IEC units, two decimals, sign") {
    assert(s1("SELECT formatReadableSize(123D)") == "123.00 B")
    assert(s1("SELECT formatReadableSize(123456D)") == "120.56 KiB")
    assert(s1("SELECT formatReadableSize(1073741824D)") == "1.00 GiB")
    assert(s1("SELECT formatReadableSize(-2048D)") == "-2.00 KiB")
  }

  test("formatReadableQuantity: thousands ladder") {
    assert(s1("SELECT formatReadableQuantity(123D)") == "123.00")
    assert(s1("SELECT formatReadableQuantity(1234D)") == "1.23 thousand")
    assert(s1("SELECT formatReadableQuantity(12345678D)") == "12.35 million")
  }

  test("bar: full blocks and eighth partials") {
    assert(s1("SELECT bar(10D, 0D, 10D, 10D)") == "█" * 10)
    assert(s1("SELECT bar(5D, 0D, 10D, 10D)") == "█" * 5)
    // 2.5 blocks -> 2 full + 4/8 partial
    assert(s1("SELECT bar(2.5D, 0D, 10D, 10D)") == "██▌")
    assert(s1("SELECT bar(-1D, 0D, 10D, 10D)") == "")
    assert(s1("SELECT bar(99D, 0D, 10D, 10D)") == "█" * 10) // clamped
  }

  test("extractKeyValuePairs: defaults, trimming, last-dup-wins") {
    val m = spark.sql(
      "SELECT extractKeyValuePairs('a:1, b:2;c: 3 a:9') AS m").head()
      .getMap[String, String](0)
    assert(m("a") == "9" && m("b") == "2" && m("c") == "3")
    assert(spark.sql("SELECT map_keys(extractKeyValuePairs('no pairs here'))")
      .head().getSeq[String](0).isEmpty)
  }

  test("alphaTokens and ngrams") {
    assert(spark.sql("SELECT alphaTokens('abc1 def--Ghi2')").head()
      .getSeq[String](0) == Seq("abc", "def", "Ghi"))
    assert(spark.sql("SELECT ngrams('abcde', 3)").head()
      .getSeq[String](0) == Seq("abc", "bcd", "cde"))
    assert(spark.sql("SELECT ngrams('ab', 3)").head()
      .getSeq[String](0).isEmpty)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{LangId, SelectDialect}

/** Gates for the LangId curation stage and `WITH FILL ... INTERPOLATE`.
  *
  * The driver's documents table deliberately shares ONE vocabulary
  * across its lang labels (q213 gates the distributed pipeline
  * hash-exact there); DISCRIMINATION is gated here on a separable
  * synthetic two-language corpus: disjoint character alphabets must
  * classify perfectly, and the margin must be large.
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // "aa": vowel-ish alphabet; "bb": consonant-ish alphabet — disjoint
  // bigram spaces, deterministic LCG word construction.
  private def word(alpha: String, seed: Long, len: Int): String = {
    var x = seed
    val sb = new StringBuilder
    (0 until len).foreach { _ =>
      x = (x * 6364136223846793005L + 1442695040888963407L)
      sb.append(alpha(((x >>> 33) % alpha.length).toInt))
    }
    sb.toString
  }

  private lazy val corpus = {
    val docs = (0 until 40).map { i =>
      val (lang, alpha) = if (i % 2 == 0) ("aa", "aeiou") else ("bb", "bcdfg")
      val text = (0 until 12).map(j => word(alpha, i * 100L + j, 6)).mkString(" ")
      (i.toLong, lang, text)
    }
    docs.toDF("doc_id", "lang", "text")
  }

  test("disjoint-alphabet corpora classify perfectly") {
    val prof = LangId.profiles(corpus, "lang", "text", n = 2, topK = 32)
    // profiles are bounded: at most #langs x topK rows
    assert(prof.count() <= 2 * 32)
    val pred = LangId.classify(corpus, prof, "doc_id", "text", n = 2)
    val joined = pred.join(corpus.select(col("doc_id").as("id"),
      col("lang").as("actual")), "id")
    val hits = joined.filter(col("lang") === col("actual")).count()
    assert(hits == 40L, "disjoint alphabets must classify 100%")
  }

  test("scores carry a large margin on separable data") {
    val prof = LangId.profiles(corpus, "lang", "text", n = 2, topK = 32)
    val sc = LangId.scores(corpus, prof, "doc_id", "text", n = 2)
    // for every doc the wrong language pays the unseen-gram penalty on
    // ~every gram (space-adjacent grams can leak) — require 2x margin
    val m = sc.groupBy("id").agg(
      min("nll_micro").as("best"), max("nll_micro").as("worst"))
    assert(m.filter(col("worst") < col("best") * 2).count() == 0)
  }

  test("grams guard: text shorter than n yields empty, never throws") {
    val tiny = Seq((1L, "aa", "x"), (2L, "aa", ""), (3L, "bb", "bcd"))
      .toDF("doc_id", "lang", "text")
    val g = tiny.select(col("doc_id"), LangId.grams(col("text"), 2).as("g"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    assert(g(1L) == Seq.empty)
    assert(g(2L) == Seq.empty)
    assert(g(3L) == Seq("bc", "cd"))
  }

  test("classify ties break to the lexicographically first language") {
    // two langs with IDENTICAL corpora -> identical profiles -> equal
    // scores; the winner must deterministically be the first lang
    val tied = Seq((0L, "zz", "abab abab"), (1L, "aa", "abab abab"))
      .toDF("doc_id", "lang", "text")
    val prof = LangId.profiles(tied, "lang", "text", n = 2, topK = 8)
    val pred = LangId.classify(tied, prof, "doc_id", "text", n = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred(0L) == "aa" && pred(1L) == "aa")
  }

  test("withFillInterpolate: gaps filled, defaults applied, values carried") {
    val df = Seq((1L, 10L, 100L), (2L, 20L, 200L), (5L, 50L, 500L))
      .toDF("x", "n", "v")
    val out = SelectDialect.withFillInterpolate(df, "x", lit(1L),
      fill = Map("n" -> lit(0L)), interpolate = Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (1L, 10L, 100L), (2L, 20L, 200L),
      (3L, 0L, 200L), (4L, 0L, 200L), // carried forward
      (5L, 50L, 500L)))
  }

  test("withFillInterpolate: per-series partitions carry independently") {
    val df = Seq(("a", 1L, 1L), ("a", 3L, 3L), ("b", 1L, 7L), ("b", 4L, 9L))
      .toDF("s", "x", "v")
    val out = SelectDialect.withFillInterpolate(df, "x", lit(1L),
      fill = Map.empty, interpolate = Seq("v"), series = Seq("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      ("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 3L),
      ("b", 1L, 7L), ("b", 2L, 7L), ("b", 3L, 7L), ("b", 4L, 9L)))
  }
}

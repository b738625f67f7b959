package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ZIPFIAN text corpus for the lexical serving evidence.
  *
  * The driver's `documents` table has a 31-term vocabulary, which makes
  * every query term 40–80% df — the adversarial ALL-common shape for
  * document-at-a-time max-score (nothing is ever skippable; PLANS
  * §"BM25 max-score serving" documents the honest residual). Real
  * vocabularies are Zipfian (the reference's wiki/arXiv corpora more
  * so), and this generator provides that shape reproducibly:
  *
  *   P(term rank r) ∝ 1 / r^s   (s = 1.0 by default)
  *
  * over a V-term vocabulary, L tokens per doc, each token drawn by
  * inverse-CDF binary search from a per-doc `java.util.Random(doc_id)`
  * stream — deterministic per doc REGARDLESS of partitioning, identical
  * across JVMs, map-only over `spark.range` (no data movement, any n).
  * Terms are "t<rank>" so a term's expected df is readable off its name.
  */
object ZipfCorpus {

  /** Cumulative Zipf CDF over ranks 1..v (driver-side, v doubles). */
  def cdf(v: Int, s: Double = 1.0): Array[Double] = {
    val w = Array.tabulate(v)(i => 1.0 / math.pow(i + 1.0, s))
    val total = w.sum
    val c = new Array[Double](v)
    var acc = 0.0
    var i = 0
    while (i < v) { acc += w(i) / total; c(i) = acc; i += 1 }
    c(v - 1) = 1.0 // close fp gap
    c
  }

  /** The corpus: (doc_id, text) with `len` Zipf-drawn tokens per doc. */
  def df(spark: SparkSession, n: Long, vocab: Int, len: Int = 60,
      s: Double = 1.0): DataFrame = {
    import spark.implicits._
    val c = spark.sparkContext.broadcast(cdf(vocab, s))
    spark.range(n).as[Long].map { id =>
      val cum = c.value
      val rnd = new java.util.Random(id * 6364136223846793005L + 1442695040888963407L)
      val sb = new StringBuilder(len * 7)
      var i = 0
      while (i < len) {
        val u = rnd.nextDouble()
        var lo = 0
        var hi = cum.length - 1
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (cum(mid) < u) lo = mid + 1 else hi = mid
        }
        if (i > 0) sb.append(' ')
        sb.append('t').append(lo + 1)
        i += 1
      }
      (id, sb.toString)
    }.toDF("doc_id", "text")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r17: PolyHashArr / MinHashSig are codegen drop-ins for the
  * interpreted catalyst HOF chains the LSH dedup queries previously
  * spelled inline. These tests pin BIT-IDENTITY against the original
  * chains evaluated by Spark itself, including the edge shapes the
  * queries cannot hit (empty arrays, empty strings, non-ASCII code
  * points, null elements).
  */
class PolyHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val M = 2147483647L

  private def df = Seq(
    Seq("the quick brown", "quick brown fox", "brown fox jumps"),
    Seq(""),
    Seq.empty[String],
    Seq("a"),
    Seq("Grüße", "naïve café", "日本語 テスト", "emoji 😀 tail"),
    Seq("x" * 500)
  ).toDF("sh")

  test("poly_hash_arr == the aggregate/ascii HOF chain, all edge shapes") {
    val hof = expr(
      "transform(sh, s -> aggregate(sequence(1, length(s)), 0L, " +
        "(acc, i) -> (acc * 257 + ascii(substring(s, i, 1))) % 2147483647))")
    val got = df
      .withColumn("a", org.apache.spark.sql.graft.GraftColumns
        .poly_hash_arr(col("sh"), M))
      .withColumn("b", hof)
      .select(col("a") === col("b"), size(col("a")) === size(col("b")))
      .collect()
    assert(got.forall(r => r.isNullAt(0) && r.isNullAt(1) ||
      (r.getBoolean(0) && r.getBoolean(1))))
    // empty array compares null === null above; pin it explicitly
    val e = df.filter(size(col("sh")) === 0)
      .select(org.apache.spark.sql.graft.GraftColumns
        .poly_hash_arr(col("sh"), M)).head().getSeq[Long](0)
    assert(e.isEmpty)
  }

  test("minhash_sig == the transform/array_min HOF chain") {
    val hv = df.withColumn("hv", org.apache.spark.sql.graft.GraftColumns
      .poly_hash_arr(col("sh"), M))
    val hof = expr(
      "transform(sequence(0, 15), h -> " +
        "array_min(transform(hv, x -> (x * (2*h + 1) + 7919*h + 13) % 2147483647)))")
    val rows = hv
      .withColumn("a", org.apache.spark.sql.graft.GraftColumns
        .minhash_sig(col("hv"), 16, M))
      .withColumn("b", hof)
      .select("a", "b").collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1),
        s"sig mismatch: ${r.getSeq[Any](0)} vs ${r.getSeq[Any](1)}")
    }
  }

  test("poly_hash_arr: a null ELEMENT hashes to null, like the HOF chain") {
    // r17 ADVICE: the unguarded getUTF8String NPE'd here while the HOF
    // chain yields a null element — pin the chain's value (r18 fix)
    val withNulls = Seq(
      Tuple1(Seq[String]("ab", null, "cd")),
      Tuple1(Seq[String](null))).toDF("sh")
    val hof = expr(
      "transform(sh, s -> aggregate(sequence(1, length(s)), 0L, " +
        "(acc, i) -> (acc * 257 + ascii(substring(s, i, 1))) % 2147483647))")
    val rows = withNulls
      .withColumn("a", org.apache.spark.sql.graft.GraftColumns
        .poly_hash_arr(col("sh"), M))
      .withColumn("b", hof)
      .select("a", "b").collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1),
        s"null-element mismatch: ${r.getSeq[Any](0)} vs ${r.getSeq[Any](1)}")
    }
    assert(rows(0).getSeq[Any](0)(1) == null)
  }

  test("minhash_sig: null elements are skipped exactly like array_min") {
    val withNulls = Seq(Tuple1(Seq[java.lang.Long](5L, null, 9L)),
      Tuple1(Seq[java.lang.Long](null, null)))
      .toDF("hv")
    val hof = expr(
      "transform(sequence(0, 15), h -> " +
        "array_min(transform(hv, x -> (x * (2*h + 1) + 7919*h + 13) % 2147483647)))")
    val rows = withNulls
      .withColumn("a", org.apache.spark.sql.graft.GraftColumns
        .minhash_sig(col("hv"), 16, M))
      .withColumn("b", hof)
      .select("a", "b").collect()
    rows.foreach { r =>
      assert(r.getSeq[Any](0) == r.getSeq[Any](1))
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._

import graft.operators.{SelfQueryFilter => F}
import org.apache.spark.sql.graft.VectorFunctions._

/** Property-based checks (SURVEY.md §5 item 2). ScalaCheck generators with
  * explicit seeds (deterministic in CI; no scalatest-plus bridge in the
  * offline cache, so sampling is driven manually across 20 seeds per
  * property).
  */
class PropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val vecGen: Gen[Seq[Float]] =
    Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f)).map(_.toSeq)
      .suchThat(v => v.exists(x => math.abs(x) > 1e-3))

  test("cosine distance in [0,2], symmetric, zero on self (random vectors)") {
    for (seed <- 1L to 10L) {
      val vs = sample(Gen.listOfN(8, vecGen), seed)
      val pairs = for (a <- vs; b <- vs) yield (a, b)
      val ds = pairs.toDF("a", "b")
        .select(cosine_distance(col("a"), col("b"))).as[Double].collect()
      ds.foreach(d => assert(d >= -1e-9 && d <= 2.0 + 1e-9))
      val n = vs.length
      for (i <- 0 until n; j <- 0 until n)
        assert(ds(i * n + j) == ds(j * n + i))
      for (i <- 0 until n) assert(math.abs(ds(i * n + i)) < 1e-9)
    }
  }

  test("top-k == sort-then-take for random data and random k") {
    for (seed <- 1L to 20L) {
      val xs = sample(Gen.listOfN(60, Gen.chooseNum(-1e6, 1e6)), seed)
      val k = sample(Gen.chooseNum(1, 25), seed + 1000)
      val df = xs.zipWithIndex.toDF("x", "id")
      val topk = df.orderBy(col("x"), col("id")).limit(k)
        .select("id").as[Int].collect().toSeq
      val oracle = xs.zipWithIndex.sortBy { case (x, i) => (x, i) }
        .take(k).map(_._2)
      assert(topk == oracle)
    }
  }

  test("filter AST compiler agrees with direct scala evaluation") {
    val rowGen = for {
      lang <- Gen.oneOf("en", "de", "fr")
      n <- Gen.chooseNum(0L, 1000L)
    } yield (lang, n)
    for (seed <- 1L to 20L) {
      val rows = sample(Gen.listOfN(40, rowGen), seed)
      val threshold = sample(Gen.chooseNum(0L, 1000L), seed + 500)
      val ast = F.Or.of(
        F.And.of(F.Eq("lang", F.S("en")), F.Gt("n", F.I(threshold))),
        F.Not(F.Lte("n", F.I(threshold / 2))))
      val df = rows.zipWithIndex.map { case ((l, n), i) => (i, l, n) }
        .toDF("id", "lang", "n")
      val got = df.filter(F.compile(ast)).select("id").as[Int].collect().toSet
      val expected = rows.zipWithIndex.collect {
        case ((l, n), i) if (l == "en" && n > threshold) || !(n <= threshold / 2) => i
      }.toSet
      assert(got == expected)
    }
  }

  test("MetaPredicate row gate == Catalyst filter for random ASTs (pinned serving path)") {
    import graft.operators.PackedScan
    val langs = Seq("en", "de", "fr", "es")
    val rowGen = for {
      lang <- Gen.oneOf(langs)
      n <- Gen.chooseNum(-50L, 50L)
      s <- Gen.chooseNum(-5.0, 5.0)
      b <- Gen.oneOf(true, false)
    } yield (lang, n, s, b)
    val leafGen: Gen[F.Node] = Gen.oneOf[F.Node](
      Gen.chooseNum(-40L, 40L).map(v => F.Gt("n", F.I(v))),
      Gen.chooseNum(-40L, 40L).map(v => F.Lte("n", F.I(v))),
      Gen.chooseNum(-4.0, 4.0).map(v => F.Gte("score", F.D(v))),
      Gen.chooseNum(-4.0, 4.0).map(v => F.Lt("score", F.D(v))),
      Gen.oneOf(langs).map(l => F.Eq("lang", F.S(l))),
      Gen.oneOf(langs).map(l => F.Ne("lang", F.S(l))),
      Gen.someOf(langs).map(ls => F.In("lang", ls.toSeq.map(F.S(_)))),
      Gen.oneOf("e%", "%n", "%e%", "d_").map(p => F.Like("lang", p)),
      Gen.oneOf(true, false).map(v => F.Eq("flag", F.B(v))))
    val astGen: Gen[F.Node] = for {
      a <- leafGen; b <- leafGen; c <- leafGen
      pick <- Gen.chooseNum(0, 3)
    } yield pick match {
      case 0 => F.And(Seq(a, b))
      case 1 => F.Or(Seq(a, F.Not(b)))
      case 2 => F.Not(F.And(Seq(a, F.Or(Seq(b, c)))))
      case _ => F.Or(Seq(F.And(Seq(a, b)), c))
    }
    // the two independent compilers of the same AST — MetaPredicate.bind
    // on pinned primitive arrays (the serving row gate) and
    // SelfQueryFilter.compile through Catalyst — must agree on every
    // random (rows, ast) draw, including In([]) = false and LIKE
    for (seed <- 1L to 30L) {
      val rows = sample(Gen.listOfN(50, rowGen), seed)
      val ast = sample(astGen, seed + 9000)
      val df = rows.zipWithIndex.map { case ((l, n, s, b), i) =>
        (i.toLong, Seq(i.toFloat, 1.0f), l, n, s, b)
      }.toDF("vec_id", "embedding", "lang", "n", "score", "flag")
        .select(col("vec_id"), col("embedding").cast("array<float>"),
          col("lang"), col("n"), col("score"), col("flag"))
      val scan = PackedScan.build(df, "vec_id", "embedding",
        Seq("lang", "n", "score", "flag"))
      try {
        val got = scan.topK(Array(1.0f, 0.0f), rows.length + 5, Some(ast))
          .map(_._1).toSet
        val want = df.filter(F.compile(ast)).select("vec_id").as[Long]
          .collect().toSet
        assert(got == want, s"seed=$seed ast=$ast")
      } finally scan.unpersist()
    }
  }

  test("exact dedup is idempotent") {
    for (seed <- 1L to 10L) {
      val xs = sample(Gen.listOfN(50, Gen.oneOf("a", "b", "c", "d", "e")), seed)
      val df = xs.zipWithIndex.toDF("text", "id")
      val once = df.groupBy("text").agg(min("id").as("id"))
      val twice = once.groupBy("text").agg(min("id").as("id"))
      assert(once.collect().toSet == twice.collect().toSet)
    }
  }

  test("hash embedder: permutation-invariant norm, token sensitivity") {
    for (seed <- 1L to 10L) {
      val words = sample(Gen.listOfN(12,
        Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(8))), seed)
      val v1 = graft.functions.HashEmbedder.embed(words.mkString(" "))
      val norm = math.sqrt(v1.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
      // changing one token changes the embedding
      val v2 = graft.functions.HashEmbedder.embed((words :+ "zzzz").mkString(" "))
      assert(v1.toSeq != v2.toSeq)
    }
  }
}

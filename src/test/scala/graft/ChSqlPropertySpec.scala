package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.ChSql

/** Property armor for the ChSql text rewriter — the invariants that make
  * a tokenizer-based rewriter safe to put in front of user SQL:
  *
  *   1. IDENTITY on dialect-free SQL: text containing none of the CH
  *      clause forms comes back byte-identical (the rewriter never
  *      "helpfully" reformats what it does not own);
  *   2. LITERAL INVIOLABILITY: string literals containing the trigger
  *      words (PREWHERE, SAMPLE, FINAL, WITH TOTALS, `==`, FORMAT ...)
  *      are never rewritten, wherever they appear;
  *   3. IDEMPOTENCE: rewrite(rewrite(x)) == rewrite(x) — the output
  *      dialect is a fixed point, so double-rewriting (e.g. the
  *      injected parser on an already-rewritten text) is harmless.
  *
  * Seeded generators (deterministic across runs, per project policy).
  */
class ChSqlPropertySpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val ident: Gen[String] = for {
    h <- Gen.alphaChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  // literals deliberately stuffed with every trigger word and symbol
  private val hostileLit: Gen[String] = Gen.oneOf(
    "'PREWHERE x == 1'", "'SAMPLE 1/2 OFFSET 1/2'", "'a FINAL b'",
    "'GROUP BY x WITH TOTALS'", "'LIMIT 2 BY u'", "'FORMAT JSONEachRow'",
    "'ARRAY JOIN xs AS x'", "'it''s == quoted; really'",
    "'GLOBAL IN (1,2)'", "'WITH FILL STEP 2'")

  private val dialectFree: Gen[String] = for {
    c1 <- ident; c2 <- ident; t <- ident
    lit <- hostileLit
    n <- Gen.chooseNum(1, 999)
  } yield s"SELECT $c1, $c2, $lit AS lit FROM $t " +
    s"WHERE $c1 > $n AND $c2 <> $lit GROUP BY $c1, $c2, $lit " +
    s"HAVING count(*) > $n ORDER BY $c1 LIMIT $n"

  test("identity on dialect-free SQL (hostile literals included)") {
    (1L to 200L).foreach { seed =>
      val sql = sample(dialectFree, seed)
      assert(ChSql.rewrite(sql) == sql, s"seed=$seed rewrote:\n$sql")
    }
  }

  test("literals survive inside genuinely rewritten statements") {
    (1L to 200L).foreach { seed =>
      val lit = sample(hostileLit, seed)
      val t = sample(ident, seed + 1000)
      val rewritten = ChSql.rewrite(
        s"SELECT x, $lit AS l FROM $t PREWHERE x == 1 WHERE y > 2")
      assert(rewritten.contains(lit), s"seed=$seed lost literal $lit")
      // the CLAUSE is rewritten even while the literal copy survives
      assert(!rewritten.replace(lit, "").toUpperCase.contains("PREWHERE"))
      assert(rewritten.replace(lit, "").contains("WHERE"))
    }
  }

  test("rewrite is idempotent on its own output") {
    val shapes = Seq(
      "SELECT a, b FROM t PREWHERE a == 1 WHERE b > 2 ORDER BY a LIMIT 2 BY b LIMIT 9",
      "SELECT g, count(*) AS c FROM t GROUP BY g WITH TOTALS ORDER BY g NULLS FIRST",
      "SELECT x FROM t FINAL WHERE x GLOBAL IN (SELECT x FROM u) FORMAT JSONEachRow",
      "SELECT lang, tok FROM d ARRAY JOIN splitByChar(' ', s) AS tok PREWHERE n > 1")
    shapes.foreach { s0 =>
      val once = ChSql.rewrite(s0)
      assert(ChSql.rewrite(once) == once, s"not a fixed point:\n$s0\n->\n$once")
    }
    (1L to 100L).foreach { seed =>
      val sql = sample(dialectFree, seed + 5000)
      val once = ChSql.rewrite(sql)
      assert(ChSql.rewrite(once) == once)
    }
  }
}

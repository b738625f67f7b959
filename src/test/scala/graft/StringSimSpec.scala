package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Fuzzy string matching: textbook vectors (Winkler's MARTHA/MARHTA,
  * the true-DL discriminator CA→ABC), boundary rules, and identities.
  */
class StringSimSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = TestSpark.spark

  private def d1(sql: String): Double = spark.sql(sql).head().getDouble(0)

  test("damerauLevenshtein: true DL, not OSA") {
    // OSA would give 3 for CA->ABC; true DL transposes then inserts: 2
    assert(spark.sql("SELECT damerauLevenshteinDistance('CA', 'ABC')")
      .head().getInt(0) == 2)
    assert(spark.sql("SELECT damerauLevenshteinDistance('a cat', 'an act')")
      .head().getInt(0) == 2)
    assert(spark.sql("SELECT damerauLevenshteinDistance('', 'xyz')")
      .head().getInt(0) == 3)
    assert(spark.sql("SELECT editDistance('kitten', 'sitting')")
      .head().getInt(0) == 3)
  }

  test("jaro / jaroWinkler: Winkler's canonical pairs") {
    assert(math.abs(d1("SELECT jaroSimilarity('MARTHA', 'MARHTA')")
      - 17.0 / 18.0) < 1e-12)
    assert(math.abs(d1("SELECT jaroWinklerSimilarity('MARTHA', 'MARHTA')")
      - (17.0 / 18.0 + 3 * 0.1 * (1 - 17.0 / 18.0))) < 1e-12)
    assert(math.abs(d1("SELECT jaroWinklerSimilarity('DWAYNE', 'DUANE')")
      - 0.84) < 1e-12)
    // below the 0.7 boost threshold the prefix bonus must NOT apply
    assert(math.abs(d1("SELECT jaroWinklerSimilarity('aaxxxx', 'aayyyy')")
      - 5.0 / 9.0) < 1e-12)
    // either side empty -> 0 (the ClickHouse/DuckDB convention)
    assert(d1("SELECT jaroSimilarity('', 'abc')") === 0.0)
  }

  test("stringJaccardIndex: character sets") {
    // night/nacht: sets {n,i,g,h,t}/{n,a,c,h,t}, inter 3, union 7
    assert(math.abs(d1("SELECT stringJaccardIndex('night', 'nacht')")
      - 3.0 / 7.0) < 1e-12)
    // multiset-insensitive
    assert(d1("SELECT stringJaccardIndex('aab', 'ab')") === 1.0)
    assert(d1("SELECT stringJaccardIndex('', '')") === 1.0)
  }

  test("ngramDistance: Dice over 4-gram multisets") {
    assert(d1("SELECT ngramDistance('abcde', 'abcde')") === 0.0)
    // abcde={abcd,bcde}, abcdf={abcd,bcdf}: common 1 of 4 -> 0.5
    assert(math.abs(d1("SELECT ngramDistance('abcde', 'abcdf')") - 0.5) < 1e-12)
    // symmetric; bounded
    assert(d1("SELECT ngramDistance('abcdf', 'abcde')") ===
      d1("SELECT ngramDistance('abcde', 'abcdf')"))
    assert(d1("SELECT ngramDistance('abcd', 'wxyz')") === 1.0)
    // short strings: whole string is the gram
    assert(d1("SELECT ngramDistance('ab', 'ab')") === 0.0)
    assert(d1("SELECT ngramDistance('ab', 'cd')") === 1.0)
  }
}

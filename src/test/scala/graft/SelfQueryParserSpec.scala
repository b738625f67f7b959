package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{SelfQueryParser => P, SelfQueryFilter => F}

class SelfQueryParserSpec extends AnyFunSuite {

  test("fenced JSON envelope with nested filter expression") {
    val raw = """```json
      {
          "query": "papers about neural networks",
          "filter": "and(eq(\"lang\", \"en\"), gt(\"n_chars\", 300))"
      }
      ```"""
    val req = P.parseRequest(raw)
    assert(req.query === "papers about neural networks")
    assert(req.filter === Some(F.And(Seq(
      F.Eq("lang", F.S("en")), F.Gt("n_chars", F.I(300))))))
  }

  test("NO_FILTER sentinel and bare (unfenced) JSON") {
    val req = P.parseRequest("""{"query": "anything", "filter": "NO_FILTER"}""")
    assert(req.query === "anything")
    assert(req.filter === None)
  }

  test("full comparator set: ne/gte/lt/lte/contain/like/in/not/or") {
    val ast = P.parseFilter(
      """or(not(ne("a", 1)), and(gte("b", 1.5), lt("c", -2), lte("d", 3), """ +
        """contain("tags", "x"), like("t", "%y%"), in("lang", ["en", "de"])))""")
    assert(ast === F.Or(Seq(
      F.Not(F.Ne("a", F.I(1))),
      F.And(Seq(
        F.Gte("b", F.D(1.5)), F.Lt("c", F.I(-2)), F.Lte("d", F.I(3)),
        F.Contain("tags", F.S("x")), F.Like("t", "%y%"),
        F.In("lang", Seq(F.S("en"), F.S("de"))))))))
  }

  test("ISO dates become timestamp literals (pubdate comparisons, EP2)") {
    val ast = P.parseFilter("""gt("pubdate", "2021-01-01")""")
    assert(ast === F.Gt("pubdate", F.T("2021-01-01")))
  }

  test("booleans, escapes, and whitespace tolerance") {
    val ast = P.parseFilter("""and( eq("flag", true) , eq("name", "O\"Brien") )""")
    assert(ast === F.And(Seq(
      F.Eq("flag", F.B(true)), F.Eq("name", F.S("O\"Brien")))))
  }

  test("malformed input fails loudly, not silently") {
    assertThrows[IllegalArgumentException](P.parseFilter("""xq("a", 1)"""))
    assertThrows[IllegalArgumentException](P.parseFilter("""eq("a", 1"""))
    assertThrows[IllegalArgumentException](P.parseFilter("""eq("a", 1)) extra"""))
    assertThrows[IllegalArgumentException](P.parseRequest("not json at all {"))
  }

  test("parsed filter compiles and runs on the documents table") {
    val spark = TestSpark.spark
    val req = P.parseRequest(
      """{"query": "q", "filter": "and(eq(\"lang\", \"en\"), gt(\"n_chars\", 100))"}""")
    val n = Tables.documents(spark, TestSpark.sf)
      .filter(F.compile(req.filter.get)).count()
    val expected = Tables.documents(spark, TestSpark.sf)
      .filter("lang = 'en' AND n_chars > 100").count()
    assert(n === expected && n > 0)
  }
}

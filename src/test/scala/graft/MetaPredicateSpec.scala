package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MetaPredicate => M, SelfQueryFilter => F}

/** Bind-time contract of the pinned-path predicate compiler: the round-8
  * kinds (timestamps, list[string]/list[integral] with `contain`) bind
  * and evaluate exactly, and every still-unsupported shape is rejected
  * LOUDLY at bind — never a silent wrong answer at query time. (The
  * value-level parity vs the DataFrame path and the DuckDB oracle is
  * gated by q145/q146; this spec pins the compiler's edges, which no SQL
  * oracle can see.)
  */
class MetaPredicateSpec extends AnyFunSuite {

  // three rows of hand-packed metadata, the widened shapes the build
  // paths produce (arrays pre-sorted — packCol's contract)
  private val cols: Map[String, M.Col] = Map(
    "pubdate" -> M.packCol(4, Array[Any](
      ts("2020-01-01 00:00:00"), ts("2021-06-02 12:30:00"), ts("2023-01-01 00:00:00"))),
    "born" -> M.packCol(5, Array[Any](
      ntz("2020-01-01 00:00:00"), ntz("2021-06-02 12:30:00"), ntz("2023-01-01 00:00:00"))),
    "authors" -> M.packCol(6, Array[Any](
      Array("alice", "bob"), Array("carol"), Array("alice", "dave", "erin"))),
    "refs" -> M.packCol(7, Array[Any](
      Array(1L, 5L), Array(2L), Array[Long]())),
    "lang" -> M.packCol(2, Array[Any]("en", "de", "en")),
    "n" -> M.packCol(0, Array[Any](10L, 20L, 30L)))

  private def ts(s: String): Long = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    DateTimeUtils.stringToTimestamp(
      org.apache.spark.unsafe.types.UTF8String.fromString(s),
      java.time.ZoneId.systemDefault()).get
  }
  private def ntz(s: String): Long = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    DateTimeUtils.stringToTimestampWithoutTimeZone(
      org.apache.spark.unsafe.types.UTF8String.fromString(s)).get
  }

  private def eval(n: F.Node): Seq[Boolean] = {
    val p = M.bind(n, cols)
    (0 until 3).map(p)
  }

  test("timestamp comparators: range, eq, in — date-only and full literals") {
    assert(eval(F.Gt("pubdate", F.T("2020-03-01"))) == Seq(false, true, true))
    assert(eval(F.Lte("pubdate", F.T("2021-06-02 12:30:00"))) == Seq(true, true, false))
    assert(eval(F.Eq("pubdate", F.T("2021-06-02 12:30:00"))) == Seq(false, true, false))
    assert(eval(F.In("pubdate", Seq(F.T("2020-01-01"), F.T("2023-01-01")))) ==
      Seq(true, false, true))
    // NTZ columns compare the same wall-clock values zone-free
    assert(eval(F.Gt("born", F.T("2020-03-01"))) == Seq(false, true, true))
  }

  test("contain on list[string] and list[integral]; empty lists never match") {
    assert(eval(F.Contain("authors", F.S("alice"))) == Seq(true, false, true))
    assert(eval(F.Contain("authors", F.S("dave"))) == Seq(false, false, true))
    assert(eval(F.Contain("authors", F.S("zed"))) == Seq(false, false, false))
    assert(eval(F.Contain("refs", F.I(5))) == Seq(true, false, false))
    assert(eval(F.Contain("refs", F.I(9))) == Seq(false, false, false))
  }

  test("composition: the realistic 'papers by X after D' predicate") {
    val node = F.And.of(
      F.Gt("pubdate", F.T("2020-03-01")),
      F.Contain("authors", F.S("alice")),
      F.Eq("lang", F.S("en")))
    assert(eval(node) == Seq(false, false, true))
  }

  test("bind-time rejection: ordered comparators on array columns") {
    for (bad <- Seq[F.Node](
        F.Gt("authors", F.S("alice")), F.Lte("refs", F.I(3)),
        F.Eq("authors", F.S("alice")), F.In("authors", Seq(F.S("alice"))),
        F.Like("authors", "a%"))) {
      assertThrows[IllegalArgumentException](M.bind(bad, cols))
    }
  }

  test("bind-time rejection: contain on scalar columns and literal-type mismatches") {
    assertThrows[IllegalArgumentException](M.bind(F.Contain("lang", F.S("en")), cols))
    assertThrows[IllegalArgumentException](M.bind(F.Contain("n", F.I(10)), cols))
    assertThrows[IllegalArgumentException](M.bind(F.Contain("authors", F.I(3)), cols))
    assertThrows[IllegalArgumentException](M.bind(F.Contain("refs", F.S("5")), cols))
  }

  test("bind-time rejection: timestamp columns vs non-timestamp literals and bad literals") {
    assertThrows[IllegalArgumentException](M.bind(F.Gt("pubdate", F.I(5)), cols))
    assertThrows[IllegalArgumentException](M.bind(F.Gt("pubdate", F.S("2020-03-01")), cols))
    assertThrows[IllegalArgumentException](M.bind(F.Gt("pubdate", F.T("not a date")), cols))
    assertThrows[IllegalArgumentException](M.bind(F.Like("pubdate", "2020%"), cols))
  }

  test("kindOf rejects unsupported pinned types loudly") {
    import org.apache.spark.sql.types._
    assertThrows[IllegalArgumentException](
      M.kindOf(ArrayType(DoubleType), "embedding"))
    assertThrows[IllegalArgumentException](
      M.kindOf(MapType(StringType, StringType), "props"))
    assert(M.kindOf(TimestampType, "pubdate") == 4)
    assert(M.kindOf(TimestampNTZType, "pubdate") == 5)
    assert(M.kindOf(ArrayType(StringType), "authors") == 6)
    assert(M.kindOf(ArrayType(LongType), "refs") == 7)
  }

  test("valueAt is packCol's inverse for every kind (round-trip)") {
    for ((name, col) <- cols) {
      val kind = M.kindOfCol(col)
      val values = Array.tabulate[Any](col.length)(i => M.valueAt(col, i))
      val repacked = M.packCol(kind, values)
      (0 until col.length).foreach { i =>
        (M.valueAt(col, i), M.valueAt(repacked, i)) match {
          case (a: Array[_], b: Array[_]) => assert(a.toSeq == b.toSeq, name)
          case (a, b)                     => assert(a == b, name)
        }
      }
    }
  }

  test("session-timezone override away from the JVM zone is a LOUD bind error " +
      "for session-zone timestamps; NTZ columns stay zone-free") {
    // the contract was previously only documented (r8 verdict item 6):
    // session-zone TIMESTAMP literals parse in the JVM-default zone, so a
    // session.timeZone override would silently shift every pinned
    // comparison — it must refuse at bind instead
    val spark = graft.TestSpark.spark // active session so SQLConf.get sees conf
    val jvm = java.time.ZoneId.systemDefault()
    val mismatched =
      if (jvm.getRules == java.time.ZoneId.of("UTC").getRules) "America/New_York"
      else "UTC"
    val original = spark.conf.get("spark.sql.session.timeZone")
    // sanity under the MATCHING zone: both kinds bind and evaluate
    assert(M.bind(F.Gt("pubdate", F.T("2021-01-01 00:00:00")), cols)(1))
    try {
      spark.conf.set("spark.sql.session.timeZone", mismatched)
      val e = intercept[IllegalArgumentException](
        M.bind(F.Gt("pubdate", F.T("2021-01-01 00:00:00")), cols))
      assert(e.getMessage.contains(mismatched) &&
        e.getMessage.contains("TIMESTAMP_NTZ"),
        s"error must name the zones and the NTZ alternative: ${e.getMessage}")
      // NTZ comparison is naive wall-clock — unaffected by the override
      val pNtz = M.bind(F.Gt("born", F.T("2021-01-01 00:00:00")), cols)
      assert(!pNtz(0) && pNtz(1) && pNtz(2))
    } finally spark.conf.set("spark.sql.session.timeZone", original)
  }
}

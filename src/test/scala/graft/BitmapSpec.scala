package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.graft.{Bitmap32, BitmapOps}

/** Roaring-lite bitmap family (ClickHouse groupBitmap / bitmap*): the
  * container algebra pinned against a plain Set model across the
  * array<->bitset promotion boundary, canonical-serialization guarantees
  * (equal sets => identical bytes, which is what makes bitmap columns
  * deterministic under any partitioning), and the SQL surface.
  */
class BitmapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def bm(vs: Iterable[Long]): Bitmap32 = {
    val b = new Bitmap32
    vs.foreach(b.add)
    b
  }

  private def roundTrip(b: Bitmap32): Bitmap32 =
    Bitmap32.deserialize(b.serialize())

  test("add/contains/cardinality/min/max and empty contracts") {
    val b = bm(Seq(5L, 70000L, 5L, 0L, 4294967295L))
    assert(b.cardinality === 4L)
    assert(b.contains(70000L) && b.contains(0L) && b.contains(4294967295L))
    assert(!b.contains(6L) && !b.contains(-1L) && !b.contains(1L << 40))
    assert(b.min === 0L && b.max === 4294967295L)
    val e = new Bitmap32
    // ClickHouse contracts: bitmapMin(empty)=UINT32_MAX, bitmapMax(empty)=0
    assert(e.min === 4294967295L && e.max === 0L && e.cardinality === 0L)
    intercept[IllegalArgumentException] { e.add(-1L) }
    intercept[IllegalArgumentException] { e.add(4294967296L) }
  }

  test("set algebra matches the Set model across the promotion boundary") {
    val rnd = new scala.util.Random(42)
    // two sets straddling several high blocks; one block dense enough to
    // promote (>4096 in block 3), plus exact block-boundary values
    def gen(): Set[Long] = {
      val sparse = Set.fill(3000)(rnd.nextInt(1 << 18).toLong)
      val dense = (0 until 6000).map(_ => 3L * 65536L + rnd.nextInt(65536)).toSet
      val edges = Set(0L, 65535L, 65536L, 131071L, 4294967295L).filter(_ => rnd.nextBoolean())
      sparse ++ dense ++ edges
    }
    val sa = gen()
    val sb = gen()
    val (a, b) = (bm(sa), bm(sb))
    assert(Bitmap32.and(a, b).toLongArray.toSet === (sa & sb))
    assert(Bitmap32.or(a, b).toLongArray.toSet === (sa | sb))
    assert(Bitmap32.xor(a, b).toLongArray.toSet === ((sa | sb) -- (sa & sb)))
    assert(Bitmap32.andNot(a, b).toLongArray.toSet === (sa -- sb))
    assert(Bitmap32.andCardinality(a, b) === (sa & sb).size.toLong)
    // toLongArray is ascending
    val arr = Bitmap32.or(a, b).toLongArray
    assert(arr.toSeq === arr.toSeq.sorted)
    // ops did not mutate the functional inputs
    assert(a.toLongArray.toSet === sa && b.toLongArray.toSet === sb)
  }

  test("canonical serialization: same set => same bytes, any build order") {
    val vs = (0 until 5000).map(i => (i * 37L) % 200000L)
    val fwd = bm(vs)
    val rev = bm(vs.reverse)
    assert(java.util.Arrays.equals(fwd.serialize(), rev.serialize()))
    // ops results are canonical too: a big AND that shrinks below 4096
    // must serialize as an array container, byte-equal to a direct build
    val big1 = bm((0L until 10000L))
    val big2 = bm((9000L until 20000L))
    val viaOp = Bitmap32.and(big1, big2)
    val direct = bm((9000L until 10000L))
    assert(java.util.Arrays.equals(viaOp.serialize(), direct.serialize()))
    // and the same through a serialize round-trip
    assert(roundTrip(viaOp).toLongArray.toSeq === (9000L until 10000L).toSeq)
  }

  test("hasAll/hasAny/subBitmap") {
    val a = bm(0L until 9000L) // promoted block 0
    val sub = bm(Seq(5L, 4096L, 8999L))
    assert(a.hasAll(sub) && !sub.hasAll(a))
    assert(a.hasAny(bm(Seq(8999L, 999999L))) && !a.hasAny(bm(Seq(999999L))))
    assert(a.hasAll(new Bitmap32), "empty set is a subset of anything")
    val slice = a.subBitmap(8995L, 10L)
    assert(slice.toLongArray.toSeq === (8995L until 9000L).toSeq)
    assert(a.subBitmap(0L, 3L).toLongArray.toSeq === Seq(0L, 1L, 2L))
    assert(a.subBitmap(20000L, 5L).cardinality === 0L)
  }

  test("groupBitmap == count(DISTINCT) and state composes with scalar ops") {
    GraftSession.install(spark)
    val ev = Tables.events(spark, TestSpark.sf)
    ev.createOrReplaceTempView("bm_events")
    val r = spark.sql("""
      SELECT groupBitmap(user_id) AS gb, count(DISTINCT user_id) AS cd
      FROM bm_events""").head()
    assert(r.getLong(0) === r.getLong(1))
    // per-type states, then pairwise algebra vs the exact SQL sets
    val st = spark.sql("""
      SELECT event_type, groupBitmapState(user_id) AS bm
      FROM bm_events GROUP BY event_type""").collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val types = st.keys.toSeq.sorted
    val t1 = types.head
    val t2 = types.last
    val exact = spark.sql(s"""
      SELECT count(DISTINCT CASE WHEN a AND b THEN user_id END) AS both,
             count(DISTINCT CASE WHEN a OR b THEN user_id END) AS either,
             count(DISTINCT CASE WHEN a AND NOT b THEN user_id END) AS onlya
      FROM (SELECT user_id,
              max(event_type = '$t1') AS a, max(event_type = '$t2') AS b
            FROM bm_events GROUP BY user_id)""").head()
    assert(BitmapOps.andCard(st(t1), st(t2)) === exact.getLong(0))
    assert(BitmapOps.orCard(st(t1), st(t2)) === exact.getLong(1))
    assert(BitmapOps.andnotCard(st(t1), st(t2)) === exact.getLong(2))
    assert(BitmapOps.xorCard(st(t1), st(t2)) ===
      exact.getLong(1) - exact.getLong(0))
  }

  test("bitmap state bytes are partitioning-independent") {
    GraftSession.install(spark)
    val ev = Tables.events(spark, TestSpark.sf)
    def state(parts: Int): Array[Byte] = {
      ev.repartition(parts).createOrReplaceTempView("bm_part")
      spark.sql("SELECT groupBitmapState(user_id) AS bm FROM bm_part")
        .head().getAs[Array[Byte]](0)
    }
    assert(java.util.Arrays.equals(state(1), state(7)))
  }

  test("SQL surface: build/toArray/contains/min/max/merge aggregates") {
    GraftSession.install(spark)
    Seq(
      (1L, Seq(1L, 2L, 3L, 70000L)),
      (1L, Seq(2L, 3L, 4L)),
      (2L, Seq(10L))
    ).toDF("g", "vals").createOrReplaceTempView("bm_sql")
    val r: Row = spark.sql("""
      SELECT bitmapToArray(bitmapAnd(bitmapBuild(array(1L,2L,3L)),
                                     bitmapBuild(array(2L,3L,9L)))) AS i,
             bitmapContains(bitmapBuild(array(5L)), 5L) AS c5,
             bitmapContains(bitmapBuild(array(5L)), 6L) AS c6,
             bitmapMin(bitmapBuild(array(7L, 3L))) AS mn,
             bitmapMax(bitmapBuild(array(7L, 3L))) AS mx,
             bitmapCardinality(subBitmap(bitmapBuild(array(1L,2L,3L,4L)), 1L, 2L)) AS sb,
             bitmapHasAll(bitmapBuild(array(1L,2L,3L)), bitmapBuild(array(2L,3L))) AS ha,
             bitmapHasAny(bitmapBuild(array(1L)), bitmapBuild(array(9L))) AS hn
      FROM (SELECT 1)""").head()
    assert(r.getSeq[Long](0) === Seq(2L, 3L))
    assert(r.getBoolean(1) && !r.getBoolean(2))
    assert(r.getLong(3) === 3L && r.getLong(4) === 7L)
    assert(r.getLong(5) === 2L)
    assert(r.getBoolean(6) && !r.getBoolean(7))
    val agg = spark.sql("""
      SELECT g,
             groupBitmapAnd(bitmapBuild(vals)) AS andc,
             groupBitmapOr(bitmapBuild(vals)) AS orc,
             bitmapToArray(groupBitmapAndState(bitmapBuild(vals))) AS ands
      FROM bm_sql GROUP BY g ORDER BY g""").collect()
    assert(agg(0).getLong(1) === 2L) // {2,3}
    assert(agg(0).getLong(2) === 5L) // {1,2,3,4,70000}
    assert(agg(0).getSeq[Long](3) === Seq(2L, 3L))
    assert(agg(1).getLong(1) === 1L && agg(1).getLong(2) === 1L)
  }
}

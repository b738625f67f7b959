package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.{Catalog, ChDdl}

/** Deletion-vector lightweight deletes (r11 verdict item 1): CH's
  * `DELETE FROM t WHERE p` writes a `_row_exists` mask instead of
  * rewriting parts — [[Catalog.deleteWhereLight]] is the graft analog
  * (a `_deletes` (file, pos) sidecar every read anti-joins away).
  * The contract pinned here:
  *
  *   1. the delete leaves every DATA file byte-untouched (mtime+size) —
  *      the lightweight property itself;
  *   2. the masked read equals the heavy-delete twin exactly;
  *   3. masks compose across successive deletes;
  *   4. heavy mutations read through the mask (net state) and their
  *      rewrite materializes the entries they cover, pruning the sidecar
  *      to the still-live partitions;
  *   5. OPTIMIZE folds masks into the parts (sidecar gone, rows physical);
  *   6. on a ReplacingMergeTree, masking the NEWEST version resurfaces
  *      the older one — the mask filters BEFORE the merge, like CH;
  *   7. rows appended after a delete are untouched by old masks.
  */
class MaskSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshCat(tag: String) =
    Catalog(spark, Files.createTempDirectory(tag).toString)

  /** (relative path -> (bytes, mtime)) of every DATA file of a table. */
  private def dataFiles(cat: Catalog, table: String): Map[String, (Long, Long)] = {
    val root = Paths.get(cat.root, table)
    Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !root.relativize(p).toString.split('/').exists(_.startsWith("_")))
      .map(p => root.relativize(p).toString ->
        (Files.size(p), Files.getLastModifiedTime(p).toMillis))
      .toMap
  }

  private def docs(n: Int) =
    spark.range(n).select(
      col("id"),
      concat(lit("l"), col("id") % 3).as("lang"),
      (col("id") * 7 % 100).as("n"))

  test("lightweight delete leaves data files byte-untouched") {
    val cat = freshCat("mask1")
    cat.create("t", docs(3000).repartition(3, col("lang")), Seq("lang"))
    val before = dataFiles(cat, "t")
    cat.deleteWhereLight("t", col("id") % 4 === 0)
    assert(dataFiles(cat, "t") == before) // THE lightweight property
    assert(cat.hasDeletes("t"))
    assert(cat.readRaw("t").count() == 3000 - 750)
  }

  test("masked read equals the heavy-delete twin") {
    val cat = freshCat("mask2")
    val pred = col("lang") === "l1" && col("n") > 50
    cat.create("light", docs(3000), Seq("lang"))
    cat.create("heavy", docs(3000), Seq("lang"))
    cat.deleteWhereLight("light", pred)
    cat.deleteWhere("heavy", pred)
    val a = cat.readRaw("light").orderBy("id").collect().toSeq
    val b = cat.readRaw("heavy").orderBy("id").collect().toSeq
    assert(a == b)
  }

  test("masks compose across successive deletes") {
    val cat = freshCat("mask3")
    cat.create("t", docs(1000))
    cat.deleteWhereLight("t", col("id") % 2 === 0)
    cat.deleteWhereLight("t", col("id") % 3 === 0)
    // second delete's predicate also matched already-masked rows —
    // duplicates in the sidecar must not double-remove anything
    val ids = cat.readRaw("t").select("id").as[Long].collect().toSet
    assert(ids == (0L until 1000L).filter(i => i % 2 != 0 && i % 3 != 0).toSet)
  }

  test("heavy mutation reads through masks and prunes applied entries") {
    val cat = freshCat("mask4")
    cat.create("t", docs(3000).repartition(3, col("lang")), Seq("lang"))
    cat.deleteWhereLight("t", col("id") % 5 === 0) // all three partitions
    val l1Before = dataFiles(cat, "t").filter(_._1.startsWith("lang=l1"))
    // heavy UPDATE on l2 only: must see the masked net state, rewrite
    // only lang=l2, and drop the sidecar entries it materialized
    cat.updateWhere("t", col("lang") === "l2", Map("n" -> (col("n") + 1000)))
    assert(dataFiles(cat, "t").filter(_._1.startsWith("lang=l1")) == l1Before)
    assert(cat.hasDeletes("t")) // l0/l1 entries still live
    val rows = cat.readRaw("t").collect()
    assert(rows.forall(r => r.getAs[Long]("id") % 5 != 0)) // masks still apply everywhere
    assert(rows.filter(_.getAs[String]("lang") == "l2")
      .forall(_.getAs[Long]("n") >= 1000))
    // the l2 entries were materialized by the rewrite: delete everything
    // still masked, sidecar must empty out and vanish
    cat.updateWhere("t", col("lang").isin("l0", "l1"), Map("n" -> (col("n") + 1000)))
    assert(!cat.hasDeletes("t"))
    assert(cat.readRaw("t").count() == rows.length)
  }

  test("OPTIMIZE materializes masks physically") {
    val cat = freshCat("mask5")
    val x = ChDdl.execute(cat, _: String)
    x("CREATE TABLE t (id Int64, lang String, n Int64) ENGINE = MergeTree ORDER BY id PARTITION BY lang")
    docs(900).createOrReplaceTempView("mask5_src")
    x("INSERT INTO t SELECT id, lang, n FROM mask5_src")
    x("DELETE FROM t WHERE id % 3 == 0")
    assert(cat.hasDeletes("t"))
    val expect = ChDdl.execute(cat, "SELECT * FROM t ORDER BY id").collect().toSeq
    x("OPTIMIZE TABLE t FINAL")
    assert(!cat.hasDeletes("t"))
    assert(ChDdl.execute(cat, "SELECT * FROM t ORDER BY id").collect().toSeq == expect)
    assert(expect.size == 600)
  }

  test("replacing merge: masking the newest version resurfaces the older") {
    val cat = freshCat("mask6")
    cat.create("t", Seq((1L, 1L, "old"), (2L, 1L, "keep")).toDF("id", "v", "s"))
    cat.append("t", Seq((1L, 2L, "new")).toDF("id", "v", "s"))
    assert(cat.read("t", Seq("id"), "v").orderBy("id")
      .select("s").as[String].collect().toSeq == Seq("new", "keep"))
    cat.deleteWhereLight("t", col("id") === 1 && col("v") === 2)
    // the masked newest version never enters the merge — CH FINAL + mask
    assert(cat.read("t", Seq("id"), "v").orderBy("id")
      .select("s").as[String].collect().toSeq == Seq("old", "keep"))
  }

  test("appends after a delete are untouched by old masks") {
    val cat = freshCat("mask7")
    cat.create("t", docs(100))
    cat.deleteWhereLight("t", col("id") >= 0) // mask everything
    assert(cat.readRaw("t").count() == 0)
    cat.append("t", docs(100)) // same ids, NEW files
    assert(cat.readRaw("t").count() == 100)
  }
}

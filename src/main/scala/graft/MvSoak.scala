package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Catalog, ChDdl}

/** Materialized-view trigger soak: before trusting the ChDdl matview
  * story at 100 TB, measure — not re-derive — the cost shape that makes
  * CH matviews viable at scale: the insert trigger runs the AS-SELECT
  * over the INSERTED BLOCK ONLY, so per-insert cost must track BLOCK
  * size, not BASE size. The soak grows one base table through repeated
  * equal-size block inserts (base grows 20×) and records each trigger's
  * wall; a flat series is the contract, a rising one would mean the
  * trigger re-reads the base (the bug this soak exists to catch). Also
  * records: partial-row growth (bounded by blocks × |keys|, merged to
  * |keys| by OPTIMIZE FINAL) and the merged-read wall before vs after
  * OPTIMIZE (the read pays one groupBy of the partial log either way —
  * OPTIMIZE bounds the log, CH's own background-merge bargain).
  *
  * Not driver-run; results are committed in PLANS.md ("Matview trigger
  * soak").
  */
object MvSoak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val blocks = sys.env.getOrElse("SOAK_BLOCKS", "20").toInt
    val rowsPerBlock = sys.env.getOrElse("SOAK_BLOCK_ROWS", "200000").toLong
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val docs = Tables.documents(spark, sfDir)
    val nd = docs.count()
    val copies = math.max(1L, rowsPerBlock / math.max(1L, nd)).toInt
    // one block's worth of rows, reused with a shifted id per insert so
    // every block is distinct data at identical size
    val block = docs
      .withColumn("__c", explode(sequence(lit(0), lit(copies - 1))))
      .select((col("doc_id") + col("__c") * 10000000L).as("doc_id"),
        col("lang"), col("source"), col("n_chars"))
    block.createOrReplaceTempView("mv_soak_block")
    val blockRows = block.count()

    val cat = Catalog(spark,
      java.nio.file.Files.createTempDirectory("mv_soak").toString)
    val x = ChDdl.execute(cat, _: String)
    x("""CREATE TABLE base (doc_id Int64, lang String, source String,
         n_chars Int64) ENGINE = MergeTree ORDER BY doc_id""")
    x("""CREATE MATERIALIZED VIEW stats ENGINE = SummingMergeTree
         ORDER BY (lang, source)
         AS SELECT lang, source, count(*) AS docs, sum(n_chars) AS chars
            FROM base GROUP BY lang, source""")

    println(s"block=$blockRows rows x $blocks inserts " +
      s"(base ends at ${blockRows * blocks} rows)")
    val walls = (1 to blocks).map { i =>
      val (_, w) = timed(x(
        s"INSERT INTO base SELECT doc_id + ${i.toLong * 1000000000L}, " +
          "lang, source, n_chars FROM mv_soak_block"))
      println(f"insert $i%2d: base=${blockRows * i}%9d rows  wall=$w%6.2f s")
      w
    }
    val firstHalf = walls.take(blocks / 2).sum / (blocks / 2)
    val secondHalf = walls.drop(blocks / 2).sum / (blocks - blocks / 2)
    println(f"mean wall first-half=$firstHalf%5.2f s  second-half=" +
      f"$secondHalf%5.2f s  ratio=${secondHalf / firstHalf}%4.2f " +
      "(flat ≈ 1.0 = trigger cost tracks block, not base)")

    val partialRows = cat.readRaw("stats").count()
    val ((r1, wPre)) = timed(ChDdl.matViewFinal(cat, "stats").count())
    val (_, wOpt) = timed(x("OPTIMIZE TABLE stats FINAL"))
    val mergedRows = cat.readRaw("stats").count()
    val ((r2, wPost)) = timed(ChDdl.matViewFinal(cat, "stats").count())
    println(f"partial rows=$partialRows (bounded by blocks x |keys|) -> " +
      f"merged=$mergedRows; read pre-OPTIMIZE=$wPre%5.2f s " +
      f"post=$wPost%5.2f s (OPTIMIZE itself $wOpt%5.2f s); " +
      s"key-count stable=${r1 == r2}")
    spark.stop()
  }
}

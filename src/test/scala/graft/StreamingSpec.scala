package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.HashEmbedder
import graft.streaming.EventsStream

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def stageDir(): String = {
    val dir = Files.createTempDirectory("graft-stream").toString
    Files.copy(
      Paths.get(s"${TestSpark.sf}/events.parquet"),
      Paths.get(s"$dir/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("streaming tumbling agg (complete mode) equals batch twin") {
    val dir = stageDir()
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.tumbling(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = EventsStream.tumbling(Tables.events(spark, TestSpark.sf))
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful mapGroupsWithState running counts match batch groupBy") {
    import spark.implicits._
    val dir = stageDir()
    val stream = EventsStream.readStream(spark, dir).as[EventsStream.Event]
    val q = EventsStream.runningUserCounts(stream)
      .toDF("user_id", "n")
      .writeStream.outputMode("update")
      .format("memory").queryName("state_out").start()
    try {
      q.processAllAvailable()
      // last emitted row per user = final running count
      val streamed = spark.table("state_out")
        .groupBy("user_id").agg(org.apache.spark.sql.functions.max("n").as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val batch = Tables.events(spark, TestSpark.sf)
        .groupBy("user_id").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("flatMapGroupsWithState sessionizer: in-batch gap + timeout closes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventsStream.Event]
    val q = EventsStream.sessionizeStateful(ms.toDS(), gapMinutes = 15)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    def ev(id: Long, user: Long, minute: Long) = EventsStream.Event(
      id, new java.sql.Timestamp(minute * 60000), user, "click", 1.0, "{}")
    try {
      // batch 1: user 1 has an in-batch gap (0,5 | 60,65); user 2 left open
      // minute offsets start at 1000: events at epoch 0 would collide
      // with the INITIAL watermark (also epoch 0) and be dropped as late
      ms.addData(ev(1, 1, 1000), ev(2, 1, 1005), ev(3, 1, 1060), ev(4, 1, 1065),
        ev(5, 2, 1000), ev(6, 2, 1002))
      q.processAllAvailable()
      // push the watermark far past every open timeout, then one more
      // micro-batch so the timed-out states are processed and emitted
      ms.addData(ev(7, 3, 1500))
      q.processAllAvailable()
      ms.addData(ev(8, 3, 1501))
      q.processAllAvailable()
      val got = spark.table("sess_out").as[EventsStream.ClosedSession].collect()
        .map(s => (s.user_id, s.session_start.getTime / 60000,
          s.session_end.getTime / 60000, s.n_events)).toSet
      assert(got.contains((1L, 1000L, 1005L, 2))) // closed by the in-batch gap
      assert(got.contains((1L, 1060L, 1065L, 2))) // closed by event-time timeout
      assert(got.contains((2L, 1000L, 1002L, 2))) // closed by event-time timeout
      assert(!got.exists(_._1 == 3L))         // user 3's session is still open
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark: cross-batch re-deliveries dedup on content") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[EventsStream.Event]
    val q = EventsStream.dedupWithinWatermark(ms.toDS().toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    def ev(id: Long, user: Long, minute: Long, props: String) = EventsStream.Event(
      id, new java.sql.Timestamp(minute * 60000), user, "doc", 1.0, props)
    try {
      // batch 1: two distinct payloads, one duplicated in-batch
      ms.addData(ev(1, 1, 1000, "{\"d\":\"a\"}"), ev(2, 1, 1001, "{\"d\":\"a\"}"),
        ev(3, 2, 1002, "{\"d\":\"b\"}"))
      q.processAllAvailable()
      // batch 2: payload "a" re-delivered under a NEW event id within the
      // watermark window — must still dedup (content key, not id); payload
      // "c" is genuinely new
      ms.addData(ev(4, 1, 1003, "{\"d\":\"a\"}"), ev(5, 3, 1004, "{\"d\":\"c\"}"))
      q.processAllAvailable()
      val got = spark.table("dedup_out").select("event_id").as[Long].collect().toSet
      assert(got == Set(1L, 3L, 5L)) // one survivor per distinct payload
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch twin") {
    val dir = stageDir()
    val stream = EventsStream.readStream(spark, dir)
    val purchases = stream.filter(col("event_type") === "purchase")
    val views = stream.filter(col("event_type") === "view")
    val q = EventsStream.purchasesWithRecentViews(purchases, views)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    try {
      q.processAllAvailable()
      q.processAllAvailable() // second trigger flushes watermark-closed state
      val batchEvents = Tables.events(spark, TestSpark.sf)
      val batch = EventsStream.purchasesWithRecentViews(
        batchEvents.filter(col("event_type") === "purchase"),
        batchEvents.filter(col("event_type") === "view"))
        .collect().map(_.toSeq).toSet
      val streamed = spark.table("ssj_out").collect().map(_.toSeq).toSet
      // append-mode emits matches once both watermarks pass; with a single
      // static file everything closes, so the sets must be equal
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("session_window agg agrees with the lag/cumsum sessionization (q34)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, TestSpark.sf)
    // two independent algorithms for gap-based sessions must agree
    val viaSessionWindow = ev
      .groupBy(col("user_id"), session_window(col("ts"), "1 hour"))
      .agg(count(lit(1)))
      .groupBy("user_id").agg(count(lit(1)).as("n_sessions"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val viaLagCumsum = SparkEntry.queries("q34_sessionize")(spark, TestSpark.sf)
      .select("user_id", "n_sessions")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaSessionWindow == viaLagCumsum)
  }

  test("stream-static broadcast join enriches every event") {
    import org.apache.spark.sql.functions._
    val dir = stageDir()
    val batchEvents = Tables.events(spark, TestSpark.sf)
    val userDim = batchEvents.select("user_id").distinct()
      .withColumn("tier", col("user_id") % 3)
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.enriched(stream, userDim)
      .groupBy("tier").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_out")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val batch = EventsStream.enriched(batchEvents, userDim)
        .groupBy("tier").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(streamed == batch && streamed.nonEmpty)
    } finally q.stop()
  }

  test("foreachBatch sink: stream upserts into MvccCatalog, versions = batches") {
    import graft.operators.MvccCatalog
    val dir = stageDir()
    val root = Files.createTempDirectory("graft-mvcc-stream").toString
    val cat = MvccCatalog(spark, root)
    val ckpt = Files.createTempDirectory("graft-ckpt").toString
    val stream = EventsStream.readStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
    val q = stream.writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        if (id == 0) cat.create("ev", batch, version = 1)
        else cat.append("ev", batch, version = id + 1)
      }
      .start()
    try {
      q.processAllAvailable()
      val streamed = cat.read("ev", Seq("event_id")).count()
      val batch = Tables.events(spark, TestSpark.sf).count()
      assert(streamed === batch)
      // the catalog's MVCC machinery still works on the streamed table
      cat.deleteWhere("ev", col("user_id") === 1, Seq("event_id"),
        version = cat.currentVersion("ev") + 1)
      val afterDelete = cat.read("ev", Seq("event_id")).count()
      val expected = Tables.events(spark, TestSpark.sf)
        .filter(col("user_id") =!= 1).count()
      assert(afterDelete === expected)
    } finally q.stop()
  }

  test("foreachBatch into a ChDdl table: the matview trigger fires per micro-batch") {
    import graft.operators.{Catalog, ChDdl}
    val dir = stageDir()
    val root = Files.createTempDirectory("graft-chddl-stream").toString
    val cat = Catalog(spark, root)
    val x = ChDdl.execute(cat, _: String)
    x("""CREATE TABLE ev_live (event_id Int64, user_id Int64, value Float64)
         ENGINE = MergeTree ORDER BY event_id""")
    x("""CREATE MATERIALIZED VIEW ev_mv ENGINE = SummingMergeTree
         ORDER BY user_id
         AS SELECT user_id, count(*) AS n FROM ev_live GROUP BY user_id""")
    val ckpt = Files.createTempDirectory("graft-ckpt-chddl").toString
    val q = EventsStream.readStream(spark, dir)
      .select(col("event_id"), col("user_id"), col("value"))
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // each micro-batch is one CH insert block: bind it as a view and
        // route it through the statement surface — the matview trigger
        // runs over THIS block only (MvSoak measures that contract).
        // foreachBatch hands a CLONED session; the catalog (same root, so
        // the same ChDdl defs) must execute on it to see the view
        batch.createOrReplaceTempView("__stream_block")
        ChDdl.execute(Catalog(batch.sparkSession, root),
          "INSERT INTO ev_live SELECT event_id, user_id, value FROM __stream_block")
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val events = Tables.events(spark, TestSpark.sf)
      assert(ChDdl.view(cat, "ev_live").count() === events.count())
      // matview (merged) equals the batch groupBy twin
      val mv = ChDdl.matViewFinal(cat, "ev_mv")
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      val twin = events.groupBy("user_id").count()
        .orderBy("user_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(mv.toSeq === twin.toSeq)
    } finally q.stop()
  }

  test("foreachBatch replay is idempotent: re-committing a version never duplicates") {
    import graft.operators.MvccCatalog
    // foreachBatch delivers at-least-once; the sink upgrades it to
    // exactly-once because version = f(batchId) and MvccCatalog commits
    // REPLACE their own __v partition (see MvccCatalog commit contract).
    // This simulates the failure replay: the same batch committed again
    // under the same version, for both appends and deletes.
    val root = Files.createTempDirectory("graft-mvcc-replay").toString
    val cat = MvccCatalog(spark, root)
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("user_id"), col("value"))
    val b1 = ev.filter(col("event_id") % 2 === 0)
    val b2 = ev.filter(col("event_id") % 2 === 1)
    cat.create("t", b1, version = 1)
    cat.append("t", b2, version = 2)
    val committed = cat.read("t", Seq("event_id")).count()
    assert(committed === ev.count())
    cat.append("t", b2, version = 2) // replayed commit
    cat.append("t", b2, version = 2) // and again
    assert(cat.read("t", Seq("event_id")).count() === committed)
    assert(cat.currentVersion("t") === 2L)
    cat.deleteWhere("t", col("user_id") === 1, Seq("event_id"), version = 3)
    val afterDelete = cat.read("t", Seq("event_id")).count()
    cat.deleteWhere("t", col("user_id") === 1, Seq("event_id"), version = 3) // replayed
    assert(cat.read("t", Seq("event_id")).count() === afterDelete)
    // time travel still sees the pre-delete snapshot
    assert(cat.read("t", Seq("event_id"), asOf = Some(2L)).count() === committed)
  }

  test("streaming windowFunnel equals the batch behavioral aggregate (q151)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val win = 24L * 3600 * 1000000
    val stages = Seq("view", "click", "purchase")
    val batchDf = Tables.events(spark, TestSpark.sf)
    val expected = graft.operators.Funnel.windowFunnel(
      batchDf, "user_id", "ts", win,
      stages.map(col("event_type") === _))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap

    // feed the SAME events ts-ordered in 3 micro-batches (the append-only
    // arrival contract); levels must converge to the batch DP's exactly
    val all = batchDf.as[EventsStream.Event].collect().sortBy(_.ts.getTime)
    val ms = MemoryStream[EventsStream.Event]
    val q = EventsStream.funnelStateful(ms.toDS(), win,
      stages.map(s => (e: EventsStream.Event) => e.event_type == s))
      .toDF("user_id", "level")
      .writeStream.outputMode("update")
      .format("memory").queryName("funnel_out").start()
    try {
      all.grouped(math.max(1, all.length / 3 + 1)).foreach { chunk =>
        ms.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // level only moves forward: last emission per user = max
      val streamed = spark.table("funnel_out")
        .groupBy("user_id").agg(max("level").as("level"))
        .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(streamed.nonEmpty)
      // batch output covers users with >=1 STAGE-MATCHED event; the stream
      // also emits level 0 for users whose events all missed every stage
      assert(streamed.view.filterKeys(expected.contains).toMap === expected)
      assert(streamed.view.filterKeys(!expected.contains(_)).values.forall(_ == 0))
    } finally q.stop()
  }

  test("streaming IVF maintenance: arriving vectors appended into partitioned index") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{AnnIndex, VectorStore}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // freeze centroids on the existing corpus; stream in NEW vectors
    val e = Tables.embeddings(spark, TestSpark.sf)
    val (model, _) = AnnIndex.fitPersistedCached(e, TestSpark.sf, "embedding", "vec_id", 16, 3)
    val idxPath = Files.createTempDirectory("graft-ivf-stream").toString + "/idx"
    // seed the streaming index with the base corpus
    AnnIndex.appendAssigned(model, e, "embedding", idxPath)
    // new vectors arrive as micro-batches (deterministic: re-embedded text)
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = ms.toDS().toDF("vec_id", "embedding")
      .withColumn("label", lit(99))
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("graft-ivf-ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        AnnIndex.appendAssigned(model, batch, "embedding", idxPath)
      }
      .start()
    try {
      val newVecs = (0 until 20).map(i =>
        (100000L + i, HashEmbedder.embed(s"streamed doc $i").toSeq))
      ms.addData(newVecs.take(10): _*)
      q.processAllAvailable()
      ms.addData(newVecs.drop(10): _*)
      q.processAllAvailable()
      val grown = spark.read.parquet(idxPath)
      assert(grown.count() === e.count() + 20)
      // a probe against the grown index still finds the streamed vectors
      val probe = HashEmbedder.embed("streamed doc 7")
      val top = VectorStore(grown, "embedding", Seq("vec_id"))
        .searchByVector(probe, 1).select("vec_id").as[Long].head()
      assert(top === 100007L) // its own embedding is its nearest neighbor
      // and partition layout still prunes: files live under cluster_id=N/
      val dirs = new java.io.File(idxPath).listFiles().filter(_.isDirectory)
        .map(_.getName).filter(_.startsWith("cluster_id="))
      assert(dirs.nonEmpty)
    } finally q.stop()
  }

  test("streaming graph maintenance: micro-batches insert into the served IvfGraph, replay-guarded") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.{AnnIndex, IvfGraph, VectorStore}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the reference's "upload, then query immediately" workload on the
    // PINNED serving structure: arriving vectors route through the frozen
    // centroids into the live graph (IvfGraph.insertInto — one beam per
    // node, no rebuild). foreachBatch is at-least-once, so the sink
    // guards with committed batch ids (same upgrade the MVCC sink makes).
    val base = ClusteredCorpus.df(spark, 600, 6).repartition(2).cache()
    base.count()
    val (model, indexed) = AnnIndex.fit(base, "embedding", "vec_id", k = 6, iters = 2)
    @volatile var served = IvfGraph.build(indexed, model, "vec_id", "embedding")
    val committed = scala.collection.mutable.Set[Long]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      committed.synchronized {
        if (committed.add(id)) {
          served = IvfGraph.insertInto(served, batch, "vec_id", "embedding")._1
        }
      }
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = ms.toDS().toDF("vec_id", "embedding")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-graph-ckpt").toString)
      .foreachBatch(sink _)
      .start()
    try {
      val newVecs = (0 until 24).map(i =>
        (100000L + i, HashEmbedder.embed(s"graph streamed $i").toSeq))
      ms.addData(newVecs.take(12): _*)
      q.processAllAvailable()
      ms.addData(newVecs.drop(12): _*)
      q.processAllAvailable()
      assert(served.rows === 600 + 24)
      // full probe + full ef on the live structure = brute force over the
      // union — the q126 exactness contract held ACROSS micro-batches
      val union = base.select($"vec_id", $"embedding")
        .union(newVecs.toDF("vec_id", "embedding")
          .select($"vec_id", $"embedding".cast("array<float>")))
      val probe = ClusteredCorpus.query(2)
      val (got, _) = served.topK(probe, 10, nprobe = 6, ef = served.rows.toInt)
      val exact = VectorStore(union, "embedding", Seq("vec_id"))
        .searchByVector(probe, 10).select("vec_id").as[Long].collect().toSet
      assert(got.map(_._1).toSet === exact)
      // a streamed vector is immediately servable
      val probe7 = HashEmbedder.embed("graph streamed 7")
      val (hit, _) = served.topK(probe7, 1, nprobe = 6, ef = served.rows.toInt)
      assert(hit.head._1 === 100007L)
      // at-least-once replay: re-delivering an already-committed batch id
      // must not double-insert
      val before = served.rows
      sink(newVecs.take(12).toDF("vec_id", "embedding"), 0L)
      assert(served.rows === before)
    } finally q.stop()
  }

  test("streaming lexical maintenance: micro-batches insert into the served Bm25Index, replay-guarded") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.Bm25Index
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the reference's "upload, then query immediately" workload on the
    // LEXICAL leg: arriving docs append as posting segments into the live
    // index (Bm25Index.insert — COW df patch, exact stats advance, no
    // rebuild). foreachBatch is at-least-once, so the sink guards with
    // committed batch ids (the same upgrade the MVCC + graph sinks make).
    val base = Tables.documents(spark, TestSpark.sf).filter(col("doc_id") < 300)
      .select(col("doc_id"), col("text")).cache()
    base.count()
    @volatile var served = Bm25Index.build(base, "doc_id", "text", 4)
    val committed = scala.collection.mutable.Set[Long]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      committed.synchronized {
        if (committed.add(id)) served = served.insert(batch, "doc_id", "text")
      }
    val ms = MemoryStream[(Long, String)]
    val q = ms.toDS().toDF("doc_id", "text")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-bm25-ckpt").toString)
      .foreachBatch(sink _)
      .start()
    try {
      val newDocs = (0 until 20).map(i => (100000L + i, s"streamed query data doc $i"))
      ms.addData(newDocs.take(10): _*)
      q.processAllAvailable()
      ms.addData(newDocs.drop(10): _*)
      q.processAllAvailable()
      assert(served.docCount === 300 + 20)
      // streamed docs are immediately servable with EXACT union stats:
      // the live index equals a full rebuild over base ∪ streamed
      // (bit-equal scores — the q137 contract held across micro-batches)
      val union = base.union(newDocs.toDF("doc_id", "text"))
      val rebuilt = Bm25Index.build(union, "doc_id", "text", 4)
      try {
        val got = served.topK(Seq("query", "streamed"), 15).toSeq
        val want = rebuilt.topK(Seq("query", "streamed"), 15).toSeq
        assert(got == want)
        assert(got.exists(_._1 >= 100000L)) // a streamed doc actually ranks
      } finally rebuilt.unpersist()
      // at-least-once replay: re-delivering a committed batch id must not
      // double-insert (df/N would drift and break exactness)
      val before = served.docCount
      sink(newDocs.take(10).toDF("doc_id", "text"), 0L)
      assert(served.docCount === before)
    } finally q.stop()
  }

  test("streaming packed-tier maintenance: micro-batches insert into the served PackedScan, replay-guarded") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.operators.PackedScan
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // completes the streaming "upload, then query immediately" story
    // across all three pinned structures (IvfGraph, Bm25Index, here the
    // brute-force tier): arriving vectors pack into new pinned blocks
    // (PackedScan.insert — serve-the-union, no rebuild).
    val base = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding")).cache()
    val nBase = base.count()
    @volatile var served = PackedScan.build(base, "vec_id", "embedding")
    val committed = scala.collection.mutable.Set[Long]()
    def sink(batch: org.apache.spark.sql.DataFrame, id: Long): Unit =
      committed.synchronized {
        if (committed.add(id)) served = served.insert(batch, "vec_id", "embedding")
      }
    val ms = MemoryStream[(Long, Seq[Float])]
    val q = ms.toDS().toDF("vec_id", "embedding")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft-packed-ckpt").toString)
      .foreachBatch(sink _)
      .start()
    try {
      val newVecs = (0 until 16).map(i =>
        (200000L + i, HashEmbedder.embed(s"packed streamed $i").toSeq))
      ms.addData(newVecs.take(8): _*)
      q.processAllAvailable()
      ms.addData(newVecs.drop(8): _*)
      q.processAllAvailable()
      assert(served.rows === nBase + 16)
      // a streamed vector is immediately servable and exact: its own
      // embedding is its nearest neighbor
      val probe = HashEmbedder.embed("packed streamed 5")
      assert(served.topK(probe, 1).head._1 === 200005L)
      // replay guard: re-delivered batch id must not double-insert
      val before = served.rows
      sink(newVecs.take(8).toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>")), 0L)
      assert(served.rows === before)
    } finally q.stop()
  }

  test("watermarked append-mode query runs and emits closed windows") {
    val dir = stageDir()
    val stream = EventsStream.readStream(spark, dir)
    val q = EventsStream.tumblingWithWatermark(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("wm_out").start()
    try {
      q.processAllAvailable()
      // single static file: watermark only advances after the batch, so
      // closed windows flush on the *next* (empty) trigger
      q.processAllAvailable()
      val n = spark.table("wm_out").count()
      // all windows except those still open under the 30 min watermark
      val total = EventsStream.tumbling(Tables.events(spark, TestSpark.sf)).count()
      assert(n >= total - 5, s"append emitted $n of ~$total windows")
    } finally q.stop()
  }
}

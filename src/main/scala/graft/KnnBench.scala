package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions.cosine_distance
import org.apache.spark.sql.graft.PackedVectorFunctions._

/** Layout experiment harness for the exact k-NN scan (not driver-run).
  * Compares vectors-as-LIST<FLOAT> vs fp32-packed vs fp16-packed binary,
  * snappy vs uncompressed, cold parquet vs in-memory cache.
  */
object KnnBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = e.count(); val copies = (2000000L / n).toInt
    val q = graft.functions.HashEmbedder.embed("throughput probe")
    val qc = typedlit(q.toIndexedSeq)

    val base = e.withColumn("__c", explode(sequence(lit(0), lit(copies-1))))

    def stage(path: String, codec: String)(df: DataFrame): DataFrame = {
      if (!new java.io.File(path).exists())
        df.repartition(32).write.mode("overwrite")
          .option("compression", codec).parquet(path)
      spark.read.parquet(path)
    }

    def time(label: String, df: DataFrame, dist: DataFrame => DataFrame): Unit = {
      val total = df.count()
      def run(): Double = {
        val t0 = System.nanoTime()
        dist(df).orderBy(col("d"), col("vec_id"), col("__c")).limit(10).count()
        (System.nanoTime()-t0)/1e9
      }
      run(); run()
      val s = (1 to 3).map(_ => run()).min
      println(f"[knnbench] $label%-28s n=$total sec=$s%.3f vps=${total/s}%.3g")
    }

    val arr = stage(graft.operators.AnnIndex.tmpRoot + "/knn_arr.parquet", "snappy")(
      base.select(col("vec_id"), col("__c"), col("embedding")))
    time("array/snappy", arr, _.withColumn("d", cosine_distance(col("embedding"), qc)))

    val p32 = stage(graft.operators.AnnIndex.tmpRoot + "/knn_p32.parquet", "snappy")(
      base.select(col("vec_id"), col("__c"), vec_pack(col("embedding")).as("emb")))
    time("packed-fp32/snappy", p32, _.withColumn("d", cosine_distance_packed(col("emb"), qc)))

    val p32u = stage(graft.operators.AnnIndex.tmpRoot + "/knn_p32u.parquet", "uncompressed")(
      base.select(col("vec_id"), col("__c"), vec_pack(col("embedding")).as("emb")))
    time("packed-fp32/uncompressed", p32u, _.withColumn("d", cosine_distance_packed(col("emb"), qc)))

    val p16 = stage(graft.operators.AnnIndex.tmpRoot + "/knn_p16.parquet", "uncompressed")(
      base.select(col("vec_id"), col("__c"), vec_pack_f16(col("embedding")).as("emb")))
    time("packed-fp16/uncompressed", p16, _.withColumn("d", cosine_distance_f16(col("emb"), qc)))

    val cached = p32u.cache()
    cached.count()
    time("packed-fp32/cached", cached, _.withColumn("d", cosine_distance_packed(col("emb"), qc)))
    cached.unpersist()

    // SERVED single-query latency vs pinned-partition count (r6 verdict
    // optional item 7: is a low-partition layout a straggler hedge?).
    // Same corpus, same query, only the block count changes.
    for (parts <- Seq(32, 16, 8, 4)) {
      val src = p32u.coalesce(parts)
        .select((col("vec_id") * 1000000L + col("__c")).as("id"),
          vec_unpack(col("emb")).as("embedding"))
      val scan = graft.operators.PackedScan.build(src, "id", "embedding")
      def run(): Double = {
        val t0 = System.nanoTime()
        scan.topK(q, 10)
        (System.nanoTime() - t0) / 1e9
      }
      run(); run()
      val s = (1 to 5).map(_ => run()).min
      val qs64 = Array.tabulate(64)(i =>
        graft.functions.HashEmbedder.embed(s"throughput probe $i"))
      def runB(): Double = {
        val t0 = System.nanoTime()
        scan.topKBatch(qs64, 10)
        (System.nanoTime() - t0) / 1e9
      }
      runB()
      val sb = (1 to 3).map(_ => runB()).min
      println(f"[knnbench] served parts=$parts%-3d single_ms=${s * 1000}%.1f " +
        f"batch64_vps=${scan.rows.toDouble * 64 / sb}%.3g")
      scan.unpersist()
    }

    spark.stop()
  }
}

/** Ceiling probe: same data, raw mapPartitions over the packed bytes —
  * no Catalyst per-row machinery. Tells us how much of the scan cost is
  * row overhead vs the distance arithmetic itself.
  */
object KnnCeiling {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val big = spark.read.parquet(graft.operators.AnnIndex.tmpRoot + "/knn_p32u.parquet")
      .select("emb").cache()
    val total = big.count()
    val q = graft.functions.HashEmbedder.embed("throughput probe")
    def run(): Double = {
      val t0 = System.nanoTime()
      big.queryExecution.toRdd.mapPartitions { it =>
        val qv = q
        // query norm precomputed once, as the codegen expression does —
        // the ceiling must run the SAME arithmetic as the real scan
        var qn2 = 0.0
        var qi = 0
        while (qi < qv.length) { qn2 += qv(qi).toDouble * qv(qi).toDouble; qi += 1 }
        val qnorm = math.sqrt(qn2)
        var best = Double.MaxValue
        while (it.hasNext) {
          val row = it.next()
          val b = row.getBinary(0)
          val off = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
          var d0 = 0.0; var d1 = 0.0; var d2 = 0.0; var d3 = 0.0
          var n0 = 0.0; var n1 = 0.0; var n2 = 0.0; var n3 = 0.0
          val n = math.min(b.length >> 2, qv.length)
          val k = n & ~3
          var j = 0
          while (j < k) {
            val x0 = org.apache.spark.unsafe.Platform.getFloat(b, off + 4L*j).toDouble
            val x1 = org.apache.spark.unsafe.Platform.getFloat(b, off + 4L*j + 4).toDouble
            val x2 = org.apache.spark.unsafe.Platform.getFloat(b, off + 4L*j + 8).toDouble
            val x3 = org.apache.spark.unsafe.Platform.getFloat(b, off + 4L*j + 12).toDouble
            d0 += x0*qv(j); n0 += x0*x0; d1 += x1*qv(j+1); n1 += x1*x1
            d2 += x2*qv(j+2); n2 += x2*x2; d3 += x3*qv(j+3); n3 += x3*x3
            j += 4
          }
          while (j < n) { // tail elements the real loop also processes
            val x0 = org.apache.spark.unsafe.Platform.getFloat(b, off + 4L*j).toDouble
            d0 += x0*qv(j); n0 += x0*x0; j += 1
          }
          val d = 1.0 - ((d0+d1)+(d2+d3)) / (math.sqrt((n0+n1)+(n2+n3)) * qnorm)
          if (d < best) best = d
        }
        Iterator(best)
      }.collect()
      (System.nanoTime()-t0)/1e9
    }
    run(); run()
    val s = (1 to 3).map(_ => run()).min
    println(f"[knnceiling] n=$total sec=$s%.3f vps=${total/s}%.3g")
    spark.stop()
  }
}

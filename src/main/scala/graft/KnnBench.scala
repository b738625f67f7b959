package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorFunctions.cosine_distance
object KnnBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false")
      .config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    GraftSession.install(spark)
    val e = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val n = e.count(); val copies = (2000000L / n).toInt
    val path = "/root/repo/target/tmp/knn_bench.parquet"
    if (!new java.io.File(path).exists()) {
      e.withColumn("__c", explode(sequence(lit(0), lit(copies-1))))
        .select(col("vec_id"), col("__c"), col("embedding"))
        .repartition(32).write.mode("overwrite").parquet(path)
    }
    val big = spark.read.parquet(path)
    val total = big.count()
    val q = graft.functions.HashEmbedder.embed("throughput probe")
    def run(): Double = {
      val t0 = System.nanoTime()
      big.withColumn("d", cosine_distance(col("embedding"), typedlit(q.toIndexedSeq)))
        .orderBy(col("d"), col("vec_id"), col("__c")).limit(10).count()
      (System.nanoTime()-t0)/1e9
    }
    run(); run()
    val s = (1 to 3).map(_ => run()).min
    println(f"[knnbench] parquet n=$total sec=$s%.3f vps=${total/s}%.3g")
    val one = big.coalesce(1)
    def run1(): Double = {
      val t0 = System.nanoTime()
      one.withColumn("d", cosine_distance(col("embedding"), typedlit(q.toIndexedSeq)))
        .orderBy(col("d"), col("vec_id"), col("__c")).limit(10).count()
      (System.nanoTime()-t0)/1e9
    }
    run1()
    val s1 = (1 to 3).map(_ => run1()).min
    println(f"[knnbench] single-task n=$total sec=$s1%.3f vps_per_core=${total/s1}%.3g")
    spark.stop()
  }
}

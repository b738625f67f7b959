package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism floor for derivation-heavy scans (r17 optimization;
  * guide §2.5 "input skew: one huge unsplittable file … repartition
  * immediately after the read").
  *
  * A single parquet file with one row group scans as ONE task no matter
  * the core count, and several operators do their heaviest work in the
  * map phase directly over that scan — n-gram/shingle explosion,
  * MinHash/SimHash signatures, language-profile counting. R17JobProf
  * measured q213's profile build as one 2.6 s single-task job (31 of 32
  * cores idle) and q238's gram pass as 3 × 0.6 s single-task jobs.
  *
  * [[fan]] round-robin-repartitions a frame up to the session's default
  * parallelism ONLY when the planned scan has fewer partitions — the
  * shuffle it adds moves just the small frame (a few MB here), and the
  * gate makes it a NO-OP at scale: a 100 TB table scans as thousands of
  * partitions and must not be shuffled down to the core count (the
  * bench's lower-core driver run also stays honest — the floor follows
  * `defaultParallelism`, never a constant). Round-robin repartition
  * keeps Spark's sort-before-repartition default, so the fan-out is
  * deterministic under retries.
  */
object Par {

  def fan(df: DataFrame): DataFrame = {
    val want = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < want) df.repartition(want) else df
  }
}

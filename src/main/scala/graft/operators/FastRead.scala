package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** `spark.read.parquet(dir)` minus the plan-time schema-inference Spark
  * job (r17 optimization; guide §1.2 step 1 / §6 metadata I/O).
  *
  * Every `spark.read.parquet(dir)` pays, at PLAN time, (a) a recursive
  * listing of `dir` and (b) a 1-task Spark job that reads one footer to
  * infer the schema — R17JobProf measured (b) at ~25 ms of job plus a
  * 50–100 ms driver gap, once per read. The durable-index load paths
  * (BM25 stats/postings/meta, graph nodes/centroids, PQ/SQ8 codes) and
  * the MVCC/MatView epoch reads each issue several such reads PER QUERY
  * EXECUTION over engine-written directories whose schema one footer
  * fully determines. This helper does the same listing once DRIVER-SIDE
  * ([[FsOps.listFiles]]) and resolves the schema from one footer read
  * ([[org.apache.spark.sql.graft.PreListedScan.footerSchema]] — the
  * exact metadata path Spark's inference task uses, same first-file
  * choice, same nullable relaxation), then serves the listing through
  * `PreListedScan` — zero Spark jobs at plan time, same partition
  * inference against the same base path.
  *
  * Visibility matches `spark.read.parquet(dir)` exactly: a nested file
  * is data only when every directory component under `dir` is a
  * `key=value` partition dir. Spark's PartitioningAwareFileIndex, when
  * it infers no partition columns, serves only the files DIRECTLY
  * under the root — which is what keeps a crashed build's rogue epoch
  * dir (`e<seq>-<uuid>/part-*.parquet`, no pointer) invisible inside a
  * legacy store root. A recursive listing without this rule would
  * adopt the rogue files (and pick the rogue's footer for the schema —
  * EpochStoreSpec's crash-window A caught exactly that).
  *
  * Fallback: when the tree holds no data parquet file the call defers
  * to `spark.read.parquet(path)` verbatim, so missing-path /
  * empty-table error behavior is unchanged.
  */
object FastRead {

  def dir(spark: SparkSession, fs: FsOps, path: String): DataFrame = {
    val files = fs.listFiles(path)
      .filter { case (p, _, _) =>
        fs.isDataFile(path, p) && {
          val rel = fs.relativeTo(path, p).get
          rel.split('/').init.forall(_.contains("="))
        }
      }
    if (files.isEmpty) spark.read.parquet(path)
    else org.apache.spark.sql.graft.PreListedScan.parquet(
      spark, fs.qualify(path), files)
  }
}

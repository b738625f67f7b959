package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** SERVABLE INVERTED INDEX — the lexical leg's analog of [[PackedScan]].
  *
  * q118's full-scan BM25 is the right plan for a one-off query, but the
  * reference's hybrid workload (vector + lexical legs fused per request,
  * the standard RAG recipe the repo gates as q117) re-scores the same
  * corpus per query. This builds the classic posting-list structure ONCE
  * and serves top-k from postings: per-query work is O(Σ df(term)) over
  * the docs containing a query term, never a corpus scan.
  *
  * Sharding is BY DOCUMENT (the Elasticsearch/Lucene distributed layout),
  * not by term: every (term, doc) posting for a document lives in that
  * document's shard, so each shard computes COMPLETE scores for its own
  * docs and ships only its local top-k — the driver merge is P×k rows
  * regardless of term frequency. (A term-sharded layout was measured
  * first: common query terms made the driver merge carry Σ df postings —
  * 3.3 s/query on a 200k-doc corpus. Doc-sharding bounds the transfer.)
  * The price is denormalizing the GLOBAL df of each term into every
  * shard that holds it (8 B per distinct (shard, term)), computed once
  * at build.
  *
  * Layout per shard: one [[Bm25Index.PostingBlock]] — sorted unique
  * terms with their global df and offset ranges into parallel
  * (docId, tf, dl) arrays. Doc length is denormalized into each posting
  * so scoring needs only the broadcast (N, avgdl) scalars. BM25 per
  * Robertson & Zaragoza 2009, k1 = 1.2, b = 0.75 — identical constants
  * and operand order as q118.
  *
  * Tokenizer (the real one the r6 verdict asked for, replacing q118's
  * substring counts): lowercase, split on non-alphanumerics, drop
  * empties — expressed identically in the Spark build
  * (`filter(split(lower(text), "[^a-z0-9]+"), length > 0)`) and the
  * DuckDB oracle (`list_filter(string_split_regex(lower(text),
  * '[^a-z0-9]+'), x -> x <> '')`), so tf/dl/df agree exactly.
  *
  * Exactness: per-doc contributions accumulate in QUERY-TERM ORDER
  * (absent terms contribute exactly 0.0, and x + 0.0 == x for the
  * non-negative BM25 terms, so skipping them is IEEE-identical to the
  * oracle's `t0 + t1 + t2`), and ranking — shard-local AND at the merge
  * — uses the 6-dp HALF_UP-rounded score with doc_id ties, matching the
  * oracle's `ORDER BY bm25 DESC, doc_id` on the rounded alias, so a
  * last-ulp `ln` divergence can never flip the cutoff. Gated hash-exact
  * against the tokenized full scan (q124).
  */
final class Bm25Index private (
    blocks: RDD[Bm25Index.PostingBlock],
    val docCount: Long, val avgDl: Double, val bytes: Long) {

  /** Top-k (docId, dl, bm25 score) for the OR-semantics query `terms`:
    * every doc containing at least one term is scored. Terms are
    * lowercased and deduplicated preserving first occurrence (duplicate
    * query terms don't double-score — q118 semantics). `topK` IS
    * `topKBatch` of one, so q124's oracle gate covers both.
    */
  def topK(terms: Seq[String], k: Int,
      filter: Option[SelfQueryFilter.Node] = None): Array[(Long, Long, Double)] =
    topKBatch(Seq(terms), k, filter).head

  /** BATCHED lexical serving: Q term-queries answered in ONE Spark job
    * (the same economics as [[PackedScan.topKBatch]] — one job amortizes
    * scheduling across the batch, and a shard's posting walk for a term
    * shared by several queries stays hot in cache). Each shard scores
    * its own documents completely per query and returns Q local top-k
    * lists; the driver merge is Q × P × k rows.
    */
  def topKBatch(queries: Seq[Seq[String]], k: Int,
      filter: Option[SelfQueryFilter.Node] = None)
      : Array[Array[(Long, Long, Double)]] = {
    if (queries.isEmpty) return Array.empty
    if (k <= 0) return Array.fill(queries.length)(Array.empty)
    val nq = queries.length
    val qTerms: Array[Array[String]] =
      queries.map(_.map(_.toLowerCase).distinct.toArray).toArray
    if (docCount == 0) return Array.fill(nq)(Array.empty)
    val n = docCount
    val avg = avgDl
    val perShard: Array[Array[Array[(Long, Long, Double)]]] =
      blocks.mapPartitions { it =>
        val accs = Array.fill(nq)(collection.mutable.LongMap.empty[(Double, Long)])
        // the predicate gates which docs RETURN; corpus statistics (df,
        // N, avgdl) stay corpus-level, like an engine whose index stats
        // are global — the oracle mirrors this with WHERE on the scored
        // rows only. Bound once per shard; gate per candidate doc (one
        // binary search), not per posting.
        var pred: Int => Boolean = null
        var predDocs: Array[Long] = null
        it.foreach { b =>
          filter.foreach { f =>
            pred = MetaPredicate.bind(f, b.meta)
            predDocs = b.metaDocs
          }
          var qi = 0
          while (qi < nq) {
            val terms = qTerms(qi)
            val acc = accs(qi)
            var ti = 0
            while (ti < terms.length) {
              val t = java.util.Arrays.binarySearch(
                b.terms.asInstanceOf[Array[AnyRef]], terms(ti))
              if (t >= 0) {
                val df = b.dfs(t) // GLOBAL df, denormalized at build
                // identical operand order as the q118 / q124 oracle expression
                val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
                var j = b.starts(t)
                val until = b.starts(t + 1)
                while (j < until) {
                  val doc = b.docIds(j)
                  val tf = b.tfs(j)
                  val dl = b.dls(j)
                  val c = idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avg))
                  // ti ascends, so each doc's additions happen in term order
                  acc(doc) = acc.get(doc) match {
                    case Some((s, _)) => (s + c, dl)
                    case None         => (c, dl)
                  }
                  j += 1
                }
              }
              ti += 1
            }
            qi += 1
          }
        }
        if (accs.forall(_.isEmpty)) Iterator.empty
        else Iterator.single(Array.tabulate(nq) { qi =>
          val scored = accs(qi).iterator.filter { case (doc, _) =>
            (pred eq null) || {
              val idx = java.util.Arrays.binarySearch(predDocs, doc)
              idx >= 0 && pred(idx)
            }
          }.map { case (doc, (s, dl)) =>
            (doc, dl, s, Bm25Index.round6(s))
          }.toArray
          scored.sortBy { case (doc, _, _, r) => (-r, doc) }.take(k)
            .map { case (doc, dl, s, _) => (doc, dl, s) }
        })
      }.collect()
    Array.tabulate(nq) { qi =>
      perShard.iterator.flatMap(_(qi)).toArray
        .map { case (doc, dl, s) => (doc, dl, s, Bm25Index.round6(s)) }
        .sortBy { case (doc, _, _, r) => (-r, doc) }.take(k)
        .map { case (doc, dl, s, _) => (doc, dl, s) }
    }
  }

  /** Top-k as a DataFrame (doc_id, dl, bm25 rounded to 6 dp). */
  def topKDF(spark: SparkSession, terms: Seq[String], k: Int,
      filter: Option[SelfQueryFilter.Node] = None): DataFrame = {
    import spark.implicits._
    topK(terms, k, filter).toSeq.toDF("doc_id", "dl", "bm25")
      .select(col("doc_id"), col("dl"), round(col("bm25"), 6).as("bm25"))
  }

  def unpersist(): Unit = blocks.unpersist()
}

object Bm25Index {

  /** One document shard's inverted index: terms sorted with their GLOBAL
    * df; term i's postings are docIds/tfs/dls[starts(i) until
    * starts(i+1)], docId-ascending.
    */
  final case class PostingBlock(terms: Array[String], dfs: Array[Long],
      starts: Array[Int], docIds: Array[Long], tfs: Array[Int],
      dls: Array[Long],
      metaDocs: Array[Long] = Array.emptyLongArray,
      meta: Map[String, MetaPredicate.Col] = Map.empty)

  /** 6-dp HALF_UP — BigDecimal, exactly Spark's `round(col, 6)`. */
  private[graft] def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Spark-side tokenizer — the single source of truth the build uses;
    * the oracle mirrors it in DuckDB (see class doc).
    */
  def tokens(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), t => length(t) > lit(0))

  /** Memoized through [[ServingCache]] (same lifecycle as PackedScan). */
  def buildCached(docs: DataFrame, cacheKey: String, idCol: String,
      textCol: String, shards: Int = 0,
      metaCols: Seq[String] = Nil): Bm25Index = {
    val mk = if (metaCols.isEmpty) "" else metaCols.mkString("#", ",", "")
    ServingCache.getOrBuild(s"bm25#$cacheKey#$idCol#$textCol#$shards$mk") {
      val ix = build(docs, idCol, textCol, shards, metaCols)
      (ix, ix.bytes, () => ix.unpersist())
    }
  }

  /** Tokenize, count (term, doc) tf, attach each term's global df, shard
    * BY DOCUMENT hash, pack each shard as one PostingBlock, pin
    * MEMORY_ONLY. `shards` <= 0 means the session default parallelism.
    * `metaCols` are pinned per DOC in each shard (sorted-doc parallel
    * [[MetaPredicate.Col]] arrays) for filtered serving — the per-user
    * KB shape (`private_knowledge_base.py:161`) on the lexical leg.
    */
  def build(docs: DataFrame, idCol: String, textCol: String,
      shards: Int = 0, metaCols: Seq[String] = Nil): Bm25Index = {
    val spark = docs.sparkSession
    import spark.implicits._
    val p = if (shards > 0) shards else spark.sparkContext.defaultParallelism
    val names = metaCols.toArray
    val toks = docs.select(
      (col(idCol).cast("long").as("doc_id") +:
        tokens(col(textCol)).as("toks") +: names.map(col).toSeq): _*)
      .select(
        (col("doc_id") +: col("toks") +:
          size(col("toks")).cast("long").as("dl") +: names.map(col).toSeq): _*)
    // global stats over ALL docs (dl = 0 docs count toward N and avgdl,
    // exactly like the oracle's stats CTE)
    val (nDocs, sumDl) = toks.agg(count(lit(1)), sum(col("dl")))
      .as[(Long, Option[Long])].head() match {
      case (c, s) => (c, s.getOrElse(0L))
    }
    // meta rides the postings groupBy (functionally dependent on doc_id)
    val postings = toks
      .select(
        (explode(col("toks")).as("term") +: col("doc_id") +: col("dl") +:
          names.map(col).toSeq): _*)
      .groupBy(col("term") +: col("doc_id") +: col("dl") +:
        names.map(col).toSeq: _*)
      .agg(count(lit(1)).cast("int").as("tf"))
    // global df per term, then denormalized onto every posting — the
    // partial_count is map-side combined and the join key (term) is the
    // same as the groupBy key, so no extra wide shuffle of the postings
    val dfs = postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("long").as("df"))
    val projected = postings.join(dfs, "term")
      .select(
        (col("doc_id") +: col("term") +: col("tf") +: col("dl") +: col("df") +:
          names.map(col).toSeq): _*)
    val kinds = projected.schema.fields.drop(5).map(_.dataType)
      .zip(names).map { case (t, n) => MetaPredicate.kindOf(t, n) }
    val keyed = projected.rdd.map { row =>
      val m = new Array[Any](names.length)
      var j = 0
      while (j < names.length) {
        require(!row.isNullAt(5 + j),
          s"null in pinned metadata column '${names(j)}' (doc=${row.getLong(0)})")
        m(j) = MetaPredicate.widen(row, 5 + j, kinds(j))
        j += 1
      }
      (row.getLong(0),
        (row.getString(1), row.getInt(2), row.getLong(3), row.getLong(4), m))
    }.partitionBy(new HashPartitioner(p))
    val blocks = keyed.mapPartitions({ it =>
      val rows = it.toArray
      val byTerm = rows.groupBy(_._2._1)
      if (byTerm.isEmpty) Iterator.empty
      else {
        val terms = byTerm.keys.toArray.sorted
        val dfArr = new Array[Long](terms.length)
        val starts = new Array[Int](terms.length + 1)
        val nPost = byTerm.valuesIterator.map(_.length).sum
        val docIds = new Array[Long](nPost)
        val tfs = new Array[Int](nPost)
        val dls = new Array[Long](nPost)
        var off = 0
        var i = 0
        while (i < terms.length) {
          starts(i) = off
          val ps = byTerm(terms(i)).sortBy(_._1)
          dfArr(i) = ps.head._2._4
          ps.foreach { case (doc, (_, tf, dl, _, _)) =>
            docIds(off) = doc; tfs(off) = tf; dls(off) = dl; off += 1
          }
          i += 1
        }
        starts(terms.length) = off
        val (metaDocs, meta) =
          if (names.isEmpty)
            (Array.emptyLongArray, Map.empty[String, MetaPredicate.Col])
          else {
            val perDoc = rows.map { case (doc, (_, _, _, _, m)) => (doc, m) }
              .groupBy(_._1).map { case (doc, vs) => (doc, vs.head._2) }
              .toArray.sortBy(_._1)
            val cols = names.indices.map { j =>
              names(j) -> MetaPredicate.packCol(kinds(j), perDoc.map(_._2(j)))
            }.toMap
            (perDoc.map(_._1), cols)
          }
        Iterator.single(
          PostingBlock(terms, dfArr, starts, docIds, tfs, dls, metaDocs, meta))
      }
    }, preservesPartitioning = true)
    blocks.persist(StorageLevel.MEMORY_ONLY)
    val bytes = blocks.map { b =>
      b.terms.iterator.map(t => 40L + 2L * t.length).sum +
        8L * b.dfs.length + 4L * b.starts.length + 20L * b.docIds.length
    }.fold(0L)(_ + _)
    new Bm25Index(blocks, nDocs,
      if (nDocs == 0) 0.0 else sumDl.toDouble / nDocs, bytes)
  }
}

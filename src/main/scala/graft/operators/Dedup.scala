package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution: turn a near-duplicate PAIR set (the output
  * of any banded candidate generator — MinHash bands q45, SimHash bands q46,
  * blocked Jaccard q44) into connected components, so each document maps to
  * one canonical representative and a training pipeline can keep exactly one
  * doc per cluster.
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round every node takes the min of its own label and
  * its neighbors' labels; converged when no label changes. Labels decrease
  * monotonically toward the component minimum, so convergence needs at most
  * `diameter` rounds and the result is independent of partitioning and join
  * order — byte-deterministic.
  *
  * Scale posture (100 TB): each round is one shuffle on node id (a groupBy
  * min) plus one equi-join — the same primitive the large-star/small-star
  * formulation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", SoCC'14) optimizes to O(log n) rounds; near-dup graphs have
  * tiny diameters (duplicate chains), so plain propagation already
  * terminates in 2-4 rounds. Lineage is truncated every round with
  * localCheckpoint so the plan does not grow with iterations, and the
  * changed-label count that drives termination is the side effect of the
  * same action that materializes the round (no extra pass).
  */
object Dedup {

  /** Resolve components over an undirected pair set.
    *
    * @param pairs DataFrame with two long columns `i`, `j` (one row per
    *              undirected edge; orientation irrelevant)
    * @param nodes DataFrame with a long `id` column — the node universe
    *              (isolated docs keep themselves as canonical)
    * @return DataFrame(id, canonical) — canonical = min doc id reachable
    */
  def connectedComponents(pairs: DataFrame, nodes: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    // r17: the loop runs on co-partitioned RDDs, not DataFrames. Each
    // DataFrame round paid Catalyst analysis + AQE stage planning + a
    // broadcast-build job PER ROUND (~0.4 s/round of pure fixed cost at
    // sf0.1, most of q109's wall); an RDD round is one narrow join over
    // a pinned partitioning plus ONE shuffle of just the label updates,
    // with no planning at all. Semantics are the r16 shape verbatim —
    // min over {own label} ∪ {neighbors' labels}, convergence = no
    // label decreased, edge endpoints missing from `nodes` count as
    // changed (prev = MaxValue) until they hold a real previous label —
    // all pinned by DedupSpec.
    val spark = pairs.sparkSession
    import spark.implicits._
    val dbg = sys.env.contains("GRAFT_CC_DEBUG")
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val tE = System.nanoTime()
    val raw = pairs
      .select(col("i").cast("long"), col("j").cast("long")).as[(Long, Long)]
      .rdd.flatMap { case (i, j) => Iterator((i, j), (j, i)) }
      .persist(sl)
    // SIZE the round partitioning from the measured edge count, never a
    // constant (guide §2): an iterative loop pays task+stage fixed costs
    // every round, so tiny graphs must run in few partitions (measured:
    // 32-partition rounds cost ~0.42 s each on a 45k-edge graph, ~90% of
    // it scheduling) while a 100 TB near-dup graph still fans out —
    // ~4M directed edges (~64 MB) per partition, capped well above the
    // session's parallelism so huge graphs are not throttled to the
    // core count.
    val nEdges = raw.count()
    val p = math.max(1L, math.min(nEdges / 4000000L + 1,
      16L * spark.sparkContext.defaultParallelism)).toInt
    val part = new org.apache.spark.HashPartitioner(p)
    val edges = raw.partitionBy(part).persist(sl)
    var labels = nodes.select(col("id").cast("long")).as[Long]
      .rdd.map(id => (id, id)).reduceByKey(part, math.min(_: Long, _: Long))
    var cached: org.apache.spark.rdd.RDD[_] = labels.persist(sl)
    if (dbg) System.err.println(f"[cc] edges+labels staged ${(System.nanoTime()-tE)/1e9}%.3fs p=$p")

    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val tr = System.nanoTime()
      // labels is `part`-partitioned on id and edges on src, so the
      // join is narrow; only the propagated (dst, label) updates cross
      // the wire in the reduceByKey, and the fullOuterJoin back onto
      // labels is narrow again (both sides `part`-partitioned).
      val cand = edges.join(labels)
        .map { case (_, (dst, slbl)) => (dst, slbl) }
        .reduceByKey(part, math.min(_: Long, _: Long))
      val next = labels.fullOuterJoin(cand, part)
        .mapValues { case (own, nb) =>
          val prev = own.getOrElse(Long.MaxValue) // no self row yet
          (nb.fold(prev)(x => math.min(prev, x)), prev)
        }.persist(sl)
      // truncate lineage at the round boundary (the count below
      // materializes it): task binaries otherwise re-serialize the
      // whole round chain every iteration
      next.localCheckpoint()
      // ONE job per round: the count materializes the round AND is the
      // convergence test (a label strictly below its previous value
      // means another round may still propagate).
      converged = next.filter { case (_, (nl, ol)) => nl < ol }.count() == 0
      cached.unpersist(false)
      cached = next
      labels = next.mapValues(_._1)
      round += 1
      if (dbg) System.err.println(f"[cc] round $round ${(System.nanoTime()-tr)/1e9}%.3fs converged=$converged")
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    val out = labels.toDF("id", "canonical")
    raw.unpersist(false)
    edges.unpersist(false)
    out
  }

  /** Exact-substring duplication (Lee et al. 2022, "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499 §4,
    * ExactSubstr): mark every token position whose L-token window occurs
    * MORE THAN ONCE in the corpus (the paper's semantics — a second
    * occurrence anywhere counts, same-document repeats included), and
    * score each document by how many of its tokens sit under a duplicated
    * window. The paper builds one corpus-wide suffix array on a single
    * machine; the Spark-native shape is:
    *
    *   1. map-side window enumeration (tokenize, then build the L-grams
    *      INSIDE each doc's row and explode the strings — the dialect's
    *      exact tokenizer: lowercase, split on non-alphanumerics, drop
    *      empties);
    *   2. candidate detection on `xxhash64(window)` — the heavy shuffle
    *      carries 8-byte keys with map-side partial counts, and the
    *      `count > 1` filter is the whole suffix-array question;
    *   3. hash-candidate windows re-checked by CONTENT (so a collision
    *      can never flag a span — the hash only routes, exactness is
    *      content-judged: q238), then back to their (doc, pos) seeds;
    *   4. per-doc coverage = distinct token indices under any seed
    *      window (explode of L consecutive indices → distinct), a
    *      per-document-bounded aggregation.
    *
    * @return DataFrame(doc_id, dup_tokens, n_tokens) — docs with
    *         duplicated coverage only
    */
  def exactSubstrDuplication(docs: DataFrame, idCol: String,
      textCol: String, l: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        t => length(t) > 0).as("ts"))
      .withColumn("n_tokens", size(col("ts")))
    exactSubstrDuplicationPositions(toks, l)
      .groupBy("doc_id").agg(count(lit(1)).as("dup_tokens"))
      .join(toks.select(col("doc_id"), col("n_tokens")), Seq("doc_id"))
  }

  /** The REMOVAL half of ExactSubstr (arXiv:2107.06499 §4 drops every
    * duplicated span from the training text): re-emit each document with
    * the covered tokens cut out. Same coverage machinery as
    * [[exactSubstrDuplication]]; the cut is a per-doc position filter
    * (covered positions broadcast-joined back as one sorted array per
    * doc — bounded by the doc's own length, like any doc-level
    * operator). Documents with no duplicated window pass through with
    * their tokenized text intact (the tokenizer is the dialect's exact
    * lexical convention, so "clean" text is the token stream — the
    * training-pipeline form, not the original raw bytes).
    *
    * @return DataFrame(doc_id, clean_text, n_tokens, dup_tokens)
    */
  def exactSubstrClean(docs: DataFrame, idCol: String,
      textCol: String, l: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      filter(split(lower(col(textCol)), "[^a-z0-9]+"),
        t => length(t) > 0).as("ts"))
      .withColumn("n_tokens", size(col("ts")))
    val dup = exactSubstrDuplicationPositions(toks, l)
      .groupBy("doc_id").agg(sort_array(collect_list(col("t"))).as("cov"))
    toks.join(dup, Seq("doc_id"), "left")
      .select(col("doc_id"),
        array_join(filter(col("ts"), (t, i) =>
          col("cov").isNull || !array_contains(col("cov"), i + 1)), " ")
          .as("clean_text"),
        col("n_tokens"),
        coalesce(size(col("cov")), lit(0)).cast("long").as("dup_tokens"))
  }

  /** Shared coverage core: (doc_id, t) = distinct token positions under
    * any corpus-duplicated L-window (1-based).
    *
    * Shape, tuned on ExactSubstrSoak (the first cut exploded window
    * START positions and sliced the doc's token ARRAY per window — every
    * window row rematerialized the whole array, 0.2 M tokens/s):
    *
    *   1. build the L-grams MAP-SIDE inside each doc's row
    *      (`transform` over the start positions + `slice` of the token
    *      array, then explode the finished gram strings) — no shuffle,
    *      no per-window rematerialization of the doc array;
    *   2. candidate detection on `xxhash64(window)` — the heavy shuffle
    *      carries 8-BYTE keys with map-side partial counts, not ~90-byte
    *      gram strings;
    *   3. hash-candidate windows (rare by construction: duplication is
    *      what the operator hunts) re-checked by CONTENT, so a hash
    *      collision can never flag a span — exactness is content-judged,
    *      the hash only routes.
    */
  private def exactSubstrDuplicationPositions(toks0: DataFrame, l: Int): DataFrame = {
    require(l >= 2, s"window length must be >= 2 tokens, got $l")
    // parallelism floor: the gram build is the heavy map phase and runs
    // over however many partitions the doc scan produced — ONE for a
    // single-file table (R17JobProf: 3 × 0.6 s single-task jobs in
    // q238); no-op at scale (see Par.fan)
    val toks = Par.fan(toks0)
    val grams = toks
      .select(col("doc_id"),
        posexplode(when(col("n_tokens") >= l,
          transform(sequence(lit(1), col("n_tokens") - (l - 1)), i =>
            concat_ws(" ", slice(col("ts"), i, lit(l)))))
          .otherwise(array().cast("array<string>")))
          .as(Seq("pos0", "g")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("g"))
    val candHashes = grams.groupBy(xxhash64(col("g")).as("h"))
      .agg(count(lit(1)).as("occ")).filter(col("occ") > 1).select("h")
    // the candidate set is small whenever the corpus is mostly unique
    // (AQE picks the broadcast at runtime from its actual size).
    // MATERIALIZE it (r17): `cand` feeds two consumers (the true-dup
    // group and the final semi-join), and the gram explosion above is
    // the data-proportional map phase — without the checkpoint each
    // consumer re-runs it, three corpus passes instead of two. The
    // checkpoint holds CANDIDATE rows only (bounded by the duplicated
    // span count, never the corpus; MEMORY_AND_DISK so an adversarial
    // corpus spills instead of OOMing).
    val cand = grams.join(candHashes,
      xxhash64(grams("g")) === candHashes("h"), "left_semi")
      .localCheckpoint(true)
    val dup = cand.groupBy(col("g"))
      .agg(count(lit(1)).as("occ")).filter(col("occ") > 1).select("g")
    cand.join(dup, Seq("g"), "left_semi")
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (l - 1))).as("t"))
      .distinct()
  }
}

package graft.queries

import org.apache.spark.sql.{Column, SparkSession, DataFrame}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Round-3 training-data-pipeline extensions: the cluster-resolution,
  * decontamination, sampling, sharding, and repetition-filter operators a
  * 100 TB pretraining corpus pipeline runs AFTER the per-doc scoring (q41-
  * q43) and near-dup candidate generation (q44-q46) this repo already gates.
  *
  * Scale notes per query:
  *   - q109: candidate pairs come from a blocking key (never all-pairs);
  *     cluster resolution is iterative min-label propagation
  *     ([[graft.operators.Dedup.connectedComponents]]) — one shuffle per
  *     round, rounds = component diameter (2-4 for duplicate chains).
  *   - q110: the benchmark side of the decontamination join is tiny and
  *     explicitly broadcast; the corpus side streams its n-gram windows
  *     map-side (no shuffle of the corpus).
  *   - q111: sampling decisions are a pure per-row hash — map-only, no
  *     shuffle, reproducible across engines and runs (the Carter-Wegman
  *     style LCG keeps arithmetic inside BIGINT in both engines).
  *   - q112: shard assignment is one window cumsum over the stable doc
  *     order — a single range-partitioned sort at scale.
  *   - q113: repetition stats are per-doc map-side aggregates (the word
  *     explode shuffles by (doc_id, word) — partial-aggregated map-side).
  */
object Round3Pipeline {

  private def tok(c: Column): Column = split(trim(c), "\\s+")

  /** orig ∪ drop-last-3 (+10000) ∪ drop-last-6 (+20000): deterministic
    * duplicate CHAINS — for short docs orig↔m2 falls below the Jaccard
    * threshold while orig↔m1 and m1↔m2 stay above it, so cluster resolution
    * genuinely needs transitive propagation, not just pair grouping.
    */
  private def chainedCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    def drop(k: Int, shift: Int): DataFrame = base.select(
      (col("doc_id") + shift).as("doc_id"),
      array_join(slice(tok(col("text")), lit(1), size(tok(col("text"))) - k), " ")
        .as("text"))
    base.unionByName(drop(3, 10000)).unionByName(drop(6, 20000))
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- dedup cluster resolution (connected components) ---------------
    // Blocked candidates (first-3-token key) -> exact token-set Jaccard
    // >= 0.5 in INTEGER arithmetic (3*|inter| >= |a|+|b|, no floats) ->
    // min-label propagation -> (doc, canonical, keep) manifest. The DuckDB
    // twin recomputes the same graph and closes it with a recursive CTE.
    QueryDef("q109_dedup_clusters", (s, dir) => {
      // materialize the keyed token sets ONCE: both sides of the blocked
      // self-join read the checkpointed 15k-row table instead of each
      // re-running the parquet-read + 3-way-union + tokenize pipeline
      // (profiled: the duplicated upstream was ~1.1 s of q109's wall
      // time; the 21k candidate verifications are microseconds)
      // (Par.fan measured HERE and reverted: the eager localCheckpoint +
      // per-round CC jobs over 32 partitions cost more than the 3-task
      // derivation saved — 2.2 s -> 4.4 s. Iterative small-data stages
      // want FEW partitions; guide §1.1's "fresh ideal is often slower,
      // switch back to the empirical loop".)
      val keyed = chainedCorpus(s, dir)
        .withColumn("t", tok(col("text")))
        .select(col("doc_id"),
          concat_ws(" ", slice(col("t"), lit(1), lit(3))).as("k"),
          array_distinct(col("t")).as("st"))
        .withColumn("n", size(col("st")))
        .localCheckpoint(true)
      val a = keyed.select(col("doc_id").as("i"), col("k"),
        col("st").as("sa"), col("n").as("na"))
      val b = keyed.select(col("doc_id").as("j"), col("k").as("kb"),
        col("st").as("sb"), col("n").as("nb"))
      val edges = a.join(b, col("k") === col("kb") && col("i") < col("j"))
        .filter(lit(3) * size(array_intersect(col("sa"), col("sb"))) >= col("na") + col("nb"))
        .select(col("i"), col("j"))
      Dedup.connectedComponents(edges, keyed.select(col("doc_id").as("id")))
        .select(col("id").as("doc_id"), col("canonical"),
          (col("id") === col("canonical")).cast("long").as("keep"))
        .orderBy("doc_id")
    }, Some("""
      WITH RECURSIVE
      corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000, array_to_string(t[1:len(t)-3], ' ')
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') t FROM documents)
        UNION ALL
        SELECT doc_id + 20000, array_to_string(t[1:len(t)-6], ' ')
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') t FROM documents)),
      keyed AS (
        SELECT doc_id,
               array_to_string(t[1:3], ' ') AS k,
               list_distinct(t) AS st,
               len(list_distinct(t)) AS n
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') t FROM corpus)),
      e0 AS (
        SELECT a.doc_id AS i, b.doc_id AS j
        FROM keyed a JOIN keyed b ON a.k = b.k AND a.doc_id < b.doc_id
        WHERE 3 * len(list_intersect(a.st, b.st)) >= a.n + b.n),
      edges AS (SELECT i AS src, j AS dst FROM e0 UNION ALL SELECT j, i FROM e0),
      cc(node, lbl) AS (
        SELECT doc_id, doc_id FROM keyed
        UNION
        SELECT e.dst, cc.lbl FROM cc JOIN edges e ON e.src = cc.node)
      SELECT node AS doc_id, min(lbl) AS canonical,
             CAST(node = min(lbl) AS BIGINT) AS keep
      FROM cc GROUP BY node ORDER BY doc_id""")),

    // ---- benchmark decontamination (n-gram overlap) --------------------
    // Eval "benchmark" = an 8-token window (tokens 4..11) of every 37th
    // doc; a corpus doc is contaminated if ANY of its contiguous 8-token
    // windows equals a benchmark prompt (the GPT-3/PaLM-style n-gram
    // overlap rule). Benchmark side broadcast; corpus windows generated
    // map-side.
    QueryDef("q110_decontaminate", (s, dir) => {
      val d = Tables.documents(s, dir).select(col("doc_id"), tok(col("text")).as("t"))
      val bench = d.filter(col("doc_id") % 37 === 0)
        .select(col("doc_id").as("bench_id"),
          concat_ws(" ", slice(col("t"), lit(4), lit(8))).as("prompt"))
      // docs shorter than the window have no 8-grams: without the guard,
      // sequence(0, size-8) with stop < start generates a DESCENDING run
      // into negative indices and slice() throws — the DuckDB twin's
      // range(0, len-7) is simply empty, so filter first (map-only).
      // Par.fan: the corpus-window explosion is the heavy map phase over
      // a 1-partition scan (r17; guide §2.5)
      val grams = graft.operators.Par.fan(d.filter(size(col("t")) >= 8))
        .select(col("doc_id"),
          explode(transform(sequence(lit(0), size(col("t")) - 8),
            i => concat_ws(" ", slice(col("t"), i + lit(1), lit(8))))).as("gram"))
      broadcast(bench).join(grams, col("prompt") === col("gram"))
        .groupBy("bench_id", "doc_id")
        .agg(count(lit(1)).as("n_hits"))
        .orderBy("bench_id", "doc_id")
    }, Some("""
      WITH d AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents),
      b AS (SELECT doc_id AS bench_id, array_to_string(t[4:11], ' ') AS prompt
            FROM d WHERE doc_id % 37 = 0),
      g AS (SELECT doc_id, array_to_string(t[i+1:i+8], ' ') AS gram
            FROM d, unnest(range(0, len(t) - 7)) u(i))
      SELECT b.bench_id, g.doc_id, count(*) AS n_hits
      FROM b JOIN g ON g.gram = b.prompt
      GROUP BY b.bench_id, g.doc_id
      ORDER BY b.bench_id, g.doc_id""")),

    // ---- deterministic stratified sampling (data mixing) ---------------
    // Per-source keep rates (the training-mix weights) applied via an
    // explicit LCG hash so the SAME rows are kept by any engine, any run,
    // any partitioning — the property `TABLESAMPLE`/`rand()` cannot give.
    // All arithmetic stays < 2^62: doc_id < 2^31 and the multiplier <
    // 2^31, so no overflow in either engine.
    QueryDef("q111_stratified_sample", (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("u",
          ((col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483648L)) % 1000)
        .withColumn("permille", expr(
          """CASE CAST(substring(source, 4) AS INT) % 4
               WHEN 0 THEN 150 WHEN 1 THEN 350 WHEN 2 THEN 600 ELSE 900 END"""))
        .filter(col("u") < col("permille"))
        .select(col("doc_id"), col("source"), col("u"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, source, u
      FROM (
        SELECT doc_id, source,
          ((doc_id * 1103515245 + 12345) % 2147483648) % 1000 AS u,
          CASE CAST(substr(source, 4) AS INT) % 4
            WHEN 0 THEN 150 WHEN 1 THEN 350 WHEN 2 THEN 600 ELSE 900 END AS permille
        FROM documents) t
      WHERE u < permille
      ORDER BY doc_id""")),

    // ---- token-budget shard packing ------------------------------------
    // Assign docs to training shards of ~2000 tokens by cumulative token
    // count in stable doc order: shard = floor(tokens_before / budget).
    // One window cumsum — a single range-partitioned sort at scale.
    QueryDef("q112_shard_packing", (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, dir)
        .withColumn("n_tokens", size(tok(col("text"))).cast("long"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .withColumn("shard_id",
          floor((col("cum") - col("n_tokens")) / lit(2000)).cast("long"))
        .select("doc_id", "n_tokens", "shard_id")
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, n_tokens,
        CAST((cum - n_tokens) // 2000 AS BIGINT) AS shard_id
      FROM (
        SELECT doc_id,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
          sum(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT))
            OVER (ORDER BY doc_id) AS cum
        FROM documents) t
      ORDER BY doc_id""")),

    // ---- repetition filters (Gopher-style quality rules) ---------------
    // top_word_frac = count of the most frequent word / total words;
    // dup_bigram_frac = fraction of bigram occurrences that are repeats.
    // All counts integer; ratios divide the same ints in both engines.
    QueryDef("q113_repetition_stats", (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), tok(lower(col("text"))).as("w"))
      val top = d.select(col("doc_id"), explode(col("w")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("top_cnt"))
      // single-word docs have no bigrams: sequence(1, 0) yields [1, 0] and
      // element_at(w, 0) throws — guard with when() and emit NULL, matching
      // the CASE in the DuckDB twin (divide-by-zero there is not portable).
      d.join(top, "doc_id")
        .select(col("doc_id"),
          round(col("top_cnt").cast("double") / size(col("w")), 6).as("top_word_frac"),
          when(size(col("w")) >= 2,
            round(lit(1.0) -
              size(array_distinct(transform(sequence(lit(1), size(col("w")) - 1),
                i => concat(element_at(col("w"), i), lit(" "),
                  element_at(col("w"), i + 1))))).cast("double")
              / (size(col("w")) - 1), 6)).as("dup_bigram_frac"))
        .orderBy("doc_id")
    }, Some("""
      WITH d AS (SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS w FROM documents),
      wc AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n, max(c) AS top_cnt
        FROM (SELECT doc_id, word, count(*) AS c
              FROM d, unnest(w) u(word) GROUP BY doc_id, word) x
        GROUP BY doc_id),
      bg AS (
        SELECT doc_id,
          len(w) - 1 AS n_bigrams,
          len(list_distinct(list_transform(range(1, len(w)),
            i -> w[CAST(i AS INT)] || ' ' || w[CAST(i AS INT) + 1]))) AS n_distinct_bigrams
        FROM d)
      SELECT wc.doc_id,
        round(CAST(top_cnt AS DOUBLE) / n, 6) AS top_word_frac,
        CASE WHEN n_bigrams >= 1
             THEN round(1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams, 6)
             ELSE NULL END AS dup_bigram_frac
      FROM wc JOIN bg ON wc.doc_id = bg.doc_id
      ORDER BY wc.doc_id"""))
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import org.apache.spark.sql.graft.VectorFunctions.{cosine_distance, inner_product}
import org.apache.spark.sql.graft.GraftColumns.{simhash64, simhash_poly}

/** LLM-training-data pipeline operators over `documents`/`embeddings`
  * (mandated extensions beyond the reference surface — dedup, text
  * analysis, similarity; SURVEY.md §7 step 8).
  *
  * Scale notes (the point of these): every operator here is a pure
  * DataFrame program whose joins are either (a) blocked/banded so candidate
  * sets stay near-linear (q44 blocking, q45 MinHash-LSH bands, q46 SimHash
  * bands — the 100 TB path), or (b) explicitly quadratic exact baselines
  * kept as correctness oracles (q47).
  */
object PipelineQueries {

  private def tok(c: Column): Column = split(trim(c), "\\s+")

  /** Distinct word 3-gram shingles of a token array (≥3 tokens assumed). */
  private def shingles(t: Column): Column =
    array_distinct(transform(sequence(lit(0), size(t) - 3),
      i => concat_ws(" ", slice(t, i + lit(1), lit(3)))))

  /** documents ∪ a mutated re-ingest copy (last 3 tokens dropped,
    * doc_id+10000) — deterministic near-duplicates for the dedup ops.
    */
  private def withMutatedCopies(s: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    val mutated = base.select(
      (col("doc_id") + 10000).as("doc_id"),
      array_join(slice(tok(col("text")), lit(1), size(tok(col("text"))) - 3), " ").as("text"))
    base.unionByName(mutated)
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- exact dedup (hash-groupBy; ReplacingMergeTree-style keeper) ---
    QueryDef("q40_dedup_exact", (s, dir) => {
      val d = Tables.documents(s, dir)
      val doubled = d.unionByName(d) // simulated re-ingest of identical rows
      doubled.groupBy("text")
        .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
        .agg(
          count(lit(1)).as("n_groups"),
          sum(col("n_copies")).cast("long").as("n_docs"),
          sum(col("n_copies") - 1).cast("long").as("n_dupes"))
    }, Some("""
      SELECT count(*) AS n_groups,
             CAST(sum(n_copies) AS BIGINT) AS n_docs,
             CAST(sum(n_copies - 1) AS BIGINT) AS n_dupes
      FROM (
        SELECT min(doc_id) AS keeper, count(*) AS n_copies
        FROM (SELECT * FROM documents UNION ALL SELECT * FROM documents) d
        GROUP BY text) g""")),

    // ---- token counting + character-class stats ------------------------
    QueryDef("q41_token_stats", (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("n_tokens", size(tok(col("text"))).cast("long"))
        .withColumn("alpha_chars",
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("long"))
        .withColumn("alpha_ratio",
          round(col("alpha_chars").cast("double") / col("n_chars"), 6))
        .select("doc_id", "n_tokens", "alpha_chars", "alpha_ratio")
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS BIGINT) AS alpha_chars,
        round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / n_chars, 6) AS alpha_ratio
      FROM documents ORDER BY doc_id""")),

    // ---- quality scoring ------------------------------------------------
    QueryDef("q42_quality_score", (s, dir) => {
      val t = tok(col("text"))
      Tables.documents(s, dir)
        .withColumn("n_tokens", size(t).cast("long"))
        .withColumn("n_distinct", size(array_distinct(t)).cast("long"))
        .withColumn("alpha_ratio",
          length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") / col("n_chars"))
        .withColumn("score", round(
          lit(0.4) * col("alpha_ratio") +
          lit(0.3) * least(lit(1.0), col("n_tokens") / lit(80.0)) +
          lit(0.3) * (col("n_distinct").cast("double") / col("n_tokens")), 6))
        .select("doc_id", "n_tokens", "n_distinct", "score")
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, n_tokens, n_distinct,
        round(0.4 * alpha_ratio + 0.3 * least(1.0, n_tokens / 80.0)
              + 0.3 * (CAST(n_distinct AS DOUBLE) / n_tokens), 6) AS score
      FROM (
        SELECT doc_id,
          CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
          CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_distinct,
          CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / n_chars AS alpha_ratio
        FROM documents) t
      ORDER BY doc_id""")),

    // ---- language ID (stopword-count heuristic) ------------------------
    QueryDef("q43_langid", (s, dir) => {
      val t = tok(lower(col("text")))
      def score(words: Seq[String]): Column =
        size(filter(t, x => array_contains(array(words.map(lit): _*), x))).cast("long")
      Tables.documents(s, dir)
        .withColumn("s_en", score(Seq("the", "a", "of", "and", "to", "is")))
        .withColumn("s_es", score(Seq("el", "la", "de", "y", "que")))
        .withColumn("s_de", score(Seq("der", "die", "das", "und", "zu")))
        .withColumn("s_fr", score(Seq("le", "les", "et", "une", "dans")))
        .withColumn("pred", expr("""
          CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
               WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
               WHEN s_de >= s_fr THEN 'de'
               ELSE 'fr' END"""))
        .select("doc_id", "s_en", "s_es", "s_de", "s_fr", "pred")
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, s_en, s_es, s_de, s_fr,
        CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
             WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
             WHEN s_de >= s_fr THEN 'de'
             ELSE 'fr' END AS pred
      FROM (
        SELECT doc_id,
          CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
            x -> list_contains(['the','a','of','and','to','is'], x))) AS BIGINT) AS s_en,
          CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
            x -> list_contains(['el','la','de','y','que'], x))) AS BIGINT) AS s_es,
          CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
            x -> list_contains(['der','die','das','und','zu'], x))) AS BIGINT) AS s_de,
          CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
            x -> list_contains(['le','les','et','une','dans'], x))) AS BIGINT) AS s_fr
        FROM documents) t
      ORDER BY doc_id""")),

    // ---- blocked word-3-gram Jaccard near-dup (exact within blocks) ----
    // Blocking key (lang, n_tokens div 10) keeps the candidate set
    // near-linear: only plausibly-similar docs are compared.
    QueryDef("q44_ngram_jaccard_neardup", (s, dir) => {
      // shingles hashed to longs before the pairwise intersects: 8-byte
      // comparisons instead of ~25-char strings (same counts modulo a
      // ~2^-64 collision; oracle intersects the strings)
      // cached: both sides of the self-join reuse the shingle computation.
      // Shingles hashed to longs AND pre-sorted so the per-pair verify is
      // a linear merge (custom codegen expression), not a hash set build.
      // Par.fan: the shingle+hash+sort derivation is the heavy map phase
      // and a single-file table scans as ONE task (r17; guide §2.5)
      val d = graft.operators.Par.fan(Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), tok(col("text")).as("t")))
        .filter(size(col("t")) >= 3)
        .withColumn("bkt", expr("size(t) div 10"))
        .withColumn("sh", array_sort(transform(shingles(col("t")), x => xxhash64(x))))
        .cache()
      val a = d.select(col("doc_id").as("i"), col("lang"), col("bkt"), col("sh").as("sha"))
      val b = d.select(col("doc_id").as("j"), col("lang"), col("bkt"), col("sh").as("shb"))
      import org.apache.spark.sql.graft.Bridge.{toColumn, toExpr}
      a.join(b, Seq("lang", "bkt")).filter(col("i") < col("j"))
        .withColumn("inter", toColumn(org.apache.spark.sql.graft.SortedIntersectCount(
          toExpr(col("sha")), toExpr(col("shb")))))
        .withColumn("jac", col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")))
        .filter(col("jac") >= 0.1)
        .select(col("i"), col("j"), round(col("jac"), 6).as("jac"))
        .orderBy("i", "j")
    }, Some("""
      WITH d AS (
        SELECT doc_id, lang, regexp_split_to_array(trim(text), '\s+') AS t
        FROM documents),
      s AS (
        SELECT doc_id, lang, len(t) // 10 AS bkt,
          list_distinct(list_transform(range(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        FROM d WHERE len(t) >= 3)
      SELECT a.doc_id AS i, b.doc_id AS j,
        round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
              (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jac
      FROM s a, s b
      WHERE a.doc_id < b.doc_id AND a.lang = b.lang AND a.bkt = b.bkt
        AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
            (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))) >= 0.1
      ORDER BY i, j""")),

    // ---- MinHash + LSH banded near-dup (the 100 TB dedup path) ---------
    // 16 minhashes, 4 bands × 4 rows; candidates = band-bucket join, then
    // exact Jaccard verify. Hashing = one polynomial base hash per shingle
    // + 16 affine rehashes (Carter-Wegman style) — chosen over xxhash64
    // BECAUSE DuckDB can fold the identical arithmetic, so the entire
    // pipeline (mutation, shingling, minhash, banding, candidate join,
    // Jaccard verify) is oracle-gated end-to-end, not rows-only.
    QueryDef("q45_minhash_lsh", (s, dir) => {
      // Two cached tables, both narrow where it matters: the shingle
      // store (doc_id -> sh) and the band table (doc_id, band_idx,
      // band_key). The candidate join + (i,j) dedup shuffle ONLY ids —
      // at 100 TB the ~5 KB shingle arrays must not ride through three
      // exchanges; survivors re-join the shingle store by doc_id for the
      // exact-Jaccard verify.
      // (Par.fan measured HERE and reverted: the cached self-join shape
      // got slower with 32 cached partitions — 0.8 s -> 1.5 s warm; the
      // cache hit already amortizes the 1-task derivation.)
      // poly_hash_arr / minhash_sig: codegen drop-ins for the previous
      // interpreted HOF chains (bit-identical by construction — see
      // PolyHashArr/MinHashSig scaladoc; the DuckDB twin still computes
      // the same folds, so this stays oracle-gated end-to-end)
      val docs = withMutatedCopies(s, dir)
        .select(col("doc_id"), tok(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), shingles(col("t")).as("sh"))
        .withColumn("hv", org.apache.spark.sql.graft.GraftColumns
          .poly_hash_arr(col("sh"), 2147483647L))
        .cache()
      val sigs = docs.withColumn("sig", org.apache.spark.sql.graft
        .GraftColumns.minhash_sig(col("hv"), 16, 2147483647L))
      val bands = sigs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(3)),
          bIdx => concat_ws(",",
            transform(slice(col("sig"), bIdx * lit(4) + lit(1), lit(4)),
              x => x.cast("string"))))).as(Seq("band_idx", "band_key")))
        .cache() // minhash sigs are the expensive part; self-join reuses them
      val a = bands.select(col("band_idx"), col("band_key"), col("doc_id").as("i"))
      val b = bands.select(col("band_idx"), col("band_key"), col("doc_id").as("j"))
      val cands = a.join(b, Seq("band_idx", "band_key"))
        .filter(col("i") < col("j"))
        .select("i", "j").dropDuplicates("i", "j")
      cands
        .join(docs.select(col("doc_id").as("i"), col("sh").as("sha")), Seq("i"))
        .join(docs.select(col("doc_id").as("j"), col("sh").as("shb")), Seq("j"))
        .withColumn("inter", size(array_intersect(col("sha"), col("shb"))))
        .withColumn("jac", col("inter").cast("double") /
          (size(col("sha")) + size(col("shb")) - col("inter")))
        .filter(col("jac") >= 0.5)
        .select(col("i"), col("j"), round(col("jac"), 6).as("jac"))
        .orderBy("i", "j")
    }, Some("""
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000,
               array_to_string(regexp_split_to_array(trim(text), '\s+')[1:
                 len(regexp_split_to_array(trim(text), '\s+')) - 3], ' ')
        FROM documents),
      tokd AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM base),
      d AS (
        SELECT doc_id,
          list_distinct(list_transform(range(1, len(t) - 1),
            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
        FROM tokd WHERE len(t) >= 3),
      h AS (
        SELECT doc_id, sh,
          list_transform(sh, s -> list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, strlen(s) + 1),
                i -> CAST(ascii(substr(s, CAST(i AS INT), 1)) AS BIGINT))),
            (acc, c) -> (acc * 257 + c) % 2147483647)) AS hv
        FROM d),
      sg AS (
        SELECT doc_id, sh,
          list_transform(range(0, 16), hh ->
            list_min(list_transform(hv, x -> (x * (2*hh + 1) + 7919*hh + 13) % 2147483647))) AS sig
        FROM h),
      bands AS (
        SELECT doc_id, b,
          sig[b*4+1] || ',' || sig[b*4+2] || ',' || sig[b*4+3] || ',' || sig[b*4+4] AS band_key
        FROM sg, unnest([0, 1, 2, 3]) AS u(b)),
      cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM bands a JOIN bands b ON a.b = b.b AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      v AS (
        SELECT i, j,
          len(list_intersect(x.sh, y.sh)) AS inter, len(x.sh) AS la, len(y.sh) AS lb
        FROM cand JOIN sg x ON x.doc_id = cand.i JOIN sg y ON y.doc_id = cand.j)
      SELECT i, j,
        round(CAST(inter AS DOUBLE) / (la + lb - inter), 6) AS jac
      FROM v
      WHERE CAST(inter AS DOUBLE) / (la + lb - inter) >= 0.5
      ORDER BY i, j""")),

    // ---- SimHash fingerprint + banded Hamming near-dup -----------------
    // (custom codegen expression; bands = 16-bit fingerprint chunks, so a
    // pair within Hamming distance 3 shares ≥1 band — Manku et al. WWW'07)
    QueryDef("q46_simhash_neardup", (s, dir) => {
      // simhash_poly: the cross-engine 60-bit basis, so DuckDB reproduces
      // the fingerprints bit-for-bit and the whole banded pipeline is
      // oracle-gated (SimHash64/FNV stays the production default; its
      // banding behavior is covered by specs).
      // Par.fan before the fingerprint derivation (r17; guide §2.5)
      val docs = graft.operators.Par.fan(
          withMutatedCopies(s, dir).select(col("doc_id"), col("text")))
        .select(col("doc_id"), simhash_poly(tok(col("text"))).as("fp"))
        .cache() // fingerprints reused by both self-join sides
      // 4 bands x 15 bits; sign extension impossible (bit 59 is the top)
      val banded = docs.select(col("doc_id"), col("fp"),
        posexplode(expr("transform(sequence(0, 3), b -> (fp >> (b * 15)) & 32767)"))
          .as(Seq("band_idx", "band_key")))
      val a = banded.select(col("band_idx"), col("band_key"),
        col("doc_id").as("i"), col("fp").as("fpa"))
      val b = banded.select(col("band_idx"), col("band_key"),
        col("doc_id").as("j"), col("fp").as("fpb"))
      // hamming filter BEFORE the (i,j) dedup: the verify is one
      // XOR+popcount, so running it map-side on all candidates (incl.
      // cross-band repeats) shrinks the dedup shuffle from every spurious
      // band collision to just the real near-dups.
      a.join(b, Seq("band_idx", "band_key")).filter(col("i") < col("j"))
        .withColumn("hamming", expr("bit_count(fpa ^ fpb)").cast("long"))
        .filter(col("hamming") <= 8)
        .select("i", "j", "hamming").dropDuplicates("i", "j")
        .orderBy("i", "j")
    }, Some("""
      WITH base AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 10000,
               array_to_string(regexp_split_to_array(trim(text), '\s+')[1:
                 len(regexp_split_to_array(trim(text), '\s+')) - 3], ' ')
        FROM documents),
      t AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tt FROM base),
      h AS (
        SELECT doc_id, len(tt) AS n,
          list_transform(tt, s -> list_reduce(
            list_prepend(CAST(0 AS BIGINT),
              list_transform(range(1, strlen(s) + 1),
                i -> CAST(ascii(substr(s, CAST(i AS INT), 1)) AS BIGINT))),
            (acc, c) -> (acc * 257 + c) % 2147483647)) AS ht
        FROM t),
      bits AS (
        SELECT doc_id, n,
          list_transform(range(0, 60), b -> CASE WHEN
            2 * len(list_filter(ht, x -> ((x * (2*b + 3) + 8191*b + 7) % 2147483647) % 2 = 1)) > n
            THEN 1 ELSE 0 END) AS bl
        FROM h),
      bands AS (
        SELECT doc_id, b,
          array_to_string(bl[b*15+1 : b*15+15], '') AS band_key
        FROM bits, unnest([0, 1, 2, 3]) AS u(b)),
      cand AS (
        SELECT DISTINCT a.doc_id AS i, b.doc_id AS j
        FROM bands a JOIN bands b ON a.b = b.b AND a.band_key = b.band_key
        WHERE a.doc_id < b.doc_id),
      v AS (
        SELECT i, j,
          len(list_filter(range(1, 61), k -> x.bl[CAST(k AS INT)] != y.bl[CAST(k AS INT)])) AS ham
        FROM cand JOIN bits x ON x.doc_id = cand.i JOIN bits y ON y.doc_id = cand.j)
      SELECT i, j, CAST(ham AS BIGINT) AS hamming
      FROM v WHERE ham <= 8 ORDER BY i, j""")),

    // ---- embedding-cosine near-dup (exact quadratic baseline) ----------
    // Norms are precomputed ONCE PER ROW before the pair join (they sit in
    // a Project under the join, which CollapseProject cannot merge through)
    // so the O(n^2) inner loop runs one dot product instead of dot + both
    // norms — the pair count is the oracle's cost, the per-pair flops need
    // not be 3x it.
    QueryDef("q47_embed_neardup", (s, dir) => {
      // Par.fan: the O(n^2) pair loop streams ONE side against the
      // broadcast other — a 1-partition stream side runs the whole
      // quadratic loop in one task (r17; guide §2.5)
      val e = graft.operators.Par.fan(Tables.embeddings(s, dir))
        .select(col("vec_id"), col("embedding"),
          sqrt(inner_product(col("embedding"), col("embedding"))).as("nrm"))
      val a = e.select(col("vec_id").as("i"), col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("j"), col("embedding").as("eb"), col("nrm").as("nb"))
      a.join(b, col("i") < col("j"))
        .withColumn("sim", inner_product(col("ea"), col("eb")) / (col("na") * col("nb")))
        .filter(col("sim") >= 0.40)
        .select(col("i"), col("j"), round(col("sim"), 6).as("sim"))
        .orderBy("i", "j")
    }, Some("""
      SELECT a.vec_id AS i, b.vec_id AS j,
        round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])), 6) AS sim
      FROM embeddings a, embeddings b
      WHERE a.vec_id < b.vec_id
        AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                   CAST(b.embedding AS DOUBLE[])) >= 0.40
      ORDER BY i, j""")),

    // ---- content-defined fingerprint (sha/md5 family, §2.8 sha256 ids) -
    QueryDef("q48_doc_fingerprint", (s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          substring(md5(lower(trim(col("text")))), 1, 16).as("fp"),
          sha2(col("text"), 256).as("sha"))
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id, substr(md5(lower(trim(text))), 1, 16) AS fp,
             sha256(text) AS sha
      FROM documents ORDER BY doc_id"""))
  )
}

package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.HashEmbedder
import org.apache.spark.sql.graft.VectorFunctions.{cosine_distance, inner_product}

/** Round-7 curation battery: the text-CLEANING layer of a training-data
  * pipeline (the C4 / CCNet / RefinedWeb stage that sits in front of the
  * dedup + mixing operators from Round3Pipeline), plus the closing entry
  * of the filtered-serving matrix (SQ8, q136).
  *
  * Cross-engine exactness rules (extending SURVEY §5):
  *   - Transcendental scores (ln) are rounded to integer MICRO-units per
  *     distinct input value and summed as BIGINTs — integer summation is
  *     order-free, so the result is independent of partitioning and of
  *     either engine's aggregation order. The only float op per value is
  *     one ln + one round, the same accepted half-ulp exposure as the
  *     repo-wide round(dist, 6) gates.
  *   - Sampling decisions reuse q111's explicit LCG (pure per-row hash,
  *     map-only, engine-agnostic).
  *   - Regex redaction uses the [a-z0-9] / {m,n} subset that Java regex
  *     and DuckDB's RE2 interpret identically; replacement order is fixed
  *     (email, ip, phone) on both sides.
  *
  * The documents table is deterministic word-salad with no natural PII,
  * so q132 INJECTS deterministic PII (emails / IPv4 / phone, keyed off
  * doc_id) identically in both engines and then redacts it — the gate
  * exercises the redaction semantics (global replace, counts, ordering)
  * on strings where matches actually occur, including a data-dependent
  * second email on every third doc so the counts are not constant.
  */
object CurationQueries {

  private val qVec = HashEmbedder.embed("distributed vector search engine")
  private val qLit = HashEmbedder.sqlArrayLiteral(qVec)

  private def tok(c: Column): Column = split(trim(lower(c)), "\\s+")

  private val tokSql = "regexp_split_to_array(trim(lower(text)), '\\s+')"

  // PII patterns — shared literal subset of Java regex and RE2. The email
  // pattern deliberately requires a letter TLD tail so a trailing dot is
  // never swallowed; IPv4 runs after email so octets never bleed into a
  // redacted domain (the injected domains are digit-free anyway).
  private val emailRe = "[a-z0-9._]+@[a-z0-9.]+[a-z]"
  private val ipRe = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private val phoneRe = "\\+[0-9]{2}-[0-9]{3}-[0-9]{4}"

  val defs: Seq[QueryDef] = Seq(

    // ---- PII redaction (map-only scrub pass) ---------------------------
    // One regexp_replace chain per row, no shuffle: at 100 TB this is the
    // shape a scrub pass must have — embarrassingly parallel, scan-bound.
    // Counts are taken BEFORE redaction (the audit log a compliance pass
    // emits); the redacted tail is hashed to gate the replacement text.
    QueryDef("q132_pii_redact", (s, dir) => {
      val full = concat(
        col("text"),
        lit(" contact user"), col("doc_id").cast("string"), lit("@mail.example.com"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" cc u"), col("doc_id").cast("string"), lit("@corp.net")))
          .otherwise(lit("")),
        lit(" from 10."), (col("doc_id") % 200).cast("string"),
        lit("."), ((col("doc_id") * 7) % 200).cast("string"),
        lit("."), ((col("doc_id") * 13) % 250).cast("string"),
        lit(" call +91-555-"), lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
      val red = regexp_replace(
        regexp_replace(
          regexp_replace(col("full"), emailRe, "<EMAIL>"),
          ipRe, "<IP>"),
        phoneRe, "<PHONE>")
      Tables.documents(s, dir)
        .withColumn("full", full)
        .withColumn("n_email", regexp_count(col("full"), lit(emailRe)).cast("long"))
        .withColumn("n_ip", regexp_count(col("full"), lit(ipRe)).cast("long"))
        .withColumn("n_phone", regexp_count(col("full"), lit(phoneRe)).cast("long"))
        .withColumn("red", red)
        .select(col("doc_id"), col("n_email"), col("n_ip"), col("n_phone"),
          length(col("red")).cast("long").as("red_len"),
          // tail after the FIRST ' contact ' — the same occurrence side as
          // the oracle's strpos; substring_index(-1) would take the LAST
          // and only agree while the corpus vocabulary excludes 'contact'
          when(locate(" contact ", col("red")) > 0,
            col("red").substr(locate(" contact ", col("red")) + lit(9),
              length(col("red"))))
            .otherwise(col("red")).as("tail"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH ftxt AS (
        SELECT doc_id,
          text || ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com'
               || CASE WHEN doc_id % 3 = 0
                       THEN ' cc u' || CAST(doc_id AS VARCHAR) || '@corp.net'
                       ELSE '' END
               || ' from 10.' || CAST(doc_id % 200 AS VARCHAR)
               || '.' || CAST((doc_id * 7) % 200 AS VARCHAR)
               || '.' || CAST((doc_id * 13) % 250 AS VARCHAR)
               || ' call +91-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            AS ftxt
        FROM documents),
      red AS (
        SELECT doc_id,
          CAST(len(regexp_extract_all(ftxt, '$emailRe')) AS BIGINT) AS n_email,
          CAST(len(regexp_extract_all(ftxt, '$ipRe')) AS BIGINT) AS n_ip,
          CAST(len(regexp_extract_all(ftxt, '$phoneRe')) AS BIGINT) AS n_phone,
          regexp_replace(
            regexp_replace(
              regexp_replace(ftxt, '$emailRe', '<EMAIL>', 'g'),
              '$ipRe', '<IP>', 'g'),
            '$phoneRe', '<PHONE>', 'g') AS red
        FROM ftxt)
      SELECT doc_id, n_email, n_ip, n_phone,
        CAST(len(red) AS BIGINT) AS red_len,
        CASE WHEN strpos(red, ' contact ') > 0
             THEN substr(red, strpos(red, ' contact ') + 9)
             ELSE red END AS tail
      FROM red
      ORDER BY doc_id""")),

    // ---- CCNet-style unigram-LM perplexity scoring ---------------------
    // Train a unigram LM on the corpus (one groupBy over the exploded
    // words — partial-aggregated map-side; the vocab is then a broadcast
    // fact table), score every doc by total negative log-likelihood, and
    // keep docs under a threshold. The per-word -ln p is rounded to
    // integer micro-nats ONCE per vocab entry; per-doc totals are then
    // exact BIGINT sums (order-free in any engine, any partitioning).
    // At 100 TB: words shuffle once for the vocab count (map-side
    // combine), the vocab is broadcast back, docs score map-only.
    QueryDef("q133_unigram_logprob", (s, dir) => {
      // (Par.fan measured HERE and reverted: `words` feeds three plan
      // branches, and the added exchange + 32-task branch jobs cost more
      // than the 1-task explode they replaced — 0.57 s -> 2.5 s.)
      val words = Tables.documents(s, dir)
        .select(col("doc_id"), explode(tok(col("text"))).as("w"))
      val tot = words.agg(count(lit(1)).as("tot"))
      val lp = words.groupBy("w").agg(count(lit(1)).as("cnt"))
        .crossJoin(broadcast(tot))
        .select(col("w"),
          round(log(col("tot").cast("double") / col("cnt")) * 1e6)
            .cast("long").as("lpm"))
      words.join(broadcast(lp), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("lpm")).as("nll_micro"))
        .select(col("doc_id"), col("n_words"), col("nll_micro"),
          expr("nll_micro div n_words").as("avg_micro"),
          (col("nll_micro") < lit(3402000L) * col("n_words"))
            .cast("long").as("keep"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH words AS (
        SELECT doc_id, unnest($tokSql) AS w FROM documents),
      tot AS (SELECT count(*) AS tot FROM words),
      lp AS (
        SELECT w, CAST(round(ln(CAST(tot AS DOUBLE) / cnt) * 1000000) AS BIGINT) AS lpm
        FROM (SELECT w, count(*) AS cnt FROM words GROUP BY w), tot),
      doc AS (
        SELECT doc_id, count(*) AS n_words, CAST(sum(lpm) AS BIGINT) AS nll_micro
        FROM words JOIN lp USING (w) GROUP BY doc_id)
      SELECT doc_id, n_words, nll_micro,
        CAST(nll_micro // n_words AS BIGINT) AS avg_micro,
        CAST(CASE WHEN nll_micro < 3402000 * n_words THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM doc
      ORDER BY doc_id""")),

    // ---- TF-IDF top terms per source (corpus characterization) ---------
    // tf per (source, term) and df per term are two hash aggregations
    // over the exploded words (both partial map-side); N is a single-row
    // broadcast; the top-5-per-source window sorts the tiny (source ×
    // vocab) aggregate, never the corpus. Scores are integer micro-units
    // (one ln + one round per (source, term)), ties broken by term.
    QueryDef("q134_tfidf_terms", (s, dir) => {
      // (Par.fan measured HERE and reverted — the q133 multi-branch
      // story: 1.07 s -> 1.35 s.)
      val words = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), explode(tok(col("text"))).as("w"))
      val n = Tables.documents(s, dir).agg(count(lit(1)).as("n"))
      val dfw = words.select(col("doc_id"), col("w")).distinct()
        .groupBy("w").agg(count(lit(1)).as("df"))
      val tf = words.groupBy(col("source"), col("w")).agg(count(lit(1)).as("tf"))
      val win = Window.partitionBy(col("source"))
        .orderBy(col("score_micro").desc, col("w"))
      tf.join(broadcast(dfw), "w").crossJoin(broadcast(n))
        .withColumn("score_micro",
          round(col("tf") * log(col("n").cast("double") / col("df")) * 1e6)
            .cast("long"))
        .withColumn("rank", row_number().over(win).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("source"), col("w"), col("tf"), col("df"),
          col("score_micro"), col("rank"))
        .orderBy("source", "rank")
    }, Some(s"""
      WITH words AS (
        SELECT doc_id, source, unnest($tokSql) AS w FROM documents),
      n AS (SELECT count(*) AS n FROM documents),
      dfw AS (
        SELECT w, count(*) AS df
        FROM (SELECT DISTINCT doc_id, w FROM words) GROUP BY w),
      tf AS (SELECT source, w, count(*) AS tf FROM words GROUP BY source, w),
      scored AS (
        SELECT source, w, tf, df,
          CAST(round(tf * ln(CAST(n AS DOUBLE) / df) * 1000000) AS BIGINT)
            AS score_micro
        FROM tf JOIN dfw USING (w), n),
      ranked AS (
        SELECT *, CAST(row_number() OVER
          (PARTITION BY source ORDER BY score_micro DESC, w) AS BIGINT) AS rank
        FROM scored)
      SELECT source, w, tf, df, score_micro, rank
      FROM ranked WHERE rank <= 5
      ORDER BY source, rank""")),

    // ---- token-budget mixture rebalancing (data mixing) ----------------
    // Down-sample each source toward a per-source token budget: rate =
    // min(1, budget / source_tokens), applied with q111's LCG so the kept
    // set is engine- and partitioning-independent. The per-source totals
    // are one hash agg; rates broadcast back; the keep decision is
    // map-only. Reports the achieved mixture (kept docs/tokens) so the
    // gate covers both the rate arithmetic and the sampling.
    QueryDef("q135_mixture_rebalance", (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("n_tok", size(tok(col("text"))).cast("long"))
      val rates = docs.groupBy("source")
        .agg(sum(col("n_tok")).as("t_total"))
        .withColumn("rate", least(lit(1000L), expr("1500000 div t_total")))
      docs.join(broadcast(rates), "source")
        .withColumn("u",
          ((col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483648L)) % 1000)
        .filter(col("u") < col("rate"))
        .groupBy(col("source"), col("t_total"), col("rate"))
        .agg(count(lit(1)).as("kept_docs"), sum(col("n_tok")).as("kept_tokens"))
        .orderBy("source")
    }, Some(s"""
      WITH docs AS (
        SELECT doc_id, source,
          CAST(len($tokSql) AS BIGINT) AS n_tok
        FROM documents),
      rates AS (
        SELECT source, sum(n_tok) AS t_total,
          least(1000, 1500000 // sum(n_tok)) AS rate
        FROM docs GROUP BY source)
      SELECT source, CAST(t_total AS BIGINT) AS t_total,
        CAST(rate AS BIGINT) AS rate,
        count(*) AS kept_docs, CAST(sum(n_tok) AS BIGINT) AS kept_tokens
      FROM docs JOIN rates USING (source)
      WHERE ((doc_id * 1103515245 + 12345) % 2147483648) % 1000 < rate
      GROUP BY source, t_total, rate
      ORDER BY source""")),

    // ---- SemDeDup-style cluster-scoped semantic dedup ------------------
    // Abbas et al. 2023 (arXiv:2303.09540): dedup in EMBEDDING space, but
    // only WITHIN a cluster — the cluster key bounds the quadratic
    // verify, the same blocking discipline as q44-q46. Here the label
    // column plays the cluster id (at 100 TB the IVF assignment from
    // AnnIndex.fit is the cluster key, persisted PARTITION BY cluster_id,
    // so the pair join is partition-local — no corpus-wide shuffle).
    // Greedy keep-lowest-id: a doc is dropped iff a LOWER-id doc in its
    // cluster is near-identical (sim >= 0.40). The similarity is rounded
    // to 6 dp on BOTH engines before the threshold compare (the repo-wide
    // round(,6) exposure contract) so a last-ulp divergence between the
    // two float pipelines can never flip keep/drop on a boundary pair.
    QueryDef("q139_semantic_dedup", (s, dir) => {
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), col("embedding"),
          sqrt(inner_product(col("embedding"), col("embedding"))).as("nrm"))
      val a = e.select(col("vec_id").as("i"), col("label").as("la"),
        col("embedding").as("ea"), col("nrm").as("na"))
      val b = e.select(col("vec_id").as("j"), col("label").as("lb"),
        col("embedding").as("eb"), col("nrm").as("nb"))
      val dropped = a.join(b, col("la") === col("lb") && col("i") < col("j"))
        .filter(round(inner_product(col("ea"), col("eb")) / (col("na") * col("nb")), 6) >= 0.40)
        .select(col("j")).distinct()
      val base = e.select(col("vec_id"), col("label"))
      base.join(dropped, base("vec_id") === dropped("j"), "left")
        .select(col("vec_id"), col("label"),
          col("j").isNull.cast("long").as("keep"))
        .orderBy("vec_id")
    }, Some("""
      WITH dropped AS (
        SELECT DISTINCT b.vec_id AS j
        FROM embeddings a, embeddings b
        WHERE a.label = b.label AND a.vec_id < b.vec_id
          AND round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])), 6) >= 0.40)
      SELECT e.vec_id, e.label,
        CAST(CASE WHEN d.j IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.j
      ORDER BY e.vec_id""")),

    // ---- DSIR-style importance weighting (domain adaptation) -----------
    // Xie et al. 2023 (arXiv:2302.03169): weight each doc by how much
    // more likely a TARGET-domain LM finds it than the SOURCE (whole
    // corpus) LM — here hashed-unigram LMs with add-one smoothing, the
    // target being the src1/src3 slice. Same exactness recipe as q133:
    // the per-word log-ratio is rounded to integer micro-nats once per
    // vocab entry (both LMs broadcast), per-doc totals are order-free
    // BIGINT sums, and the keep decision compares integers. Map-only
    // over the corpus after two small vocab aggs.
    QueryDef("q140_dsir_weights", (s, dir) => {
      // (Par.fan measured HERE and reverted — the q133 multi-branch
      // story: 0.60 s -> 1.32 s.)
      val words = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), explode(tok(col("text"))).as("w"))
      val srcCnt = words.groupBy("w").agg(count(lit(1)).as("cs"))
      val tgtCnt = words.filter(col("source").isin("src1", "src3"))
        .groupBy("w").agg(count(lit(1)).as("ct"))
      val totS = words.agg(count(lit(1)).as("ts"))
      val totT = words.filter(col("source").isin("src1", "src3"))
        .agg(count(lit(1)).as("tt"))
      val vocabN = srcCnt.agg(count(lit(1)).as("v"))
      val lm = srcCnt.join(tgtCnt, Seq("w"), "left")
        .na.fill(0L, Seq("ct"))
        .crossJoin(broadcast(totS)).crossJoin(broadcast(totT))
        .crossJoin(broadcast(vocabN))
        .select(col("w"), round(
          (log((col("ct") + 1).cast("double") / (col("tt") + col("v"))) -
            log((col("cs") + 1).cast("double") / (col("ts") + col("v")))) * 1e6)
          .cast("long").as("lrm"))
      words.join(broadcast(lm), "w")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("lrm")).as("logratio_micro"))
        .select(col("doc_id"), col("n_words"), col("logratio_micro"),
          (col("logratio_micro") > 0L).cast("long").as("keep"))
        .orderBy("doc_id")
    }, Some(s"""
      WITH words AS (
        SELECT doc_id, source, unnest($tokSql) AS w FROM documents),
      src AS (SELECT w, count(*) AS cs FROM words GROUP BY w),
      tgt AS (SELECT w, count(*) AS ct FROM words
              WHERE source IN ('src1', 'src3') GROUP BY w),
      tots AS (SELECT count(*) AS ts FROM words),
      tott AS (SELECT count(*) AS tt FROM words WHERE source IN ('src1', 'src3')),
      vocab AS (SELECT count(*) AS v FROM src),
      lm AS (
        SELECT s.w, CAST(round(
          (ln(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE) / (tt + v)) -
           ln(CAST(s.cs + 1 AS DOUBLE) / (ts + v))) * 1000000) AS BIGINT) AS lrm
        FROM src s LEFT JOIN tgt t ON s.w = t.w, tots, tott, vocab)
      SELECT doc_id, count(*) AS n_words,
        CAST(sum(lrm) AS BIGINT) AS logratio_micro,
        CAST(CASE WHEN CAST(sum(lrm) AS BIGINT) > 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
      FROM words JOIN lm USING (w)
      GROUP BY doc_id
      ORDER BY doc_id""")),

    // ---- filtered SQ8 serving (closes the filtered-serving matrix) -----
    // Same zero-new-machinery shape as q131: the SQ8-encoded relation is
    // a DataFrame, so the compiled self-query predicate filters it BEFORE
    // the shortlist (Catalyst pushes it into the cached-relation scan)
    // and the shortlist is sized on SURVIVORS (q103's 10% operating
    // point, floor 100). With this every serving structure answers the
    // reference's filtered query shape: PackedScan q121, Bm25Index q127,
    // GraphAnn q129, IvfGraph q130, PQ q131, SQ8 here.
    // ---- durable SQ8 (completes the oracle-gated durability set) -------
    // q119 (graph), q120 (PQ) and q141 (lexical) gate their save/load
    // paths end-to-end; SQ8's round trip was spec-only. Serve from the
    // LOADED bounds + codes (no re-fit, no re-encode): shortlist by SQ8
    // ADC distance, exact cosine re-rank — q103's oracle verbatim, so
    // hash-exact ⇒ the reloaded quantization constants are bit-identical.
    QueryDef("q144_sq8_saveload", (s, dir) => {
      import graft.operators.{AnnIndex, Sq8Index}
      val e = Tables.embeddings(s, dir)
      val model = Sq8Index.fitCached(e, dir, "embedding")
      val (enc, _) = Sq8Index.encodedCached(e, dir, model, "embedding")
      val path = AnnIndex.tmpRoot + "/sq8_durable_" +
        dir.replaceAll("[^a-zA-Z0-9]", "_")
      Sq8Index.save(model, enc.select(col("vec_id"), col("label"),
        col("embedding"), col("__sq")), path)
      val (lModel, lEnc, lN) = Sq8Index.load(s, path)
      val cand = math.max(100L, lN / 10).toInt
      lEnc
        .withColumn("__d", Sq8Index.distance(lModel, col("__sq"), typedlit(qVec.toIndexedSeq)))
        .orderBy(col("__d"), col("vec_id")).limit(cand)
        .withColumn("dist", cosine_distance(col("embedding"), typedlit(qVec.toIndexedSeq)))
        .orderBy(col("dist"), col("vec_id")).limit(10)
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    QueryDef("q136_sq8_filtered", (s, dir) => {
      import graft.operators.{Sq8Index, SelfQueryFilter => F}
      val e = Tables.embeddings(s, dir)
      val d = Tables.documents(s, dir)
      val corpus = e.join(d, e("vec_id") === d("doc_id"))
        .select(e("vec_id"), e("embedding"), e("label"), d("lang"), d("n_chars"))
      val node: F.Node = F.And(Seq(F.Eq("lang", F.S("en")), F.Gt("n_chars", F.I(300))))
      val model = Sq8Index.fitCached(e, dir, "embedding")
      val (enc, _) = Sq8Index.encodedCached(corpus, dir + "#meta", model, "embedding")
      val survivors = enc.filter(F.compile(node))
      val cand = math.max(100L, survivors.count() / 10).toInt
      survivors
        .withColumn("__d", Sq8Index.distance(model, col("__sq"), typedlit(qVec.toIndexedSeq)))
        .orderBy(col("__d"), col("vec_id")).limit(cand)
        .withColumn("dist", cosine_distance(col("embedding"), typedlit(qVec.toIndexedSeq)))
        .orderBy(col("dist"), col("vec_id")).limit(10)
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, Some {
      import graft.operators.{SelfQueryFilter => F}
      val where = F.toSql(F.And(Seq(F.Eq("lang", F.S("en")), F.Gt("n_chars", F.I(300)))))
      s"""
      SELECT e.vec_id, e.label,
        round(1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
      WHERE $where
      ORDER BY 1.0 - list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), e.vec_id
      LIMIT 10"""
    })
  )
}

package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashEmbedder
import graft.operators.{AnnIndex, Multimodal, MvccCatalog, PqIndex, Sq8Index, SelfQueryParser, SelfQueryFilter => F}
import org.apache.spark.sql.graft.PackedVectorFunctions._
import org.apache.spark.sql.graft.VectorFunctions.{cosine_distance, inner_product}

/** Round-2 battery: packed vector storage (the reference's `fp16_storage=1`
  * MSTG option, `app/backend/constants/myscale_tables.py:35,63`) surfaced as
  * verifiable queries.
  *
  * q91 proves the fp32-packed scan is LOSSLESS: identical top-k + distances
  * to the array-column scan (oracle = same SQL as q20). q92 proves the fp16
  * round-trip stays inside half-precision's error budget on every stored
  * vector (elements are < 0.5, so abs error <= 2^-12; the 1e-3 gate has 4x
  * headroom) — the oracle pins n_bad to zero.
  */
object Round2Queries {

  private val qText = "distributed vector search engine"
  private val qVec = HashEmbedder.embed(qText)
  private val qLit = HashEmbedder.sqlArrayLiteral(qVec)

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q91_knn_packed", (s, dir) => {
      Tables.embeddings(s, dir)
        .select(col("vec_id"), col("label"), vec_pack(col("embedding")).as("emb"))
        .withColumn("dist", cosine_distance_packed(col("emb"), typedlit(qVec.toIndexedSeq)))
        .orderBy(col("dist"), col("vec_id"))
        .limit(10)
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    QueryDef("q92_f16_quality", (s, dir) => {
      val rt = vec_unpack_f16(vec_pack_f16(col("embedding")))
      Tables.embeddings(s, dir)
        .select(array_max(zip_with(col("embedding"), rt,
          (a, b) => abs(a - b))).as("err"))
        .agg(count(lit(1)).as("n_vectors"),
          sum(when(col("err") > 0.001, 1L).otherwise(0L)).as("n_bad"))
    }, Some("""
      SELECT CAST(count(*) AS BIGINT) AS n_vectors, CAST(0 AS BIGINT) AS n_bad
      FROM embeddings""")),

    // ---- S7 durable form: IVF index persisted PARTITION BY cluster_id --
    // Full probe (nprobe = k) makes the result EXACT, so the whole
    // persisted path — write, partitioned read-back, distance, top-k — is
    // oracle-gated; selective pruning (nprobe < k) is the same plan with a
    // tighter partition filter and is asserted file-count-wise in
    // AnnIndexSpec.
    QueryDef("q93_ivf_partitioned", (s, dir) => {
      val (model, persisted) = AnnIndex.fitPersistedCached(
        Tables.embeddings(s, dir), dir, "embedding", "vec_id", k = 16, iters = 3)
      AnnIndex.query(persisted, model, "embedding", "vec_id", qVec, k = 10, nprobe = 16)
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- S8/S9 at scale: MVCC lifecycle (tombstone delete + time travel)
    // Same lifecycle as q63 but deletes write key tombstones instead of
    // rewriting the table, and the pre-delete snapshot stays queryable.
    // Output = latest snapshot UNION the time-travel read of commit 1.
    QueryDef("q94_mvcc_timetravel", (s, dir) => {
      val root = graft.operators.AnnIndex.tmpRoot + "/mvcc_q94"
      val cat = MvccCatalog(s, root)
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"), col("lang"))
      cat.create("kb", docs, version = 1)
      cat.append("kb", docs.filter(col("lang") === "en")
        .withColumn("text", concat(col("text"), lit(" v2"))), version = 2)
      cat.deleteWhere("kb", col("lang") === "zh", Seq("doc_id"), version = 3)
      def snap(label: String, asOf: Option[Long]) =
        cat.read("kb", Seq("doc_id"), asOf)
          .groupBy("lang")
          .agg(count(lit(1)).as("n"),
            sum(when(col("__v") === 2, 1L).otherwise(0L)).as("n_v2"))
          .withColumn("snap", lit(label))
          .select("snap", "lang", "n", "n_v2")
      snap("latest", None).unionByName(snap("v1", Some(1L)))
        .orderBy("snap", "lang")
    }, Some("""
      SELECT 'latest' AS snap, lang, count(*) AS n,
             CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_v2
      FROM documents WHERE lang <> 'zh' GROUP BY lang
      UNION ALL
      SELECT 'v1' AS snap, lang, count(*) AS n, CAST(0 AS BIGINT) AS n_v2
      FROM documents GROUP BY lang
      ORDER BY snap, lang""")),

    // ---- P5 wire format: LangChain structured-query payload end-to-end -
    // q26 enters through the programmatic AST; this enters through the
    // raw fenced-JSON text the self-query LLM actually returns. The
    // oracle WHERE clause is rendered from the SAME parsed AST, so parse
    // -> compile -> execute is what's being gated.
    QueryDef("q95_selfquery_wire", (s, dir) => {
      val raw = """```json
        {
            "query": "vector search engines",
            "filter": "or(and(eq(\"lang\", \"en\"), gt(\"n_chars\", 250)), and(in(\"lang\", [\"de\", \"fr\"]), like(\"text\", \"%data%\")))"
        }
        ```"""
      val req = SelfQueryParser.parseRequest(raw)
      Tables.documents(s, dir)
        .filter(F.compile(req.filter.get))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    }, Some {
      val ast = SelfQueryParser.parseFilter(
        """or(and(eq("lang", "en"), gt("n_chars", 250)), and(in("lang", ["de", "fr"]), like("text", "%data%")))""")
      s"""
      SELECT doc_id, lang, n_chars FROM documents
      WHERE ${F.toSql(ast)}
      ORDER BY doc_id"""
    }),

    // ---- embedding near-dup, SUB-QUADRATIC (random-hyperplane LSH) ------
    // q47 is the exact O(n^2) baseline; this is the 100 TB path: 16 sign
    // bits against deterministic hyperplanes, banded 4x4 -> candidates =
    // band-bucket join, exact cosine verify on candidates only. The
    // corpus plants scaled copies (2*v): scaling preserves every sign bit,
    // so recall on >= 0.99 pairs is exactly 1 and the brute-force DuckDB
    // oracle matches the LSH result — the pruning is what's being gated.
    // (Max random-pair cosine in 64-d at this N is ~0.7, far below 0.99.)
    QueryDef("q96_embed_neardup_lsh", (s, dir) => {
      val e = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
      val scaled = e.select((col("vec_id") + 100000).as("vec_id"),
        transform(col("embedding"), x => (x * lit(2.0f)).cast("float")).as("embedding"))
      val all = e.unionByName(scaled)
      // 64 hyperplanes, 4 bands x 16 bits: 65536-way buckets per band.
      // Expected spurious candidates are bands*(2N)^2/2/2^bits, so band
      // width must GROW with log(N) to keep the candidate set near-linear
      // — 16-bit bands hold ~2^34 rows before collisions dominate.
      // one fused expression computes all 64 sign bits per row (one array
      // copy + one loop, vs 64 inner_product columns copying 64x); band
      // keys are 16-bit integer slices of the packed long
      val sig = org.apache.spark.sql.graft.LshSignature.lsh_signature(col("embedding"), 64)
      val bands = (0 until 4).map(b =>
        expr(s"int((__sig >> ${b * 16}) & 65535)"))
      // (Par.fan measured HERE and reverted: the cached banded self-join
      // shape got slower with 32 cached partitions — 0.41 s -> 1.18 s
      // warm; the q45 story.)
      val banded = all.withColumn("__sig", sig).select(col("vec_id"),
        posexplode(array(bands: _*)).as(Seq("band_idx", "band_key")))
        .cache() // the signature pass is the expensive stage; both join
                 // sides and repeat runs reuse it (as q45/q46 do)
      val cands = banded.select(col("band_idx"), col("band_key"), col("vec_id").as("i"))
        .join(banded.select(col("band_idx"), col("band_key"), col("vec_id").as("j")),
          Seq("band_idx", "band_key"))
        .filter(col("i") < col("j"))
        .select("i", "j").dropDuplicates("i", "j")
      cands
        .join(all.select(col("vec_id").as("i"), col("embedding").as("ea")), Seq("i"))
        .join(all.select(col("vec_id").as("j"), col("embedding").as("eb")), Seq("j"))
        .withColumn("sim", lit(1.0) - cosine_distance(col("ea"), col("eb")))
        .filter(col("sim") >= 0.99)
        .select(col("i"), col("j"), round(col("sim"), 6).as("sim"))
        .orderBy("i", "j")
    }, Some("""
      WITH all_v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
        UNION ALL
        SELECT vec_id + 100000,
               CAST(list_transform(embedding, x -> x * 2) AS DOUBLE[])
        FROM embeddings)
      SELECT a.vec_id AS i, b.vec_id AS j,
             round(list_cosine_similarity(a.emb, b.emb), 6) AS sim
      FROM all_v a, all_v b
      WHERE a.vec_id < b.vec_id
        AND list_cosine_similarity(a.emb, b.emb) >= 0.99
      ORDER BY i, j""")),

    // ---- BPE-ish subword token counting (brief-mandated text analysis) --
    // GPT-2-style pretokenizer regex (ASCII simplification — contractions,
    // space-prefixed word/number runs, punctuation runs, whitespace). The
    // SAME pattern runs in Spark (Java regex) and DuckDB (RE2): both use
    // leftmost-first alternation, so token counts agree exactly.
    QueryDef("q97_bpe_tokens", (s, dir) => {
      val pat = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\\s']+|\\s+"
      Tables.documents(s, dir)
        .withColumn("n_bpe", size(regexp_extract_all(lower(col("text")), lit(pat), lit(0))).cast("long"))
        .withColumn("chars_per_token",
          round(col("n_chars").cast("double") / col("n_bpe"), 6))
        .select("doc_id", "n_bpe", "chars_per_token")
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        CAST(len(regexp_extract_all(lower(text),
          '''s|''t|''re|''ve|''m|''ll|''d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+|\s+')) AS BIGINT) AS n_bpe,
        round(CAST(n_chars AS DOUBLE) /
          len(regexp_extract_all(lower(text),
            '''s|''t|''re|''ve|''m|''ll|''d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s'']+|\s+')), 6) AS chars_per_token
      FROM documents ORDER BY doc_id""")),

    // ---- multimodal frame sampling (decode -> every-2nd-frame feature) --
    // The decoder is the deterministic stub (no media libs here), which
    // makes the fan-out expressible in SQL — so the driver verifies the
    // mapPartitions/flatMap plumbing, schema, and sampling arithmetic
    // end-to-end against DuckDB.
    QueryDef("q98_frame_sample", (s, dir) => {
      val blobs = Multimodal.blobsFromDocuments(s,
        Tables.documents(s, dir).filter(col("doc_id") % 5 === 0))
      Multimodal.sampleFrames(blobs, every = 2).toDF()
        .orderBy("doc_id", "frame_idx")
    }, Some("""
      WITH f AS (
        SELECT doc_id, text, 1 + strlen(text) % 16 AS n_frames
        FROM documents WHERE doc_id % 5 = 0)
      SELECT doc_id, CAST(i AS BIGINT) AS frame_idx,
        CAST(ascii(substr(text, CAST((i * 7) % strlen(text) AS INT) + 1, 1)) AS BIGINT) AS luma
      FROM f, unnest(range(0, n_frames, 2)) AS t(i)
      ORDER BY doc_id, frame_idx""")),

    // ---- product quantization: ADC shortlist + exact re-rank ------------
    // 32x-compressed codes absorb the scan (8 table lookups/row); the
    // exact cosine metric re-ranks only the ADC top-C shortlist
    // (C = max(200, N/4): the test embeddings are uniform-random 64-d and
    // the codebooks train on a 2000-vector sample, so ADC ranks are noisy
    // — the true nearest sat at ADC rank ~219 of 2000, so C must keep a
    // real margin over that; clustered real embeddings rank far tighter).
    // Because
    // re-rank is exact and the shortlist reliably contains the true
    // top-10, the result equals the brute-force scan and the q20 oracle
    // gates the whole encode -> ADC -> re-rank path.
    QueryDef("q99_pq_topk", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val model = PqIndex.fitCached(e, dir, "embedding", "vec_id")
      val enc = PqIndex.encodedCached(e, dir, model, "embedding")
      val cand = math.max(200L, enc.count() / 4).toInt
      PqIndex.search(model, enc, "embedding", "vec_id", qVec, k = 10, candidates = cand)
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- IVF-PQ: the composed index stack (partition prune + ADC) ------
    // Persisted IVF partitions bound WHAT is read (cluster_id pruning,
    // q93); PQ codes bound what the scan COSTS per row (q99). Composed,
    // a probe reads nprobe/k of the files and scans them by 8-byte codes
    // before the exact re-rank — the standard big-index serving stack
    // (FAISS IVF-PQ shape) on plain Spark. Full probe + re-rank = exact,
    // so the composition is oracle-gated; partial-probe behavior is
    // covered by the q93/q49 pruning specs.
    QueryDef("q102_ivfpq", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val (annModel, persisted) = AnnIndex.fitPersistedCached(
        e, dir, "embedding", "vec_id", k = 16, iters = 3)
      val pqModel = PqIndex.fitCached(e, dir, "embedding", "vec_id")
      val enc = PqIndex.encodedCached(persisted, dir + "#ivfpq", pqModel, "embedding")
      val probed = annModel.nearest(qVec, 16)
      val pruned = enc.filter(col("cluster_id").isin(probed: _*))
      val cand = math.max(200L, e.count() / 4).toInt
      PqIndex.search(pqModel, pruned, "embedding", "vec_id", qVec, k = 10, candidates = cand)
        .select(col("vec_id"), col("label"), round(col("dist"), 6).as("dist"))
    }, Some(s"""
      SELECT vec_id, label,
        round(1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                           CAST($qLit AS DOUBLE[])), 6) AS dist
      FROM embeddings
      ORDER BY 1.0 - list_cosine_similarity(CAST(embedding AS DOUBLE[]),
                                            CAST($qLit AS DOUBLE[])), vec_id
      LIMIT 10""")),

    // ---- multimodal resize stage (aspect-fit + resampled checksum) ------
    // Completes the decode / feature-extract / resize / frame-sample
    // quartet; integer-exact stub arithmetic keeps the oracle honest.
    QueryDef("q100_resize_stub", (s, dir) => {
      val blobs = Multimodal.blobsFromDocuments(s,
        Tables.documents(s, dir).filter(col("doc_id") % 3 === 0))
      Multimodal.resizeStub(blobs, maxSide = 32).toDF().orderBy("doc_id")
    }, Some("""
      WITH d AS (
        SELECT doc_id, text,
          64 + ascii(substr(text, 1, 1)) % 64 AS w,
          64 + ascii(substr(text, 2, 1)) % 64 AS h,
          greatest(1, strlen(text) // 16) AS stride
        FROM documents WHERE doc_id % 3 = 0),
      s AS (
        SELECT doc_id,
          CAST(sum(ascii(substr(text, CAST(i AS INT) + 1, 1))) AS BIGINT) AS checksum
        FROM d, unnest(range(0, strlen(text), stride)) AS t(i)
        GROUP BY doc_id)
      SELECT d.doc_id,
        CAST(w * 32 // greatest(w, h) AS BIGINT) AS out_w,
        CAST(h * 32 // greatest(w, h) AS BIGINT) AS out_h,
        coalesce(s.checksum, 0) AS checksum
      FROM d LEFT JOIN s USING (doc_id)
      ORDER BY doc_id""")),

    // ---- polynomial (Rabin-style) document fingerprint ------------------
    // The full-document polynomial hash both engines can fold exactly
    // (mod 1e9+7 keeps BIGINT arithmetic overflow-free in DuckDB, which
    // errors on wraparound). The windowed/rolling variant drives
    // content-defined chunking in [[org.apache.spark.sql.graft.CdcChunks]]
    // (spec-verified; DuckDB cannot express the sliding window).
    QueryDef("q101_rolling_fingerprint", (s, dir) => {
      Tables.documents(s, dir)
        .withColumn("fp", expr(
          "aggregate(sequence(1, length(text)), 0L, " +
            "(acc, i) -> (acc * 257 + ascii(substring(text, i, 1))) % 1000000007)"))
        .select("doc_id", "fp")
        .orderBy("doc_id")
    }, Some("""
      SELECT doc_id,
        CAST(list_reduce(
          list_prepend(0, list_transform(range(1, strlen(text) + 1),
            i -> CAST(ascii(substr(text, CAST(i AS INT), 1)) AS BIGINT))),
          (acc, c) -> (acc * 257 + c) % 1000000007) AS BIGINT) AS fp
      FROM documents ORDER BY doc_id""")),

    // ---- SQ8 scalar quantization: 1 B/dim scan + exact re-rank ----------
    // The middle rung of the storage ladder (fp32 > fp16 > SQ8 > PQ):
    // per-dim affine int8 against trained bounds, 4x smaller than fp32 at
    // per-dim error <= range/510. The SQ8 shortlist (max(100, N/10)) is
    // exact-re-ranked, so the result equals the brute-force scan and the
    // q20 oracle gates the train -> encode -> scan -> re-rank path.
    QueryDef("q103_sq8_topk", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val model = Sq8Index.fitCached(e, dir, "embedding")
      val (enc, n) = Sq8Index.encodedCached(e, dir, model, "embedding")
      val cand = math.max(100L, n / 10).toInt
      enc
        .withColumn("__d", Sq8Index.distance(model, col("__sq"), typedlit(qVec.toIndexedSeq)))
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

    // ---- residual IVF-PQ (PAMI'11 §IV — the full construction) ----------
    // Codes quantize v - centroid(cluster(v)) over the persisted IVF
    // index; the scan picks its per-cluster LUT by the row's cluster_id.
    // Residuals are smaller and better-centered than raw vectors, so the
    // same 8 bytes carry more precision (spec compares needed shortlist
    // ranks vs plain PQ). Full probe + exact re-rank keeps the result
    // equal to the brute-force scan -> q20 oracle gates the whole path.
    QueryDef("q104_ivfpq_residual", (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val (annModel, persisted) = AnnIndex.fitPersistedCached(
        e, dir, "embedding", "vec_id", k = 16, iters = 3)
      val pq = PqIndex.fitResidualCached(persisted, dir, "embedding", "vec_id", annModel)
      val enc = PqIndex.encodedResidualCached(persisted, dir, pq, annModel, "embedding")
      val cand = math.max(200L, enc.count() / 4).toInt // enc is cached
      enc
        .withColumn("__d", PqIndex.adcResidualDistance(
          pq, annModel, col("__code"), col("cluster_id"), qVec))
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
      LIMIT 10"""))
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{Bridge, LangScore, LangScoreModel}

/** Deterministic character-n-gram language identification — the CCNet
  * pipeline stage that precedes perplexity filtering (Wenzek et al. 2020
  * run fastText langid before their LM filter; reference chat pipelines
  * ingest multilingual web text the same way). Re-expressed as exact
  * integer arithmetic so the stage is oracle-gateable and reproducible
  * across engines and partitionings:
  *
  *   1. TRAIN (`profiles`): per language, count character n-grams of the
  *      lowercased text, keep the TOP-K grams (count desc, gram asc), and
  *      store each as `lpm` = round(ln(langTotal / cnt) * 1e6) — integer
  *      micro-nats, the q133 recipe. One shuffle (gram counts,
  *      map-side-combined); the profile is (#langs x K) rows, a model
  *      artifact INDEPENDENT of corpus size.
  *   2. SCORE (`scores`): ONE map-only pass per doc — the collected
  *      profile rides a codegen'd [[LangScore]] expression that folds the
  *      doc's grams into a per-language BIGINT NLL array (grams absent
  *      from a language's profile pay a flat `penaltyMicro`). Exact
  *      integer sums, order-free. NOTHING shuffles: the first cut of this
  *      operator exploded grams and re-aggregated, which shuffled
  *      (grams x languages) rows — ~25M for 5k docs — and recomputed the
  *      profile job per plan reference; the expression form scores at
  *      scan speed and is the shape that survives 100 TB.
  *   3. PREDICT (`classify`): per-row argmin over the score array
  *      (array_min + first array_position), ties to the lexicographically
  *      first language — also map-only.
  *
  * The accuracy on separable corpora is pinned in LangIdSpec; the
  * distributed pipeline is gated hash-exact vs DuckDB (q213).
  */
object LangId {

  /** Character n-grams of an already-NORMALIZED text column as
    * array<string>; len < n -> empty. Callers lowercase ONCE in a prior
    * projection: an expression inside the transform lambda re-evaluates
    * per element, so `lower(text)` in here would re-lowercase the whole
    * document for every gram (measured: ~half of q213's training wall).
    */
  def grams(c: Column, n: Int): Column =
    when(length(c) < n, typedlit(Seq.empty[String]))
      .otherwise(transform(
        sequence(lit(1), length(c) - (n - 1)),
        i => substring(c, i, lit(n))))

  /** (lang, g, lpm): top-K grams per language with micro-nat NLL. */
  def profiles(docs: DataFrame, langCol: String, textCol: String,
      n: Int = 2, topK: Int = 64): DataFrame = {
    // parallelism floor: the corpus gram explosion + count is the heavy
    // map phase (R17JobProf: q213's profile build was one 2.6 s
    // single-task job over a 1-partition scan); no-op at scale (Par.fan)
    val g = Par.fan(
        docs.select(col(langCol).as("lang"), lower(col(textCol)).as("__lc")))
      .select(col("lang"), explode(grams(col("__lc"), n)).as("g"))
    val cnt = g.groupBy("lang", "g").agg(count(lit(1)).as("cnt"))
    // rank AND per-lang total from ONE window pass over the per-lang gram
    // counts (post-aggregation: |langs| x |distinct grams| rows, tiny) —
    // a separate tot aggregation would re-run the corpus gram explosion,
    // the expensive job here, a second time
    val p = Window.partitionBy(col("lang"))
    val w = p.orderBy(col("cnt").desc, col("g"))
    cnt
      .withColumn("__rk", row_number().over(w))
      .withColumn("tot",
        sum(col("cnt")).over(p.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .filter(col("__rk") <= topK)
      .select(col("lang"), col("g"),
        round(log(col("tot").cast("double") / col("cnt")) * 1e6)
          .cast("long").as("lpm"))
  }

  /** Collect the bounded profile frame (#langs x topK rows — a model, not
    * data) into the scoring model; langs sorted so the score array order
    * is the tie order.
    */
  def model(prof: DataFrame, n: Int, penaltyMicro: Long): LangScoreModel = {
    val rows = prof.select("lang", "g", "lpm").collect()
    val langs = rows.map(_.getString(0)).distinct.sorted
    val li = langs.zipWithIndex.toMap
    val m = new java.util.HashMap[String, Array[Long]]()
    rows.foreach { r =>
      val arr = m.computeIfAbsent(r.getString(1),
        _ => Array.fill(langs.length)(Long.MinValue))
      arr(li(r.getString(0))) = r.getLong(2)
    }
    LangScoreModel(langs, m, n, penaltyMicro)
  }

  private def scored(docs: DataFrame, mdl: LangScoreModel, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"), lower(col(textCol)).as("__lc"))
      .select(col("id"),
        // gram COUNT is pure arithmetic — no need to materialize the array
        greatest(length(col("__lc")) - (n - 1), lit(0))
          .cast("long").as("n_grams"),
        Bridge.toColumn(LangScore(Bridge.toExpr(col("__lc")), mdl)).as("sc"))
      .filter(col("n_grams") > 0) // gramless docs score nowhere (oracle rule)

  /** (id, lang, n_grams, nll_micro): every doc scored against every
    * language. The explode multiplies docs by #langs (the result's own
    * arity), never by gram count.
    */
  def scores(docs: DataFrame, prof: DataFrame, idCol: String,
      textCol: String, n: Int = 2,
      penaltyMicro: Long = 15000000L): DataFrame = {
    val mdl = model(prof, n, penaltyMicro)
    val langsLit = typedlit(mdl.langs.toSeq)
    scored(docs, mdl, idCol, textCol, n)
      .select(col("id"), col("n_grams"), posexplode(col("sc")))
      .select(col("id"),
        element_at(langsLit, col("pos").cast("int") + 1).as("lang"),
        col("n_grams"), col("col").as("nll_micro"))
  }

  /** (id, lang, nll_micro): the winning language per doc — map-only
    * argmin; first array_position = lowest index = lexicographically
    * first language on ties (langs are sorted).
    */
  def classify(docs: DataFrame, prof: DataFrame, idCol: String,
      textCol: String, n: Int = 2,
      penaltyMicro: Long = 15000000L): DataFrame =
    classifyWith(docs, model(prof, n, penaltyMicro), idCol, textCol, n)

  /** Model-reuse form: fit ONCE (model() runs the training job), score
    * many frames/batches at scan speed — the serving shape (PqIndex's
    * fit/search split). `model.n` must match `n`.
    */
  def classifyWith(docs: DataFrame, mdl: LangScoreModel, idCol: String,
      textCol: String, n: Int = 2): DataFrame = {
    val langsLit = typedlit(mdl.langs.toSeq)
    scored(docs, mdl, idCol, textCol, n)
      .select(col("id"),
        element_at(langsLit,
          array_position(col("sc"), array_min(col("sc"))).cast("int")).as("lang"),
        array_min(col("sc")).as("nll_micro"))
  }
}

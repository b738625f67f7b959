package graft.functions

/** Deterministic hash-projection text embedder.
  *
  * Stand-in for the reference's embedding models (768-d
  * sentence-transformers / instructor-xl, `app/backend/constants/
  * myscale_tables.py:90-92,117-120`) — no model downloads in this
  * environment, and the driver's `embeddings` test table is 64-d, so the
  * default dim is 64. The contract the engine cares about is only: text →
  * fixed-dim unit-norm Array[Float], deterministic across JVMs (no
  * `String.hashCode` dependence on nothing — we use an explicit FNV-1a +
  * splitmix64 mix so results are stable and documented).
  *
  * Used by [[NeuralArray]] (the `NeuralArray(entity)` Vector-SQL function,
  * reference `app/backend/constants/prompts.py:34`, `docs/vector-sql.md:78`)
  * and by ingest pipelines' batch embed stage (`app/backend/chat_bot/
  * tools.py:53-60`).
  */
object HashEmbedder {
  val DefaultDim = 64

  private def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001b3L; i += 1 }
    h
  }

  private def splitmix64(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Embed `text` into a unit-norm `dim`-d float vector. Each whitespace
    * token contributes 4 signed pseudo-random coordinates (feature-hashing
    * style), then the sum is L2-normalized.
    */
  def embed(text: String, dim: Int = DefaultDim): Array[Float] = {
    val acc = new Array[Double](dim)
    var start = 0
    val lower = text.toLowerCase
    val n = lower.length
    var i = 0
    while (i <= n) {
      if (i == n || Character.isWhitespace(lower.charAt(i))) {
        if (i > start) {
          var h = fnv1a(lower.substring(start, i))
          var j = 0
          while (j < 4) {
            h = splitmix64(h)
            val idx = java.lang.Long.remainderUnsigned(h >>> 8, dim.toLong).toInt
            acc(idx) += (if ((h & 1L) == 0L) 1.0 else -1.0)
            j += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var norm = 0.0
    i = 0
    while (i < dim) { norm += acc(i) * acc(i); i += 1 }
    val out = new Array[Float](dim)
    if (norm == 0.0) { out(0) = 1.0f; out }
    else {
      val inv = 1.0 / math.sqrt(norm)
      i = 0
      while (i < dim) { out(i) = (acc(i) * inv).toFloat; i += 1 }
      out
    }
  }

  /** Literal SQL text of an embedding — used to build oracle SQL with the
    * same query vector the Spark plan uses. Floats are printed via their
    * EXACT decimal expansion (every float32 is a dyadic rational, so the
    * expansion terminates and round-trips bit-exactly through a double
    * parser) — 9-significant-digit shortest forms would NOT re-parse to the
    * same double the Spark plan computes with.
    */
  def sqlArrayLiteral(v: Array[Float]): String =
    v.map(x => new java.math.BigDecimal(x.toDouble).toPlainString)
      .mkString("[", ", ", "]")
}

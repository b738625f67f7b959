package org.apache.spark.sql.graft

import org.apache.spark.sql.Column

/** Column-API entry points for graft's non-vector custom expressions. */
object GraftColumns {
  import Bridge.{toColumn, toExpr}
  def simhash64(c: Column): Column = toColumn(SimHash64(toExpr(c)))
  def simhash_poly(c: Column): Column = toColumn(SimHashPoly(toExpr(c)))
  def poly_hash_arr(c: Column, mod: Long): Column =
    toColumn(PolyHashArr(toExpr(c), mod))
  def minhash_sig(c: Column, nHashes: Int, mod: Long): Column =
    toColumn(MinHashSig(toExpr(c), nHashes, mod))
  def neural_array(c: Column): Column = toColumn(NeuralArray(toExpr(c)))
  def parse_datetime_best_effort(c: Column): Column =
    toColumn(ParseDateTimeBestEffort(toExpr(c), orNull = false))
}

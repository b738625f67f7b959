package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

/** ClickHouse vector-norm/distance dialect tail (CH "Distance
  * functions"): L1/Linf/Lp distances and norms plus normalizeL1/L2,
  * over the engine's `array<float>` vectors. Registered via
  * StaticInvoke (codegen'd static calls); the hot-path kernels
  * (cosine/L2/dot) remain the folded-query expressions in
  * VectorExpressions.scala — these complete the documented surface.
  * Mixed-precision accumulation in double, like L2Distance.
  */
object VectorNormOps {

  def l1Distance(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble); i += 1 }
    acc
  }

  def l2SquaredDistance(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = a.getFloat(i).toDouble - b.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }

  def linfDistance(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble)
      if (d > acc) acc = d
      i += 1
    }
    acc
  }

  def lpDistance(a: ArrayData, b: ArrayData, p: Double): Double = {
    require(p >= 1.0, s"LpDistance: p must be >= 1, got $p")
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      acc += math.pow(math.abs(a.getFloat(i).toDouble - b.getFloat(i).toDouble), p)
      i += 1
    }
    math.pow(acc, 1.0 / p)
  }

  def l1Norm(a: ArrayData): Double = {
    var acc = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) { acc += math.abs(a.getFloat(i).toDouble); i += 1 }
    acc
  }

  def l2Norm(a: ArrayData): Double = math.sqrt(l2SquaredNorm(a))

  def l2SquaredNorm(a: ArrayData): Double = {
    var acc = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) { val v = a.getFloat(i).toDouble; acc += v * v; i += 1 }
    acc
  }

  def linfNorm(a: ArrayData): Double = {
    var acc = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) {
      val v = math.abs(a.getFloat(i).toDouble)
      if (v > acc) acc = v
      i += 1
    }
    acc
  }

  def lpNorm(a: ArrayData, p: Double): Double = {
    require(p >= 1.0, s"LpNorm: p must be >= 1, got $p")
    var acc = 0.0; var i = 0
    val n = a.numElements()
    while (i < n) { acc += math.pow(math.abs(a.getFloat(i).toDouble), p); i += 1 }
    math.pow(acc, 1.0 / p)
  }

  /** Zero norm -> the vector unchanged (CH returns the input). */
  private def scaled(a: ArrayData, norm: Double): ArrayData = {
    val n = a.numElements()
    val out = new Array[Float](n)
    var i = 0
    if (norm == 0.0) { while (i < n) { out(i) = a.getFloat(i); i += 1 } }
    else { while (i < n) { out(i) = (a.getFloat(i).toDouble / norm).toFloat; i += 1 } }
    new GenericArrayData(out)
  }

  def normalizeL1(a: ArrayData): ArrayData = scaled(a, l1Norm(a))
  def normalizeL2(a: ArrayData): ArrayData = scaled(a, l2Norm(a))
}

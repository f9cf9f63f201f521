package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the portable-hash dedup operators.
  *
  * Semantics are IDENTICAL to the HOF formulations in
  * [[graft.pipeline.TextFunctions]] (and therefore to the DuckDB
  * oracles): hash60(s) = first 15 hex digits of md5(s) as a 60-bit
  * long. The HOF path pays an interpreted lambda dispatch per element
  * AND recomputes md5 once per MinHash permutation; these kernels run
  * one compiled loop with one md5 per element. CodegenFallback costs
  * one virtual call per ROW (not per element), which is noise next to
  * the per-element digest work.
  */
object HashKernels {

  val P: Long = 2147483647L

  /** hash60: first 8 md5 bytes big-endian, dropped low nibble. */
  def hash60(md: MessageDigest, s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h >>> 4
  }
}

/** MinHash signature over a string array: for seed j,
  * min over elements of `(a_j * (hash60(s) % P) + b_j) % P`; empty
  * arrays yield P for every seed — exactly
  * [[graft.pipeline.TextFunctions.minhashSignature]].
  */
case class MinHashSig(child: Expression, seedsA: Array[Long], seedsB: Array[Long])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = seedsA.length
    val mins = Array.fill(k)(HashKernels.P)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val base = HashKernels.hash60(md, arr.getUTF8String(i)) % HashKernels.P
      var j = 0
      while (j < k) {
        val v = (seedsA(j) * base + seedsB(j)) % HashKernels.P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash over a string array, `bits` wide — exactly
  * [[graft.pipeline.TextFunctions.simhash]]: bit i set iff the ±1 vote
  * sum over elements' hash60 bit i is positive.
  */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Long](bits)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    while (i < n) {
      val h = HashKernels.hash60(md, arr.getUTF8String(i))
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word k-shingles of a token array — exactly
  * [[graft.pipeline.TextFunctions.shingles]]: space-joined windows of
  * k tokens, de-duplicated in first-occurrence order (matching
  * `array_distinct`), empty when fewer than k tokens. The HOF form
  * pays an interpreted lambda + array `slice` + `concat_ws` expression
  * tree per window; this kernel is one compiled loop over the token
  * array, and dominates the dedup operators' scan cost.
  */
case class ShinglesK(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles_k"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[AnyRef])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    val seen = new java.util.LinkedHashSet[UTF8String](n * 2)
    i = 0
    while (i <= n - k) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      seen.add(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size)))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing fingerprints of a token array — exactly the HOF
  * formulation [[graft.pipeline.Curation.winnow]] used to build
  * (and the DuckDB oracle still does): positional k-shingle hash60s,
  * sliding-window (`w`) minima, de-duplicated in first-occurrence
  * order; fewer than k tokens yields no fingerprints, fewer than w
  * shingle hashes yields the distinct hashes themselves. One compiled
  * loop with one md5 per shingle, replacing an interpreted
  * lambda-per-window expression tree.
  */
case class WinnowFps(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, "shingle width and window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fps"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[UTF8String](n)
    var i = 0
    while (i < n) { toks(i) = arr.getUTF8String(i); i += 1 }
    val sep = UTF8String.fromString(" ")
    val md = MessageDigest.getInstance("MD5")
    val m = n - k + 1
    val h = new Array[Long](m)
    i = 0
    while (i < m) {
      val parts = new Array[UTF8String](k)
      var j = 0
      while (j < k) { parts(j) = toks(i + j); j += 1 }
      h(i) = HashKernels.hash60(md, UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long](m * 2)
    if (m < w) {
      i = 0
      while (i < m) { seen.add(h(i)); i += 1 }
    } else {
      var j = 0
      while (j <= m - w) {
        var min = h(j)
        var x = j + 1
        while (x < j + w) { if (h(x) < min) min = h(x); x += 1 }
        seen.add(min)
        j += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HashKernelFunctions {

  /** MinHash signature of a string-array column (native kernel). */
  def minhashSig(shinglesCol: Column, seeds: Seq[(Long, Long)]): Column =
    ColumnBridge.column(MinHashSig(
      ColumnBridge.expression(shinglesCol),
      seeds.map(_._1).toArray, seeds.map(_._2).toArray))

  /** SimHash of a string-array column (native kernel). */
  def simhash(toksCol: Column, bits: Int): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(toksCol), bits))

  /** Distinct k-shingles of a string-array column (native kernel). */
  def shingles(toksCol: Column, k: Int): Column =
    ColumnBridge.column(ShinglesK(ColumnBridge.expression(toksCol), k))

  /** Winnowing fingerprints of a token-array column (native kernel). */
  def winnowFps(toksCol: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFps(ColumnBridge.expression(toksCol), k, w))
}

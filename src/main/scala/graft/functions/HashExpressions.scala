package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass hashing kernels for the dedup pipeline. Semantically
  * identical to their built-in compositions (tested against them), but one
  * pass over the input with zero intermediate arrays:
  *
  *  - Hash60    == conv(substr(md5(s),1,15),16,10)::long  (60-bit md5 prefix)
  *  - MinHashSignature == k× array_min(transform(hs, h -> (a_i*h+b_i)%p))
  *  - SimHashBits      == 60× aggregate-of-bit-votes, sign-assembled
  *
  * The md5-prefix semantics are shared with the DuckDB oracle SQL, so these
  * stay value-checked cross-engine.
  */
case class Hash60(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "hash60"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    val md = Hash60.digest.get()
    md.reset()
    val d = md.digest(bytes)
    // first 15 hex chars = bytes 0..6 fully + high nibble of byte 7
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) >> 4) & 0xfL)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object Hash60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

/** All k affine minhash minimums in one pass over the hash array.
  * Empty input -> array of p (the family's "infinity"), matching the
  * composed form. */
case class MinHashSignature(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, p)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var j = 0
      while (j < k) {
        val x = (a(j) * h + b(j)) % p
        if (x < mins(j)) mins(j) = x
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box))
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 60-bit simhash: per-bit ±1 votes over the hash array, assembled by sign.
  * Empty input -> 0. */
case class SimHashBits(child: Expression) extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "simhash_bits"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val hs = v.asInstanceOf[ArrayData]
    val n = hs.numElements()
    if (n == 0) return 0L
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var bit = 0
      while (bit < 60) {
        votes(bit) += (((h >>> bit) & 1L).toInt << 1) - 1
        bit += 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit) > 0) out |= 1L << bit
      bit += 1
    }
    out
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * stay value-checked cross-engine. All three emit inline Java via
  * doGenCode so the dedup stages run inside whole-stage codegen (the md5
  * call goes through a static helper — the digest is thread-local).
  */
case class Hash60(child: Expression) extends UnaryExpression {
  override def prettyName: String = "hash60"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = Hash60.compute(v.asInstanceOf[UTF8String])
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Hash60$$.MODULE$$.compute($c);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

object Hash60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    // first 15 hex chars = bytes 0..6 fully + high nibble of byte 7
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) >> 4) & 0xfL)
  }
}

/** Whitespace-tokenize + 60-bit-md5-hash + mod-p, in one pass per row —
  * bit-identical to `transform(tokens(text), t -> pmod(hash60(t), p))`
  * (space-only trim like Spark's `trim`, Java-regex `\s+` split with
  * limit -1), but with no interpreted higher-order-function lambdas: the
  * HOF form pays lambda-interpretation cost per token and, being
  * non-codegen, re-evaluates under a Generate per OUTPUT row. */
case class TokenHashesMod(child: Expression, p: Long) extends UnaryExpression {
  override def prettyName: String = "token_hashes_mod"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenHashesMod.compute(v.asInstanceOf[UTF8String], p)
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenHashesMod$$.MODULE$$.compute($c, ${p}L);")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object TokenHashesMod {
  private val ws = java.util.regex.Pattern.compile("\\s+")
  def compute(s: UTF8String, p: Long): ArrayData = {
    val str = s.toString
    // space-only trim — Spark's trim() strips 0x20, not all whitespace
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    if (b == e) return new GenericArrayData(Array.emptyLongArray)
    val toks = ws.split(str.substring(b, e), -1)
    val out = new Array[Long](toks.length)
    var i = 0
    while (i < out.length) {
      out(i) = Hash60.compute(UTF8String.fromString(toks(i))) % p
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** All k affine minhash minimums in one pass over the hash array.
  * Empty input -> array of p (the family's "infinity"), matching the
  * composed form. */
case class MinHashSignature(child: Expression, a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression {
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
    new GenericArrayData(mins)
  }
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
    val i = ctx.freshName("i"); val j = ctx.freshName("j"); val h = ctx.freshName("h")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |final int $n = $c.numElements();
         |final long[] $mins = new long[${a.length}];
         |java.util.Arrays.fill($mins, ${p}L);
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $h = $c.getLong($i);
         |  for (int $j = 0; $j < ${a.length}; $j++) {
         |    final long x = ($aRef[$j] * $h + $bRef[$j]) % ${p}L;
         |    if (x < $mins[$j]) $mins[$j] = x;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** 60-bit simhash: per-bit ±1 votes over the hash array, assembled by sign.
  * Empty input -> 0. */
case class SimHashBits(child: Expression) extends UnaryExpression {
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
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val votes = ctx.freshName("votes")
    val i = ctx.freshName("i"); val b = ctx.freshName("b")
    val h = ctx.freshName("h"); val acc = ctx.freshName("acc")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |final int $n = $c.numElements();
         |long $acc = 0L;
         |if ($n > 0) {
         |  final int[] $votes = new int[60];
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = $c.getLong($i);
         |    for (int $b = 0; $b < 60; $b++) {
         |      $votes[$b] += ((int)(($h >>> $b) & 1L) << 1) - 1;
         |    }
         |  }
         |  for (int $b = 0; $b < 60; $b++) {
         |    if ($votes[$b] > 0) $acc |= 1L << $b;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

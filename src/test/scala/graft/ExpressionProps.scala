package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions._

/** Property tests over the custom expressions, evaluated directly (no
  * session): algebraic identities the kernels must satisfy for any input. */
object ExpressionProps extends Properties("graft.expressions") {

  private def litF(a: Array[Float]): Literal =
    Literal.create(new GenericArrayData(a.map(Float.box)), ArrayType(FloatType))
  private def litL(a: Array[Long]): Literal =
    Literal.create(new GenericArrayData(a.map(Long.box)), ArrayType(LongType))

  private val vecPair = for {
    n <- Gen.choose(1, 32)
    a <- Gen.listOfN(n, Gen.choose(-10.0f, 10.0f))
    b <- Gen.listOfN(n, Gen.choose(-10.0f, 10.0f))
  } yield (a.toArray, b.toArray)

  property("l2sqr == |a|^2 + |b|^2 - 2*dot") = forAll(vecPair) { case (a, b) =>
    val l2 = L2SqrDistance(litF(a), litF(b)).eval(null).asInstanceOf[Double]
    val dot = DotProduct(litF(a), litF(b)).eval(null).asInstanceOf[Double]
    val na = a.map(x => x.toDouble * x).sum
    val nb = b.map(x => x.toDouble * x).sum
    math.abs(l2 - (na + nb - 2 * dot)) <= 1e-6 * math.max(1.0, math.abs(l2))
  }

  property("l2sqr symmetric and nonnegative; zero iff equal") = forAll(vecPair) {
    case (a, b) =>
      val ab = L2SqrDistance(litF(a), litF(b)).eval(null).asInstanceOf[Double]
      val ba = L2SqrDistance(litF(b), litF(a)).eval(null).asInstanceOf[Double]
      val aa = L2SqrDistance(litF(a), litF(a)).eval(null).asInstanceOf[Double]
      ab == ba && ab >= 0.0 && aa == 0.0
  }

  property("cosine_distance in [0,2] (nonzero inputs)") = forAll(vecPair) {
    case (a, b) =>
      val d = CosineDistance(litF(a), litF(b)).eval(null).asInstanceOf[Double]
      d >= -1e-12 && d <= 2.0 + 1e-12
  }

  property("l2_normalize yields unit norm for nonzero vectors") = forAll(vecPair) {
    case (a, _) =>
      val out = L2Normalize(litF(a)).eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val norm = (0 until out.numElements()).map(i => out.getFloat(i).toDouble)
        .map(x => x * x).sum
      val inNorm = a.map(x => x.toDouble * x).sum
      if (inNorm == 0.0) norm == 0.0 else math.abs(norm - 1.0) < 1e-5
  }

  property("sparse dot on full encodings == dense dot") = forAll(vecPair) {
    case (a, b) =>
      val idx = new GenericArrayData(a.indices.map(Int.box).toArray)
      def sp(v: Array[Float]) = Literal.create(
        org.apache.spark.sql.catalyst.InternalRow(idx, new GenericArrayData(v.map(Float.box))),
        SparseVec.sqlType)
      val sd = SparseDot(sp(a), sp(b)).eval(null).asInstanceOf[Double]
      val dd = DotProduct(litF(a), litF(b)).eval(null).asInstanceOf[Double]
      math.abs(sd - dd) < 1e-9 * math.max(1.0, math.abs(dd))
  }

  property("hash60 == 60-bit prefix of md5 hex") = forAll(Gen.alphaNumStr) { s =>
    val got = Hash60(Literal.create(UTF8String.fromString(s), StringType))
      .eval(null).asInstanceOf[Long]
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    got == java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  private val hashArr = Gen.listOf(Gen.choose(0L, (1L << 60) - 1)).map(_.toArray)

  property("minhash signature is elementwise-monotone under union") =
    forAll(hashArr, hashArr) { (s, t) =>
      val fam = graft.pipeline.Dedup.hashFamily(8)
      val e = MinHashSignature(litL(s), fam.map(_._1).toArray, fam.map(_._2).toArray, 2147483647L)
      val eu = MinHashSignature(litL(s ++ t), fam.map(_._1).toArray, fam.map(_._2).toArray, 2147483647L)
      val sig = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val sigU = eu.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      (0 until 8).forall(i => sigU.getLong(i) <= sig.getLong(i))
    }

  property("simhash of a single hash is that hash") =
    forAll(Gen.choose(0L, (1L << 60) - 1)) { h =>
      SimHashBits(litL(Array(h))).eval(null).asInstanceOf[Long] == h
    }
}

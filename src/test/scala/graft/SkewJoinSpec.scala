package graft

import org.apache.spark.sql.functions._
import graft.query.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals plain join on a skewed key distribution") {
    // 90% of rows share key 1 (hot key)
    val large = (0 until 5000).map(i => (if (i % 10 == 0) i % 7 else 1, i.toLong))
      .toDF("k", "v")
    val small = (0 until 7).map(k => (k, s"dim$k")).toDF("k", "name")
    val plain = large.join(small, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedJoin(large, small, Seq("k"), saltFactor = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }

  test("twoStageSum equals direct groupBy sum") {
    val df = (0 until 10000).map(i => (if (i % 100 == 0) "rare" else "hot", i.toDouble))
      .toDF("k", "v")
    val direct = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val staged = SkewJoin.twoStageSum(df, Seq("k"), "v")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(staged == direct)
  }
}

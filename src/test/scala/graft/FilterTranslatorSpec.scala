package graft

import org.apache.spark.sql.functions._
import graft.filter.FilterTranslator

/** Grammar/type-rule parity tests for the filter translator
  * (reference behaviors cited in FilterTranslator's scaladoc). */
class FilterTranslatorSpec extends SparkSpec {
  import spark.implicits._

  lazy val df = Seq(
    (1, 10.5, "alpha", true, "x"),
    (2, 20.0, "beta", false, "y"),
    (3, -5.0, "gamma", true, "z"),
    (4, 0.0, "", false, "x")
  ).toDF("id", "score", "name", "flag", "tag")

  private def ids(filter: String): Seq[Int] =
    df.filter(FilterTranslator.translate(filter, df.schema))
      .select("id").orderBy("id").collect().map(_.getInt(0)).toSeq

  test("comparisons and precedence") {
    assert(ids("id >= 2 AND score < 15 OR name = 'alpha'") == Seq(1, 3, 4))
    assert(ids("NOT (id = 1 OR id = 2)") == Seq(3, 4))
    assert(ids("id <> 2") == Seq(1, 3, 4))
  }
  test("arithmetic incl. % and unary minus") {
    assert(ids("id % 2 = 0") == Seq(2, 4))
    assert(ids("score * 2 + 1 > 20") == Seq(1, 2))
    assert(ids("-score > 1") == Seq(3))
    assert(ids("id * 1.5 >= 4.5") == Seq(3, 4))
  }
  test("string concat with + and LIKE edge cases") {
    assert(ids("name + tag = 'alphax'") == Seq(1))
    assert(ids("name LIKE '%a'") == Seq(1, 2, 3))
    assert(ids("name LIKE ''") == Seq(4))       // '' pattern matches only ''
    assert(ids("name LIKE '%'") == Seq(1, 2, 3, 4)) // '%' matches all
    assert(ids("name LIKE '_et_'") == Seq(2))
  }
  test("IN over strings; rejected over non-strings") {
    assert(ids("name IN ('alpha', 'gamma')") == Seq(1, 3))
    intercept[UnsupportedOperationException](ids("id IN ('1')"))
  }
  test("boolean fields and literals") {
    assert(ids("flag") == Seq(1, 3))
    assert(ids("flag = TRUE") == Seq(1, 3))
    assert(ids("NOT flag AND id > 2") == Seq(4))
  }
  test("type rules: rejected expressions") {
    intercept[IllegalArgumentException](ids("name < 'b'"))       // < on strings
    intercept[IllegalArgumentException](ids("flag + 1 > 0"))     // arith on bool
    intercept[IllegalArgumentException](ids("id = 'x'"))         // type mismatch
    intercept[IllegalArgumentException](ids("score"))            // non-boolean filter
    intercept[IllegalArgumentException](ids("nosuch = 1"))       // unknown field
  }
  test("explicitly unsupported tokens error") {
    intercept[UnsupportedOperationException](ids("id BETWEEN 1 AND 2"))
    intercept[UnsupportedOperationException](ids("id & 1 = 1"))
  }
  test("string escape: doubled quote") {
    val d2 = Seq((1, "o'brien")).toDF("id", "name")
    val n = d2.filter(FilterTranslator.translate("name = 'o''brien'", d2.schema)).count()
    assert(n == 1)
  }
  test("empty filter matches everything") {
    assert(ids("") == Seq(1, 2, 3, 4))
  }
  test("numeric literal edge cases") {
    assert(ids("score > 1.05e1") == Seq(2))      // exponent notation
    assert(ids("score > -1e10") == Seq(1, 2, 3, 4))
    assert(ids("id = 2.0") == Seq(2))            // int/double coercion
    assert(ids("score >= .5") == Seq(1, 2))      // leading-dot decimal
  }
  test("deep nesting and mixed precedence") {
    assert(ids("NOT (NOT (id = 1 OR (id = 2 AND flag = FALSE)))") == Seq(1, 2))
    assert(ids("id + 1 * 2 = 5") == Seq(3))      // * binds tighter than +
    assert(ids("(id + 1) * 2 = 6") == Seq(2))
  }
  test("malformed filters raise clear errors") {
    intercept[IllegalArgumentException](ids("id ="))
    intercept[IllegalArgumentException](ids("(id = 1"))
    intercept[IllegalArgumentException](ids("id = 1)"))
    intercept[IllegalArgumentException](ids("name = 'unterminated"))
    intercept[IllegalArgumentException](ids("AND id = 1"))
  }
}

package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Translator from the reference's filter-expression language to a Catalyst
  * `Column`. The reference implements a tokenizer + shunting-yard + typed
  * postfix interpreter (reference: engine/db/expr/expr.cpp:90-694,
  * expr_evaluator.cpp:111-258); here the same grammar is parsed by a small
  * recursive-descent parser and *compiled to a Catalyst expression tree*, so
  * evaluation happens inside whole-stage codegen instead of a per-row
  * interpreter.
  *
  * Grammar (closed over expr_types.hpp:11-49):
  *   expr    := or
  *   or      := and (OR and)*
  *   and     := not (AND not)*
  *   not     := NOT not | cmp
  *   cmp     := add (( < | <= | = | >= | > | <> ) add)?
  *            | add LIKE string | add IN '(' string (',' string)* ')'
  *   add     := mul (( + | - ) mul)*
  *   mul     := unary (( * | / | % ) unary)*
  *   unary   := '-' unary | primary
  *   primary := number | string | TRUE | FALSE | ident | '@distance'
  *            | NEARBY '(' ident ',' num ',' num ',' num ')' | '(' expr ')'
  *
  * Type rules preserved from the reference (expr.cpp:387-450):
  *   - logical ops require boolean operands
  *   - < <= > >= forbid STRING/BOOL operands
  *   - = <> require same type, with INT<->DOUBLE coercion allowed
  *   - arithmetic forbids BOOL; forbids STRING except `+` = concat
  *   - `%` on doubles is fmod (Spark's `%` matches)
  *   - IN lists are string-only (expr.cpp:503-505)
  *   - explicit NOT_IMPLEMENTED: ALL/ANY/BETWEEN/EXISTS/SOME, bitwise & | ^
  */
object FilterTranslator {

  sealed trait Tok
  case class TIdent(s: String) extends Tok
  case class TNum(v: Double, isInt: Boolean) extends Tok
  case class TStr(s: String) extends Tok
  case class TOp(s: String) extends Tok
  case object TEOF extends Tok

  private val keywords = Set("AND", "OR", "NOT", "LIKE", "IN", "NEARBY", "TRUE", "FALSE")
  private val rejected = Set("ALL", "ANY", "BETWEEN", "EXISTS", "SOME")

  def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < n && s(i + 1).isDigit)) {
        val start = i
        var isInt = true
        while (i < n && (s(i).isDigit || s(i) == '.' || s(i) == 'e' || s(i) == 'E' ||
          ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E')))) {
          if (s(i) == '.' || s(i) == 'e' || s(i) == 'E') isInt = false
          i += 1
        }
        out += TNum(s.substring(start, i).toDouble, isInt)
      } else if (c == '\'') {
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw new IllegalArgumentException(s"unterminated string in filter: $s")
          if (s(i) == '\'') {
            if (i + 1 < n && s(i + 1) == '\'') { sb += '\''; i += 2 } // '' escape
            else { done = true; i += 1 }
          } else { sb += s(i); i += 1 }
        }
        out += TStr(sb.toString)
      } else if (c.isLetter || c == '_' || c == '@') {
        val start = i
        i += 1
        while (i < n && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        val word = s.substring(start, i)
        val up = word.toUpperCase
        if (rejected.contains(up))
          throw new UnsupportedOperationException(s"$up is not supported") // expr.cpp:64-69
        if (keywords.contains(up)) out += TOp(up) else out += TIdent(word)
      } else c match {
        case '<' =>
          if (i + 1 < n && s(i + 1) == '=') { out += TOp("<="); i += 2 }
          else if (i + 1 < n && s(i + 1) == '>') { out += TOp("<>"); i += 2 }
          else { out += TOp("<"); i += 1 }
        case '>' =>
          if (i + 1 < n && s(i + 1) == '=') { out += TOp(">="); i += 2 }
          else { out += TOp(">"); i += 1 }
        case '=' => out += TOp("="); i += 1
        case '+' | '-' | '*' | '/' | '%' | '(' | ')' | ',' =>
          out += TOp(c.toString); i += 1
        case '&' | '|' | '^' => // expr.cpp:131-132
          throw new UnsupportedOperationException(s"bitwise '$c' is not supported")
        case other =>
          throw new IllegalArgumentException(s"unexpected character '$other' in filter: $s")
      }
    }
    (out += TEOF).result()
  }

  /** Compile a filter string against a table schema to a boolean Column. */
  def translate(filter: String, schema: StructType): Column = {
    if (filter == null || filter.trim.isEmpty) lit(true)
    else new Parser(tokenize(filter), schema).parse()
  }

  /** Compile a scalar expression (any result type) — used by facet group /
    * aggregate arguments, which share the filter grammar
    * (reference: db_server.cpp:384-456). */
  def translateScalar(expr: String, schema: StructType): Column =
    new Parser(tokenize(expr), schema).parseScalar()

  /** Typed column: carries enough type info for the reference's checks. */
  private case class TC(col: Column, dt: DataType)

  private class Parser(toks: Vector[Tok], schema: StructType) {
    private var pos = 0
    private def peek: Tok = toks(pos)
    private def next(): Tok = { val t = toks(pos); pos += 1; t }
    private def expectOp(op: String): Unit = next() match {
      case TOp(`op`) => ()
      case other => throw new IllegalArgumentException(s"expected '$op', got $other")
    }

    def parse(): Column = {
      val r = or()
      if (peek != TEOF) throw new IllegalArgumentException(s"trailing tokens at $pos")
      require(r.dt == BooleanType, "filter must be a boolean expression")
      r.col
    }

    def parseScalar(): Column = {
      val r = or()
      if (peek != TEOF) throw new IllegalArgumentException(s"trailing tokens at $pos")
      r.col
    }

    private def or(): TC = {
      var l = and()
      while (peek == TOp("OR")) {
        next(); val r = and()
        requireBool(l, r, "OR")
        l = TC(l.col || r.col, BooleanType)
      }
      l
    }
    private def and(): TC = {
      var l = not()
      while (peek == TOp("AND")) {
        next(); val r = not()
        requireBool(l, r, "AND")
        l = TC(l.col && r.col, BooleanType)
      }
      l
    }
    private def not(): TC = peek match {
      case TOp("NOT") =>
        next(); val c = not()
        require(c.dt == BooleanType, "NOT requires a boolean operand")
        TC(!c.col, BooleanType)
      case _ => cmp()
    }

    private def requireBool(l: TC, r: TC, op: String): Unit =
      require(l.dt == BooleanType && r.dt == BooleanType, s"$op requires boolean operands")

    private def isNumeric(dt: DataType): Boolean = dt match {
      case _: NumericType => true
      case _ => false
    }

    private def cmp(): TC = {
      val l = add()
      peek match {
        case TOp(op @ ("<" | "<=" | ">" | ">=")) =>
          next(); val r = add()
          require(isNumeric(l.dt) && isNumeric(r.dt),
            s"'$op' does not support STRING/BOOL operands") // expr.cpp:395-411
          TC(op match {
            case "<" => l.col < r.col
            case "<=" => l.col <= r.col
            case ">" => l.col > r.col
            case ">=" => l.col >= r.col
          }, BooleanType)
        case TOp(op @ ("=" | "<>")) =>
          next(); val r = add()
          val ok = (l.dt == r.dt) || (isNumeric(l.dt) && isNumeric(r.dt))
          require(ok, s"'$op' requires operands of the same type")
          TC(if (op == "=") l.col === r.col else l.col =!= r.col, BooleanType)
        case TOp("LIKE") =>
          next()
          val pat = next() match {
            case TStr(s) => s
            case other => throw new IllegalArgumentException(s"LIKE requires a string literal, got $other")
          }
          require(l.dt == StringType, "LIKE requires a string operand")
          TC(l.col.like(pat), BooleanType)
        case TOp("IN") =>
          next(); expectOp("(")
          val items = scala.collection.mutable.ArrayBuffer[String]()
          var done = false
          while (!done) next() match {
            case TStr(s) => items += s
              peek match {
                case TOp(",") => next()
                case TOp(")") => next(); done = true
                case other => throw new IllegalArgumentException(s"bad IN list near $other")
              }
            case other =>
              // string-only IN lists, expr.cpp:503-505
              throw new UnsupportedOperationException(s"IN supports string literals only, got $other")
          }
          if (l.dt != StringType) // expr.cpp:503-505 NOT_IMPLEMENTED
            throw new UnsupportedOperationException("IN supports string attributes only")
          TC(l.col.isin(items.toSeq: _*), BooleanType)
        case _ => l
      }
    }

    private def add(): TC = {
      var l = mul()
      while (peek == TOp("+") || peek == TOp("-")) {
        val TOp(op) = next(): @unchecked
        val r = mul()
        if (op == "+" && l.dt == StringType && r.dt == StringType)
          l = TC(concat(l.col, r.col), StringType) // string + = concat, expr.cpp:427-440
        else {
          require(isNumeric(l.dt) && isNumeric(r.dt), s"'$op' requires numeric operands")
          l = TC(if (op == "+") l.col + r.col else l.col - r.col, widen(l.dt, r.dt))
        }
      }
      l
    }
    private def mul(): TC = {
      var l = unary()
      while (peek == TOp("*") || peek == TOp("/") || peek == TOp("%")) {
        val TOp(op) = next(): @unchecked
        val r = unary()
        require(isNumeric(l.dt) && isNumeric(r.dt), s"'$op' requires numeric operands")
        l = TC(op match {
          case "*" => l.col * r.col
          case "/" => l.col / r.col
          case "%" => l.col % r.col // fmod on doubles, matching the reference
        }, widen(l.dt, r.dt))
      }
      l
    }

    /** result type DOUBLE if either side is fractional else INT (expr.cpp:441-449);
      * FLOAT attributes evaluate as DOUBLE (expr.cpp:660-663). */
    private def widen(a: DataType, b: DataType): DataType = (a, b) match {
      case (DoubleType, _) | (_, DoubleType) | (FloatType, _) | (_, FloatType) => DoubleType
      case _ => LongType
    }

    private def unary(): TC = peek match {
      case TOp("-") =>
        next(); val c = unary()
        require(isNumeric(c.dt), "unary '-' requires a numeric operand")
        TC(-c.col, c.dt)
      case _ => primary()
    }

    private def primary(): TC = next() match {
      case TNum(v, isInt) =>
        if (isInt && v.isWhole && math.abs(v) < 9.2e18) TC(lit(v.toLong), LongType)
        else TC(lit(v), DoubleType)
      case TStr(s) => TC(lit(s), StringType)
      case TOp("TRUE") => TC(lit(true), BooleanType)
      case TOp("FALSE") => TC(lit(false), BooleanType)
      case TOp("(") =>
        val e = or(); expectOp(")"); e
      case TOp("NEARBY") =>
        // NEARBY(geoField, lat, lon, radiusKm) — expr.cpp:532-608
        expectOp("(")
        val fieldTok = next() match {
          case TIdent(f) => f
          case other => throw new IllegalArgumentException(s"NEARBY requires a geo field, got $other")
        }
        def num(): Double = next() match {
          case TNum(v, _) => v
          case TOp("-") => next() match {
            case TNum(v, _) => -v
            case other => throw new IllegalArgumentException(s"NEARBY requires numeric args, got $other")
          }
          case other => throw new IllegalArgumentException(s"NEARBY requires numeric args, got $other")
        }
        expectOp(","); val la = num()
        expectOp(","); val lo = num()
        expectOp(","); val km = num()
        expectOp(")")
        val f = field(fieldTok)
        require(f.dt.isInstanceOf[StructType], s"NEARBY field $fieldTok must be GEO_POINT")
        TC(graft.functions.nearby(
          f.col.getField("latitude"), f.col.getField("longitude"), la, lo, km), BooleanType)
      case TIdent(name) => field(name)
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }

    private def field(name: String): TC = {
      if (name == "@distance") TC(col("@distance"), DoubleType) // expr.cpp:134-139
      else schema.fields.find(_.name == name) match {
        case Some(f) =>
          // FLOAT attrs evaluate as DOUBLE (expr.cpp:660-663): widen() handles it
          TC(col(name), f.dataType)
        case None => throw new IllegalArgumentException(s"unknown field '$name' in filter")
      }
    }
  }
}

package graft.filter

import graft.types.{FieldType, TableSchema}

/** The serving tier's filter sub-grammar: a conjunction of
  * `ident op literal` comparisons —
  *
  *   conds := cond (AND cond)* ; cond := ident (< | <= | > | >= | = | <>) lit
  *
  * Anything outside it (OR/NOT, arithmetic, LIKE/IN/NEARBY, @distance,
  * column-vs-column) returns None and the caller declines to the job path,
  * which evaluates the FULL grammar exactly (FilterTranslator). The subset
  * shares FilterTranslator's tokenizer and mirrors its type rules
  * (reference: engine/db/expr/expr.cpp:387-450 — ordering ops forbid
  * STRING/BOOL; equality allows INT<->DOUBLE coercion), so a parsed Cond
  * list evaluated over resident scalar values is semantically identical to
  * the Catalyst plan the job path would run. */
object SimpleConjuncts {

  sealed trait Lit
  /** isInt mirrors FilterTranslator's literal typing: an integral literal
    * compares exactly as a long against integer columns (lit(v.toLong)). */
  final case class NumLit(v: Double, isInt: Boolean) extends Lit
  final case class StrLit(s: String) extends Lit
  final case class BoolLit(b: Boolean) extends Lit

  /** op ∈ { < <= > >= = <> }. */
  final case class Cond(col: String, op: String, value: Lit)

  private val CmpOps = Set("<", "<=", ">", ">=", "=", "<>")
  private val NumericTypes: Set[FieldType.Value] = Set(
    FieldType.TinyInt, FieldType.SmallInt, FieldType.Int4, FieldType.BigInt,
    FieldType.Float4, FieldType.Double8)

  /** None = the filter is outside the serve sub-grammar (or fails the type
    * rules — the job path then raises the same parity error a non-serve
    * request would). */
  def parse(filter: String, schema: TableSchema): Option[Seq[Cond]] = {
    import FilterTranslator._
    val toks =
      try tokenize(filter)
      catch { case _: Exception => return None }
    val out = Seq.newBuilder[Cond]
    var i = 0
    def lit(): Option[Lit] = toks(i) match {
      case TNum(v, isInt) => i += 1; Some(NumLit(v, isInt))
      case TOp("-") => toks(i + 1) match {
        case TNum(v, isInt) => i += 2; Some(NumLit(-v, isInt))
        case _ => None
      }
      case TStr(s) => i += 1; Some(StrLit(s))
      case TOp("TRUE") => i += 1; Some(BoolLit(true))
      case TOp("FALSE") => i += 1; Some(BoolLit(false))
      case _ => None
    }
    while (true) {
      val name = toks(i) match {
        case TIdent(n) => i += 1; n
        case _ => return None
      }
      val op = toks(i) match {
        case TOp(o) if CmpOps(o) => i += 1; o
        case _ => return None
      }
      val v = lit() match { case Some(l) => l; case None => return None }
      val f = schema.fields.find(_.name == name).getOrElse(return None)
      val typed = (op, v) match {
        case (_, NumLit(_, _)) => NumericTypes(f.fieldType)
        case (("=" | "<>"), StrLit(_)) =>
          f.fieldType == FieldType.Str || f.fieldType == FieldType.Json
        case (("=" | "<>"), BoolLit(_)) => f.fieldType == FieldType.Bool
        case _ => false // ordering on STRING/BOOL (expr.cpp:395-411)
      }
      if (!typed) return None
      out += Cond(name, op, v)
      toks(i) match {
        case TOp("AND") => i += 1
        case TEOF => return Some(out.result())
        case _ => return None
      }
    }
    None // unreachable
  }

  /** Canonical key for caching a parsed conjunction's evaluation result. */
  def key(conds: Seq[Cond]): String = conds.map {
    case Cond(c, op, NumLit(v, ii)) => s"$c$op#n$v/$ii"
    case Cond(c, op, StrLit(s)) => s"$c$op#s$s"
    case Cond(c, op, BoolLit(b)) => s"$c$op#b$b"
  }.mkString("&")

  // ---- literal-vs-value comparison kernels (Spark-coercion semantics) ----

  @inline private def cmpOk(op: String, c: Int): Boolean = op match {
    case "=" => c == 0
    case "<>" => c != 0
    case "<" => c < 0
    case "<=" => c <= 0
    case ">" => c > 0
    case ">=" => c >= 0
  }

  /** Long column value vs numeric literal: exact long compare for integral
    * literals (Catalyst compares INT columns to a long literal as bigint),
    * double compare otherwise (INT<->DOUBLE coercion). */
  def evalLong(op: String, x: Long, l: NumLit): Boolean =
    if (l.isInt && l.v.isWhole && math.abs(l.v) < 9.2e18)
      cmpOk(op, java.lang.Long.compare(x, l.v.toLong))
    else cmpOk(op, java.lang.Double.compare(x.toDouble, l.v))

  /** Float/double column value vs numeric literal (floats widen to double
    * exactly — expr.cpp:660-663). */
  def evalDouble(op: String, x: Double, l: NumLit): Boolean =
    cmpOk(op, java.lang.Double.compare(x, l.v))

  def evalString(op: String, x: String, l: StrLit): Boolean =
    x != null && cmpOk(op, x.compareTo(l.s))

  def evalBool(op: String, x: Boolean, l: BoolLit): Boolean =
    cmpOk(op, java.lang.Boolean.compare(x, l.b))
}

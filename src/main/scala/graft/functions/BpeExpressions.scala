package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Greedy longest-match subword tokenization against a FIXED vocabulary —
  * the apply step of a trained BPE/WordPiece model (the public algorithm;
  * the vocabulary is an input, e.g. a merges/vocab file). Per whitespace
  * word, repeatedly emit the LONGEST vocabulary entry prefixing the
  * remaining suffix; when nothing matches, fall back to the single next
  * character (standard byte/char fallback). Deterministic, map-only, the
  * vocabulary rides the expression as a broadcast-style reference object —
  * no join, no shuffle, stays inside whole-stage codegen via a static
  * kernel (same pattern as [[NearestCentroidsExact]]).
  *
  * Mirrored in the DuckDB oracle by a recursive CTE over distinct words
  * (`starts_with(rest, v)` + max(len(v)) per step), so both engines agree
  * word for word. Word boundaries are `\s+` on trimmed text — identical
  * to [[graft.pipeline.TextAnalysis.tokens]]. Positions are UTF-16 code
  * units; the oracle counts codepoints — identical on the BMP text this
  * engine's corpora carry (documents are ASCII; a vocab entry with
  * astral-plane characters would need a codepoint-stepping variant). */
case class BpeGreedyTokens(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  override def prettyName: String = "bpe_greedy_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val table: BpeGreedyTokens.Vocab =
    new BpeGreedyTokens.Vocab(vocab.toArray)

  override def nullSafeEval(t: Any): Any =
    BpeGreedyTokens.tokenize(t.asInstanceOf[UTF8String], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vocabRef = ctx.addReferenceObj("bpeVocab", table,
      classOf[BpeGreedyTokens.Vocab].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.BpeGreedyTokens$$.MODULE$$
         |  .tokenize($c, $vocabRef);""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeGreedyTokens {
  /** Pre-indexed vocabulary: membership set + max entry length bound the
    * per-position probe to maxLen substring lookups. */
  final class Vocab(entries: Array[String]) extends Serializable {
    val set = new java.util.HashSet[String](math.max(16, entries.length * 2))
    entries.foreach(set.add)
    val maxLen: Int = entries.foldLeft(0)((m, e) => math.max(m, e.length))
  }

  def tokenize(text: UTF8String, v: Vocab): ArrayData = {
    // trim SPACES only — Spark's trim() and DuckDB's trim() strip ' ',
    // while Java's String.trim strips every char <= 0x20 (a word of
    // control bytes would silently vanish and desync from the oracle)
    val raw = text.toString
    var st = 0; var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val s = raw.substring(st, en)
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef]()
    for (w <- s.split("\\s+") if w.nonEmpty) {
      val wl = w.length
      var i = 0
      while (i < wl) {
        var l = math.min(v.maxLen, wl - i)
        var m = 0
        while (l >= 1 && m == 0) {
          if (v.set.contains(w.substring(i, i + l))) m = l else l -= 1
        }
        if (m == 0) m = 1 // char fallback (also the empty-vocab path)
        out.add(UTF8String.fromString(w.substring(i, i + m)))
        i += m
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** One BPE TRAINING merge step applied to a symbol array: greedy
  * left-to-right replacement of every adjacent (left, right) pair with
  * the concatenated symbol — Sennrich et al. 2016's merge operation
  * (overlaps resolve leftmost: [a,a,a] under (a,a) -> [aa, a]). Map-only,
  * codegen'd via a static kernel; the trainer calls this once per round
  * over the distinct-WORD table, never over the corpus. */
case class BpeMergePair(child: Expression, left: String, right: String)
    extends UnaryExpression {
  override def prettyName: String = "bpe_merge_pair"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val lu = UTF8String.fromString(left)
  @transient private lazy val ru = UTF8String.fromString(right)
  @transient private lazy val mu = UTF8String.fromString(left + right)

  override def nullSafeEval(a: Any): Any =
    BpeMergePair.merge(a.asInstanceOf[ArrayData], lu, ru, mu)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = ctx.addReferenceObj("bpeL", lu, classOf[UTF8String].getName)
    val r = ctx.addReferenceObj("bpeR", ru, classOf[UTF8String].getName)
    val m = ctx.addReferenceObj("bpeM", mu, classOf[UTF8String].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.BpeMergePair$$.MODULE$$
         |  .merge($c, $l, $r, $m);""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeMergePair {
  def merge(toks: ArrayData, l: UTF8String, r: UTF8String,
      m: UTF8String): ArrayData = {
    val n = toks.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (i + 1 < n && toks.getUTF8String(i).equals(l) &&
          toks.getUTF8String(i + 1).equals(r)) {
        out.add(m); i += 2
      } else {
        out.add(toks.getUTF8String(i)); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Merge-ORDER BPE encode — the canonical inference of a trained BPE
  * model (Sennrich et al. 2016 / the HF tokenizers algorithm): per word,
  * repeatedly merge the adjacent pair with the LOWEST merge rank until no
  * adjacent pair is in the merge table (each round merges every
  * occurrence of that pair, greedy leftmost). For a merge list produced
  * by training this equals applying the merges in rank order — a pair
  * involving a merged symbol always ranks after the merge that created
  * the symbol — and reproduces each training word's final training
  * segmentation exactly. [[BpeGreedyTokens]] is the longest-match
  * (WordPiece-style) heuristic over a FLAT vocab; this is the faithful
  * apply for a merges file / [[graft.pipeline.TextAnalysis.bpeFit]]
  * output. Map-only, static-kernel codegen, same trim/split contract as
  * the other text kernels; word symbols seed by CODE POINT (surrogate
  * pairs stay whole), matching the fit's regex-split seeding on any
  * text, BMP or not. O(rounds * len) per word with O(1) hash rank
  * lookups; rank-scan loops suit bounded merge lists (a 30k-merge
  * production encode would want the heap variant — documented cutover). */
case class BpeMergeOrderTokens(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {
  override def prettyName: String = "bpe_merge_order_tokens"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  @transient private lazy val table: BpeMergeOrderTokens.Ranks =
    new BpeMergeOrderTokens.Ranks(merges)

  override def nullSafeEval(t: Any): Any =
    BpeMergeOrderTokens.tokenize(t.asInstanceOf[UTF8String], table)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", table,
      classOf[BpeMergeOrderTokens.Ranks].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.BpeMergeOrderTokens$$.MODULE$$
         |  .tokenize($c, $ranksRef);""".stripMargin)
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BpeMergeOrderTokens {
  /** pair -> rank (key = "left right"; merge symbols never contain
    * whitespace — words come from a \s+ split — so the space-joined key
    * is unambiguous); first listing of a duplicate pair wins (training
    * never emits duplicates; a malformed file stays deterministic). */
  final class Ranks(merges: Seq[(String, String)]) extends Serializable {
    val map = new java.util.HashMap[String, Integer](
      math.max(16, merges.length * 2))
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      map.putIfAbsent(l + " " + r, Integer.valueOf(i))
    }
  }

  def tokenize(text: UTF8String, ranks: Ranks): ArrayData = {
    // trim SPACES only (the BpeGreedyTokens contract and why)
    val raw = text.toString
    var st = 0; var en = raw.length
    while (st < en && raw.charAt(st) == ' ') st += 1
    while (en > st && raw.charAt(en - 1) == ' ') en -= 1
    val s = raw.substring(st, en)
    if (s.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef]()
    for (w <- s.split("\\s+") if w.nonEmpty) {
      // seed symbols by CODE POINT, not UTF-16 unit: the fit seeds with
      // a regex split (code-point aware), so charAt seeding would break
      // surrogate pairs into lone halves and never match learned merges
      // on non-BMP text
      var toks = new Array[String](w.codePointCount(0, w.length))
      var ci = 0
      var off = 0
      while (off < w.length) {
        val n = Character.charCount(w.codePointAt(off))
        toks(ci) = w.substring(off, off + n)
        ci += 1; off += n
      }
      var done = false
      while (!done && toks.length > 1) {
        var best = -1
        var bl: String = null; var br: String = null
        var i = 0
        while (i < toks.length - 1) {
          val r = ranks.map.get(toks(i) + " " + toks(i + 1))
          if (r != null && (best == -1 || r.intValue < best)) {
            best = r.intValue; bl = toks(i); br = toks(i + 1)
          }
          i += 1
        }
        if (best == -1) done = true
        else {
          val nb = new java.util.ArrayList[String](toks.length)
          var j = 0
          while (j < toks.length) {
            if (j + 1 < toks.length && toks(j) == bl && toks(j + 1) == br) {
              nb.add(bl + br); j += 2
            } else { nb.add(toks(j)); j += 1 }
          }
          toks = nb.toArray(new Array[String](nb.size))
        }
      }
      var k = 0
      while (k < toks.length) { out.add(UTF8String.fromString(toks(k))); k += 1 }
    }
    new GenericArrayData(out.toArray)
  }
}

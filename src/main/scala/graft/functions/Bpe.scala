package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy-merge BPE token counting — the tokenizer-accurate tier above the
  * chars/words heuristic (`TextAnalysis.tokenEstimate`): training-data
  * budgeting at 10^12 tokens deserves counts from a real merge vocabulary.
  * Pure Scala, deterministic, zero dependencies.
  *
  * Semantics: a merge list in learned order (the `merges.txt` convention —
  * each line joins two existing tokens; a token exists if it is a single
  * character or the output of an EARLIER line). Tokenization applies each
  * merge exhaustively, in vocabulary order, left-to-right. For any
  * well-formed learned vocabulary this is EQUIVALENT to the classic
  * highest-priority-pair-first BPE loop: a merge's output symbol can only
  * appear in later merges' pairs (it did not exist earlier), so once merge
  * k is exhausted, no later merge can create a new match for it — the
  * in-order pass misses nothing. The in-order form is one linear
  * `replace` pass per merge (O(len·|vocab|), no heap/priority queue) AND
  * is expressible in ANY engine as nested `replace()` calls, which is what
  * makes the count ORACLE-CHECKABLE in SQL (see [[Bpe.oracleSqlExpr]]).
  *
  * Mechanics: merge outputs are materialized as private-use-area
  * characters (U+E000 + merge index), so a symbol is always exactly one
  * JVM char and each merge is a literal 2-char → 1-char replace. Input
  * text is stripped of any pre-existing PUA characters first (collision
  * guard — they cannot be legitimate corpus text). Merges never contain
  * whitespace, so the replace pass runs on WHOLE documents without word
  * splitting; the final count is the non-whitespace symbol count
  * (whitespace = {space, \t, \n, \r, \f}, the same set on the SQL face).
  */
object Bpe {

  val PuaBase = 0xE000
  val MaxMerges = 256

  private[functions] def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f'
  private def isPua(c: Char): Boolean = c >= PuaBase && c < PuaBase + MaxMerges

  /** A validated merge vocabulary. Construct via [[Vocab.fromMerges]] /
    * [[Vocab.fromFile]] or use [[Vocab.default]]. */
  final class Vocab private[Bpe] (
      /** the loaded surface pairs, in merge order (for docs/round-trip) */
      val mergeSurfaces: IndexedSeq[(String, String)],
      /** pairs(k): the 2-char symbol pair merge k rewrites */
      private[graft] val pairs: Array[String],
      /** outs(k): merge k's output symbol (PUA char) */
      private[graft] val outs: Array[Char]) extends Serializable {
    def size: Int = pairs.length
  }

  object Vocab {
    /** Build from (left, right) surface pairs in learned order. Each side
      * must be a single non-PUA, non-whitespace character or the exact
      * surface of an earlier merge's output; outputs must be unique.
      * Violations raise — a malformed vocabulary must never silently
      * tokenize wrong. */
    def fromMerges(merges: Seq[(String, String)]): Vocab = {
      require(merges.nonEmpty, "BPE vocabulary is empty")
      require(merges.size <= MaxMerges,
        s"BPE vocabulary holds ${merges.size} merges; max $MaxMerges " +
          "(one PUA output symbol per merge)")
      val surfaceToSym = scala.collection.mutable.HashMap.empty[String, Char]
      val pairs = new Array[String](merges.size)
      val outs = new Array[Char](merges.size)
      merges.zipWithIndex.foreach { case ((l, r), k) =>
        def symOf(surface: String): Char = {
          require(surface.nonEmpty, s"merge $k: empty token")
          require(!surface.exists(isWs),
            s"merge $k: token '$surface' contains whitespace — merges must " +
              "never bridge word boundaries")
          require(!surface.exists(isPua),
            s"merge $k: token contains reserved private-use characters")
          // a lone UTF-16 surrogate half is not a character: merging one
          // would orphan its partner (count/tokenize disagree) and the
          // half cannot even be encoded into the UTF-8 SQL oracle —
          // supplementary-plane symbols simply don't participate in merges
          require(!surface.exists(Character.isSurrogate),
            s"merge $k: token contains a UTF-16 surrogate — supplementary " +
              "code points cannot participate in merges")
          if (surface.length == 1) surface.charAt(0)
          else surfaceToSym.getOrElse(surface, throw new IllegalArgumentException(
            s"merge $k: '$surface' is neither a single character nor the " +
              "output of an earlier merge — the vocabulary is not in learned order"))
        }
        val (ls, rs) = (symOf(l), symOf(r))
        pairs(k) = new String(Array(ls, rs))
        outs(k) = (PuaBase + k).toChar
        val outSurface = l + r
        require(!surfaceToSym.contains(outSurface),
          s"merge $k: duplicate output token '$outSurface'")
        surfaceToSym(outSurface) = outs(k)
      }
      new Vocab(merges.toIndexedSeq, pairs, outs)
    }

    /** `merges.txt`-style file: one `left right` pair per line (single
      * space separator — tokens cannot contain whitespace), blank lines and
      * `#` comments skipped. */
    def fromFile(path: String): Vocab = {
      val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(path))
      import scala.jdk.CollectionConverters._
      fromMerges(lines.asScala.toSeq
        .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val sp = l.indexOf(' ')
          require(sp > 0 && sp < l.length - 1, s"bad merge line: '$l'")
          (l.substring(0, sp), l.substring(sp + 1))
        })
    }

    /** Small embedded English-ish vocabulary (hand-ordered like a learned
      * list: later merges chain on earlier outputs — th→the, in→ing,
      * an→and, er→ers). Real deployments load their model's merges via
      * [[fromFile]]. */
    val default: Vocab = fromMerges(Seq(
      "t" -> "h", "th" -> "e", "i" -> "n", "in" -> "g", "e" -> "r",
      "a" -> "n", "an" -> "d", "o" -> "n", "r" -> "e", "a" -> "t",
      "e" -> "n", "o" -> "r", "e" -> "s", "s" -> "t", "t" -> "o",
      "i" -> "t", "i" -> "s", "a" -> "l", "a" -> "r", "e" -> "d",
      "o" -> "u", "l" -> "e", "o" -> "f", "er" -> "s"))
  }

  /** Learn a merge vocabulary FROM a corpus — Sennrich-style BPE training
    * (repeatedly merge the most frequent adjacent symbol pair) over the
    * corpus's WORD-FREQUENCY table. The 100 TB shape: ONE distributed scan
    * (whitespace split → word counts → `TakeOrderedAndProject` top
    * `maxWords` by frequency — never a full collect), then merge learning
    * runs driver-side over that bounded dict, where each iteration is
    * O(distinct words · word length) instead of a corpus scan. The top-K
    * cap is the documented approximation: tail words contribute
    * negligible pair mass at web scale. Deterministic: exact counts,
    * (count desc, pair asc) tie-break, `maxWordLength` guards a pathological
    * unbroken-text "word". Output is in learned order by construction, so
    * [[Vocab.fromMerges]] validates it like any loaded vocabulary. */
  def train(docs: org.apache.spark.sql.DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 100000, maxWordLength: Int = 64,
      minPairCount: Long = 2L): Vocab = {
    import org.apache.spark.sql.functions._
    require(nMerges >= 1 && nMerges <= MaxMerges, s"nMerges must be in [1, $MaxMerges]")
    val wf: Array[(Array[String], Long)] = docs
      .select(explode(split(regexp_replace(col(textCol), "[\\x{E000}-\\x{E0FF}]", ""),
        "\\s+")).as("w"))
      .filter(length(col("w")).between(1, maxWordLength))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxWords)
      .collect()
      // split by CODE POINT, not UTF-16 unit: a surrogate pair stays one
      // symbol, so training can never learn a half-surrogate merge
      .map { r =>
        val w = r.getString(0)
        val syms = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < w.length) {
          val n = Character.charCount(w.codePointAt(i))
          syms += w.substring(i, i + n)
          i += n
        }
        (syms.toArray, r.getLong(1))
      }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val producedSurfaces = scala.collection.mutable.HashSet.empty[String]
    var words = wf
    var done = words.isEmpty
    while (!done && merges.size < nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          counts.updateWith((syms(i), syms(i + 1)))(v => Some(v.getOrElse(0L) + c))
          i += 1
        }
      }
      // best pair by (count desc, pair asc); pairs whose merged surface
      // collides with an earlier output are skipped (fromMerges would
      // reject the duplicate — e.g. (a,bc) after (ab,c) both yield "abc"),
      // as are pairs involving a supplementary code point (a 2-unit symbol
      // has no single-char spelling; fromMerges would reject it)
      def mergeable(sym: String): Boolean =
        sym.length == 1 || producedSurfaces.contains(sym)
      val candidates = counts.iterator
        .filter { case ((l, r), c) => c >= minPairCount &&
          mergeable(l) && mergeable(r) && !producedSurfaces.contains(l + r) }
      if (candidates.isEmpty) done = true
      else {
        val ((l, r), _) = candidates.minBy { case ((a, b), c) => (-c, a, b) }
        merges += ((l, r))
        producedSurfaces += (l + r)
        words = words.map { case (syms, c) =>
          if (syms.length < 2) (syms, c)
          else {
            val out = new Array[String](syms.length)
            var w = 0; var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
                out(w) = l + r; i += 2
              } else { out(w) = syms(i); i += 1 }
              w += 1
            }
            (java.util.Arrays.copyOf(out, w), c)
          }
        }
      }
    }
    require(merges.nonEmpty,
      "BPE training found no mergeable pair — corpus too small or too diverse " +
        s"(minPairCount=$minPairCount)")
    Vocab.fromMerges(merges.toSeq)
  }

  /** The merge pass: strip pre-existing PUA chars, apply each merge as a
    * greedy left-to-right non-overlapping 2-char → 1-char rewrite (the
    * exact semantics of SQL `replace`), in vocabulary order. */
  private[functions] def mergePass(text: String, v: Vocab): String = {
    val n0 = text.length
    var buf = new Array[Char](n0)
    var len = 0
    var i = 0
    while (i < n0) { // PUA strip
      val c = text.charAt(i)
      if (!isPua(c)) { buf(len) = c; len += 1 }
      i += 1
    }
    var k = 0
    while (k < v.pairs.length) {
      val a = v.pairs(k).charAt(0)
      val b = v.pairs(k).charAt(1)
      val out = v.outs(k)
      var w = 0; var r = 0
      while (r < len) {
        if (r + 1 < len && buf(r) == a && buf(r + 1) == b) {
          buf(w) = out; r += 2
        } else {
          buf(w) = buf(r); r += 1
        }
        w += 1
      }
      len = w
      k += 1
    }
    new String(buf, 0, len)
  }

  /** Exact token count of `text` under vocabulary `v`: non-whitespace
    * symbols after the merge pass. Symbols are CODE POINTS, not UTF-16
    * units — a surrogate pair (emoji, CJK extensions) is ONE unmerged
    * symbol, matching the SQL oracle's `length()` codepoint semantics;
    * merges themselves only ever involve BMP chars (vocab tokens are
    * single JVM chars or earlier outputs by validation), so supplementary
    * chars pass through the merge pass untouched and are counted once. */
  def countTokens(text: String, v: Vocab): Int = {
    val merged = mergePass(text, v)
    var n = 0; var i = 0
    while (i < merged.length) {
      val c = merged.charAt(i)
      if (!isWs(c) && !Character.isLowSurrogate(c)) n += 1
      i += 1
    }
    n
  }

  /** The token SURFACES of `text` under `v`, in order, whitespace dropped —
    * the inspection/debugging face of [[countTokens]] (which never
    * materializes the array). PUA symbols decode back to their merge's
    * surface; concatenating the result reproduces the input minus
    * whitespace and stripped PUA chars. */
  def tokenize(text: String, v: Vocab): Seq[String] = {
    val surfaces: Int => String = {
      val arr = v.mergeSurfaces.map { case (l, r) => l + r }
      k => arr(k)
    }
    val merged = mergePass(text, v)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < merged.length) {
      val c = merged.charAt(i)
      if (isWs(c)) i += 1
      else if (c >= PuaBase && c < PuaBase + v.size) { out += surfaces(c - PuaBase); i += 1 }
      else if (Character.isHighSurrogate(c) && i + 1 < merged.length &&
        Character.isLowSurrogate(merged.charAt(i + 1))) {
        // one supplementary code point = one token (never split the pair)
        out += merged.substring(i, i + 2); i += 2
      } else { out += c.toString; i += 1 }
    }
    out.toSeq
  }

  /** The SAME computation as portable SQL over a text column — nested
    * `replace` calls in merge order between the two strip/count regexes.
    * This is both the DuckDB oracle face and what a non-Spark engine would
    * run; PUA output symbols appear as literal characters in the SQL. */
  def oracleSqlExpr(column: String, v: Vocab): String = {
    def lit(s: String) = "'" + s.replace("'", "''") + "'"
    var e = s"regexp_replace($column, '[\\x{E000}-\\x{E0FF}]', '', 'g')"
    var k = 0
    while (k < v.size) {
      e = s"replace($e, ${lit(v.pairs(k))}, ${lit(v.outs(k).toString)})"
      k += 1
    }
    s"length(regexp_replace($e, '[ \\t\\n\\r\\f]', '', 'g'))"
  }
}

/** Exact BPE token count as a native expression — one pass per row, no
  * UDF, codegen-fallback like the sibling text expressions. NULL text →
  * NULL count. The vocabulary is part of the expression (serialized with
  * the plan; rebuilt lazily per task). */
case class BpeCountExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val vocab = Bpe.Vocab.fromMerges(merges)
  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    Bpe.countTokens(input.asInstanceOf[UTF8String].toString, vocab)
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** The token surfaces as an array<string> column — the inspection face
  * ([[Bpe.tokenize]]); prefer [[BpeCountExpr]] for budgeting, which never
  * materializes the array. */
case class BpeTokensExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val vocab = Bpe.Vocab.fromMerges(merges)
  override def nullable: Boolean = true
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Bpe.tokenize(input.asInstanceOf[UTF8String].toString, vocab)
        .map(UTF8String.fromString).toArray[Any])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

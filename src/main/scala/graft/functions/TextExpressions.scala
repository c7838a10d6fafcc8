package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-dedup hot path.
  *
  * Spark's higher-order functions (`transform`/`aggregate`/`filter`) have NO
  * codegen — every lambda element evaluates through the interpreted
  * expression walker, which measured ~70x slower than compiled loops for the
  * MinHash pipeline (35 s for 500 docs × 64 hashes). These expressions keep
  * the DataFrame API surface but run the inner loops as tight JVM bytecode
  * (`CodegenFallback` costs one virtual call per ROW, the per-shingle /
  * per-hash work is compiled Scala). This is preference tier (b) of the
  * build rules: a custom Expression where builtins can't express the
  * semantics efficiently.
  */
object TextExpressions {

  private val SPACE = ' '.toByte

  /** Lower-cased alnum token runs of `text` (shared tokenizer — must stay
    * semantically identical to `split(lower(text), "[^a-z0-9]+")` + drop
    * empties, which the DuckDB oracle replicates). */
  def tokenize(text: String): Array[String] = {
    val s = text.toLowerCase
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && !isAlnum(s.charAt(i))) i += 1
      val start = i
      while (i < n && isAlnum(s.charAt(i))) i += 1
      if (i > start) out += s.substring(start, i)
    }
    out.toArray
  }

  @inline private def isAlnum(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')

  /** Distinct word n-gram shingles; texts shorter than n words fall back to
    * the single all-tokens shingle (matches the Column/SQL formulation). */
  def wordShingleSet(text: String, n: Int): Array[String] = {
    val toks = tokenize(text)
    if (toks.length < n) Array(toks.mkString(" "))
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder()
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      seen.toArray(new Array[String](seen.size))
    }
  }

  def charShingleSet(text: String, n: Int): Array[String] = {
    val s = text.toLowerCase
    if (s.length < n) Array(s)
    else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= s.length - n) { seen.add(s.substring(i, i + n)); i += 1 }
      seen.toArray(new Array[String](seen.size))
    }
  }

  @inline def hash64(s: String, seed: Long): Long = {
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
  }
}

abstract class StringUnaryExpression extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  protected def ofString(s: String): Any
  override def nullSafeEval(input: Any): Any =
    ofString(input.asInstanceOf[UTF8String].toString)
}

/** array<string> of distinct word (or char) n-gram shingles. */
case class ShinglesExpr(child: Expression, n: Int, charGrams: Boolean)
    extends StringUnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def ofString(s: String): Any = {
    val sh = if (charGrams) TextExpressions.charShingleSet(s, n)
             else TextExpressions.wordShingleSet(s, n)
    new GenericArrayData(sh.map(UTF8String.fromString(_).asInstanceOf[Any]))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** array<string> of training-window chunks: the text's whitespace tokens
  * (split on space/tab/CR/LF — the Java∩RE2-safe class, NOT \s, so the
  * DuckDB oracle tokenizes identically) re-joined with single spaces into
  * windows of at most `maxTokens` tokens, consecutive windows sharing
  * `overlap` tokens. Window starts are multiples of stride = maxTokens −
  * overlap; a final window that would be pure overlap (entirely contained
  * in its predecessor) is not emitted. Inter-token whitespace is
  * NORMALIZED to one space by construction — chunking is a tokenizer-side
  * operation, not a byte-preserving one (documented contract, mirrored by
  * the oracle). Empty/whitespace-only text yields one empty chunk. */
case class ChunksExpr(child: Expression, maxTokens: Int, overlap: Int)
    extends StringUnaryExpression {
  require(maxTokens > 0 && overlap >= 0 && overlap < maxTokens,
    s"need 0 <= overlap < maxTokens, got overlap=$overlap maxTokens=$maxTokens")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def ofString(s: String): Any = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    val n = s.length
    while (i < n) {
      while (i < n && isWs(s.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(s.charAt(i))) i += 1
      if (i > start) toks += s.substring(start, i)
    }
    val nt = toks.length
    val stride = maxTokens - overlap
    val k = math.max(1L, 1L + math.floorDiv(nt.toLong - overlap - 1, stride)).toInt
    val out = new Array[Any](k)
    var c = 0
    while (c < k) {
      val from = c * stride
      val until = math.min(from + maxTokens, nt)
      val sb = new java.lang.StringBuilder()
      var j = from
      while (j < until) { if (j > from) sb.append(' '); sb.append(toks(j)); j += 1 }
      out(c) = UTF8String.fromString(sb.toString)
      c += 1
    }
    new GenericArrayData(out)
  }
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r'
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature from a shingle array (array<string> → array<long>):
  * k minimums over shingle hashes, via the standard two-hash scheme
  * h_i(x) = h1(x) + i·h2(x) (Broder-style affine combinations) — 2 string
  * hashes per shingle instead of k. Empty shingle sets (or the lone empty
  * shingle an empty text produces) yield NULL — the doc drops out of LSH. */
case class MinHashSigExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    if (m == 0) return null
    if (m == 1 && arr.getUTF8String(0).numBytes() == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val u = arr.getUTF8String(i)
      val h1 = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 0L)
      val h2 = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 0x9E3779B97F4A7C15L) | 1L
      var j = 0
      var h = h1
      while (j < k) {
        if (h < mins(j)) mins(j) = h
        h += h2
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(java.lang.Long.valueOf(_).asInstanceOf[Any]))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH band hashes of a minhash signature (array<long> → array<long> of
  * length `bands`; band b hashes signature rows [b·r, (b+1)·r)). */
case class BandHashesExpr(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val sig = input.asInstanceOf[ArrayData]
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong * 0xC2B2AE3D27D4EB4FL
      var j = 0
      while (j < rowsPerBand) {
        val v = sig.getLong(b * rowsPerBand + j)
        // xxh64-style avalanche mix of the band elements
        h = java.lang.Long.rotateLeft(h ^ (v * 0x87C37B91114253D5L), 31) * 0x4CF5AD432745937FL + 0x52DCE729L
        j += 1
      }
      h ^= h >>> 33; h *= 0xFF51AFD7ED558CCDL; h ^= h >>> 33
      out(b) = java.lang.Long.valueOf(h)
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over word tokens (majority vote per bit). */
case class SimHash64Expr(child: Expression) extends StringUnaryExpression {
  override def dataType: DataType = LongType
  override protected def ofString(s: String): Any = {
    val toks = TextExpressions.tokenize(s)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = TextExpressions.hash64(toks(i), 0L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) >= 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Language-ID over per-language stopword sets: one tokenize pass, hash-set
  * membership counts, argmax with ties to the earliest language; "und" when
  * nothing matches. Token-equality counting is equivalent to the
  * `\b(w1|w2|…)\b` regex formulation on digit/underscore-free text (all
  * markers are pure ASCII letters; `\b` and the [a-z0-9] tokenizer then
  * agree on word boundaries) and ~10x faster than 5 regex scans per row. */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends StringUnaryExpression {
  override def dataType: DataType = StringType
  private lazy val langs: Array[String] = markers.map(_._1).toArray
  private lazy val sets: Array[java.util.HashSet[String]] = markers.map { case (_, ws) =>
    val s = new java.util.HashSet[String](); ws.foreach(s.add); s
  }.toArray
  override protected def ofString(s: String): Any = {
    val toks = TextExpressions.tokenize(s)
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      var l = 0
      while (l < langs.length) {
        if (sets(l).contains(toks(i))) counts(l) += 1
        l += 1
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < langs.length) { if (counts(l) > counts(best)) best = l; l += 1 }
    if (counts(best) == 0) UTF8String.fromString("und")
    else UTF8String.fromString(langs(best))
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** True iff the string parses as a signed 64-bit integer. Replaces
  * `try_cast(c AS bigint) IS NOT NULL` in conformance checks: ANSI TryCast
  * throws (and catches) a JVM exception per non-conforming row — measured
  * ~10 s for 7M mostly-non-numeric rows vs ~30 ms for this digit loop. */
case class LongCastableExpr(child: Expression) extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString.trim
    val n = s.length
    if (n == 0) return java.lang.Boolean.FALSE
    var i = if (s.charAt(0) == '-' || s.charAt(0) == '+') 1 else 0
    if (i == n || n - i > 19) return java.lang.Boolean.FALSE
    var ok = true
    while (i < n && ok) { val c = s.charAt(i); ok = c >= '0' && c <= '9'; i += 1 }
    if (!ok) return java.lang.Boolean.FALSE
    // length <= 19 can still overflow; exact check only for the edge length
    if (s.length - (if (s.charAt(0) == '-' || s.charAt(0) == '+') 1 else 0) == 19) {
      try { s.toLong; java.lang.Boolean.TRUE } catch { case _: NumberFormatException => java.lang.Boolean.FALSE }
    } else java.lang.Boolean.TRUE
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** PPJoin prefix selection as a per-row expression: the |A| − ⌈t·|A|⌉ + 1
  * first shingles of the set under the global total order
  * (known-df asc, xxh64 asc, shingle asc). Only HOT shingles carry a real
  * document frequency (the tiny collected `hotDf` map — everything else
  * orders by hash), which preserves the property that matters at scale:
  * stop-shingles sort LAST and fall out of every prefix, so they never
  * enter the candidate self-join. Any consistent global order keeps the
  * prefix-filtering theorem exact; df-ordering is purely a pruning
  * heuristic. When `cap` > 0, shingles with df > cap are dropped from the
  * index entirely (documented approximation for adversarial corpora).
  * Doing this per row replaces a df-join-back + per-doc window — two
  * full-index shuffles — with one collected map shipped in the plan. */
case class PrefixShinglesExpr(
    child: Expression, hotDf: Map[String, Long], cap: Long, minJaccard: Double)
    extends UnaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // hotDf re-keyed by UTF8String once per expression instance so the hot
  // loop never materializes java Strings (the tuple-ArrayBuffer +
  // toString-per-shingle formulation was the measured single-task hot spot
  // of the PPJoin prefix stage — ~2.6 ms/doc on 1k-shingle docs)
  @transient private lazy val hotU: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](hotDf.size * 2)
    hotDf.foreach { case (k, v) => m.put(UTF8String.fromString(k), java.lang.Long.valueOf(v)) }
    m
  }
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val prefixLen = n - math.ceil(minJaccard * n - 1e-9).toInt + 1
    val ss = new Array[UTF8String](n)
    val dfs = new Array[Long](n)
    val hs = new Array[Long](n)
    val hot = if (hotDf.isEmpty) null else hotU
    var m = 0
    var i = 0
    while (i < n) {
      val u = arr.getUTF8String(i)
      val df = if (hot == null) 0L else { val v = hot.get(u); if (v == null) 0L else v.longValue() }
      if (cap <= 0 || df <= cap) {
        ss(m) = u
        dfs(m) = df
        // identical to hash64(u.toString, 0): XXH64 over the UTF-8 bytes
        hs(m) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 0L)
        m += 1
      }
      i += 1
    }
    // index sort under the (df, hash, bytes) total order — primitive
    // comparisons; the byte-wise tiebreak fires only on 64-bit hash
    // collisions and any consistent global order keeps the prefix theorem
    // exact (df/hash ordering is pruning, not semantics)
    val idx = new Array[Integer](m)
    i = 0; while (i < m) { idx(i) = Integer.valueOf(i); i += 1 }
    java.util.Arrays.sort(idx, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val x = a.intValue(); val y = b.intValue()
        var c = java.lang.Long.compare(dfs(x), dfs(y))
        if (c == 0) c = java.lang.Long.compare(hs(x), hs(y))
        if (c == 0) c = ss(x).compareTo(ss(y))
        c
      }
    })
    val keep = math.min(prefixLen, m)
    val out = new Array[Any](math.max(keep, 0))
    i = 0; while (i < keep) { out(i) = ss(idx(i).intValue()).clone(); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact Jaccard similarity of two DISTINCT-element string arrays:
  * |∩| / (|a| + |b| − |∩|), intersection counted by building one hash set
  * over the smaller array and probing with the larger — one pass, no
  * intermediate arrays. Equals
  * `size(array_intersect(a,b)) / size(array_union(a,b))` for distinct
  * arrays (the shingle sets are distinct by construction) but skips the
  * second hash set and the materialized union array that formulation pays
  * per row — measured ~10× on the candidate-verification hot path. */
case class JaccardSimExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[ArrayData]
    var y = b.asInstanceOf[ArrayData]
    if (x.numElements() > y.numElements()) { val t = x; x = y; y = t }
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx == 0 && ny == 0) return java.lang.Double.valueOf(1.0)
    val set = new java.util.HashSet[UTF8String](nx * 2)
    var i = 0
    while (i < nx) { set.add(x.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < ny) { if (set.contains(y.getUTF8String(i))) inter += 1; i += 1 }
    java.lang.Double.valueOf(inter.toDouble / (nx + ny - inter).toDouble)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact Jaccard similarity of two SORTED distinct-element string arrays
  * (binary UTF8 order — what Spark's `sort_array` produces): intersection
  * counted by a single merge walk, zero allocation per pair. Semantically
  * identical to [[JaccardSimExpr]] on the same sets; the sort is hoisted to
  * the doc side (once per document) so the per-CANDIDATE-PAIR cost drops
  * from a HashSet build (~10 µs at 50 shingles) to ~50 byte-compares —
  * the candidate-verification join evaluates this once per candidate, and
  * candidates outnumber documents by orders of magnitude. */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    if (nx == 0 && ny == 0) return java.lang.Double.valueOf(1.0)
    var i = 0; var j = 0; var inter = 0
    while (i < nx && j < ny) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    java.lang.Double.valueOf(inter.toDouble / (nx + ny - inter).toDouble)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass text statistics: struct<len, tokens, alpha, punct, w7_12, w13>
  * computed in a single code-point scan. Each field is defined to equal its
  * regex formulation exactly (the DuckDB oracle evaluates those regexes):
  *   len    = length(text)                         (code points)
  *   tokens = regexp_count(text, '[A-Za-z0-9]+')   (maximal alnum runs)
  *   alpha  = regexp_count(text, '[A-Za-z]')
  *   punct  = regexp_count(text, '[^A-Za-z0-9\s]') (\s = Java's 6 ASCII ws)
  *   w7_12  = regexp_count(text, '[A-Za-z0-9]{7,12}')  — greedy
  *            non-overlapping: a run of length L yields one match per
  *            12-char bite while ≥7 chars remain
  *   w13    = regexp_count(text, '[A-Za-z0-9]{13,}')   — one per run ≥13
  * Replaces up to 6 independent regexp scans per row with one loop
  * (same tokenize-once treatment LangIdExpr got, measured ~10×). */
case class TextStatsExpr(child: Expression) extends StringUnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("len", IntegerType, nullable = false),
    StructField("tokens", IntegerType, nullable = false),
    StructField("alpha", IntegerType, nullable = false),
    StructField("punct", IntegerType, nullable = false),
    StructField("w7_12", IntegerType, nullable = false),
    StructField("w13", IntegerType, nullable = false)))
  @inline private def isAlnumCp(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') || (cp >= '0' && cp <= '9')
  @inline private def isAlphaCp(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z')
  @inline private def isWsCp(cp: Int): Boolean =
    cp == ' ' || cp == '\t' || cp == '\n' || cp == 0x0B || cp == '\f' || cp == '\r'
  override protected def ofString(s: String): Any = {
    var len = 0; var tokens = 0; var alpha = 0; var punct = 0
    var w712 = 0; var w13 = 0
    var run = 0
    @inline def closeRun(): Unit = if (run > 0) {
      if (run >= 13) w13 += 1
      var rem = run
      while (rem >= 7) { rem -= math.min(12, rem); w712 += 1 }
      run = 0
    }
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      len += 1
      if (isAlnumCp(cp)) {
        run += 1
        if (run == 1) tokens += 1
        if (isAlphaCp(cp)) alpha += 1
      } else {
        closeRun()
        if (!isWsCp(cp)) punct += 1
      }
      i += Character.charCount(cp)
    }
    closeRun()
    InternalRow(len, tokens, alpha, punct, w712, w13)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass repetition counters:
  * struct<n_lines, n_distinct_lines, n_words, n_distinct_words>, computed in
  * a single character scan. Field semantics equal the split formulations
  * exactly (which remain the DuckDB oracle):
  *   n_lines          = size(split(text, '\n'))            — Java limit −1:
  *                      a trailing '\n' contributes an empty final line;
  *                      the empty text is one (empty) line
  *   n_distinct_lines = size(array_distinct(split(text, '\n')))
  *                      (case-sensitive, exact string equality)
  *   n_words          = size(array_remove(split(lower(text), '[^a-z0-9]+'), ''))
  *                      — maximal lower-cased alnum runs
  *   n_distinct_words = distinct count of those runs
  * Replaces 4 splits + 2 array_distinct hash-set builds per row (Catalyst
  * does not CSE the non-cheap split, so each fraction paid both) with one
  * scan and two reused hash sets. */
case class DupStatsExpr(child: Expression) extends StringUnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_distinct_lines", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct_words", IntegerType, nullable = false)))
  @inline private def lowerCp(cp: Int): Int =
    if (cp >= 'A' && cp <= 'Z') cp | 0x20
    else if (cp < 128) cp
    else Character.toLowerCase(cp)
  @inline private def isLowerAlnum(cp: Int): Boolean =
    (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')
  override protected def ofString(s: String): Any = {
    val lineSet = new java.util.HashSet[String]()
    val wordSet = new java.util.HashSet[String]()
    var nLines = 0
    var nWords = 0
    var lineStart = 0
    val word = new java.lang.StringBuilder()
    @inline def closeWord(): Unit = if (word.length > 0) {
      nWords += 1
      wordSet.add(word.toString)
      word.setLength(0)
    }
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp == '\n') {
        nLines += 1
        lineSet.add(s.substring(lineStart, i))
        lineStart = i + 1
      }
      val lc = lowerCp(cp)
      if (isLowerAlnum(lc)) word.appendCodePoint(lc) else closeWord()
      i += Character.charCount(cp)
    }
    closeWord()
    nLines += 1 // final segment (empty when the text ends in '\n')
    lineSet.add(s.substring(lineStart, n))
    InternalRow(nLines, lineSet.size, nWords, wordSet.size)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One-pass token-run collapse: struct<clean, total, kept> where `clean`
  * is the text with runs of consecutively repeated whitespace tokens
  * collapsed to one and whitespace normalized to single spaces, `total`
  * the token count before collapsing and `kept` after — so
  * `total − kept` is the removed-token count without re-splitting either
  * string. Token semantics are pinned to the split formulation
  * ([[graft.operators.TextAnalysis.collapseTokenRunsSplit]], the DuckDB
  * oracle's shape): tokens = `split(trim(text), "\\s+")` with Spark
  * semantics — `trim` strips 0x20 SPACES only, split keeps a leading
  * empty token when the trimmed text starts with other whitespace and a
  * trailing empty token when it ends with one (Java limit −1), and the
  * empty text is one empty token. Previous-token comparison is by exact
  * string equality over the source region — no token array is ever
  * materialized. */
case class CollapseRunsExpr(child: Expression) extends StringUnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("clean", StringType, nullable = false),
    StructField("total", IntegerType, nullable = false),
    StructField("kept", IntegerType, nullable = false)))
  // Java regex \s (the split pattern's class, ASCII-only by default)
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
  override protected def ofString(s: String): Any = {
    // Spark trim(): strips 0x20 spaces only (NOT the full \s class)
    var lo = 0
    var hi = s.length
    while (lo < hi && s.charAt(lo) == ' ') lo += 1
    while (hi > lo && s.charAt(hi - 1) == ' ') hi -= 1
    val sb = new java.lang.StringBuilder(hi - lo)
    var total = 0
    var kept = 0
    var pStart = 0
    var pEnd = -1 // previous token [pStart, pEnd); pEnd < pStart = none yet
    @inline def emit(start: Int, end: Int): Unit = {
      total += 1
      val same = pEnd >= pStart && (pEnd - pStart) == (end - start) && {
        var j = 0
        val len = end - start
        while (j < len && s.charAt(pStart + j) == s.charAt(start + j)) j += 1
        j == len
      }
      if (!same) {
        if (kept > 0) sb.append(' ')
        sb.append(s, start, end)
        kept += 1
      }
      pStart = start; pEnd = end
    }
    if (lo == hi) emit(lo, hi) // empty text = one empty token
    else {
      var i = lo
      if (isWs(s.charAt(i))) {
        emit(i, i) // leading whitespace = leading empty token (limit −1)
        while (i < hi && isWs(s.charAt(i))) i += 1
        if (i == hi) emit(hi, hi) // all-whitespace text splits to ["", ""]
      }
      while (i < hi) {
        val start = i
        while (i < hi && !isWs(s.charAt(i))) i += 1
        emit(start, i)
        if (i < hi) {
          while (i < hi && isWs(s.charAt(i))) i += 1
          if (i == hi) emit(hi, hi) // trailing whitespace = trailing empty token
        }
      }
    }
    InternalRow(UTF8String.fromString(sb.toString), total, kept)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Bottom-k sketch of character-shingle hashes (winnowing-style rolling
  * fingerprint): the k smallest xxh64 values, sorted ascending. */
case class RollingFingerprintExpr(child: Expression, shingleSize: Int, k: Int)
    extends StringUnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def ofString(s: String): Any = {
    val shingles = TextExpressions.charShingleSet(s, shingleSize)
    val hs = new Array[Long](shingles.length)
    var i = 0
    while (i < shingles.length) { hs(i) = TextExpressions.hash64(shingles(i), 0L); i += 1 }
    java.util.Arrays.sort(hs)
    val m = math.min(k, hs.length)
    val out = new Array[Any](m)
    i = 0
    while (i < m) { out(i) = java.lang.Long.valueOf(hs(i)); i += 1 }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

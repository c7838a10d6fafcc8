package graft

import graft.functions.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-verifiable counts on a tiny vocab") {
    val v = Bpe.Vocab.fromMerges(Seq("a" -> "b", "ab" -> "c"))
    Bpe.countTokens("abc", v) shouldBe 1 // a,b→[ab]; [ab],c→[abc]
    Bpe.countTokens("ab ab", v) shouldBe 2 // whitespace uncounted, unbridged
    Bpe.countTokens("ba", v) shouldBe 2 // no merge applies
    Bpe.countTokens("aab", v) shouldBe 2 // a + [ab]? no: greedy L→R pairs (a,a)x → a,[ab]
    Bpe.countTokens("abab", v) shouldBe 2 // [ab][ab]; c never follows
    Bpe.countTokens("", v) shouldBe 0
    Bpe.countTokens("  \n\t", v) shouldBe 0
    // symbols are CODE POINTS: a surrogate-pair emoji counts once (the SQL
    // oracle's length() counts codepoints), and tokenize never splits it
    Bpe.countTokens("ab 😀 ab", v) shouldBe 3
    Bpe.tokenize("ab 😀", v) shouldBe Seq("ab", "😀")
    // pre-existing PUA chars are stripped, never counted or merged
    Bpe.countTokens("ab", v) shouldBe 1 // strips to "ab" → one token
  }

  test("greedy in-order pass ≡ classic priority-rescan BPE on well-formed vocabs") {
    // the classic loop: repeatedly merge the leftmost occurrence of the
    // LOWEST-RANKED applicable pair, until none applies — the textbook
    // formulation. The library's linear in-order pass must agree on every
    // input (it does for any learned-order vocab: a merge's output can
    // only feed later merges, so exhausting merges in order misses nothing)
    val v = Bpe.Vocab.default
    val rank = v.mergeSurfaces.zipWithIndex.map { case ((l, r), k) => (l, r) -> k }.toMap
    def classicWordTokens(word: String): Int = {
      var toks = word.map(_.toString).toVector
      var done = false
      while (!done) {
        var best = Int.MaxValue; var at = -1
        var i = 0
        while (i < toks.length - 1) {
          rank.get((toks(i), toks(i + 1))).foreach { k =>
            if (k < best) { best = k; at = i }
          }
          i += 1
        }
        if (at < 0) done = true
        else toks = toks.patch(at, Seq(toks(at) + toks(at + 1)), 2)
      }
      toks.length
    }
    def classic(text: String): Int =
      text.split("[ \t\n\r\f]+").filter(_.nonEmpty).map(classicWordTokens).sum
    val rng = new scala.util.Random(7)
    val words = Seq("the", "and", "ing", "together", "toast", "ster", "std",
      "inning", "thence", "banana", "rees", "fers", "zzz", "oersted")
    (0 until 300).foreach { _ =>
      val text = (0 until 1 + rng.nextInt(12)).map { _ =>
        if (rng.nextBoolean()) words(rng.nextInt(words.length))
        else (0 until 1 + rng.nextInt(8)).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
      }.mkString(" ")
      withClue(s"text='$text': ") {
        Bpe.countTokens(text, v) shouldBe classic(text)
      }
    }
  }

  test("vocab validation: out-of-order, whitespace, duplicates, size cap all raise") {
    intercept[IllegalArgumentException] { // "th" used before it is produced
      Bpe.Vocab.fromMerges(Seq("th" -> "e", "t" -> "h"))
    }.getMessage should include ("learned order")
    intercept[IllegalArgumentException] {
      Bpe.Vocab.fromMerges(Seq("a" -> " "))
    }.getMessage should include ("whitespace")
    intercept[IllegalArgumentException] { // both produce surface "ab"
      Bpe.Vocab.fromMerges(Seq("a" -> "b", "a" -> "b"))
    }.getMessage should include ("duplicate")
    intercept[IllegalArgumentException] {
      Bpe.Vocab.fromMerges(Nil)
    }
    intercept[IllegalArgumentException] {
      Bpe.Vocab.fromMerges(Seq("a" -> ""))
    }.getMessage should include ("private-use")
  }

  test("vocab loads from a merges.txt-style file") {
    val f = java.nio.file.Files.createTempFile("merges", ".txt")
    java.nio.file.Files.writeString(f,
      "# comment\nt h\nth e\n\ni n\n")
    val v = Bpe.Vocab.fromFile(f.toString)
    v.size shouldBe 3
    Bpe.countTokens("the thin", v) shouldBe 3 // [the] + [th],[in]
    Bpe.countTokens("the thin", Bpe.Vocab.fromMerges(v.mergeSurfaces)) shouldBe 3
  }

  test("native expression: distributed counts, NULL text, oracle SQL face matches in Spark") {
    val df = Seq(Some("the running band"), Some(""), None, Some("xyzzy"))
      .toDF("text")
    val out = df.select(graft.functions.bpe_token_count(col("text")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) -1 else r.getInt(0))
    out(1) shouldBe 0
    out(2) shouldBe -1 // NULL in, NULL out
    out(3) shouldBe 5  // no merges apply
    // the generated oracle SQL embeds one replace() per merge in vocab
    // order plus the two strip/count regexes (DuckDB dialect — its
    // regexp_replace needs the 'g' flag Spark's doesn't take; actual
    // DuckDB parity rides the Verify gate's q_bpe_tokens_docs row)
    val sql = Bpe.oracleSqlExpr("text", Bpe.Vocab.default)
    sql.sliding("replace(".length).count(_ == "replace(") shouldBe
      Bpe.Vocab.default.size + 2
    sql should startWith ("length(regexp_replace(")
  }

  test("tokenize: surfaces decode back, concatenation reproduces non-ws input") {
    val v = Bpe.Vocab.default
    Bpe.tokenize("the thin", v) shouldBe Seq("the", "th", "in")
    Bpe.tokenize("running", v) shouldBe Seq("r", "u", "n", "n", "ing")
    val texts = Seq("the quick brown fox", "standards and tokens", "zzz qqq")
    texts.foreach { t =>
      val toks = Bpe.tokenize(t, v)
      toks.mkString shouldBe t.replaceAll("[ \t\n\r\f]", "")
      toks.size shouldBe Bpe.countTokens(t, v) // the two faces agree
    }
    // the array expression matches the driver-side function
    val df = Seq("the thin").toDF("text")
    df.select(graft.functions.bpe_tokens(col("text"))).head().getSeq[String](0) shouldBe
      Seq("the", "th", "in")
  }

  test("train: learned-from-corpus vocab is well-formed, frequency-greedy, deterministic") {
    // a corpus where the most frequent pair is unambiguous: 'ab' dominates
    val docs = (0 until 60).map { i =>
      (i.toLong, if (i % 3 == 0) "abab abba cd" else "abc abd xy")
    }.toDF("doc_id", "text")
    val v = Bpe.train(docs, "text", nMerges = 4)
    // first merge is the most frequent pair (a,b); fromMerges already
    // validated learned order + uniqueness on construction
    v.mergeSurfaces.head shouldBe ("a" -> "b")
    v.size should be <= 4
    // learned vocab compresses its own corpus at least as well as chars
    val texts = docs.collect().map(_.getString(1))
    texts.foreach { t =>
      Bpe.countTokens(t, v) should be <= t.count(c => !" \t\n\r\f".contains(c))
    }
    // deterministic across partitionings (exact counts + ordered tie-break)
    val v2 = Bpe.train(docs.repartition(7), "text", nMerges = 4)
    v2.mergeSurfaces shouldBe v.mergeSurfaces
    // trained vocab feeds the counting expression directly
    val counted = docs.select(
      graft.functions.bpe_token_count(col("text"), v.mergeSurfaces).as("n"))
      .agg(sum("n")).head().getLong(0)
    val heuristic = docs.select(
      graft.functions.bpe_token_count(col("text")).as("n"))
      .agg(sum("n")).head().getLong(0)
    counted should be < heuristic // corpus-fit merges beat the generic vocab here
    // no mergeable pair → loud error, never an empty vocabulary
    intercept[IllegalArgumentException] {
      Bpe.train(Seq((1L, "a b c d e f g")).toDF("id", "text"), "text", 4)
    }.getMessage should include ("no mergeable pair")
  }

  test("exact counter plugs into tokenBudgetSample and weightedTokenMix") {
    import graft.operators.Curation
    val docs = (0 until 200).map { i =>
      (i.toLong, Seq("the quick brown fox", "running and jumping together",
        "standard tokenizer test corpus line").apply(i % 3) + s" doc $i")
    }.toDF("doc_id", "text")
      .withColumn("bpe_tokens", graft.functions.bpe_token_count(col("text")))
    val total = docs.agg(sum("bpe_tokens")).head().getLong(0)
    val budget = total / 3
    val sampled = Curation.tokenBudgetSample(docs, "doc_id", "bpe_tokens", budget)
    val got = sampled.agg(sum("bpe_tokens")).head().getLong(0)
    got should be <= budget
    // deterministic: same slice on re-run
    Curation.tokenBudgetSample(docs, "doc_id", "bpe_tokens", budget)
      .agg(sum("bpe_tokens")).head().getLong(0) shouldBe got
    val mixed = Curation.weightedTokenMix(Seq(
      ("even", docs.filter(col("doc_id") % 2 === 0), 0.7),
      ("odd", docs.filter(col("doc_id") % 2 === 1), 0.3)),
      "doc_id", "bpe_tokens")
    mixed.count() should be > 0L
  }
}

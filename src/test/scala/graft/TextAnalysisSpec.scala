package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count and estimate") {
    val df = Seq("hello world, this is text!", "", "one").toDF("text")
    val r = df.select(
      TextAnalysis.tokenCount(col("text")),
      TextAnalysis.tokenEstimate(col("text"))).collect()
    r(0).getInt(0) shouldBe 5
    r(0).getInt(1) shouldBe 7 // 5 words + 2 punct
    r(1).getInt(0) shouldBe 0
    r(2).getInt(0) shouldBe 1
  }

  test("one-pass text_stats equals the regex formulations on real documents") {
    // the struct is DEFINED as these regexp_counts — assert field-for-field
    // equality over the full sf0.001 documents table plus adversarial rows
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .unionByName(Seq(
        "", "   ", "abcdefghijkl", "abcdefghijklm", "abcdefghijklmnopqrstuvwxyz",
        "a\tb\ncd\fe\rf", "éüñ 漢字 mixed ascii2000 and MORE!!!",
        "1234567 12345678901234 x").toDF("text"))
    val st = graft.operators.TextAnalysis.textStats(col("text"))
    val mismatches = docs.select(
        st.getField("len").as("a_len"),
        st.getField("tokens").as("a_tokens"),
        st.getField("alpha").as("a_alpha"),
        st.getField("punct").as("a_punct"),
        st.getField("w7_12").as("a_w712"),
        st.getField("w13").as("a_w13"),
        org.apache.spark.sql.functions.length(col("text")).as("e_len"),
        regexp_count(col("text"), lit("[A-Za-z0-9]+")).as("e_tokens"),
        regexp_count(col("text"), lit("[A-Za-z]")).as("e_alpha"),
        regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).as("e_punct"),
        regexp_count(col("text"), lit("[A-Za-z0-9]{7,12}")).as("e_w712"),
        regexp_count(col("text"), lit("[A-Za-z0-9]{13,}")).as("e_w13"))
      .filter(col("a_len") =!= col("e_len") || col("a_tokens") =!= col("e_tokens") ||
        col("a_alpha") =!= col("e_alpha") || col("a_punct") =!= col("e_punct") ||
        col("a_w712") =!= col("e_w712") || col("a_w13") =!= col("e_w13"))
    mismatches.count() shouldBe 0
  }

  test("language id identifies clear samples, und for gibberish") {
    val df = Seq(
      "the cat and the dog is in that house for sure it was good",
      "der hund ist nicht mit der katze und das ist gut zu wissen",
      "le chat est dans la maison et les chiens pour que dans",
      "el perro es una mascota que vive por la casa para siempre con",
      "zzz qqq xxx kkk").toDF("text")
    val langs = df.select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0))
    langs shouldBe Array("en", "de", "fr", "es", "und")
  }

  test("quality score in [0,1], higher for clean prose") {
    val df = Seq(
      "This is a perfectly reasonable sentence with normal words and structure.",
      "!!!???;;;###@@@",
      "").toDF("text")
    val r = df.select(TextAnalysis.qualityScore(col("text"))).collect().map(_.getDouble(0))
    all(r) should (be >= 0.0 and be <= 1.0)
    r(0) should be > r(1)
  }

  test("PII counters flag emails, IPs, SSNs, phones; clean text scores zero") {
    val df = Seq(
      "contact me at jane.doe+test@example.co.uk or admin@host.io",
      "server at 192.168.1.254 and 10.0.0.1 responded",
      "ssn 123-45-6789 leaked; call +1 (555) 123-4567 now",
      "a perfectly clean sentence with nothing sensitive").toDF("text")
    val r = df.select(
      TextAnalysis.emailCount(col("text")),
      TextAnalysis.ipv4Count(col("text")),
      TextAnalysis.ssnCount(col("text")),
      TextAnalysis.phoneCount(col("text"))).collect()
    (r(0).getInt(0), r(0).getInt(1), r(0).getInt(2)) shouldBe ((2, 0, 0))
    r(1).getInt(1) shouldBe 2
    r(2).getInt(2) shouldBe 1
    r(2).getInt(3) should be >= 1
    r(3).toSeq shouldBe Seq(0, 0, 0, 0)
  }

  test("repetition fractions: repeated lines and words score high, varied text low") {
    val df = Seq(
      "same line\nsame line\nsame line\nsame line",
      "buy buy buy buy buy now now now",
      "each line here\nis quite different\nfrom the others").toDF("text")
    val r = df.select(
      TextAnalysis.dupLineFraction(col("text")),
      TextAnalysis.dupWordFraction(col("text"))).collect()
    r(0).getDouble(0) shouldBe 0.75 +- 1e-12 // 4 lines, 1 distinct
    r(1).getDouble(1) shouldBe (6.0 / 8.0) +- 1e-12 // 8 words, 2 distinct
    r(2).getDouble(0) shouldBe 0.0
  }

  test("one-pass dup_stats equals the split formulations on real documents") {
    // the struct is DEFINED as the split/array_distinct shapes (which remain
    // the DuckDB oracle) — assert equality over the full sf0.001 documents
    // table plus adversarial rows: empty text, trailing/leading/double
    // newlines, whitespace-only lines, case-sensitivity of line identity
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .unionByName(Seq(
        "", "\n", "a\n", "\na", "a\n\na", "x\nx\nX", "  \n  \n",
        "one two one\nTWO two", "tab\there\ntab\there").toDF("text"))
    val mismatches = docs.select(
        TextAnalysis.dupLineFraction(col("text")).as("a_l"),
        TextAnalysis.dupWordFraction(col("text")).as("a_w"),
        TextAnalysis.dupLineFractionSplit(col("text")).as("e_l"),
        TextAnalysis.dupWordFractionSplit(col("text")).as("e_w"))
      .filter(col("a_l") =!= col("e_l") || col("a_w") =!= col("e_w"))
    mismatches.count() shouldBe 0
  }

  test("native text expressions match reference formulations on random strings (property)") {
    // seeded fuzz over a deliberately nasty alphabet: ASCII letters/digits,
    // punctuation, every whitespace the \s-adjacent classes disagree on,
    // consecutive newlines, and some non-ASCII — one mismatch row fails
    val rnd = new scala.util.Random(20260816L)
    val alphabet = "abcXYZ019 .,;!@-_\t\n\n\r\féñ漢"
    val rows = (1 to 300).map { _ =>
      val len = rnd.nextInt(80)
      val sb = new StringBuilder
      (1 to len).foreach(_ => sb.append(alphabet.charAt(rnd.nextInt(alphabet.length))))
      sb.toString
    }
    val df = rows.toDF("text")
    val st = TextAnalysis.textStats(col("text"))
    val statsMismatch = df.select(
        st.getField("len").as("a1"), st.getField("tokens").as("a2"),
        st.getField("alpha").as("a3"), st.getField("punct").as("a4"),
        st.getField("w7_12").as("a5"), st.getField("w13").as("a6"),
        org.apache.spark.sql.functions.length(col("text")).as("e1"),
        regexp_count(col("text"), lit("[A-Za-z0-9]+")).as("e2"),
        regexp_count(col("text"), lit("[A-Za-z]")).as("e3"),
        regexp_count(col("text"), lit("[^A-Za-z0-9\\s]")).as("e4"),
        regexp_count(col("text"), lit("[A-Za-z0-9]{7,12}")).as("e5"),
        regexp_count(col("text"), lit("[A-Za-z0-9]{13,}")).as("e6"))
      .filter(col("a1") =!= col("e1") || col("a2") =!= col("e2") ||
        col("a3") =!= col("e3") || col("a4") =!= col("e4") ||
        col("a5") =!= col("e5") || col("a6") =!= col("e6"))
    statsMismatch.count() shouldBe 0
    val dupMismatch = df.select(
        TextAnalysis.dupLineFraction(col("text")).as("a_l"),
        TextAnalysis.dupWordFraction(col("text")).as("a_w"),
        TextAnalysis.dupLineFractionSplit(col("text")).as("e_l"),
        TextAnalysis.dupWordFractionSplit(col("text")).as("e_w"))
      .filter(col("a_l") =!= col("e_l") || col("a_w") =!= col("e_w"))
    dupMismatch.count() shouldBe 0
  }

  test("content fingerprint is whitespace/case-normalized") {
    val df = Seq(("A  B\tC", 1), ("a b c", 2), ("a b d", 3)).toDF("text", "id")
    val fp = df.select(TextAnalysis.contentFingerprint(col("text"))).collect().map(_.getString(0))
    fp(0) shouldBe fp(1)
    fp(0) should not be fp(2)
  }

  test("rolling fingerprint: near-dup texts share most hashes") {
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "the quick brown fox jumps over the lazy dog near the shore"),
      (3L, "completely different content here about something else entirely")).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.rollingFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val sim12 = fps(1L).intersect(fps(2L)).size.toDouble / fps(1L).size
    val sim13 = fps(1L).intersect(fps(3L)).size.toDouble / fps(1L).size
    sim12 should be > 0.5
    sim13 should be < 0.2
  }

  test("enrich attaches the full column family") {
    val df = Seq("some text here").toDF("text")
    val cols = TextAnalysis.enrich(df, "text").columns.toSet
    cols should contain allOf ("token_count", "token_estimate", "lang_id", "quality_score", "fingerprint")
  }

  test("redactPii replaces all four shapes; SSN is not eaten by the phone pattern") {
    val df = Seq(
      "mail me at jo.doe+x@sub.example.org or call +1 (555) 123-4567 now",
      "ssn 123-45-6789 from host 192.168.10.7",
      "two mails a@b.io c@d.co and two ips 10.0.0.1 10.0.0.2",
      "clean text with no pii at all").toDF("text")
    val out = df.select(TextAnalysis.redactPii(col("text"))).collect().map(_.getString(0))
    out(0) shouldBe "mail me at [EMAIL] or call [PHONE] now"
    out(1) shouldBe "ssn [SSN] from host [IP]" // phone pattern must NOT match the SSN
    out(2) shouldBe "two mails [EMAIL] [EMAIL] and two ips [IP] [IP]"
    out(3) shouldBe "clean text with no pii at all"
  }

  test("stripMarkup removes tags and URLs, collapses whitespace; urlCount counts links") {
    val df = Seq(
      "<div><p>hello  world</p> see https://a.example/x?q=1 ok</div>",
      "plain text, no markup",
      "<br/><span attr=\"v\">x</span> http://b.example and https://c.example/z").toDF("text")
    val out = df.select(TextAnalysis.stripMarkup(col("text")).as("clean"),
      TextAnalysis.urlCount(col("text")).as("urls")).collect()
    out(0).getString(0) shouldBe "hello world see ok"
    out(0).getInt(1) shouldBe 1
    out(1).getString(0) shouldBe "plain text, no markup"
    out(1).getInt(1) shouldBe 0
    out(2).getString(0) shouldBe "x and"
    out(2).getInt(1) shouldBe 2
  }

  test("topNgrams counts document frequency with deterministic tie-break") {
    val df = Seq(
      (1L, "alpha beta gamma delta"),   // "alpha beta gamma", "beta gamma delta"
      (2L, "alpha beta gamma"),          // "alpha beta gamma"
      (3L, "alpha beta gamma alpha beta gamma"), // distinct per doc: counts once
      (4L, "unrelated words entirely here")).toDF("doc_id", "text")
    val top = TextAnalysis.topNgrams(df, "text", n = 3, k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    top.head shouldBe ("alpha beta gamma", 3L) // docs 1,2,3 — within-doc repeat not double-counted
    top(1)._2 shouldBe 1L // everything else ties at 1; ngram-ascending break
    top(1)._1 should be < top(2)._1
  }

  test("stripBoilerplateLines removes hot lines, keeps order, no corpus shuffle") {
    val hot = "SAME LICENSE LINE"
    val df = Seq(
      (1L, s"$hot\nunique first\nunique second"),
      (2L, s"before\n$hot\nafter"),
      (3L, hot), // everything stripped → kept as empty text
      (4L, "no boilerplate at all\njust content")).toDF("doc_id", "text")
    val out = TextAnalysis.stripBoilerplateLines(df, "doc_id", "text", minDocs = 3L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out shouldBe Map(
      1L -> "unique first\nunique second",
      2L -> "before\nafter", // original order preserved around the removed line
      3L -> "",
      4L -> "no boilerplate at all\njust content")
    // below threshold nothing is stripped
    val none = TextAnalysis.stripBoilerplateLines(df, "doc_id", "text", minDocs = 4L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    none(3L) shouldBe hot
    // the rewrite is per-row against a broadcast one-row hot set: the
    // corpus side must NOT pass through an exchange on its way to the join
    val plan = TextAnalysis.stripBoilerplateLines(df, "doc_id", "text", minDocs = 3L)
      .queryExecution.executedPlan.toString
    plan should include("BroadcastNestedLoopJoin")
  }

  test("bigramCoverage separates fluent repetition from word-soup") {
    import spark.implicits._
    // docs 1-3 share the same sentence (all bigrams common at minDf=2);
    // doc 4 is unique word-soup (no bigram repeats anywhere); doc 5 empty
    val common = "the quick brown fox jumps over the lazy dog"
    val df = Seq(
      (1L, Option(common)), (2L, Option(common)), (3L, Option(common + " again")),
      (4L, Option("zulu xray yankee victor whiskey uniform tango")),
      (5L, Option("")), (6L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramCoverage(df, "doc_id", "text", minDf = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    out(1L)._3 shouldBe 1.0 // every bigram shared with docs 2,3
    out(2L)._3 shouldBe 1.0
    out(3L)._3 should be < 1.0 // "dog again" is unique
    out(3L)._3 should be > 0.8
    out(4L) shouldBe ((6L, 0L, 0.0)) // word-soup: no common transitions
    out(5L)._1 shouldBe 0L // empty text → no bigrams, coverage 0
    out(5L)._3 shouldBe 0.0
    out(6L) shouldBe ((0L, 0L, 0.0)) // null text kept, zeroed
  }

  test("stripBoilerplateLines raises the hot-set guard on a pathological corpus") {
    // minDocs=1 makes EVERY distinct line hot — with a tiny cap the guard
    // must raise (instead of silently building an unbounded broadcast row)
    val df = (1L to 20L).map(i => (i, s"line-$i-a\nline-$i-b")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      TextAnalysis.stripBoilerplateLines(df, "doc_id", "text", minDocs = 1L, maxHotLines = 5)
        .collect()
    }
    e.getMessage should include("maxHotLines")
    // an in-cap hot set is unaffected by the guard machinery
    val hot = "SAME LICENSE LINE"
    val ok = Seq((1L, s"$hot\nu1"), (2L, s"$hot\nu2"), (3L, hot)).toDF("doc_id", "text")
    TextAnalysis.stripBoilerplateLines(ok, "doc_id", "text", minDocs = 3L, maxHotLines = 5)
      .collect().map(_.getString(1)).sorted shouldBe Array("", "u1", "u2")
  }

  test("collapseTokenRuns collapses adjacent repeats only, normalizes whitespace, keeps NULL") {
    val df = Seq(
      Some("batch batch batch job"),      // run at the start
      Some("run the the the test test"),  // two interior runs
      Some("a b a b a"),                  // non-adjacent repeats are prose — kept
      Some("  spaced\t\tout   words  "),  // whitespace normalized, trimmed
      Some("solo"),
      Some("x x"),
      Some(""),                           // empty stays empty
      None                                // NULL preserved
    ).toDF("text")
    val out = df.select(TextAnalysis.collapseTokenRuns(col("text"))).collect()
      .map(r => Option(r.getString(0)))
    out shouldBe Array(
      Some("batch job"), Some("run the test"), Some("a b a b a"),
      Some("spaced out words"), Some("solo"), Some("x"), Some(""), None)
    // case- and punctuation-sensitive: "The the" is not a run
    Seq("The the end. end").toDF("text")
      .select(TextAnalysis.collapseTokenRuns(col("text"))).head().getString(0) shouldBe
      "The the end. end"
  }

  test("CollapseRunsExpr native ≡ split formulation; counts consistent") {
    // nasty edges: Spark trim strips 0x20 only, split(…, "\\s+") keeps a
    // leading empty token after non-space whitespace and a trailing one
    // before it (Java limit −1) — the native scan must reproduce all of it
    val texts = Seq(
      "batch batch batch job", "a b a b a", "", " ", "\t", "\n\nx", "x\n\n",
      "  lead space", "trail space  ", "\tlead tab", "trail tab\t",
      "x\u000By \f z\r\nz", "a  a   a", "solo", "\t\t", " \t ", "a\tb\tb",
      "üü üü ok", "tok tok\ttok  tok"
    )
    val df = texts.toDF("text")
    val rows = df.select(
        TextAnalysis.collapseTokenRunsSplit(col("text")).as("split_clean"),
        TextAnalysis.collapseRunsStats(col("text")).as("cr"),
        org.apache.spark.sql.functions.size(split(trim(col("text")), "\\s+")).as("split_total"))
      .collect()
    for ((r, t) <- rows.zip(texts)) {
      withClue(s"text=${t.replace("\t", "\\t").replace("\n", "\\n")}: ") {
        val cr = r.getStruct(1)
        cr.getString(0) shouldBe r.getString(0)          // clean ≡ split
        cr.getInt(1) shouldBe r.getInt(2)                // total ≡ size(split)
        val keptTokens = // kept ≡ token count of clean under the join rule
          if (cr.getString(0).isEmpty) 1 else cr.getString(0).split(" ", -1).length
        cr.getInt(2) shouldBe keptTokens
      }
    }
    // NULL in → NULL struct out
    Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.collapseRunsStats(col("text"))).head().isNullAt(0) shouldBe true
  }
}

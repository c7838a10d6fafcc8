package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic generator for the north-rule transcripts table
  *   (conv_id string, turn_idx int, role string, text string, tool string,
  *    ts timestamp)
  * (schema per /root/repo/BASELINE.json input_hint; fixture contract in
  * /root/repo/FIXTURES.md §4).
  *
  * Every cell is a pure function of (seed, conversation id, turn index) built
  * from `xxhash64` — the SAME rows are produced at any parallelism, any
  * partitioning, any scale prefix. Generation is fully distributed (a
  * `spark.range` → expression pipeline; no driver-side data, no UDFs —
  * everything whole-stage-codegen'd), so the generator itself scales to the
  * 10^9-turn bench slice.
  *
  * Violations are injected per independent hash channel at configurable
  * rates, so expected counts are exactly computable by re-running the same
  * predicate — tests assert closed-form agreement.
  */
/** Typed row of the transcripts table (exact input-hint schema). */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: java.sql.Timestamp)

final case class TranscriptConfig(
    numConvs: Long = 1000L,
    seed: Long = 42L,
    minTurns: Int = 4,
    turnSpread: Int = 28, // conv length = minTurns + hash % turnSpread
    hotConvExtraTurns: Long = 0L, // skew: extra turns appended to conv 0
    nullTextPerMille: Int = 5,
    nullRolePerMille: Int = 3,
    badRolePerMille: Int = 4, // numeric-string role (type conformance)
    badConvIdPerMille: Int = 3, // malformed conv_id (pattern rule)
    negTurnPerMille: Int = 2, // negative turn_idx (range rule)
    orphanPerMille: Int = 4, // conv_id absent from the conversation index
    dupKeyPerMille: Int = 3, // duplicated (conv_id, turn_idx) rows
    /** drift knobs: shift role mix and text length for a second snapshot */
    roleDriftShift: Int = 0,
    textLenShift: Int = 0
)

object Transcripts {

  private val roles = Seq("user", "assistant", "system", "tool")
  private val tools = Seq("bash", "search", "edit", "read", "write", "browse")
  private val vocab: Seq[String] = {
    // deterministic pseudo-vocabulary; sized so texts have realistic
    // shingle diversity for the dedup/similarity operators
    val syll = Seq("ka", "ro", "mi", "ta", "ne", "su", "lo", "vi", "pe", "da",
      "qu", "an", "tor", "bel", "gra", "zin", "mur", "fex", "pol", "hes")
    for (a <- syll; b <- syll) yield a + b
  }.take(256)

  private def chan(seed: Long, name: String, cols: Column*): Column =
    pmod(xxhash64((lit(seed) +: lit(name) +: cols): _*), lit(1000L))

  /** The transcripts table. Columns exactly per the input hint. */
  def turns(spark: SparkSession, cfg: TranscriptConfig): DataFrame = {
    val convs = spark.range(cfg.numConvs).toDF("cid")
    val len = (lit(cfg.minTurns) +
      pmod(xxhash64(lit(cfg.seed), lit("len"), col("cid")), lit(cfg.turnSpread.toLong))).cast("int")
    val base = convs
      .select(col("cid"), explode(sequence(lit(0), len - 1)).as("tix"))

    // skew: conv 0 gets `hotConvExtraTurns` extra (unique) turn indices
    val withHot =
      if (cfg.hotConvExtraTurns <= 0) base
      else base.unionByName(
        spark.range(cfg.hotConvExtraTurns)
          .select(lit(0L).as("cid"), (col("id") + 10000L).cast("int").as("tix")))

    val rows = decorate(withHot, cfg)

    // duplicated (conv_id, turn_idx) keys: re-emit an exact copy of selected
    // rows (text identical → the per-turn text-equality invariant holds)
    val dups = rows.filter(
      chan(cfg.seed, "dup", col("conv_id"), col("turn_idx")) < lit(cfg.dupKeyPerMille.toLong))
    val all = rows.unionByName(dups)
    // the unions stack partitions (range ∪ hot ∪ dups ⇒ up to 4× the session
    // parallelism of near-empty slices); every downstream job over a cached
    // copy would launch that many tasks. Coalesce back to the session's
    // parallelism — pure task merging, no exchange, rows unchanged.
    val par = math.max(spark.sparkContext.defaultParallelism, 1)
    all.coalesce(par)
  }

  private def decorate(ct: DataFrame, cfg: TranscriptConfig): DataFrame = {
    val seed = cfg.seed
    val cid = col("cid"); val tix = col("tix")
    def h(name: String): Column = chan(seed, name, cid, tix)

    // role: conversation-structured — turn 0 user, then alternating with a
    // sprinkle of tool/system turns; drift shifts the tool/system share
    val toolCut = lit(math.min(150 + cfg.roleDriftShift, 900).toLong)
    val roleBase = when(tix % 2 === 0, lit("user"))
      .otherwise(
        when(h("roletool") < toolCut, lit("tool"))
          .when(h("rolesys") < lit(40L), lit("system"))
          .otherwise(lit("assistant")))
    val role = when(h("nullrole") < lit(cfg.nullRolePerMille.toLong), lit(null).cast("string"))
      .when(h("badrole") < lit(cfg.badRolePerMille.toLong),
        (pmod(xxhash64(lit(seed), lit("badroleval"), cid, tix), lit(100000L))).cast("string"))
      .otherwise(roleBase)

    val tool = when(roleBase === "tool",
      element_at(typedLit(tools), (pmod(xxhash64(lit(seed), lit("tool"), cid, tix), lit(tools.size.toLong)) + 1).cast("int")))
      .otherwise(lit(null).cast("string"))

    // text: nw pseudo-words, log-normal-ish length via squaring a uniform
    val u = pmod(xxhash64(lit(seed), lit("tlen"), cid, tix), lit(32L))
    val nw = (lit(3 + cfg.textLenShift) + (u * u) / lit(4)).cast("int")
    val words = transform(sequence(lit(0), nw - 1),
      j => element_at(typedLit(vocab),
        (pmod(xxhash64(lit(seed), lit("w"), cid, tix, j), lit(vocab.size.toLong)) + 1).cast("int")))
    val text = when(h("nulltext") < lit(cfg.nullTextPerMille.toLong), lit(null).cast("string"))
      .otherwise(array_join(words, " "))

    val convIdBase = format_string("conv-%08x", cid)
    val convId = when(h("badconv") < lit(cfg.badConvIdPerMille.toLong),
        format_string("BAD ID %d", cid))
      .when(h("orphan") < lit(cfg.orphanPerMille.toLong),
        format_string("orph-%08x", cid))
      .otherwise(convIdBase)

    val turnIdx = when(h("negturn") < lit(cfg.negTurnPerMille.toLong), lit(-1))
      .otherwise(tix)

    // monotone within conversation: base epoch + conv offset + turn seconds
    val ts = timestamp_seconds(lit(1700000000L) + cid * 300L + tix.cast("long") * 7L)

    ct.select(
      convId.as("conv_id"),
      turnIdx.cast("int").as("turn_idx"),
      role.as("role"),
      text.as("text"),
      tool.as("tool"),
      ts.as("ts"))
  }

  /** Typed view of [[turns]] — compile-time field checks for user code
    * (`ds.filter(_.role == "tool")`); the untyped plan is identical. */
  def turnsTyped(spark: SparkSession, cfg: TranscriptConfig): org.apache.spark.sql.Dataset[Turn] = {
    import spark.implicits._
    turns(spark, cfg).as[Turn]
  }

  /** The conversation index (dimension side of the referential check):
    * exactly the well-formed conv ids the generator can emit. */
  def convIndex(spark: SparkSession, cfg: TranscriptConfig): DataFrame =
    spark.range(cfg.numConvs).select(format_string("conv-%08x", col("id")).as("conv_id"))

  /** Second snapshot with drifted role mix + text lengths (chi-square / KS
    * drift checks must fire against the base config). */
  def drifted(cfg: TranscriptConfig): TranscriptConfig =
    cfg.copy(seed = cfg.seed + 1, roleDriftShift = 350, textLenShift = 6)
}

package graft.engine

import graft.io.DataFile

/** Per-file verdict classification over a snap table's footer statistics —
  * the pure half of [[Validator.validateSnapStatsFirst]]'s metadata-only
  * validation tier. Given one manifest [[DataFile]] and a bounded per-row
  * predicate, decide whether the file's footer range PROVES every row
  * passes, proves every non-null row fails, or proves nothing (scan it).
  *
  * The decisions are exact, never heuristic: a file is only classified
  * when its stat kind is the rule's own comparison domain ("long" — the
  * integral/epoch-micros kinds [[graft.io.SnapTable]] records; every
  * unorderable footer type was already degraded to `hasMinMax = false` at
  * commit time), and range comparisons happen in DOUBLE, the domain Spark
  * itself compares in when an integral column meets the rule's double
  * literals — so classification can never disagree with the scan it
  * replaces (long→double conversion is monotonic, making the converted
  * file bounds the true bounds of the converted row values).
  *
  * Reference anchor: the reference validates every rule with a full
  * `filter().count()` scan (`/root/reference/src/data_validator/engines/
  * pyspark_engine.py:72-123`); deciding verdicts from table-format
  * metadata is the north-rule extension that makes a 10^12-turn
  * "turn_idx in range" check a manifest read instead of a table scan.
  */
private[engine] object StatsTier {

  /** How one data file contributes to a bounded-predicate failure count. */
  sealed trait FileClass
  /** Every row provably passes: contributes zero failed rows. */
  case object AllPass extends FileClass
  /** Every non-null row provably fails: contributes `failed` rows
    * (rowCount − nullCount; NULLs never fail a bounded row rule). */
  final case class AllFail(failed: Long) extends FileClass
  /** The footer range straddles a bound, or the file carries no usable
    * bound for the column: only a scan can count it. */
  case object NeedsScan extends FileClass

  /** Shared spine: resolve the column's stat, dispose of the provable
    * degenerate cases, and hand a usable [min, max] pair to `decide`.
    *  - no stat entry at all = a pre-evolution file (the column reads as
    *    NULL for every row, and NULLs never fail a bounded rule);
    *  - `hasMinMax = false` with nullCount = rowCount = an all-null file
    *    (same conclusion); any other boundless stat must be scanned;
    *  - a stat outside the "long" comparison kind must be scanned too —
    *    never decide from a domain the rule doesn't compare in. */
  private def classify(file: DataFile, column: String)(
      decide: (Long, Long) => FileClass): FileClass =
    file.stats.get(column) match {
      case None => AllPass
      case Some(st) if !st.hasMinMax =>
        if (st.nullCount == file.rowCount) AllPass else NeedsScan
      case Some(st) if st.kind != "long" => NeedsScan
      case Some(st) => decide(st.min.toLong, st.max.toLong)
    }

  private def nonNullRows(file: DataFile, column: String): Long =
    file.rowCount - file.stats.get(column).map(_.nullCount).getOrElse(0L)

  /** Classify `file` for an inclusive range rule [lo, hi] on an integral
    * column ([[RulePlanner.rangeFailCond]] semantics: a non-null value
    * outside the bounds fails; an absent bound side is unbounded). */
  def classifyRange(file: DataFile, column: String,
      lo: Option[Double], hi: Option[Double]): FileClass =
    classify(file, column) { (mnL, mxL) =>
      val mn = mnL.toDouble
      val mx = mxL.toDouble
      if (lo.forall(mn >= _) && hi.forall(mx <= _)) AllPass
      else if (lo.exists(mx < _) || hi.exists(mn > _))
        AllFail(nonNullRows(file, column))
      else NeedsScan
    }

  /** Classify `file` for a freshness rule ([[RulePlanner.freshnessFailCond]]
    * semantics: a non-null timestamp strictly older than the cutoff fails).
    * Timestamp footer stats are epoch micros — the cutoff's own domain, so
    * the comparison is exact integer math. */
  def classifyFreshness(file: DataFile, column: String,
      cutoffMicros: Long): FileClass =
    classify(file, column) { (mn, mx) =>
      if (mn >= cutoffMicros) AllPass
      else if (mx < cutoffMicros) AllFail(nonNullRows(file, column))
      else NeedsScan
    }
}

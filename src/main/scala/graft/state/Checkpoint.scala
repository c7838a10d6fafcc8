package graft.state

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Resumable pipeline state with per-partition lineage + metrics.
  *
  * Superset of the reference's `PipelineState` (`/root/reference/src/
  * data_validator/state.py:9-40`, a flat {table: "completed"} JSON file):
  * here each table carries a snapshot id and a partition map
  * {partition -> {status, rowCount, metrics}} so a resumed run can
  * revalidate only partitions that are new/changed since the recorded
  * snapshot (north rule: "resumable from checkpoint with per-partition
  * lineage + metrics").
  *
  * Snapshot id = content hash of the table's partition file listing
  * (name+size+mtime) — the same role an Iceberg snapshot id plays; the
  * checkpoint records it so a real Iceberg catalog can slot in unchanged.
  * Writes are atomic (tmp file + move) so a crash never corrupts state.
  */
final case class PartitionState(
    status: String, // "completed" | "failed" | "pending"
    rowCount: Long = 0L,
    metrics: Map[String, String] = Map.empty)

final case class TableState(
    status: String,
    snapshotId: String = "",
    partitions: Map[String, PartitionState] = Map.empty,
    metrics: Map[String, String] = Map.empty,
    /** Fingerprint of the rule suite the completion was computed under
      * ([[graft.engine.Validator.suiteFingerprint]]). A "completed" entry
      * only authorizes a skip while the suite is UNCHANGED: edit a
      * threshold, add a rule, or re-tag the selection and the stored hash
      * no longer matches, so the table re-validates instead of serving a
      * verdict nobody computed. Empty = legacy/unfingerprinted completion
      * (pre-hash checkpoint files, or callers outside the validator) —
      * those keep the reference's unconditional-skip contract
      * (`state.py:9-40` has no notion of suite identity). */
    suiteHash: String = "")

class Checkpoint(path: String) {
  private implicit val formats: Formats = DefaultFormats
  private var tables: Map[String, TableState] = load()

  private def load(): Map[String, TableState] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) Map.empty
    else {
      val txt = Files.readString(p)
      if (txt.trim.isEmpty) Map.empty
      else JsonMethods.parse(txt).extract[Map[String, TableState]]
    }
  }

  private def save(): Unit = {
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val tmp: Path = Paths.get(path + ".tmp")
    Files.writeString(tmp, Serialization.writePretty(tables))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def isCompleted(table: String): Boolean =
    tables.get(table).exists(_.status == "completed")

  /** Completed UNDER THIS RULE SUITE: the skip is only sound if the suite
    * that produced the recorded verdicts is the suite this run would
    * execute. Either side empty means "suite identity unknown" and falls
    * back to the legacy unconditional skip (old checkpoint files keep
    * working; a caller that never fingerprints is unaffected). */
  def isCompleted(table: String, suiteHash: String): Boolean =
    tables.get(table).exists(ts => ts.status == "completed" &&
      (ts.suiteHash.isEmpty || suiteHash.isEmpty || ts.suiteHash == suiteHash))

  def isPartitionCompleted(table: String, partition: String): Boolean =
    tables.get(table).exists(_.partitions.get(partition).exists(_.status == "completed"))

  /** Partitions of `table` still needing validation given the current
    * snapshot: all of them if the snapshot changed, else only non-completed. */
  def pendingPartitions(table: String, snapshotId: String, all: Seq[String]): Seq[String] =
    tables.get(table) match {
      case Some(ts) if ts.snapshotId == snapshotId =>
        all.filterNot(p => ts.partitions.get(p).exists(_.status == "completed"))
      case _ => all
    }

  def markCompleted(table: String, metrics: Map[String, String] = Map.empty,
                    suiteHash: String = ""): Unit = synchronized {
    val prev = tables.getOrElse(table, TableState("pending"))
    // the hash is overwritten (not merged): it describes THIS completion.
    // An empty hash from a fingerprint-less caller deliberately downgrades
    // the entry to legacy skip semantics — honest about what was recorded.
    tables += table -> prev.copy(status = "completed",
      metrics = prev.metrics ++ metrics, suiteHash = suiteHash)
    save()
  }

  def markPartition(table: String, partition: String, snapshotId: String,
                    rowCount: Long, metrics: Map[String, String] = Map.empty,
                    status: String = "completed"): Unit = synchronized {
    val prev = tables.getOrElse(table, TableState("pending"))
    val partState = PartitionState(status, rowCount, metrics)
    val allDone = (prev.partitions + (partition -> partState)).values.forall(_.status == "completed")
    tables += table -> prev.copy(
      status = if (allDone && status == "completed") prev.status else "pending",
      snapshotId = snapshotId,
      partitions = prev.partitions + (partition -> partState))
    save()
  }

  /** Record the table snapshot a run validated up to (without touching
    * partition lineage) — the cursor the incremental tier resumes from:
    * a later run validates only `SnapTable.changes(recorded, current)`. */
  def recordSnapshot(table: String, snapshotId: String): Unit = synchronized {
    val prev = tables.getOrElse(table, TableState("pending"))
    tables += table -> prev.copy(snapshotId = snapshotId)
    save()
  }

  /** The snap-table cursor recorded for `table`: (lineage id if one was
    * recorded, version). Formats: `snap-v<N>` (legacy, no id) and
    * `snap-<id>-v<N>`. The id is what stops a cursor from one table
    * incarnation being read as progress on a wiped-and-recreated one. */
  def recordedSnapCursor(table: String): Option[(Option[String], Long)] =
    tables.get(table).map(_.snapshotId).flatMap {
      case Checkpoint.SnapCursorRe(id, v) => Some((Option(id), v.toLong))
      case _ => None
    }

  /** The snap-table version recorded for `table`, id-blind. */
  def recordedSnapVersion(table: String): Option[Long] =
    recordedSnapCursor(table).map(_._2)

  def completedTables: Set[String] = tables.filter(_._2.status == "completed").keySet
  def tableState(table: String): Option[TableState] = tables.get(table)

  def reset(): Unit = synchronized { tables = Map.empty; save() }
}

object Checkpoint {
  /** `snap-v<N>` or `snap-<dashfree-id>-v<N>`. */
  private val SnapCursorRe = """snap-(?:([0-9a-f]+)-)?v(\d+)""".r

  /** Render a snap cursor for [[Checkpoint.recordSnapshot]]. */
  def snapCursor(tableId: Option[String], version: Long): String =
    tableId.map(id => s"snap-$id-v$version").getOrElse(s"snap-v$version")

  /** Snapshot id of a directory of data files: order-independent hash of
    * (relative name, size, mtime) — cheap (metadata only), deterministic,
    * changes iff the file set changes. Stand-in for an Iceberg snapshot id. */
  def snapshotId(dir: String): String = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) return "absent"
    val stream = Files.walk(root)
    try {
      val entries = stream.filter(Files.isRegularFile(_)).toArray.map(_.asInstanceOf[Path])
        .map(p => s"${root.relativize(p)}:${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}")
        .sorted
      val md = java.security.MessageDigest.getInstance("MD5")
      entries.foreach(e => md.update(e.getBytes("UTF-8")))
      md.digest().map("%02x".format(_)).mkString
    } finally stream.close()
  }
}

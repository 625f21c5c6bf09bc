package graft.config

import java.sql.Timestamp
import java.time.Instant

import org.json4s.{CustomSerializer, DefaultFormats, Formats}
import org.json4s.JsonAST.JString
import org.json4s.jackson.Serialization

import graft.model.ExtractionConfig

/** Durable extraction-config store: the engine's analog of the
  * reference's MongoDB config collection (SURVEY.md §2.1 S6/K4;
  * mongodbHelper.py:56-121, priorityDataSource.py:584-626), backed by a
  * JSON file with ATOMIC rewrites (write-temp + atomic rename), so a
  * crash mid-update leaves the previous consistent state on disk and a
  * restart never loses watermarks.
  *
  * Observable semantics reproduced:
  *   - [[insert]] stamps `submitTimestampUTC` server-side and appends a
  *     new config VERSION (insert_one, mongodbHelper.py:98-112);
  *   - [[latest]] is the top-1-by-submitTimestampUTC read the reference
  *     does on every request (find_one + sort DESC, :75-77 — operator
  *     A2);
  *   - [[updateLastRun]] modifies one entity's watermark INSIDE the
  *     latest version in place — the arrayFilters nested update
  *     (:113-121, priorityDataSource.py:600-621);
  *   - [[saveWatermarks]] persists a whole post-run config (what
  *     RefreshJob returns), entity-by-entity equivalent to the above.
  *
  * This is driver-side control-plane state (KBs, one doc per
  * datasource) — a file + atomic rename is the right tool; the data
  * plane never touches it.
  */
final class ConfigStore(path: String) {

  private implicit val fmts: Formats =
    DefaultFormats + ConfigStore.TimestampSerializer

  def loadAll(): Seq[ExtractionConfig] =
    AtomicJsonFile.readString(path)
      .map(Serialization.read[Seq[ExtractionConfig]](_))
      .getOrElse(Nil)

  private def writeAll(configs: Seq[ExtractionConfig]): Unit =
    AtomicJsonFile.writeString(path, Serialization.writePretty(configs))

  /** Append a new config version, stamping submitTimestampUTC
    * server-side. Returns the stamped config. */
  def insert(config: ExtractionConfig): ExtractionConfig = {
    val stamped = config.copy(
      submitTimestampUtc = Some(Timestamp.from(Instant.now())))
    writeAll(loadAll() :+ stamped)
    stamped
  }

  /** Latest config version for a datasource id (A2: top-1 by submit
    * timestamp, ties broken by insertion order — last wins). */
  def latest(id: String): Option[ExtractionConfig] =
    loadAll().filter(_.id == id).zipWithIndex
      .sortBy { case (c, i) => (c.submitTimestampUtc.map(_.getTime).getOrElse(0L), i.toLong) }
      .lastOption.map(_._1)

  /** Nested watermark update on the latest version of `id`: set
    * `entities[EntityID == entityId].lastRun` in place. */
  def updateLastRun(id: String, entityId: String, lastRun: String): Unit =
    replaceLatest(id, c => c.copy(entities = c.entities.map {
      case e if e.entityId == entityId => e.copy(lastRun = Some(lastRun))
      case e => e
    }))

  /** Persist all watermarks of a post-run config into the latest stored
    * version (the per-entity updateLastRun loop the reference runs after
    * each load, priorityDataSource.py:218). */
  def saveWatermarks(updated: ExtractionConfig): Unit = {
    val byEntity = updated.entities.map(e => e.entityId -> e.lastRun).toMap
    replaceLatest(updated.id, c => c.copy(entities = c.entities.map { e =>
      byEntity.get(e.entityId).flatten match {
        case Some(lr) => e.copy(lastRun = Some(lr))
        case None     => e
      }
    }))
  }

  private def replaceLatest(id: String, f: ExtractionConfig => ExtractionConfig): Unit = {
    val all = loadAll()
    latest(id) match {
      case None => ()
      case Some(cur) =>
        // replace the LAST occurrence equal to the latest version
        val idx = all.lastIndexOf(cur)
        writeAll(all.updated(idx, f(cur)))
    }
  }
}

object ConfigStore {
  /** java.sql.Timestamp <-> "yyyy-mm-dd hh:mm:ss.fffffffff" JSON string. */
  object TimestampSerializer extends CustomSerializer[Timestamp](_ => (
    { case JString(s) => Timestamp.valueOf(s) },
    { case t: Timestamp => JString(t.toString) }))
}

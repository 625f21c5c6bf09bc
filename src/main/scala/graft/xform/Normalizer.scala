package graft.xform

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructType}

import graft.catalog.SchemaRegistry.{ExtractionIdCol, ExtractionTsCol}

/** Parent/child normalization of a fetched entity frame — the Spark-first
  * re-expression of the reference's `parsingDf`
  * (priorityDataSource.py:740-816, SURVEY.md §2.5 G1):
  *
  *   - subform columns (`array<struct>` named `*_SUBFORM`) are exploded
  *     into one child DataFrame each, carrying the parent PK columns
  *     (the reference's `json_normalize(record_path, meta=pk)`);
  *   - rows with empty/null subform arrays contribute no child rows
  *     (plain `explode` drops them — matches the empty-subform skip at
  *     priorityDataSource.py:795);
  *   - the parent frame drops the subform columns (P1);
  *   - every identifier is lowercased (P2);
  *   - every frame is stamped with audit lineage columns (P3);
  *   - PK columns are cast to string, reproducing the PK→String(255)
  *     typing rule (sqlDwh.py:346-350).
  *
  * All of this is narrow, codegen-friendly work: `explode` is a built-in
  * `Generator` inside whole-stage codegen; no shuffle is introduced —
  * children arrive pre-joined via `$expand` (SURVEY.md §2.3 J2).
  */
object Normalizer {

  /** Result of normalizing one entity payload: the parent frame plus one
    * child frame per non-empty subform, keyed by child entity name
    * (subform name lowercased, `_subform` suffix stripped — the
    * reference's table naming at priorityDataSource.py:803-806). */
  final case class Normalized(entityName: String, parent: DataFrame, children: Map[String, DataFrame])

  private val SubformSuffix = "_subform"

  /** Columns that hold nested subform arrays. */
  def subformColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.name.toLowerCase.endsWith(SubformSuffix) &&
        f.dataType.isInstanceOf[ArrayType] &&
        f.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType] => f.name
    }.toSeq

  private def lowercased(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase).toIndexedSeq: _*)

  private def withAudit(df: DataFrame, extractionId: String, ts: Timestamp): DataFrame =
    df.withColumn(ExtractionIdCol, lit(extractionId))
      .withColumn(ExtractionTsCol, lit(ts))

  private def castPk(df: DataFrame, pk: Seq[String]): DataFrame =
    pk.foldLeft(df)((d, k) =>
      if (d.columns.contains(k)) d.withColumn(k, col(k).cast("string")) else d)

  def normalize(
      entityId: String,
      df: DataFrame,
      pk: Seq[String],
      extractionId: String,
      ts: Timestamp): Normalized = {

    val subforms = subformColumns(df)
    val pkLower = pk.map(_.toLowerCase)

    val parent = withAudit(
      castPk(lowercased(df.drop(subforms: _*)), pkLower), extractionId, ts)

    val children = subforms.map { sc =>
      val childName = sc.toLowerCase.stripSuffix(SubformSuffix)
      // Parent-PK propagation: select pk + explode(subform) — explode
      // preserves the parent key on every emitted child row with no join.
      // PK columns already present inside the subform struct are not
      // duplicated (the child carries its own copy).
      val structFields = df.schema(sc).dataType
        .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
        .fieldNames.map(_.toLowerCase).toSet
      val pkToAdd = pk.filterNot(k => structFields.contains(k.toLowerCase))
      val exploded = df
        .select(pkToAdd.map(col) :+ explode(col(sc)).as("__r"): _*)
        .select(pkToAdd.map(col) :+ col("__r.*"): _*)
      childName -> withAudit(castPk(lowercased(exploded), pkLower), extractionId, ts)
    }.toMap

    Normalized(entityId.toLowerCase, parent, children)
  }

  /** Normalize a FLAT fetch (graft.sources.FlatFetch): same contract as
    * [[normalize]] — lowercase, audit stamp, PK→String, parent-PK
    * propagation into each child — but with children that are already
    * separate frames, so no explode (and, upstream, no collect_list
    * nest) ever happens. Parent-PK propagation is a column copy when the
    * PK is the join key itself, or a key join against the parent
    * projection for composite PKs.
    */
  def normalizeFlat(
      entityId: String,
      flat: graft.sources.FlatFetch,
      pk: Seq[String],
      extractionId: String,
      ts: Timestamp): Normalized = {

    val pkLower = pk.map(_.toLowerCase)
    val parent = withAudit(
      castPk(lowercased(flat.parent), pkLower), extractionId, ts)

    val children = flat.children.map { case (sub, c) =>
      val childName = sub.toLowerCase.stripSuffix(SubformSuffix)
      val childCols = c.df.columns.map(_.toLowerCase).toSet
      val pkToAdd = pk.filterNot(k => childCols.contains(k.toLowerCase))
      val propagated =
        if (pkToAdd.isEmpty) c.df
        else if (pkToAdd.forall(_.equalsIgnoreCase(c.parentKey)))
          // PK == join key: the value is already on the child row
          c.df.withColumn(c.parentKey.toLowerCase, col(c.childKey))
        else {
          // composite parent PK: join the parent's key projection
          val sel = (Seq(c.parentKey) ++ pkToAdd).distinct
          val keys = flat.parent.select(sel.map(col): _*)
          val joined = c.df.join(keys, c.df(c.childKey) === keys(c.parentKey))
          if (pkToAdd.exists(_.equalsIgnoreCase(c.parentKey))) joined
          else joined.drop(keys(c.parentKey))
        }
      childName -> withAudit(castPk(lowercased(propagated), pkLower), extractionId, ts)
    }

    Normalized(entityId.toLowerCase, parent, children)
  }
}

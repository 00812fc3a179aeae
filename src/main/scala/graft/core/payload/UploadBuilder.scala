package graft.core.payload

import graft.core.schema.{ColumnSpec, ResolvedColumns}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Upload-payload assembly.
  *
  * The reference builds the `uploads` struct by chaining one Python UDF per
  * metadata/attachment/annotation column (labelspark/uploader.py:162-195,
  * U1-U4 in SURVEY §2.7) — N+M+K pickle round-trips per row, opaque to
  * Catalyst. Here the whole payload is ONE `select` of native column
  * expressions (struct/array/when/coalesce/filter): codegen'd end-to-end,
  * prunable, and with the broadcast-dict-as-JSON-literal trick (J3) replaced
  * by plain literal maps resolved at plan time.
  *
  * Payload shape (uploader.py:143-153):
  *   data_row: {row_data, global_key, external_id, metadata_fields, attachments}
  *   + dataset_id, project_id, annotations.
  * Defaulting contract (client.py:227-235): global_key ← row_data,
  * external_id ← global_key.
  */
object UploadBuilder {

  final case class Config(
      datasetId: Option[String] = None,
      projectId: Option[String] = None,
      /** metadata display name → schema id (the reference fetches this map
        * from the API at uploader.py:154-155; callers supply it here). */
      metadataSchemaIds: Map[String, String] = Map.empty,
      divider: String = ColumnSpec.DefaultDivider,
      /** Mask cell format (client.py:49-52): png | url | array. */
      maskMethod: String = "png")

  /** Resolved global-key column (defaulting contract: global_key ←
    * row_data, client.py:227-235).
    */
  def globalKeyColumn(rc: ResolvedColumns): Column =
    coalesce(rc.globalKey.map(c => col(s"`$c`")).toSeq :+ col(s"`${rc.rowData}`"): _*)

  /** The `uploads` column for a table with the given resolved columns. */
  def uploadsColumn(rc: ResolvedColumns, cfg: Config): Column = {
    val rowData   = col(s"`${rc.rowData}`")
    val globalKey = coalesce(rc.globalKey.map(c => col(s"`$c`")).toSeq :+ rowData: _*)
    val externalId =
      coalesce(rc.externalId.map(c => col(s"`$c`")).toSeq ++
        rc.globalKey.map(c => col(s"`$c`")).toSeq :+ rowData: _*)

    struct(
      struct(
        rowData.as("row_data"),
        globalKey.as("global_key"),
        externalId.as("external_id"),
        metadataFields(rc.metadata, cfg).as("metadata_fields"),
        attachments(rc.attachments).as("attachments")
      ).as("data_row"),
      idColumn(rc.datasetId, cfg.datasetId).as("dataset_id"),
      idColumn(rc.projectId, cfg.projectId).as("project_id"),
      annotationCells(rc.annotations).as("annotations"))
  }

  def withUploads(df: DataFrame, rc: ResolvedColumns, cfg: Config): DataFrame =
    df.withColumn("uploads", uploadsColumn(rc, cfg))

  /** Column value wins over configured literal (client.py:371-382 contract:
    * per-row ids override the call-level default).
    */
  private def idColumn(fromCol: Option[String], fromCfg: Option[String]): Column =
    (fromCol, fromCfg) match {
      case (Some(c), Some(v)) => coalesce(col(s"`$c`"), lit(v))
      case (Some(c), None)    => col(s"`$c`")
      case (None, Some(v))    => lit(v)
      case (None, None)       => lit(null).cast("string")
    }

  /** uploader.py:176-184/223-233 (U2): one {schema_id, value} entry per
    * non-null metadata column, names translated through the schema-id map
    * when available. Built as array+filter — a single expression, not a UDF
    * chain.
    */
  private def metadataFields(specs: Seq[ColumnSpec], cfg: Config): Column =
    nonNullEntries(specs.map { m =>
      val schemaId = cfg.metadataSchemaIds.getOrElse(m.name, m.name)
      when(col(s"`${m.raw}`").isNotNull,
        struct(
          lit(schemaId).as("schema_id"),
          col(s"`${m.raw}`").cast("string").as("value")))
    }, "array<struct<schema_id:string,value:string>>")

  /** uploader.py:169-173/235-240 (U3): {type, value} per non-null attachment
    * column.
    */
  private def attachments(specs: Seq[ColumnSpec]): Column =
    nonNullEntries(specs.map { a =>
      when(col(s"`${a.raw}`").isNotNull,
        struct(
          lit(a.tpe).as("type"),
          col(s"`${a.raw}`").cast("string").as("value")))
    }, "array<struct<type:string,value:string>>")

  /** Raw annotation cells carried along for the ndjson kernel (U4) — kept as
    * {tool_type, name, cell} so downstream parsing needs no column-name
    * introspection.
    */
  private def annotationCells(specs: Seq[ColumnSpec]): Column =
    nonNullEntries(specs.map { a =>
      when(col(s"`${a.raw}`").isNotNull,
        struct(
          lit(a.tpe).as("tool_type"),
          lit(a.name).as("name"),
          col(s"`${a.raw}`").cast("string").as("cell")))
    }, "array<struct<tool_type:string,name:string,cell:string>>")

  private def nonNullEntries(entries: Seq[Column], emptyType: String): Column =
    if (entries.isEmpty) array().cast(emptyType)
    else filter(array(entries: _*), _.isNotNull)

  /** F8 (client.py:10 uuid4 import; metadata notebook cell 14): duplicate
    * global keys get a `-<uuid>` suffix so the upload API accepts every
    * row; the first occurrence per key keeps the original. One window
    * shuffle on the key — each suffix is generated executor-side (uuid()
    * is per-row codegen; no driver round trip).
    */
  def suffixDuplicateKeys(df: DataFrame, keyCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(s"`$keyCol`")).orderBy(col(s"`$keyCol`"))
    df.withColumn("__rn", row_number().over(w))
      .withColumn(keyCol,
        when(col("__rn") === 1, col(s"`$keyCol`"))
          .otherwise(concat(col(s"`$keyCol`"), lit("-"), expr("uuid()"))))
      .drop("__rn")
  }
}

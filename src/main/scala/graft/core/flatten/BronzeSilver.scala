package graft.core.flatten

import graft.core.schema.SchemaFlattener
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bronze→silver refinement: nested label exports → analytics-friendly wide
  * table. Reference semantics: labelspark/bronze_to_silver.py:13-76 — flatten
  * the bronze schema, extract one column per classification title, add
  * `<title>.count` columns per object, and join back to the flat bronze on
  * DataRowID (+ frameNumber for video).
  *
  * The reference iterates every row on the driver
  * (bronze_to_silver.py:24-27 pandas iterrows). Here the whole refinement is
  * distributed: explode → normalize → pivot. The only driver-side step is
  * discovering the pivot columns (distinct classification/object titles),
  * which is ontology-sized — hundreds, never data-sized — and the reference
  * makes the same cardinality assumption by building one dict key per title.
  *
  * Answer-normalization chain (bronze_to_silver.py:33-41 +
  * add_json_answers_to_dictionary.py:16-32): radio answers contribute their
  * `title`; checklists fall back from `answer` to `answers`, joining titles
  * with ","; free text passes through.
  */
object BronzeSilver {

  /** Column-name constants (reference renames at bronze_to_silver.py:15-23). */
  val DataRowId = "DataRowID"
  val RawDataRowId = "DataRow ID"
  val FrameNumber = "frameNumber"

  /** Normalized classification answer for one exploded classification struct:
    * coalesce over the reference's fallback chain, tolerant of whichever
    * fields the export schema actually has (`st` is the struct's type,
    * resolved from the bronze schema — unresolved Columns carry no types).
    */
  private def answerText(c: Column, st: StructType): Column = {
    val candidates = Seq(
      st.find(_.name == "answer").flatMap { f =>
        f.dataType match {
          // radio: {"answer": {"title": ...}}
          case s: StructType if s.fieldNames.contains("title") =>
            Some(c.getField("answer").getField("title"))
          case _: StructType => None
          // String answer: either free text OR a JSON-serialized
          // {"title": ...} (schema inference unifies mixed struct/string
          // fields to string — the reference literal-evals exactly this
          // case, add_json_answers_to_dictionary.py:6-14 / F4).
          case _ => Some(coalesce(
            get_json_object(c.getField("answer"), "$.title"),
            c.getField("answer").cast("string")))
        }
      },
      // checklist: {"answers": [{"title": ...}, ...]}
      st.find(_.name == "answers").flatMap { f =>
        f.dataType match {
          case ArrayType(s: StructType, _) if s.fieldNames.contains("title") =>
            Some(array_join(transform(c.getField("answers"), x => x.getField("title")), ","))
          case ArrayType(_, _) | StringType =>
            // JSON-serialized answers array (same inference unification).
            Some(array_join(
              transform(
                from_json(c.getField("answers").cast("string"),
                  ArrayType(StructType(Seq(StructField("title", StringType))))),
                x => x.getField("title")), ","))
          case _ => None
        }
      }
    ).flatten
    if (candidates.isEmpty) lit(null).cast("string")
    else coalesce(candidates.map(_.cast("string")) :+ lit(null).cast("string"): _*)
  }

  /** The classifications wide table: one column per classification title,
    * first answer wins per row (the reference's first-wins dict population,
    * add_json_answers_to_dictionary.py:34-36).
    */
  def classificationsWide(bronze: DataFrame, keys: Seq[String],
      classificationsCol: Column): DataFrame = {
    val elemType = bronze.select(classificationsCol).schema.head.dataType match {
      case ArrayType(s: StructType, _) => s
      case other => throw new IllegalArgumentException(s"classifications must be array<struct>, got $other")
    }
    val exploded = bronze
      .select(keys.map(k => col(s"`$k`")) :+ explode_outer(classificationsCol).as("c"): _*)
      .select(keys.map(k => col(s"`$k`")) :+ col("c.title").as("title")
        :+ answerText(col("c"), elemType).as("ans"): _*)
    val titles = exploded.select("title").distinct().collect()
      .map(_.getString(0)).filter(_ != null).sorted.toSeq
    exploded.groupBy(keys.map(k => col(s"`$k`")): _*)
      .pivot("title", titles)
      .agg(first(col("ans"), ignoreNulls = true))
  }

  /** The `<title>.count` object-count table (bronze_to_silver.py:47-54,
    * distributed as explode → count → pivot).
    */
  def objectCounts(bronze: DataFrame, keys: Seq[String], objectsCol: Column): DataFrame = {
    val exploded = bronze
      .select(keys.map(k => col(s"`$k`")) :+ explode_outer(objectsCol).as("o"): _*)
      .select(keys.map(k => col(s"`$k`")) :+ col("o.title").as("title"): _*)
    val titles = exploded.select("title").distinct().collect()
      .map(_.getString(0)).filter(_ != null).sorted.toSeq
    val counted = exploded.groupBy(keys.map(k => col(s"`$k`")): _*)
      .pivot("title", titles)
      .agg(count(col("title")))
    titles.foldLeft(counted)((d, t) => d.withColumnRenamed(t, s"$t.count"))
  }

  /** Full bronze→silver: flatten, classification wide columns, object
    * counts, rejoin. `videoMode` adds frameNumber to the join key
    * (bronze_to_silver.py:68-72 — J2, avoids the N² frame blowup).
    */
  def bronzeToSilver(bronzeRaw: DataFrame, videoMode: Boolean = false): DataFrame = {
    var bronze = bronzeRaw
    if (bronze.columns.contains(RawDataRowId))
      bronze = bronze.withColumnRenamed(RawDataRowId, DataRowId)
    if (videoMode && bronze.columns.contains("Label.frameNumber"))
      bronze = bronze.withColumnRenamed("Label.frameNumber", FrameNumber)

    val keys = if (videoMode) Seq(DataRowId, FrameNumber) else Seq(DataRowId)
    val hasClassifications = hasPath(bronze.schema, Seq("Label", "classifications"))
    val hasObjects = hasPath(bronze.schema, Seq("Label", "objects"))

    val cls =
      if (hasClassifications)
        Some(classificationsWide(bronze, keys, col("Label.classifications")))
      else None
    val obj =
      if (hasObjects) Some(objectCounts(bronze, keys, col("Label.objects")))
      else None

    val flat = SchemaFlattener.flatten(bronze)
    val joined = Seq(cls, obj).flatten.foldLeft(flat)((d, side) => d.join(side, keys, "left"))
    joined
  }

  private def hasPath(schema: StructType, path: Seq[String]): Boolean =
    path.foldLeft(Option(schema: DataType)) {
      case (Some(s: StructType), name) => s.find(_.name == name).map(_.dataType)
      case _ => None
    }.isDefined
}

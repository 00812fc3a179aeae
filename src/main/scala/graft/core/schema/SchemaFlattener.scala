package graft.core.schema

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Static bronze-table flattener.
  *
  * Replaces the reference's exception-driven probing
  * (labelspark/spark_schema_to_string.py:10-23 walks `schema.jsonValue()`;
  * labelspark/flatten_bronze_table.py:12-28 try/except-selects every dotted
  * path, popping the last segment on failure and deduping parents). Here
  * selectability is decided statically from the `DataType` tree — zero Spark
  * jobs, zero exceptions:
  *
  *   - struct fields are descended unconditionally;
  *   - one array level on a path is selectable (extracting a field from
  *     `array<struct<..>>` yields an array of that field);
  *   - a second array level makes children unselectable, so the array itself
  *     becomes the leaf (= the reference's parent-path fallback);
  *   - maps and every scalar are leaves.
  */
object SchemaFlattener {

  /** Dotted leaf paths in schema order. */
  def leafPaths(schema: StructType): Seq[String] = {
    def walk(dt: DataType, prefix: String, arraysCrossed: Int): Seq[String] = dt match {
      case st: StructType if st.fields.nonEmpty =>
        st.fields.toSeq.flatMap { f =>
          val p = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
          walk(f.dataType, p, arraysCrossed)
        }
      case ArrayType(et: StructType, _) if arraysCrossed == 0 && prefix.nonEmpty =>
        walk(et, prefix, 1)
      case _ =>
        if (prefix.isEmpty) Nil else Seq(prefix)
    }
    walk(schema, "", 0).distinct
  }

  /** One flat projection; output column names are the dotted paths (as in
    * flatten_bronze_table.py:30's `toDF(*cols_to_select)`).
    */
  def flatten(df: DataFrame): DataFrame = {
    val paths = leafPaths(df.schema)
    df.select(paths.map(p => pathCol(df, p).alias(p)): _*)
  }

  /** Resolve a dotted path against possibly dotted physical column names:
    * a literal column named "a.b" wins over field b of struct a (matches the
    * reference, which always selects by the raw string).
    */
  private def pathCol(df: DataFrame, path: String): Column =
    if (df.columns.contains(path)) col(s"`$path`") else col(path)
}

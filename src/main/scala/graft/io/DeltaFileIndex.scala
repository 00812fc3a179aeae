package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  And, AttributeReference, BoundReference, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, IsNotNull, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** A [[FileIndex]] backed entirely by a replayed Delta log — the idiomatic
  * Spark integration point (the same seam delta-core plugs into): the scan
  * planner hands `listFiles` its pushed partition AND data filters, so
  *
  *   - partition pruning evaluates the filters against each file's
  *     log-declared `partitionValues` (no directory listing, no dependence
  *     on hive-style paths), and
  *   - DATA SKIPPING evaluates comparison filters against each file's
  *     `add.stats` min/max (numRecords/minValues/maxValues, the statistics
  *     Delta writers embed per file) — a pruned file is never OPENED,
  *     which on object storage beats parquet row-group skipping (that
  *     still pays a GET per footer).
  *
  * Unsupported filter shapes keep the file (skipping is an optimization,
  * never a correctness decision); missing stats keep the file.
  */
private[io] class DeltaLogFileIndex(
    spark: SparkSession,
    tablePath: String,
    files: Seq[DeltaRead.LiveFile],
    override val partitionSchema: StructType) extends FileIndex {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  override def rootPaths: Seq[Path] = Seq(new Path(tablePath))

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = {
    val s = files.map(_.size).sum
    if (s > 0) s else files.size.toLong * 134217728L
  }

  override def inputFiles: Array[String] =
    files.map(f => DeltaRead.resolveFilePath(tablePath, f.path)).toArray

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val partValues: Map[Map[String, String], InternalRow] =
      files.map(_.partitionValues).distinct
        .map(pv => pv -> partitionRow(pv)).toMap

    val partPred: InternalRow => Boolean =
      if (partitionFilters.isEmpty) _ => true
      else {
        val bound = partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.indexWhere(_.name == a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        }
        val p = Predicate.createInterpreted(bound)
        row => p.eval(row)
      }

    files
      .filter(f => partPred(partValues(f.partitionValues)))
      .filter(f => dataFilters.forall(mayMatch(f, _)))
      .groupBy(_.partitionValues)
      .map { case (pv, fs) =>
        PartitionDirectory(partValues(pv), fs.map(fileStatus).toArray)
      }.toSeq
  }

  private lazy val fs =
    new Path(tablePath).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The parquet reader locates footers by LENGTH, so size must be real:
    * the log's `add.size` is authoritative when present (true in any
    * writer-produced log); a missing/zero size stats the file once.
    */
  private def fileStatus(f: DeltaRead.LiveFile): FileStatus = {
    val p = new Path(DeltaRead.resolveFilePath(tablePath, f.path))
    if (f.size > 0L)
      new FileStatus(f.size, false, 1, 134217728L, f.modificationTime, p)
    else fs.getFileStatus(p)
  }

  /** Conservative file-level skip test: false ONLY when the file's stats
    * PROVE no row can match `filter`.
    */
  private def mayMatch(f: DeltaRead.LiveFile, filter: Expression): Boolean = {
    val stats = f.stats.map(mapper.readTree).orNull
    if (stats == null) return true
    def stat(kind: String, c: String): Option[String] =
      Option(stats.get(kind)).flatMap(n => Option(n.get(c))).map(_.asText())
    def cmp(a: String, b: Any, tpe: DataType): Option[Int] = tpe match {
      case _: NumericType =>
        try Some(java.lang.Double.compare(a.toDouble, b.toString.toDouble))
        catch { case _: NumberFormatException => None }
      case _: StringType => Some(a.compareTo(b.toString))
      case _ => None
    }
    filter match {
      case EqualTo(a: AttributeReference, Literal(v, _)) if v != null =>
        val keep = for {
          lo <- stat("minValues", a.name); hi <- stat("maxValues", a.name)
          cl <- cmp(lo, v, a.dataType); ch <- cmp(hi, v, a.dataType)
        } yield cl <= 0 && ch >= 0
        keep.getOrElse(true)
      case EqualTo(l: Literal, a: AttributeReference) =>
        mayMatch(f, EqualTo(a, l))
      case LessThan(a: AttributeReference, Literal(v, _)) if v != null =>
        stat("minValues", a.name).flatMap(cmp(_, v, a.dataType))
          .forall(_ < 0)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) if v != null =>
        stat("minValues", a.name).flatMap(cmp(_, v, a.dataType))
          .forall(_ <= 0)
      case GreaterThan(a: AttributeReference, Literal(v, _)) if v != null =>
        stat("maxValues", a.name).flatMap(cmp(_, v, a.dataType))
          .forall(_ > 0)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) if v != null =>
        stat("maxValues", a.name).flatMap(cmp(_, v, a.dataType))
          .forall(_ >= 0)
      case IsNotNull(a: AttributeReference) =>
        val allNull = for {
          nc <- stat("nullCount", a.name); n <- Option(stats.get("numRecords"))
        } yield nc.toLong >= n.asLong() && n.asLong() > 0
        !allNull.getOrElse(false)
      case And(l, r) => mayMatch(f, l) && mayMatch(f, r)
      case _ => true
    }
  }

  /** Delta partitionValues are strings; convert to the partition schema's
    * types the way hive-partition parsing would.
    */
  private def partitionRow(pv: Map[String, String]): InternalRow =
    InternalRow.fromSeq(partitionSchema.fields.toSeq.map { field =>
      val raw = pv.get(field.name).orNull
      if (raw == null) null
      else field.dataType match {
        case StringType => UTF8String.fromString(raw)
        case IntegerType => raw.toInt
        case LongType => raw.toLong
        case ShortType => raw.toShort
        case ByteType => raw.toByte
        case DoubleType => raw.toDouble
        case FloatType => raw.toFloat
        case BooleanType => raw.toBoolean
        case DateType =>
          java.time.LocalDate.parse(raw).toEpochDay.toInt
        case TimestampType =>
          java.sql.Timestamp.valueOf(raw).getTime * 1000L
        case d: DecimalType =>
          org.apache.spark.sql.types.Decimal(BigDecimal(raw), d.precision, d.scale)
        case other =>
          throw new IllegalArgumentException(
            s"unsupported partition type $other for column ${field.name}")
      }
    })
}

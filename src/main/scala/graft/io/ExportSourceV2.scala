package graft.io

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{
  AggregateFunc, Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder,
  SupportsPushDownAggregates, SupportsPushDownFilters, SupportsPushDownLimit,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, In, IsNotNull, StringStartsWith}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 for the paginated label-export feed — the scale path for
  * SURVEY S2 (the reference pulls the WHOLE export through one driver-side
  * urlopen, get_annotations.py:6-12; labelspark/client.py:38-43 hands one
  * blob to labelbase). Here each export PAGE is one [[InputPartition]]:
  * pages fetch concurrently on executors, the scan reports only the pruned
  * columns (SupportsPushDownRequiredColumns → `ReadSchema` shows the cut),
  * and downstream transforms see an ordinary DataFrame.
  *
  * Usage:
  * {{{
  *   spark.read.format("graft.io.ExportSourceV2")
  *     .option("feed", key).option("pages", n).load()
  * }}}
  *
  * The page fetcher is looked up from [[ExportFeedRegistry]] by the `feed`
  * option — in production an HTTP pager (Http.JsonPostTransport's sibling),
  * in tests a deterministic fake. DSv2 instantiates sources reflectively,
  * so the registry is the injection seam (same JVM on executors in local
  * mode; a cluster deployment registers the fetcher in an executor plugin).
  */
class ExportSourceV2 extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ExportSourceV2.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ExportTable(schema, new CaseInsensitiveStringMap(properties))
}

object ExportSourceV2 {
  /** The flat export-record shape (client.py:71-76 semantics: all-string). */
  val schema: StructType = StructType(Seq(
    StructField("global_key", StringType),
    StructField("external_id", StringType),
    StructField("row_data", StringType),
    StructField("project_id", StringType),
    StructField("label_json", StringType)))
}

/** Pluggable page fetchers, keyed by the `feed` reader option. A fetcher
  * takes (page, pageSize) and returns that page's records as field maps.
  */
object ExportFeedRegistry {
  private val feeds =
    new java.util.concurrent.ConcurrentHashMap[String, (Int, Int) => Seq[Map[String, String]]]()

  def register(key: String, fetch: (Int, Int) => Seq[Map[String, String]]): Unit =
    feeds.put(key, fetch)

  def apply(key: String): (Int, Int) => Seq[Map[String, String]] = {
    val f = feeds.get(key)
    require(f != null, s"no export feed registered under '$key'")
    f
  }

  /** Feed-level statistics — the stand-in for an export API's metadata
    * endpoint (total record count, per-field min/max). When registered,
    * bare count/min/max queries are answered from here WITHOUT fetching a
    * single page (SupportsPushDownAggregates).
    */
  final case class FeedStats(rowCount: Long,
      min: Map[String, String] = Map.empty, max: Map[String, String] = Map.empty)

  private val feedStats =
    new java.util.concurrent.ConcurrentHashMap[String, FeedStats]()

  def registerStats(key: String, st: FeedStats): Unit = feedStats.put(key, st)
  def statsFor(key: String): Option[FeedStats] = Option(feedStats.get(key))
}

private[io] class ExportTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft_export(${options.get("feed")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new ExportScanBuilder(schema, opts)
}

private[io] class ExportScanBuilder(full: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters with SupportsPushDownLimit
    with SupportsPushDownAggregates {
  private var required: StructType = full
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var agg: Option[(StructType, Array[Any], String)] = None

  /** LIMIT reaches the feed (the JDBC-source pattern): each page reader
    * stops after `limit` post-filter rows instead of draining its page.
    * Partial push — pages fetch in parallel, so Spark keeps its global
    * limit on top; the saving is per-page fetch volume, which is what an
    * export API bills for.
    */
  override def pushLimit(l: Int): Boolean = { limit = l; true }
  override def isPartiallyPushed(): Boolean = true

  override def pruneColumns(requiredSchema: StructType): Unit =
    // Spark hands back a subset of `full` in field order; empty (count-only
    // scans) is legal and yields zero-field rows.
    required = requiredSchema

  /** Accept the predicate shapes an export API can evaluate server-side
    * (equality, IN, prefix, non-null on string fields) — those rows never
    * enter Spark at all, which at scale is the difference between shipping
    * one project's labels and the whole corpus. Anything else stays a
    * post-scan filter (returned back to Spark untouched).
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition(ExportFilterEval.supported(full, _))
    pushed = ok
    rest
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Aggregate pushdown (count(*)/min/max, no grouping): answered from the
    * feed's registered [[ExportFeedRegistry.FeedStats]] — the catalog/
    * DESCRIBE-style introspection queries skip the export fetch entirely.
    * COMPLETE pushdown only, and only when it is sound: no group-by, no
    * pushed filters and no pushed limit (stats describe the WHOLE feed —
    * a filtered count must go through the pages), and every requested
    * function answerable from the stats. Anything else declines and Spark
    * aggregates the ordinary scan.
    */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    resolveAgg(aggregation).isDefined

  override def pushAggregation(aggregation: Aggregation): Boolean = {
    resolveAgg(aggregation) match {
      case some @ Some(_) => agg = some; true
      case None => false
    }
  }

  private def resolveAgg(aggregation: Aggregation): Option[(StructType, Array[Any], String)] = {
    if (aggregation.groupByExpressions.nonEmpty || pushed.nonEmpty || limit >= 0) return None
    val feed = options.get("feed")
    ExportFeedRegistry.statsFor(feed).flatMap { st =>
      def field(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
        e match {
          case nr: NamedReference if nr.fieldNames.length == 1 &&
            full.fieldNames.contains(nr.fieldNames.head) => Some(nr.fieldNames.head)
          case _ => None
        }
      val resolved: Seq[Option[(StructField, Any)]] =
        aggregation.aggregateExpressions.toSeq.map {
          case _: CountStar =>
            Some((StructField("count(*)", LongType, nullable = false), st.rowCount))
          case m: Min => field(m.column).filter(st.min.contains).map(f =>
            (StructField(s"min($f)", StringType), UTF8String.fromString(st.min(f))))
          case m: Max => field(m.column).filter(st.max.contains).map(f =>
            (StructField(s"max($f)", StringType), UTF8String.fromString(st.max(f))))
          case _: AggregateFunc => None
        }
      if (resolved.exists(_.isEmpty)) None
      else {
        val rs = resolved.flatten
        Some((StructType(rs.map(_._1)), rs.map(_._2).toArray,
          aggregation.aggregateExpressions.map(_.describe).mkString(", ")))
      }
    }
  }

  override def build(): Scan = agg match {
    case Some((schema, values, desc)) =>
      new ExportAggScan(options.get("feed"), schema, values, desc)
    case None => new ExportScan(
      options.get("feed"),
      Option(options.get("pages")).map(_.toInt).getOrElse(1),
      Option(options.get("pageSize")).map(_.toInt).getOrElse(1000),
      required, pushed, limit)
  }
}

/** One-row scan serving a completely-pushed aggregate from feed stats —
  * zero page fetches, zero executor work beyond emitting the row.
  */
private[io] class ExportAggScan(feed: String, aggSchema: StructType,
    values: Array[Any], desc: String) extends Scan with Batch {
  override def readSchema(): StructType = aggSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_export feed=$feed PushedAggregates: [$desc]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(ExportPagePartition(0))
  override def createReaderFactory(): PartitionReaderFactory =
    new ExportAggReaderFactory(values)
}

private[io] class ExportAggReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var done = false
      override def next(): Boolean = if (done) false else { done = true; true }
      override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
      override def close(): Unit = ()
    }
}

/** Source-side evaluation of pushed filters over raw export records (the
  * stand-in for encoding them as export-API query params).
  */
private[io] object ExportFilterEval {
  def supported(schema: StructType, f: Filter): Boolean = f match {
    case EqualTo(a, _: String)     => schema.fieldNames.contains(a)
    case In(a, vs)                 => schema.fieldNames.contains(a) &&
      vs.forall(_.isInstanceOf[String])
    case StringStartsWith(a, _)    => schema.fieldNames.contains(a)
    case IsNotNull(a)              => schema.fieldNames.contains(a)
    case _                         => false
  }

  def eval(f: Filter, rec: Map[String, String]): Boolean = f match {
    case EqualTo(a, v: String)     => rec.get(a).contains(v)
    case In(a, vs)                 => rec.get(a).exists(x => vs.contains(x))
    case StringStartsWith(a, v)    => rec.get(a).exists(_.startsWith(v))
    case IsNotNull(a)              => rec.get(a).isDefined
    case _                         => true
  }
}

private[io] case class ExportPagePartition(page: Int) extends InputPartition

private[io] class ExportScan(feed: String, pages: Int, pageSize: Int,
    required: StructType, pushed: Array[Filter], limit: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_export feed=$feed pages=$pages " +
      s"PushedFilters: [${pushed.mkString(", ")}]" +
      (if (limit >= 0) s" PushedLimit: $limit" else "")

  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(pages)(ExportPagePartition(_))

  override def createReaderFactory(): PartitionReaderFactory =
    new ExportReaderFactory(feed, pageSize, required.fieldNames, pushed, limit)
}

private[io] class ExportReaderFactory(feed: String, pageSize: Int,
    fields: Array[String], pushed: Array[Filter], limit: Int)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val page = partition.asInstanceOf[ExportPagePartition].page
    new PartitionReader[InternalRow] {
      private val records = {
        val base = ExportFeedRegistry(feed)(page, pageSize).iterator
          .filter(rec => pushed.forall(ExportFilterEval.eval(_, rec)))
        if (limit >= 0) base.take(limit) else base
      }
      private var current: InternalRow = _

      override def next(): Boolean =
        if (records.hasNext) {
          val rec = records.next()
          current = InternalRow.fromSeq(fields.toSeq.map(f =>
            rec.get(f).map(UTF8String.fromString).orNull))
          true
        } else false

      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}

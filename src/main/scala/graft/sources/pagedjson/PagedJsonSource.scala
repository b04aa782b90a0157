package graft.sources.pagedjson

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{EqualTo, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 re-expression of the reference's paginated Socrata
  * ingestion (`TrafficAnalysis.py:31-53`; SURVEY.md §2.A1-A3):
  *
  *   - the upstream API serves 1000-row pages via `$limit/$offset`; here a
  *     JSONL file stands in for the remote dataset (zero-egress
  *     environment) and each [[PageInputPartition]] IS one offset window —
  *     pages are fetched/parsed IN PARALLEL across executors instead of
  *     the reference's sequential driver loop (~1713 blocking requests),
  *   - `SupportsPushDownLimit` = QuickFetch's bounded single-page scan
  *     (`QuickFetch.py:31-48`): a `LIMIT n` plans only ⌈n/pageSize⌉ pages,
  *   - `SupportsPushDownFilters` = the SoQL `$where yr=2024` server-side
  *     filter (`Dash.py:36`): equality filters on top-level string fields
  *     are evaluated inside the scan and reported as pushed.
  *
  * Landing schema fidelity: every column is a string (the raw feed's
  * shape, `SC/initialDatainfo.png`) — the Normalize stage owns typing.
  *
  * Options: `path` (JSONL file), `pageSize` (rows per partition, default
  * 1000), `columns` (comma-separated schema; otherwise inferred from the
  * first page of records' union of keys).
  */
class PagedJsonSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagedJsonSource.schemaFor(options)

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new PagedJsonTable(schema, new CaseInsensitiveStringMap(properties))
}

object PagedJsonSource {
  private[pagedjson] val mapper = new ObjectMapper()

  private[pagedjson] def schemaFor(options: CaseInsensitiveStringMap): StructType = {
    val cols = Option(options.get("columns")) match {
      case Some(spec) => spec.split(",").map(_.trim).toSeq
      case None =>
        // Union of keys over the first page — the reference's
        // pd.DataFrame(list_of_dicts) schema inference (SURVEY.md A4).
        val pageSize = Option(options.get("pageSize")).map(_.toInt).getOrElse(1000)
        val path = Paths.get(options.get("path"))
        val it = Files.lines(path, StandardCharsets.UTF_8)
        try {
          it.limit(pageSize).iterator().asScala.filter(_.nonEmpty)
            .flatMap { line =>
              mapper.readTree(line).fieldNames.asScala
            }.toSeq.distinct
        } finally it.close()
    }
    StructType(cols.map(c => StructField(c, StringType, nullable = true)))
  }
}

class PagedJsonTable(schema: StructType, options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"paged_json(${options.get("path")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new java.util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(o.asCaseSensitiveMap())
    new PagedJsonScanBuilder(schema, new CaseInsensitiveStringMap(merged))
  }
}

class PagedJsonScanBuilder(schema: StructType, options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownLimit with SupportsPushDownFilters {

  private var limit: Option[Int] = None
  private var pushed: Array[Filter] = Array.empty

  // Fully pushed ONLY when no filters are pushed into the scan: the scan
  // applies the limit to raw line offsets (pre-filter), so combined with an
  // in-scan filter it would under-return rows for limit-after-filter
  // semantics. Spark's V2ScanRelationPushDown pushes filters before limits,
  // so `pushed` is final here; returning false keeps the global Limit node.
  override def pushLimit(l: Int): Boolean =
    if (pushed.isEmpty) { limit = Some(l); true } else false

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (supported, rest) = filters.partition {
      case EqualTo(att, _: String) => schema.fieldNames.contains(att)
      case _ => false
    }
    pushed = supported
    rest // Spark re-evaluates the rest above the scan.
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new PagedJsonScan(
    schema, options.get("path"),
    Option(options.get("pageSize")).map(_.toInt).getOrElse(1000),
    // Defensive re-check at build time: never page-prune a filtered scan,
    // regardless of the engine's pushdown call order.
    if (pushed.isEmpty) limit else None, pushed)
}

class PagedJsonScan(
    schema: StructType, path: String, pageSize: Int,
    limit: Option[Int], filters: Array[Filter]) extends Scan with Batch {

  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"PagedJsonScan(path=$path, pageSize=$pageSize, limit=$limit, " +
      s"pushedFilters=${filters.mkString("[", ",", "]")})"

  override def planInputPartitions(): Array[InputPartition] = {
    val totalLines = {
      val it = Files.lines(Paths.get(path), StandardCharsets.UTF_8)
      try it.count() finally it.close()
    }
    // Limit pushdown: a LIMIT smaller than the dataset plans only the
    // pages that can contribute (QuickFetch's single bounded page).
    val effective = limit.map(l => math.min(l.toLong, totalLines)).getOrElse(totalLines)
    val nPages = ((effective + pageSize - 1) / pageSize).toInt
    (0 until nPages).map { p =>
      val start = p.toLong * pageSize
      val end = math.min(start + pageSize, effective)
      PageInputPartition(path, start, end): InputPartition
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PagedJsonReaderFactory(schema, filters)
}

/** One `$offset/$limit` window. */
case class PageInputPartition(path: String, startLine: Long, endLine: Long)
    extends InputPartition

class PagedJsonReaderFactory(schema: StructType, filters: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PageInputPartition]
    new PagedJsonReader(p, schema, filters)
  }
}

class PagedJsonReader(
    p: PageInputPartition, schema: StructType, filters: Array[Filter])
    extends PartitionReader[InternalRow] {

  private val stream = Files.lines(Paths.get(p.path), StandardCharsets.UTF_8)
  private val lines = stream.skip(p.startLine)
    .limit(p.endLine - p.startLine).iterator().asScala
  private val eq: Seq[(Int, String)] = filters.collect {
    case EqualTo(att, v: String) => schema.fieldIndex(att) -> v
  }.toSeq
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (lines.hasNext) {
      val line = lines.next()
      if (line.nonEmpty) {
        val node = PagedJsonSource.mapper.readTree(line)
        val values = schema.fields.map { f =>
          val v = node.get(f.name)
          if (v == null || v.isNull) null else UTF8String.fromString(v.asText())
        }
        // "Server-side" filter: applied inside the scan, pre-shuffle.
        val keep = eq.forall { case (i, want) =>
          values(i) != null && values(i).toString == want
        }
        if (keep) {
          current = InternalRow.fromSeq(
            scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}

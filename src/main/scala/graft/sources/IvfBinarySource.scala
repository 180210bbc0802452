package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, File, FileInputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.functions.VectorKernels

/** DataSource V2 connector for the engine's quantized IVF index, stored in
  * the reference's spill-file layout: fixed-width binary rows of
  * `[8B little-endian vec_id][dim+8 bytes quantized vector]`
  * (reference dnc/dataset.go:19-166 — `(8+dim)`-byte rows, buffered
  * sequential IO; our rows carry the 8-byte min/max quantization header of
  * compute/quantization.go:71-102 inside the vector field).
  *
  * Directory layout is one subdirectory per IVF list
  * (`list=<centroid_id>/part-*.bin`), which makes nprobe search a
  * *connector-level* partition prune: `centroid_id` Equal/In filters are
  * pushed into [[IvfScanBuilder]] and non-probed directories are never
  * opened — the 100 TB property that scan cost follows nprobe, not corpus
  * size. Column pruning is honoured too: a scan that needs no `qvec`
  * skips the vector bytes, and a `centroid_id`-only scan (per-list counts)
  * reads NO row bytes at all — row count is file_size / row_width.
  *
  * Schema: `vec_id BIGINT, qvec BINARY, centroid_id INT`.
  *
  * IO is java.io against a shared filesystem (the local[N] test shape);
  * a multi-node deployment swaps the open/list/skip calls for Hadoop
  * `FileSystem` — layout, pruning, and readers are unchanged.
  */
class IvfBinarySource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    IvfBinarySource.SCHEMA
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new IvfTable(properties.get("path"))
}

object IvfBinarySource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("qvec", BinaryType, nullable = false),
    StructField("centroid_id", IntegerType, nullable = false)))

  val FORMAT = "graft.sources.IvfBinarySource"

  /** Rows are [8B LE id][dim+8 quantized]; dim is recorded once at the
    * index root (the reference re-derives it by probing a row's byte
    * length, ai/aicomms/embed.go:52-54 — a root meta file avoids the
    * probe read on every open). */
  private[sources] def rowWidth(dim: Int): Int = 8 + dim + 8

  private[sources] def readDim(path: String): Int = {
    val meta = new File(path, "_dim")
    val s = new String(java.nio.file.Files.readAllBytes(meta.toPath)).trim
    s.toInt
  }

  /** Write an assigned index (float vectors + centroid_id) as a binary
    * spill-file index. Quantization happens here, executor-side, one pass.
    * The frame is repartitioned by list so each (task, list) pair emits
    * one `part-<task>.bin` — append-friendly and deterministic row count
    * per file. */
  def write(assigned: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val spark = assigned.sparkSession
    val root = new File(path)
    if (root.exists()) {
      def del(f: File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(del)
        f.delete()
      }
      del(root)
    }
    root.mkdirs()
    val first = assigned.select(vecCol).take(1)
    val dim = if (first.isEmpty) 0 else first(0).getSeq[Float](0).length
    java.nio.file.Files.write(new File(root, "_dim").toPath,
      dim.toString.getBytes)
    if (first.isEmpty) return // empty index: meta file only, zero lists
    val rows = assigned.select(
      col(idCol).cast("long"), col(vecCol), col("centroid_id").cast("int"))
    // one shuffle on the list key → each list's bytes are written by few
    // tasks; skewed (hot-list) writes stay append-parallel across tasks
    rows.repartition(col("centroid_id")).foreachPartition {
      (it: Iterator[org.apache.spark.sql.Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val streams = scala.collection.mutable.Map[Int, BufferedOutputStream]()
        val head = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        try {
          it.foreach { r =>
            val cid = r.getInt(2)
            val out = streams.getOrElseUpdate(cid, {
              val d = new File(new File(path), s"list=$cid")
              d.mkdirs()
              new BufferedOutputStream(
                new FileOutputStream(new File(d, f"part-$pid%05d.bin")))
            })
            head.clear(); head.putLong(r.getLong(0))
            out.write(head.array())
            out.write(VectorKernels.quantize(r.getSeq[Float](1).toArray))
          }
        } finally streams.values.foreach(_.close())
    }
  }

  /** nprobe search straight off the binary index: connector-level list
    * pruning + fused dequantize·cosine kernel, top-k tie-broken
    * (sim DESC, id ASC). */
  def search(spark: SparkSession, path: String, model: graft.index.IvfIndex.Model,
      query: Array[Float], k: Int, nprobe: Int): DataFrame = {
    import graft.functions.gf
    val probeIds = model.probe(query, nprobe).map(_.asInstanceOf[Any])
    spark.read.format(FORMAT).load(path)
      .filter(col("centroid_id").isin(probeIds: _*))
      .select(col("vec_id"),
        gf.cosine_sim_q(col("qvec"), lit(VectorKernels.quantize(query))).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(k)
  }
}

private[sources] class IvfTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"graft_ivf(`$path`)"
  override def schema(): StructType = IvfBinarySource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new IvfScanBuilder(path)
}

private[sources] class IvfScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var required: StructType = IvfBinarySource.SCHEMA
  private var pushed: Array[Filter] = Array.empty
  // None = no list filter (scan all); Some(set) = probe exactly these
  private var lists: Option[Set[Int]] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rest) = filters.partition {
      case EqualTo("centroid_id", _: Int) => true
      case In("centroid_id", vs) => vs.forall(_.isInstanceOf[Int])
      case _ => false
    }
    pushed = accepted
    accepted.foreach {
      case EqualTo(_, v: Int) =>
        lists = Some(lists.getOrElse(Set.empty[Int]) ++ Set(v))
      case In(_, vs) =>
        lists = Some(lists.getOrElse(Set.empty[Int]) ++ vs.map(_.asInstanceOf[Int]))
      case _ =>
    }
    rest // residual filters stay in the plan (none expected beyond these)
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new IvfScan(path, lists, required)
}

private[sources] class IvfScan(path: String, lists: Option[Set[Int]],
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val probed = lists.map(_.toSeq.sorted.mkString("[", ",", "]")).getOrElse("ALL")
    s"GraftIvfScan path=$path lists=$probed cols=${required.fieldNames.mkString(",")}"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val root = new File(path)
    val dirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("list="))
      .map(f => f.getName.stripPrefix("list=").toInt -> f)
      // connector-level partition prune: non-probed lists are never opened
      .filter { case (cid, _) => lists.forall(_.contains(cid)) }
    dirs.flatMap { case (cid, d) =>
      d.listFiles().filter(_.getName.endsWith(".bin")).sortBy(_.getName)
        .map(f => IvfInputPartition(f.getAbsolutePath, cid): InputPartition)
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new IvfReaderFactory(IvfBinarySource.readDim(path), required)
}

private[sources] case class IvfInputPartition(file: String, listId: Int)
    extends InputPartition

private[sources] class IvfReaderFactory(dim: Int, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[IvfInputPartition]
    new IvfPartitionReader(part.file, part.listId, dim, required)
  }
}

/** Streams one fixed-width spill file. Column pruning is physical:
  * unneeded fields are `skip`ped, and when only `centroid_id` survives
  * (GROUP BY list counts) the row count comes from the file length with
  * zero row bytes read. */
private[sources] class IvfPartitionReader(file: String, listId: Int, dim: Int,
    required: StructType) extends PartitionReader[InternalRow] {

  private val width = IvfBinarySource.rowWidth(dim)
  private val vecLen = dim + 8
  private val needId = required.fieldNames.contains("vec_id")
  private val needVec = required.fieldNames.contains("qvec")
  private val metaOnly = !needId && !needVec

  private var remaining: Long = new File(file).length() / width
  private val in: BufferedInputStream =
    if (metaOnly) null
    else new BufferedInputStream(new FileInputStream(file), 1 << 16)
  private val idBuf = new Array[Byte](8)
  private var row: InternalRow = _

  private def readFully(b: Array[Byte]): Unit = {
    var off = 0
    while (off < b.length) {
      val n = in.read(b, off, b.length - off)
      if (n < 0) throw new java.io.EOFException(file)
      off += n
    }
  }
  private def skipFully(n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s <= 0) { if (in.read() < 0) throw new java.io.EOFException(file); left -= 1 }
      else left -= s
    }
  }

  override def next(): Boolean = {
    if (remaining <= 0) return false
    remaining -= 1
    val values = new Array[Any](required.length)
    var id = 0L
    if (needId) {
      readFully(idBuf)
      id = ByteBuffer.wrap(idBuf).order(ByteOrder.LITTLE_ENDIAN).getLong
    } else if (!metaOnly) skipFully(8)
    var vec: Array[Byte] = null
    if (needVec) { vec = new Array[Byte](vecLen); readFully(vec) }
    else if (!metaOnly) skipFully(vecLen)
    var i = 0
    required.fieldNames.foreach { f =>
      values(i) = f match {
        case "vec_id" => id
        case "qvec" => vec
        case "centroid_id" => listId
      }
      i += 1
    }
    row = new GenericInternalRow(values)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = if (in != null) in.close()
}

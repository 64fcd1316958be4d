package graft.sources

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** dBase III (DBF) reader/writer — the reference's third file format
  * (extract cubicerpetl/cubicerpetl.py:271-285 via the `dbf` package,
  * load :446-464, `get_dbf_lines` :588-596). Spark has no DBF source, so
  * this is a from-scratch implementation of the public dBase III layout:
  * 32-byte header, 32-byte field descriptors terminated by 0x0D, then
  * fixed-length ASCII records with a 1-byte deletion flag.
  *
  * DBF is a single-file legacy interchange format with a header that
  * carries the record count — inherently driver-side at the boundary,
  * like the reference's inline payloads. Parsing happens on the driver
  * (files are small by format design: max 2^32 records, typically MBs);
  * the parsed rows immediately become a distributed DataFrame. Writing
  * streams partitions through `toLocalIterator` so only one partition is
  * resident on the driver at a time.
  *
  * Type map (dBase III): C→string, N(dec=0)→long, N(dec>0)→double,
  * D→date, L→boolean.
  */
object Dbf {

  final case class Field(name: String, ftype: Char, length: Int, decimals: Int)

  /** Read with an Odoo-style domain filter — reference `dbf_domain`,
    * applied as `fl.query(eval(dbf_domain))` right at extract time
    * (cubicerpetl.py:281-282). The domain compiles to a Column over the
    * parsed frame, so Catalyst sees one narrow filtered scan.
    */
  def read(spark: SparkSession, path: String, domain: Seq[Any]): DataFrame =
    read(spark, path).filter(graft.expr.OdooDomain.compile(domain))

  /** Parse header + field descriptors + records. `deleted` rows (flag '*')
    * are skipped, as `dbf.Table` iteration does.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    // open through the FS owning the path, not java.io — a .dbf can live
    // on any Hadoop filesystem (mounted, hdfs, s3a, or the ftp transport's
    // spool). Streams from offset 0, no seek (FTP-safe).
    val bytes = {
      val hp = new org.apache.hadoop.fs.Path(path)
      val in = hp.getFileSystem(spark.sessionState.newHadoopConf()).open(hp)
      try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 1 << 16, false)
        bos.toByteArray
      } finally in.close()
    }
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require((bb.get(0) & 0x07) == 0x03, s"unsupported DBF version: ${bytes(0)}")
    val nRecords = bb.getInt(4)
    val headerSize = bb.getShort(8) & 0xffff
    val recordSize = bb.getShort(10) & 0xffff

    val fields = Iterator.from(0)
      .map(i => 32 + i * 32)
      .takeWhile(off => off < headerSize && bytes(off) != 0x0d)
      .map { off =>
        val nameBytes = bytes.slice(off, off + 11).takeWhile(_ != 0)
        Field(new String(nameBytes, "ASCII").trim, bytes(off + 11).toChar,
          bytes(off + 16) & 0xff, bytes(off + 17) & 0xff)
      }.toSeq

    val schema = StructType(fields.map(f => StructField(f.name, sparkType(f))))
    val rows = (0 until nRecords).iterator.flatMap { r =>
      val off = headerSize + r * recordSize
      if (off >= bytes.length || bytes(off) == '*') None
      else {
        var cursor = off + 1
        val vals = fields.map { f =>
          val cell = new String(bytes, cursor, f.length, "ASCII")
          cursor += f.length
          parseCell(cell, f)
        }
        Some(Row(vals: _*))
      }
    }.toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, math.max(1, rows.size / 10000)), schema)
  }

  private def sparkType(f: Field): DataType = f.ftype match {
    case 'C' => StringType
    case 'N' | 'F' => if (f.decimals == 0) LongType else DoubleType
    case 'D' => DateType
    case 'L' => BooleanType
    case other => throw new IllegalArgumentException(s"DBF type: $other")
  }

  private def parseCell(cell: String, f: Field): Any = {
    val t = cell.trim
    if (t.isEmpty) null
    else f.ftype match {
      case 'C' => t
      case 'N' | 'F' => if (f.decimals == 0) t.toLong else t.toDouble
      case 'D' => java.sql.Date.valueOf(
        s"${t.substring(0, 4)}-${t.substring(4, 6)}-${t.substring(6, 8)}")
      case 'L' => t.charAt(0) match {
        case 'T' | 't' | 'Y' | 'y' => true
        case 'F' | 'f' | 'N' | 'n' => false
        case _ => null
      }
    }
  }

  /** Derive DBF field specs from a DataFrame schema. String lengths take
    * `charLen`; numerics use 18 digits (dBase III max-safe).
    */
  def fieldsFor(schema: StructType, charLen: Int = 64): Seq[Field] =
    schema.fields.toSeq.map { sf =>
      sf.dataType match {
        case StringType  => Field(sf.name.take(10), 'C', charLen, 0)
        case LongType | IntegerType | ShortType => Field(sf.name.take(10), 'N', 18, 0)
        case DoubleType | FloatType => Field(sf.name.take(10), 'N', 18, 4)
        case DateType    => Field(sf.name.take(10), 'D', 8, 0)
        case BooleanType => Field(sf.name.take(10), 'L', 1, 0)
        case other => throw new IllegalArgumentException(s"DBF cannot hold: $other")
      }
    }

  /** Write a single DBF file. Record count must be known for the header,
    * so the row count is computed first (one Spark action), then rows
    * stream through the driver one partition at a time.
    */
  def write(df: DataFrame, path: String, charLen: Int = 64): Unit = {
    val fields = fieldsFor(df.schema, charLen)
    val n = df.count().toInt
    val recordSize = 1 + fields.map(_.length).sum
    val headerSize = 32 + fields.size * 32 + 1

    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      val today = java.time.LocalDate.now()
      val head = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
      head.put(0x03.toByte)
      head.put((today.getYear - 1900).toByte).put(today.getMonthValue.toByte).put(today.getDayOfMonth.toByte)
      head.putInt(n).putShort(headerSize.toShort).putShort(recordSize.toShort)
      out.write(head.array())
      fields.foreach { f =>
        val d = ByteBuffer.allocate(32).order(ByteOrder.LITTLE_ENDIAN)
        val nameBytes = f.name.getBytes("ASCII").take(10)
        d.put(nameBytes).put(new Array[Byte](11 - nameBytes.length))
        d.put(f.ftype.toByte)
        d.position(16)
        d.put(f.length.toByte).put(f.decimals.toByte)
        out.write(d.array())
      }
      out.write(0x0d)
      df.toLocalIterator().forEachRemaining { row =>
        out.write(' ')
        fields.zipWithIndex.foreach { case (f, i) =>
          out.write(renderCell(row, i, f).getBytes("ASCII"))
        }
      }
      out.write(0x1a)
    } finally out.close()
  }

  private def renderCell(row: Row, i: Int, f: Field): String = {
    val raw: String =
      if (row.isNullAt(i)) ""
      else f.ftype match {
        case 'N' if f.decimals > 0 =>
          String.format(java.util.Locale.ROOT, s"%.${f.decimals}f", Double.box(row.getAs[Number](i).doubleValue))
        case 'N' => row.getAs[Number](i).longValue.toString
        case 'D' => row.getAs[java.sql.Date](i).toLocalDate.format(
          java.time.format.DateTimeFormatter.BASIC_ISO_DATE)
        case 'L' => if (row.getAs[Boolean](i)) "T" else "F"
        case _   => String.valueOf(row.get(i))
      }
    val cut = raw.take(f.length)
    if (f.ftype == 'N') (" " * (f.length - cut.length)) + cut
    else cut + (" " * (f.length - cut.length))
  }
}

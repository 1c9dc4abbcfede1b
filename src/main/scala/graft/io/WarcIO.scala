package graft.io

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One parsed WARC record (ISO 28500): the named headers every
  * curation stage keys on, the full header map for everything else,
  * and the raw content block. `content` of a `response` record is the
  * HTTP message (status line + headers + body) — split it with
  * [[WarcIO.httpBody]] before text extraction. */
final case class WarcRecord(
    file: String,
    record_idx: Int,
    warc_type: String,
    target_uri: String,
    warc_date: String,
    content_type: String,
    headers: Map[String, String],
    content: Array[Byte])

/** WARC (Web ARChive, ISO 28500) ingestion — the CommonCrawl container
  * format, i.e. the one real-world entry format a web-curation
  * pipeline starts from. Feeds the existing chain: [[WarcIO.httpBody]]
  * strips the HTTP envelope, `TextFunctions.stripHtml` (gate d32)
  * extracts text, and the Gopher/C4 batteries take it from there.
  *
  * Scale shape (100 TB of CommonCrawl): `binaryFile` lists the
  * archive files and hands ONE FILE PER TASK to executors — the
  * standard CC processing grain (CC ships ~1 GB .warc.gz files, and
  * gzip members make intra-file splits impractical anyway); parsing is
  * a pure map-side pass (no shuffle, no driver involvement beyond the
  * listing). Caveats documented, not hidden: `binaryFile` materializes
  * one file per row (Spark caps a row at 2 GB — fine at CC's file
  * sizing; re-chunk upstream archives that exceed it), and
  * per-record-gzipped archives decompress as concatenated members
  * (java's GZIPInputStream consumes them back to back).
  */
object WarcIO {

  /** Read `.warc` / `.warc.gz` files under `path` (glob ok) into a
    * DataFrame of [[WarcRecord]] rows. Malformed framing fails LOUDLY
    * naming the file and offset — a silently skipped record is a
    * corpus-loss bug at archive scale. */
  def readWarc(spark: SparkSession, path: String): DataFrame =
    parseFiles(spark, spark.read.format("binaryFile").load(path))

  /** Streaming twin of [[readWarc]]: watch `path` as a landing
    * directory (the continuous-ingestion shape — a crawler drops
    * .warc.gz files, every micro-batch parses ONLY the new ones), same
    * schema, same parse, stateless — so the whole batch curation chain
    * (httpBody → stripHtml → Gopher/C4 → dedup sketches) runs
    * UNCHANGED downstream, the EventStream design rule. */
  def readWarcStream(spark: SparkSession, path: String): DataFrame =
    parseFiles(spark, spark.readStream.format("binaryFile")
      // streaming file sources require an explicit schema; binaryFile's
      // is fixed by the format
      .schema(org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("modificationTime",
          org.apache.spark.sql.types.TimestampType),
        org.apache.spark.sql.types.StructField("length",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("content",
          org.apache.spark.sql.types.BinaryType))))
      .load(path))

  // ONE parse plumbing for batch and stream (a fix applied to one
  // would silently desynchronize the other — the pageCols lesson)
  private def parseFiles(spark: SparkSession, files: DataFrame): DataFrame = {
    import spark.implicits._
    files.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) => parseAll(p, bytes) }
      .toDF()
  }

  /** All records in one archive's bytes (gunzipped first when the
    * magic says so). Driver-callable for fixtures; executor-side under
    * [[readWarc]]. */
  def parseAll(file: String, raw: Array[Byte]): Seq[WarcRecord] = {
    val data =
      if (raw.length >= 2 && (raw(0) & 0xff) == 0x1f && (raw(1) & 0xff) == 0x8b)
        gunzipAll(raw)
      else raw
    val out = scala.collection.mutable.ArrayBuffer.empty[WarcRecord]
    var pos = 0
    var idx = 0
    while (pos < data.length) {
      // tolerate inter-record CRLF padding (the spec's record
      // separator is exactly two CRLFs, some writers add more)
      while (pos < data.length &&
        (data(pos) == '\r'.toByte || data(pos) == '\n'.toByte)) pos += 1
      if (pos < data.length) {
        val headEnd = indexOfCrlfCrlf(data, pos)
        require(headEnd >= 0,
          s"warc $file: record $idx at offset $pos has no header terminator")
        val head = new String(data, pos, headEnd - pos, StandardCharsets.UTF_8)
        val lines = head.split("\r\n")
        require(lines.nonEmpty && lines.head.startsWith("WARC/"),
          s"warc $file: record $idx at offset $pos does not start with a " +
            s"WARC version line (got '${lines.headOption.getOrElse("")}')")
        val headers = lines.tail.map { l =>
          val i = l.indexOf(':')
          require(i > 0, s"warc $file: record $idx has a malformed header '$l'")
          l.substring(0, i).trim.toLowerCase -> l.substring(i + 1).trim
        }.toMap
        val len = headers.getOrElse("content-length",
          throw new IllegalArgumentException(
            s"warc $file: record $idx has no Content-Length")).toLong
        val bodyStart = headEnd + 4
        require(bodyStart + len <= data.length,
          s"warc $file: record $idx claims $len content bytes but only " +
            s"${data.length - bodyStart} remain (truncated archive)")
        out += WarcRecord(file, idx,
          headers.getOrElse("warc-type", ""),
          // CC writes the URI bare; WARC/1.0 tooling wraps it in <>
          headers.getOrElse("warc-target-uri", "")
            .stripPrefix("<").stripSuffix(">"),
          headers.getOrElse("warc-date", ""),
          headers.getOrElse("content-type", ""),
          headers, java.util.Arrays.copyOfRange(data, bodyStart.toInt,
            (bodyStart + len).toInt))
        pos = (bodyStart + len).toInt
        idx += 1
      }
    }
    out.toSeq
  }

  /** Body of an HTTP message payload (a `response` record's content):
    * everything after the first blank line; the whole payload when no
    * HTTP header block is present. Column form — map-side. */
  def httpBody(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    // locate \r\n\r\n in the BINARY payload via position on the
    // latin-1-preserving string view (every byte maps to one char, so
    // offsets line up even for non-UTF-8 bodies)
    val s = decode(payload, "ISO-8859-1")
    val sep = instr(s, "\r\n\r\n")
    when(payload.isNull, lit(null).cast("binary"))
      .when(sep > 0,
        substring(payload, (sep + 4).cast("int"), lit(2147483647)))
      .otherwise(payload)
  }

  /** UTF-8 text view of an HTML payload (lossy on invalid bytes — the
    * curation contract; scraped archives carry mojibake, and
    * `TextFunctions.fixEncoding` exists downstream). */
  def payloadText(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    decode(payload, "UTF-8")

  /** One record's framed bytes (optionally as its own gzip member —
    * the CC layout). The ONE serializer shared by [[writeWarc]] and
    * the distributed [[writeWetDir]] sink. */
  def recordBytes(r: WarcRecord, gzip: Boolean): Array[Byte] = {
    val head = new StringBuilder
    head ++= "WARC/1.0\r\n"
    head ++= s"WARC-Type: ${r.warc_type}\r\n"
    if (r.target_uri.nonEmpty) head ++= s"WARC-Target-URI: ${r.target_uri}\r\n"
    if (r.warc_date.nonEmpty) head ++= s"WARC-Date: ${r.warc_date}\r\n"
    if (r.content_type.nonEmpty) head ++= s"Content-Type: ${r.content_type}\r\n"
    head ++= s"Content-Length: ${r.content.length}\r\n\r\n"
    val bytes = new ByteArrayOutputStream()
    bytes.write(head.toString.getBytes(StandardCharsets.UTF_8))
    bytes.write(r.content)
    bytes.write("\r\n\r\n".getBytes(StandardCharsets.UTF_8))
    if (gzip) {
      val gz = new ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(gz)
      g.write(bytes.toByteArray); g.close()
      gz.toByteArray
    } else bytes.toByteArray
  }

  /** Write records as one WARC file (driver-side — fixture generation
    * and small exports; bulk corpora live in parquet after ingestion).
    * `gzip = true` writes one gzip member PER RECORD (the CC layout). */
  def writeWarc(path: String, records: Seq[WarcRecord],
      gzip: Boolean = false): Unit = {
    val out = new java.io.FileOutputStream(path)
    try records.foreach(r => out.write(recordBytes(r, gzip)))
    finally out.close()
  }

  /** WET convenience source: WET files ARE WARC files whose text
    * lives in `conversion` records — (target_uri, warc_date, text). */
  def readWet(spark: SparkSession, path: String): DataFrame =
    readWarc(spark, path)
      .filter(col("warc_type") === "conversion")
      .select(col("target_uri"), col("warc_date"),
        payloadText(col("content")).as("text"))

  /** Distributed WET sink: each partition writes its own
    * `part-NNNNN.warc.gz` of per-record-gzipped `conversion` records
    * under `dir` — the CC text-corpus layout, parallel across
    * executors with no shuffle and no driver collection. Files write
    * through the Hadoop FileSystem API, so any supported scheme works;
    * tasks construct a default Configuration (custom hadoop conf
    * entries needed for exotic stores should be in core-site.xml, the
    * standard cluster arrangement). A `_SUCCESS` marker lands LAST —
    * the committed-write protocol readers can trust. */
  def writeWetDir(df: DataFrame, dir: String, uriCol: String = "url",
      textCol: String = "text",
      date: String = "1970-01-01T00:00:00Z"): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(uriCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        val conf = new org.apache.hadoop.conf.Configuration()
        val p = new org.apache.hadoop.fs.Path(f"$dir/part-$pid%05d.warc.gz")
        val fs = p.getFileSystem(conf)
        val out = fs.create(p, true)
        var n = 0L
        try it.foreach { case (uri, text) =>
          val body = Option(text).getOrElse("")
            .getBytes(StandardCharsets.UTF_8)
          out.write(recordBytes(WarcRecord("", 0, "conversion",
            Option(uri).getOrElse(""), date, "text/plain", Map.empty,
            body), gzip = true))
          n += 1
        } finally out.close()
        Iterator.single(n)
      }.sum() // one action drives all partition writes
    val marker = new org.apache.hadoop.fs.Path(s"$dir/_SUCCESS")
    val fs = marker.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.create(marker, true).close()
  }

  /** Decompress concatenated gzip members (the per-record CC layout —
    * java's GZIPInputStream reads members back to back). */
  private def gunzipAll(raw: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    val out = new ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](65536)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    in.close()
    out.toByteArray
  }

  private def indexOfCrlfCrlf(data: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < data.length) {
      if (data(i) == '\r' && data(i + 1) == '\n' &&
        data(i + 2) == '\r' && data(i + 3) == '\n') return i
      i += 1
    }
    -1
  }
}

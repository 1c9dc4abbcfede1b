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
  * a pure map-side STREAMING pass (no shuffle, no driver involvement
  * beyond the listing; records materialize one at a time, so the
  * DECOMPRESSED archive size is unbounded — a 1 GB .warc.gz expanding
  * to 4+ GB parses fine). Caveats documented, not hidden: `binaryFile`
  * materializes one file's COMPRESSED bytes per row (Spark caps a row
  * at 2 GB — fine at CC's file sizing; re-chunk upstream archives
  * that exceed it), and per-record-gzipped archives decompress as
  * concatenated members (java's GZIPInputStream consumes them back to
  * back).
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
      .flatMap { case (p, bytes) =>
        parseStream(p, new java.io.ByteArrayInputStream(bytes)) }
      .toDF()
  }

  /** All records in one archive's bytes (gunzipped when the magic says
    * so). Driver-callable for fixtures; [[parseStream]] is the real
    * worker. */
  def parseAll(file: String, raw: Array[Byte]): Seq[WarcRecord] =
    parseStream(file, new java.io.ByteArrayInputStream(raw)).toSeq

  /** Incremental record parser over a raw archive stream (ADVICE r13:
    * the former whole-archive gunzip buffer overflowed Int capacity at
    * ~512 MB compressed and could never exceed the 2 GB JVM array cap
    * — a real CC archive decompresses past 4 GB). Records materialize
    * ONE AT A TIME: peak memory is a single record's content plus the
    * 64 KiB stream buffers, so archive size is unbounded (each record
    * itself must still fit in an array — WARC payloads are
    * page-sized). Gzip archives decompress through the stream
    * (java's GZIPInputStream consumes concatenated members back to
    * back — the per-record-gzipped CC layout). Malformed framing fails
    * LOUDLY naming the file, record index, and decompressed-stream
    * offset — a silently skipped record is a corpus-loss bug at
    * archive scale.
    *
    * Legal repeated headers (e.g. WARC-Concurrent-To) are preserved
    * comma-joined in the `headers` map (the RFC 7230 list rule) rather
    * than last-wins-dropped (ADVICE r13). */
  def parseStream(file: String, raw: java.io.InputStream): Iterator[WarcRecord] = {
    val buffered = new java.io.BufferedInputStream(raw, 1 << 16)
    buffered.mark(2)
    val b0 = buffered.read(); val b1 = buffered.read()
    buffered.reset()
    val in = new java.io.PushbackInputStream(
      if (b0 == 0x1f && b1 == 0x8b)
        new java.io.BufferedInputStream(
          new java.util.zip.GZIPInputStream(buffered, 1 << 16), 1 << 16)
      else buffered, 1)

    new scala.collection.AbstractIterator[WarcRecord] {
      private var idx = 0
      private var offset = 0L // decompressed-stream position (diagnostics)
      private var nextRec: WarcRecord = null
      private var finished = false

      private def fail(msg: String): Nothing =
        throw new IllegalArgumentException(
          s"warc $file: record $idx at offset $offset $msg")

      /** One CRLF-terminated header line (tolerates bare LF; strips the
        * terminator). Null = clean EOF at a line start. Raw bytes are
        * accumulated and the LINE decodes as UTF-8 (ADVICE r14): ISO
        * 28500's ASCII rule covers field NAMES only — values (notably
        * WARC-Target-URI) legally carry UTF-8, and a per-byte toChar
        * append decoded them as Latin-1, mangling every multi-byte
        * character in a real CC archive's non-ASCII URIs. */
      private def readLine(): String = {
        val buf = new java.io.ByteArrayOutputStream(96)
        var b = in.read()
        if (b < 0) return null
        while (b >= 0 && b != '\n') {
          offset += 1
          buf.write(b)
          b = in.read()
        }
        if (b == '\n') offset += 1
        val arr = buf.toByteArray
        var n = arr.length
        if (n > 0 && arr(n - 1) == '\r') n -= 1
        new String(arr, 0, n, java.nio.charset.StandardCharsets.UTF_8)
      }

      private def advance(): Unit = {
        // tolerate inter-record CRLF padding (the spec's separator is
        // exactly two CRLFs, some writers add more)
        var b = in.read()
        while (b == '\r' || b == '\n') { offset += 1; b = in.read() }
        if (b < 0) { finished = true; return }
        in.unread(b)
        val version = readLine()
        if (version == null || !version.startsWith("WARC/"))
          fail(s"does not start with a WARC version line (got '${
            Option(version).getOrElse("")}')")
        // header block until the blank line; duplicates comma-join
        val headers = new java.util.LinkedHashMap[String, String]()
        var line = readLine()
        while (line != null && line.nonEmpty) {
          val i = line.indexOf(':')
          if (i <= 0) fail(s"has a malformed header '$line'")
          val k = line.substring(0, i).trim.toLowerCase
          val v = line.substring(i + 1).trim
          headers.merge(k, v, (a: String, nv: String) => a + ", " + nv)
          line = readLine()
        }
        if (line == null) fail("has no header terminator (truncated archive)")
        val h = {
          val mb = Map.newBuilder[String, String]
          headers.forEach((k, v) => mb += (k -> v))
          mb.result()
        }
        val len = h.getOrElse("content-length", fail("has no Content-Length"))
          .toLong
        if (len > Int.MaxValue - 8)
          fail(s"claims $len content bytes - a single record above the " +
            "2 GB JVM array cap cannot materialize as one row; re-chunk " +
            "the upstream archive")
        val content = in.readNBytes(len.toInt)
        if (content.length < len)
          fail(s"claims $len content bytes but only ${content.length} " +
            "remain (truncated archive)")
        offset += len
        nextRec = WarcRecord(file, idx,
          h.getOrElse("warc-type", ""),
          // CC writes the URI bare; WARC/1.0 tooling wraps it in <>
          h.getOrElse("warc-target-uri", "").stripPrefix("<").stripSuffix(">"),
          h.getOrElse("warc-date", ""),
          h.getOrElse("content-type", ""),
          h, content)
        idx += 1
      }

      override def hasNext: Boolean = {
        if (nextRec == null && !finished) advance()
        nextRec != null
      }
      override def next(): WarcRecord = {
        if (!hasNext) throw new NoSuchElementException("warc iterator")
        val r = nextRec; nextRec = null; r
      }
    }
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

  /** The header fields [[recordBytes]] writes explicitly — everything
    * ELSE in a record's `headers` map serializes verbatim, so a
    * read→write round-trip preserves headers instead of dropping them
    * (ADVICE r13). */
  private val explicitHeaderKeys = Set("warc-type", "warc-target-uri",
    "warc-date", "content-type", "content-length", "warc-record-id")

  /** One record's framed bytes (optionally as its own gzip member —
    * the CC layout). The ONE serializer shared by [[writeWarc]] and
    * the distributed [[writeWetDir]] sink. Every record gets a
    * WARC-Record-ID (mandatory per ISO 28500 §5.2): the parsed one
    * when present in `headers`, else a DETERMINISTIC urn:uuid derived
    * from the record's content+uri hash (same record bytes → same id,
    * so re-exports stay reproducible); remaining parsed headers
    * serialize in sorted order (deterministic bytes). */
  def recordBytes(r: WarcRecord, gzip: Boolean): Array[Byte] = {
    val head = new StringBuilder
    head ++= "WARC/1.0\r\n"
    head ++= s"WARC-Type: ${r.warc_type}\r\n"
    if (r.target_uri.nonEmpty) head ++= s"WARC-Target-URI: ${r.target_uri}\r\n"
    if (r.warc_date.nonEmpty) head ++= s"WARC-Date: ${r.warc_date}\r\n"
    val recId = r.headers.getOrElse("warc-record-id", {
      val seed = new ByteArrayOutputStream()
      seed.write(r.target_uri.getBytes(StandardCharsets.UTF_8))
      seed.write(0)
      seed.write(r.content)
      s"<urn:uuid:${java.util.UUID.nameUUIDFromBytes(seed.toByteArray)}>"
    })
    head ++= s"WARC-Record-ID: $recId\r\n"
    r.headers.toSeq.filterNot(kv => explicitHeaderKeys.contains(kv._1))
      .sortBy(_._1)
      .foreach { case (k, v) => head ++= s"$k: $v\r\n" }
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
    * through the Hadoop FileSystem API under the SESSION's hadoop
    * configuration, broadcast to the tasks (ADVICE r13: a per-task
    * default Configuration ignored spark.hadoop.* settings — object
    * store credentials/endpoints — while the _SUCCESS marker used the
    * session's, so one job could write data and marker against two
    * different filesystems). The marker lands LAST — the
    * committed-write protocol readers can trust. */
  def writeWetDir(df: DataFrame, dir: String, uriCol: String = "url",
      textCol: String = "text",
      date: String = "1970-01-01T00:00:00Z"): Unit = {
    val spark = df.sparkSession
    import spark.implicits._
    val confBc = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))
    df.select(col(uriCol).cast("string"), col(textCol).cast("string"))
      .as[(String, String)]
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        val p = new org.apache.hadoop.fs.Path(f"$dir/part-$pid%05d.warc.gz")
        val fs = p.getFileSystem(confBc.value.value)
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

}

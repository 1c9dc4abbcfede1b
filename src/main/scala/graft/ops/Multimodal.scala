package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads ride as
  * opaque `binary` columns with a typed metadata struct, processed by
  * codegen'd binary/array builtins so the pipeline stays inside
  * whole-stage codegen at 100 TB.
  *
  * The actual media DECODE step (JPEG→pixels, PCM→samples) needs
  * codec libraries that are not in this container; those entry points
  * are deterministic STUBS (clearly marked) — the Spark-side plumbing
  * (schema, partitioning, batch shape, feature extraction over bytes)
  * is real and tested.
  */
object Multimodal {

  /** Canonical asset schema: payload + typed metadata. */
  def withAssetMeta(df: DataFrame, content: Column, mime: Column): DataFrame =
    df.withColumn("content", content)
      .withColumn("asset_meta", struct(
        mime.as("mime"),
        length(content).as("n_bytes"),
        xxhash64(content).as("content_hash")))

  /** Deterministic mime guess from leading bytes (magic numbers).
    * NULL payloads sniff as NULL (review r13): the when-chain's
    * otherwise() would claim "application/octet-stream" for an asset
    * we know NOTHING about — "unreadable" and "binary data" are
    * different facts to a quarantine consumer. */
  def sniffMime(content: Column): Column = {
    val head = hex(substring(content, 1, 4))
    when(content.isNull, lit(null).cast("string"))
      .when(head.startsWith("FFD8"), "image/jpeg")
      .when(head.startsWith("89504E47"), "image/png")
      .when(head.startsWith("494433"), "audio/mpeg")
      .when(head.startsWith("1A45DFA3"), "video/webm")
      .otherwise("application/octet-stream")
  }

  /** STUB decode: a real deployment plugs a codec here (e.g. a
    * `mapPartitions` over a JNI codec, or `mapInArrow` to a Python
    * worker). The deterministic fake derives a fixed-length
    * "pixel"/"sample" feature vector from the bytes so downstream
    * operators (similarity, dedup, quality) are exercised for real. */
  def decodeFeaturesStub(content: Column, dims: Int = 16): Column = {
    // sequence(0, -1) DESCENDS (the sampleChunksDf bug class, review
    // r11): dims <= 0 returned a phantom 2-element vector silently
    require(dims >= 1, s"dims must be >= 1, got $dims")
    // NULL payloads get a NULL vector (review r13): xxhash64 SKIPS
    // null children, so every null asset hashed to the identical
    // index-only vector — a downstream cosine dedup would collapse all
    // failed-fetch assets into one bogus near-dup cluster
    when(content.isNull, lit(null).cast("array<double>"))
      .otherwise(transform(sequence(lit(0), lit(dims - 1)), i =>
        (xxhash64(content, i).cast("double") / lit(Long.MaxValue.toDouble))))
  }

  /** Byte-level content statistics (real, not stubbed): size, a
    * distinct-byte diversity ratio over a leading 1024-byte sample
    * (compression/corruption heuristic), and the leading 8 magic bytes
    * as uppercase hex. One native compiled pass over the sampled bytes
    * (graft.functions.ByteStatsExpr) — stays inside whole-stage
    * codegen; the previous composed-HOF form allocated a string per
    * sampled byte. */
  def byteStats(content: Column): Column =
    graft.functions.CatalystFunctions.byteStats(content)

  /** Byte-level SimHash for binary payloads: aligned 4-byte chunks
    * vote as "words" in the Charikar fingerprint, so
    * near-identical assets (same media re-muxed, metadata-patched,
    * tail-truncated) land within a small Hamming radius while the
    * 64-bit sketch stays 8 bytes/asset — the dedup sketch for
    * multimodal columns where text shingling has nothing to grab.
    * Pair generation reuses the text path
    * ([[graft.ops.Dedup.simhashPairsFrom]] on (doc_id, simhash)).
    *
    * `md5Words = true` hashes chunk-words with md5 (engine-
    * reproducible — any SQL oracle re-derives the sketch bit-for-bit);
    * the default XXH64 path is the cheap production variant. Both are
    * one map-side pass, no shuffle. */
  def byteSimhash(content: Column, md5Words: Boolean = false): Column =
    if (md5Words)
      // oracle-reproducible variant: md5 of the hex chunk STRING — any
      // SQL engine re-derives it, at string-allocation cost (gate m03)
      graft.functions.CatalystFunctions.simhashMd5(
        regexp_extract_all(hex(content), lit("[0-9A-F]{8}"), lit(0)))
    else
      // production variant: one native compiled pass hashing raw
      // 4-byte chunks — zero intermediate strings
      graft.functions.CatalystFunctions.byteSimhash64(content)

  /** Frame/chunk sampling: split the payload into fixed-size chunks
    * and keep every `stride`-th one — the binary analogue of video
    * frame sampling. Pure per-row slicing; no shuffle. */
  def sampleChunksDf(df: DataFrame, contentCol: String, chunkBytes: Int,
      stride: Int): DataFrame = {
    // review r9: stride = 0 made `i % stride` NULL under non-ANSI SQL
    // and silently dropped every row; chunkBytes = 0 exploded an
    // Infinity-sized sequence
    require(chunkBytes >= 1, s"chunkBytes must be >= 1, got $chunkBytes")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val nChunks = ceil(length(col(contentCol)).cast("double") / chunkBytes).cast("int")
    // empty/null payloads yield NO chunks (review r9: the old
    // greatest(nChunks-1, 0) floor emitted one phantom empty chunk
    // for a 0-byte asset)
    df.withColumn("chunk_idx",
        explode(when(nChunks > 0,
          filter(sequence(lit(0), nChunks - 1), i => i % stride === 0))
          .otherwise(array().cast("array<int>"))))
      .withColumn("chunk",
        // Column API, not expr() interpolation (review r11): a column
        // name needing backticks would fail to parse or silently
        // resolve as a nested-field access
        col(contentCol).substr(col("chunk_idx") * chunkBytes + 1,
          lit(chunkBytes)))
  }

  /** "Resize"/re-encode stub: deterministic truncation standing in for
    * a codec round-trip, preserving the metadata contract. */
  def resizeStub(content: Column, targetBytes: Int): Column =
    substring(content, 1, targetBytes)
}

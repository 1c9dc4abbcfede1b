package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway local driver for iterating on one query (not part of the
  * library surface; kept out of SparkEntry). Currently: connected-
  * components constant-factor experiments (VERDICT r6 #1). */
object Scratch {

  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  // --- variant harness: copies of the CC loop with different knobs ---

  def largeStar(e: DataFrame): DataFrame = {
    val und = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = und.groupBy("u")
      .agg(least(min(col("v")), first(col("u"))).as("m"))
    und.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
  }

  def smallStar(e: DataFrame): DataFrame = {
    val und = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val dir = und.filter(col("v") < col("u"))
    val mins = dir.groupBy("u").agg(min(col("v")).as("m"))
    val moved = dir.join(mins, "u")
      .filter(col("v") =!= col("m"))
      .select(col("v").as("u"), col("m").as("v"))
    val self = mins.select(col("u"), col("m").as("v"))
    moved.union(self).distinct()
  }

  def signature(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(u, v))")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Current shape: one alternation + signature per round. */
  def ccV0(pairs: DataFrame): (DataFrame, Int) = {
    var edges = pairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(eager = false)
    var sig = signature(edges)
    var converged = false
    var it = 0
    while (!converged && it < 50) {
      val next = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val nextSig = signature(next)
      edges.unpersist(blocking = false)
      edges = next
      converged = nextSig == sig
      sig = nextSig
      it += 1
    }
    val nodes = edges.select(greatest(col("u"), col("v")).as("node"),
      least(col("u"), col("v")).as("label"))
    val roots = edges.select(least(col("u"), col("v")).as("node"))
      .distinct().withColumn("label", col("node"))
    (nodes.union(roots).distinct(), it)
  }

  /** Variant: hash-to-min label propagation (O(diameter) rounds; each
    * round = one join + one aggregate over a STATIC edge table). */
  def ccV1(pairs: DataFrame): (DataFrame, Int) = {
    val edges = pairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val und = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint(eager = true) // static across rounds
    var labels = und.groupBy(col("u").as("node"))
      .agg(least(min(col("v")), first(col("u"))).as("label"))
      .localCheckpoint(eager = false)
    var sig = {
      val r = labels.agg(count(lit(1)), expr("bit_xor(xxhash64(node, label))")).head()
      (r.getLong(0), r.getLong(1))
    }
    var converged = false
    var it = 0
    while (!converged && it < 50) {
      // new label(v) = min(label(v), min over neighbors' labels)
      val next = und.join(labels.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), col("label"))
        .union(labels)
        .groupBy("node").agg(min(col("label")).as("label"))
        .localCheckpoint(eager = false)
      val r = next.agg(count(lit(1)), expr("bit_xor(xxhash64(node, label))")).head()
      val nextSig = (r.getLong(0), r.getLong(1))
      labels.unpersist(blocking = false)
      labels = next
      converged = nextSig == sig
      sig = nextSig
      it += 1
    }
    (labels, it)
  }

  /** Variant: current stars, convergence signature every 2nd round. */
  def ccV2(pairs: DataFrame): (DataFrame, Int) = {
    var edges = pairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(eager = false)
    var sig = signature(edges)
    var converged = false
    var it = 0
    while (!converged && it < 50) {
      val mid = smallStar(largeStar(edges)).localCheckpoint(eager = false)
      val next = smallStar(largeStar(mid)).localCheckpoint(eager = false)
      val nextSig = signature(next)
      edges.unpersist(blocking = false)
      mid.unpersist(blocking = false)
      edges = next
      converged = nextSig == sig
      sig = nextSig
      it += 2
    }
    val nodes = edges.select(greatest(col("u"), col("v")).as("node"),
      least(col("u"), col("v")).as("label"))
    val roots = edges.select(least(col("u"), col("v")).as("node"))
      .distinct().withColumn("label", col("node"))
    (nodes.union(roots).distinct(), it)
  }

  /** Variant: lazy checkpoint BETWEEN largeStar and smallStar so the
    * reversed-projection union inside smallStar shares one
    * materialization of largeStar instead of recomputing it. */
  def ccV3(pairs: DataFrame): (DataFrame, Int) = {
    var edges = pairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint(eager = false)
    var sig = signature(edges)
    var converged = false
    var it = 0
    while (!converged && it < 50) {
      val ls = largeStar(edges).localCheckpoint(eager = false)
      val next = smallStar(ls).localCheckpoint(eager = false)
      val nextSig = signature(next)
      edges.unpersist(blocking = false)
      ls.unpersist(blocking = false)
      edges = next
      converged = nextSig == sig
      sig = nextSig
      it += 1
    }
    val nodes = edges.select(greatest(col("u"), col("v")).as("node"),
      least(col("u"), col("v")).as("label"))
    val roots = edges.select(least(col("u"), col("v")).as("node"))
      .distinct().withColumn("label", col("node"))
    (nodes.union(roots).distinct(), it)
  }

  /** Variant: hash-to-min + label-of-label path doubling. */
  def ccV4(pairs: DataFrame): (DataFrame, Int) = {
    val edges = pairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val und = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .localCheckpoint(eager = true)
    var labels = und.groupBy(col("u").as("node"))
      .agg(least(min(col("v")), first(col("u"))).as("label"))
      .localCheckpoint(eager = false)
    var sig = {
      val r = labels.agg(count(lit(1)), expr("bit_xor(xxhash64(node, label))")).head()
      (r.getLong(0), r.getLong(1))
    }
    var converged = false
    var it = 0
    while (!converged && it < 50) {
      val viaEdges = und.join(labels.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), col("label"))
      val viaLabels = labels.alias("x")
        .join(labels.alias("y"), col("x.label") === col("y.node"))
        .select(col("x.node").as("node"), col("y.label").as("label"))
      val next = viaEdges.union(viaLabels).union(labels)
        .groupBy("node").agg(min(col("label")).as("label"))
        .localCheckpoint(eager = false)
      val r = next.agg(count(lit(1)), expr("bit_xor(xxhash64(node, label))")).head()
      val nextSig = (r.getLong(0), r.getLong(1))
      labels.unpersist(blocking = false)
      labels = next
      converged = nextSig == sig
      sig = nextSig
      it += 1
    }
    (labels, it)
  }

  /** Variant: V4 with the static und table pre-partitioned by u so the
    * per-round propagation join never re-exchanges the edges. */
  def ccV5(pairs: DataFrame, doubling: Boolean): (DataFrame, Int) = {
    val edges = pairs
      .select(col("id_a").cast("long").as("u"), col("id_b").cast("long").as("v"))
      .filter(col("u") =!= col("v"))
    val und = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      .distinct()
      .repartition(col("u"))
      .localCheckpoint(eager = true)
    var labels = und.groupBy(col("u").as("node"))
      .agg(least(min(col("v")), first(col("u"))).as("label"))
      .localCheckpoint(eager = false)
    var sig = {
      val r = labels.agg(count(lit(1)), expr("bit_xor(xxhash64(node, label))")).head()
      (r.getLong(0), r.getLong(1))
    }
    var converged = false
    var it = 0
    while (!converged && it < 50) {
      val viaEdges = und.join(labels.withColumnRenamed("node", "u"), "u")
        .select(col("v").as("node"), col("label"))
      val cand =
        if (doubling) {
          val viaLabels = labels.alias("x")
            .join(labels.alias("y"), col("x.label") === col("y.node"))
            .select(col("x.node").as("node"), col("y.label").as("label"))
          viaEdges.union(viaLabels).union(labels)
        } else viaEdges.union(labels)
      val next = cand.groupBy("node").agg(min(col("label")).as("label"))
        .localCheckpoint(eager = false)
      val r = next.agg(count(lit(1)), expr("bit_xor(xxhash64(node, label))")).head()
      val nextSig = (r.getLong(0), r.getLong(1))
      labels.unpersist(blocking = false)
      labels = next
      converged = nextSig == sig
      sig = nextSig
      it += 1
    }
    (labels, it)
  }

  def main(args: Array[String]): Unit = {
    val spark = Tables.withScratch(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")

    val d = Tables.load(spark, dir, "documents")
    val pairs0 = ops.Dedup.simhashPairsFrom(
      d.select(col("doc_id"),
        graft.functions.CatalystFunctions.simhashMd5(
          graft.functions.TextFunctions.words(col("text"))).as("simhash")),
      maxHamming = 3)

    // materialize the pair graph once so CC timings exclude pair gen
    val pairs = pairs0.select("id_a", "id_b").localCheckpoint(eager = true)
    println(s"pairs: ${pairs.count()}")

    time("pairgen (fresh)") { pairs0.count() }

    (1 to 3).foreach { rep =>
      spark.catalog.clearCache()
      val (r0, it0) = time(s"ccV0 rep$rep") { val x = ccV0(pairs); (x._1.count(), x._2) }
      spark.catalog.clearCache()
      val (r5d, it5d) = time(s"ccV5+dbl rep$rep") { val x = ccV5(pairs, doubling = true); (x._1.count(), x._2) }
      spark.catalog.clearCache()
      val (r5s, it5s) = time(s"ccV5simple rep$rep") { val x = ccV5(pairs, doubling = false); (x._1.count(), x._2) }
      println(s"rows v0=$r0 v5d=$r5d v5s=$r5s | rounds v0=$it0 v5d=$it5d v5s=$it5s")
    }

    // cross-check labels agree
    val l0 = ccV0(pairs)._1
    val l5 = ccV5(pairs, doubling = true)._1
    println(s"label mismatch v0 vs v5: ${l0.except(l5).count() + l5.except(l0).count()}")
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.lake.Lake
import graft.sources.LakeScan

/** Static IN-list file pruning on the SQL scan (round 11): Bloom
  * membership + range stats per conjunct value set, the driver-local
  * hash probe pinned identical to the distributed builder, and the
  * conservative keeps. */
class InListSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def fresh(tag: String): String = {
    val d = new java.io.File(graft.Scratch.root,
      s"graft-inlist-$tag-${spark.sparkContext.applicationId}")
    graft.Scratch.rm(d)
    d.getAbsolutePath
  }

  test("driver-local bloom positions equal the distributed builder's") {
    // the builder hashes with xxhash64(lit(i), col) (seed 42, left
    // fold); the local probe reimplements it via XxHash64Function —
    // this pin is what makes drift impossible
    for (v <- Seq(0L, 1L, 42L, -1L, 987654321L, Long.MaxValue, Long.MinValue)) {
      val viaJob = (0 until Lake.BloomHashes).map { i =>
        spark.range(1).select(
          pmod(xxhash64(lit(i), lit(v)), lit(Lake.BloomBits.toLong)))
          .head().getLong(0).toInt
      }
      assert(Lake.bloomPositionsLocal(v) === viaJob, s"value $v")
    }
  }

  test("IN over a bloom-indexed scattered column opens only matching files") {
    val dir = fresh("bloom")
    val orders = Tables.orders(spark, sf)
      .withColumn("o_days",
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long"))
      .drop("o_orderdate")
    Lake.create(orders, dir, "o_orderkey", targetFiles = 2)
    // date-clustered: every file's o_orderkey RANGE spans the domain,
    // so only the bloom can prune
    Lake.compactWithBloom(spark, dir, "o_days", "o_orderkey", targetFiles = 8)
    val df = spark.read.format("graft-lake").option("path", dir).load()
    df.createOrReplaceTempView("inl_t")
    val keys = Seq(11L, 407L, 997L)
    LakeScan.lastInListPrune.set(null)
    val got = spark.sql(
      s"SELECT o_orderkey FROM inl_t WHERE o_orderkey IN (${keys.mkString(",")})")
      .collect().map(_.getLong(0)).sorted.toSeq
    val expected = Lake.read(spark, dir)
      .filter(col("o_orderkey").isin(keys: _*))
      .collect().map(_.getAs[Long]("o_orderkey")).sorted.toSeq
    assert(got === expected)
    val (d, before, after) = LakeScan.lastInListPrune.get()
    assert(d === dir && after < before,
      s"bloom IN-pruning must skip files: $after/$before")
    // a composed range + IN conjunct prunes at least as hard
    LakeScan.lastInListPrune.set(null)
    val one = spark.sql(
      "SELECT count(*) FROM inl_t WHERE o_orderkey IN (11, -5) AND o_days >= 0")
      .head().getLong(0)
    assert(one === 1L)
    // absent value alone: zero files
    LakeScan.lastInListPrune.set(null)
    assert(spark.sql("SELECT count(*) FROM inl_t WHERE o_orderkey IN (-5)")
      .head().getLong(0) === 0L)
    assert(LakeScan.lastInListPrune.get()._3 === 0)
  }

  test("the optimizer's InSet form (long IN lists) prunes too") {
    val dir = fresh("inset")
    val orders = Tables.orders(spark, sf)
      .withColumn("o_days",
        datediff(col("o_orderdate"), lit("1995-01-01")).cast("long"))
      .drop("o_orderdate")
    Lake.create(orders, dir, "o_orderkey", targetFiles = 2)
    Lake.compactWithBloom(spark, dir, "o_days", "o_orderkey", targetFiles = 6)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("inset_t")
    // > inSetConversionThreshold (10) values, mostly absent
    val keys = (1L to 9L) ++ Seq(11L, 13L, -1L, -2L)
    LakeScan.lastInListPrune.set(null)
    val n = spark.sql(
      s"SELECT count(*) FROM inset_t WHERE o_orderkey IN (${keys.mkString(",")})")
      .head().getLong(0)
    val exp = Lake.read(spark, dir).filter(col("o_orderkey").isin(keys: _*)).count()
    assert(n === exp)
    val rec = LakeScan.lastInListPrune.get()
    assert(rec != null && rec._1 === dir, "InSet must reach the pruner")
  }

  test("conservative: no bloom and full-range stats keep every file; strings pass") {
    val dir = fresh("cons")
    Lake.create(Tables.orders(spark, sf), dir, "o_orderkey", targetFiles = 4)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("cons_t")
    // o_custkey: no stats, no bloom — every file kept, answer exact
    val n = spark.sql(
      "SELECT count(*) FROM cons_t WHERE o_custkey IN (1, 2, 3)").head().getLong(0)
    assert(n === Tables.orders(spark, sf)
      .filter(col("o_custkey").isin(1L, 2L, 3L)).count())
    // string IN with neither strStats nor bloom: every file kept
    val s = spark.sql(
      "SELECT count(*) FROM cons_t WHERE o_orderpriority IN ('1-URGENT')")
      .head().getLong(0)
    assert(s === Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT").count())
    // range pruning on the KEY still applies to IN values
    LakeScan.lastInListPrune.set(null)
    val k = spark.sql(
      "SELECT count(*) FROM cons_t WHERE o_orderkey IN (1, 2)").head().getLong(0)
    assert(k === 2L)
    val rec = LakeScan.lastInListPrune.get()
    assert(rec._3 < rec._2, "key IN values outside a file's range must skip it")
  }

  test("driver-local STRING bloom positions equal the distributed builder's") {
    for (v <- Seq("", "a", "doc-00000007", "Ünïcødé-№", "x" * 100)) {
      val viaJob = (0 until Lake.BloomHashes).map { i =>
        spark.range(1).select(
          pmod(xxhash64(lit(i), lit(v)), lit(Lake.BloomBits.toLong)))
          .head().getLong(0).toInt
      }
      assert(Lake.bloomPositionsLocalStr(v) === viaJob, s"value '$v'")
    }
  }

  test("IN over a bloom-indexed scattered STRING column opens only matching files") {
    val dir = fresh("strbloom")
    val docs = Tables.documents(spark, sf)
      .select(concat(lit("doc-"),
          lpad(col("doc_id").cast("string"), 8, "0")).as("doc_key"),
        col("lang"), col("n_chars"))
    Lake.create(docs, dir, "doc_key", targetFiles = 2)
    // length-clustered: every file's doc_key range spans the domain,
    // so only the string-hashed bloom can prune
    Lake.compactWithBloom(spark, dir, "n_chars", "doc_key", targetFiles = 8)
    spark.read.format("graft-lake").option("path", dir).load()
      .createOrReplaceTempView("strb_t")
    val keys = Seq("doc-00000011", "doc-00000222", "doc-00000333")
    LakeScan.lastInListPrune.set(null)
    val got = spark.sql(
      s"""SELECT doc_key FROM strb_t
         |WHERE doc_key IN (${keys.map(k => s"'$k'").mkString(",")})"""
        .stripMargin)
      .collect().map(_.getString(0)).sorted.toSeq
    val expected = Lake.read(spark, dir)
      .filter(col("doc_key").isin(keys: _*))
      .collect().map(_.getAs[String]("doc_key")).sorted.toSeq
    assert(got === expected && got.nonEmpty)
    val (d, before, after) = LakeScan.lastInListPrune.get()
    assert(d === dir && after < before,
      s"string bloom IN-pruning must skip files: $after/$before")
    // equality form prunes too
    LakeScan.lastInListPrune.set(null)
    assert(spark.sql(
      "SELECT count(*) FROM strb_t WHERE doc_key = 'doc-00000011'")
      .head().getLong(0) === 1L)
    val eq = LakeScan.lastInListPrune.get()
    assert(eq._3 < eq._2, "string equality must probe the bloom")
    // absent value: zero files opened
    LakeScan.lastInListPrune.set(null)
    assert(spark.sql(
      "SELECT count(*) FROM strb_t WHERE doc_key IN ('doc-absent')")
      .head().getLong(0) === 0L)
    assert(LakeScan.lastInListPrune.get()._3 === 0)
  }
}

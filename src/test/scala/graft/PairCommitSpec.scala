package graft

import org.apache.spark.sql.functions._

import graft.lake.Lake

/** Cross-table atomic commits (round 11): staged pending heads stay
  * invisible until the shared txn file publishes them, one in-flight
  * transaction gates further commits, aborted heads garbage-collect
  * with version reuse, and explicit time travel can still audit a
  * staged version. */
class PairCommitSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def fresh(tag: String): String = {
    val d = new java.io.File(graft.Scratch.root,
      s"graft-pairspec-$tag-${spark.sparkContext.applicationId}")
    graft.Scratch.rm(d)
    d.getAbsolutePath
  }

  private def build(tag: String): (String, String) = {
    val dir = fresh(tag)
    val orders = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_orderpriority"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"))
    Lake.create(orders, dir, "o_orderkey", targetFiles = 3)
    (dir, fresh(tag + "-txn"))
  }

  test("pending commit is invisible until publish; one atomic publish flips it") {
    val (dir, root) = build("vis")
    val before = Lake.read(spark, dir).count()
    Lake.upsertPending(spark, dir,
      Lake.read(spark, dir).limit(100)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L),
      root, "tx")
    assert(Lake.latestVersion(dir) === 1L, "staged head must be invisible")
    assert(Lake.read(spark, dir).count() === before)
    // explicit version audit CAN see the staged commit (Delta's WAP)
    assert(Lake.read(spark, dir, 2L).count() === before + 100)
    Lake.publishTxn(root, "tx")
    assert(Lake.latestVersion(dir) === 2L)
    assert(Lake.read(spark, dir).count() === before + 100)
    // publish is idempotent; abort after publish refuses
    Lake.publishTxn(root, "tx")
    intercept[IllegalArgumentException] { Lake.abortTxn(root, "tx") }
  }

  test("an unresolved transaction gates further commits; abort GCs and reuses the version") {
    val (dir, root) = build("gate")
    Lake.upsertPending(spark, dir,
      Lake.read(spark, dir).limit(10)
        .withColumn("cents", col("cents") * 2), root, "tx2")
    val e = intercept[RuntimeException] {
      Lake.upsert(spark, dir, Lake.read(spark, dir).limit(1)
        .withColumn("cents", lit(0L)))
    }
    assert(e.getMessage.contains("in-flight"))
    Lake.abortTxn(root, "tx2")
    val sumBefore = Lake.read(spark, dir).agg(sum("cents")).head().getLong(0)
    // the next plain commit garbage-collects the dead head and REUSES
    // its version number — no hole in the consecutive log
    Lake.upsert(spark, dir, Lake.read(spark, dir)
      .filter(col("o_orderkey") % 9 === 0).withColumn("cents", col("cents") + 1L))
    assert(Lake.latestVersion(dir) === 2L)
    val bumped = Tables.orders(spark, sf)
      .filter(col("o_orderkey") % 9 === 0).count()
    assert(Lake.read(spark, dir).agg(sum("cents")).head().getLong(0)
      === sumBefore + bumped)
  }

  test("crash before the staged delta publishes self-heals as no-transaction") {
    val (dir, root) = build("crash")
    // simulate: the _pending flag lands but the process dies before the
    // delta write — readers and the next commit must both shrug it off
    val flag = java.nio.file.Paths.get(dir, "_manifests", "_pending")
    java.nio.file.Files.write(flag,
      ("99\n" + "deadbeef\n" + "deadbeef").getBytes)
    assert(Lake.latestVersion(dir) === 1L)
    Lake.upsert(spark, dir, Lake.read(spark, dir).limit(5)
      .withColumn("cents", col("cents") + 1L))
    assert(Lake.latestVersion(dir) === 2L)
    assert(!java.nio.file.Files.exists(flag), "stale flag must self-heal")
  }

  test("a pending commit on a checkpoint boundary defers the checkpoint") {
    val (dir, root) = build("ckpt")
    // drive to version 7 with plain commits, stage v8 pending
    (2 to 7).foreach { i =>
      Lake.upsert(spark, dir, Lake.read(spark, dir).limit(3)
        .withColumn("cents", col("cents") + lit(i.toLong)))
    }
    assert(Lake.latestVersion(dir) === 7L)
    Lake.upsertPending(spark, dir, Lake.read(spark, dir).limit(3)
      .withColumn("cents", col("cents") + 100L), root, "tx8")
    val ckpt = java.nio.file.Paths.get(dir, "_manifests", "v00000008.ckpt")
    assert(!java.nio.file.Files.exists(ckpt),
      "an invisible staged version must not become a resolution base")
    Lake.publishTxn(root, "tx8")
    assert(Lake.latestVersion(dir) === 8L)
    // resolution works from the older base; the next commit checkpoints
    // on its own schedule
    assert(Lake.read(spark, dir).count() === Lake.read(spark, dir, 7L).count())
  }
}

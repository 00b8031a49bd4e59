package graft

import org.apache.spark.sql.functions._

import graft.analytics.ZOrder

/** Z-order layout: bit-exact Morton codes, the tile-locality invariant
  * that makes min/max skipping work, and the two-dimensional file
  * clustering of compactZOrder. */
class ZOrderSpec extends SparkSpec {

  test("zValue interleaves bits exactly (known vectors)") {
    import spark.implicits._
    // (x, y, morton): x on even bits, y on odd
    val cases = Seq(
      (0L, 0L, 0L),
      (1L, 0L, 1L),
      (0L, 1L, 2L),
      (1L, 1L, 3L),
      (3L, 1L, 7L),          // 11 ⊗ 01 → 0111
      (5L, 3L, 27L),         // 101 ⊗ 011 → 011011
      (65535L, 0L, 0x55555555L),
      (0L, 65535L, 0xAAAAAAAAL),
      (65535L, 65535L, 0xFFFFFFFFL))
    val got = cases.toDF("x", "y", "want")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"), col("want"))
      .collect()
    got.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("tile invariant: within a z>>2j bucket both x>>j and y>>j are constant") {
    import spark.implicits._
    val pts = for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong)
    val j = 3
    val tiles = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue(col("x"), col("y")).as("z"))
      .groupBy(shiftright(col("z"), 2 * j).as("tile"))
      .agg(countDistinct(shiftright(col("x"), j)).as("nx"),
        countDistinct(shiftright(col("y"), j)).as("ny"),
        count(lit(1)).as("n"))
      .collect()
    assert(tiles.length === 64) // 8×8 tiles of 8×8 points
    tiles.foreach { r =>
      assert(r.getAs[Long]("nx") === 1L && r.getAs[Long]("ny") === 1L,
        s"tile ${r.get(0)} spans more than one coordinate block")
      assert(r.getAs[Long]("n") === 64L)
    }
  }

  test("compactZOrder: bounded file count, both dimensions clustered") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val df = (0 until 4096).map { i => (i % 64L, (i / 64).toLong, i.toLong) }
      .toDF("x", "y", "payload")
    ZOrder.compactZOrder(df, dir, files = 16, "x", "y")
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getName).sorted
    assert(files.length <= 16 && files.length >= 8, files.mkString(","))
    val back = spark.read.parquet(dir)
    assert(back.count() === 4096)
    // per-file coordinate spans: a z-range cut bounds BOTH x and y
    // (each file covers a fraction of each dimension; a plain sort
    // would give one dimension full 0..63 span in every file)
    val spans = back.withColumn("f", input_file_name())
      .groupBy(col("f"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .collect()
    assert(spans.forall(_.getAs[Long]("xs") < 64L))
    val avgY = spans.map(_.getAs[Long]("ys")).sum.toDouble / spans.length
    assert(avgY < 48.0, s"y not clustered: avg span $avgY") // vs 63 unclustered
  }
}

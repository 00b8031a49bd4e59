package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StringType}

import graft.lake.{Lake, MatView}

/** Declared schema evolution over column mapping (round 11):
  * RENAME / DROP COLUMN and lossless type WIDENING as metadata-only
  * commits, re-ADD-after-DROP isolation, time travel below every
  * ALTER, the change feed across a rename, copy-on-write mutations of
  * mapped tables, and the MV-invalidation dependency check. */
class SchemaEvolutionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def freshDir(tag: String): String = {
    val d = new java.io.File(graft.Scratch.root,
      s"graft-evospec-$tag-${spark.sparkContext.applicationId}")
    graft.Scratch.rm(d)
    d.getAbsolutePath
  }

  private def build(tag: String): String = {
    val dir = freshDir(tag)
    val orders = Tables.orders(spark, sf).select(
      col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
      (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
        .as("cents"),
      (col("o_orderkey") % 100).cast("int").as("small_i"))
    Lake.create(orders, dir, "o_orderkey", targetFiles = 4)
    dir
  }

  test("rename is metadata-only; both shapes serve at their versions") {
    val dir = build("rename")
    val filesBefore = Lake.manifest(dir, 1L).files.map(_.name).toSet
    val v = Lake.renameColumn(spark, dir, "o_orderpriority", "prio")
    assert(v === 2L)
    assert(Lake.manifest(dir, 2L).files.map(_.name).toSet === filesBefore,
      "rename must not touch data files")
    val now = Lake.read(spark, dir)
    assert(now.columns.contains("prio") && !now.columns.contains("o_orderpriority"))
    val old = Lake.read(spark, dir, 1L)
    assert(old.columns.contains("o_orderpriority") && !old.columns.contains("prio"))
    // values identical under either name
    assert(now.groupBy("prio").count().orderBy("prio").collect().toSeq ===
      old.groupBy("o_orderpriority").count().orderBy("o_orderpriority")
        .collect().toSeq)
    // renaming a key column refuses
    val e = intercept[IllegalArgumentException] {
      Lake.renameColumn(spark, dir, "o_orderkey", "k")
    }
    assert(e.getMessage.contains("key column"))
  }

  test("widen: declared type widens, stored narrow values promote exactly") {
    val dir = build("widen")
    Lake.widenColumn(spark, dir, "small_i", LongType)
    val now = Lake.read(spark, dir)
    assert(now.schema("small_i").dataType === LongType)
    assert(Lake.read(spark, dir, 1L).schema("small_i").dataType === IntegerType)
    // values identical through the promotion
    val wide = now.agg(sum(col("small_i"))).head().getLong(0)
    val narrow = Lake.read(spark, dir, 1L)
      .agg(sum(col("small_i").cast("long"))).head().getLong(0)
    assert(wide === narrow)
    // a WRITE after the widening lands wide; the mixed snapshot reads
    Lake.upsert(spark, dir, Lake.read(spark, dir)
      .filter(col("o_orderkey") % 9 === 0)
      .withColumn("small_i", col("small_i") + 1000L))
    assert(Lake.read(spark, dir).schema("small_i").dataType === LongType)
    // narrowing refuses
    val e = intercept[IllegalArgumentException] {
      Lake.widenColumn(spark, dir, "cents", IntegerType)
    }
    assert(e.getMessage.contains("widening"))
    // string → anything refuses
    intercept[IllegalArgumentException] {
      Lake.widenColumn(spark, dir, "o_orderpriority", DoubleType)
    }
  }

  test("drop + re-add: fresh physical identity, nothing resurrects") {
    val dir = build("dropadd")
    val custSumBefore = Lake.read(spark, dir)
      .agg(sum(col("o_custkey"))).head().getLong(0)
    assert(custSumBefore > 0L)
    Lake.dropColumn(spark, dir, "o_custkey")
    assert(!Lake.read(spark, dir).columns.contains("o_custkey"))
    // time travel below the drop still serves it
    assert(Lake.read(spark, dir, 1L)
      .agg(sum(col("o_custkey"))).head().getLong(0) === custSumBefore)
    Lake.addColumns(spark, dir, Seq(
      org.apache.spark.sql.types.StructField("o_custkey", LongType)))
    val readded = Lake.read(spark, dir)
    assert(readded.columns.contains("o_custkey"))
    assert(readded.filter(col("o_custkey").isNotNull).count() === 0L,
      "a re-added column must NOT resurrect dropped data")
    // writes populate the fresh identity; old rows stay NULL
    Lake.upsert(spark, dir, Lake.read(spark, dir)
      .filter(col("o_orderkey") % 50 === 0)
      .withColumn("o_custkey", lit(7L)))
    val pop = Lake.read(spark, dir)
    assert(pop.filter(col("o_custkey") === 7L).count() ===
      pop.filter(col("o_orderkey") % 50 === 0).count())
    // dropping a key column refuses
    intercept[IllegalArgumentException] { Lake.dropColumn(spark, dir, "o_orderkey") }
  }

  test("copy-on-write mutations and the change feed work through the mapping") {
    val dir = build("cow")
    Lake.renameColumn(spark, dir, "cents", "amount_cents")
    val v2 = Lake.latestVersion(dir)
    // upsert + delete on the RENAMED column's table
    Lake.upsert(spark, dir, Lake.read(spark, dir)
      .filter(col("o_orderkey") % 7 === 0)
      .withColumn("amount_cents", col("amount_cents") * 2))
    Lake.delete(spark, dir, Lake.read(spark, dir)
      .filter(col("o_orderkey") % 11 === 0).select(col("o_orderkey")))
    // updateWhere through the DML path
    Lake.updateWhere(spark, dir, col("o_orderkey") % 13 === 0,
      Seq("amount_cents" -> (col("amount_cents") + 1L)))
    // snapshot equals the relational recompute from v1 under old names
    val expected = Lake.read(spark, dir, 1L)
      .filter(col("o_orderkey") % 11 =!= 0)
      .withColumn("amount_cents",
        when(col("o_orderkey") % 7 === 0, col("cents") * 2).otherwise(col("cents")))
      .withColumn("amount_cents",
        when(col("o_orderkey") % 13 === 0, col("amount_cents") + 1L)
          .otherwise(col("amount_cents")))
      .agg(sum("amount_cents")).head().getLong(0)
    assert(Lake.read(spark, dir).agg(sum("amount_cents")).head().getLong(0)
      === expected)
    // the change feed across the rename surfaces CURRENT logical names
    val feed = Lake.changes(spark, dir, v2)
    assert(feed.columns.contains("amount_cents") && !feed.columns.contains("cents"))
    assert(feed.filter(col("_change_type") === "delete").count() > 0L)
    // compaction of a mapped table round-trips
    Lake.compact(spark, dir, targetFiles = 2)
    assert(Lake.read(spark, dir).agg(sum("amount_cents")).head().getLong(0)
      === expected)
  }

  test("SQL scan + manifest skipping read through the mapping") {
    val dir = build("sqlscan")
    // give the renamed column per-file stats via a clustered layout
    Lake.compactClustered(spark, dir, Seq("small_i"), targetFiles = 4)
    Lake.renameColumn(spark, dir, "small_i", "bucket_i")
    Lake.widenColumn(spark, dir, "bucket_i", LongType)
    val df = spark.read.format("graft-lake").option("path", dir).load()
    df.createOrReplaceTempView("evo_sql")
    val viaSql = spark.sql(
      "SELECT count(*) AS n, CAST(sum(bucket_i) AS BIGINT) AS s FROM evo_sql " +
        "WHERE bucket_i BETWEEN 10 AND 19").head()
    val direct = Lake.read(spark, dir)
      .filter(col("bucket_i").between(10L, 19L))
      .agg(count(lit(1)), sum("bucket_i")).head()
    assert(viaSql.getLong(0) === direct.getLong(0))
    assert(viaSql.getLong(1) === direct.getLong(1))
    // the scan builder prunes files on the RENAMED column's stats
    // (stats ride the physical name; filters arrive logical)
    val builder = new graft.sources.LakeScanBuilder(spark, dir,
      Lake.latestVersion(dir), Lake.snapshotSchema(spark, dir))
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference => AR,
      GreaterThanOrEqual, LessThanOrEqual, Literal => L}
    val attr = AR("bucket_i", LongType)()
    val pruned = builder.prunedFiles(Seq(
      GreaterThanOrEqual(attr, L(10L)), LessThanOrEqual(attr, L(19L))))
    val all = Lake.manifest(dir, Lake.latestVersion(dir)).files
    assert(pruned.size < all.size,
      s"stats pruning must bite through the rename: ${pruned.size}/${all.size}")
  }

  test("DROP COLUMN invalidates dependent materialized views") {
    val dir = build("mvdep")
    MatView.define(spark, dir, dir + "-view",
      Seq("o_orderpriority"), Seq("cents"))
    assert(MatView.get(dir).isDefined)
    val (_, dropped) = Lake.dropColumn(spark, dir, "cents")
    assert(dropped === Seq(dir + "-view"),
      "dropping a register column must invalidate the dependent view")
    assert(MatView.get(dir).isEmpty)
    // a view on OTHER columns survives an unrelated drop
    MatView.define(spark, dir, dir + "-view2",
      Seq("o_orderpriority"), Seq("small_i"))
    val (_, dropped2) = Lake.dropColumn(spark, dir, "o_custkey")
    assert(dropped2.isEmpty && MatView.get(dir).isDefined)
    MatView.unregister(dir)
  }
}

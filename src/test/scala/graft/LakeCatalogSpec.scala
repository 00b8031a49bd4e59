package graft

import org.apache.spark.sql.functions._

import graft.lake.Lake

/** [[graft.sources.LakeCatalog]] — catalog-qualified SQL over the lake
  * format: DDL (CREATE/CTAS/DROP/RENAME/SHOW), DML through the V2
  * write path, per-query re-resolution (no stale temp-view pinning),
  * and the time-travel syntax (`VERSION AS OF` / `TIMESTAMP AS OF`)
  * answered from the delta log. */
class LakeCatalogSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private lazy val warehouse: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-lake-cat").toString
    spark.conf.set("spark.sql.catalog.graftcat",
      classOf[graft.sources.LakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.graftcat.warehouse", d)
    d
  }

  private def sql(q: String) = spark.sql(q)

  test("CREATE TABLE + INSERT INTO + SELECT, re-resolved per query") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.main")
    sql("""CREATE TABLE graftcat.main.orders_c
          |  (o_orderkey BIGINT, o_totalprice DOUBLE, o_orderpriority STRING)
          |  TBLPROPERTIES ('key'='o_orderkey')""".stripMargin)
    assert(Lake.latestVersion(s"$warehouse/main/orders_c") === 1L)
    assert(sql("SELECT * FROM graftcat.main.orders_c").count() === 0L)
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .createOrReplaceTempView("cat_orders_src")
    sql("""INSERT INTO graftcat.main.orders_c
          |SELECT * FROM cat_orders_src WHERE o_orderkey <= 100""".stripMargin)
    // the SAME identifier re-resolves to the new version — no reload step
    val n1 = sql("SELECT count(*) AS n FROM graftcat.main.orders_c")
      .collect()(0).getLong(0)
    assert(n1 === Tables.orders(spark, sf)
      .filter(col("o_orderkey") <= 100).count())
    // upsert semantics through the catalog: overlapping keys replaced
    sql("""INSERT INTO graftcat.main.orders_c
          |SELECT o_orderkey, o_totalprice, 'CAT-V3' FROM cat_orders_src
          |WHERE o_orderkey <= 50""".stripMargin)
    val t = sql("SELECT * FROM graftcat.main.orders_c")
    assert(t.count() === n1)
    assert(t.filter(col("o_orderkey") <= 50 &&
      col("o_orderpriority") =!= "CAT-V3").count() === 0L)
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve from the delta log") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.tt")
    sql("""CREATE TABLE graftcat.tt.t (k BIGINT, v STRING)
          |  TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("INSERT INTO graftcat.tt.t VALUES (1, 'a'), (2, 'b')")
    val midMillis = System.currentTimeMillis()
    Thread.sleep(20)
    sql("INSERT INTO graftcat.tt.t VALUES (2, 'B2'), (3, 'c')")
    assert(sql("SELECT count(*) AS n FROM graftcat.tt.t").collect()(0).getLong(0) === 3L)
    assert(sql("SELECT count(*) AS n FROM graftcat.tt.t VERSION AS OF 2")
      .collect()(0).getLong(0) === 2L)
    assert(sql("SELECT v FROM graftcat.tt.t VERSION AS OF 2 WHERE k = 2")
      .collect()(0).getString(0) === "b")
    val ts = new java.sql.Timestamp(midMillis).toString
    assert(sql(s"SELECT count(*) AS n FROM graftcat.tt.t TIMESTAMP AS OF '$ts'")
      .collect()(0).getLong(0) === 2L)
  }

  test("CTAS lands create + append; INSERT OVERWRITE replaces through the catalog") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.ctas")
    Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .createOrReplaceTempView("ctas_src")
    sql("""CREATE TABLE graftcat.ctas.slice TBLPROPERTIES ('key'='o_orderkey')
          |AS SELECT * FROM ctas_src WHERE o_orderkey BETWEEN 1 AND 200""".stripMargin)
    val dir = s"$warehouse/ctas/slice"
    assert(Lake.latestVersion(dir) === 2L) // empty create + CTAS append
    val expect = Tables.orders(spark, sf)
      .filter(col("o_orderkey").between(1, 200)).count()
    assert(sql("SELECT * FROM graftcat.ctas.slice").count() === expect)
    sql("""INSERT OVERWRITE graftcat.ctas.slice
          |SELECT * FROM ctas_src WHERE o_orderkey BETWEEN 300 AND 320""".stripMargin)
    assert(sql("SELECT min(o_orderkey) AS lo FROM graftcat.ctas.slice")
      .collect()(0).getLong(0) >= 300L)
    assert(Lake.latestVersion(dir) === 3L)
  }

  test("SQL DELETE FROM: copy-on-write delete of the matching keys, version advances") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.del")
    Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority", "o_totalprice")
      .createOrReplaceTempView("del_src")
    sql("""CREATE TABLE graftcat.del.t TBLPROPERTIES ('key'='o_orderkey')
          |AS SELECT * FROM del_src WHERE o_orderkey <= 400""".stripMargin)
    val before = sql("SELECT * FROM graftcat.del.t").count()
    sql("""DELETE FROM graftcat.del.t
          |WHERE o_orderkey <= 100 OR o_orderkey IN (201, 203)""".stripMargin)
    val t = sql("SELECT * FROM graftcat.del.t")
    assert(t.filter(col("o_orderkey") <= 100 ||
      col("o_orderkey").isin(201, 203)).count() === 0L)
    val doomed = Tables.orders(spark, sf).filter(col("o_orderkey") <= 400)
      .filter(col("o_orderkey") <= 100 || col("o_orderkey").isin(201, 203)).count()
    assert(t.count() === before - doomed)
    // a predicate no source filter can carry is REFUSED whole, not
    // silently partially applied
    val e = intercept[Exception] {
      sql("DELETE FROM graftcat.del.t WHERE o_orderkey % 2 = 0")
    }
    assert(Option(e.getMessage).exists(_.contains("Cannot delete")), s"got: $e")
    assert(Lake.latestVersion(s"$warehouse/del/t") === 3L)
    // the deleted rows still travel: the pre-delete snapshot has them
    assert(sql("SELECT count(*) AS n FROM graftcat.del.t VERSION AS OF 2")
      .collect()(0).getLong(0) === before)
  }

  test("CALL procedures: optimize compacts, zorder re-clusters, vacuum reclaims") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.proc")
    Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_orderpriority")
      .createOrReplaceTempView("proc_src")
    sql("""CREATE TABLE graftcat.proc.t TBLPROPERTIES ('key'='o_orderkey')
          |AS SELECT * FROM proc_src WHERE o_orderkey <= 500""".stripMargin)
    val dir = s"$warehouse/proc/t"
    val before = sql("SELECT * FROM graftcat.proc.t").collect().map(_.toSeq).toSet
    val v = sql("CALL graftcat.optimize(tbl => 'proc.t', target_files => 1)")
      .collect()(0).getLong(0)
    assert(v === 3L)
    assert(Lake.manifest(dir, v).files.size === 1)
    assert(sql("SELECT * FROM graftcat.proc.t").collect().map(_.toSeq).toSet === before)
    val vz = sql("CALL graftcat.zorder(tbl => 'proc.t', x => 'o_orderkey', " +
      "y => 'o_custkey', target_files => 4)").collect()(0).getLong(0)
    assert(vz === 4L)
    assert(sql("SELECT * FROM graftcat.proc.t").collect().map(_.toSeq).toSet === before)
    val reclaimed = sql("CALL graftcat.vacuum(tbl => 'proc.t', retain_versions => 1)")
      .collect()(0).getLong(0)
    assert(reclaimed > 0L)
    assert(sql("SELECT * FROM graftcat.proc.t").collect().map(_.toSeq).toSet === before)
    intercept[Exception] { sql("SELECT * FROM graftcat.proc.t VERSION AS OF 1") }
  }

  test("SHOW TABLES, RENAME, DROP; CREATE without a key is rejected") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.ddl")
    sql("CREATE TABLE graftcat.ddl.a (k BIGINT) TBLPROPERTIES ('key'='k')")
    assert(sql("SHOW TABLES IN graftcat.ddl").collect()
      .map(_.getString(1)).contains("a"))
    // the RENAME target is catalog-relative (Spark resolves it inside
    // the source table's catalog)
    sql("ALTER TABLE graftcat.ddl.a RENAME TO ddl.b")
    assert(!sql("SHOW TABLES IN graftcat.ddl").collect()
      .map(_.getString(1)).contains("a"))
    sql("INSERT INTO graftcat.ddl.b VALUES (7)")
    assert(sql("SELECT k FROM graftcat.ddl.b").collect()(0).getLong(0) === 7L)
    sql("DROP TABLE graftcat.ddl.b")
    assert(!new java.io.File(s"$warehouse/ddl/b").exists())
    val e = intercept[Exception] {
      sql("CREATE TABLE graftcat.ddl.nokey (k BIGINT)")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("clustering key")), s"got: $e")
  }

  test("ALTER TABLE ADD COLUMNS: metadata-only commit, null-fill, old shape below") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.evo")
    sql("""CREATE TABLE graftcat.evo.t (k BIGINT, v STRING)
          |  TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("INSERT INTO graftcat.evo.t VALUES (1, 'a'), (2, 'b')")
    val dir = s"$warehouse/evo/t"
    val before = Lake.latestVersion(dir)
    def parquetCount: Int = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    }
    val dataFiles = parquetCount
    sql("ALTER TABLE graftcat.evo.t ADD COLUMNS (score DOUBLE, tag STRING)")
    assert(Lake.latestVersion(dir) === before + 1L) // one commit
    // METADATA-ONLY: the ALTER writes no data file, just a log line
    assert(parquetCount === dataFiles)
    // existing rows null-fill through the declared schema
    val rows = sql("SELECT k, v, score, tag FROM graftcat.evo.t ORDER BY k").collect()
    assert(rows.length === 2 && rows.forall(r => r.isNullAt(2) && r.isNullAt(3)))
    // new column writable + aggregable immediately
    sql("INSERT INTO graftcat.evo.t VALUES (3, 'c', 9.5, 'hot')")
    val agg = sql("""SELECT count(*) AS n, count(score) AS n_score
                    |FROM graftcat.evo.t""".stripMargin).collect()(0)
    assert(agg.getLong(0) === 3L && agg.getLong(1) === 1L)
    // time travel BELOW the alter serves the old 2-column shape
    assert(sql(s"SELECT * FROM graftcat.evo.t VERSION AS OF $before")
      .schema.fieldNames.toSeq === Seq("k", "v"))
    // refusals: key-column mutations and duplicate adds (non-key
    // RENAME/DROP/widen are first-class since round 11 —
    // SchemaEvolutionSpec covers them)
    def msgs2(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs2(x.getCause))
    val eDrop = intercept[Exception] { sql("ALTER TABLE graftcat.evo.t DROP COLUMN k") }
    assert(msgs2(eDrop).exists(_.contains("key column")), s"got: $eDrop")
    val eDup = intercept[Exception] { sql("ALTER TABLE graftcat.evo.t ADD COLUMNS (v STRING)") }
    assert(msgs2(eDup).exists(_.contains("already exists")), s"got: $eDup")
    // and the catalog SQL DROP of a non-key column works end to end
    sql("ALTER TABLE graftcat.evo.t DROP COLUMN tag")
    assert(!sql("SELECT * FROM graftcat.evo.t").schema.fieldNames.contains("tag"))
  }

  test("CALL compact_small: bin-packs only the sub-threshold files, idempotent") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.pack")
    sql("""CREATE TABLE graftcat.pack.t (k BIGINT, v STRING)
          |  TBLPROPERTIES ('key'='k')""".stripMargin)
    // streaming-style accretion: tiny commits → small-file tail
    (1 to 4).foreach(i => sql(s"INSERT INTO graftcat.pack.t VALUES ($i, 'v$i')"))
    // one well-packed big batch that must NOT be rewritten
    Tables.orders(spark, sf).limit(400)
      .select(col("o_orderkey") + 1000, lit("big"))
      .createOrReplaceTempView("pack_big")
    sql("INSERT INTO graftcat.pack.t SELECT * FROM pack_big")
    val dir = s"$warehouse/pack/t"
    val m0 = Lake.manifest(dir, Lake.latestVersion(dir))
    val bigFiles = m0.files.filter(_.rows >= 100).map(_.name).toSet
    assert(m0.files.count(_.rows < 100) >= 2)
    val r = sql("CALL graftcat.compact_small(tbl => 'pack.t', " +
      "row_threshold => 100, target_files => 1)").collect()(0)
    assert(r.getLong(1) >= 2L) // files_packed
    val m1 = Lake.manifest(dir, Lake.latestVersion(dir))
    // big files untouched (same entries), small tail packed to 1
    assert(bigFiles.subsetOf(m1.files.map(_.name).toSet))
    assert(m1.files.size < m0.files.size)
    assert(m1.files.count(f => f.rows > 0 && f.rows < 100) === 1)
    // state bit-identical across the pack
    assert(sql("SELECT * FROM graftcat.pack.t").count() === 404L)
    assert(sql("SELECT sum(k) FROM graftcat.pack.t").collect()(0).getLong(0)
      === (1 to 4).sum + Tables.orders(spark, sf).limit(400)
        .agg(sum(col("o_orderkey") + 1000)).collect()(0).getLong(0))
    // idempotent: one packed file left under threshold → no-op commit
    val vAfter = Lake.latestVersion(dir)
    sql("CALL graftcat.compact_small(tbl => 'pack.t', " +
      "row_threshold => 100, target_files => 1)")
    assert(Lake.latestVersion(dir) === vAfter)
  }

  test("CALL history: one audit row per commit, derived from the delta log") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.hist")
    sql("""CREATE TABLE graftcat.hist.t (k BIGINT, v STRING)
          |  TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("INSERT INTO graftcat.hist.t VALUES (1, 'a'), (2, 'b')")
    sql("ALTER TABLE graftcat.hist.t ADD COLUMNS (score DOUBLE)")
    sql("INSERT INTO graftcat.hist.t VALUES (1, 'a2', 5.0)") // rewrite (key 1)
    val h = sql("CALL graftcat.history(tbl => 'hist.t')").collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L))
    // v2 is "append": the empty create's zero-row anchor file has an
    // inverted key range, so the first insert removes nothing
    assert(h.map(_.getString(2)).toSeq
      === Seq("create", "append", "schema", "rewrite"))
    val alter = h(2)
    assert(alter.getInt(3) === 0 && alter.getInt(4) === 0) // metadata-only
    assert(h(3).getInt(4) > 0) // the upsert removed (rewrote) a file
    // timestamps are monotonic non-decreasing publish instants
    val ts = h.map(_.getLong(1)).toSeq
    assert(ts === ts.sorted)
  }

  test("SQL UPDATE: planner-strategy DML through copy-on-write updateWhere") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.upd")
    sql("""CREATE TABLE graftcat.upd.t (k BIGINT, a STRING, b STRING, x DOUBLE)
          |  TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("""INSERT INTO graftcat.upd.t VALUES
          |  (1, 'a1', 'b1', 10.0), (2, 'a2', 'b2', 20.0), (3, 'a3', 'b3', 30.0)""".stripMargin)
    val dir = s"$warehouse/upd/t"
    val v0 = Lake.latestVersion(dir)
    // plain conditional update, analyzer-cast value (INT literal → DOUBLE)
    sql("UPDATE graftcat.upd.t SET x = x + 5 WHERE k >= 2")
    assert(Lake.latestVersion(dir) === v0 + 1L)
    assert(sql("SELECT sum(x) AS s FROM graftcat.upd.t")
      .collect()(0).getDouble(0) === 10.0 + 25.0 + 35.0)
    // simultaneous assignment: the swap reads both RHS from the
    // ORIGINAL row in one projection
    sql("UPDATE graftcat.upd.t SET a = b, b = a WHERE k = 1")
    val r = sql("SELECT a, b FROM graftcat.upd.t WHERE k = 1").collect()(0)
    assert(r.getString(0) === "b1" && r.getString(1) === "a1")
    // unconditioned UPDATE touches every row
    sql("UPDATE graftcat.upd.t SET b = 'all'")
    assert(sql("SELECT count(*) AS n FROM graftcat.upd.t WHERE b = 'all'")
      .collect()(0).getLong(0) === 3L)
    // a no-match UPDATE commits NOTHING
    val vNow = Lake.latestVersion(dir)
    sql("UPDATE graftcat.upd.t SET b = 'never' WHERE k < 0")
    assert(Lake.latestVersion(dir) === vNow)
    // key assignment and subqueries are refused descriptively
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    val eKey = intercept[Exception] { sql("UPDATE graftcat.upd.t SET k = k + 1") }
    assert(msgs(eKey).exists(_.contains("key column")), s"got: $eKey")
    val eSub = intercept[Exception] {
      sql("""UPDATE graftcat.upd.t SET b = 'z'
            |WHERE k = (SELECT max(k) FROM graftcat.upd.t)""".stripMargin)
    }
    assert(msgs(eSub).exists(_.contains("subqueries")), s"got: $eSub")
    // time travel below the updates reads the original values
    assert(sql(s"SELECT x FROM graftcat.upd.t VERSION AS OF $v0 WHERE k = 2")
      .collect()(0).getDouble(0) === 20.0)
  }

  test("SQL MERGE INTO: four clause families, precedence, guards") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.mrg")
    sql("""CREATE TABLE graftcat.mrg.t (k BIGINT, v STRING, n DOUBLE)
          |  TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("INSERT INTO graftcat.mrg.t VALUES (1,'a',10.0),(2,'b',20.0),(3,'c',30.0),(4,'d',40.0)")
    sql("""CREATE OR REPLACE TEMP VIEW mrg_src AS
          |SELECT * FROM VALUES (1,'x',0.0),(2,'y',5.0),(5,'e',50.0),(6,'f',60.0)
          |AS src(k, v, n)""".stripMargin)
    val dir = s"$warehouse/mrg/t"
    val v0 = Lake.latestVersion(dir)
    sql("""MERGE INTO graftcat.mrg.t t
          |USING mrg_src s
          |ON t.k = s.k
          |WHEN MATCHED AND s.k = 1 THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.v, n = t.n + s.n
          |WHEN NOT MATCHED AND s.k % 2 = 1 THEN INSERT (k, v, n) VALUES (s.k, s.v, s.n)
          |WHEN NOT MATCHED BY SOURCE AND t.k = 4 THEN DELETE""".stripMargin)
    // ONE atomic commit
    assert(Lake.latestVersion(dir) === v0 + 1L)
    val rows = sql("SELECT k, v, n FROM graftcat.mrg.t ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    // k=1 deleted (precedence over the unconditioned update), k=2
    // updated with a cross-side expression, k=3 untouched (matched by
    // no clause? no — unmatched by source, spared by the t.k=4 cond),
    // k=4 NBS-deleted, k=5 odd → inserted, k=6 even → NOT inserted
    assert(rows === Seq((2L, "y", 25.0), (3L, "c", 30.0), (5L, "e", 50.0)))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    // a target row matched by two source rows must error
    sql("""CREATE OR REPLACE TEMP VIEW mrg_dup AS
          |SELECT * FROM VALUES (2,'p',1.0),(2,'q',2.0) AS src(k, v, n)""".stripMargin)
    val eDup = intercept[Exception] {
      sql("""MERGE INTO graftcat.mrg.t t USING mrg_dup s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin)
    }
    assert(msgs(eDup).exists(_.contains("cardinality")), s"got: $eDup")
    // key reassignment in an update clause is refused
    val eKey = intercept[Exception] {
      sql("""MERGE INTO graftcat.mrg.t t USING mrg_src s ON t.k = s.k
            |WHEN MATCHED THEN UPDATE SET k = s.k + 1""".stripMargin)
    }
    assert(msgs(eKey).exists(_.contains("key column")), s"got: $eKey")
  }

  test("CALL delete_mor + rewrite_dvs: sidecar delete, bookkeeping, materialize") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.mor")
    Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
      .createOrReplaceTempView("mor_src")
    sql("""CREATE TABLE graftcat.mor.t TBLPROPERTIES ('key'='o_orderkey')
          |AS SELECT * FROM mor_src WHERE o_orderkey <= 600""".stripMargin)
    val total = sql("SELECT count(*) AS n FROM graftcat.mor.t").collect()(0).getLong(0)
    val doomed = Tables.orders(spark, sf)
      .filter(col("o_orderkey") <= 600 && col("o_orderkey") % 9 === 0).count()
    val r = sql("CALL graftcat.delete_mor(tbl => 'mor.t', " +
      "predicate => 'o_orderkey % 9 = 0')").collect()(0)
    assert(r.getLong(0) === 3L) // CTAS pair + the MoR commit
    assert(r.getLong(2) === doomed) // masked_rows
    // the SQL scan refuses the MoR snapshot until materialized
    val e = intercept[Exception] { sql("SELECT * FROM graftcat.mor.t").count() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("rewrite_dvs")), s"got: $e")
    val v = sql("CALL graftcat.rewrite_dvs(tbl => 'mor.t')").collect()(0).getLong(0)
    assert(v === 4L)
    assert(sql("SELECT count(*) AS n FROM graftcat.mor.t")
      .collect()(0).getLong(0) === total - doomed)
  }

  test("declared schema survives checkpoints and upserts after the ALTER") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.evo2")
    sql("""CREATE TABLE graftcat.evo2.t (k BIGINT, v STRING)
          |  TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("INSERT INTO graftcat.evo2.t VALUES (1, 'a')")
    sql("ALTER TABLE graftcat.evo2.t ADD COLUMNS (score DOUBLE)")
    val dir = s"$warehouse/evo2/t"
    // drive the version count across a checkpoint boundary (interval 8)
    // with upserts that do NOT carry the new column
    (1 to 8).foreach { i =>
      sql(s"INSERT INTO graftcat.evo2.t (k, v) SELECT ${i + 1}, 'x'")
    }
    assert(Lake.latestVersion(dir) >= Lake.CheckpointInterval)
    // resolution from the checkpoint must still carry the declaration
    assert(Lake.snapshotSchema(spark, dir).fieldNames.toSeq
      === Seq("k", "v", "score"))
    val rows = sql("SELECT k, score FROM graftcat.evo2.t ORDER BY k").collect()
    assert(rows.length === 9 && rows.forall(_.isNullAt(1)))
  }

  test("CALL create_mv / refresh_mv: the MV lifecycle stays inside SQL") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.mv")
    sql("""CREATE TABLE graftcat.mv.sales (k BIGINT, grp STRING, amt BIGINT)
          |  TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("""INSERT INTO graftcat.mv.sales VALUES
          |  (1, 'a', 10), (2, 'a', 20), (3, 'b', 5)""".stripMargin)
    val built = sql(
      """CALL graftcat.create_mv(tbl => 'mv.sales', view => 'mv.sales_by_grp',
        |  group_cols => 'grp', sum_cols => 'amt')""".stripMargin)
      .head().getLong(0)
    assert(built === Lake.latestVersion(s"$warehouse/mv/sales"))
    // the view is itself a catalog table
    val v = sql("SELECT grp, __mv_n, __mv_sum_amt FROM graftcat.mv.sales_by_grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(v.toSeq === Seq(("a", 2L, 30L), ("b", 1L, 5L)))
    // mutate the source, refresh, registers advance incrementally
    sql("INSERT INTO graftcat.mv.sales VALUES (4, 'b', 7)")
    // the freshness audit sees the missed (insert-only) commit
    val st = sql("CALL graftcat.mv_status(tbl => 'mv.sales')").head()
    assert(st.getLong(2) === 1L && st.getBoolean(3),
      s"expected 1 commit behind, insert-only; got $st")
    val refreshed = sql("CALL graftcat.refresh_mv(tbl => 'mv.sales')")
      .head().getLong(0)
    assert(refreshed === Lake.latestVersion(s"$warehouse/mv/sales"))
    val v2 = sql("SELECT grp, __mv_n, __mv_sum_amt FROM graftcat.mv.sales_by_grp")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    assert(v2.toSeq === Seq(("a", 2L, 30L), ("b", 2L, 12L)))
    // the transparent rewrite serves CATALOG-QUALIFIED queries too:
    // the registry key is the resolved table dir, shared by both doors
    org.apache.spark.sql.GraftSqlShim.addOptimization(
      spark, graft.plans.MatViewRewrite)
    val agg = sql(
      "SELECT grp, count(*) AS n, sum(amt) AS amt FROM graftcat.mv.sales GROUP BY grp")
    graft.lake.MatView.lastRewrite.set(null)
    agg.queryExecution.optimizedPlan
    val rw = Option(graft.lake.MatView.lastRewrite.get())
    assert(rw.exists(r => r._1 == s"$warehouse/mv/sales" && r._2 == "direct"),
      s"catalog-qualified aggregate must rewrite to the view, got $rw")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq === Seq(("a", 2L, 30L), ("b", 2L, 12L)))
    graft.lake.MatView.unregister(s"$warehouse/mv/sales")
  }

  test("CALL create_mv_distinct / refresh_mv_distinct: the distinct lifecycle in SQL") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.mvd")
    sql("""CREATE TABLE graftcat.mvd.visits (k BIGINT, grp STRING, uid BIGINT)
          |  TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("""INSERT INTO graftcat.mvd.visits VALUES
          |  (1, 'a', 100), (2, 'a', 100), (3, 'a', 200), (4, 'b', 100)""".stripMargin)
    val built = sql(
      """CALL graftcat.create_mv_distinct(tbl => 'mvd.visits',
        |  view => 'mvd.visits_uid', group_cols => 'grp',
        |  distinct_col => 'uid')""".stripMargin).head().getLong(0)
    assert(built === Lake.latestVersion(s"$warehouse/mvd/visits"))
    org.apache.spark.sql.GraftSqlShim.addOptimization(
      spark, graft.plans.MatViewRewrite)
    def agg = sql("""SELECT grp, count(DISTINCT uid) AS u, count(*) AS n
                    |FROM graftcat.mvd.visits GROUP BY grp""".stripMargin)
    def kind = {
      graft.lake.MatView.lastRewrite.set(null)
      agg.queryExecution.optimizedPlan
      Option(graft.lake.MatView.lastRewrite.get())
        .filter(_._1 == s"$warehouse/mvd/visits").map(_._2).getOrElse("none")
    }
    assert(kind === "direct-distinct")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq === Seq(("a", 2L, 3L), ("b", 1L, 1L)))
    // DELETE the only row carrying uid 200 — the distinct count drops,
    // served compensated until the refresh commits the roll-forward
    sql("DELETE FROM graftcat.mvd.visits WHERE k = 3")
    assert(kind === "compensated-distinct")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq === Seq(("a", 1L, 2L), ("b", 1L, 1L)))
    // freshness audit sees the missed delete commit
    val st = sql("CALL graftcat.mvd_status(view => 'mvd.visits_uid')").head()
    assert(st.getLong(2) === 1L, s"expected 1 commit behind, got $st")
    val refreshed = sql(
      "CALL graftcat.refresh_mv_distinct(view => 'mvd.visits_uid')")
      .head().getLong(0)
    assert(refreshed === Lake.latestVersion(s"$warehouse/mvd/visits"))
    assert(sql("CALL graftcat.mvd_status(view => 'mvd.visits_uid')")
      .head().getLong(2) === 0L)
    assert(kind === "direct-distinct")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq === Seq(("a", 1L, 2L), ("b", 1L, 1L)))
    graft.lake.MatView.unregisterDistinct(s"$warehouse/mvd/visits_uid")
  }

  test("CALL create_mv_join / refresh_mv_join: the star-view lifecycle stays inside SQL") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.mvj")
    sql("""CREATE TABLE graftcat.mvj.fact (k BIGINT, ck BIGINT, amt BIGINT)
          |  TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("""INSERT INTO graftcat.mvj.fact VALUES
          |  (1, 10, 100), (2, 10, 200), (3, 20, 5)""".stripMargin)
    sql("""CREATE TABLE graftcat.mvj.cust (ckey BIGINT, seg STRING)
          |  TBLPROPERTIES ('key'='ckey')""".stripMargin)
    sql("INSERT INTO graftcat.mvj.cust VALUES (10, 'gold'), (20, 'iron')")
    val built = sql(
      """CALL graftcat.create_mv_join(tbl => 'mvj.fact', dim => 'mvj.cust',
        |  fact_key => 'ck', dim_key => 'ckey', view => 'mvj.by_seg',
        |  group_cols => 'seg', sum_cols => 'amt')""".stripMargin)
      .head().getLong(0)
    assert(built === Lake.latestVersion(s"$warehouse/mvj/fact"))
    // the catalog-qualified RAW join aggregate rewrites to the view
    org.apache.spark.sql.GraftSqlShim.addOptimization(
      spark, graft.plans.MatViewRewrite)
    def agg = sql(
      """SELECT seg, count(*) AS n, sum(amt) AS amt
        |FROM graftcat.mvj.fact JOIN graftcat.mvj.cust ON ck = ckey
        |GROUP BY seg""".stripMargin)
    def kind: String = {
      graft.lake.MatView.lastRewrite.set(null)
      agg.queryExecution.optimizedPlan
      Option(graft.lake.MatView.lastRewrite.get()).map(_._2).getOrElse("none")
    }
    assert(kind === "direct-join")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq === Seq(("gold", 2L, 300L), ("iron", 1L, 5L)))
    // fact moves on -> compensated; refresh through SQL -> direct again
    sql("INSERT INTO graftcat.mvj.fact VALUES (4, 20, 15)")
    assert(kind === "compensated-join")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq === Seq(("gold", 2L, 300L), ("iron", 2L, 20L)))
    sql("CALL graftcat.refresh_mv_join(tbl => 'mvj.fact', dim => 'mvj.cust')")
    assert(kind === "direct-join")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq === Seq(("gold", 2L, 300L), ("iron", 2L, 20L)))
    // DIMENSION churn (round 11): customer 10 changes segment; the
    // serve absorbs the move IN-PLAN (session III), and CALL
    // refresh_mv_dims then re-labels the aux subtotals durably —
    // the fact table is never read on either path
    sql("UPDATE graftcat.mvj.cust SET seg = 'moved' WHERE ckey = 10")
    assert(kind === "dim-compensated-join",
      "a churned dim pin serves through the in-plan move")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq === Seq(("iron", 2L, 20L), ("moved", 2L, 300L)),
      "the pre-refresh serve must already reflect the churn")
    val factReads = Lake.readsOf(s"$warehouse/mvj/fact")
    sql("CALL graftcat.refresh_mv_dims(tbl => 'mvj.fact', dims => 'mvj.cust')")
    assert(Lake.readsOf(s"$warehouse/mvj/fact") === factReads,
      "the dim-churn refresh must not read the fact table")
    assert(kind === "direct-join")
    assert(agg.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq === Seq(("iron", 2L, 20L), ("moved", 2L, 300L)))
    graft.lake.MatView.unregisterJoined(s"$warehouse/mvj/fact",
      s"$warehouse/mvj/cust")
  }

  test("CALL create_mv_distinct_star: the distinct star lifecycle in SQL") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.dstar")
    sql("""CREATE TABLE graftcat.dstar.ev (eid BIGINT, etype STRING, uid BIGINT)
          |TBLPROPERTIES ('key'='eid')""".stripMargin)
    sql("""INSERT INTO graftcat.dstar.ev VALUES
          |  (1,'c',10),(2,'c',20),(3,'v',10),(4,'v',30),(5,'c',10)""".stripMargin)
    sql("""CREATE TABLE graftcat.dstar.u (u_user BIGINT, region STRING)
          |TBLPROPERTIES ('key'='u_user')""".stripMargin)
    sql("INSERT INTO graftcat.dstar.u VALUES (10,'eu'),(20,'us'),(30,'eu')")
    val built = sql(
      """CALL graftcat.create_mv_distinct_star(tbl => 'dstar.ev',
        |  dim => 'dstar.u', fact_key => 'uid', dim_key => 'u_user',
        |  view => 'dstar.dau', group_cols => 'etype',
        |  distinct_col => 'uid')""".stripMargin).head().getLong(0)
    val dir = s"$warehouse/dstar/ev"
    try {
      assert(built === Lake.latestVersion(dir))
      org.apache.spark.sql.GraftSqlShim.addOptimization(
        spark, graft.plans.MatViewRewrite)
      // churn the dim, then the per-region distinct count still serves
      sql("INSERT INTO graftcat.dstar.u VALUES (10,'apac')")
      val q = sql(
        """SELECT region, count(DISTINCT uid) AS n_users, count(*) AS n_ev
          |FROM graftcat.dstar.ev JOIN graftcat.dstar.u ON uid = u_user
          |GROUP BY region ORDER BY region""".stripMargin)
      graft.lake.MatView.lastRewrite.set(null)
      q.queryExecution.optimizedPlan
      assert(Option(graft.lake.MatView.lastRewrite.get()).exists(r =>
        r._1 == dir && r._2 == "direct-distinct-rollup-join"))
      assert(q.collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ===
        Seq(("apac", 1L, 3L), ("eu", 1L, 1L), ("us", 1L, 1L)))
    } finally graft.lake.MatView.unregisterDistinct(s"$warehouse/dstar/dau")
  }

  test("CALL auto_maintenance: INSERTs advance the view, no refresh CALL") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.amv")
    sql("""CREATE TABLE graftcat.amv.t (k BIGINT, grp STRING, v BIGINT)
          |TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("INSERT INTO graftcat.amv.t VALUES (1, 'a', 10), (2, 'b', 20)")
    sql("""CALL graftcat.create_mv(tbl => 'amv.t', view => 'amv.v',
          |group_cols => 'grp', sum_cols => 'v')""".stripMargin)
    val dir = s"$warehouse/amv/t"
    try {
      assert(sql("CALL graftcat.auto_maintenance(enabled => true)")
        .head().getBoolean(0))
      sql("INSERT INTO graftcat.amv.t VALUES (3, 'a', 5), (4, 'c', 7)")
      // the catalog INSERT's commit already advanced the view
      assert(graft.lake.MatView.get(dir)
        .exists(_.builtVersion == Lake.latestVersion(dir)))
      val st = sql("CALL graftcat.mv_status(tbl => 'amv.t')").head()
      assert(st.getLong(0) === Lake.latestVersion(dir) && st.getLong(2) === 0L,
        s"view must be zero commits behind: $st")
      assert(sql("SELECT grp, __mv_sum_v FROM graftcat.amv.v")
        .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq ===
        Seq(("a", 15L), ("b", 20L), ("c", 7L)))
    } finally {
      sql("CALL graftcat.auto_maintenance(enabled => false)")
      graft.lake.MatView.unregister(dir)
    }
  }

  test("CALL recover_views: one sweep restores registrations from sidecars") {
    warehouse
    sql("CREATE NAMESPACE IF NOT EXISTS graftcat.rv")
    sql("""CREATE TABLE graftcat.rv.t (k BIGINT, grp STRING, v BIGINT)
          |TBLPROPERTIES ('key'='k')""".stripMargin)
    sql("INSERT INTO graftcat.rv.t VALUES (1, 'a', 10), (2, 'b', 20)")
    sql("""CALL graftcat.create_mv(tbl => 'rv.t', view => 'rv.v',
          |group_cols => 'grp', sum_cols => 'v')""".stripMargin)
    val dir = s"$warehouse/rv/t"
    try {
      // the restarted session: registry empty, sidecars on disk
      graft.lake.MatView.unregister(dir)
      assert(graft.lake.MatView.get(dir).isEmpty)
      val r = sql(s"CALL graftcat.recover_views(root => '$warehouse')").head()
      assert(r.getLong(0) >= 1L, s"must recover at least rv.v: $r")
      assert(graft.lake.MatView.get(dir).exists(_.builtVersion ===
        Lake.latestVersion(dir)))
    } finally graft.lake.MatView.unregister(dir)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.analytics.StarQueries
import graft.plans.{TopKPerKey, TopKPerKeyExec}

/** The custom whole-operator top-k (TopKPerKeyNode + TopKStrategy +
  * TopKPerKeyExec) must agree bit-for-bit with the window-sort
  * formulation, plan as partial→exchange→final, and honor ties /
  * small groups. */
class TopKPlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("custom operator result equals the window row_number formulation") {
    val win = StarQueries.topOrdersPerSegment(spark, sf).collect().toSeq
    val custom = TopKPerKey.topOrdersPerSegmentPlan(spark, sf).collect().toSeq
    assert(custom === win)
  }

  test("plans as partial + final exec with an exchange between") {
    import spark.implicits._
    val df = Seq(("a", 1L, 10.0), ("a", 2L, 20.0), ("b", 3L, 5.0))
      .toDF("k", "id", "v")
    val topk = TopKPerKey(df, 1, Seq("k"), Seq(("v", true), ("id", false)))
    // force execution so AQE finalizes the physical plan
    topk.collect()
    // AQE prints Final and Initial plans; assert on the final one
    val planStr = topk.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val partials = planStr.linesIterator
      .filter(_.contains("TopKPerKey")).map(_.endsWith("true")).toSeq
    assert(partials === Seq(false, true), // final above the exchange, partial below
      s"want final-then-partial TopKPerKeyExec in:\n$planStr")
    assert(planStr.contains("Exchange hashpartitioning(k"),
      s"want a key exchange between the two phases in:\n$planStr")
  }

  test("ties break on the secondary key; groups smaller than k survive") {
    import spark.implicits._
    val df = Seq(
      ("a", 3L, 9.0), ("a", 1L, 9.0), ("a", 2L, 9.0), ("a", 4L, 1.0),
      ("b", 7L, 2.0)).toDF("k", "id", "v")
    val out = TopKPerKey(df, 2, Seq("k"), Seq(("v", true), ("id", false)))
      .select(col("k"), col("rk"), col("id"))
      .orderBy(col("k"), col("rk"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out === Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 1L, 7L)))
  }

  test("rank column name and k=1 behavior are configurable") {
    import spark.implicits._
    val df = Seq(("x", 1L), ("x", 2L), ("y", 9L)).toDF("k", "id")
    val out = TopKPerKey(df, 1, Seq("k"), Seq(("id", false)), rankName = "pos")
    assert(out.columns.toSeq === Seq("k", "id", "pos"))
    assert(out.filter(col("pos") === 1).count() === 2)
  }

  test("property: agrees with the window formulation on random frames") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = Gen.listOfN(60, Gen.zip(
      Gen.chooseNum(0, 5), Gen.chooseNum(0L, 30L), Gen.chooseNum(-9, 9)))
    (0 until 8).foreach { i =>
      val rows = gen(Gen.Parameters.default, Seed(100L + i)).get
        .map { case (k, id, v) => (s"k$k", id, v.toDouble) }
        // ordering must be total per key for parity: drop (k,id) dupes
        .distinctBy(r => (r._1, r._2))
      val df = rows.toDF("k", "id", "v").repartition(5)
      val k = 1 + i % 4
      val win = df.withColumn("rk", row_number().over(
          Window.partitionBy(col("k")).orderBy(col("v").desc, col("id"))))
        .filter(col("rk") <= k)
        .select(col("k"), col("id"), col("v"), col("rk").cast("long").as("rk"))
      val custom = TopKPerKey(df, k, Seq("k"), Seq(("v", true), ("id", false)))
      val toSet = (d: org.apache.spark.sql.DataFrame) =>
        d.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
      assert(toSet(custom) === toSet(win), s"seed ${100 + i}, k=$k")
    }
  }

  test("exec reports SQL metrics: pruning visible as input vs output rows") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (s"g${i % 3}", i.toLong)).toDF("g", "v")
    val out = graft.plans.TopKPerKey(df, 2, Seq("g"), Seq(("v", true)))
    out.collect()
    // AQE wraps stages in leaf QueryStageExec nodes whose subtree is a
    // field, not a child — walk through them explicitly
    def execsIn(p: org.apache.spark.sql.execution.SparkPlan): Seq[graft.plans.TopKPerKeyExec] = {
      val here = p match { case e: graft.plans.TopKPerKeyExec => Seq(e); case _ => Nil }
      val kids = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      here ++ kids.flatMap(execsIn)
    }
    val execs = execsIn(out.queryExecution.executedPlan)
    assert(execs.size === 2, "partial + final")
    val partial = execs.find(_.partial).get
    val fin = execs.find(!_.partial).get
    assert(partial.metrics("numInputRows").value === 1000L)
    assert(partial.metrics("numOutputRows").value < 1000L, "partial phase must prune")
    assert(fin.metrics("numOutputRows").value === 6L) // 3 groups × k=2
    assert(fin.metrics("numKeys").value === 3L)
  }

  test("strategy registration is atomic under concurrent first calls") {
    import org.apache.spark.sql.GraftSqlShim
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
    import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
    // a no-op strategy standing in for TopKStrategy: matches nothing,
    // so leaking it into the shared session is harmless — the test is
    // about the check-then-act registration race
    object NoopStrategy extends SparkStrategy {
      override def apply(plan: LogicalPlan): Seq[SparkPlan] = Nil
    }
    val threads = (0 until 16).map { _ =>
      new Thread(() => GraftSqlShim.addStrategy(spark, NoopStrategy))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val n = spark.experimental.extraStrategies.count(_ eq NoopStrategy)
    assert(n === 1, s"expected exactly one registration, got $n")
  }

  test("±0.0 double keys collapse into one group (NormalizeFloatingNumbers)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // -0.0 produced by arithmetic, exactly as a real pipeline would
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .toDF("id", "v")
      .withColumn("dkey", (col("id") % 2) * org.apache.spark.sql.functions.lit(0.0) *
        org.apache.spark.sql.functions.when(col("id") % 2 === 0, -1.0).otherwise(1.0))
    // dkey is 0.0 for odd ids and -0.0 for even ids — one logical group
    val out = graft.plans.TopKPerKey(df, 10, Seq("dkey"), Seq(("v", true), ("id", false)))
      .collect()
    assert(out.length === 4)
    assert(out.map(_.getAs[Long]("rk")).sorted.toSeq === Seq(1L, 2L, 3L, 4L),
      "a single rank sequence, not two independent ones per zero sign")
  }
}

package graft.tools

import org.apache.spark.sql.functions._

import graft.{Graft, Tables}
import graft.lake.{Lake, LakeQueries, MatView}

/** Phase timer for the x8_mv_refresh path — where does the 10× growth
  * go? Run: SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.tools.MvProbe" */
object MvProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Graft.defaultCores.toString)
    val spark = Graft.builder(s"local[$cpus]", math.min(8, cpus.toInt))
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[mvprobe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val src = t("sharedSource(build or memo)") {
      LakeQueries.mvSharedSource(spark, sfDir)
    }
    (1 to 2).foreach { i =>
      t(s"define@v1 (run $i)") {
        MatView.define(spark, src, src + "-view-probe",
          Seq("o_orderpriority"), Seq("o_cents"), asOfVersion = 1L)
      }
      t(s"refresh (run $i)") { MatView.refresh(spark, src) }
      t(s"query (run $i)") {
        org.apache.spark.sql.GraftSqlShim.addOptimization(
          spark, graft.plans.MatViewRewrite)
        spark.read.format("graft-lake").option("path", src).load()
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("o_cents")).as("c")).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

package graft.tools

import graft.{Graft, SparkEntry}

/** Dump the formatted physical plan of registered queries — the raw
  * material for PLANS.md audits. `sbt "runMain graft.tools.ExplainQuery
  * x2_containment x6_attribution"`; executes nothing (explain only),
  * but AQE-final shapes still require a run — use QueryTime for those.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", Graft.defaultCores.toString)
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", math.min(8, cpus.toInt).toString)
    val spark = Graft.builder(s"local[$cpus]", shuffle.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query: $name"))
      println(s"==== $name ====")
      fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

object DebugTB {
  def main(args: Array[String]): Unit = {
    val spark = Graft.builder("local[4]", 4).getOrCreate()
    import spark.implicits._
    val dir = "/tmp/dbg-widen"
    graft.Scratch.rm(new java.io.File(dir))
    Seq((1, 1.5f, 10), (2, 2.5f, 20)).toDF("i", "f", "j")
      .write.parquet(dir)
    // read INT32 as LONG, FLOAT as DOUBLE, INT32 as DOUBLE
    val wide = StructType(Seq(StructField("i", LongType),
      StructField("f", DoubleType), StructField("j", DoubleType)))
    try {
      val rows = spark.read.schema(wide).parquet(dir).orderBy("i").collect()
      println("WIDEN OK: " + rows.mkString(", "))
    } catch { case e: Exception => println("WIDEN FAIL: " + e.getMessage.take(300)) }
    // and the column-rename trick: read with physical names then alias
    val phys = StructType(Seq(StructField("i", LongType)))
    val r2 = spark.read.schema(phys).parquet(dir).select(col("i").as("renamed")).collect()
    println("RENAME OK: " + r2.mkString(", "))
    spark.stop()
  }
}

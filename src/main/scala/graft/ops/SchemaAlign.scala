package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** U1 — schema-aligned vertical union
  * (/root/reference/ingestor_precinct.py:184: `pd.concat([schema, df])`
  * pads missing grand-schema columns with NA and fixes column order).
  *
  * Spark-first: no empty-frame union needed — project every grand-schema
  * column, typed-null for the missing ones, in canonical order. Extra
  * input columns are dropped (the reference's projection at :163 already
  * removed them). Pure projection → no shuffle, collapses into the scan.
  */
object SchemaAlign {

  def apply(df: DataFrame, schema: StructType): DataFrame = {
    val present = df.columns.toSet
    df.select(schema.fields.toSeq.map { f =>
      // try_cast: a stray non-conforming ingest value becomes null
      // (pandas-tolerant) instead of an ANSI-mode job abort
      if (present.contains(f.name)) col(f.name).try_cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Multi-file union with differing headers (S5's unionByName form). */
  def unionAligned(schema: StructType, dfs: Seq[DataFrame]): DataFrame =
    dfs.map(apply(_, schema)).reduce(_.unionByName(_))
}

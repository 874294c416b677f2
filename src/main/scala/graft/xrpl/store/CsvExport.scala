package graft.xrpl.store

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S13/X14: CSV export with dotted-path flattening
  * (api/server.js:58 `res.csv`; lib/utils.js:139-163 flattenJSON).
  *
  * Struct columns flatten recursively into `parent.child` columns;
  * arrays and maps (the reference's stringified-JSON cells) serialize
  * back to JSON strings — the same shape the reference's CSV endpoint
  * produces from its nested rows.
  */
object CsvExport {

  /** Flatten nested columns into dotted-path scalar columns. */
  def flatten(df: DataFrame): DataFrame = {
    def cols(prefix: String, field: StructField, path: Column): Seq[(String, Column)] =
      field.dataType match {
        case st: StructType =>
          st.fields.toSeq.flatMap { f =>
            cols(s"$prefix${field.name}.", f, path.getField(f.name))
          }
        case _: ArrayType | _: MapType =>
          Seq((s"$prefix${field.name}", to_json(path)))
        case _ =>
          Seq((s"$prefix${field.name}", path))
      }
    val flat = df.schema.fields.toSeq.flatMap(f => cols("", f, col(s"`${f.name}`")))
    df.select(flat.map { case (name, c) => c.as(name) }: _*)
  }

  /** Write a (possibly nested) DataFrame as headered CSV. */
  def write(df: DataFrame, path: String): Unit =
    flatten(df).write
      .option("header", "true")
      .mode("overwrite")
      .csv(path)
}

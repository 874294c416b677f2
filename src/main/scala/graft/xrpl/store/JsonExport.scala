package graft.xrpl.store

import org.apache.spark.sql.DataFrame

/** S13 sibling of [[CsvExport]]: JSON-lines export (api/server.js
  * responds JSON by default; res.csv is the alternate encoding). Where
  * the CSV path must FLATTEN nested columns into dotted headers, the
  * JSON encoding keeps structs nested — that asymmetry is exactly
  * what the two round-trip gates pin: same relation, two wire shapes,
  * both re-read by both engines under an explicit schema (no format
  * inference in the contract).
  */
object JsonExport {

  /** Write a (possibly nested) DataFrame as newline-delimited JSON. */
  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)
}

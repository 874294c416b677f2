package graft.xrpl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode

/** Thin Jackson helpers for traversing rippled ledger/tx JSON.
  * (Jackson ships with Spark — a public dependency on the classpath.)
  *
  * Amount fields (`Amount`, `TakerPays`, `TakerGets`, `SendMax`,
  * `Balance`, `Fee`) are string drops for XRP or
  * `{currency, issuer, value}` objects for IOUs (FIXTURES.md §A).
  */
object Json {
  // ObjectMapper is thread-safe after configuration.
  val mapper = new ObjectMapper()

  def parse(s: String): JsonNode = mapper.readTree(s)

  def opt(n: JsonNode, field: String): Option[JsonNode] = {
    if (n == null) return None
    val v = n.get(field)
    if (v == null || v.isNull) None else Some(v)
  }

  def optText(n: JsonNode, field: String): Option[String] =
    opt(n, field).map(v => if (v.isTextual) v.asText() else v.toString)

  def optLong(n: JsonNode, field: String): Option[Long] =
    opt(n, field).map(_.asLong())

  def text(n: JsonNode, field: String): String = n.get(field).asText()

  /** Normalized amount: (currency, issuer, value-string). XRP scalars
    * are converted from drops (exact); IOU values pass through.
    */
  def amount(v: JsonNode): (String, Option[String], String) =
    if (v.isObject)
      (text(v, "currency"), optText(v, "issuer"), text(v, "value"))
    else
      ("XRP", None, Scalars.dropsToXrp(v.asText()))

  /** Currency of an amount field, None for scalar XRP — mirrors JS
    * `tx.Amount.currency` being undefined on strings
    * (lib/ledgerParser/balanceChanges.js:44).
    */
  def amountCurrency(v: JsonNode): Option[String] =
    if (v.isObject) optText(v, "currency") else None

  /** The one node payload under an AffectedNodes entry, with its kind. */
  def affectedNode(entry: JsonNode): Option[(String, JsonNode)] =
    opt(entry, "ModifiedNode").map(("ModifiedNode", _))
      .orElse(opt(entry, "CreatedNode").map(("CreatedNode", _)))
      .orElse(opt(entry, "DeletedNode").map(("DeletedNode", _)))

  /** Serialize a tx node minus metaData (canonical-JSON stand-in for
    * the reference's binary `raw` column — SURVEY.md §7 risks).
    */
  def withoutMeta(tx: JsonNode): String = {
    val copy = tx.deepCopy[ObjectNode]()
    copy.remove("metaData")
    copy.toString
  }
}

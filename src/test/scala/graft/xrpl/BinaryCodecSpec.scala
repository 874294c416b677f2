package graft.xrpl

import org.scalatest.funsuite.AnyFunSuite

import graft.xrpl.codec.BinaryCodec

/** Golden test for the X12 binary codec: the computed transaction ID
  * (SHA512-half over the canonical serialization) must equal the
  * `hash` carried by EVERY transaction of the bundled reference mock
  * ledgers — end-to-end coverage of field ordering, field IDs, VL
  * encoding, base58check, XRP/IOU amounts, memos (nested
  * STArray/STObject) and path sets against real network data.
  */
class BinaryCodecSpec extends AnyFunSuite {

  private def fixtureTxs: Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val dir = new java.io.File(XrplTables.fixturesPath)
    dir.listFiles().toSeq.filter(_.getName.endsWith(".json")).flatMap { f =>
      val root = Json.parse(
        new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      Json.opt(root, "transactions").toSeq
        .flatMap(t => (0 until t.size()).map(t.get))
    }
  }

  test("every fixture transaction hash round-trips through the codec") {
    val txs = fixtureTxs
    assert(txs.size > 900) // 933 at the bundled fixture set
    val failures = txs.flatMap { tx =>
      val expected = tx.get("hash").asText()
      val got = try BinaryCodec.txHash(tx) catch {
        case e: Throwable => s"ERROR: ${e.getMessage}"
      }
      if (got == expected) None
      else Some(s"${tx.get("TransactionType").asText()} $expected -> $got")
    }
    assert(failures.isEmpty,
      s"${failures.size}/${txs.size} mismatched:\n" +
        failures.take(10).mkString("\n"))
  }

  test("every ledger's transaction_hash round-trips through meta codec + SHAMap") {
    // the strongest fixture oracle available: reproducing the ledger
    // header's transaction tree root requires the METADATA codec
    // (ledger-entry fields, nested Modified/Created/DeletedNode
    // objects, UInt64/Hash160 types) and the 16-way SHAMap (leaf
    // collapse, empty-subtree zero hashes) to all be exactly right
    val dir = new java.io.File(XrplTables.fixturesPath)
    val ledgers = dir.listFiles().toSeq.filter(_.getName.endsWith(".json"))
      .map { f =>
        Json.parse(new String(
          java.nio.file.Files.readAllBytes(f.toPath), "UTF-8"))
      }
      .filter(l => Json.opt(l, "transaction_hash").isDefined)
    assert(ledgers.size > 40)
    val failures = ledgers.flatMap { l =>
      val expected = l.get("transaction_hash").asText()
      val txs = Json.opt(l, "transactions").toSeq
        .flatMap(t => (0 until t.size()).map(t.get))
      val got = try BinaryCodec.txTreeHash(txs) catch {
        case e: Throwable => s"ERROR: ${e.getMessage}"
      }
      if (got == expected) None
      else Some(s"ledger ${l.get("ledger_index")} (${txs.size} txs): " +
        s"$expected -> $got")
    }
    assert(failures.isEmpty,
      s"${failures.size}/${ledgers.size} roots mismatched:\n" +
        failures.take(8).mkString("\n"))
  }

  test("amount encoding edges: drops flag bit, IOU zero, sign, exponent") {
    import com.fasterxml.jackson.databind.node.JsonNodeFactory
    val f = JsonNodeFactory.instance
    def enc(n: com.fasterxml.jackson.databind.JsonNode): Array[Byte] = {
      val o = f.objectNode()
      o.set[com.fasterxml.jackson.databind.JsonNode]("Amount", n)
      BinaryCodec.encodeTx(o).drop(1) // strip the 1-byte field header
    }
    // 1 drop: positive-XRP bit plus the integer
    assert(enc(f.textNode("1")).take(8).toSeq ===
      Seq(0x40, 0, 0, 0, 0, 0, 0, 1).map(_.toByte))
    // IOU zero: only the not-XRP bit survives
    val zero = f.objectNode()
    zero.put("currency", "USD")
    zero.put("issuer", "rvYAfWj5gh67oV6fW32ZzP3Aw4Eubs59B")
    zero.put("value", "0")
    assert(enc(zero).take(8).toSeq ===
      Seq(0x80, 0, 0, 0, 0, 0, 0, 0).map(_.toByte))
    // IOU 1 = mantissa 1e15, exponent -15 → (97-15)=82 in bits 54-61
    val one = f.objectNode()
    one.put("currency", "USD")
    one.put("issuer", "rvYAfWj5gh67oV6fW32ZzP3Aw4Eubs59B")
    one.put("value", "1")
    val bits = enc(one).take(8).map(_ & 0xffL).reduce((a, b) => (a << 8) | b)
    assert((bits >>> 63) === 1L)                  // not XRP
    assert(((bits >>> 62) & 1L) === 1L)           // positive
    assert(((bits >>> 54) & 0xffL) === 82L)       // exponent -15 + 97
    assert((bits & ((1L << 54) - 1)) === 1000000000000000L)
  }
}

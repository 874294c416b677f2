package graft.xrpl

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.xrpl.topology.{Manifests, Topology}

/** Topology / validations / manifests over the reference's mock
  * network fixtures (the test mock JSON files).
  */
class TopologySpec extends AnyFunSuite {

  lazy val spark = SparkTest.session

  test("crawl: nodes load and links resolve via 12-char pubkey prefix (J7)") {
    val (nodes, links) = Topology.loadCrawl(spark,
      Topology.networkFixture("topology-crawl.json"))
    assert(nodes.count() > 0)
    val resolved = Topology.resolveLinks(nodes, links)
    assert(resolved.count() === links.count())
    // every resolvable endpoint is a full pubkey from the node list
    val pubkeys = nodes.select(col("pubkey_node")).collect()
      .map(_.getString(0)).toSet
    resolved.collect().foreach { r =>
      Option(r.getAs[String]("source")).foreach(s => assert(pubkeys(s)))
      Option(r.getAs[String]("target")).foreach(t => assert(pubkeys(t)))
    }
    val degrees = Topology.nodeDegrees(resolved)
    assert(degrees.agg(sum("degree")).head().getLong(0) ===
      resolved.filter(col("source").isNotNull).count() +
        resolved.filter(col("target").isNotNull).count())
  }

  test("validator reports: A12 scoring matches the fixture rows") {
    val reports = Topology.loadValidatorReports(spark,
      Topology.networkFixture("validator-reports.json"))
    val scored = Topology.scoreDailyReports(reports)
    assert(scored.count() === 91L)
    // fixture rows carry chain/score/missed — scoring must pass them
    // through unchanged (topology.js:283-296 else-branch)
    val direct = reports.select(col("pubkey"), col("chain"),
      col("score").cast("double").as("score0"),
      col("missed").cast("long").as("missed0"))
    val joined = scored.join(direct,
      scored("validation_public_key") === direct("pubkey") &&
        scored("chain") === direct("chain"))
    assert(joined.filter(col("score") =!= col("score0")).count() === 0L)
    assert(joined.filter(col("missed") =!= col("missed0")).count() === 0L)
  }

  test("validator state joins reports with domain (J6)") {
    val reports = Topology.scoreDailyReports(Topology.loadValidatorReports(
      spark, Topology.networkFixture("validator-reports.json")))
    val state = Topology.loadValidatorState(spark,
      Topology.networkFixture("validator-state.json"))
    val joined = Topology.reportsWithDomain(reports, state)
    assert(joined.count() === reports.count())
    assert(joined.columns.contains("domain"))
    // state agreement JSON cells parse into typed structs
    assert(state.filter(col("agreement_24h_s.total").isNotNull).count() > 0)
  }

  test("validations index → detail join (J5)") {
    val lv = Topology.loadLedgerValidations(spark,
      Topology.networkFixture("ledger-validations.json"))
    val pubkey = lv.select(split(col("rowkey"), "\\|").getItem(1))
      .head().getString(0)
    val byValidator = Topology.validationsByValidator(lv, pubkey)
    assert(byValidator.count() > 0)
    assert(byValidator.filter(col("validation_public_key") =!= pubkey)
      .count() === 0L)
  }

  test("computeDailyReports: agreement fraction against canonical chain") {
    import spark.implicits._
    val canonical = Seq(("H1", "d1"), ("H2", "d1"), ("H3", "d1"))
      .toDF("ledger_hash", "day")
    val validations = Seq(("V1", "H1"), ("V1", "H2"), ("V2", "H1"),
      ("V2", "HX"))
      .toDF("validation_public_key", "ledger_hash")
    val reports = Topology.computeDailyReports(validations, canonical).collect()
    val v1 = reports.find(_.getAs[String]("validation_public_key") == "V1").get
    val v2 = reports.find(_.getAs[String]("validation_public_key") == "V2").get
    assert(math.abs(v1.getAs[Double]("score") - 2.0 / 3.0) < 1e-12)
    assert(v1.getAs[Long]("missed") === 1L)
    assert(math.abs(v2.getAs[Double]("score") - 1.0 / 3.0) < 1e-12)
  }

  test("manifest verification (X16): fixture manifests verify under master key") {
    val src = scala.io.Source.fromFile(Topology.networkFixture("manifests.json"))
    val manifests = try Json.parse(src.mkString) finally src.close()
    var verified = 0
    var total = 0
    manifests.elements().forEachRemaining { m =>
      total += 1
      val seq = m.get("seq").asLong()
      val master = m.get("master_key").asText()
      val eph = Option(m.get("signing_key")).map(_.asText())
      val sig = Option(m.get("master_signature")).map(_.asText())
        .getOrElse(m.get("signature").asText())
      if (Manifests.verifyManifest(seq, master, eph, sig)) verified += 1
    }
    assert(total === 5)
    // real validator manifests with ed25519 master keys must verify
    assert(verified > 0, s"$verified of $total manifests verified")
  }

  test("manifest verification rejects a tampered signature") {
    val src = scala.io.Source.fromFile(Topology.networkFixture("manifests.json"))
    val manifests = try Json.parse(src.mkString) finally src.close()
    val m = manifests.get(0)
    val sig = Option(m.get("master_signature")).map(_.asText())
      .getOrElse(m.get("signature").asText())
    val tampered = (if (sig.startsWith("00")) "11" else "00") + sig.substring(2)
    assert(!Manifests.verifyManifest(m.get("seq").asLong(),
      m.get("master_key").asText(),
      Option(m.get("signing_key")).map(_.asText()), tampered))
  }

  test("base58 node-public decode round-trips checksum validation") {
    val src = scala.io.Source.fromFile(Topology.networkFixture("manifests.json"))
    val manifests = try Json.parse(src.mkString) finally src.close()
    val key = manifests.get(0).get("master_key").asText()
    val decoded = Manifests.decodeNodePublic(key)
    assert(decoded.length === 33)
    intercept[Exception] {
      Manifests.decodeNodePublic(key.dropRight(1) + (if (key.last == 'r') 'p' else 'r'))
    }
  }
}

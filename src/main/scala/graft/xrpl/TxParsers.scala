package graft.xrpl

import java.math.{BigDecimal => JBigDecimal}
import com.fasterxml.jackson.databind.JsonNode
import scala.collection.mutable
import scala.jdk.CollectionConverters._

import Json._
import Scalars._

/** Per-transaction context attached by the ledger dispatcher
  * (lib/ledgerStream.js:61-113, lib/ledgerParser/index.js:45-72).
  */
final case class TxContext(
    tx: JsonNode,
    meta: JsonNode,
    hash: String,
    ledgerHash: String,
    ledgerIndex: Long,
    executedTime: Long,
    txIndex: Int,
    txType: String,
    txResult: String,
    account: String,
    client: Option[String])

/** The reference's UDTF-like parsers (SURVEY.md §2.9) as pure
  * `TxContext => Seq[Row]` functions — used from `Dataset.flatMap`.
  * Behavior is cited parser-by-parser to /root/reference file:line.
  */
object TxParsers {

  private def nodes(ctx: TxContext): Seq[(Int, String, JsonNode)] =
    opt(ctx.meta, "AffectedNodes").map { arr =>
      arr.elements().asScala.zipWithIndex.flatMap { case (entry, i) =>
        affectedNode(entry).map { case (kind, node) => (i, kind, node) }
      }.toSeq
    }.getOrElse(Seq.empty)

  private def fieldsOf(node: JsonNode): Option[JsonNode] =
    opt(node, "NewFields").orElse(opt(node, "FinalFields"))

  // -----------------------------------------------------------------
  // exchanges — lib/ledgerParser/exchanges.js:11-199
  // -----------------------------------------------------------------
  def exchanges(ctx: TxContext): Seq[Exchange] = {
    if (ctx.txResult != "tesSUCCESS") return Seq.empty
    if (ctx.txType != "Payment" && ctx.txType != "OfferCreate") return Seq.empty

    nodes(ctx).flatMap { case (i, kind, node) =>
      if (kind != "ModifiedNode" && kind != "DeletedNode") None
      else if (optText(node, "LedgerEntryType").getOrElse("") != "Offer") None
      else {
        val prev = opt(node, "PreviousFields")
        val fin = opt(node, "FinalFields")
        (prev, fin) match {
          case (Some(p), Some(f))
              if opt(p, "TakerPays").isDefined && opt(p, "TakerGets").isDefined =>
            Some(parseOfferExercised(ctx, i, p, f))
          case _ => None
        }
      }
    }
  }

  private def amountChange(prevV: JsonNode, finV: JsonNode): (String, Option[String], String) =
    if (prevV.isObject) {
      val change = dec(text(prevV, "value")).subtract(dec(text(finV, "value")))
      (text(prevV, "currency"), optText(prevV, "issuer"), fmt(change))
    } else {
      val change = dec(prevV.asText()).subtract(dec(finV.asText()))
      ("XRP", None, fmt(change.divide(XrpAdjust)))
    }

  private def parseOfferExercised(ctx: TxContext, nodeIndex: Int,
      prev: JsonNode, fin: JsonNode): Exchange = {
    val counterparty = text(fin, "Account")
    var (baseCur, baseIss, baseAmt) =
      amountChange(prev.get("TakerPays"), fin.get("TakerPays"))
    var (counterCur, counterIss, counterAmt) =
      amountChange(prev.get("TakerGets"), fin.get("TakerGets"))

    val qualityRate: Option[JBigDecimal] =
      optText(fin, "BookDirectory").flatMap { bd =>
        try Some(parseQuality(bd, baseCur, counterCur))
        catch { case _: Exception => None }
      }
    val rate0: JBigDecimal = qualityRate.getOrElse(
      dec(baseAmt).divide(dec(counterAmt), RateMc))

    // autobridge detection (exchanges.js:140-176): OfferCreate with IOU
    // on both tx legs.
    var autoCur: Option[String] = None
    var autoIss: Option[String] = None
    if (ctx.txType == "OfferCreate") {
      val txPays = opt(ctx.tx, "TakerPays")
      val txGets = opt(ctx.tx, "TakerGets")
      (txPays.flatMap(amountCurrency), txGets.flatMap(amountCurrency)) match {
        case (Some(paysCur), Some(getsCur)) =>
          if (counterCur == "XRP" && baseCur == paysCur) {
            autoCur = Some(getsCur); autoIss = txGets.flatMap(v => optText(v, "issuer"))
          } else if (counterCur == "XRP" && baseCur == getsCur) {
            autoCur = Some(paysCur); autoIss = txPays.flatMap(v => optText(v, "issuer"))
          } else if (baseCur == "XRP" && counterCur == paysCur) {
            autoCur = Some(getsCur); autoIss = txGets.flatMap(v => optText(v, "issuer"))
          } else if (baseCur == "XRP" && counterCur == getsCur) {
            autoCur = Some(paysCur); autoIss = txPays.flatMap(v => optText(v, "issuer"))
          }
        case _ =>
      }
    }

    // X3 canonical pair order (exchanges.js:180-199). Note JS
    // `currency + issuer` with undefined issuer yields "XRPundefined" —
    // kept verbatim for ordering parity.
    var buyer = counterparty
    var seller = ctx.account
    val c1 = (baseCur + baseIss.getOrElse("undefined")).toLowerCase
    val c2 = (counterCur + counterIss.getOrElse("undefined")).toLowerCase
    var rate = rate0
    if (c2 < c1) {
      val (bc, bi, ba) = (baseCur, baseIss, baseAmt)
      baseCur = counterCur; baseIss = counterIss; baseAmt = counterAmt
      counterCur = bc; counterIss = bi; counterAmt = ba
      val sw = buyer; buyer = seller; seller = sw
    } else {
      rate = JBigDecimal.ONE.divide(rate0, RateMc)
    }

    Exchange(
      base_currency = baseCur, base_issuer = baseIss, base_amount = baseAmt,
      counter_currency = counterCur, counter_issuer = counterIss,
      counter_amount = counterAmt,
      rate = fmt(rate),
      buyer = buyer, seller = seller, taker = ctx.account,
      provider = counterparty,
      offer_sequence = fin.get("Sequence").asLong(),
      autobridged_currency = autoCur, autobridged_issuer = autoIss,
      tx_hash = ctx.hash, tx_type = ctx.txType, time = ctx.executedTime,
      ledger_index = ctx.ledgerIndex, tx_index = ctx.txIndex,
      node_index = nodeIndex, client = ctx.client)
  }

  // -----------------------------------------------------------------
  // offers — lib/ledgerParser/offers.js:6-180
  // -----------------------------------------------------------------
  def offers(ctx: TxContext): Seq[OfferEvent] = {
    if (ctx.txResult != "tesSUCCESS") return Seq.empty
    if (!Set("Payment", "OfferCancel", "OfferCreate").contains(ctx.txType))
      return Seq.empty

    nodes(ctx).flatMap { case (i, kind, node) =>
      if (optText(node, "LedgerEntryType").getOrElse("") != "Offer") None
      else fieldsOf(node).map { fields =>
        val (paysCur, paysIss, paysVal) = amount(fields.get("TakerPays"))
        val (getsCur, getsIss, getsVal) = amount(fields.get("TakerGets"))
        val prev = opt(node, "PreviousFields")

        def changeOf(fieldName: String, cur: String, curVal: String): String =
          prev match {
            case None => "0"
            case Some(p) =>
              opt(p, fieldName) match {
                case None => "0"
                case Some(pv) =>
                  if (cur == "XRP")
                    fmt(dec(pv.asText()).divide(XrpAdjust).subtract(dec(curVal)))
                  else
                    fmt(dec(text(pv, "value")).subtract(dec(curVal)))
              }
          }

        val paysChange = changeOf("TakerPays", paysCur, paysVal)
        val getsChange = changeOf("TakerGets", getsCur, getsVal)

        val rate = optText(fields, "BookDirectory").flatMap { bd =>
          try Some(fmt(parseQuality(bd, paysCur, getsCur)))
          catch { case _: Exception => None }
        }

        val txOfferSeq = optLong(ctx.tx, "OfferSequence")
        val sameAccount = optText(fields, "Account").contains(ctx.account)
        val prevSeq =
          if (txOfferSeq.isDefined && sameAccount && kind == "CreatedNode") txOfferSeq
          else None
        val nextSeq =
          if (txOfferSeq.isDefined && sameAccount && kind == "DeletedNode")
            optLong(ctx.tx, "Sequence")
          else None

        // change_type decision chain (offers.js:145-174), order matters.
        val fieldsSeq = optLong(fields, "Sequence")
        val changeType: Option[String] =
          if (kind == "CreatedNode") Some("create")
          else if (kind == "ModifiedNode") Some("partial_fill")
          else if (ctx.txType == "OfferCancel") Some("cancel")
          else if (ctx.txType == "OfferCreate" && kind == "DeletedNode" &&
            sameAccount && fieldsSeq == txOfferSeq && txOfferSeq.isDefined)
            Some("replace")
          else if (paysVal == "0") Some("fill")
          else if (prev.isEmpty) Some("unfunded_cancel")
          else if (paysChange != "0" || getsChange != "0")
            Some("unfunded_partial_fill")
          else None

        OfferEvent(
          account = text(fields, "Account"),
          offer_sequence = fieldsSeq.getOrElse(0L),
          change_type = changeType,
          tx_type = ctx.txType, node_type = kind,
          pays_currency = paysCur, pays_issuer = paysIss, pays_value = paysVal,
          gets_currency = getsCur, gets_issuer = getsIss, gets_value = getsVal,
          pays_change = paysChange, gets_change = getsChange,
          rate = rate,
          book_directory = optText(fields, "BookDirectory"),
          expiration = optLong(fields, "Expiration").map(_ + EpochOffset),
          prev_offer_sequence = prevSeq, next_offer_sequence = nextSeq,
          tx_hash = ctx.hash, executed_time = ctx.executedTime,
          ledger_index = ctx.ledgerIndex, tx_index = ctx.txIndex, node_index = i)
      }
    }
  }

  // -----------------------------------------------------------------
  // balanceChanges — lib/ledgerParser/balanceChanges.js:12-341
  // -----------------------------------------------------------------
  def balanceChanges(ctx: TxContext): Seq[BalanceChange] = {
    // runs for tes AND tec results (balanceChanges.js:253-256)
    if (!ctx.txResult.startsWith("tec") && ctx.txResult != "tesSUCCESS")
      return Seq.empty

    val list = mutable.ArrayBuffer.empty[BalanceChange]
    val escrows = mutable.Map.empty[String, JsonNode]
    val paychans = mutable.Map.empty[String, JsonNode]

    val txAmount = opt(ctx.tx, "Amount")
    val txAmountCur = txAmount.flatMap(amountCurrency)
    val txSendMax = opt(ctx.tx, "SendMax")
    val txSendMaxCur = txSendMax.flatMap(amountCurrency)
    val txDest = optText(ctx.tx, "Destination")

    // findType (balanceChanges.js:23-93)
    def findType(account: String, currency: String, finalBalance: JBigDecimal): Option[String] = {
      if (ctx.txType == "OfferCreate" && finalBalance.signum() < 0)
        Some("intermediary")
      else if (ctx.txType == "OfferCreate") Some("exchange")
      else if (ctx.txType == "Payment") {
        if (txDest.contains(ctx.account) && finalBalance.signum() < 0)
          Some("intermediary")
        else if (txDest.contains(ctx.account)) Some("exchange")
        else if (txDest.contains(account) && txAmountCur.contains(currency))
          Some("payment_destination")
        else if (txDest.contains(account) && txAmountCur.isEmpty && currency == "XRP")
          Some("payment_destination")
        else if (account == ctx.account && txSendMax.isDefined &&
          txSendMaxCur.contains(currency))
          Some("payment_source")
        else if (account == ctx.account && txSendMax.isDefined && currency == "XRP")
          Some("payment_source")
        else if (account == ctx.account && txAmountCur.contains(currency))
          Some("payment_source")
        else if (account == ctx.account && txAmountCur.isEmpty && currency == "XRP")
          Some("payment_source")
        else if (finalBalance.signum() < 0) Some("intermediary")
        else Some("exchange")
      } else None
    }

    def push(account: String, counterparty: Option[String], currency: String,
        change: JBigDecimal, finalBalance: JBigDecimal, nodeIndex: Int,
        tpe: Option[String]): Unit =
      list += BalanceChange(
        account = account, counterparty = counterparty, currency = currency,
        change = fmt(change), final_balance = fmt(finalBalance),
        change_type = tpe,
        escrow_counterparty = None, escrow_balance_change = None,
        paychannel_counterparty = None, paychannel_fund_change = None,
        paychannel_fund_final_balance = None, paychannel_balance_change = None,
        paychannel_final_balance = None,
        time = ctx.executedTime, ledger_index = ctx.ledgerIndex,
        tx_index = ctx.txIndex, node_index = nodeIndex, tx_hash = ctx.hash,
        client = ctx.client)

    def parseAccountRoot(node: JsonNode, nodeIndex: Int): Unit = {
      val fin = opt(node, "FinalFields")
      val prev = opt(node, "PreviousFields")
      val nw = opt(node, "NewFields")
      val parsed: Option[(JBigDecimal, JBigDecimal, String)] =
        (fin, prev) match {
          case (Some(f), Some(p))
              if opt(f, "Balance").isDefined && opt(p, "Balance").isDefined =>
            Some((dec(text(f, "Balance")), dec(text(p, "Balance")), text(f, "Account")))
          case _ =>
            nw.map(n => (dec(text(n, "Balance")), JBigDecimal.ZERO, text(n, "Account")))
        }
      parsed.foreach { case (balance, previous, account) =>
        val change = balance.subtract(previous)
        val amount =
          if (ctx.account == account) {
            val fee = dec(text(ctx.tx, "Fee")).negate()
            val amt = change.subtract(fee)
            // fee split row (X8, balanceChanges.js:129-151)
            push(account, None, "XRP",
              fee.divide(XrpAdjust),
              balance.subtract(amt).divide(XrpAdjust),
              nodeIndex = -1, tpe = Some("fee"))
            amt
          } else change
        if (amount.signum() != 0) {
          val scaled = amount.divide(XrpAdjust)
          val finalBal = balance.divide(XrpAdjust)
          push(account, None, "XRP", scaled, finalBal, nodeIndex,
            findType(account, "XRP", finalBal))
        }
      }
    }

    def parseRippleState(node: JsonNode, nodeIndex: Int): Unit = {
      if (ctx.txType != "Payment" && ctx.txType != "OfferCreate") return
      val nw = opt(node, "NewFields")
      val prev = opt(node, "PreviousFields")
      val fin = opt(node, "FinalFields")

      val parsed: Option[(String, String, String, JBigDecimal, JBigDecimal)] =
        nw match {
          case Some(n) if text(n.get("Balance"), "value") == "0" => None
          case Some(n) =>
            val bal = dec(text(n.get("Balance"), "value"))
            Some((text(n.get("Balance"), "currency"),
              text(n.get("HighLimit"), "issuer"), text(n.get("LowLimit"), "issuer"),
              bal, bal))
          case None =>
            (prev, fin) match {
              case (Some(p), Some(f)) if opt(p, "Balance").isDefined =>
                val previous = dec(text(p.get("Balance"), "value"))
                val bal = dec(text(f.get("Balance"), "value"))
                Some((text(f.get("Balance"), "currency"),
                  text(f.get("HighLimit"), "issuer"), text(f.get("LowLimit"), "issuer"),
                  bal, bal.subtract(previous)))
              case _ => None
            }
        }

      parsed.foreach { case (currency, highParty, lowParty, balance, change) =>
        push(lowParty, Some(highParty), currency, change, balance, nodeIndex,
          findType(lowParty, currency, balance))
        push(highParty, Some(lowParty), currency, change.negate(), balance.negate(),
          nodeIndex, findType(highParty, currency, balance.negate()))
      }
    }

    nodes(ctx).foreach { case (i, _, node) =>
      optText(node, "LedgerEntryType").getOrElse("") match {
        case "AccountRoot" => parseAccountRoot(node, i)
        case "RippleState" => parseRippleState(node, i)
        case "Escrow" =>
          fieldsOf(node).foreach { f =>
            optText(f, "Account").foreach(escrows(_) = f)
            optText(f, "Destination").foreach(escrows(_) = f)
          }
        case "PayChannel" =>
          fieldsOf(node).foreach { f =>
            optText(f, "Account").foreach(paychans(_) = f)
            optText(f, "Destination").foreach(paychans(_) = f)
          }
        case _ =>
      }
    }

    // escrow / paychannel overlays (balanceChanges.js:289-339)
    list.indices.foreach { idx =>
      val d = list(idx)
      if (d.change_type.isEmpty && escrows.contains(d.account)) {
        val e = escrows(d.account)
        val amount = dec(text(e, "Amount")).divide(XrpAdjust)
        val (tpe, bal) = ctx.txType match {
          case "EscrowCreate" => (Some("escrow_create"), Some(fmt(amount)))
          case "EscrowCancel" => (Some("escrow_cancel"), Some(fmt(amount.negate())))
          case "EscrowFinish" => (Some("escrow_finish"), Some(fmt(amount.negate())))
          case _ => (None, None)
        }
        list(idx) = d.copy(
          change_type = tpe,
          escrow_counterparty = optText(e, "Destination"),
          escrow_balance_change = bal)
      } else if (d.change_type.isEmpty && paychans.contains(d.account)) {
        val e = paychans(d.account)
        val eAmount = optText(e, "Amount").map(dropsToXrpBd).getOrElse(JBigDecimal.ZERO)
        val eBalance = optText(e, "Balance").map(dropsToXrpBd).getOrElse(JBigDecimal.ZERO)
        if (optText(e, "Account").contains(d.account)) {
          list(idx) = d.copy(
            change_type = Some("paychannel_fund"),
            paychannel_counterparty = optText(e, "Destination"),
            paychannel_fund_change = fmt2(dec(d.change).negate()),
            paychannel_fund_final_balance = fmt2(eAmount),
            paychannel_final_balance = fmt2(eBalance))
        } else {
          list(idx) = d.copy(
            change_type = Some("paychannel_payout"),
            paychannel_counterparty = optText(e, "Account"),
            paychannel_balance_change = fmt2(dec(d.change).negate()),
            paychannel_fund_final_balance = fmt2(eAmount),
            paychannel_final_balance = fmt2(eBalance))
        }
      }
    }

    list.toSeq
  }

  private def fmt2(bd: JBigDecimal): Option[String] = Some(fmt(bd))

  // -----------------------------------------------------------------
  // parseBalanceChanges — ripple-lib-transactionparser semantics
  // (used by payment.js:26-42): per-address simple change triples.
  // -----------------------------------------------------------------
  def simpleBalanceChanges(ctx: TxContext): Map[String, Seq[ChangeTriple]] = {
    val acc = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[ChangeTriple]]
    def add(address: String, t: ChangeTriple): Unit =
      acc.getOrElseUpdate(address, mutable.ArrayBuffer.empty) += t

    nodes(ctx).foreach { case (_, _, node) =>
      optText(node, "LedgerEntryType").getOrElse("") match {
        case "AccountRoot" =>
          val fin = opt(node, "FinalFields")
          val prev = opt(node, "PreviousFields")
          val nw = opt(node, "NewFields")
          val parsed: Option[(String, JBigDecimal)] = (fin, prev) match {
            case (Some(f), Some(p))
                if opt(f, "Balance").isDefined && opt(p, "Balance").isDefined =>
              Some((text(f, "Account"),
                dec(text(f, "Balance")).subtract(dec(text(p, "Balance")))))
            case _ =>
              nw.filter(n => opt(n, "Balance").isDefined)
                .map(n => (text(n, "Account"), dec(text(n, "Balance"))))
          }
          parsed.foreach { case (account, changeDrops) =>
            if (changeDrops.signum() != 0)
              add(account, ChangeTriple("", "XRP", fmt(changeDrops.divide(XrpAdjust))))
          }
        case "RippleState" =>
          val nw = opt(node, "NewFields")
          val prev = opt(node, "PreviousFields")
          val fin = opt(node, "FinalFields")
          val parsed: Option[(String, String, String, JBigDecimal)] = nw match {
            case Some(n) if text(n.get("Balance"), "value") != "0" =>
              Some((text(n.get("Balance"), "currency"),
                text(n.get("HighLimit"), "issuer"), text(n.get("LowLimit"), "issuer"),
                dec(text(n.get("Balance"), "value"))))
            case None =>
              (prev, fin) match {
                case (Some(p), Some(f)) if opt(p, "Balance").isDefined =>
                  Some((text(f.get("Balance"), "currency"),
                    text(f.get("HighLimit"), "issuer"), text(f.get("LowLimit"), "issuer"),
                    dec(text(f.get("Balance"), "value"))
                      .subtract(dec(text(p.get("Balance"), "value")))))
                case _ => None
              }
            case _ => None
          }
          parsed.foreach { case (currency, high, low, change) =>
            if (change.signum() != 0) {
              add(low, ChangeTriple(high, currency, fmt(change)))
              add(high, ChangeTriple(low, currency, fmt(change.negate())))
            }
          }
        case _ =>
      }
    }
    acc.map { case (k, v) => k -> v.toSeq }.toMap
  }

  // -----------------------------------------------------------------
  // payment — lib/ledgerParser/payment.js:6-159
  // -----------------------------------------------------------------
  def payment(ctx: TxContext): Option[Payment] = {
    if (ctx.txResult != "tesSUCCESS") return None
    if (ctx.txType != "Payment") return None
    val dest = optText(ctx.tx, "Destination").getOrElse(return None)
    if (ctx.account == dest) return None // 'convert' payments skipped

    val changes = simpleBalanceChanges(ctx)
    val feeXrp = dec(text(ctx.tx, "Fee")).divide(XrpAdjust)

    // source changes: add the fee back to the XRP leg, drop zeros
    // (payment.js:33-42)
    val sourceChanges = changes.getOrElse(ctx.account, Seq.empty).flatMap { ch =>
      val adjusted =
        if (ch.currency == "XRP")
          ch.copy(value = fmt(dec(ch.value).subtract(feeXrp.negate())))
        else ch
      if (adjusted.value == "0") None else Some(adjusted)
    }
    val destChanges = changes.getOrElse(dest, Seq.empty)

    val txAmount = ctx.tx.get("Amount")
    val (cur, amt) =
      if (txAmount.isObject) (text(txAmount, "currency"), text(txAmount, "value"))
      else ("XRP", dropsToXrp(txAmount.asText()))

    val deliveredNode = opt(ctx.meta, "DeliveredAmount").getOrElse(txAmount)
    val delivered =
      if (deliveredNode.isObject) text(deliveredNode, "value")
      else dropsToXrp(deliveredNode.asText())

    val sendMax = opt(ctx.tx, "SendMax")
    val (maxAmount, sourceCur0) = sendMax match {
      case Some(sm) if sm.isObject =>
        (Some(text(sm, "value")), Some(text(sm, "currency")))
      case Some(sm) => (Some(dropsToXrp(sm.asText())), Some("XRP"))
      case None => (None, None)
    }
    val sourceCur = sourceCur0.orElse(sourceChanges.headOption.map(_.currency))

    // X7 issuer determination (payment.js:100-159)
    val issuer: Option[String] =
      if (cur == "XRP") None
      else {
        val amtIssuer = optText(txAmount, "issuer")
        if (!amtIssuer.contains(ctx.account) && !amtIssuer.contains(dest)) amtIssuer
        else {
          nodes(ctx).iterator.flatMap { case (_, _, node) =>
            if (optText(node, "LedgerEntryType").getOrElse("") != "RippleState") None
            else opt(node, "FinalFields").flatMap { f =>
              if (optText(f.get("HighLimit"), "currency").getOrElse("") != cur) None
              else {
                val high = text(f.get("HighLimit"), "issuer")
                val low = text(f.get("LowLimit"), "issuer")
                if (high == dest || low == dest) {
                  val balance = text(f.get("Balance"), "value").toDouble
                  val previous = opt(node, "PreviousFields")
                    .flatMap(p => opt(p, "Balance"))
                    .map(b => text(b, "value").toDouble).getOrElse(0.0)
                  Some(if (balance < 0 || previous < 0) low else high)
                } else None
              }
            }
          }.nextOption()
        }
      }

    Some(Payment(
      source = ctx.account, destination = dest,
      amount = amt, delivered_amount = delivered,
      currency = cur, issuer = issuer,
      source_currency = sourceCur, max_amount = maxAmount,
      fee = fmt(feeXrp),
      source_balance_changes = sourceChanges,
      destination_balance_changes = destChanges,
      destination_tag = optLong(ctx.tx, "DestinationTag"),
      source_tag = optLong(ctx.tx, "SourceTag"),
      invoice_id = optText(ctx.tx, "InvoiceID"),
      tx_hash = ctx.hash, time = ctx.executedTime,
      ledger_index = ctx.ledgerIndex, tx_index = ctx.txIndex,
      client = ctx.client))
  }

  // -----------------------------------------------------------------
  // accountsCreated — lib/ledgerParser/accountsCreated.js:3-26
  // -----------------------------------------------------------------
  def accountsCreated(ctx: TxContext): Seq[AccountCreated] = {
    if (ctx.txResult != "tesSUCCESS") return Seq.empty
    nodes(ctx).collect {
      case (_, "CreatedNode", node)
          if optText(node, "LedgerEntryType").contains("AccountRoot") &&
            opt(node, "NewFields").exists(n => opt(n, "Account").isDefined) =>
        val nf = node.get("NewFields")
        AccountCreated(
          account = text(nf, "Account"),
          parent = ctx.account,
          balance = dropsToXrp(text(nf, "Balance")),
          time = ctx.executedTime, ledger_index = ctx.ledgerIndex,
          tx_index = ctx.txIndex, tx_hash = ctx.hash, client = ctx.client)
    }
  }

  // -----------------------------------------------------------------
  // affectedAccounts — lib/ledgerParser/affectedAccounts.js, deriving
  // ripple-lib-transactionparser.getAffectedAccounts: every address
  // appearing in an account-bearing field of any affected node.
  // -----------------------------------------------------------------
  private val accountFields = Set("Account", "Owner", "Destination", "Issuer", "Target", "RegularKey")
  private val amountFields =
    Set("HighLimit", "LowLimit", "TakerPays", "TakerGets", "Balance", "Amount", "SendMax")

  def affectedAccounts(ctx: TxContext): Seq[AffectedAccount] = {
    val seen = mutable.LinkedHashSet.empty[String]
    nodes(ctx).foreach { case (_, kind, node) =>
      val fields =
        if (kind == "CreatedNode") opt(node, "NewFields")
        else opt(node, "FinalFields")
      fields.foreach { f =>
        f.fieldNames().asScala.foreach { name =>
          val v = f.get(name)
          if (accountFields.contains(name) && v.isTextual) seen += v.asText()
          else if (amountFields.contains(name) && v.isObject)
            opt(v, "issuer").foreach(iss => seen += iss.asText())
        }
      }
    }
    seen.toSeq.filter(_.startsWith("r")).map { account =>
      AffectedAccount(
        account = account, tx_result = ctx.txResult, tx_type = ctx.txType,
        time = ctx.executedTime, ledger_index = ctx.ledgerIndex,
        tx_index = ctx.txIndex, tx_hash = ctx.hash, client = ctx.client)
    }
  }

  // -----------------------------------------------------------------
  // memos — lib/ledgerParser/memos.js:5-106
  // -----------------------------------------------------------------
  def memos(ctx: TxContext): Seq[MemoRow] =
    opt(ctx.tx, "Memos").map { arr =>
      arr.elements().asScala.zipWithIndex.flatMap { case (entry, i) =>
        opt(entry, "Memo").map { memo =>
          val mData = optText(memo, "MemoData")
          val mFormat = optText(memo, "MemoFormat")
          val mType = optText(memo, "MemoType")
          val dData = mData.flatMap(tryDecode)
          val dFormat = mFormat.flatMap(tryDecode)
          val dType = mType.flatMap(tryDecode)
          MemoRow(
            account = ctx.account,
            destination = optText(ctx.tx, "Destination"),
            destination_tag = optLong(ctx.tx, "DestinationTag"),
            source_tag = optLong(ctx.tx, "SourceTag"),
            memo_type = mType, memo_data = mData, memo_format = mFormat,
            decoded_type = dType.map(_._1).filter(_.nonEmpty),
            decoded_data = dData.map(_._1).filter(_.nonEmpty),
            decoded_format = dFormat.map(_._1).filter(_.nonEmpty),
            type_encoding = dType.map(_._2),
            data_encoding = dData.map(_._2),
            format_encoding = dFormat.map(_._2),
            executed_time = ctx.executedTime, ledger_index = ctx.ledgerIndex,
            tx_index = ctx.txIndex, memo_index = i, tx_hash = ctx.hash)
        }
      }.toSeq
    }.getOrElse(Seq.empty)

  /** 'client' memo extraction — lib/ledgerParser/fromClient.js:17-66. */
  def fromClient(tx: JsonNode): Option[String] =
    opt(tx, "Memos").flatMap { arr =>
      arr.elements().asScala.flatMap { entry =>
        opt(entry, "Memo").flatMap { memo =>
          optText(memo, "MemoType").flatMap(tryDecode)
            .filter(_._1.toLowerCase == "client")
            .flatMap { _ =>
              optText(memo, "MemoData").flatMap(tryDecode).map(_._1)
                .orElse(optText(memo, "MemoFormat").flatMap(tryDecode).map(_._1))
            }
        }
      }.nextOption()
    }.map(_.take(100)) // max 100 chars (fromClient.js:15)

  // -----------------------------------------------------------------
  // escrow — lib/ledgerParser/escrow.js:23-71
  // -----------------------------------------------------------------
  def escrow(ctx: TxContext): Option[EscrowRow] = {
    if (ctx.txResult != "tesSUCCESS") return None
    if (!Set("EscrowCreate", "EscrowCancel", "EscrowFinish").contains(ctx.txType))
      return None

    val deletedEscrow = nodes(ctx).collectFirst {
      case (_, "DeletedNode", node)
          if optText(node, "LedgerEntryType").contains("Escrow") => node
    }
    val ff = deletedEscrow.flatMap(n => opt(n, "FinalFields"))
    def nodeText(field: String) = ff.flatMap(f => optText(f, field))
    def nodeLong(field: String) = ff.flatMap(f => optLong(f, field))

    val amountDrops = optText(ctx.tx, "Amount").orElse(nodeText("Amount"))
    Some(EscrowRow(
      account = ctx.account,
      owner = optText(ctx.tx, "Account").orElse(optText(ctx.tx, "Owner")).getOrElse(ctx.account),
      destination = optText(ctx.tx, "Destination").orElse(nodeText("Destination")),
      destination_tag = optLong(ctx.tx, "DestinationTag").orElse(nodeLong("DestinationTag")),
      source_tag = optLong(ctx.tx, "SourceTag").orElse(nodeLong("SourceTag")),
      amount = amountDrops.map(dropsToXrp).getOrElse("0"),
      fee = dropsToXrp(text(ctx.tx, "Fee")),
      flags = optLong(ctx.tx, "Flags"),
      tx_type = ctx.txType,
      create_tx_seq = optLong(ctx.tx, "Sequence").orElse(optLong(ctx.tx, "OfferSequence")),
      create_tx = nodeText("PreviousTxnID").orElse(Some(ctx.hash)),
      condition = optText(ctx.tx, "Condition"),
      fulfillment = optText(ctx.tx, "Fulfillment"),
      cancel_after = optLong(ctx.tx, "CancelAfter").map(t => isoFormat(t + EpochOffset)),
      finish_after = optLong(ctx.tx, "FinishAfter").map(t => isoFormat(t + EpochOffset)),
      time = ctx.executedTime, ledger_index = ctx.ledgerIndex,
      tx_index = ctx.txIndex, tx_hash = ctx.hash, client = ctx.client))
  }

  // -----------------------------------------------------------------
  // paychan — lib/ledgerParser/paychan.js:26-77
  // -----------------------------------------------------------------
  def paychan(ctx: TxContext): Option[PayChanRow] = {
    if (ctx.txResult != "tesSUCCESS") return None
    if (!Set("PaymentChannelCreate", "PaymentChannelFund", "PaymentChannelClaim")
        .contains(ctx.txType))
      return None

    val chanFields = nodes(ctx).collectFirst {
      case (_, _, node) if optText(node, "LedgerEntryType").contains("PayChannel") =>
        fieldsOf(node)
    }.flatten
    def cf(field: String) = chanFields.flatMap(f => optText(f, field))
    def cfLong(field: String) = chanFields.flatMap(f => optLong(f, field))

    Some(PayChanRow(
      account = ctx.account,
      source = cf("Account"),
      destination = cf("Destination"),
      destination_tag = cfLong("DestinationTag"),
      source_tag = cfLong("SourceTag"),
      channel = optText(ctx.tx, "Channel"),
      amount = cf("Amount").map(dropsToXrp),
      balance = cf("Balance").map(dropsToXrp),
      fee = dropsToXrp(text(ctx.tx, "Fee")),
      flags = optLong(ctx.tx, "Flags"),
      settle = optLong(ctx.tx, "SettleDelay"),
      pubkey = optText(ctx.tx, "PublicKey"),
      signature = optText(ctx.tx, "Signature"),
      tx_type = ctx.txType,
      cancel_after = optLong(ctx.tx, "CancelAfter").map(t => isoFormat(t + EpochOffset)),
      expiration = optLong(ctx.tx, "Expiration").map(t => isoFormat(t + EpochOffset)),
      time = ctx.executedTime, ledger_index = ctx.ledgerIndex,
      tx_index = ctx.txIndex, tx_hash = ctx.hash, client = ctx.client))
  }
}

package graft.xrpl

/** Case-class model of the derived datasets the reference engine
  * maintains (SURVEY.md §1.2; row layouts from
  * lib/hbase/hbase-thrift/data.js:2625-3087).
  *
  * Amount/rate fields are Strings: the reference stores every cell as a
  * decimal string to preserve precision (README.md:4942-4966, 15
  * significant digits for IOU, XRP exact to 1e-6) and we keep that
  * contract at the storage layer; the aggregation layer casts to
  * DECIMAL/DOUBLE as needed. Times are unix epoch seconds (ripple epoch
  * already adjusted, lib/ledgerParser/index.js:38-40).
  */

/** One executed ledger (header only; txs live in Transaction). */
final case class LedgerRow(
    ledger_hash: String,
    ledger_index: Long,
    parent_hash: String,
    total_coins: Option[String],
    close_time: Long,
    close_time_human: Option[String],
    close_time_resolution: Option[Long],
    accounts_hash: Option[String],
    transactions_hash: Option[String],
    tx_count: Int,
    tx_hashes: Seq[String])

/** One transaction with canonical JSON payloads. `tx_json`/`meta_json`
  * carry canonical JSON instead of `raw`/`meta` hex by CHOICE (direct
  * queryability); the binary codec itself is implemented and golden-
  * proven (graft.xrpl.codec.BinaryCodec — gate `xrpl_tx_hash_codec`
  * re-derives every `tx_hash` from `tx_json` through it).
  */
final case class TransactionRow(
    tx_hash: String,
    ledger_hash: String,
    ledger_index: Long,
    tx_index: Int,
    tx_type: String,
    tx_result: String,
    account: String,
    sequence: Option[Long],
    executed_time: Long,
    fee: Option[String],
    client: Option[String],
    tx_json: String,
    meta_json: String)

/** Exchange (consumed offer) — lib/ledgerParser/exchanges.js:118-199. */
final case class Exchange(
    base_currency: String,
    base_issuer: Option[String],
    base_amount: String,
    counter_currency: String,
    counter_issuer: Option[String],
    counter_amount: String,
    rate: String,
    buyer: String,
    seller: String,
    taker: String,
    provider: String,
    offer_sequence: Long,
    autobridged_currency: Option[String],
    autobridged_issuer: Option[String],
    tx_hash: String,
    tx_type: String,
    time: Long,
    ledger_index: Long,
    tx_index: Int,
    node_index: Int,
    client: Option[String])

/** Offer lifecycle event — lib/ledgerParser/offers.js:6-180. */
final case class OfferEvent(
    account: String,
    offer_sequence: Long,
    change_type: Option[String],
    tx_type: String,
    node_type: String,
    pays_currency: String,
    pays_issuer: Option[String],
    pays_value: String,
    gets_currency: String,
    gets_issuer: Option[String],
    gets_value: String,
    pays_change: String,
    gets_change: String,
    rate: Option[String],
    book_directory: Option[String],
    expiration: Option[Long],
    prev_offer_sequence: Option[Long],
    next_offer_sequence: Option[Long],
    tx_hash: String,
    executed_time: Long,
    ledger_index: Long,
    tx_index: Int,
    node_index: Int)

/** Balance change — lib/ledgerParser/balanceChanges.js:12-341. */
final case class BalanceChange(
    account: String,
    counterparty: Option[String],
    currency: String,
    change: String,
    final_balance: String,
    change_type: Option[String], // `type` in the reference
    escrow_counterparty: Option[String],
    escrow_balance_change: Option[String],
    paychannel_counterparty: Option[String],
    paychannel_fund_change: Option[String],
    paychannel_fund_final_balance: Option[String],
    paychannel_balance_change: Option[String],
    paychannel_final_balance: Option[String],
    time: Long,
    ledger_index: Long,
    tx_index: Int,
    node_index: Int, // -1 ⇒ fee row (data.js:2852-2855 encodes as '$')
    tx_hash: String,
    client: Option[String])

/** Simple (counterparty, currency, value) change triple used inside
  * Payment rows — ripple-lib-transactionparser.parseBalanceChanges
  * output shape (lib/ledgerParser/payment.js:26-42).
  */
final case class ChangeTriple(
    counterparty: String,
    currency: String,
    value: String)

/** Payment — lib/ledgerParser/payment.js:6-159. */
final case class Payment(
    source: String,
    destination: String,
    amount: String,
    delivered_amount: String,
    currency: String,
    issuer: Option[String],
    source_currency: Option[String],
    max_amount: Option[String],
    fee: String,
    source_balance_changes: Seq[ChangeTriple],
    destination_balance_changes: Seq[ChangeTriple],
    destination_tag: Option[Long],
    source_tag: Option[Long],
    invoice_id: Option[String],
    tx_hash: String,
    time: Long,
    ledger_index: Long,
    tx_index: Int,
    client: Option[String])

/** Account created — lib/ledgerParser/accountsCreated.js:10-23. */
final case class AccountCreated(
    account: String,
    parent: String,
    balance: String,
    time: Long,
    ledger_index: Long,
    tx_index: Int,
    tx_hash: String,
    client: Option[String])

/** Affected-account index row — lib/ledgerParser/affectedAccounts.js. */
final case class AffectedAccount(
    account: String,
    tx_result: String,
    tx_type: String,
    time: Long,
    ledger_index: Long,
    tx_index: Int,
    tx_hash: String,
    client: Option[String])

/** Decoded memo — lib/ledgerParser/memos.js:5-106. */
final case class MemoRow(
    account: String,
    destination: Option[String],
    destination_tag: Option[Long],
    source_tag: Option[Long],
    memo_type: Option[String],
    memo_data: Option[String],
    memo_format: Option[String],
    decoded_type: Option[String],
    decoded_data: Option[String],
    decoded_format: Option[String],
    type_encoding: Option[String],
    data_encoding: Option[String],
    format_encoding: Option[String],
    executed_time: Long,
    ledger_index: Long,
    tx_index: Int,
    memo_index: Int,
    tx_hash: String)

/** Escrow lifecycle — lib/ledgerParser/escrow.js:23-71. */
final case class EscrowRow(
    account: String,
    owner: String,
    destination: Option[String],
    destination_tag: Option[Long],
    source_tag: Option[Long],
    amount: String,
    fee: String,
    flags: Option[Long],
    tx_type: String,
    create_tx_seq: Option[Long],
    create_tx: Option[String],
    condition: Option[String],
    fulfillment: Option[String],
    cancel_after: Option[String],
    finish_after: Option[String],
    time: Long,
    ledger_index: Long,
    tx_index: Int,
    tx_hash: String,
    client: Option[String])

/** Payment-channel lifecycle — lib/ledgerParser/paychan.js:26-77. */
final case class PayChanRow(
    account: String,
    source: Option[String],
    destination: Option[String],
    destination_tag: Option[Long],
    source_tag: Option[Long],
    channel: Option[String],
    amount: Option[String],
    balance: Option[String],
    fee: String,
    flags: Option[Long],
    settle: Option[Long],
    pubkey: Option[String],
    signature: Option[String],
    tx_type: String,
    cancel_after: Option[String],
    expiration: Option[String],
    time: Long,
    ledger_index: Long,
    tx_index: Int,
    tx_hash: String,
    client: Option[String])

/** Per-ledger fee summary — lib/ledgerParser/fees.js:3-33. */
final case class FeeSummary(
    ledger_index: Long,
    date: String,
    total: Double,
    avg: Double,
    max: Double,
    min: Double,
    tx_count: Int)

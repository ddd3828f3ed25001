package graft.model

/** One Binance trade event, fields as consumed by the reference ingest loop
  * (`main.py:35-66`; FIXTURES §A1):
  *
  *   t → tradeId, s → symbol, p → price (8-dp decimal string),
  *   q → qty (8-dp decimal string), T → tradeTimeMs (epoch ms),
  *   m → isBuyerMaker.
  */
final case class TradeTick(
    tradeId: Long,
    symbol: String,
    price: String,
    qty: String,
    tradeTimeMs: Long,
    isBuyerMaker: Boolean)

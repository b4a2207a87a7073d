package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Multi-field token-total fold (`agent-loop.sh:414-424,706`):
  * total = Σ(input + cache_create + cache_read + output) across the rows
  * of a session. Implemented as a typed `Aggregator` for §2.10 API
  * coverage; deliberately also expressible as `sum(a+b+c+d)` so the
  * oracle can check it with plain SQL.
  *
  * Scale shape: an Aggregator compiles to an ObjectHashAggregate with
  * map-side partial aggregation — the shuffle carries one Long per
  * (group × partition), identical to the native sum. Longs never overflow
  * here: 100 TB of rows × ~1e6 tokens/row ≈ 1e17 < 2^63.
  */
case class TokenCounts(input: Long, cacheCreate: Long, cacheRead: Long, output: Long)

object TokenTotal extends Aggregator[TokenCounts, Long, Long] {
  def zero: Long = 0L
  def reduce(acc: Long, row: TokenCounts): Long =
    acc + row.input + row.cacheCreate + row.cacheRead + row.output
  def merge(a: Long, b: Long): Long = a + b
  def finish(acc: Long): Long = acc
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

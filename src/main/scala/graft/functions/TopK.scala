package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Map-side-combining top-k.
  *
  * The window idiom (`row_number().over(partitionBy(key).orderBy(...)) ≤ k`)
  * shuffles EVERY row to its key's partition and sorts there — at 100 TB
  * that is the whole scored corpus through the wire for a k-row answer.
  * This Aggregator keeps a bounded top-k buffer per key inside the
  * partial-aggregation step, so the shuffle carries at most
  * k × keys × map-partitions rows and no sort ever sees the full data.
  *
  * Ordering: (score DESC, id ASC) — the id tie-break makes results
  * deterministic under any partitioning, same rule as the window queries.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {

  private def best(xs: Seq[(Long, Long)]): Seq[(Long, Long)] =
    xs.sortBy { case (score, id) => (-score, id) }.take(k)

  def zero: Seq[(Long, Long)] = Seq.empty
  def reduce(buf: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
    best(buf :+ x)
  def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] =
    best(a ++ b)
  def finish(buf: Seq[(Long, Long)]): Seq[(Long, Long)] = best(buf)

  def bufferEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
  def outputEncoder: Encoder[Seq[(Long, Long)]] = ExpressionEncoder()
}

object TopK {
  /** df(keyCol, scoreCol, idCol) → (key, id, score, rk ≤ k), ranked by
    * (score desc, id). One combining aggregate, no full-width window. */
  def perKey(df: DataFrame, keyCol: String, scoreCol: String, idCol: String,
             k: Int): DataFrame = {
    val agg = udaf(new TopKByScore(k), ExpressionEncoder[(Long, Long)]())
    df.groupBy(col(keyCol))
      .agg(agg(col(scoreCol), col(idCol)).as("top"))
      .select(col(keyCol), posexplode(col("top")))
      .select(col(keyCol), col("col._2").as(idCol), col("col._1").as(scoreCol),
              (col("pos") + 1).cast("int").as("rk"))
  }
}

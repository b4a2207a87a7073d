package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{Chunker, TokenTotal, TokenCounts}

/** SURVEY.md §2.10 — the UDF/UDAF surface.
  *
  * `q_udf_chunk`: the reply chunker (`telegram-agent.py:204-246`) applied
  * with a 120-char limit so real multi-chunk splits occur on the test
  * corpus. The oracle exploits a property of this corpus (no "\n\n", no
  * ". " — asserted in ChunkerSpec): the algorithm then reduces to labeled
  * hard splits of `limit - 8` chars, which plain SQL can generate. The
  * full paragraph/sentence behavior is property-tested in ChunkerSpec.
  *
  * `q_udaf_token_total`: the token fold as a typed Aggregator, grouped by
  * return flag; oracle is the equivalent native SUM.
  */
object Udfs {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "q_udf_chunk" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          posexplode(Chunker.chunksOf(col("text"), lit(120))))
        .select(col("doc_id"), (col("pos") + 1).as("i"), col("col").as("chunk"))
        .orderBy("doc_id", "i")),

    "q_udaf_token_total" -> ((s, dir) => {
      val tokenTotal = udaf(TokenTotal, org.apache.spark.sql.Encoders.product[TokenCounts])
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(tokenTotal(
          Tables.floorLong(col("l_quantity")),
          col("l_linenumber").cast("bigint"),
          Tables.floorLong(col("l_discount") * 100),
          Tables.floorLong(col("l_tax") * 100)).as("total_tokens"))
        .orderBy("l_returnflag")
    }),
  )

  val oracle: Map[String, String] = Map(
    // Corpus-specific reduction of the chunker (see Scaladoc): texts are
    // single-paragraph single-sentence, so chunks are hard 112-char splits
    // labeled [i/N] when N > 1; short texts pass through unlabeled.
    "q_udf_chunk" -> """
      WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents),
      short AS (
        SELECT doc_id, 1 AS i, text AS chunk FROM d WHERE len <= 120),
      long AS (
        SELECT doc_id, CAST(gs.g AS INTEGER) AS i,
               CAST(ceil(len / 112.0) AS INTEGER) AS n,
               substr(text, (CAST(gs.g AS INTEGER) - 1) * 112 + 1, 112) AS piece
        FROM d CROSS JOIN generate_series(1, 64) AS gs(g)
        WHERE len > 120 AND gs.g <= CAST(ceil(len / 112.0) AS BIGINT))
      SELECT doc_id, i, chunk FROM short
      UNION ALL
      SELECT doc_id, i,
             CASE WHEN n > 1 THEN '[' || i || '/' || n || '] ' || piece
                  ELSE piece END AS chunk
      FROM long
      ORDER BY doc_id, i""",

    "q_udaf_token_total" -> """
      SELECT l_returnflag,
             CAST(sum(CAST(floor(l_quantity) AS BIGINT) + l_linenumber +
                 CAST(floor(l_discount * 100) AS BIGINT) +
                 CAST(floor(l_tax * 100) AS BIGINT)) AS BIGINT) AS total_tokens
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
  )
}

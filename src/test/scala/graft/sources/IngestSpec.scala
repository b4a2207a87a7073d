package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Row-exact round-trip proof for the interchange readers — the
  * oracle keys check aggregate fidelity at corpus scale; this pins the
  * per-row bytes on exactly the plant cases the formats get wrong
  * (embedded newline, delimiter, quote, backslash, trailing space,
  * empty string). */
class IngestSpec extends SparkSpec {

  private def roundtrip(fmt: String,
                        rows: Seq[(Long, String, String)]): Map[Long, String] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(s"graft-ingest-$fmt")
      .toString
    val df = rows.toDF("doc_id", "source", "text")
    val w = df.coalesce(1).write.mode("overwrite")
    if (fmt == "jsonl") w.json(dir)
    else w.option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    val back = if (fmt == "jsonl") Ingest.readJsonl(spark, dir)
               else Ingest.readCsv(spark, dir)
    back.collect().map(r => r.getLong(0) -> r.getString(1 + 1)).toMap
  }

  test("jsonl round trip is byte-exact on every escaping plant incl. the empty string") {
    val rows = Ingest.Plants ++ Ingest.JsonlOnlyPlants
    val got = roundtrip("jsonl", rows)
    assert(got == rows.map(p => p._1 -> p._3).toMap, s"$got")
  }

  test("csv round trip is byte-exact on newline/comma/quote/backslash/trailing-space plants") {
    val got = roundtrip("csv", Ingest.Plants)
    assert(got == Ingest.Plants.map(p => p._1 -> p._3).toMap, s"$got")
  }

  test("failfast: a malformed jsonl line raises instead of silently dropping") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ingest-bad")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.toString, "part-0.json"),
      """{"doc_id": 1, "source": "s", "text": "ok"}
        |{not json at all""".stripMargin)
    val e = intercept[Exception] {
      Ingest.readJsonl(spark, dir.toString).agg(count(lit(1))).collect()
    }
    assert(e.toString.toLowerCase.contains("malformed") ||
      Option(e.getCause).exists(_.toString.toLowerCase.contains("malformed")),
      s"expected a malformed-record failure, got: $e")
  }
}

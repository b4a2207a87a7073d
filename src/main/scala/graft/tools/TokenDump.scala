package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential-test helper: base64 JSON docs in → "total:window" per
  * line via graft.functions.TokenUsage (compared against the reference's
  * jq pipeline by tools/diff_tokens.py). */
object TokenDump {
  def main(args: Array[String]): Unit = {
    val Array(inPath, outPath) = args
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val in = scala.io.Source.fromFile(inPath).getLines().toSeq
      .map(l => new String(java.util.Base64.getDecoder.decode(l.trim), "UTF-8"))
      .zipWithIndex
    val out = in.toDF("js", "i")
      .select(col("i"), graft.functions.TokenUsage.usageLine(col("js")).as("u"))
      .orderBy("i").collect().map(_.getString(1))
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      out.mkString("\n").getBytes("UTF-8"))
    spark.stop()
  }
}

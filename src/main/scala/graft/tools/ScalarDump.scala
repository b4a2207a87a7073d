package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Differential-test helper for the scalar kernels: reads base64 texts
  * (one per line), emits `slug30<TAB>error_class` per line through the
  * PRODUCTION Column expressions (tools/diff_scalars.py compares with
  * the reference's bash slugify / classify_error). */
object ScalarDump {
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
    val out = in.toDF("text", "i")
      .select(col("i"),
        graft.operators.Scalars.slug(col("text"), 30).as("slug"),
        graft.operators.Scalars.classify(col("text")).as("cls"))
      .orderBy("i")
      .collect()
      .map(r => java.util.Base64.getEncoder.encodeToString(r.getString(1).getBytes("UTF-8")) +
                "\t" + r.getString(2))
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      out.mkString("\n").getBytes("UTF-8"))
    spark.stop()
  }
}

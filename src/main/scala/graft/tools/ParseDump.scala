package graft.tools

import org.apache.spark.sql.SparkSession

/** Differential-test helper: parse every *.md under a directory with the
  * production TaskListParser and print rows as
  * `<file> U+0001 <index> U+0001 <group> U+0001 <task>` (unit separator — task
  * text may contain tabs). `tools/diff_parser.py` runs the reference's
  * actual bash parser on the same files and compares. */
object ParseDump {
  def main(args: Array[String]): Unit = {
    val Array(dir, outPath) = args
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = graft.sources.TaskListParser.parseDir(spark, s"$dir/*.md")
      .collect()
      .map(r => Seq(
        r.getString(0).split("/").last, r.getInt(1).toString,
        r.getString(2), r.getString(3)).mkString("\u0001"))
      .sorted
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      rows.mkString("\n").getBytes("UTF-8"))
    spark.stop()
  }
}

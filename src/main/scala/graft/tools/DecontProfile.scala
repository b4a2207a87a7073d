package graft.tools
import org.apache.spark.sql.functions._
import graft.tools.Prof.time
/** Dev utility: stage-by-stage decomposition of the q_decontaminate
  * pipeline (old concat-md5 spelling vs rolling-hash spelling) to
  * attribute time.
  */
object DecontProfile {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Prof.session()
    val docs = graft.Tables.documents(spark, dir)
    docs.count() // warm
    val W = 8
    val RotHi = 1L << 59
    val fold = graft.Tables.md5FoldSql("t")
    for (r <- 1 to 2) {
      time("A: split+explode tokens only") {
        docs.select(col("doc_id"),
          explode(expr("split(lower(text), ' ')")).as("t")).count() }
      time("B: token folds (transform md5)") {
        docs.select(col("doc_id"),
          expr(s"transform(split(lower(text), ' '), t -> $fold)").as("tf"))
          .select(col("doc_id"), explode(col("tf"))).count() }
      time("C: rolling keys, no distinct") {
        docs.select(col("doc_id"),
            expr(s"transform(split(lower(text), ' '), t -> $fold)").as("tf"))
          .select(col("doc_id"), explode(expr(
            s"""CASE WHEN size(tf) < $W THEN array()
                ELSE transform(sequence(0, size(tf) - $W),
                       i -> aggregate(slice(tf, i + 1, $W), 0L,
                              (acc, h) -> ((acc % ${RotHi}L) * 2L + (acc div ${RotHi}L)) ^ h))
                END""")).as("sh_key")).count() }
      time("D: rolling keys + distinct") {
        docs.select(col("doc_id"),
            expr(s"transform(split(lower(text), ' '), t -> $fold)").as("tf"))
          .select(col("doc_id"), explode(expr(
            s"""CASE WHEN size(tf) < $W THEN array()
                ELSE transform(sequence(0, size(tf) - $W),
                       i -> aggregate(slice(tf, i + 1, $W), 0L,
                              (acc, h) -> ((acc % ${RotHi}L) * 2L + (acc div ${RotHi}L)) ^ h))
                END""")).as("sh_key")).distinct().count() }
      time("E: OLD concat+md5 keys + distinct") {
        docs.select(col("doc_id"),
            explode(graft.operators.Curation.shingleArray(col("text"), W)).as("shingle"))
          .select(col("doc_id"),
            expr(graft.Tables.md5FoldSql("shingle")).as("sh_key"))
          .distinct().count() }
      time("F: full decontaminate") {
        graft.operators.Curation.decontaminate(docs).count() }
    }
    spark.stop()
  }
}

package graft.operators
import org.apache.spark.sql.functions._
object ProfQG {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = graft.tools.Prof.session()
    val docs = graft.Tables.documents(spark, dir)
    docs.count()
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-44s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); r
    }
    val verdict = expr("""
      text IS NOT NULL AND element_at(transform(array(split(lower(text), ' ')), __toks ->
        size(__toks) >= 5 AND NOT (
          element_at(transform(array(CASE WHEN size(__toks) < 2 THEN array()
              ELSE transform(sequence(0, size(__toks) - 2),
                   i -> concat_ws(' ', __toks[i], __toks[i+1])) END),
            __bg -> (size(__bg) - size(array_distinct(__bg))) * 10 > size(__bg)), 1))), 1)""")
    for (_ <- 1 to 2) {
      time("old gate count") { Curation.qualityGate(docs).count() }
      time("new gate count") { docs.filter(verdict).count() }
    }
    println("[prof] old rows " + Curation.qualityGate(docs).count()
      + " new rows " + docs.filter(verdict).count())
    // verdict-level equality, not just counts
    val oldIds = Curation.qualityGate(docs).select("doc_id").collect().map(_.getLong(0)).toSet
    val newIds = docs.filter(verdict).select("doc_id").collect().map(_.getLong(0)).toSet
    println("[prof] verdict sets equal: " + (oldIds == newIds))
  }
}

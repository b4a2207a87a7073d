package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Fixed-size reply chunking — the one genuinely procedural operation in
  * the reference (`telegram-agent.py:204-246`, invariants tested at
  * `tests/test-telegram-agent.py:165-179`).
  *
  * Semantics (re-derived from observed behavior, not transcribed):
  *   - text within the limit returns as a single unlabeled chunk;
  *   - otherwise greedily pack paragraphs (split on "\n\n", re-joined with
  *     "\n\n") into chunks of at most `limit - headerBudget` chars;
  *   - a paragraph that alone exceeds the budget falls back to sentence
  *     packing (". " boundaries), and a single oversize sentence is
  *     hard-split at the budget;
  *   - when more than one chunk results, each is prefixed "[i/N] ".
  *
  * Invariants (property-tested in ChunkerSpec): every chunk ≤ limit;
  * stripping labels and re-joining loses no non-whitespace content;
  * labels are exactly [1/N]…[N/N].
  *
  * Scale shape: a pure `String => Seq[String]` Scala UDF — executes
  * per-row inside the task with no state, so it parallelizes perfectly;
  * it is off the codegen path, which is acceptable because chunking is a
  * sink-side operation on result rows, not a scan-side filter.
  */
object Chunker {
  val TgMaxChars    = 4096
  val HeaderBudget  = 8 // "[10/10] "

  /** Code-point length — the reference's Python `len()` counts code
    * points, while Java `String.length` counts UTF-16 units; they
    * diverge on astral-plane text (emoji, rare CJK), where a naive port
    * would split mid-surrogate-pair. Lengths AND the hard-split slices
    * below are all code-point-based (diff_chunker.py fuzzes astral
    * inputs differentially against the reference's own Python). */
  private def cpLen(s: String): Int = s.codePointCount(0, s.length)
  /** Split after `n` code points (never inside a surrogate pair). */
  private def cpSplitAt(s: String, n: Int): (String, String) = {
    val idx = s.offsetByCodePoints(0, n)
    (s.substring(0, idx), s.substring(idx))
  }

  def chunk(text: String, limit: Int = TgMaxChars): Seq[String] = {
    if (text == null) return Seq.empty
    if (cpLen(text) <= limit) return Seq(text)
    val budget = limit - HeaderBudget
    val chunks = ArrayBuffer.empty[String]
    var current = ""

    def flush(): Unit = { if (current.nonEmpty) { chunks += current; current = "" } }

    for (para <- text.split("\n\n", -1)) {
      val candidate = if (current.isEmpty) para else (current + "\n\n" + para).strip
      if (cpLen(candidate) <= budget) current = candidate
      else {
        flush()
        if (cpLen(para) > budget) {
          for (sentence0 <- para.replace(". ", ".\n").split("\n", -1)) {
            var sentence = sentence0
            val cand = if (current.isEmpty) sentence else (current + " " + sentence).strip
            if (cpLen(cand) <= budget) current = cand
            else {
              flush()
              while (cpLen(sentence) > budget) {
                val (head, tail) = cpSplitAt(sentence, budget)
                chunks += head
                sentence = tail
              }
              current = sentence
            }
          }
        } else current = para
      }
    }
    flush()

    if (chunks.length > 1)
      chunks.zipWithIndex.map { case (c, i) => s"[${i + 1}/${chunks.length}] $c" }.toSeq
    else chunks.toSeq
  }

  /** Column form for use in queries: `explode(chunkUdf(col, lit(limit)))`. */
  val chunkUdf = udf((text: String, limit: Int) => chunk(text, limit))

  def chunksOf(text: Column, limit: Column): Column = chunkUdf(text, limit)
}

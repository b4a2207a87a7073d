package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.Base64

import scala.jdk.CollectionConverters._

/** Differential-test helper: reads base64-encoded texts (one per line),
  * chunks each with the production Chunker at the Telegram limit, writes
  * one line per input = tab-joined base64 chunks. `tools/diff_chunker.py`
  * generates the inputs, runs the reference's own chunk_reply on them,
  * and compares. Plain JVM I/O — no Spark needed for a scalar kernel. */
object ChunkDump {
  def main(args: Array[String]): Unit = {
    val Array(inPath, outPath) = args
    val enc = Base64.getEncoder
    val dec = Base64.getDecoder
    val out = Files.readAllLines(Paths.get(inPath)).asScala.map { line =>
      val text = new String(dec.decode(line.trim), StandardCharsets.UTF_8)
      graft.functions.Chunker.chunk(text)
        .map(c => enc.encodeToString(c.getBytes(StandardCharsets.UTF_8)))
        .mkString("\t")
    }
    Files.write(Paths.get(outPath), out.mkString("\n").getBytes(StandardCharsets.UTF_8))
  }
}

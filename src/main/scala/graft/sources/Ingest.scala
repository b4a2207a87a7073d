package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Corpus INTERCHANGE-FORMAT ingest (round 15) — the two text formats
  * a web-scale pipeline actually receives next to parquet: JSONL (the
  * crawl-dump lingua franca) and RFC-4180-style CSV. The product here
  * is the READER CONFIGURATION — the part users get wrong at 100 TB:
  *
  *  - schema EXPLICIT (never inferSchema: a schema-inference pass
  *    reads the whole corpus once before the real read, and a drifted
  *    field type surfaces as silent nulls mid-corpus);
  *  - mode FAILFAST (the curation default: a malformed interchange
  *    line is a pipeline bug to surface, not a row to silently drop —
  *    PERMISSIVE with a corrupt-record column is the documented
  *    alternative when quarantining is wanted);
  *  - CSV `multiLine` + quote-doubling escape (embedded newlines are
  *    legal inside quoted fields; without multiLine the reader splits
  *    records mid-field and the corruption is silent);
  *  - JSONL needs none of that: one object per line, `\n` escaped by
  *    construction — which is WHY it is the default interchange form.
  *
  * The registered keys prove CONTENT FIDELITY through a full
  * write→read round trip: corpus ∪ escaping plants staged to the
  * format once per (session, sf-dir, format), read back through these
  * readers, and folded to a per-source (count, chars, md5-fold-sum)
  * frame that the DuckDB oracle computes from the PARQUET side — any
  * escaping corruption in either the writer or the reader moves a
  * fold and breaks the hash. Scale shape: staging is one linear write
  * (a dev-proof stand-in for the interchange files a real pipeline
  * already has); the read is one linear scan; the audit aggregate is
  * map-side partial into ≤ |sources| rows.
  */
object Ingest {

  /** The (doc_id, source, text) interchange schema — explicit on
    * every read (see object doc). */
  val DocSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("text", StringType)))

  /** doc_id base for the escaping plants (disjoint from the corpus
    * and the PII/phash/audio plant ranges). */
  val IngestPlantBase = 4000000L

  /** Escaping stress plants — the corpus text is escape-free by
    * construction, so without these every format pitfall is vacuously
    * untested: embedded newline (the multiLine case), delimiter
    * comma, double quote, literal backslash, trailing space. */
  val Plants: Seq[(Long, String, String)] = Seq(
    (IngestPlantBase, "plant", "line one\nline two"),
    (IngestPlantBase + 1, "plant", "comma, separated, values"),
    (IngestPlantBase + 2, "plant", "a \"quoted\" span"),
    (IngestPlantBase + 3, "plant", "back\\slash and trailing space "))

  /** JSONL additionally round-trips the EMPTY string faithfully; bare
    * CSV cannot represent ""/null distinctly without an emptyValue
    * convention, so the empty-text plant rides the JSONL key only —
    * the one representable-set difference between the two formats,
    * documented rather than papered over. */
  val JsonlOnlyPlants: Seq[(Long, String, String)] = Seq(
    (IngestPlantBase + 4, "plant", ""))

  /** Schema-explicit FAILFAST JSONL reader. */
  def readJsonl(s: SparkSession, path: String): DataFrame =
    s.read.schema(DocSchema).option("mode", "FAILFAST").json(path)

  /** Schema-explicit FAILFAST CSV reader: header, multiLine (quoted
    * embedded newlines), RFC-4180 quote-doubling (escape = quote),
    * and whitespace preserved — Spark's CSV path TRIMS field
    * whitespace by default on write (ignoreLeading/TrailingWhiteSpace
    * default true there), which silently dropped the trailing-space
    * plant's byte until both sides pinned the options to false.
    *
    * Scale note: multiLine makes a CSV file NON-SPLITTABLE (records
    * can span line boundaries, so there is no safe mid-file split
    * point) — parallelism is bounded by FILE COUNT. Interchange CSV
    * at 100 TB must arrive sharded into many files; JSONL has no such
    * constraint (one record per line splits anywhere), which is the
    * other reason it is the preferred interchange form. */
  def readCsv(s: SparkSession, path: String): DataFrame =
    s.read.schema(DocSchema)
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("mode", "FAILFAST")
      .csv(path)

  private val staged = new java.util.concurrent.ConcurrentHashMap[
    String, String]()

  /** ONE per-process staging ROOT, swept by a SINGLE shutdown hook —
    * per-process staging is garbage the moment the JVM exits; one hook
    * over the root replaces the round-16 hook-per-entry pattern (which
    * registered an unbounded number of hooks on a long-lived host). */
  private lazy val stagingRoot: java.io.File = {
    val pid = java.lang.ProcessHandle.current().pid()
    val root = new java.io.File(
      System.getProperty("java.io.tmpdir"), s"graft_ingest_p$pid")
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(); ()
      }
      rm(root)
    }))
    root
  }

  /** Stage corpus ∪ plants to `fmt` once per (process, dir, fmt);
    * returns the staged path. The write itself is the linear pass the
    * key bills.
    *
    * The on-disk name carries an md5 digest of the dir path (not its
    * 32-bit hashCode — collision between different sf dirs would
    * silently serve the wrong staged corpus) and lives under the
    * per-process [[stagingRoot]]: tmpdir is shared, and two concurrent
    * JVMs (bench + verify) on the same sf dir would otherwise race
    * overwrite-vs-read on one path (round-15 advice). The cache is
    * PER-PROCESS, matching the path's granularity — the round-16
    * per-session cache over a per-pid path let a second SparkSession
    * in the same JVM re-stage `mode(overwrite)` onto the path the
    * first session's lazily-evaluated readers still referenced
    * (round-16 advice). Staged bytes are a pure function of (dir,
    * fmt) within a process, so sharing across sessions is reuse, not
    * aliasing; entries never evict (the set is bounded by fmt × dir
    * count and dies with the JVM's shutdown sweep). */
  private def stagePath(s: SparkSession, dir: String, fmt: String,
                        docs: DataFrame): String =
    staged.computeIfAbsent(s"$fmt:$dir", _ => {
      val dig = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      val f = new java.io.File(stagingRoot, s"${fmt}_$dig")
      val path = f.getAbsolutePath
      val w = docs.coalesce(2).write.mode("overwrite")
      if (fmt == "jsonl") w.json(path)
      else w.option("header", "true").option("escape", "\"")
        .option("ignoreLeadingWhiteSpace", "false")
        .option("ignoreTrailingWhiteSpace", "false")
        .csv(path)
      path
    })

  private def corpusWithPlants(s: SparkSession, dir: String,
                               extra: Seq[(Long, String, String)]): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id"), col("source"), col("text"))
      .unionByName((Plants ++ extra).toDF("doc_id", "source", "text"))
  }

  /** Modulus keeping the per-source fold SUM inside a long at any
    * corpus size (10⁶ · 10⁹ docs ≈ 10¹⁵). */
  val FoldMod = 1000003L

  /** The per-source content-fidelity audit over an already-ingested
    * frame: doc count, char total, and Σ (md5-fold(text) mod
    * [[FoldMod]]) — order-free and content-sensitive, so the DuckDB
    * twin computed from parquet hash-matches iff the round trip
    * preserved every byte. */
  def contentAudit(docs: DataFrame): DataFrame =
    docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("text"))).cast("bigint").as("n_chars"),
      sum(expr(Tables.md5FoldSql("text") + s" % ${FoldMod}L"))
        .cast("bigint").as("fold_sum"))
      .orderBy("source")

  /** corpus ∪ plants → JSONL on disk → [[readJsonl]] → audit. */
  def jsonlRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = corpusWithPlants(s, dir, JsonlOnlyPlants)
    contentAudit(readJsonl(s, stagePath(s, dir, "jsonl", docs)))
  }

  /** corpus ∪ plants → CSV on disk → [[readCsv]] → audit. */
  def csvRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val docs = corpusWithPlants(s, dir, Nil)
    contentAudit(readCsv(s, stagePath(s, dir, "csv", docs)))
  }
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** File-format interchange for the pipeline surface: JSON-lines (the
  * lingua franca of LLM corpus distribution) and CSV, as real Spark
  * sources/sinks with the discipline a 100 TB ingest needs:
  *
  *  - **schema is REQUIRED on read** — inference is a second full pass
  *    over the input and type-drifts on sparse fields (a field that is
  *    null in the sampled split infers as string); the canonical
  *    schema comes from the catalog, not the data;
  *  - **malformed rows are quarantined, not fatal** — PERMISSIVE mode
  *    routes undecodable lines to a `_corrupt_record` column so one
  *    bad line in a billion doesn't kill the job, and the caller can
  *    count/inspect the quarantine; FAILFAST is opt-in for
  *    trusted-provenance reads;
  *  - reads parallelize per file-split like any text source (JSONL and
  *    CSV without multiline quoting are splittable), so ingest scales
  *    with executors, not files.
  *
  * Round-trip identity (write → read == input) for both formats is
  * oracle-gated on the real tables (`jsonl_roundtrip`,
  * `csv_roundtrip`) and spec-locked for corrupt-record handling.
  */
object FileSources {

  val CORRUPT_COL = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+
      StructField(CORRUPT_COL, StringType, nullable = true))

  /** Write as JSON-lines: one object per line, one file per partition
    * (the standard distribution shape — downstream readers split per
    * file and per line). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read JSON-lines against an explicit schema. PERMISSIVE (default):
    * lines that fail to decode land whole in [[CORRUPT_COL]] with all
    * schema columns null; FAILFAST throws on the first bad line.
    *
    * Inspecting the quarantine: Spark (since 2.3) rejects a query that
    * references ONLY [[CORRUPT_COL]] over a raw file scan — `.cache()`
    * the returned frame before filtering on it (spec-locked in
    * FileSourcesSpec). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false): DataFrame =
    spark.read
      .schema(if (failFast) schema else withCorrupt(schema))
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CORRUPT_COL)
      .json(path)

  /** CSV null token, distinct from the empty string: with Spark's
    * defaults the writer renders NULL and "" identically (empty) and
    * the reader maps the empty token back to null, so a non-null empty
    * string silently becomes NULL across a round-trip. Writing nulls
    * as `\N` (the classic interchange convention) and keeping quoted
    * `""` for empty strings makes both survive. Residual limitation
    * (documented, not defended): a field whose entire VALUE is the
    * literal two-character sequence `\N` reads back as NULL — far
    * narrower than losing every empty string. */
  val CSV_NULL_TOKEN = "\\N"

  /** Write as headered CSV (quotes/escapes applied by the writer, so
    * embedded quotes and delimiters round-trip; whitespace trimming
    * explicitly OFF — Spark's CSV defaults silently strip leading/
    * trailing spaces, which would break the round-trip identity; nulls
    * as [[CSV_NULL_TOKEN]] so empty strings stay distinct from NULL).
    *
    * Known limitation (documented, not defended): embedded NEWLINES in
    * a field need multiLine=true on read, which makes files
    * non-splittable — newline-bearing records belong in JSONL
    * ([[writeJsonl]]), the newline-safe interchange. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", CSV_NULL_TOKEN)
      .option("emptyValue", "\"\"")
      .csv(path)

  /** Read headered CSV against an explicit schema, same quarantine
    * contract as [[readJsonl]] and the same no-trim/null-token options
    * as [[writeCsv]]. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      failFast: Boolean = false): DataFrame =
    spark.read
      .schema(if (failFast) schema else withCorrupt(schema))
      .option("header", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .option("nullValue", CSV_NULL_TOKEN)
      .option("emptyValue", "")
      .option("mode", if (failFast) "FAILFAST" else "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CORRUPT_COL)
      .csv(path)

  /** Write as ORC — the columnar binary interchange tier: typed
    * columns including nested arrays/structs that CSV cannot carry and
    * JSONL only carries via re-parsing, stripe-level min/max indexes
    * that serve predicate pushdown (filters reach the scan as
    * PushedFilters — spec-locked), splittable stripes so reads
    * parallelize like parquet. One file per partition, matching the
    * other sinks. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Read ORC against an explicit expected schema. ORC files are
    * self-describing, but the catalog stays the schema authority (the
    * [[readJsonl]] discipline): the passed schema pins column types
    * and prunes the scan to exactly those columns; a type mismatch
    * fails at analysis instead of silently widening. No quarantine
    * column — ORC is binary-framed, so a corrupt stripe is an I/O
    * error, not a recoverable bad line. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Write `df` as JSONL and read it back with `df`'s own schema —
    * the identity whose gate proves the sink/source pair preserves
    * every column bit-exactly. Returns the re-read frame without the
    * (empty) quarantine column. */
  def roundTripJsonl(df: DataFrame, path: String): DataFrame = {
    writeJsonl(df, path)
    readJsonl(df.sparkSession, path, df.schema)
      .select(df.columns.map(org.apache.spark.sql.functions.col): _*)
  }

  /** CSV twin of [[roundTripJsonl]]. */
  def roundTripCsv(df: DataFrame, path: String): DataFrame = {
    writeCsv(df, path)
    readCsv(df.sparkSession, path, df.schema)
      .select(df.columns.map(org.apache.spark.sql.functions.col): _*)
  }

  /** ORC twin of [[roundTripJsonl]] — exercised over nested-array
    * columns in the gate, the shape the text formats can't prove. */
  def roundTripOrc(df: DataFrame, path: String): DataFrame = {
    writeOrc(df, path)
    readOrc(df.sparkSession, path, df.schema)
      .select(df.columns.map(org.apache.spark.sql.functions.col): _*)
  }
}

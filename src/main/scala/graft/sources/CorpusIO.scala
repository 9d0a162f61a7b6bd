package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructType}

/** Text-corpus ingestion beside the parquet tables: JSONL (the lingua
  * franca of training-data interchange) and CSV, read with an EXPLICIT
  * schema and corrupt-record capture.
  *
  * Two scale rules are baked in rather than left to the caller:
  *
  *   - **No schema inference.** Spark's JSON/CSV inference runs a full
  *     extra pass over the data before the real read — at corpus scale
  *     that doubles the scan. Callers pass the schema; the reader only
  *     ever makes one pass.
  *   - **Malformed lines are data, not crashes.** A multi-TB crawl dump
  *     always contains some broken lines; FAILFAST would kill the job at
  *     hour N and DROPMALFORMED silently changes row counts. PERMISSIVE
  *     with a named corrupt-record column keeps every line, lets the
  *     pipeline route rejects to a quarantine sink, and makes the reject
  *     rate observable (`corruptRecords`).
  */
object CorpusIO {

  val CorruptCol = "_corrupt_record"

  /** Schema of the driver testdata `documents` table, for convenience. */
  def documentsSchema: StructType = new StructType()
    .add("doc_id", "long").add("text", "string").add("lang", "string")
    .add("source", "string").add("n_chars", "long")

  private def withCorrupt(schema: StructType): StructType =
    if (schema.fieldNames.contains(CorruptCol)) schema
    else schema.add(CorruptCol, StringType, nullable = true)

  /** One JSON object per line. Rows that fail to parse against `schema`
    * come back with data columns null and the raw line in [[CorruptCol]].
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** Header-less CSV against an explicit schema, same reject contract as
    * [[readJsonl]]. Quoting is RFC-4180 (quote char doubled inside quoted
    * fields — `escape` set to the quote char, not Spark's backslash
    * default), matching [[writeCsv]] so exports round-trip.
    *
    * `multiLine` defaults OFF because multi-line CSV parsing is not
    * splittable — one file becomes one task regardless of size. Turn it
    * on only for corpora whose text embeds newlines, and shard the
    * export into many files so parallelism comes from file count
    * (exactly what [[writeCsv]]'s partitioned output produces).
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      multiLine: Boolean = false
  ): DataFrame =
    spark.read
      .schema(withCorrupt(schema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("header", "false")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("multiLine", multiLine.toString)
      .csv(path)

  /** The good rows, corrupt column dropped. Note: Spark disallows plans
    * over raw JSON/CSV sources that reference ONLY the corrupt-record
    * column — e.g. `validRecords(read...).count()`, where pruning drops
    * every data column. `.cache()` the parsed frame before splitting it
    * into valid/corrupt (the pattern Spark's own error message
    * prescribes, and the natural one: both splits share the parse).
    */
  def validRecords(df: DataFrame): DataFrame =
    df.where(df(CorruptCol).isNull).drop(CorruptCol)

  /** The quarantine stream: rejected rows, raw line in [[CorruptCol]].
    * Full rows are returned (not just the corrupt column) because Spark
    * disallows queries over raw JSON/CSV sources whose referenced columns
    * are ONLY the internal corrupt-record column — callers that want the
    * raw lines alone should `.cache()` the parsed frame first, then
    * project.
    */
  def corruptRecords(df: DataFrame): DataFrame =
    df.where(df(CorruptCol).isNotNull)

  /** JSONL export (one object per line, no extra pass). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** ORC read — the second columnar interchange format beside parquet.
    * Same engine properties apply (column pruning, predicate pushdown to
    * stripe/row-group stats, splittable stripes), so a corpus delivered
    * as ORC costs the same single pruned scan as parquet.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC export (zlib by default; splittable stripes). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Avro read — row-oriented interchange (the serialization family the
    * reference's Kafka Connect stack speaks natively; Spark bundles the
    * implementation classes in spark-sql). Schema-ful binary like
    * ORC/parquet, so no corrupt-record contract applies; unlike the
    * columnar pair there is no column pruning or predicate pushdown —
    * Avro is the WIRE format, parquet/ORC stay the at-rest formats.
    *
    * The FULL provider class name is used because this distribution
    * ships the classes without the `avro` shortname's service
    * registration (`META-INF/services/...DataSourceRegister` has no avro
    * entry), and Spark special-cases the bare name with a misleading
    * "deploy the external module" error before ever trying the class.
    */
  private val AvroProvider = "org.apache.spark.sql.avro.AvroFileFormat"

  def readAvro(spark: SparkSession, path: String): DataFrame =
    spark.read.format(AvroProvider).load(path)

  /** Avro export (splittable blocks, snappy by default). */
  def writeAvro(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format(AvroProvider).save(path)

  /** Header-less CSV export with RFC-4180 quoting (embedded quotes
    * doubled, fields with separators/newlines quoted) — the exact
    * dialect [[readCsv]] parses, so write→read round-trips byte-exactly
    * including newlines and quotes in text. One output file per input
    * partition, which is what keeps a later `multiLine` read parallel.
    *
    * The two `ignore*WhiteSpace` options default TRUE on write (unlike
    * read) — Spark would silently trim edge whitespace, including a
    * trailing newline, out of every field. Fidelity export must turn
    * both off.
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "false")
      .option("quote", "\"")
      .option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(path)
}

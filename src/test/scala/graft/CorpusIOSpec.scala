package graft

import org.apache.spark.sql.functions._

import graft.sources.CorpusIO

/** JSONL/CSV corpus ingestion: explicit-schema single-pass reads,
  * roundtrip fidelity, and the corrupt-record quarantine contract.
  */
class CorpusIOSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents")

  test("documents roundtrip through JSONL with full fidelity") {
    val dir = tempDir("jsonl") + "/docs"
    CorpusIO.writeJsonl(docs, dir)
    // cache before splitting valid/corrupt — the raw-source corrupt-column
    // restriction the CorpusIO scaladoc documents
    val parsed = CorpusIO.readJsonl(spark, dir, CorpusIO.documentsSchema).cache()
    try {
      val back = CorpusIO.validRecords(parsed)
      assert(back.count() == docs.count())
      // value-level: no row differs in either direction
      val cols = docs.columns.map(col).toSeq
      assert(back.select(cols: _*).exceptAll(docs.select(cols: _*)).isEmpty)
      assert(docs.select(cols: _*).exceptAll(back.select(cols: _*)).isEmpty)
    } finally { parsed.unpersist(); () }
  }

  test("documents roundtrip through ORC losslessly, with pushdown intact") {
    val dir = tempDir("orc") + "/docs"
    CorpusIO.writeOrc(docs, dir)
    val back = CorpusIO.readOrc(spark, dir)
    val cols = docs.columns.map(col).toSeq
    assert(back.count() == docs.count())
    assert(back.select(cols: _*).exceptAll(docs.select(cols: _*)).isEmpty)
    assert(docs.select(cols: _*).exceptAll(back.select(cols: _*)).isEmpty)
    // ORC scans must prune columns and push predicates like parquet
    val p = back.where(col("doc_id") > 10).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,10)]"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p)
  }

  test("malformed JSONL lines land in quarantine instead of failing the read") {
    val dir = tempDir("jsonlbad")
    val lines = Seq(
      """{"doc_id": 1, "text": "ok doc", "lang": "en", "source": "s", "n_chars": 6}""",
      """{"doc_id": 2 "text": "missing comma"""", // malformed
      """not json at all""",
      """{"doc_id": 3, "text": "another ok", "lang": "fr", "source": "s", "n_chars": 10}"""
    )
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part.jsonl"),
      lines.mkString("\n").getBytes("UTF-8"))
    val parsed = CorpusIO.readJsonl(spark, dir, CorpusIO.documentsSchema).cache()
    try {
      assert(CorpusIO.validRecords(parsed).count() == 2)
      val bad = CorpusIO.corruptRecords(parsed).select(CorpusIO.CorruptCol).as[String].collect()
      assert(bad.length == 2)
      assert(bad.exists(_.contains("missing comma")) && bad.contains("not json at all"))
      // every input line is either valid or quarantined — none dropped
      assert(parsed.count() == lines.size)
    } finally { parsed.unpersist(); () }
  }

  test("JSONL streams through Structured Streaming with the same quarantine contract") {
    // ingestion-time form: a JSONL drop-directory consumed as a stream,
    // split per micro-batch into admitted rows and quarantined raw lines —
    // the same explicit-schema single-pass contract as the batch reader
    val dir = tempDir("jsonlstream") + "/in"
    val ckpt = tempDir("jsonlstreamckpt")
    val lines = Seq(
      """{"doc_id": 1, "text": "good row", "lang": "en", "source": "s", "n_chars": 8}""",
      """garbage line""",
      """{"doc_id": 2, "text": "also good", "lang": "fr", "source": "s", "n_chars": 9}"""
    )
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "drop1.jsonl"), lines.mkString("\n").getBytes("UTF-8"))
    val stream = spark.readStream
      .schema(CorpusIO.documentsSchema.add(CorpusIO.CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorpusIO.CorruptCol)
      .json(dir)
    var admitted = 0L
    var quarantined = 0L
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val b = batch.cache()
        try {
          admitted += CorpusIO.validRecords(b).count()
          quarantined += CorpusIO.corruptRecords(b).count()
        } finally { b.unpersist(); () }
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(admitted == 2 && quarantined == 1)
  }

  test("documents roundtrip through Avro losslessly") {
    val dir = tempDir("avro") + "/docs"
    CorpusIO.writeAvro(docs, dir)
    val back = CorpusIO.readAvro(spark, dir)
    assert(back.count() == docs.count())
    val cols = docs.columns.map(col).toSeq
    assert(back.select(cols: _*).exceptAll(docs.select(cols: _*)).isEmpty)
    assert(docs.select(cols: _*).exceptAll(back.select(cols: _*)).isEmpty)
  }

  test("CSV write→read round-trips quotes, commas, and embedded newlines exactly") {
    val nasty = Seq(
      (1L, "plain text", "en", "s", 10L),
      (2L, "comma, inside", "en", "s", 13L),
      (3L, "a \"quoted\" word", "en", "s", 15L),
      (4L, "line one\nline two\r\nline three", "en", "s", 29L),
      (5L, "all: \",\n\"\"--,\n", "en", "s", 14L),
      (6L, "", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = tempDir("csvrt") + "/docs"
    CorpusIO.writeCsv(nasty, dir)
    val parsed = CorpusIO.readCsv(spark, dir, CorpusIO.documentsSchema, multiLine = true).cache()
    try {
      val back = CorpusIO.validRecords(parsed)
      assert(CorpusIO.corruptRecords(parsed).isEmpty)
      val got = back.orderBy("doc_id").select($"doc_id", $"text").as[(Long, String)].collect()
      // empty string and null are indistinguishable in bare CSV — accept
      // the null reading for doc 6, exactness for all the spiced rows
      assert(got.take(5).toSeq === Seq(
        1L -> "plain text", 2L -> "comma, inside", 3L -> "a \"quoted\" word",
        4L -> "line one\nline two\r\nline three", 5L -> "all: \",\n\"\"--,\n"))
      assert(got(5)._2 == null || got(5)._2 == "")
    } finally { parsed.unpersist(); () }
  }

  test("CSV reads against an explicit schema with the same reject contract") {
    val dir = tempDir("csvdocs")
    val lines = Seq(
      "1,hello world,en,s,11",
      "2,bonjour,fr,s,7",
      "3,broken,es,s,notanumber" // n_chars fails the long cast
    )
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    val parsed = CorpusIO.readCsv(spark, dir, CorpusIO.documentsSchema).cache()
    try {
      assert(CorpusIO.validRecords(parsed).count() == 2)
      assert(CorpusIO.corruptRecords(parsed).count() == 1)
      val ok = CorpusIO.validRecords(parsed).orderBy("doc_id")
        .select($"doc_id", $"text", $"n_chars").as[(Long, String, Long)].collect()
      assert(ok.toSeq == Seq((1L, "hello world", 11L), (2L, "bonjour", 7L)))
    } finally { parsed.unpersist(); () }
  }
}

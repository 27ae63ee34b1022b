package graft

import org.apache.spark.sql.functions._

import graft.ops.{CorpusClean, Dedup}
import graft.streaming.CorpusIngest

class CorpusIngestSpec extends SparkSpec {
  import spark.implicits._

  private val cfg = CorpusClean.Config(minTokens = 1, maxTokens = 1000,
    minStopwordRatio = 0.0, maxPunctRatio = 1.0,
    langs = Set("en", "es", "fr", "unk"),
    shingleSize = 3, nearDupThreshold = 0.5)

  private val tA2 = "spark engines shuffle data across partitions while " +
    "broadcast joins attach small dimension tables and the optimizer " +
    "prunes columns aggressively at scan time"
  private val tB3 = "streaming queries checkpoint their progress so a " +
    "restarted job resumes from the last committed epoch without " +
    "reprocessing any of the finished batches"

  private val dfA = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river"),
    (2L, tA2),
    (3L, "completely unrelated third document about nothing in particular"))
  private val dfB = Seq(
    (11L, "the quick brown fox jumps over the lazy dog near the river"),
    (12L, tA2.replace("aggressively", "eagerly")), // near-dup of doc 2
    (13L, tB3))

  test("streamed ingest across a checkpoint restart equals the batch build on A union B") {
    val root = java.nio.file.Files.createTempDirectory("ingest").toString
    val (inDir, corpus, index, ckpt) =
      (s"$root/in", s"$root/corpus", s"$root/index", s"$root/ckpt")
    def land(name: String, rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(s"$inDir/$name")
    def stream = spark.readStream.schema("doc_id long, text string")
      .parquet(s"$inDir/*")

    // epoch 1: batch A, then STOP the query entirely
    land("a", dfA)
    val q1 = CorpusIngest.start(stream, "doc_id", "text", corpus, index,
      ckpt, cfg)
    try q1.processAllAvailable() finally q1.stop()

    // epoch 2: batch B through a NEW query on the same checkpoint —
    // the restart path a production job takes after redeploy/crash
    land("b", dfB)
    val q2 = CorpusIngest.start(stream, "doc_id", "text", corpus, index,
      ckpt, cfg)
    try q2.processAllAvailable() finally q2.stop()

    val got = spark.read.parquet(corpus)
      .select("doc_id").as[Long].collect().toSet
    // the batch pipeline on A ∪ B: min-id survivors, which coincide
    // with arrival order here (A's ids precede B's)
    val want = CorpusClean.clean(
        (dfA ++ dfB).toDF("doc_id", "text"), "doc_id", "text", cfg)
      .select("doc_id").as[Long].collect().toSet
    assert(got == want, s"streamed $got vs batch $want")
    // the exact dup (11) and the near-dup (12) were rejected; the
    // genuinely new doc (13) was admitted
    assert(!got.contains(11L) && got.contains(13L))
    assert(got.contains(1L) && got.contains(2L))

    // the index answers as if built on the whole corpus: a close
    // variant of B's new doc finds its standing neighbor
    val probe = Seq((99L, tB3.replace("finished", "completed")))
      .toDF("doc_id", "text")
    val hit = Dedup.lshQueryIndex(spark, index, probe, "doc_id", "text",
      0.5, 3)
    assert(hit.where($"doc_a" === 13L && $"doc_b" === 99L).count() == 1)

    // replay idempotence: re-running an already-committed epoch is a
    // no-op (marker + _SUCCESS guard), corpus row count unchanged
    val before = spark.read.parquet(corpus).count()
    val admitted = CorpusIngest.ingestBatch(
      dfA.toDF("doc_id", "text"), 0L, "doc_id", "text", corpus, index, cfg)
    assert(admitted == 0L)
    assert(spark.read.parquet(corpus).count() == before)
  }

  test("ingestRestarted: the resumed epoch admits odd ids against the standing even-id corpus") {
    // the q167 gate harness end-to-end on the real sf0.001 corpus:
    // epoch 0 (even ids) builds corpus+index, the restart's epoch 1
    // (odd ids) must anti-join against it and still admit novel docs
    val out = graft.streaming.CorpusIngest
      .ingestRestarted(spark, "/root/testdata/sf0.001/documents.parquet")
      .collect().map(_.getLong(0)).toSet
    assert(out.exists(_ % 2 == 0) && out.exists(_ % 2 == 1),
      s"both epochs must admit documents (got ${out.size} ids)")
    assert(out.size > 100, s"suspiciously small admitted corpus: ${out.size}")
  }

  test("ingest as batch backfill: duplicate-only epochs admit nothing") {
    val root = java.nio.file.Files.createTempDirectory("ingestb").toString
    val (corpus, index) = (s"$root/corpus", s"$root/index")
    val n1 = CorpusIngest.ingestBatch(dfA.toDF("doc_id", "text"), 0L,
      "doc_id", "text", corpus, index, cfg)
    assert(n1 == 3L)
    // a batch that is ENTIRELY exact/near duplicates of the corpus
    val n2 = CorpusIngest.ingestBatch(
      Seq((21L, dfA.head._2), (22L, tA2.replace("aggressively", "keenly")))
        .toDF("doc_id", "text"), 1L, "doc_id", "text", corpus, index, cfg)
    assert(n2 == 0L)
    assert(spark.read.parquet(corpus).count() == 3L)
  }
}

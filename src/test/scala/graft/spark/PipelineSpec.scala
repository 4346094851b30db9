package graft.spark

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline._

/** End-to-end pipeline correctness:
  *  - the reference's golden visible-text fixtures, run as TURNS of a
  *    transcripts table through the distributed extraction (the north rule's
  *    "per-turn text equality under stable turn ordering");
  *  - determinism: identical digest across partitionings / reruns;
  *  - resumable bucketed job: identical result after a simulated crash.
  */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def fixtureCases(): Seq[(Int, String, String)] = {
    val url = getClass.getResource("/visible-text/v1")
    val dir = Paths.get(url.toURI)
    Files.list(dir).iterator.asScala.toSeq
      .filter(_.getFileName.toString.startsWith("case-"))
      .sortBy(_.getFileName.toString)
      .zipWithIndex
      .map { case (caseDir, idx) =>
        val html = new String(Files.readAllBytes(caseDir.resolve("input.html")), "UTF-8")
        val raw = new String(Files.readAllBytes(caseDir.resolve("expected.txt")), "UTF-8")
        val expected = if (raw.endsWith("\n")) raw.dropRight(1) else raw
        (idx, html, expected)
      }
  }

  test("golden fixtures as transcript turns: exact per-turn equality in stable order") {
    import spark.implicits._
    val cases = fixtureCases()
    assert(cases.size >= 100)
    val turns = cases.map { case (idx, html, _) =>
      TranscriptTurn("fixture-conv", idx, "assistant", html, "",
        new java.sql.Timestamp(1700000000000L + idx * 1000L))
    }
    val ds = spark.createDataset(turns).repartition(7) // scramble order on purpose
    val out = Extraction.extract(ds)
      .orderBy(col("conv_id"), col("turn_idx"))
      .collect()
    assert(out.length == cases.size)
    out.zip(cases).foreach { case (row, (idx, _, expected)) =>
      assert(row.turn_idx == idx)
      assert(row.budget_error == "")
      assert(row.extracted_text == expected,
        s"\nfixture case idx=$idx\n--- expected ---\n$expected\n--- actual ---\n${row.extracted_text}")
    }
  }

  test("extraction output has input-backed char spans that slice the original html") {
    import spark.implicits._
    val turns = Seq(TranscriptTurn("c1", 0, "user",
      "<p>hello <b>world</b></p>", "", new java.sql.Timestamp(0L)))
    val out = Extraction.extract(spark.createDataset(turns)).collect().head
    assert(out.extracted_text == "hello world")
    val textSpans = out.spans.filter(s => s.kind == "text" && s.start >= 0)
    assert(textSpans.nonEmpty)
    // each input-backed text token's source span must contain its value
    val html = "<p>hello <b>world</b></p>"
    textSpans.foreach { s =>
      val slice = html.substring(s.start, s.end)
      assert(slice.contains(s.value.trim),
        s"span [${s.start},${s.end}) = '$slice' does not contain token '${s.value}'")
    }
  }

  test("determinism: digest identical across partitionings and reruns") {
    val ds = Transcripts.generate(spark, nConversations = 300, seed = 7L)
    val d1 = Extraction.datasetDigest(Extraction.extract(ds.repartition(3)))
    val d2 = Extraction.datasetDigest(Extraction.extract(ds.repartition(17)))
    val d3 = Extraction.datasetDigest(Extraction.extract(ds.repartition(17)))
    assert(d1 == d2)
    assert(d2 == d3)
  }

  test("generator is deterministic and skewed") {
    val a = Transcripts.generate(spark, 500, seed = 42L).collect()
    val b = Transcripts.generate(spark, 500, seed = 42L).collect()
    assert(a.sortBy(t => (t.conv_id, t.turn_idx)).toSeq ==
      b.sortBy(t => (t.conv_id, t.turn_idx)).toSeq)
    val sizes = a.groupBy(_.conv_id).map(_._2.length)
    assert(sizes.max == 256, "skewed long conversation present")
    assert(sizes.min >= 2)
  }

  test("lineage rows cover all rows and XOR to the dataset digest") {
    val ds = Transcripts.generate(spark, 100, seed = 3L)
    val extracted = Extraction.extract(ds.repartition(5))
    val lineage = Extraction.lineage(extracted).collect()
    assert(lineage.map(_.n_rows).sum == extracted.count())
    val global = lineage.map(_.digest).reduce(_ ^ _)
    assert(global == Extraction.datasetDigest(extracted))
  }

  test("poison rows (budget violations) become error columns, not task failures") {
    import spark.implicits._
    val deep = "<div>" * 100000 + "x"
    val turns = Seq(
      TranscriptTurn("c1", 0, "user", "<p>fine</p>", "", new java.sql.Timestamp(0L)),
      TranscriptTurn("c1", 1, "user", deep, "", new java.sql.Timestamp(0L)))
    val out = Extraction.extract(spark.createDataset(turns))
      .collect().sortBy(_.turn_idx)
    assert(out(0).budget_error == "" && out(0).extracted_text == "fine")
    assert(out(1).budget_error.startsWith("budget:"))
  }

  test("main-content mode strips boilerplate per turn and records the winner span") {
    import spark.implicits._
    val story = "the actual story body with enough characters to win the block score"
    val html = """<div class="nav"><a href="#">home</a> <a href="#">about</a></div>""" +
      s"""<article><p>$story</p></article><div class="footer">copyright someone</div>"""
    val turns = Seq(
      TranscriptTurn("c1", 0, "user", html, "", new java.sql.Timestamp(0L)),
      // no candidate block -> whole-document fallback, no mainContent span
      TranscriptTurn("c1", 1, "user", "<p>short plain turn</p>", "", new java.sql.Timestamp(0L)))
    val out = Extraction.extractMain(spark.createDataset(turns))
      .collect().sortBy(_.turn_idx)

    assert(out(0).extracted_text == story)
    val sp = out(0).spans match { case Seq(s) => s; case other => fail(s"spans=$other") }
    assert(sp.kind == "mainContent" && sp.value == "article")
    assert(html.substring(sp.start, sp.end) == s"<article><p>$story</p></article>")

    assert(out(1).extracted_text == "short plain turn")
    assert(out(1).spans.isEmpty)

    // the full job accepts the flag and its digest differs from full-page
    // extraction on the same input (boilerplate really was dropped)
    val tmp = Files.createTempDirectory("graft-mc").toString
    spark.createDataset(turns).toDF().write.parquet(s"$tmp/in")
    ExtractJob.run(spark, ExtractJob.Args(s"$tmp/in", s"$tmp/out-main",
      buckets = 4, passes = 1, mainContent = true))
    ExtractJob.run(spark, ExtractJob.Args(s"$tmp/in", s"$tmp/out-full",
      buckets = 4, passes = 1))
    def texts(dir: String) = spark.read.parquet(s"$dir/data")
      .orderBy("turn_idx").select("extracted_text").as[String].collect().toSeq
    assert(texts(s"$tmp/out-main") == Seq(story, "short plain turn"))
    assert(texts(s"$tmp/out-full").head.contains("home"))
  }

  test("bucketed job is resumable: crash after pass 0, resume completes pass 1 only") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-job").toString
    val in = s"$tmp/in"
    val out1 = s"$tmp/out-straight"
    val out2 = s"$tmp/out-resumed"
    Transcripts.generate(spark, 120, seed = 9L).toDF().write.parquet(in)

    // reference run: both passes in one go
    ExtractJob.run(spark, ExtractJob.Args(in, out1, buckets = 8, passes = 2))

    // simulated crash: run pass 0 only (passes=2 but stop via marker trick):
    // run full job, then delete pass 1 outputs + marker, then --resume
    ExtractJob.run(spark, ExtractJob.Args(in, out2, buckets = 8, passes = 2))
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).iterator.asScala.foreach(rm)
      Files.deleteIfExists(p)
    }
    rm(Paths.get(s"$out2/data/pass=1"))
    rm(Paths.get(s"$out2/_progress/pass-1.done"))
    ExtractJob.run(spark, ExtractJob.Args(in, out2, buckets = 8, passes = 2, resume = true))

    def digestOf(dir: String): Long = {
      val df = spark.read.parquet(s"$dir/data")
        .select($"conv_id", $"turn_idx", $"role", $"extracted_text", $"spans",
          $"n_parse_errors", $"first_parse_error", $"budget_error",
          $"n_chars_in", $"n_chars_out").as[ExtractedTurn]
      Extraction.datasetDigest(df)
    }
    assert(spark.read.parquet(s"$out1/data").count() ==
      spark.read.parquet(s"$out2/data").count())
    assert(digestOf(out1) == digestOf(out2))
  }

  test("skew salting spreads one long conversation over multiple partitions") {
    import spark.implicits._
    val turns = (0 until 2000).map(i =>
      TranscriptTurn("hot-conv", i, "user", "<p>x</p>", "", new java.sql.Timestamp(0L)))
    val df = spark.createDataset(turns).toDF()
    val salted = df.repartition(8, col("conv_id"),
      pmod(xxhash64(col("conv_id"), expr("turn_idx DIV 100")), lit(8)))
    import org.apache.spark.sql.Row
    val counts = salted.rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator.single(i -> it.size)
    }.collect().filter(_._2 > 0)
    assert(counts.length > 1, s"expected >1 partition, got ${counts.toSeq}")
  }

  test("ConvDigest aggregator matches a local fold and is order-independent") {
    import spark.implicits._
    import graft.pipeline.ConvDigest
    val turns = Seq(
      ("c1", 0L, "alpha"), ("c1", 1L, "beta"), ("c1", 2L, "gamma"),
      ("c2", 0L, "delta"), ("c2", 5L, ""))
    val expected = turns.groupBy(_._1).map { case (c, ts) =>
      c -> (ts.size.toLong,
        ts.map(t => ConvDigest.turnHash(t._2, t._3)).reduce(_ ^ _),
        ts.map(_._3.length.toLong).sum)
    }
    val out = spark.createDataset(turns).repartition(5) // scramble order
      .map(t => (t._1, (t._2, t._3)))
      .groupByKey(_._1).mapValues(_._2)
      .agg(new ConvDigest.Agg().toColumn.name("st"))
      .collect().map { case (c, st) => c -> (st.n_turns, st.digest, st.n_chars) }
      .toMap
    assert(out == expected)
  }

  test("ExtractJob progress markers work with a scheme-qualified output URI") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-uri").toString
    val in = s"$tmp/in"
    Transcripts.generate(spark, 6, seed = 3L).toDF().write.parquet(in)
    // file: scheme exercises the Hadoop FileSystem marker path (the
    // java.nio implementation would have failed or mis-placed markers)
    val out = s"file:$tmp/out"
    ExtractJob.run(spark, ExtractJob.Args(in, out, buckets = 4, passes = 2))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tmp/out/_progress/pass-0.done")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tmp/out/_progress/pass-1.done")))
    // resume skips both completed passes (no rewrite)
    val before = spark.read.parquet(s"$tmp/out/data/pass=0").count()
    ExtractJob.run(spark, ExtractJob.Args(in, out, buckets = 4, passes = 2, resume = true))
    assert(spark.read.parquet(s"$tmp/out/data/pass=0").count() == before)
  }

  test("fatal VM errors propagate out of the extraction guard; data errors degrade") {
    val t = TranscriptTurn("c", 0, "user", "<p>x</p>", "",
      new java.sql.Timestamp(0L))
    // parse-shaped failures degrade to the error column (poison-row contract)
    val degraded = Extraction.guardedExtract(t, 8L)(throw new RuntimeException("boom"))
    assert(degraded.budget_error == "internal:RuntimeException")
    assert(degraded.extracted_text == "")
    // recursion overflow on adversarial DOM depth degrades too
    assert(Extraction.guardedExtract(t, 0L)(throw new StackOverflowError())
      .budget_error == "internal:StackOverflowError")
    // fatal VM errors must FAIL the task (Spark retries it), never masquerade
    // as an empty extraction row
    intercept[OutOfMemoryError] {
      Extraction.guardedExtract(t, 0L)(throw new OutOfMemoryError("injected"))
    }
    intercept[InternalError] {
      Extraction.guardedExtract(t, 0L)(throw new InternalError("injected"))
    }
    // a poison document still lands in the error column end-to-end: on the
    // 64 MiB extraction worker stack this trips maxDepth post-build; on a
    // small test-thread stack the build overflows first — both degrade
    val poison = Extraction.extractOne(
      t.copy(text = "<div>" * 100000), Extraction.DefaultBudgets,
      graft.core.VisibleTextOptions())
    assert(poison.budget_error.startsWith("budget:") ||
      poison.budget_error == "internal:StackOverflowError", poison.budget_error)
  }
}

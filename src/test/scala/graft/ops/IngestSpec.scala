package graft.ops

import java.io.{ByteArrayInputStream, IOException, InputStream}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

class IngestSpec extends AnyFunSuite {

  private def tmpDir(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("fetchToStaging stages a file:// URL verbatim") {
    val src = Files.createTempFile("ingest_src", ".json")
    val body = """{"location": "Vilaflor", "elevation": 1387.0}"""
    Files.write(src, body.getBytes("UTF-8"))
    val out = Ingest.fetchToStaging(src.toUri.toString, tmpDir("ingest_out"), "doc.json")
    assert(new String(Files.readAllBytes(out), "UTF-8") == body)
    assert(out.getFileName.toString == "doc.json")
  }

  test("staged file feeds the JSON reader (extract → scan round trip)") {
    val spark = SparkSpec.session
    val src = Files.createTempFile("ingest_src2", ".json")
    Files.write(src, """{"location": "Adeje", "elevation": 50.0}""".getBytes("UTF-8"))
    val dir = tmpDir("ingest_scan")
    Ingest.fetchToStaging(src.toUri.toString, dir, "adeje.json")
    val df = Readers.jsonMultiLine(spark, dir)
    val row = df.select("location", "elevation").collect().head
    assert(row.getString(0) == "Adeje" && row.getDouble(1) == 50.0)
  }

  test("transient failures are retried with exponential backoff") {
    val delays = scala.collection.mutable.ArrayBuffer.empty[Long]
    var calls = 0
    val flaky: String => InputStream = { _ =>
      calls += 1
      if (calls < 3) throw new IOException(s"transient #$calls")
      new ByteArrayInputStream("ok".getBytes("UTF-8"))
    }
    val out = Ingest.fetchToStaging("http://irrelevant/x", tmpDir("ingest_retry"),
      "x.txt", maxAttempts = 5, baseDelayMs = 200L,
      sleep = delays.append(_), open = flaky)
    assert(calls == 3)
    assert(delays.toSeq == Seq(200L, 400L), "backoff must double per attempt")
    assert(new String(Files.readAllBytes(out), "UTF-8") == "ok")
  }

  test("exhausted retries rethrow the last error; no partial file remains") {
    var calls = 0
    val dir = tmpDir("ingest_fail")
    val e = intercept[IOException] {
      Ingest.fetchToStaging("http://irrelevant/y", dir, "y.txt",
        maxAttempts = 3, sleep = _ => (),
        open = { _ => calls += 1; throw new IOException(s"boom #$calls") })
    }
    assert(calls == 3)
    assert(e.getMessage.contains("after 3 attempts"))
    assert(e.getCause.getMessage == "boom #3")
    assert(new java.io.File(dir).listFiles().isEmpty, "no partial/temp files may survive")
  }

  test("a failure mid-copy leaves the previous staged version intact (atomic publish)") {
    val dir = tmpDir("ingest_atomic")
    Ingest.fetchToStaging("ignored", dir, "z.txt", sleep = _ => (),
      open = _ => new ByteArrayInputStream("v1".getBytes("UTF-8")))
    val failingMidStream: String => InputStream = _ => new InputStream {
      private var n = 0
      override def read(): Int = {
        n += 1
        if (n > 1) throw new IOException("connection reset mid-body") else 'x'
      }
    }
    intercept[IOException] {
      Ingest.fetchToStaging("ignored", dir, "z.txt", maxAttempts = 2,
        sleep = _ => (), open = failingMidStream)
    }
    val z = new java.io.File(dir, "z.txt")
    assert(new String(Files.readAllBytes(z.toPath), "UTF-8") == "v1",
      "failed refetch must not clobber the previously staged document")
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet == Set("z.txt"))
  }

  test("fetchAllToStaging stages a batch in order") {
    val dir = tmpDir("ingest_batch")
    val srcs = (1 to 3).map { i =>
      val f = Files.createTempFile(s"batch$i", ".json")
      Files.write(f, s"""{"i": $i}""".getBytes("UTF-8"))
      (f.toUri.toString, s"d$i.json")
    }
    val out = Ingest.fetchAllToStaging(srcs, dir)
    assert(out.map(_.getFileName.toString) == Seq("d1.json", "d2.json", "d3.json"))
    assert(out.forall(Files.exists(_)))
  }
}

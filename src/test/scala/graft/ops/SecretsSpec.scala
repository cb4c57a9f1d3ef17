package graft.ops

import graft.SparkSpec

class SecretsSpec extends SparkSpec {

  test("resolveValue: bare string payload is the secret") {
    assert(Secrets.resolveValue("K", "plain-token-123") == Some("plain-token-123"))
  }

  test("resolveValue: empty/null payloads resolve to None") {
    assert(Secrets.resolveValue("K", "") == None)
    assert(Secrets.resolveValue("K", null) == None)
  }

  test("resolveValue: JSON object probes candidate fields in priority order") {
    assert(Secrets.resolveValue("K", """{"apiKey":"a","key":"b"}""") == Some("a"))
    assert(Secrets.resolveValue("K", """{"key":"b","value":"v"}""") == Some("b"))
    assert(Secrets.resolveValue("K", """{"API_KEY":"c"}""") == Some("c"))
    // the secret's own name is probed after the conventional fields
    assert(Secrets.resolveValue("MY_TOKEN", """{"MY_TOKEN":"t","other":1}""") == Some("t"))
  }

  test("resolveValue: single-entry object yields its only value") {
    assert(Secrets.resolveValue("K", """{"whatever":"w"}""") == Some("w"))
    // non-textual values coerce to their JSON rendering
    assert(Secrets.resolveValue("K", """{"n":12345}""") == Some("12345"))
  }

  test("resolveValue: unrecognized multi-field object falls back to the raw payload") {
    val raw = """{"a":"1","b":"2"}"""
    assert(Secrets.resolveValue("K", raw) == Some(raw))
  }

  test("resolveValue: JSON-null fields are treated as absent") {
    assert(Secrets.resolveValue("K", """{"apiKey":null,"key":"b"}""") == Some("b"))
    assert(Secrets.resolveValue("K", """{"apiKey":null}""") == None)
  }

  test("resolveValue: non-object JSON payloads are used verbatim") {
    assert(Secrets.resolveValue("K", "12345") == Some("12345"))
    assert(Secrets.resolveValue("K", """["a","b"]""") == Some("""["a","b"]"""))
  }

  test("provider chain: spark conf, env, file — first non-empty wins") {
    spark.conf.set("spark.graft.secret.TOKEN", """{"apiKey":"from-conf"}""")
    try {
      val dir = java.nio.file.Files.createTempDirectory("secrets").toFile
      java.nio.file.Files.write(new java.io.File(dir, "TOKEN").toPath,
        "from-file\n".getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(dir, "ONLY_FILE").toPath,
        "file-only\n".getBytes("UTF-8"))
      val chain = Secrets.chain(
        Secrets.sparkConfProvider(spark),
        Secrets.envProvider(Map("ENV_TOKEN" -> "from-env")),
        Secrets.fileProvider(dir.getAbsolutePath))
      assert(Secrets.secret("TOKEN", chain) == Some("from-conf"))
      assert(Secrets.secret("ENV_TOKEN", chain) == Some("from-env"))
      // file provider strips the trailing newline, keeps the content
      assert(Secrets.secret("ONLY_FILE", chain) == Some("file-only"))
      assert(Secrets.secret("ABSENT", chain) == None)
    } finally spark.conf.unset("spark.graft.secret.TOKEN")
  }

  test("redact fully masks short secrets, reveals only edges of long ones") {
    assert(Secrets.redact("abcd") == "****")
    assert(Secrets.redact("abcdefgh") == "****") // ≤12 chars: nothing leaks
    assert(Secrets.redact("123456789012") == "****")
    assert(Secrets.redact("super-secret-token") == "su**************en")
    assert(!Secrets.redact("super-secret-token").contains("secret"))
  }

  test("fileProvider refuses path-traversal names") {
    val dir = java.nio.file.Files.createTempDirectory("sec_trav").toFile
    java.nio.file.Files.write(new java.io.File(dir, "OK").toPath,
      "fine".getBytes("UTF-8"))
    val outside = java.nio.file.Files.createTempFile("outside", ".txt")
    java.nio.file.Files.write(outside, "leaked".getBytes("UTF-8"))
    val p = Secrets.fileProvider(dir.getAbsolutePath)
    assert(p("OK") == Some("fine"))
    assert(p("../" + outside.getFileName.toString) == None)
    assert(p("..") == None && p("a/b") == None && p("a\\b") == None && p("") == None)
  }
}

package graft.ops

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

/** Tolerant secret/credential resolution — the engine-side counterpart
  * of the reference's secret fetch (reference README.md:288-365): fetch
  * a raw secret string from a store, then defensively extract the value
  * regardless of how it was stored (bare string, JSON object under any
  * of several conventional field names, single-entry JSON object, or
  * unparseable payload).
  *
  * The STORE here is pluggable and engine-local (Spark conf, process
  * environment, a secrets directory) — cloud secret managers are a
  * deployment concern wired in via a custom [[Secrets.Provider]]. What
  * this module owns is the tolerant value-resolution contract, which is
  * where the reference put all of its actual logic.
  *
  * Resolution order for a raw payload (mirrors README.md:328-365):
  *  1. null/empty payload → None.
  *  2. Payload parses as a JSON OBJECT → first present candidate field
  *     among `fieldNames` (then the secret's own name) wins; fields with
  *     JSON-null values are treated as absent.
  *  3. JSON object with exactly one (non-null) entry → that value.
  *  4. JSON object with no recognizable field → the raw payload string
  *     (caller sees everything; better than silently dropping).
  *  5. JSON non-object (number, array, quoted string) or non-JSON → the
  *     raw payload IS the secret.
  */
object Secrets {

  /** A provider maps a secret name to its raw stored payload, if any. */
  type Provider = String => Option[String]

  /** Conventional field names probed inside JSON-object payloads, in
    * priority order (reference README.md:335). */
  val DefaultFieldNames: Seq[String] = Seq("apiKey", "key", "API_KEY", "value")

  /** Secrets carried in Spark conf under `<prefix><name>` — the natural
    * store for cluster-submitted jobs (`--conf spark.graft.secret.X=…`). */
  def sparkConfProvider(
      spark: SparkSession,
      prefix: String = "spark.graft.secret."): Provider =
    name => spark.conf.getOption(prefix + name)

  /** Secrets from the process environment (exact-name lookup). */
  def envProvider(env: Map[String, String] = sys.env): Provider =
    name => env.get(name)

  /** Secrets mounted as files, one per name under `dir` (the
    * Kubernetes-style secret volume layout). Trailing newlines — the
    * usual artifact of `echo key > file` — are stripped; interior
    * whitespace is preserved. Unreadable/missing files are None.
    * Secret names are simple filenames by contract: a name containing a
    * path separator (or `..`) could traverse OUT of the secrets volume
    * and read arbitrary files as "secrets", so such names resolve to
    * None rather than a path. */
  def fileProvider(dir: String): Provider = name => {
    val traversal = name.contains('/') || name.contains('\\') ||
      name == ".." || name == "." || name.isEmpty
    if (traversal) None
    else {
      val f = new java.io.File(dir, name)
      if (!f.isFile) None
      else
        try {
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          Some(new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            .replaceAll("[\r\n]+$", ""))
        } catch { case _: java.io.IOException => None }
    }
  }

  /** First provider that yields a non-empty payload wins. */
  def chain(providers: Provider*): Provider =
    name => providers.iterator.flatMap(p => p(name)).find(_.nonEmpty)

  /** Tolerant extraction of the secret VALUE from a raw stored payload —
    * the reference's parse ladder, minus the logging of near-secrets. */
  def resolveValue(
      name: String, raw: String,
      fieldNames: Seq[String] = DefaultFieldNames): Option[String] = {
    if (raw == null || raw.isEmpty) return None
    val parsed =
      try Some(new ObjectMapper().readTree(raw))
      catch { case _: java.io.IOException => None } // not JSON → raw IS the value
    parsed match {
      case Some(node) if node != null && node.isObject =>
        val candidates = (fieldNames :+ name).iterator
          .map(node.get)
          .collectFirst { case v if v != null && !v.isNull =>
            if (v.isTextual) v.asText else v.toString
          }
        candidates.orElse {
          // single-entry object: the one value is unambiguous
          if (node.size == 1) {
            val v = node.elements().next()
            if (v.isNull) None
            else Some(if (v.isTextual) v.asText else v.toString)
          } else Some(raw) // unrecognized shape: surface the whole payload
        }
      case _ => Some(raw) // non-object JSON or non-JSON: payload is the secret
    }
  }

  /** Fetch + resolve in one step. */
  def secret(
      name: String, provider: Provider,
      fieldNames: Seq[String] = DefaultFieldNames): Option[String] =
    provider(name).flatMap(resolveValue(name, _, fieldNames))

  /** Log-safe rendering: never emit a secret into logs/plans. Values of
    * 12 characters or fewer are fully masked — showing edge characters
    * of a short token (a PIN, a 8-char key) leaves almost nothing to
    * brute-force; edges are only revealed when they are a negligible
    * fraction of the secret's entropy. */
  def redact(value: String): String =
    if (value == null || value.length <= 12) "****"
    else value.take(2) + "*" * (value.length - 4) + value.takeRight(2)
}

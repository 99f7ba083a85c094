package graft.embed

import java.nio.charset.StandardCharsets

/** Embedding / completion runtimes (reference: lantern_extras
  * `llm_embedding(..., runtime => 'openai'|'cohere'|'ort')`,
  * embeddings.rs:154-199; runtime dispatch
  * lantern_cli/src/embeddings/core/mod.rs:61-137).
  *
  * [[MockRuntime]] is the test/CI runtime: deterministic vectors the
  * DuckDB oracle can reproduce (the reference freezes expected vectors
  * in its tests the same way, embeddings.rs:258-392). The HTTP runtimes
  * build real OpenAI/Cohere wire requests; the ORT runtime carries the
  * public model registry but requires an ONNX runtime not bundled here.
  */
trait EmbeddingRuntime extends Serializable {
  def name: String
  def models: Seq[String]
  def dim(model: String): Int
  def embedBatch(model: String, texts: Seq[String]): Seq[Array[Float]]
  def complete(model: String, systemPrompt: String, userPrompt: String): String
}

/** Deterministic mock: component j of the embedding is derived from the
  * 28-bit md5-prefix hash of the text, quantized to multiples of 1/64
  * (exact in float, double, and 6-decimal output):
  * e_j = ((h + (j+1) * 2654435761) mod 128) / 64 - 1. */
class MockRuntime(dimension: Int = 8) extends EmbeddingRuntime {
  override def name: String = "mock"
  override def models: Seq[String] = Seq("mock-embed", "mock-complete")
  override def dim(model: String): Int = dimension

  override def embedBatch(model: String, texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      val h = MockRuntime.baseHash(t)
      Array.tabulate(dimension) { j =>
        (((h + (j + 1) * 2654435761L) % 128L) / 64.0 - 1.0).toFloat
      }
    }

  /** Deterministic completion: tag + model + input prefix. */
  override def complete(model: String, systemPrompt: String,
      userPrompt: String): String =
    s"MOCK[$model]: ${userPrompt.take(32)}"
}

object MockRuntime {
  /** First 7 hex digits of md5 as a long — the engine's cross-engine
    * deterministic hash (DuckDB: ('0x'||substr(md5(t),1,7))::BIGINT). */
  def baseHash(t: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(t.getBytes(StandardCharsets.UTF_8))
      .take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(7), 16)
  }
}

/** OpenAI-compatible embeddings/chat API runtime (reference
  * openai_runtime.rs). Serves three deployment shapes like the
  * reference (`get_base_url`, openai_runtime.rs:262-280): the OpenAI
  * API itself, Azure OpenAI deployments (detected by URL shape), and
  * custom OpenAI-compatible endpoints. Azure deployments switch the
  * auth header the way the reference does
  * (openai_runtime.rs:213-241): an API key goes in `api-key`, an
  * Entra (Azure AD) token in `Authorization: Bearer`; non-Azure
  * endpoints always use `Authorization: Bearer <api_token>`. Builds
  * real wire requests; requires network egress to function. */
class OpenAiRuntime(baseUrl: String = "https://api.openai.com/v1",
    apiToken: String = "", dimensions: Int = 1536,
    azureEntraToken: String = "") extends EmbeddingRuntime {
  import OpenAiRuntime._
  override def name: String = "openai"
  override def models: Seq[String] =
    Seq("text-embedding-3-small", "text-embedding-3-large",
      "text-embedding-ada-002")
  override def dim(model: String): Int = dimensions

  /** Azure vs OpenAI vs custom, from the base URL alone (reference
    * AZURE_OPENAI_REGEX, openai_runtime.rs:73). */
  private[graft] def deployment: Deployment =
    if (AzureUrl.matcher(baseUrl).matches()) Deployment.Azure
    else if (baseUrl.startsWith("https://api.openai.com")) Deployment.OpenAi
    else Deployment.Custom

  /** The one auth header this deployment sends. Azure prefers the API
    * key (`api-key: <key>`) and falls back to the Entra token
    * (`Authorization: Bearer <token>`); everything else requires the
    * API token. Mirrors openai_runtime.rs:213-241 including its error
    * messages' intent. */
  private[graft] def authHeader: (String, String) = deployment match {
    case Deployment.Azure =>
      if (apiToken.nonEmpty) ("api-key", apiToken)
      else if (azureEntraToken.nonEmpty)
        ("Authorization", s"Bearer $azureEntraToken")
      else throw new IllegalArgumentException(
        "'api_token' or 'azure_entra_token' is required for Azure OpenAI runtime")
    case _ =>
      if (apiToken.isEmpty) throw new IllegalArgumentException(
        "'api_token' is required for OpenAI runtime")
      ("Authorization", s"Bearer $apiToken")
  }

  /** Azure deployment URLs already ARE the embeddings endpoint (the
    * deployment regex pins the full path); OpenAI/custom bases get the
    * standard path appended. */
  private[graft] def embedUrl: String = deployment match {
    case Deployment.Azure => baseUrl
    case _ => s"$baseUrl/embeddings"
  }

  private[graft] def embedRequestBody(model: String, texts: Seq[String]): String = {
    val inputs = texts.map(Json.quote).mkString("[", ",", "]")
    s"""{"model":${Json.quote(model)},"input":$inputs,"dimensions":$dimensions}"""
  }

  private[graft] def completionRequestBody(model: String, systemPrompt: String,
      userPrompt: String): String =
    s"""{"model":${Json.quote(model)},"messages":[{"role":"system","content":${Json.quote(systemPrompt)}},{"role":"user","content":${Json.quote(userPrompt)}}]}"""

  override def embedBatch(model: String, texts: Seq[String]): Seq[Array[Float]] =
    Json.extractFloatArrays(
      Http.postJson(embedUrl, authHeader, embedRequestBody(model, texts)),
      "embedding")

  override def complete(model: String, systemPrompt: String,
      userPrompt: String): String = {
    val body = Http.postJson(s"$baseUrl/chat/completions", authHeader,
      completionRequestBody(model, systemPrompt, userPrompt))
    Json.extractString(body, "content").getOrElse("")
  }
}

object OpenAiRuntime {
  sealed trait Deployment
  object Deployment {
    case object OpenAi extends Deployment
    case object Azure extends Deployment
    case object Custom extends Deployment
  }
  /** Azure OpenAI deployment-URL shape (reference openai_runtime.rs:73):
    * `https://<resource>.openai.azure.com/openai/deployments/<name>/embeddings?api-version=2023-05-15`. */
  private[graft] val AzureUrl =
    ("^https://[a-zA-Z0-9_\\-]+\\.openai\\.azure\\.com/openai/deployments/" +
      "[a-zA-Z0-9_\\-]+/embeddings\\?api-version=2023-05-15$").r.pattern
}

/** Cohere embed API runtime (reference cohere_runtime). */
class CohereRuntime(baseUrl: String = "https://api.cohere.ai/v1",
    apiToken: String = "", inputType: String = "search_document")
    extends EmbeddingRuntime {
  override def name: String = "cohere"
  override def models: Seq[String] =
    Seq("embed-english-v3.0", "embed-multilingual-v3.0")
  override def dim(model: String): Int = 1024

  private[graft] def embedRequestBody(model: String, texts: Seq[String]): String = {
    val inputs = texts.map(Json.quote).mkString("[", ",", "]")
    s"""{"model":${Json.quote(model)},"texts":$inputs,"input_type":${Json.quote(inputType)}}"""
  }

  override def embedBatch(model: String, texts: Seq[String]): Seq[Array[Float]] =
    Json.extractFloatArrays(
      Http.postJson(s"$baseUrl/embed", apiToken, embedRequestBody(model, texts)),
      "embeddings")

  override def complete(model: String, systemPrompt: String,
      userPrompt: String): String =
    throw new UnsupportedOperationException("cohere runtime: completion not supported")
}

/** The one-method local-inference surface [[OrtRuntime]] dispatches to
  * when activated (the Spark-side analog of the reference's
  * EncoderService, ort_runtime.rs). Implementations own session
  * management, tokenization and pooling; this library owns batching,
  * the registry, and the job/streaming plumbing. */
trait OrtInference {
  def embed(model: String, texts: Seq[String]): Seq[Array[Float]]
}

/** Local ONNX runtime: carries the public model registry (reference
  * ort_runtime.rs:284-298). Inference activates WITHOUT a code change
  * when two things land on the executor classpath: the onnxruntime
  * jars (probed via `Class.forName("ai.onnxruntime.OrtEnvironment")`)
  * and an [[OrtInference]] implementation named by the
  * `graft.ort.impl` system property — drop both on a real cluster and
  * `embedBatch` delegates; in this zero-egress build the probe is
  * false and the call fails with the activation instructions
  * (spec-asserted both ways in EmbedSpec). */
class OrtRuntime(
    probe: () => Boolean = () => OrtRuntime.onnxPresent)
    extends EmbeddingRuntime {
  override def name: String = "ort"
  override def models: Seq[String] = Seq(
    "clip/ViT-B-32-textual", "clip/ViT-B-32-visual",
    "BAAI/bge-small-en", "BAAI/bge-base-en", "BAAI/bge-large-en",
    "BAAI/bge-m3", "intfloat/e5-base-v2", "intfloat/e5-large-v2",
    "thenlper/gte-base", "thenlper/gte-large",
    "microsoft/all-MiniLM-L12-v2", "microsoft/all-mpnet-base-v2",
    "llmrails/ember-v1")
  override def dim(model: String): Int = model match {
    case m if m.contains("large") || m.contains("mpnet") || m.contains("ember") => 1024
    case m if m.contains("base") || m.contains("m3") => 768
    case _ => 384
  }

  @transient private lazy val inference: OrtInference = {
    val clsName = System.getProperty("graft.ort.impl", "")
    require(clsName.nonEmpty,
      "onnxruntime is on the classpath but no OrtInference implementation " +
        "is named: set -Dgraft.ort.impl=<class implementing " +
        "graft.embed.OrtInference>")
    Class.forName(clsName).getDeclaredConstructor()
      .newInstance().asInstanceOf[OrtInference]
  }

  override def embedBatch(model: String, texts: Seq[String]): Seq[Array[Float]] =
    if (!probe())
      throw new UnsupportedOperationException(
        "ort runtime inactive: add the onnxruntime jars to the classpath " +
          "and set -Dgraft.ort.impl to an OrtInference implementation " +
          "to activate local inference (no code change needed)")
    else inference.embed(model, texts)

  override def complete(model: String, s: String, u: String): String =
    throw new UnsupportedOperationException("ort runtime: completion not supported")
}

object OrtRuntime {
  /** Classpath probe for the ONNX runtime entry class (initialization
    * deferred: `Class.forName(..., initialize = false, ...)` so probing
    * never triggers native-library loading). */
  val entryClass = "ai.onnxruntime.OrtEnvironment"
  def onnxPresent: Boolean =
    try { Class.forName(entryClass, false, getClass.getClassLoader); true }
    catch { case _: ClassNotFoundException => false }
}

/** Runtime registry (reference get_available_runtimes /
  * get_available_models, embeddings.rs:201-225). */
object Runtimes {
  def mock(dim: Int = 8): EmbeddingRuntime = new MockRuntime(dim)

  def forName(name: String, baseUrl: String = "", apiToken: String = ""): EmbeddingRuntime =
    name match {
      case "mock" => new MockRuntime()
      case "openai" =>
        if (baseUrl.nonEmpty) new OpenAiRuntime(baseUrl, apiToken)
        else new OpenAiRuntime(apiToken = apiToken)
      case "cohere" =>
        if (baseUrl.nonEmpty) new CohereRuntime(baseUrl, apiToken)
        else new CohereRuntime(apiToken = apiToken)
      case "ort" => new OrtRuntime()
      case other => throw new IllegalArgumentException(s"unknown runtime '$other'")
    }

  def availableRuntimes: Seq[String] = Seq("mock", "openai", "cohere", "ort")

  def availableModels(runtime: String): Seq[String] = forName(runtime).models
}

/** Minimal JSON helpers (no extra deps; enough for the wire formats). */
private[graft] object Json {
  def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Extract float arrays after `"key":` fields. Handles both shapes on
    * the wire: OpenAI's one-array-per-object `"embedding": [..]` and
    * Cohere's nested `"embeddings": [[..], [..]]`. */
  def extractFloatArrays(body: String, key: String): Seq[Array[Float]] = {
    val keyPat = ("\"" + key + "\"\\s*:\\s*\\[").r
    keyPat.findAllMatchIn(body).flatMap { m =>
      // scan the balanced bracket region starting at the opening '['
      val start = m.end - 1
      var depth = 0
      var i = start
      while (i < body.length && (depth > 0 || i == start)) {
        body(i) match {
          case '[' => depth += 1
          case ']' => depth -= 1
          case _ =>
        }
        i += 1
      }
      val region = body.substring(start + 1, i - 1).trim
      if (region.startsWith("[")) {
        // nested arrays: split on "],[" boundaries
        region.stripPrefix("[").stripSuffix("]")
          .split("\\]\\s*,\\s*\\[")
          .toSeq
          .map(_.split(",").filter(_.trim.nonEmpty).map(_.trim.toFloat))
      } else if (region.isEmpty) Seq.empty
      else Seq(region.split(",").filter(_.trim.nonEmpty).map(_.trim.toFloat))
    }.toSeq
  }

  def extractString(body: String, key: String): Option[String] = {
    val pat = ("\"" + key + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
    pat.findFirstMatchIn(body).map { m =>
      // single left-to-right pass so "\\n" stays a backslash + n
      val s = m.group(1)
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        if (s(i) == '\\' && i + 1 < s.length) {
          s(i + 1) match {
            case 'n' => sb += '\n'
            case 't' => sb += '\t'
            case 'r' => sb += '\r'
            case c => sb += c // \" \\ \/ and any other escape
          }
          i += 2
        } else {
          sb += s(i)
          i += 1
        }
      }
      sb.toString
    }
  }
}

private[embed] object Http {
  def postJson(url: String, token: String, body: String): String =
    postJson(url, ("Authorization", s"Bearer $token"), body)

  def postJson(url: String, auth: (String, String), body: String): String = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(url))
      .header("Content-Type", "application/json")
      .header(auth._1, auth._2)
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() / 100 != 2)
      throw new RuntimeException(s"HTTP ${resp.statusCode()}: ${resp.body().take(500)}")
    resp.body()
  }
}

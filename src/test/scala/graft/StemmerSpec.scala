package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.text.Stemmer

/** Porter2 stemmer fixture: canonical input/output pairs from the
  * published algorithm description and sample vocabulary
  * (snowballstem.org/algorithms/english/stemmer.html) — exceptional
  * forms, per-step examples, and the test corpus vocabulary. */
class StemmerSpec extends AnyFunSuite {

  private val fixture: Seq[(String, String)] = Seq(
    // exceptional forms (spec: special stems)
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    // exceptional forms (spec: invariants)
    "sky" -> "sky", "news" -> "news", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes",
    "inning" -> "inning", "outing" -> "outing", "canning" -> "canning",
    "herring" -> "herring", "earring" -> "earring",
    "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed",
    // step 1a (spec examples)
    "ties" -> "tie", "cries" -> "cri", "dies" -> "die", "flies" -> "fli",
    "ponies" -> "poni", "caresses" -> "caress", "gaps" -> "gap",
    "gas" -> "gas", "kiwis" -> "kiwi",
    // step 1b
    "agreed" -> "agre", "hoped" -> "hope", "hoping" -> "hope",
    "hopping" -> "hop", "running" -> "run", "jumped" -> "jump",
    "knitting" -> "knit",
    // step 1c
    "luxury" -> "luxuri", "query" -> "queri",
    // steps 2-4
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "digitizer" -> "digit",
    "national" -> "nation", "feudalism" -> "feudal",
    "customer" -> "custom",
    // step 5
    "merge" -> "merg", "table" -> "tabl", "value" -> "valu",
    "line" -> "line", "small" -> "small",
    // invariant corpus words
    "join" -> "join", "hash" -> "hash", "batch" -> "batch",
    "filter" -> "filter", "order" -> "order", "vector" -> "vector",
    "stream" -> "stream", "window" -> "window", "spark" -> "spark",
    "data" -> "data", "column" -> "column", "scan" -> "scan")

  test("stem matches the published Porter2 fixture") {
    val bad = fixture.collect {
      case (in, want) if Stemmer.stem(in) != want =>
        s"$in: got ${Stemmer.stem(in)}, want $want"
    }
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("stemTokens drops the 33 stopwords post-stem") {
    assert(Stemmer.stemTokens("the quick and lazy dog").toSeq ==
      Seq("quick", "lazi", "dog"))
    // 'this' is a stopword; 'these' stems to 'these' and is dropped too
    assert(Stemmer.stemTokens("this is these tables").toSeq == Seq("tabl"))
  }
}

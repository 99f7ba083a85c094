package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graft.Bridge
import graft.plans.AnnTopK

/** Config-time wiring: `spark.sql.extensions=graft.GraftExtensions`
  * must contribute the ANN rewrite rule and the SQL function surface to
  * a session (exercised through the same SparkSessionExtensions hooks
  * session construction uses — a second live session cannot be built
  * inside the shared-session test JVM). */
class ExtensionsSpec extends SparkSpec {

  test("injects the ANN top-k optimizer rule") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    val rules = Bridge.builtOptimizerRules(ext, spark)
    assert(rules.exists(_.isInstanceOf[AnnTopK.AnnTopKRule]),
      s"expected AnnTopKRule among ${rules.map(_.getClass.getSimpleName)}")
  }

  test("injects the SQL function surface") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    Bridge.registerInjectedFunctions(ext, spark)
    val row = spark.sql(
      """SELECT l2sq_dist(array(1.0f, 2.0f), array(1.0f, 4.0f)) AS d,
        |  tokenize('Hello, World') AS t,
        |  elem_in_bloom(7, array_to_bloom(array(7L, 9L))) AS b""".stripMargin)
      .collect()(0)
    assert(row.getDouble(0) == 4.0)
    assert(row.getSeq[String](1) == Seq("hello", "world"))
    assert(row.getBoolean(2))
  }
}

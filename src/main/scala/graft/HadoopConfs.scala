package graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Driver-side Hadoop configuration resolution.
  *
  * A bare `new Configuration()` ignores every `spark.hadoop.*` setting
  * — on a store configured through the session (s3a credentials,
  * endpoints: the normal case on a real cluster) it simply cannot
  * reach the data. Driver-side filesystem work must therefore go
  * through the active session's conf; the plain fallback keeps
  * executor-side callers (where there is no session, and per-job confs
  * travel via broadcast) behaving as before. */
object HadoopConfs {
  def driver(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
}

package graft

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession

/** Driver-side Hadoop configuration resolution.
  *
  * A bare `new Configuration()` ignores every `spark.hadoop.*` setting
  * — on a store configured ONLY through the session (s3a credentials,
  * endpoints) it cannot reach the data. Driver-side filesystem work
  * therefore goes through the active session's conf (callers with a
  * session or DataFrame in hand should pass
  * `sessionState.newHadoopConf()` explicitly — this helper is for
  * call sites with neither, e.g. manifest I/O). The fallback applies
  * on executors, where bare Configuration loads the CLUSTER conf
  * (HADOOP_CONF_DIR on the executor classpath) but never session-only
  * spark.hadoop.* overrides — so store credentials needed by
  * executor-side paths (shard writes, shard/tombstone reads) must
  * live in the cluster conf, the standard deployment. */
object HadoopConfs {
  def driver(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())
}

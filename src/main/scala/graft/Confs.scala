package graft

import org.apache.spark.sql.SparkSession

/** Scoped runtime-conf override: set the given keys, run the body, then
  * restore each key to its exact prior state (unset if it was unset) —
  * shared by the demo mains and listener specs so the save/restore idiom
  * exists once. */
object Confs {
  def withValues[T](spark: SparkSession, kvs: (String, String)*)(body: => T): T = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }
}

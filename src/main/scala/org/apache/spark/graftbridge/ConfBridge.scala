package org.apache.spark.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Bridge to Spark's `private[spark]` [[SerializableConfiguration]] —
  * the standard vehicle for shipping the session's Hadoop
  * configuration (credentials, endpoints) to executor-side tasks
  * that open files directly, exactly as Spark's own data sources do. */
object ConfBridge {
  def broadcast(sc: SparkContext,
      conf: Configuration): Broadcast[SerializableConfiguration] =
    sc.broadcast(new SerializableConfiguration(conf))

  def value(b: Broadcast[SerializableConfiguration]): Configuration =
    b.value.value
}

package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Kafka producer-sink payload shaping (S11, `kafka_publisher.py:
  * 226-241`): key = first present of the id-precedence list, value =
  * the whole record as JSON. The actual send is
  * `.write.format("kafka").option("kafka.bootstrap.servers", ...)` on
  * a cluster with the connector jar — everything testable without a
  * broker (the payload projection) lives here.
  */
object KafkaIO {

  /** Key precedence (`kafka_publisher.py:70-74` id fields). */
  val KeyPrecedence: Seq[String] = Seq("id", "_id", "post_id", "unique_key", "event_id", "doc_id")

  def toKafkaPayload(df: DataFrame): DataFrame = {
    val present = KeyPrecedence.filter(df.columns.contains)
    val key =
      if (present.isEmpty) lit(null).cast("string")
      else coalesce(present.map(c => col(c).cast("string")): _*)
    df.select(
      key.as("key"),
      to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))
  }
}

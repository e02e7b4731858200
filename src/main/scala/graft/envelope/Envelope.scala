package graft.envelope

import org.apache.spark.sql.types._

/** Data model of the CloudWatch-Logs-over-Firehose pipeline.
  *
  * The envelope shape is documented in the reference at
  * `lambda/main.py:5-28` (CWL subscription envelope, gzip-compressed on
  * the wire per `lambda/main.py:30`); the Firehose<->transform record
  * framing is `lambda/main.py:74-98`.
  */
object Envelope {

  /** One CloudWatch log event (`lambda/main.py:15-27`). */
  val LOG_EVENT_SCHEMA: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("timestamp", LongType), // epoch millis, NOT a timestamp type
    StructField("message", StringType)
  ))

  /** The CWL subscription envelope (`lambda/main.py:5-28`). */
  val ENVELOPE_SCHEMA: StructType = StructType(Seq(
    StructField("messageType", StringType),
    StructField("owner", StringType),
    StructField("logGroup", StringType),
    StructField("logStream", StringType),
    StructField("subscriptionFilters", ArrayType(StringType)),
    StructField("logEvents", ArrayType(LOG_EVENT_SCHEMA))
  ))

  /** Firehose -> transform input framing (`lambda/main.py:74-76`):
    * data is base64(gzip(envelope JSON bytes)).
    */
  val RECORD_SCHEMA: StructType = StructType(Seq(
    StructField("recordId", StringType),
    StructField("data", StringType)
  ))

  /** Transform result statuses (`lambda/main.py:80-98`). */
  object Result {
    val Ok = "Ok"
    val Dropped = "Dropped"
    val ProcessingFailed = "ProcessingFailed"
  }
}

/** Typed boundary representations (SURVEY.md §1.4). Internal operators
  * stay in untyped DataFrames so Catalyst can optimize freely.
  */
case class LogEvent(id: String, timestamp: Long, message: String)

case class CwlEnvelope(
    messageType: String,
    owner: String,
    logGroup: String,
    logStream: String,
    subscriptionFilters: Seq[String],
    logEvents: Seq[LogEvent])

case class FirehoseRecord(recordId: String, data: String)

case class TransformedRecord(recordId: String, result: String, data: Option[String])

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import graft.expressions.{AvroDecodePlc, AvroEncodePlc}

/** Column API over the Confluent-framed Avro PLCData codec
  * ([[graft.expressions.AvroPlcCodec]]) — the reference's wire format
  * (R3 serialize / R6 deserialize, SURVEY.md §2.1).
  */
object Wire {

  /** Serialize the 4 PLCData fields to Confluent-framed Avro binary. */
  def avroEncodePlc(machineId: Column, sensor: Column,
      reading: Column, tStamp: Column, schemaId: Int = 1): Column =
    GraftBridge.column(AvroEncodePlc(
      GraftBridge.expression(machineId), GraftBridge.expression(sensor),
      GraftBridge.expression(reading), GraftBridge.expression(tStamp),
      schemaId))

  /** Deserialize Confluent-framed Avro binary to the PLCData struct;
    * NULL for malformed buffers. */
  def avroDecodePlc(bytes: Column): Column =
    GraftBridge.column(AvroDecodePlc(GraftBridge.expression(bytes)))
}

package graft.model

import org.apache.spark.sql.{DataFrame, Dataset}

/** The reference's wire record as a typed row
  * (`/root/reference/schema/schema.avsc:5-10`): machine key, sensor key,
  * measurement, epoch-seconds-as-double timestamp. The typed `Dataset`
  * surface is offered at the ingest boundary (SURVEY.md §1.3); engine
  * internals stay on untyped `DataFrame` so Catalyst sees through every
  * expression.
  */
final case class PlcReading(
    machine_id: String,
    sensor: String,
    reading: Double,
    t_stamp: Double)

object PlcReading {
  /** Typed view over any readings-shaped DataFrame. */
  def ds(readings: DataFrame): Dataset[PlcReading] = {
    val spark = readings.sparkSession
    import spark.implicits._
    readings.as[PlcReading]
  }
}

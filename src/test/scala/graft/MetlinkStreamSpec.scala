package graft

import java.nio.file.Files

import graft.operators.Metlink
import graft.streaming.StreamOps

/** E1 streaming parity: the reference is invoked on a schedule, one
  * snapshot per run (task.ts:121-122). The engine twin: each fetched
  * snapshot dropped as a file, a Structured Stream runs the full
  * Metlink pipeline per micro-batch via foreachBatch — cross-batch
  * the dedup is per-snapshot, exactly like the reference's
  * per-invocation Map state.
  */
class MetlinkStreamSpec extends SparkSpec {

  private def snapshot(entId: String, vehId: String, tripId: String,
      ts: Long): String =
    s"""{"header": {"v": "2.0"}, "entity": [
      {"id": "$entId", "vehicle": {"trip": {"trip_id": "$tripId"},
       "position": {"latitude": -41.3, "longitude": 174.8,
       "bearing": 10.0, "speed": 3.5}, "timestamp": $ts,
       "vehicle": {"id": "$vehId"}}}]}"""
      .replaceAll("\n\\s*", " ") // file source is line-delimited JSON

  test("file-drop stream runs the pipeline per micro-batch") {
    val inDir = Files.createTempDirectory("metlink-in").toString
    val collected =
      scala.collection.mutable.ArrayBuffer[(String, String)]()

    val stream = StreamOps.readJsonStream(spark, inDir,
      Metlink.vehicleSchema)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          id: Long) =>
        val feats = Metlink.pipeline(batch)
          .select("id", "properties.callsign")
          .collect()
        collected.synchronized {
          collected ++= feats.map(r => (r.getString(0), r.getString(1)))
        }
        ()
      }
      .start()

    Files.writeString(
      java.nio.file.Path.of(inDir, "snap1.json"),
      snapshot("e1", "b7", "23__0__x", 1700000000L))
    q.processAllAvailable()
    Files.writeString(
      java.nio.file.Path.of(inDir, "snap2.json"),
      snapshot("e2", "t3", "HVL__9", 1700000060L))
    q.processAllAvailable()
    q.stop()

    val byId = collected.synchronized(collected.toMap)
    assert(byId("WLG-MetlinkBus-b7") == "Route 23 - Bus b7")
    assert(byId("WLG-MetlinkTrain-t3") == "Route HVL - Train t3")
  }
}

package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.MultimodalOps
import org.apache.spark.sql.functions._

/** Multimodal-column queries: binary payload feature extraction and
  * frame sampling (decode is a documented deterministic stub — the
  * Spark plumbing is the tested surface). Rows-only driver checks;
  * determinism and schema are covered in MultimodalOpsSpec.
  */
object MultimodalQueries {

  val q_media_features = QueryDef.noOracle("q_media_features") { (spark, dir) =>
    MultimodalOps.extractFeatures(
      MultimodalOps.mediaFromDocuments(Tables.documents(spark, dir)))
      .toDF()
      .orderBy(col("media_id"))
  }

  val q_media_frames = QueryDef.noOracle("q_media_frames") { (spark, dir) =>
    MultimodalOps.sampleFrames(
      MultimodalOps.mediaFromDocuments(Tables.documents(spark, dir)),
      frames = 8, stride = 2)
      .select(col("media_id"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_len"))
      .orderBy(col("media_id"), col("frame_idx"))
  }

  val all: Seq[QueryDef] = Seq(q_media_features, q_media_frames)
}

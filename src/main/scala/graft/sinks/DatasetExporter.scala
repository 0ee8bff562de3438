package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The training-corpus export sink: writes a curated/packed dataset as
  * a reproducible, bounded-shard parquet layout — the last hop of the
  * pipe_curate → pipe_pack pipeline, and the artifact a trainer's data
  * loader actually reads.
  *
  * Layout contract:
  *  - directory-partitioned by a low-cardinality column (lang/split),
  *    so a loader prunes whole subtrees by path;
  *  - each partition's data is written by tasks that own the WHOLE
  *    partition value (`repartition(partitionCol)` first) — without
  *    this, every one of N tasks writes a sliver of every partition
  *    value and the layout degenerates into N × |values| small files,
  *    the classic partitionBy mistake at scale;
  *  - rows sorted by `orderCols` within each task
  *    (`sortWithinPartitions`), so a curriculum order survives into
  *    file order and range-friendly columns compress well;
  *  - `maxRecordsPerFile` caps shard size, so one giant language
  *    can't produce a single unsplittable multi-GB file.
  *
  * Scale shape: one hash shuffle on the partition column (the same
  * shuffle any partitioned write needs), sort is per-task (spillable),
  * no driver-side staging. Skew knob: `tasksPerPartitionValue > 1`
  * salts the repartition so one hot language spreads over several
  * writer tasks (each still writing only that language's directory).
  */
object DatasetExporter {

  def export(
      df: DataFrame,
      outDir: String,
      partitionCol: String,
      orderCols: Seq[String],
      maxRecordsPerFile: Long,
      tasksPerPartitionValue: Int = 1): Unit = {
    val routed =
      if (tasksPerPartitionValue <= 1) df.repartition(col(partitionCol))
      else df.repartition(col(partitionCol),
        // deterministic content-derived salt (stage-retry-safe, same
        // discipline as Partitioning.saltedJoin)
        pmod(hash(df.columns.map(col): _*), lit(tasksPerPartitionValue)))
    routed
      .sortWithinPartitions(partitionCol +: orderCols map col: _*)
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(outDir)
  }
}

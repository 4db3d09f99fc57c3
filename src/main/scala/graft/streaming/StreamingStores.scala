package graft.streaming

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Store-probing helpers shared by the streaming index families' delete
  * verbs. The probes go through the Hadoop FileSystem the session
  * resolves for the path — never a driver-local java.io walk (round-17
  * ADVICE: java.io.File on an HDFS/S3 store always reports "no
  * tombstones", silently degrading delete-compaction to a pure layout
  * rewrite that drops nothing). */
object StreamingStores {

  /** True iff `dir` holds at least one parquet DATA file, skipping
    * underscore-prefixed metadata/checkpoint children (a takedown stream
    * creates `<dir>/_checkpoint` at start, before any batch lands). */
  def hasDataFiles(s: SparkSession, dir: String): Boolean = {
    val root = new Path(dir)
    val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
    def walk(p: Path): Boolean = {
      val kids: Array[FileStatus] =
        try fs.listStatus(p) catch { case _: java.io.FileNotFoundException => Array.empty }
      kids.exists { st =>
        if (st.isDirectory) !st.getPath.getName.startsWith("_") && walk(st.getPath)
        else st.getPath.getName.endsWith(".parquet")
      }
    }
    fs.exists(root) && fs.getFileStatus(root).isDirectory && walk(root)
  }

  /** Read a tombstone directory projected to `empty`'s columns, or
    * `empty` itself when no data file has landed yet — so a SCHEDULED
    * compactor firing before the first takedown is a pure layout
    * rewrite, not a crash. */
  def readTombstones(s: SparkSession, dir: String, empty: DataFrame): DataFrame =
    if (hasDataFiles(s, dir))
      s.read.parquet(dir).select(empty.columns.map(col(_)).toSeq: _*)
    else empty
}

package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * local[32] here, but every knob is chosen to survive a real cluster:
  * AQE on (runtime shuffle coalescing, skew-join splitting), shuffle
  * partitions sized to the local core count (on a cluster this would be
  * 2-3x total cores), UTC everywhere for oracle parity.
  */
object GraftSession {
  def builder(cores: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions) // native fns: normalize_text, vec_dot
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Spark 4.1's ChecksumCheckpointFileManager (the streaming-
      // checkpoint integrity layer) stays ON here: GraftSession is the
      // production entry point, and with the raw file:// AFS below the
      // Hadoop .crc sidecars are gone, so this layer is the ONE
      // checkpoint corruption check — for every scheme (ADVICE r13:
      // never default both layers off in the same session). The local
      // measurement drivers (Bench/Verify/JobProfile) disable it via
      // the same env key — their checkpoints are transient tmp-dir
      // coordination state, and correctness (Verify) runs under the
      // identical confs the bench times.
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_CHECKSUM", "true"))
      // Streaming checkpoints go through FileContext, and the file://
      // AbstractFileSystem defaults to ChecksumFs — every state-store
      // delta and offset/commit log entry writes a .crc SIDECAR next to
      // it and renames both (thread dumps: renameTempFile is where the
      // post-checksum-fix stateful tasks still park). With the Spark-
      // layer checksum above as the integrity check, the Hadoop sidecar
      // is a redundant SECOND layer — dropping it halves the small-file
      // count in the hottest rename path (t3_stream_join_outer
      // 10.3 → 8.1 s). The key is scheme-scoped: it touches file://
      // only, so cluster deployments checkpointing to hdfs:///s3a://
      // are unaffected by construction. Data-path writes (TableStore,
      // outputs) use the FileSystem API and keep their CRC sidecars.
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        sys.env.getOrElse("SPARK_GRAFT_CKPT_FC",
          "org.apache.hadoop.fs.local.RawLocalFs"))

  def get(cores: Int = 32): SparkSession = {
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

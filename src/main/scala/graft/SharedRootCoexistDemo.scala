package graft

import java.io.File

import org.apache.spark.sql.SparkSession

/** Multi-application safety proof for the shared-dir shuffle: TWO Spark
  * applications point at the SAME `spark.shuffle.graft.root`
  * concurrently. Each app's files live under `<root>/<appId>/`, so both
  * use shuffleId 0 without colliding, `unregisterShuffle` cannot cross
  * the namespace, and `cleanupApplication` removes only the caller's
  * subtree (reference analogue: SplitServe scopes its HDFS shuffle dirs
  * by application, `core/.../shuffle/HDFSShuffleBlockResolver.scala:38`).
  *
  * Run as one JVM per app: `SharedRootCoexistDemo <root> <tag> <otherTag>
  * <role:first|second>`; the two JVMs rendezvous through marker files in
  * `<root>-sync`. `first` stops (and cleans) while `second` is still
  * alive; `second` then proves its own files survived the other app's
  * cleanup before stopping itself.
  */
object SharedRootCoexistDemo {

  private def await(f: File, ms: Int = 120000): Unit = {
    var waited = 0
    while (!f.exists() && waited < ms) { Thread.sleep(100); waited += 100 }
    if (!f.exists()) throw new IllegalStateException(s"timeout waiting for $f")
  }

  def main(args: Array[String]): Unit = {
    val Array(root, tag, otherTag, role) = args.take(4)
    val sync = new File(s"$root-sync"); sync.mkdirs()
    def mark(name: String): Unit =
      new File(sync, s"$tag.$name").createNewFile()

    val spark = SparkSession.builder()
      .master("local[2]")
      .appName(s"graft-coexist-$tag")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.manager",
        "org.apache.spark.shuffle.graft.SharedDirShuffleManager")
      .config("spark.shuffle.sort.io.plugin.class",
        "org.apache.spark.shuffle.graft.SharedDirShuffleDataIO")
      .config("spark.shuffle.graft.root", root)
      .config("spark.local.dir", s"$root-localdirs-$tag")
      .getOrCreate()
    val sc = spark.sparkContext
    sc.setLogLevel("WARN")

    try {
      val pairs = sc.parallelize(1 to 100000, 4).map(i => (i % 500, i.toLong))
      val combined = pairs.reduceByKey(_ + _) // both apps produce shuffle 0
      val checksum = combined.collect()
        .map { case (k, v) => k * 31L + v }.sum
      println(s"COEX_PHASE1_OK tag=$tag checksum=$checksum")

      val ownDir = new File(root,
        sc.applicationId.replaceAll("[^A-Za-z0-9._-]", "_"))
      def appDirsWithShuffles: Array[File] =
        Option(new File(root).listFiles()).getOrElse(Array.empty)
          .filter(a => Option(a.listFiles()).getOrElse(Array.empty)
            .exists(_.getName.startsWith("shuffle_")))

      mark("ready"); await(new File(sync, s"$otherTag.ready"))
      // both apps live: two disjoint namespaces, each holding shuffle 0
      println(s"COEXIST_OK appDirs=${appDirsWithShuffles.length} " +
        s"ownAlive=${ownDir.isDirectory}")
      mark("checked"); await(new File(sync, s"$otherTag.checked"))

      if (role == "second") {
        await(new File(sync, s"$otherTag.stopped"))
        // the other app's cleanupApplication ran; ours must be untouched —
        // and the shuffle must still be READABLE, not just present
        val recheck = combined.collect()
          .map { case (k, v) => k * 31L + v }.sum
        println(s"SURVIVED_OK ownAlive=${ownDir.isDirectory} " +
          s"dirs=${appDirsWithShuffles.length} reread=${recheck == checksum}")
      }
    } finally {
      spark.stop() // cleanupApplication: removes ONLY this app's subtree
      mark("stopped")
    }
    if (role == "second") {
      // both apps cleaned up after themselves: nothing left under root
      val left = Option(new File(root).listFiles()).getOrElse(Array.empty)
      println(s"CLEANUP_OK rootEmpty=${left.isEmpty} left=${left.length}")
    }
  }
}

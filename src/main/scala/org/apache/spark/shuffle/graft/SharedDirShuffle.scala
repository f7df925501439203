package org.apache.spark.shuffle.graft

import java.io.{BufferedOutputStream, DataOutputStream, File, FileInputStream, FileOutputStream, IOException, InputStream, OutputStream, RandomAccessFile}
import java.nio.file.{Files, StandardCopyOption}
import java.util.{Collections, Optional}

import org.apache.spark.{Aggregator, InterruptibleIterator, SparkConf, SparkEnv, TaskContext}
import org.apache.spark.shuffle._
import org.apache.spark.shuffle.api._
import org.apache.spark.shuffle.api.metadata.MapOutputCommitMessage
import org.apache.spark.shuffle.sort.SortShuffleManager
import org.apache.spark.storage.{BlockManagerId, ShuffleBlockId}
import org.apache.spark.util.collection.ExternalSorter

/** Disaggregated shuffle storage: map output lives in a SHARED directory
  * root (`spark.shuffle.graft.root`) instead of executor-local disk, and
  * reducers read it back from that root directly — never from the
  * writing executor's block manager. This is the faithful modernization
  * of the reference's HDFS shuffle layer (SplitServe's core delta:
  * `core/.../shuffle/HDFSShuffleBlockResolver.scala:38`,
  * `storage/HDFSBlockObjectWriter.scala:30`, gated by
  * `spark.shuffle.hdfs.enabled`) — there, Lambda executors cannot serve
  * blocks peer-to-peer, so map output must survive in shared storage and
  * outlive the executor that wrote it. Here the "shared filesystem" is
  * any mounted path (NFS/FUSE-over-object-store at cluster scale; a temp
  * dir in tests); the storage contract is identical.
  *
  * Because `SharedDirDriverComponents.supportsReliableStorage()` is true,
  * the DAGScheduler does NOT invalidate a lost executor's map outputs
  * (`DAGScheduler.handleExecutorLost` consults exactly this flag), so a
  * completed shuffle is never recomputed when executors are released —
  * SplitServe's no-recompute-on-Lambda-release property. The same flag
  * legalizes dynamic allocation WITHOUT an external shuffle service
  * (`ExecutorAllocationManager.validateSettings`), which is how the
  * elastic half of SplitServe runs on stock Spark (ElasticExecutorDemo).
  *
  * Wiring (both confs, plus the root):
  *   spark.shuffle.manager=org.apache.spark.shuffle.graft.SharedDirShuffleManager
  *   spark.shuffle.sort.io.plugin.class=org.apache.spark.shuffle.graft.SharedDirShuffleDataIO
  *   spark.shuffle.graft.root=/mnt/shared/shuffle
  *
  * Layout: `<root>/<appId>/shuffle_<shuffleId>/<mapTaskId>.data` +
  * `.index` (index = numPartitions+1 cumulative offsets, same format as
  * Spark's IndexShuffleBlockResolver) + `.checksum` (one long per reduce
  * partition, present iff `spark.shuffle.checksum.enabled`; algorithm is
  * whatever `spark.shuffle.checksum.algorithm` selects — persisted for
  * offline corruption audits, not re-verified inline on read).
  * `mapTaskId` is the task ATTEMPT id — unique per attempt — so
  * concurrent speculative attempts never collide on a file name; the
  * driver's MapStatus commits exactly one attempt and readers resolve
  * files by that committed id. Writes land in `.tmp` names and are
  * atomically renamed (data, then checksum, then index) at commit.
  *
  * The `<appId>` level keeps MULTIPLE applications safe on one shared
  * root: `unregisterShuffle` and `cleanupApplication` only ever touch the
  * calling app's subtree, so two apps both using shuffle 0 neither
  * collide nor cross-delete. The id is read lazily from `spark.app.id`
  * (executors additionally receive it as `initializeExecutor`'s appId
  * parameter) — lazily because the ShuffleManager is constructed before
  * the scheduler assigns the id, but every shuffle file operation
  * happens well after.
  *
  * Failure semantics on the read side: a missing or unreadable
  * shared-root file surfaces as `FetchFailedException` carrying the
  * block's tracker-listed BlockManagerId — the DAGScheduler then
  * unregisters that map output and regenerates it, the same recovery
  * contract as vanilla Spark's network fetch path (and the reference's
  * HDFS reader). Without the wrapping, an NFS hiccup or external cleanup
  * would abort the job after task retries instead of recomputing one map.
  *
  * The package placement (`org.apache.spark.shuffle.graft`) follows the
  * convention of external shuffle managers (Celeborn, Uber RSS): the
  * ShuffleManager SPI hands out `private[spark]` types (BaseShuffleHandle,
  * MapOutputTracker block listings), so implementations live inside the
  * `org.apache.spark` namespace.
  */
final class SharedDirShuffleDataIO(conf: SparkConf) extends ShuffleDataIO {
  override def driver(): ShuffleDriverComponents =
    new SharedDirDriverComponents(conf)
  override def executor(): ShuffleExecutorComponents =
    new SharedDirExecutorComponents(conf)
}

final class SharedDirDriverComponents(conf: SparkConf)
    extends ShuffleDriverComponents {
  override def initializeApplication(): java.util.Map[String, String] =
    Collections.emptyMap()
  /** Remove THIS app's subtree only — other applications sharing the
    * root are untouchable by construction (their files live under their
    * own appId dir). */
  override def cleanupApplication(): Unit = {
    def nuke(f: File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(nuke))
      f.delete()
    }
    nuke(SharedDirShuffle.appRoot(conf))
  }
  /** Map output survives the executor that wrote it — the whole point. */
  override def supportsReliableStorage(): Boolean = true
}

object SharedDirShuffle {
  val RootConfKey = "spark.shuffle.graft.root"
  def root(conf: SparkConf): File = {
    val r = conf.getOption(RootConfKey).getOrElse(throw new IOException(
      s"$RootConfKey must point at a directory shared by all executors"))
    new File(r)
  }
  /** This application's namespace under the shared root. Lazily resolved:
    * spark.app.id is assigned by the scheduler after the ShuffleManager
    * is constructed, but before any shuffle file is written or read. */
  def appRoot(conf: SparkConf): File = {
    val appId = conf.getOption("spark.app.id").getOrElse(throw new IOException(
      "spark.app.id unset — shuffle file access before scheduler init?"))
    new File(root(conf), appId.replaceAll("[^A-Za-z0-9._-]", "_"))
  }
  def shuffleDir(appRoot: File, shuffleId: Int): File =
    new File(appRoot, s"shuffle_$shuffleId")
  def dataFile(appRoot: File, shuffleId: Int, mapId: Long): File =
    new File(shuffleDir(appRoot, shuffleId), s"$mapId.data")
  def indexFile(appRoot: File, shuffleId: Int, mapId: Long): File =
    new File(shuffleDir(appRoot, shuffleId), s"$mapId.index")
  def checksumFile(appRoot: File, shuffleId: Int, mapId: Long): File =
    new File(shuffleDir(appRoot, shuffleId), s"$mapId.checksum")
}

/** Offline integrity audit over the persisted per-partition checksums:
  * recomputes each committed data segment's checksum (the writer chain
  * checksums the raw bytes as they land in the file, so a segment's
  * checksum is recomputable from `[offset_i, offset_i+1)`) and compares
  * with the `.checksum` longs. This is what makes shared-storage
  * corruption AUDITABLE without a job: run it against an app dir after
  * an NFS incident, get the exact (map, partition) segments to
  * invalidate. Algorithm must match `spark.shuffle.checksum.algorithm`
  * (ADLER32 default, CRC32/CRC32C accepted). */
object SharedDirShuffleAudit {
  def verify(appDir: File,
      algorithm: String = "ADLER32"): (Int, Seq[String]) = {
    def longsOf(f: File): Array[Long] = {
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(new FileInputStream(f)))
      try Iterator.continually(
        try Some(in.readLong()) catch { case _: java.io.EOFException => None })
        .takeWhile(_.isDefined).flatten.toArray
      finally in.close()
    }
    def checksum(): java.util.zip.Checksum = algorithm.toUpperCase match {
      case "ADLER32" => new java.util.zip.Adler32
      case "CRC32"   => new java.util.zip.CRC32
      case "CRC32C"  => new java.util.zip.CRC32C
      case a => throw new IllegalArgumentException(s"unknown algorithm $a")
    }
    var segments = 0
    val corrupt = scala.collection.mutable.ArrayBuffer[String]()
    val shuffleDirs = Option(appDir.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("shuffle_"))
    for {
      d <- shuffleDirs
      ck <- Option(d.listFiles()).getOrElse(Array.empty)
      if ck.getName.endsWith(".checksum")
    } {
      val mapId = ck.getName.stripSuffix(".checksum")
      val index = new File(d, s"$mapId.index")
      val data = new File(d, s"$mapId.data")
      if (index.isFile && data.isFile) { // committed outputs only
        val offsets = longsOf(index)
        val expected = longsOf(ck)
        val in = new java.io.BufferedInputStream(new FileInputStream(data))
        try {
          val buf = new Array[Byte](64 * 1024)
          for (i <- expected.indices) {
            val c = checksum()
            var remaining = offsets(i + 1) - offsets(i)
            while (remaining > 0) {
              val n = in.read(buf, 0, math.min(buf.length, remaining).toInt)
              if (n < 0) throw new IOException(s"$data truncated at seg $i")
              c.update(buf, 0, n)
              remaining -= n
            }
            segments += 1
            if (c.getValue != expected(i))
              corrupt += s"${d.getName}/$mapId.data[$i]"
          }
        } finally in.close()
      }
    }
    (segments, corrupt.toSeq)
  }
}

final class SharedDirExecutorComponents(conf: SparkConf)
    extends ShuffleExecutorComponents {
  private var appRoot: File = _

  override def initializeExecutor(appId: String, execId: String,
      extraConfigs: java.util.Map[String, String]): Unit = {
    appRoot = new File(SharedDirShuffle.root(conf),
      appId.replaceAll("[^A-Za-z0-9._-]", "_"))
    if (!appRoot.isDirectory && !appRoot.mkdirs() && !appRoot.isDirectory)
      throw new IOException(s"cannot create shared shuffle app dir $appRoot")
  }

  override def createMapOutputWriter(shuffleId: Int, mapTaskId: Long,
      numPartitions: Int): ShuffleMapOutputWriter =
    new SharedDirMapOutputWriter(appRoot, shuffleId, mapTaskId, numPartitions)

  // No single-spill fast path: the generic writer covers every path.
  override def createSingleFileMapOutputWriter(shuffleId: Int,
      mapId: Long): Optional[SingleSpillShuffleMapOutputWriter] =
    Optional.empty()
}

/** One map task's output: all reduce partitions appended to a single
  * shared-dir data file (written once, sequentially — object-store
  * friendly), offsets recorded in the companion index file at commit. */
final class SharedDirMapOutputWriter(appRoot: File, shuffleId: Int,
    mapId: Long, numPartitions: Int) extends ShuffleMapOutputWriter {

  private val dir = SharedDirShuffle.shuffleDir(appRoot, shuffleId)
  if (!dir.isDirectory && !dir.mkdirs() && !dir.isDirectory)
    throw new IOException(s"cannot create $dir")
  private val tmpData = new File(dir, s"$mapId.data.tmp")
  private val tmpIndex = new File(dir, s"$mapId.index.tmp")
  private val tmpChecksum = new File(dir, s"$mapId.checksum.tmp")
  private val lengths = new Array[Long](numPartitions)
  private var out: OutputStream = _
  private var lastPartition = -1

  private def ensureOut(): OutputStream = {
    if (out == null)
      out = new BufferedOutputStream(new FileOutputStream(tmpData), 32 * 1024)
    out
  }

  override def getPartitionWriter(reducePartitionId: Int): ShufflePartitionWriter = {
    require(reducePartitionId > lastPartition,
      s"partitions must be opened in order: $reducePartitionId after $lastPartition")
    lastPartition = reducePartitionId
    new ShufflePartitionWriter {
      private var written = 0L
      override def openStream(): OutputStream = new OutputStream {
        private val o = ensureOut()
        override def write(b: Int): Unit = { o.write(b); written += 1 }
        override def write(b: Array[Byte], off: Int, len: Int): Unit = {
          o.write(b, off, len); written += len
        }
        override def flush(): Unit = o.flush()
        override def close(): Unit = { // partition end, not file end
          o.flush()
          lengths(reducePartitionId) = written
        }
      }
      override def getNumBytesWritten: Long = written
    }
  }

  override def commitAllPartitions(checksums: Array[Long]): MapOutputCommitMessage = {
    if (out != null) { out.flush(); out.close() } else tmpData.createNewFile()
    val idx = new DataOutputStream(
      new BufferedOutputStream(new FileOutputStream(tmpIndex)))
    try {
      var offset = 0L
      idx.writeLong(offset)
      lengths.foreach { l => offset += l; idx.writeLong(offset) }
    } finally idx.close()
    // spark.shuffle.checksum.enabled hands one checksum per partition;
    // persist them next to the index so shared-storage corruption is
    // auditable (same information LocalDiskShuffleMapOutputWriter keeps).
    if (checksums.nonEmpty) {
      val ck = new DataOutputStream(
        new BufferedOutputStream(new FileOutputStream(tmpChecksum)))
      try checksums.foreach(ck.writeLong) finally ck.close()
    }
    // Atomic publish, data (and checksums) before index: a reader only
    // trusts files it can resolve through a fully-renamed index.
    Files.move(tmpData.toPath,
      SharedDirShuffle.dataFile(appRoot, shuffleId, mapId).toPath,
      StandardCopyOption.ATOMIC_MOVE)
    if (checksums.nonEmpty)
      Files.move(tmpChecksum.toPath,
        SharedDirShuffle.checksumFile(appRoot, shuffleId, mapId).toPath,
        StandardCopyOption.ATOMIC_MOVE)
    Files.move(tmpIndex.toPath,
      SharedDirShuffle.indexFile(appRoot, shuffleId, mapId).toPath,
      StandardCopyOption.ATOMIC_MOVE)
    MapOutputCommitMessage.of(lengths)
  }

  override def abort(error: Throwable): Unit = {
    if (out != null) out.close()
    tmpData.delete(); tmpIndex.delete(); tmpChecksum.delete()
  }
}

/** Delegates registration/writing to the stock SortShuffleManager (whose
  * writers stream bytes through the SharedDirShuffleDataIO plugin above)
  * and replaces the READ path: blocks are opened straight from the shared
  * root by (shuffleId, mapId, reduceId) — the committed block list still
  * comes from the MapOutputTracker, but the writing executor's location
  * in it is ignored, exactly as the reference's HDFS reader ignores the
  * (possibly released) Lambda that produced a block. */
final class SharedDirShuffleManager(conf: SparkConf, isDriver: Boolean)
    extends ShuffleManager {
  def this(conf: SparkConf) = this(conf, false)

  // Fail fast on a half-wired deployment: the manager's read path only
  // works against files the companion DataIO plugin wrote. Without this
  // check, a missing plugin conf surfaces as FileNotFoundException deep
  // inside the first reduce task instead of at startup.
  {
    val plugin = conf.get("spark.shuffle.sort.io.plugin.class", "")
    require(plugin == classOf[SharedDirShuffleDataIO].getName,
      s"${getClass.getName} requires spark.shuffle.sort.io.plugin.class=" +
        s"${classOf[SharedDirShuffleDataIO].getName} (found '$plugin') — " +
        "reads resolve only blocks that plugin wrote to the shared root")
    SharedDirShuffle.root(conf) // throws with a clear message if unset
  }

  private val delegate = new SortShuffleManager(conf)
  // lazy: spark.app.id is assigned after manager construction
  private lazy val appRoot = SharedDirShuffle.appRoot(conf)

  override def registerShuffle[K, V, C](shuffleId: Int,
      dependency: org.apache.spark.ShuffleDependency[K, V, C]): ShuffleHandle =
    delegate.registerShuffle(shuffleId, dependency)

  override def getWriter[K, V](handle: ShuffleHandle, mapId: Long,
      context: TaskContext,
      metrics: ShuffleWriteMetricsReporter): ShuffleWriter[K, V] =
    delegate.getWriter(handle, mapId, context, metrics)

  override def getReader[K, C](handle: ShuffleHandle,
      startMapIndex: Int, endMapIndex: Int,
      startPartition: Int, endPartition: Int, context: TaskContext,
      metrics: ShuffleReadMetricsReporter): ShuffleReader[K, C] =
    new SharedDirShuffleReader(appRoot,
      handle.asInstanceOf[BaseShuffleHandle[K, _, C]],
      startMapIndex, endMapIndex, startPartition, endPartition,
      context, metrics)

  override def unregisterShuffle(shuffleId: Int): Boolean = {
    delegate.unregisterShuffle(shuffleId)
    // scoped to THIS app's namespace — never another app's shuffle 0
    val d = SharedDirShuffle.shuffleDir(appRoot, shuffleId)
    // driver and executors may race on the same shared dir: listFiles is
    // null if another process already removed it
    Option(d.listFiles()).foreach(_.foreach(_.delete()))
    d.delete()
    true
  }

  override def shuffleBlockResolver: ShuffleBlockResolver =
    delegate.shuffleBlockResolver

  override def stop(): Unit = delegate.stop()
}

/** Reduce-side reader over shared-dir block files. Mirrors
  * BlockStoreShuffleReader's record semantics (wrapStream decompression,
  * aggregator combine, keyOrdering spill-sort) minus the network fetch:
  * every block is a (seek, bounded read) against the shared root.
  * Shared-root traffic is remote storage, not executor-local disk, so it
  * reports through the REMOTE read metrics. I/O failures become
  * FetchFailedException so the DAGScheduler regenerates the map output. */
final class SharedDirShuffleReader[K, C](appRoot: File,
    handle: BaseShuffleHandle[K, _, C],
    startMapIndex: Int, endMapIndex: Int,
    startPartition: Int, endPartition: Int,
    context: TaskContext,
    readMetrics: ShuffleReadMetricsReporter) extends ShuffleReader[K, C] {

  private val dep = handle.dependency

  // The segment currently being consumed. Normal exhaustion closes it via
  // the deserializer's EOF handling; early termination (limit/take, task
  // failure) would otherwise leak the FD for the executor's lifetime, so
  // the task-completion hook closes whatever is still open — the same
  // cleanup contract BlockStoreShuffleReader gets from
  // ShuffleBlockFetcherIterator's task-completion listener.
  @volatile private var openSegment: InputStream = _
  context.addTaskCompletionListener[Unit] { _ =>
    val s = openSegment
    if (s != null) try s.close() catch { case _: IOException => }
    // temp shuffle-read metrics only reach TaskMetrics when a reader
    // merges them (BlockStoreShuffleReader does it in its completion
    // iterator; the only other caller is the 10 s heartbeat) — without
    // this, every sub-heartbeat task reports ZERO shuffle read
    context.taskMetrics().mergeShuffleReadMetrics()
  }

  /** A lost/truncated shared-root file is a fetch failure, not a task
    * error: rethrown as FetchFailedException (with the tracker-listed
    * writer address) the scheduler unregisters exactly this map output
    * and resubmits its map task — vanilla Spark's recovery contract. */
  private def fetchFailed(address: BlockManagerId, sb: ShuffleBlockId,
      mapIndex: Int, e: IOException): Nothing =
    throw new FetchFailedException(address, sb.shuffleId, sb.mapId,
      mapIndex, sb.reduceId, s"shared-root read failed for $sb", e)

  private def segment(address: BlockManagerId, sb: ShuffleBlockId,
      mapIndex: Int): InputStream = {
    val (start, end) =
      try {
        // single seek straight to the two offsets — no skip loop, and no
        // O(numPartitions) read: on NFS/object-store mounts the index
        // lookup cost per (map, reduce) pair is one open + one seek
        val raf = new RandomAccessFile(
          SharedDirShuffle.indexFile(appRoot, sb.shuffleId, sb.mapId), "r")
        try {
          raf.seek(sb.reduceId.toLong * 8)
          (raf.readLong(), raf.readLong())
        } finally raf.close()
      } catch { case e: IOException => fetchFailed(address, sb, mapIndex, e) }
    val in =
      try {
        val f = new FileInputStream(
          SharedDirShuffle.dataFile(appRoot, sb.shuffleId, sb.mapId))
        var skipped = 0L
        while (skipped < start) {
          val n = f.skip(start - skipped)
          if (n <= 0) throw new IOException(s"truncated data file for $sb")
          skipped += n
        }
        f
      } catch { case e: IOException => fetchFailed(address, sb, mapIndex, e) }
    val limit = end - start
    readMetrics.incRemoteBlocksFetched(1)
    readMetrics.incRemoteBytesRead(limit)
    val bounded = new InputStream { // bounded view of [start, end)
      private var remaining = limit
      override def read(): Int =
        if (remaining <= 0) -1
        else {
          val b = try in.read()
            catch { case e: IOException => fetchFailed(address, sb, mapIndex, e) }
          if (b >= 0) remaining -= 1
          else if (remaining > 0)
            fetchFailed(address, sb, mapIndex,
              new IOException(s"data file truncated $remaining bytes early for $sb"))
          b
        }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        if (remaining <= 0) return -1
        val n = try in.read(b, off, math.min(len, remaining).toInt)
          catch { case e: IOException => fetchFailed(address, sb, mapIndex, e) }
        if (n > 0) remaining -= n
        else if (n < 0)
          fetchFailed(address, sb, mapIndex,
            new IOException(s"data file truncated $remaining bytes early for $sb"))
        n
      }
      override def close(): Unit = in.close()
    }
    openSegment = bounded
    bounded
  }

  override def read(): Iterator[Product2[K, C]] = {
    val env = SparkEnv.get
    val blocks = env.mapOutputTracker.getMapSizesByExecutorId(
      handle.shuffleId, startMapIndex, endMapIndex,
      startPartition, endPartition)
    val recordIter: Iterator[(Any, Any)] = blocks
      // the writer's BlockManagerId is kept ONLY to attribute fetch
      // failures; bytes are never requested from it
      .flatMap { case (address, seq) => seq.iterator.map(b => (address, b)) }
      .filter { case (_, (_, size, _)) => size > 0 }
      .flatMap { case (address, (blockId, _, mapIndex)) =>
        val sb = blockId.asInstanceOf[ShuffleBlockId]
        val wrapped = env.serializerManager.wrapStream(
          sb, segment(address, sb, mapIndex))
        dep.serializer.newInstance().deserializeStream(wrapped)
          .asKeyValueIterator
      }
      .map { r => readMetrics.incRecordsRead(1); r }
    val iter = new InterruptibleIterator[(Any, Any)](context, recordIter)

    val aggregated: Iterator[Product2[K, C]] =
      if (dep.aggregator.isDefined) {
        val agg = dep.aggregator.get.asInstanceOf[Aggregator[K, Any, C]]
        if (dep.mapSideCombine)
          agg.combineCombinersByKey(
            iter.asInstanceOf[Iterator[(K, C)]], context)
        else
          agg.combineValuesByKey(
            iter.asInstanceOf[Iterator[(K, Any)]], context)
      } else iter.asInstanceOf[Iterator[Product2[K, C]]]

    dep.keyOrdering match {
      case Some(ord) =>
        val sorter = new ExternalSorter[K, C, C](context,
          aggregator = None, partitioner = None, ordering = Some(ord),
          serializer = dep.serializer)
        sorter.insertAllAndUpdateMetrics(aggregated)
      case None => aggregated
    }
  }
}

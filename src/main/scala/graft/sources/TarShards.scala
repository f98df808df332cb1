package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** WebDataset-style tar-shard multimodal ingest (the container format
  * large image/audio/text corpora actually ship in: POSIX ustar
  * shards of (sample-key.extension → payload) members, consumed
  * shard-per-worker by training loaders).
  *
  * Pure offset math, the FcsSource/AvroIO binary-container pattern:
  * a tar is a sequence of 512-byte header blocks, each followed by
  * ⌈size/512⌉ payload blocks, terminated by two zero blocks. No
  * library, no shuffle — each shard parses inside its binaryFile
  * partition, so ingesting 100 TB of shards is a map job whose
  * parallelism is the file listing's.
  *
  * Reader semantics (ustar + the three long-name forms in the wild):
  *   - regular files only (typeflag '0' or NUL); directories, links
  *     and global-metadata members are skipped;
  *   - ustar prefix field (POSIX split names): `prefix + '/' + name`;
  *   - GNU 'L' longname members: the payload names the NEXT member;
  *   - PAX extended headers ('x' members — what Python's tarfile
  *     writes by default): "len key=value\n" records, with `path`
  *     overriding the next member's name and `size` its size (the
  *     PAX size rule for >8 GB members);
  *   - size is octal, NUL/space padded; payload padded to 512;
  *   - archive ends at the first zero header block (tolerates a
  *     truncated final padding block);
  *   - gzip-compressed shards (.tar.gz magic 1f 8b) decompress
  *     transparently in [[read]].
  *
  * Writer: one tar per distinct shard value, hash-partitioned so a
  * shard's members serialize in ONE task (members sorted by name —
  * deterministic bytes for a deterministic input), attempt-isolated
  * temp files + atomic rename (the AvroIO discipline: speculative or
  * retried attempts never collide on the final path).
  */
object TarShards {

  private val BlockSize = 512

  /** One ustar member: header block + NUL-padded payload blocks.
    * Names longer than 100 bytes are split into the POSIX prefix
    * field at a '/' boundary (required by the format; a long name
    * with no splittable '/' is rejected — the GNU 'L' form is
    * read-supported but deliberately not written).
    */
  private[graft] def memberBytes(name: String, payload: Array[Byte]): Array[Byte] = {
    val nameBytes = name.getBytes(StandardCharsets.UTF_8)
    val (prefix, base) =
      if (nameBytes.length <= 100) ("", name)
      else {
        val cut = name.lastIndexOf('/', name.length - 1)
        require(cut > 0,
          s"tar member name longer than 100 bytes with no '/' to split on: $name")
        val (p, b) = (name.substring(0, cut), name.substring(cut + 1))
        require(p.getBytes(StandardCharsets.UTF_8).length <= 155 &&
          b.getBytes(StandardCharsets.UTF_8).length <= 100,
          s"tar member name does not fit ustar name+prefix: $name")
        (p, b)
      }
    val header = new Array[Byte](BlockSize)
    def putStr(s: String, off: Int, len: Int): Unit = {
      val bs = s.getBytes(StandardCharsets.UTF_8)
      System.arraycopy(bs, 0, header, off, math.min(bs.length, len))
    }
    def putOctal(v: Long, off: Int, len: Int): Unit =
      // len-1 octal digits + NUL, zero-padded — the strict ustar form
      putStr(("%0" + (len - 1) + "o").format(v), off, len - 1)
    putStr(base, 0, 100)
    putOctal(420, 100, 8) // mode 0644
    putOctal(0, 108, 8) // uid
    putOctal(0, 116, 8) // gid
    putOctal(payload.length.toLong, 124, 12)
    putOctal(0, 136, 12) // mtime: fixed 0 for byte-deterministic shards
    header(156) = '0' // typeflag: regular file
    putStr("ustar", 257, 6) // magic, NUL-terminated by the zero fill
    header(263) = '0'; header(264) = '0' // version "00"
    putStr(prefix, 345, 155)
    // checksum: sum of header bytes with the checksum field as spaces
    java.util.Arrays.fill(header, 148, 156, ' '.toByte)
    var sum = 0L
    var i = 0
    while (i < BlockSize) { sum += header(i) & 0xff; i += 1 }
    putStr("%06o".format(sum), 148, 7)
    header(154) = 0; header(155) = ' '
    val padded = (payload.length + BlockSize - 1) / BlockSize * BlockSize
    val out = new Array[Byte](BlockSize + padded)
    System.arraycopy(header, 0, out, 0, BlockSize)
    System.arraycopy(payload, 0, out, BlockSize, payload.length)
    out
  }

  /** Parse every regular-file member of one shard's bytes. */
  private[graft] def parseEntries(bytes: Array[Byte]): Iterator[(String, Array[Byte])] =
    new Iterator[(String, Array[Byte])] {
      private var pos = 0
      private var pendingLongName: String = null
      private var pendingPaxSize: Long = -1L
      private var nextEntry: (String, Array[Byte]) = null

      /** PAX extended-header records: "<len> <key>=<value>\n", len =
        * the record's TOTAL byte length including itself. Returns the
        * (path, size) overrides present, if any.
        */
      private def parsePax(data: Array[Byte]): (Option[String], Option[Long]) = {
        var path: Option[String] = None
        var size: Option[Long] = None
        var p = 0
        while (p < data.length) {
          var sp = p
          while (sp < data.length && data(sp) != ' '.toByte) sp += 1
          val lenStr = new String(data, p, sp - p, StandardCharsets.US_ASCII)
          val recLen = try lenStr.trim.toInt catch { case _: NumberFormatException => -1 }
          if (recLen <= 0 || p + recLen > data.length) p = data.length
          else {
            // record body between "len " and the trailing '\n'
            val body = new String(data, sp + 1, recLen - (sp + 1 - p) - 1,
              StandardCharsets.UTF_8)
            val eq = body.indexOf('=')
            if (eq > 0) {
              val (k, v) = (body.substring(0, eq), body.substring(eq + 1))
              if (k == "path") path = Some(v)
              else if (k == "size") size = try Some(v.toLong)
              catch { case _: NumberFormatException => None }
            }
            p += recLen
          }
        }
        (path, size)
      }

      private def octal(off: Int, len: Int): Long = {
        var i = off
        val end = off + len
        while (i < end && (bytes(i) == ' '.toByte || bytes(i) == 0)) i += 1
        var v = 0L
        while (i < end && bytes(i) >= '0'.toByte && bytes(i) <= '7'.toByte) {
          v = v * 8 + (bytes(i) - '0'); i += 1
        }
        v
      }

      private def cstr(off: Int, len: Int): String = {
        var end = off
        val lim = off + len
        while (end < lim && bytes(end) != 0) end += 1
        new String(bytes, off, end - off, StandardCharsets.UTF_8)
      }

      private def advance(): Unit = {
        nextEntry = null
        while (nextEntry == null && pos + BlockSize <= bytes.length) {
          var allZero = true
          var i = pos
          while (allZero && i < pos + BlockSize) { allZero = bytes(i) == 0; i += 1 }
          if (allZero) { pos = bytes.length } // end-of-archive marker
          else {
            // GNU base-256 size encoding (high bit of byte 124 set)
            // is NOT octal — silently parsing it as 0 would
            // mis-advance pos and corrupt the rest of the archive.
            // Fail loudly instead (graft's writer never emits it;
            // PAX covers the >8 GiB range for foreign archives).
            require((bytes(pos + 124) & 0x80) == 0,
              s"tar header at offset $pos uses GNU base-256 size encoding (unsupported)")
            val headerSize = octal(pos + 124, 12)
            val typeflag = bytes(pos + 156)
            val magic = cstr(pos + 257, 6)
            val base = cstr(pos, 100)
            val prefix = if (magic.startsWith("ustar")) cstr(pos + 345, 155) else ""
            val name0 = if (prefix.isEmpty) base else prefix + "/" + base
            // a preceding PAX 'size' record overrides the octal field
            // (the PAX rule for members beyond the 8 GiB octal range)
            val sizeL: Long = if (typeflag == '0' || typeflag == 0) {
              if (pendingPaxSize >= 0) pendingPaxSize else headerSize
            } else headerSize
            // members are materialized as in-memory byte arrays; a
            // size beyond Int.MaxValue would truncate via .toInt and
            // silently mis-advance the parse — reject it loudly.
            require(sizeL >= 0 && sizeL <= Int.MaxValue,
              s"tar member size $sizeL at offset $pos exceeds the supported " +
                "in-memory member range (0..Int.MaxValue)")
            val size = sizeL.toInt
            val dataStart = pos + BlockSize
            pos = dataStart + (size + BlockSize - 1) / BlockSize * BlockSize
            if (typeflag == 'L') {
              // GNU longname: NUL-terminated payload names the next member
              var e = dataStart
              val lim = math.min(dataStart + size, bytes.length)
              while (e < lim && bytes(e) != 0) e += 1
              pendingLongName = new String(bytes, dataStart, e - dataStart,
                StandardCharsets.UTF_8)
            } else if (typeflag == 'x') {
              // PAX extended header for the NEXT member
              val (p, s) = parsePax(java.util.Arrays.copyOfRange(
                bytes, dataStart, math.min(dataStart + size, bytes.length)))
              p.foreach(pendingLongName = _)
              s.foreach(pendingPaxSize = _)
            } else if (typeflag == '0' || typeflag == 0) {
              val name = if (pendingLongName != null) pendingLongName else name0
              pendingLongName = null
              pendingPaxSize = -1L
              val payload = java.util.Arrays.copyOfRange(
                bytes, dataStart, math.min(dataStart + size, bytes.length))
              nextEntry = (name, payload)
            } else { pendingLongName = null; pendingPaxSize = -1L }
            // dir/link/'g' global members: skip (and clear overrides)
          }
        }
      }

      advance()
      override def hasNext: Boolean = nextEntry != null
      override def next(): (String, Array[Byte]) = {
        val e = nextEntry; advance(); e
      }
    }

  /** Pack (shardCol, nameCol, payloadCol) rows into `shard-<k>.tar`
    * files under `path`. Hash-partitioned on the shard value so each
    * shard's members land in one task; members are sorted by name
    * inside the shard (deterministic bytes); a task holding several
    * shard values writes several tars sequentially.
    */
  def write(df: DataFrame, shardCol: String, nameCol: String,
            payloadCol: String, path: String, parallelism: Int = 32): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    df.select(col(shardCol).cast("long").as("shard"),
        col(nameCol).cast("string").as("name"),
        col(payloadCol).cast("binary").as("payload"))
      .repartition(parallelism, col("shard"))
      .sortWithinPartitions("shard", "name")
      .rdd.mapPartitionsWithIndex { (_, it) =>
        val tc = org.apache.spark.TaskContext.get()
        val attempt = if (tc != null) tc.taskAttemptId() else 0L
        var cur: java.io.OutputStream = null
        var curShard = Long.MinValue
        var curTmp: java.io.File = null
        var written = 0L
        def closeShard(): Unit = if (cur != null) {
          cur.write(new Array[Byte](BlockSize * 2)) // end-of-archive
          cur.close()
          java.nio.file.Files.move(
            curTmp.toPath,
            new java.io.File(s"$path/shard-$curShard.tar").toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          cur = null
        }
        it.foreach { row =>
          val shard = row.getLong(0)
          if (shard != curShard || cur == null) {
            closeShard()
            curShard = shard
            curTmp = new java.io.File(s"$path/.shard-$shard.tar.attempt-$attempt")
            cur = new java.io.BufferedOutputStream(
              new java.io.FileOutputStream(curTmp))
          }
          val payload = row.get(2) match {
            case null => Array.emptyByteArray
            case b: Array[Byte] => b
          }
          cur.write(memberBytes(row.getString(1), payload))
          written += 1L
        }
        closeShard()
        Iterator(written)
      }.sum()
    ()
  }

  /** Read every member of every `*.tar` under `path`:
    * (shard, name, payload) — shard is the numeric id parsed from
    * the file name. binaryFile scan → in-partition parse, no shuffle.
    */
  private def entryRows(file: String,
                        bytes: Array[Byte]): Iterator[(Long, String, Array[Byte])] = {
    val shard = "shard-(\\d+)\\.tar(\\.gz)?$".r.findFirstMatchIn(file)
      .map(_.group(1).toLong).getOrElse(-1L)
    parseEntries(gunzipIfNeeded(bytes))
      .map { case (name, payload) => (shard, name, payload) }
  }

  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(s"$path/*.tar*")
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap((entryRows _).tupled)
      .toDF("shard", "name", "payload")
  }

  /** Streaming form of [[read]] — the production INGEST topology:
    * shards land as files and each micro-batch parses only the new
    * ones (binaryFile is a FileFormat, so the file stream source
    * tracks seen files in its offset log). Shared parse body with
    * the batch read, so the two forms cannot drift.
    */
  def readStream(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val schema = StructType(Seq( // binaryFile's fixed schema (file streams don't infer)
      StructField("path", StringType),
      StructField("modificationTime", TimestampType),
      StructField("length", LongType),
      StructField("content", BinaryType)))
    spark.readStream.format("binaryFile").schema(schema)
      .option("pathGlobFilter", "*.tar*").load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap((entryRows _).tupled)
      .toDF("shard", "name", "payload")
  }

  /** Transparent .tar.gz handling: gzip magic 1f 8b → decompress.
    * Gzipped shards are NOT splittable — acceptable for WebDataset
    * shards, which are sized (100 MB–1 GB) to be the unit of
    * parallelism themselves.
    */
  private[graft] def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f && (bytes(1) & 0xff) == 0x8b) {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try in.readAllBytes() finally in.close()
    } else bytes
}

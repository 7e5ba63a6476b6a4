package graft.sources

import java.io.{InputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.apache.hadoop.io.compress.{CompressionCodec, CompressionInputStream,
  CompressionOutputStream, Compressor, Decompressor}

/** `.zip` as a Hadoop compression codec — the reference's text readers
  * accept zip alongside gzip/bzip2 (`plugin-unstructured-storage-util/
  * .../UnstructuredStorageReaderUtil.java:220-228`, via a
  * ZipCycleInputStream that concatenates ALL archive entries into one
  * logical stream). Hadoop/Spark ship no zip codec, so text scans over
  * `*.zip` normally read raw archive bytes as garbage lines.
  *
  * Registering this codec (see [[FileIo.registerZipCodec]]) makes every
  * Spark text source — csv/json/text — decode `.zip` files transparently
  * through the normal extension→codec lookup, executor-side, one stream
  * per file split (zip, like gzip, is unsplittable: one archive = one
  * task, so at scale many small-ish archives parallelize and one giant
  * archive does not — same operational rule as `.gz`).
  *
  * Read side replays the reference's cycle semantics: entries decode
  * back-to-back as one stream. Write side produces a single-entry
  * archive per part file. Zip inflation happens in the Java stream
  * classes; the Compressor/Decompressor pool objects are inert
  * pass-throughs (zip's framing lives in the entry directory, which the
  * block-oriented Hadoop (de)compressor interface cannot express).
  */
class ZipCodec extends CompressionCodec {

  override def getDefaultExtension: String = ".zip"

  // ------------------------------------------------------------ read side

  override def createInputStream(in: InputStream): CompressionInputStream =
    new ZipCodec.ZipCycleInputStream(in)

  override def createInputStream(in: InputStream,
      d: Decompressor): CompressionInputStream = createInputStream(in)

  override def createDecompressor(): Decompressor = new ZipCodec.InertDecompressor
  override def getDecompressorType: Class[_ <: Decompressor] =
    classOf[ZipCodec.InertDecompressor]

  // ----------------------------------------------------------- write side

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new ZipCodec.SingleEntryZipOutputStream(out)

  override def createOutputStream(out: OutputStream,
      c: Compressor): CompressionOutputStream = createOutputStream(out)

  override def createCompressor(): Compressor = new ZipCodec.InertCompressor
  override def getCompressorType: Class[_ <: Compressor] =
    classOf[ZipCodec.InertCompressor]
}

object ZipCodec {

  /** All archive entries, concatenated — the reference's
    * ZipCycleInputStream behavior: a multi-entry archive reads as its
    * entries' bytes back to back (directories skipped). */
  private[sources] final class ZipCycleInputStream(raw: InputStream)
      extends CompressionInputStream(raw) {
    private val zip = new ZipInputStream(raw)
    private var entryOpen = advance()

    private def advance(): Boolean = {
      var e: ZipEntry = zip.getNextEntry
      while (e != null && e.isDirectory) e = zip.getNextEntry
      e != null
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (!entryOpen) return -1
      var n = zip.read(b, off, len)
      while (n < 0 && { entryOpen = advance(); entryOpen })
        n = zip.read(b, off, len)
      if (n < 0) { entryOpen = false; -1 } else n
    }

    override def read(): Int = {
      val one = new Array[Byte](1)
      if (read(one, 0, 1) < 0) -1 else one(0) & 0xff
    }

    override def resetState(): Unit = () // zip keeps its state in entries

    override def close(): Unit =
      try zip.close() finally super.close()
  }

  /** One `part` entry per file — what a writer shards naturally. */
  private[sources] final class SingleEntryZipOutputStream(raw: OutputStream)
      extends CompressionOutputStream(raw) {
    private val zip = new ZipOutputStream(raw)
    zip.putNextEntry(new ZipEntry("part"))
    // Hadoop's CompressionOutputStream.close() also calls finish(); both
    // must be idempotent or the second call hits a closed zip stream
    private var done = false

    override def write(b: Array[Byte], off: Int, len: Int): Unit =
      zip.write(b, off, len)
    override def write(b: Int): Unit = zip.write(b)
    override def finish(): Unit =
      if (!done) { done = true; zip.closeEntry(); zip.finish() }
    override def resetState(): Unit = ()
    override def close(): Unit = { finish(); zip.close() }
  }

  /** The codec pool insists on instantiable (de)compressor classes even
    * when the stream classes do all the work — these satisfy the pool
    * and are never asked to transform bytes (the `createInputStream`/
    * `createOutputStream` overloads ignore them). */
  private[sources] final class InertDecompressor extends Decompressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsDictionary(): Boolean = false
    override def finished(): Boolean = false
    override def decompress(b: Array[Byte], off: Int, len: Int): Int = 0
    override def getRemaining: Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
  }

  private[sources] final class InertCompressor extends Compressor {
    override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def needsInput(): Boolean = true
    override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
    override def getBytesRead: Long = 0
    override def getBytesWritten: Long = 0
    override def finish(): Unit = ()
    override def finished(): Boolean = true
    override def compress(b: Array[Byte], off: Int, len: Int): Int = 0
    override def reset(): Unit = ()
    override def end(): Unit = ()
    override def reinit(conf: org.apache.hadoop.conf.Configuration): Unit = ()
  }
}

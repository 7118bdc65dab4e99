package graft

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{FrameDecoder, MediaRow, StridedSliceDecoder}

/** C12 — the decode seam is decoder-AGNOSTIC: swapping the default
  * strided-slice stand-in for an injected synthetic decoder changes
  * frame CONTENT only. Schema, per-partition batching (one `open()`
  * per partition, the codec-context amortization a real decoder
  * needs), and the shuffle-free partition-preserving plan are
  * properties of the Spark-side plumbing, not of any codec — which is
  * exactly the claim behind shipping the stub. */
class DecoderSeamSpec extends SparkSpec {
  import spark.implicits._
  import DecoderSeamSpec._

  private def media(n: Int, parts: Int) =
    spark.createDataset((1 to n).map(i =>
      MediaRow(i.toLong, Array.tabulate[Byte](64 + i)(j => (i * 31 + j).toByte), "h264")))
      .repartition(parts)

  test("C12: injected decoder produces the SAME schema and plan shape as the stub") {
    val rows = media(6, 3)
    val stub = Multimodal.sampleFramesWith(rows, StridedSliceDecoder())
    val injected = Multimodal.sampleFramesWith(rows, SyntheticDecoder(framesPer = 3))
    assert(stub.schema == injected.schema, "schema is decoder-independent")
    // map-only: the ONLY exchange is the input's own repartition(3);
    // the decode adds none — frames never leave their media row's
    // partition, and the partition count survives the seam
    val plan = injected.queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"decode must not reshuffle:\n$plan")
    assert(injected.rdd.getNumPartitions == rows.rdd.getNumPartitions)
  }

  test("C12: synthetic frames come out exactly as the injected decoder made them") {
    val out = Multimodal.sampleFramesWith(media(4, 2), SyntheticDecoder(framesPer = 2))
      .collect().map(f => (f.media_id, f.frame_no, f.frame.toSeq)).sortBy(x => (x._1, x._2))
    val want = (1 to 4).flatMap { i =>
      (0 until 2).map(k => (i.toLong, k,
        Array.tabulate[Byte](8)(j => (i * 7 + k * 3 + j).toByte).toSeq))
    }
    assert(out.toSeq == want)
  }

  test("C12: open() runs once per partition, decode once per media row") {
    opens.set(0); decodes.set(0)
    val parts = 3
    Multimodal.sampleFramesWith(media(9, parts), CountingDecoder()).count()
    assert(opens.get() == parts, s"codec context per partition: ${opens.get()}")
    assert(decodes.get() == 9, s"one decode per media row: ${decodes.get()}")
  }

  test("C12: the default path is the strided stub, bit-for-bit") {
    val rows = media(3, 1)
    val viaDefault = Multimodal.sampleFrames(rows, frameSize = 16, stride = 4)
      .collect().map(f => (f.media_id, f.frame_no, f.frame.toSeq)).toSet
    val viaSeam = Multimodal.sampleFramesWith(rows, StridedSliceDecoder(16, 4))
      .collect().map(f => (f.media_id, f.frame_no, f.frame.toSeq)).toSet
    assert(viaDefault == viaSeam)
  }
}

object DecoderSeamSpec {
  val opens = new java.util.concurrent.atomic.AtomicInteger(0)
  val decodes = new java.util.concurrent.atomic.AtomicInteger(0)

  /** deterministic synthetic frames derived from (media_id, frame_no)
    * — stands in for a real codec at the seam. */
  final case class SyntheticDecoder(framesPer: Int) extends FrameDecoder {
    def decode(mediaId: Long, media: Array[Byte],
               format: String): Iterator[(Int, Array[Byte])] =
      (0 until framesPer).iterator.map(k =>
        (k, Array.tabulate[Byte](8)(j => (mediaId * 7 + k * 3 + j).toByte)))
  }

  /** instruments the seam's batching contract (local-mode executors
    * share the JVM, so static counters see every call). */
  final case class CountingDecoder() extends FrameDecoder {
    override def open(): Unit = { opens.incrementAndGet(); () }
    def decode(mediaId: Long, media: Array[Byte],
               format: String): Iterator[(Int, Array[Byte])] = {
      decodes.incrementAndGet()
      Iterator((0, media.take(4)))
    }
  }
}

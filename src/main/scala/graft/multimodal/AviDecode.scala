package graft.multimodal

/** Motion-JPEG AVI container parser — pure bytes, no codec library, the
  * discipline of [[PixelDecode]]'s image parsers applied to the video
  * container: an AVI file is a RIFF form (`RIFF <size> 'AVI '`) whose
  * chunk tree nests `LIST` chunks; the video payload lives in the
  * `movi` LIST as one chunk per frame (`NNdc` compressed / `NNdb`
  * uncompressed, NN = the zero-based stream number), each MJPEG frame
  * being a complete baseline JPEG that [[JpegDecode]] already decodes.
  * Chunks are word-aligned: an odd-sized chunk is followed by one pad
  * byte that is NOT counted in its size field.
  *
  * The walk is defensive: any truncated size field, runaway offset, or
  * missing magic returns the frames found so far (possibly none) — a
  * malformed blob must never throw inside an executor task.
  */
object AviDecode {

  private def fourcc(b: Array[Byte], off: Int, s: String): Boolean =
    off + 4 <= b.length &&
      b(off) == s.charAt(0).toByte && b(off + 1) == s.charAt(1).toByte &&
      b(off + 2) == s.charAt(2).toByte && b(off + 3) == s.charAt(3).toByte

  private def le32(b: Array[Byte], off: Int): Long =
    if (off + 4 > b.length) -1L
    else (b(off) & 0xffL) | (b(off + 1) & 0xffL) << 8 |
      (b(off + 2) & 0xffL) << 16 | (b(off + 3) & 0xffL) << 24

  /** Is `id` a video-frame chunk id (`NNdc`/`NNdb`)? */
  private def isFrameId(b: Array[Byte], off: Int): Boolean =
    off + 4 <= b.length &&
      b(off) >= '0' && b(off) <= '9' && b(off + 1) >= '0' && b(off + 1) <= '9' &&
      b(off + 2) == 'd' && (b(off + 3) == 'c' || b(off + 3) == 'b')

  /** All frame payloads of an MJPEG AVI blob, in stream order; empty for
    * anything that is not a well-formed `RIFF/AVI ` container.
    */
  def frames(blob: Array[Byte]): Seq[Array[Byte]] = {
    if (!fourcc(blob, 0, "RIFF") || !fourcc(blob, 8, "AVI ")) return Seq.empty
    val riffEnd = math.min(blob.length.toLong, 8L + le32(blob, 4)).toInt
    val out = Seq.newBuilder[Array[Byte]]
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var off = start
      while (off + 8 <= end) {
        val size = le32(blob, off + 4)
        if (size < 0 || off + 8 + size > end) return // truncated chunk: stop
        val dataEnd = (off + 8 + size).toInt
        if (fourcc(blob, off, "LIST") && size >= 4)
          walk(off + 12, dataEnd, inMovi || fourcc(blob, off + 8, "movi"))
        else if (inMovi && isFrameId(blob, off))
          out += java.util.Arrays.copyOfRange(blob, off + 8, dataEnd)
        off = dataEnd + (size & 1L).toInt // word alignment pad
      }
    }
    walk(12, riffEnd, inMovi = false)
    out.result()
  }

  /** Evenly sample up to `n` of the frames (first/last included when
    * n ≥ 2) — the frame-sampling policy a training-data video pipeline
    * wants (uniform temporal coverage, deterministic).
    */
  def sampleEvenly(all: Seq[Array[Byte]], n: Int): Seq[Array[Byte]] =
    if (all.isEmpty || n <= 0) Seq.empty
    else if (all.size <= n) all
    else if (n == 1) Seq(all.head)
    else (0 until n).map(i => all(((all.size - 1).toLong * i / (n - 1)).toInt))
}

package graft

/** Shared test-image synthesis: the gradient-plus-mark fixture the
  * multimodal and media-prep specs both hash and dedup. One definition so
  * the aHash-proximity assumptions ("re-encode = Hamming 0", "small mark =
  * few bits") cannot silently diverge between suites. */
object TestImages {

  /** Encode a w×h gradient image (with a dark square at `mark`) to `fmt`
    * bytes via the same JDK codecs the decoder uses. */
  def gradient(w: Int, h: Int, fmt: String,
      mark: Option[(Int, Int)] = None): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 255 / math.max(w - 1, 1) + y * 255 / math.max(h - 1, 1)) / 2
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    mark.foreach { case (mx, my) =>
      for (y <- my until math.min(my + h / 4, h); x <- mx until math.min(mx + w / 4, w))
        img.setRGB(x, y, 0)
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, fmt, out), s"JDK cannot encode $fmt")
    out.toByteArray
  }
}

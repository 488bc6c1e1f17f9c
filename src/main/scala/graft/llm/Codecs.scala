package graft.llm

/** Real pure-JVM media codecs for the multimodal column path.
  *
  * All three formats are public, trivially specified byte layouts
  * (netpbm PPM: https://netpbm.sourceforge.net/doc/ppm.html; Windows
  * BMP: BITMAPFILEHEADER + BITMAPINFOHEADER; RIFF/WAVE PCM), so a
  * decode here is a genuine parse of real image/audio bytes — no image
  * library needed. [[Multimodal]] wires these into the partition-local
  * decode stage; the `x_multimodal_*` gates construct PPM payloads whose
  * header fields the engine must actually parse back out of the bytes.
  */
object Codecs {

  /** Binary PPM (P6): ASCII header `P6 <width> <height> <maxval>` with
    * whitespace separators and `#` comments, then `width*height*3` raw
    * RGB bytes (maxval <= 255).
    */
  object PpmCodec {

    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3,
        s"pixel buffer ${rgb.length} != $width*$height*3")
      val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + rgb.length)
      System.arraycopy(header, 0, out, 0, header.length)
      System.arraycopy(rgb, 0, out, header.length, rgb.length)
      out
    }

    /** Parse a P6 payload → (width, height, rgb). None on anything
      * malformed: wrong magic, truncated pixel data, maxval > 255.
      */
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      var pos = 0
      def skipWs(): Unit = {
        var in = true
        while (in && pos < payload.length) {
          val c = payload(pos)
          if (c == '#') { // comment runs to end of line
            while (pos < payload.length && payload(pos) != '\n') pos += 1
          } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pos += 1
          else in = false
        }
      }
      def int(): Int = {
        skipWs()
        var v = 0; var any = false
        while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
          v = v * 10 + (payload(pos) - '0'); pos += 1; any = true
        }
        if (!any) -1 else v
      }
      if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6') return None
      pos = 2
      val w = int(); val h = int(); val maxv = int()
      if (w <= 0 || h <= 0 || maxv <= 0 || maxv > 255) return None
      // exactly one whitespace byte separates maxval from pixel data
      if (pos >= payload.length) return None
      pos += 1
      val need = w * h * 3
      if (payload.length - pos < need) return None
      Some((w, h, java.util.Arrays.copyOfRange(payload, pos, pos + need)))
    }
  }

  /** Uncompressed 24-bit BMP: 14-byte file header ('BM', size, pixel
    * offset) + 40-byte BITMAPINFOHEADER; pixel rows are BGR, padded to
    * 4-byte boundaries, stored bottom-up.
    */
  object BmpCodec {

    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    private def rd32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    private def rd16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

    /** rgb is top-down RGB triples (the PPM pixel order). */
    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3)
      val rowBytes = width * 3
      val pad = (4 - rowBytes % 4) % 4
      val dataSize = (rowBytes + pad) * height
      val out = new Array[Byte](54 + dataSize)
      out(0) = 'B'; out(1) = 'M'
      le32(out, 2, out.length); le32(out, 10, 54)
      le32(out, 14, 40); le32(out, 18, width); le32(out, 22, height)
      out(26) = 1; out(28) = 24 // planes=1, bpp=24, compression=0 (BI_RGB)
      le32(out, 34, dataSize)
      var y = 0
      while (y < height) {
        val srcRow = y * rowBytes
        val dstRow = 54 + (height - 1 - y) * (rowBytes + pad) // bottom-up
        var x = 0
        while (x < width) { // RGB → BGR
          out(dstRow + x * 3) = rgb(srcRow + x * 3 + 2)
          out(dstRow + x * 3 + 1) = rgb(srcRow + x * 3 + 1)
          out(dstRow + x * 3 + 2) = rgb(srcRow + x * 3)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Parse 24-bit uncompressed BMP → (width, height, top-down RGB). */
    def decode(payload: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
      if (payload.length < 54 || payload(0) != 'B' || payload(1) != 'M') return None
      val pixelOff = rd32(payload, 10)
      val width = rd32(payload, 18)
      val height = rd32(payload, 22)
      val bpp = rd16(payload, 28)
      val compression = rd32(payload, 30)
      if (width <= 0 || height <= 0 || bpp != 24 || compression != 0) return None
      val rowBytes = width * 3
      val pad = (4 - rowBytes % 4) % 4
      if (payload.length < pixelOff + (rowBytes + pad) * height) return None
      val rgb = new Array[Byte](width * height * 3)
      var y = 0
      while (y < height) {
        val srcRow = pixelOff + (height - 1 - y) * (rowBytes + pad)
        val dstRow = y * rowBytes
        var x = 0
        while (x < width) { // BGR → RGB
          rgb(dstRow + x * 3) = payload(srcRow + x * 3 + 2)
          rgb(dstRow + x * 3 + 1) = payload(srcRow + x * 3 + 1)
          rgb(dstRow + x * 3 + 2) = payload(srcRow + x * 3)
          x += 1
        }
        y += 1
      }
      Some((width, height, rgb))
    }
  }

  /** RIFF/WAVE, PCM 16-bit little-endian mono. */
  object WavCodec {

    private def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
      b(off + 2) = ((v >> 16) & 0xFF).toByte; b(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    private def le16(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xFF).toByte; b(off + 1) = ((v >> 8) & 0xFF).toByte
    }
    private def rd32(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
        ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
    private def rd16(b: Array[Byte], off: Int): Int =
      (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    private def tag(b: Array[Byte], off: Int, s: String): Boolean =
      off + 4 <= b.length && (0 until 4).forall(i => b(off + i) == s.charAt(i).toByte)

    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataSize = samples.length * 2
      val out = new Array[Byte](44 + dataSize)
      "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
      le32(out, 4, 36 + dataSize)
      "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
      "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
      le32(out, 16, 16); le16(out, 20, 1) // PCM
      le16(out, 22, 1) // mono
      le32(out, 24, sampleRate); le32(out, 28, sampleRate * 2)
      le16(out, 32, 2); le16(out, 34, 16) // block align, bits
      "data".getBytes("US-ASCII").copyToArray(out, 36)
      le32(out, 40, dataSize)
      var i = 0
      while (i < samples.length) { le16(out, 44 + i * 2, samples(i) & 0xFFFF); i += 1 }
      out
    }

    /** Walk the RIFF chunk list (fmt may be followed by LIST/fact etc.
      * before data) → (sampleRate, samples). PCM16 mono only.
      */
    def decode(payload: Array[Byte]): Option[(Int, Array[Short])] = {
      if (!tag(payload, 0, "RIFF") || !tag(payload, 8, "WAVE")) return None
      var pos = 12
      var rate = -1
      var samples: Array[Short] = null
      while (pos + 8 <= payload.length && (rate < 0 || samples == null)) {
        val size = rd32(payload, pos + 4)
        if (tag(payload, pos, "fmt ")) {
          if (rd16(payload, pos + 8) != 1 || rd16(payload, pos + 10) != 1 ||
            rd16(payload, pos + 22) != 16) return None
          rate = rd32(payload, pos + 12)
        } else if (tag(payload, pos, "data")) {
          if (pos + 8 + size > payload.length) return None
          samples = new Array[Short](size / 2)
          var i = 0
          while (i < samples.length) {
            samples(i) = rd16(payload, pos + 8 + i * 2).toShort; i += 1
          }
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned
      }
      if (rate <= 0 || samples == null) None else Some((rate, samples))
    }

    def durationMs(sampleRate: Int, nSamples: Int): Long =
      nSamples * 1000L / sampleRate

    def rms(samples: Array[Short]): Double = {
      if (samples.isEmpty) return 0.0
      var acc = 0.0
      var i = 0
      while (i < samples.length) { val s = samples(i).toDouble; acc += s * s; i += 1 }
      math.sqrt(acc / samples.length)
    }
  }
}

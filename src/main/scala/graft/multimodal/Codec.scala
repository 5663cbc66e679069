package graft.multimodal

import java.awt.RenderingHints
import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

/** REAL codec layer for the multimodal operators — JDK-only, zero new
  * dependencies:
  *
  *  - images: PNG/JPEG decode + encode via `javax.imageio` (the JDK
  *    ships both codecs), bilinear rescale via `Graphics2D`, and the
  *    classic 64-bit perceptual hash (32×32 luma → 2D DCT-II → top-left
  *    8×8 coefficient block → median threshold; van Zwol/Krawetz-style
  *    pHash as published at phash.org and "Looks Like It").
  *  - audio: WAV (PCM16 mono) decode + encode via `javax.sound.sampled`,
  *    and a Haitsma–Kalker-style sub-band fingerprint (per window: 33
  *    sub-band energies over a Hann-windowed DFT; one sign bit per
  *    adjacent-band log-energy difference ⇒ 32 bits, GAIN-INVARIANT by
  *    construction — a volume change scales every band equally and
  *    cancels in the log differences).
  *  - video: the container ships no ffmpeg, so "video" payloads use a
  *    self-describing length-prefixed PNG-frame container (`GFRM`
  *    magic); the FRAMES are real PNGs decoded by the real image codec,
  *    which is the part the near-dup operators exercise. Swapping in a
  *    real demuxer replaces [[decodeFrames]] only.
  *
  * Every decode returns Option/empty on malformed bytes — a 100 TB crawl
  * always contains corrupt assets, and an operator that throws on one
  * poisons its whole task.
  *
  * The synth* generators build the deterministic media fixtures (real
  * encoded payloads; `java.util.Random`'s LCG is specified in its
  * Javadoc, so same seed ⇒ same media on any JVM). Images are smooth
  * two-sinusoid fields — low-frequency content, which is exactly the
  * regime perceptual hashing is designed for (a white-noise payload has
  * no perceptual identity to preserve under re-encode/resize).
  *
  * Reference parity: the reference's whole pipeline is image data
  * (`examples/MNIST.scala:25-31` parses 28×28 grayscale pixel rows);
  * this codec boundary is where those pixels would enter the engine.
  */
object Codec {

  // ImageIO defaults to spilling stream contents through temp FILES; for
  // executor-side per-row decode/encode that is pure overhead (and a
  // container-filesystem dependency) — keep everything on-heap.
  javax.imageio.ImageIO.setUseCache(false)

  /** Diagnostic payload-decode counter (images + WAV clips). Decode is
    * the dominant cost of every perceptual operator, so "a stage ran
    * twice" is directly observable as a doubled decode count —
    * MediaPipelineSpec pins the end-to-end pipeline against a
    * run-each-stage-once budget with it. Meaningful in local mode only
    * (executors share the JVM); in a cluster it counts the local
    * executor's share. Near-zero overhead (striped LongAdder).
    *
    * JVM-global: budget tests (MediaPipelineSpec, ExtSpec) reset then
    * read it, which assumes NO OTHER SUITE decodes concurrently in the
    * same forked JVM — true under the current sequential forked-test
    * config; if `testForkedParallel` is ever enabled those assertions
    * must move to a dedicated single-suite fork. Null/empty payloads do
    * NOT increment (no decode is attempted), so the counter means
    * actual decode attempts. */
  val decodeCalls = new java.util.concurrent.atomic.LongAdder

  // ------------------------------------------------------------- images

  /** Decode any ImageIO-supported payload (PNG/JPEG/GIF/BMP in the
    * stock JDK); None on corrupt/unsupported bytes. */
  def decodeImage(content: Array[Byte]): Option[BufferedImage] = {
    if (content == null || content.length == 0) None
    else {
      decodeCalls.increment()
      try Option(javax.imageio.ImageIO.read(new ByteArrayInputStream(content)))
      catch { case _: Exception => None }
    }
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** JPEG encode at an explicit quality — the lossy re-encode the
    * near-dup gates plant as twins. */
  def encodeJpeg(img: BufferedImage, quality: Float): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val bos = new ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    } finally { ios.close(); writer.dispose() }
    bos.toByteArray
  }

  /** Bilinear rescale — used by both the resize operator and the pHash
    * 32×32 normalization. COLOR-PRESERVING: the output keeps the
    * source's color model (a resized RGB photo stays RGB — forcing
    * grayscale here would silently corrupt every color payload run
    * through the resize operator). Only indexed/custom color models are
    * promoted to TYPE_INT_RGB (drawing bilinear samples into a palette
    * image quantizes them through the palette). Grayscale stays
    * grayscale, so the luma path ([[luma32]]) is unchanged for gray
    * inputs; for color inputs it computes Rec.601 from the preserved
    * channels, which is the intended definition. */
  def scaleTo(img: BufferedImage, w: Int, h: Int): BufferedImage = {
    val outType = img.getType match {
      case BufferedImage.TYPE_CUSTOM | BufferedImage.TYPE_BYTE_INDEXED |
          BufferedImage.TYPE_BYTE_BINARY => BufferedImage.TYPE_INT_RGB
      case t => t
    }
    val out = new BufferedImage(w, h, outType)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** Rec.601 luma of the image scaled to 32×32 — pHash's canonical
    * frame, row-major. The HASH path normalizes independently of the
    * resize path: the 32×32 frame always draws into a fixed
    * `TYPE_BYTE_GRAY` target (NOT [[scaleTo]], which is deliberately
    * color-preserving for the resize OPERATOR), so the perceptual
    * signature is colorspace-invariant — a grayscale render and an RGB
    * render of the same picture interpolate through the same target
    * space and land within the tone-mapping rounding budget (measured
    * ≤2 Hamming bits in ExtSpec) instead of drifting ~4 bits when one
    * scales in linear gray and the other in sRGB. Gray (not RGB) is the
    * fixed target because the hash IS a luma extraction, and because
    * the gray→sRGB tone map's steep shadow slope would amplify JPEG
    * noise for grayscale sources (measured: 8-bit drift on a JPEG
    * re-encode twin vs ≤7 budget with an RGB target). */
  def luma32(img: BufferedImage): Array[Double] = {
    val s = new BufferedImage(32, 32, BufferedImage.TYPE_BYTE_GRAY)
    val g = s.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_INTERPOLATION,
        RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, 32, 32, null)
    } finally g.dispose()
    val out = new Array[Double](32 * 32)
    var y = 0
    while (y < 32) {
      var x = 0
      while (x < 32) {
        val rgb = s.getRGB(x, y)
        out(y * 32 + x) = 0.299 * ((rgb >> 16) & 0xff) +
          0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
        x += 1
      }
      y += 1
    }
    out
  }

  /** DCT-II basis for N=32, flattened [u][x]. */
  private lazy val dctCos: Array[Double] = {
    val t = new Array[Double](32 * 32)
    var u = 0
    while (u < 32) {
      var x = 0
      while (x < 32) {
        t(u * 32 + x) = math.cos((2 * x + 1) * u * math.Pi / 64.0)
        x += 1
      }
      u += 1
    }
    t
  }

  /** Classic 64-bit perceptual hash: 32×32 luma → separable 2D DCT-II →
    * top-left 8×8 low-frequency block → bit per coefficient above the
    * block median (median over the 63 non-DC coefficients; the DC bit is
    * then structurally 1 — the standard convention, one always-set bit
    * of 64). Robust to JPEG re-encode, rescale, and small local edits;
    * unrelated images land ~32 bits apart. */
  def phash64(img: BufferedImage): Long = {
    val l = luma32(img)
    // rows then cols; only the first 8 output frequencies of each pass
    // are ever read, so compute just those (8/32 of the work)
    val rows = new Array[Double](8 * 32) // [u][y]: DCT over x per row y
    var y = 0
    while (y < 32) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 32) { s += l(y * 32 + x) * dctCos(u * 32 + x); x += 1 }
        rows(u * 32 + y) = s
        u += 1
      }
      y += 1
    }
    val block = new Array[Double](64) // [v][u]
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 32) { s += rows(u * 32 + yy) * dctCos(v * 32 + yy); yy += 1 }
        block(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val sorted = java.util.Arrays.copyOfRange(block, 1, 64)
    java.util.Arrays.sort(sorted)
    val median = (sorted(30) + sorted(31)) / 2.0
    var bits = 0L
    var i = 0
    while (i < 64) { if (block(i) > median) bits |= 1L << i; i += 1 }
    bits
  }

  /** pHash straight from encoded bytes; None if the payload doesn't
    * decode. */
  def phash64(content: Array[Byte]): Option[Long] =
    decodeImage(content).map(phash64)

  /** 8×8 mean-pooled luma thumbnail (row-major, rounded to unsigned
    * bytes) — the compact EXACT-VERIFY payload for perceptual lookups:
    * pHash compares DCT coefficient signs, so structurally-aligned but
    * visibly-different images can land inside a small Hamming budget
    * (the fixture family measures such collisions at ~7e-5 per pair);
    * a candidate must also agree pixel-wise before it counts as a dup.
    * 64 bytes/asset keeps a 10⁷-image history index under a GB. */
  def lumaThumb8(img: BufferedImage): Array[Byte] = {
    val l = luma32(img)
    val out = new Array[Byte](64)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        var s = 0.0
        var y = by * 4
        while (y < by * 4 + 4) {
          var x = bx * 4
          while (x < bx * 4 + 4) { s += l(y * 32 + x); x += 1 }
          y += 1
        }
        out(by * 8 + bx) = math.round(s / 16.0).toInt.min(255).toByte
        bx += 1
      }
      by += 1
    }
    out
  }

  /** Mean absolute error between two 8×8 luma thumbnails (unsigned
    * byte semantics); MaxValue on shape mismatch. */
  def thumbMae(a: Array[Byte], b: Array[Byte]): Double = {
    if (a == null || b == null || a.length != 64 || b.length != 64)
      return Double.MaxValue
    var s = 0
    var i = 0
    while (i < 64) { s += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1 }
    s / 64.0
  }

  // -------------------------------------------------------------- audio

  /** Decode a WAV payload to PCM16 mono samples (multi-channel input is
    * averaged down); None on malformed bytes. */
  def decodeWavSamples(content: Array[Byte]): Option[Array[Short]] = {
    if (content == null || content.length == 0) None
    else {
      decodeCalls.increment()
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(content))
        try {
          val fmt = in.getFormat
          if (fmt.getSampleSizeInBits != 16) None
          else {
            val bytes = in.readAllBytes()
            val ch = fmt.getChannels
            val be = fmt.isBigEndian
            val nFrames = bytes.length / (2 * ch)
            val out = new Array[Short](nFrames)
            var f = 0
            while (f < nFrames) {
              var acc = 0
              var c = 0
              while (c < ch) {
                val o = (f * ch + c) * 2
                val s =
                  if (be) ((bytes(o) << 8) | (bytes(o + 1) & 0xff)).toShort
                  else ((bytes(o + 1) << 8) | (bytes(o) & 0xff)).toShort
                acc += s
                c += 1
              }
              out(f) = (acc / ch).toShort
              f += 1
            }
            Some(out)
          }
        } finally in.close()
      } catch { case _: Exception => None }
    }
  }

  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate.toFloat, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      raw(2 * i) = (samples(i) & 0xff).toByte
      raw(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val stream = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val bos = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(stream,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** In-place iterative radix-2 complex FFT (Cooley–Tukey); length must
    * be a power of two. The naive O(n²) DFT this replaced cost ~1M trig
    * evaluations per asset and dominated the whole multimodal bench
    * family (measured 38.7 s for 5000-asset feature extraction at
    * sf0.1; ~1.5 s with the FFT). */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(im.length == n && (n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2 * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr0 = re(base + k + len / 2); val vi0 = im(base + k + len / 2)
          val vr = vr0 * cr - vi0 * ci
          val vi = vr0 * ci + vi0 * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Per-window 32-bit sub-band fingerprints over the sample stream
    * (window/stride in samples; window must be a power of two for the
    * FFT). Bit b = sign of the log-energy difference between adjacent
    * sub-bands b and b+1 of a Hann-windowed FFT — 33 bands over bins
    * [1, window/2), so a uniform gain change flips nothing. Windows are
    * content-addressed downstream (the overlap join matches signature
    * VALUES, not positions), so a stride-aligned trim still matches
    * every surviving window. */
  def audioFingerprints(samples: Array[Short], window: Int = 256,
      stride: Int = 256): Array[Long] = {
    require(window >= 64 && (window & (window - 1)) == 0 && stride >= 1,
      s"bad window/stride ($window, $stride)")
    if (samples == null || samples.length < window) return Array.emptyLongArray
    val nBands = 33
    val half = window / 2
    val hann = Array.tabulate(window)(i =>
      0.5 - 0.5 * math.cos(2 * math.Pi * i / (window - 1)))
    // band b covers FFT bins [1 + b·(half−1)/nBands, 1 + (b+1)·(half−1)/nBands)
    val bandOf = Array.tabulate(half)(k =>
      if (k == 0) -1 else math.min(nBands - 1, (k - 1) * nBands / (half - 1)))
    val out = Array.newBuilder[Long]
    val re = new Array[Double](window)
    val im = new Array[Double](window)
    var off = 0
    while (off + window <= samples.length) {
      var i = 0
      while (i < window) {
        re(i) = samples(off + i) * hann(i); im(i) = 0.0
        i += 1
      }
      fft(re, im)
      val bandE = new Array[Double](nBands)
      var k = 1
      while (k < half) {
        bandE(bandOf(k)) += re(k) * re(k) + im(k) * im(k)
        k += 1
      }
      var sig = 0L
      var b = 0
      while (b < nBands - 1) {
        if (math.log(bandE(b) + 1e-9) - math.log(bandE(b + 1) + 1e-9) > 0)
          sig |= 1L << b
        b += 1
      }
      out += sig
      off += stride
    }
    out.result()
  }

  /** Fingerprints straight from an encoded WAV payload; empty if the
    * payload doesn't decode. */
  def audioFingerprints(content: Array[Byte]): Array[Long] =
    decodeWavSamples(content)
      .map(audioFingerprints(_))
      .getOrElse(Array.emptyLongArray)

  // -------------------------------------------------------------- video

  private val FrameMagic = Array[Byte]('G', 'F', 'R', 'M')

  /** Length-prefixed PNG-frame container: magic ∥ int32 frame count ∥
    * (int32 length ∥ PNG bytes)*. Big-endian ints. */
  def encodeFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.write(FrameMagic)
    out.writeInt(frames.length)
    frames.foreach { f => out.writeInt(f.length); out.write(f) }
    out.flush()
    bos.toByteArray
  }

  /** Parse the frame container back to per-frame PNG payloads; Nil on
    * any structural corruption (bad magic, truncated frame, absurd
    * length). */
  def decodeFrames(content: Array[Byte]): Seq[Array[Byte]] = {
    if (content == null || content.length < 8) return Nil
    if (!content.take(4).sameElements(FrameMagic)) return Nil
    try {
      val in = new java.io.DataInputStream(
        new ByteArrayInputStream(content, 4, content.length - 4))
      val n = in.readInt()
      if (n < 0 || n > 100000) return Nil
      val frames = Vector.newBuilder[Array[Byte]]
      var i = 0
      while (i < n) {
        val len = in.readInt()
        if (len < 0 || len > content.length) return Nil
        val buf = new Array[Byte](len)
        in.readFully(buf)
        frames += buf
        i += 1
      }
      frames.result()
    } catch { case _: Exception => Nil }
  }

  // ---------------------------------------------------------- synthesis

  /** Smooth deterministic grayscale field: two seeded sinusoids with
    * CONTINUOUS frequencies/phases/amplitudes (so distinct seeds give
    * genuinely distinct images — a small discrete parameter set would
    * plant accidental near-dups), plus a time parameter `t` that drifts
    * the second component for video frames. */
  def synthImage(seed: Long, w: Int, h: Int, t: Double = 0.0): BufferedImage = {
    val rnd = new java.util.Random(seed)
    val f1x = 0.5 + 3.0 * rnd.nextDouble(); val f1y = 0.5 + 3.0 * rnd.nextDouble()
    val f2x = 0.5 + 3.0 * rnd.nextDouble(); val f2y = 0.5 + 3.0 * rnd.nextDouble()
    val p1 = 2 * math.Pi * rnd.nextDouble(); val p2 = 2 * math.Pi * rnd.nextDouble()
    val p3 = 2 * math.Pi * rnd.nextDouble()
    val a1 = 40 + 30 * rnd.nextDouble(); val a2 = 25 + 20 * rnd.nextDouble()
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = 128 +
          a1 * math.sin(2 * math.Pi * f1x * x / w + p1) *
            math.cos(2 * math.Pi * f1y * y / h + p2) +
          a2 * math.sin(2 * math.Pi * (f2x * x / w + f2y * y / h) + p3 + t)
        raster.setSample(x, y, 0, math.max(0, math.min(255, v.round.toInt)))
        x += 1
      }
      y += 1
    }
    img
  }

  def synthImageBytes(seed: Long, w: Int, h: Int): Array[Byte] =
    encodePng(synthImage(seed, w, h))

  /** Deterministic PCM16 clip, real WAV-encoded: three CHIRPED
    * sinusoids (instantaneous frequency sweeps over the clip, so
    * successive fingerprint windows see different spectra — a
    * stationary tone would collapse every window to one signature) over
    * a low deterministic noise floor (broadband energy in every
    * sub-band, which raises the fingerprint's effective entropy across
    * assets). All parameters are seeded-continuous, so distinct seeds
    * give genuinely distinct clips. */
  def synthWavBytes(seed: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val rnd = new java.util.Random(seed)
    val fs = Array.fill(3)(200.0 + 2600.0 * rnd.nextDouble())
    val ps = Array.fill(3)(2 * math.Pi * rnd.nextDouble())
    val as0 = Array.fill(3)(0.12 + 0.08 * rnd.nextDouble())
    val chirp = Array.fill(3)(0.2 + 0.4 * rnd.nextDouble())
    var noise = seed ^ 0x5deece66dL
    val samples = new Array[Short](nSamples)
    var i = 0
    while (i < nSamples) {
      var v = 0.0
      var k = 0
      while (k < 3) {
        v += as0(k) * math.sin(
          2 * math.Pi * fs(k) * (1.0 + chirp(k) * i / nSamples) * i / sampleRate + ps(k))
        k += 1
      }
      noise = noise * 6364136223846793005L + 1442695040888963407L
      v += 0.03 * ((noise >>> 40).toInt / 8388608.0 - 1.0)
      samples(i) = (v * 32767).toShort
      i += 1
    }
    encodeWav(samples, sampleRate)
  }

  /** Deterministic frame-container clip: `nFrames` real 32×32 PNG
    * frames of the seed's image field drifting in `t`. (32×32 — the
    * pHash canonical frame — keeps per-frame JPEG-re-encode artifacts
    * proportionally realistic; at 16×16 the upscale doubles artifact
    * energy in the low-frequency block and re-encode distances leave
    * the Hamming budget.) */
  def synthVideoBytes(seed: Long, nFrames: Int): Array[Byte] =
    encodeFrames((0 until nFrames).map(i =>
      encodePng(synthImage(seed, 32, 32, t = i * 0.3))))
}

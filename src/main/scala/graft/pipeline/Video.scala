package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.rel.Queries.{spread, table}

/** GVC — an entropy-coded, MOTION-COMPENSATED video codec, the layer the
  * reference corpus stack never reaches (its media handling stops at
  * whole-file bytes; see `/root/reference/src/master/file_shard.h:64`'s
  * byte-oriented sharding — no decode at all). This retires the last
  * byte-histogram stand-in tier: after r14's y4m container parse moved
  * video CONTAINERS to a real decode, the CODEC itself — temporal
  * prediction + entropy coding — is what remained.
  *
  * Structure is MPEG-1-class (ISO/IEC 11172-2's public layering):
  *  - 16×16 macroblocks over 4:2:0 planes (four 8×8 Y blocks + Cb + Cr),
  *  - I-frames: all-intra, DCT blocks with per-component DC prediction,
  *  - P-frames: per-macroblock SKIP runs (copy co-located), INTRA
  *    refresh blocks, and INTER blocks carrying a differentially-coded
  *    forward motion vector in EITHER of MPEG-1's two precisions — a
  *    per-frame flag selects full-pel (`full_pel_forward_vector = 1`)
  *    or HALF-PEL units (`= 0`, the spec's default), the latter
  *    predicting through 2-/4-neighbor averaging with half rounded away
  *    from zero — plus a coded-block pattern and entropy-coded DCT
  *    residuals added onto the motion-compensated prediction,
  *  - slice-style resync: byte-aligned restart markers every
  *    `restartRows` macroblock rows, resetting DC predictors, the MV
  *    predictor, and the skip state — the parallel-decode entry points
  *    a 100 TB corpus needs,
  *  - MPEG-1's prediction-reset discipline: DC predictors reset at
  *    segment start and at any non-intra macroblock; the MV predictor
  *    resets at segment start, at intra macroblocks, and at skips; a
  *    skip run may not cross a segment boundary and the last macroblock
  *    of every segment must be coded (the "slice ends on a coded
  *    macroblock" rule).
  *
  * The ONE deliberate divergence from MPEG-1, chosen for verifiability:
  * the entropy layer uses IN-STREAM canonical Huffman tables (JPEG
  * DHT-style segments, decoded by the same canonical-rebuild machinery
  * the four JPEG tiers already prove) instead of MPEG-1's fixed B-series
  * VLC tables. Transcribing those ~250 fixed entries from memory with no
  * conformance streams in this container would risk a silent shared typo
  * between encoder and decoder that NO gate could catch; in-stream
  * tables keep every entropy bit verifiable end-to-end. Byte transport
  * is likewise JPEG-style (0xFF00 stuffing, marker-delimited segments)
  * rather than MPEG start codes, because start-code emulation prevention
  * cannot be guaranteed under arbitrary in-stream tables. Both choices
  * are format-level, not codec-level: the motion compensation, skip/CBP
  * macroblock economy, prediction resets, and resync semantics are the
  * MPEG-1 ones.
  *
  * The corpus is synthesized in the (quantized coefficient, motion
  * vector, macroblock mode) domain by pure integer formulas, so decode
  * is bit-exact predictable and the q180 oracle can replay the ENTIRE
  * reconstruction — dequant, the shared exact integer IDCT, motion
  * compensation with clamped in-picture vectors, residual add, clipping,
  * frame recursion — in SQL without touching bytes.
  */
object Video {

  // ---- stream constants ---------------------------------------------------

  /** Sequence-header marker (APP9-class, length-prefixed). */
  private val MarkerSeq = 0xE9
  /** Frame-header marker (length-prefixed; entropy data follows). */
  private val MarkerFrame = 0xEA

  private val FrameI = 0
  private val FrameP = 1
  private val FrameB = 2

  /** Macroblock modes (symbol-domain representation). */
  private[pipeline] val ModeSkip = 0
  private[pipeline] val ModeInter = 1
  private[pipeline] val ModeIntra = 2
  private[pipeline] val ModeFwd = 3 // B: forward prediction only
  private[pipeline] val ModeBwd = 4 // B: backward prediction only
  private[pipeline] val ModeInterp = 5 // B: (fwd + bwd + 1) >> 1

  /** Control-table symbols: 0..14 = direct skip-run terminal, 15 =
    * escape (adds 15 + the next 8 raw bits, repeatable), then the mode
    * symbols (P: inter/intra; B: intra/fwd/bwd/interpolated). All 21 at
    * code length 5 (canonical assignment).
    */
  private val CtlEscape = 15
  private val CtlInter = 16
  private val CtlIntra = 17
  private val CtlFwd = 18
  private val CtlBwd = 19
  private val CtlInterp = 20
  private val CtlBits: Array[Int] = { val a = new Array[Int](16); a(4) = 21; a }
  private val CtlVals: Array[Int] = (0 to 20).toArray

  /** DHT table ids within the stream: class 0 (size-category style) id
    * 0 = intra DC diffs, id 1 = MV diffs, id 2 = control; class 1 id
    * 0 = run/size for all AC and residual coefficients.
    */
  private val TblDc = 0
  private val TblMv = 1
  private val TblCtl = 2

  // ---- corpus synthesis formulas (mirrored by the q180 oracle) -----------

  def gvcWidth(docId: Long): Int = (16 * (1 + docId % 3)).toInt // 16/32/48
  def gvcHeight(docId: Long): Int = (16 * (1 + docId % 2)).toInt // 16/32
  val GvcFrames = 4 // I + 3 P
  /** Restart interval in MB rows for the synthesized corpus (the decoder
    * accepts any value, including 0 = none; properties vary it).
    */
  val GvcRestartRows = 1
  /** Per-frame quantizer scale (sequence quant table × this). */
  def gvcQScale(docId: Long, f: Int): Int = (1 + (docId + f) % 2).toInt
  /** Per-frame motion precision: alternates so every doc carries both
    * MPEG-1 MV modes (full-pel and half-pel P-frames).
    */
  def gvcFullPel(docId: Long, f: Int): Boolean = (docId + f) % 2 == 0
  /** Base quant table at NATURAL position (u, v) — same family as the
    * JPEG corpora so the oracle's multiplier stays one expression.
    */
  def gvcQuant(u: Int, v: Int): Int = 1 + (u * 3 + v * 5) % 8

  /** Macroblock mode in P-frame `f` (f >= 1) at MB (mx, my). The last MB
    * of each row is never skipped (the slice rule; corpus restart
    * segments are single rows).
    */
  def gvcMode(docId: Long, f: Int, mx: Int, my: Int, mbw: Int): Int = {
    val r = (docId * 7 + f * 11 + mx * 13 + my * 17) % 8
    if (r < 2 && mx < mbw - 1) ModeSkip
    else if (r == 2) ModeIntra
    else ModeInter
  }

  /** Raw (unclamped) MV components for an INTER MB, in the frame's
    * vector units: even full-pel values for full-pel frames, any-parity
    * half-pel values for half-pel frames (odd values exercise the
    * interpolation).
    */
  private def gvcMvRaw(docId: Long, f: Int, mbi: Int): (Int, Int) =
    if (gvcFullPel(docId, f))
      ((2 * ((docId * 3 + f * 5 + mbi * 7) % 7 - 3)).toInt,
        (2 * ((docId * 5 + f * 7 + mbi * 11) % 7 - 3)).toInt)
    else
      (((docId * 3 + f * 5 + mbi * 7) % 13 - 6).toInt,
        ((docId * 5 + f * 7 + mbi * 11) % 13 - 6).toInt)

  /** In-picture clamp: the 16×16 block shifted by the MV (including the
    * +1 interpolation neighbor for half-pel) must stay inside the frame
    * (MPEG-1 vectors never reference out-of-picture pels). In half-pel
    * units the legal range is [-32·mx, 32·(mbw-1-mx)]; full-pel frames
    * use the same bound halved.
    */
  def gvcMv(docId: Long, f: Int, mx: Int, my: Int, mbw: Int, mbh: Int): (Int, Int) = {
    val mbi = my * mbw + mx
    val (rx, ry) = gvcMvRaw(docId, f, mbi)
    val s = if (gvcFullPel(docId, f)) 16 else 32
    (math.max(-s * mx, math.min(s * (mbw - 1 - mx), rx)),
      math.max(-s * my, math.min(s * (mbh - 1 - my), ry)))
  }

  /** Intra-block quantized coefficient at NATURAL (u, v); support is
    * restricted to u < 4 && v < 4 (the oracle's 16-term IDCT window).
    * `c` = component (0 Y, 1 Cb, 2 Cr), `b` = global block index on the
    * component's block grid.
    */
  def gvcIntraCoef(docId: Long, f: Int, c: Int, b: Int, u: Int, v: Int): Int =
    if (u >= 4 || v >= 4) 0
    else if (u == 0 && v == 0) ((docId * 11 + f * 19 + c * 23 + b * 5) % 15 - 7).toInt
    else if ((docId * 29 + f * 13 + c * 37 + b * 23 + u * 11 + v * 7) % 89 < 11)
      ((docId * 13 + f * 17 + c * 7 + b * 19 + u * 19 + v * 5) % 13 - 6).toInt
    else 0

  /** Inter-residual quantized coefficient at NATURAL (u, v) — DC is just
    * coefficient (0,0) here (non-intra blocks carry no DC prediction).
    */
  def gvcResCoef(docId: Long, f: Int, c: Int, b: Int, u: Int, v: Int): Int =
    if (u >= 4 || v >= 4) 0
    else if ((docId * 17 + f * 23 + c * 13 + b * 29 + u * 7 + v * 19) % 97 < 13)
      ((docId * 7 + f * 29 + c * 11 + b * 13 + u * 5 + v * 17) % 15 - 7).toInt
    else 0

  // ---- q181 (B-frame) corpus formulas -------------------------------------

  /** The B corpus's fixed GOP: display [I, B, P, P] — the B at display 1
    * references the I (forward) and the display-2 P (backward); frames
    * travel in coding order [I, P(2), B(1), P(3)].
    */
  val GvcBDisplayOfCoding: Array[Int] = Array(0, 2, 1, 3)

  /** B-macroblock mode at MB (mx, my) — forward / backward /
    * interpolated / intra refresh (B-frames carry no skips in this
    * corpus; see the encoder's B divergence note).
    */
  def gvcBMode(docId: Long, mx: Int, my: Int): Int = {
    val r = (docId * 23 + mx * 29 + my * 31) % 9
    if (r < 3) ModeFwd else if (r < 6) ModeBwd else if (r < 8) ModeInterp
    else ModeIntra
  }

  /** Raw backward MV for the B frame, in its (display-1) frame units. */
  private def gvcBMvBwdRaw(docId: Long, mbi: Int): (Int, Int) =
    if (gvcFullPel(docId, 1))
      ((2 * ((docId * 7 + mbi * 5 + 11) % 7 - 3)).toInt,
        (2 * ((docId * 11 + mbi * 3 + 13) % 7 - 3)).toInt)
    else
      (((docId * 7 + mbi * 5 + 11) % 13 - 6).toInt,
        ((docId * 11 + mbi * 3 + 13) % 13 - 6).toInt)

  /** Clamped backward MV (same in-picture bound as [[gvcMv]]). */
  def gvcBMvBwd(docId: Long, mx: Int, my: Int, mbw: Int, mbh: Int): (Int, Int) = {
    val (rx, ry) = gvcBMvBwdRaw(docId, my * mbw + mx)
    val s = if (gvcFullPel(docId, 1)) 16 else 32
    (math.max(-s * mx, math.min(s * (mbw - 1 - mx), rx)),
      math.max(-s * my, math.min(s * (mbh - 1 - my), ry)))
  }

  // ---- shared small pieces ------------------------------------------------

  /** Natural-order residual IDCT: the intra IDCT's arithmetic WITHOUT
    * the +128 level shift, clamped to the spec-flavored [-256, 255]
    * (intra reuses [[Multimodal.jpegIdctBlock]] verbatim).
    */
  private[pipeline] def gvcIdctResidual(coefs: Array[Int], quantZigzag: Array[Int]): Array[Int] = {
    val deq = new Array[Long](64)
    var k = 0
    while (k < 64) {
      val nat = Multimodal.JpegZigzag(k)
      deq(nat) = coefs(nat).toLong * quantZigzag(k)
      k += 1
    }
    val px = new Array[Int](64)
    var ly = 0
    while (ly < 8) {
      var lx = 0
      while (lx < 8) {
        var sum = 0L
        var v = 0
        while (v < 8) {
          val kv = Multimodal.JpegIdctK(v)(ly)
          var u = 0
          while (u < 8) {
            val d = deq(v * 8 + u)
            if (d != 0) sum += d * Multimodal.JpegIdctK(u)(lx) * kv
            u += 1
          }
          v += 1
        }
        val p = Math.floorDiv(sum + (1L << 23), 1L << 24)
        px(ly * 8 + lx) = math.max(-256L, math.min(255L, p)).toInt
        lx += 1
      }
      ly += 1
    }
    px
  }

  /** Run/size entropy coding of a RESIDUAL block: all 64 coefficients in
    * zigzag order through the (run, size) alphabet — position 0 is an
    * ordinary coefficient (no DC prediction), exactly MPEG-1's non-intra
    * block economy. EOB terminates; ZRL covers runs > 15.
    */
  private def gvcWriteResidual(
      bw: Multimodal.JpegBitWriter, acCodes: Map[Int, (Int, Int)],
      coefs: Array[Int]): Unit = {
    var run = 0
    var k = 0
    while (k < 64) {
      val c = coefs(Multimodal.JpegZigzag(k))
      if (c == 0) run += 1
      else {
        while (run > 15) { val (z, zl) = acCodes(0xF0); bw.write(z, zl); run -= 16 }
        val cs = Multimodal.jpegCategory(c)
        require(cs <= 3, s"residual value $c exceeds the table's size categories")
        val (ac, al) = acCodes((run << 4) | cs)
        bw.write(ac, al)
        bw.write(if (c < 0) c + (1 << cs) - 1 else c, cs)
        run = 0
      }
      k += 1
    }
    if (run > 0) { val (e, el) = acCodes(0x00); bw.write(e, el) }
  }

  private def gvcReadResidual(
      br: Multimodal.JpegBitReader, acTab: Multimodal.JpegHuffTable): Array[Int] = {
    val coefs = new Array[Int](64)
    var k = 0
    var eob = false
    while (k < 64 && !eob) {
      val rs = acTab.decode(br)
      val run = rs >> 4; val size = rs & 0x0F
      if (size == 0) { if (run == 15) k += 16 else eob = true }
      else {
        k += run
        require(k < 64, "residual run overflows the block")
        coefs(Multimodal.JpegZigzag(k)) = Multimodal.jpegExtend(br.receive(size), size)
        k += 1
      }
    }
    coefs
  }

  // ---- encoder ------------------------------------------------------------

  /** One frame's content, in the codec's symbol domain — what the
    * encoder writes and the structural decode recovers bit-exactly.
    * `modes`/`mvs` are per-MB (raster); I-frames carry all-[[ModeIntra]]
    * modes and zero MVs. `fullPel` selects the frame's MV precision
    * (`mvs` are in those units). `coefs(c)(b)` are natural-order 64-int
    * arrays on component c's block grid: intra coefficients for intra
    * blocks, residuals for inter (all-zero where CBP says uncoded /
    * skipped).
    */
  final case class GvcFrameData(
      ftype: Int, qScale: Int, fullPel: Boolean,
      modes: Array[Int], mvs: Array[(Int, Int)],
      coefs: Array[Array[Array[Int]]],
      /** Display position (frames travel in CODING order; -1 = use the
        * coding position — anchors-only streams need no reorder).
        */
      temporalRef: Int = -1,
      /** B-frame backward vectors (`mvs` carry the forward ones); null
        * for anchor frames.
        */
      bmvs: Array[(Int, Int)] = null)

  /** Synthesize frame data for `docId`, frame `f`, from the formulas. */
  private[pipeline] def gvcSynthesize(docId: Long, f: Int): GvcFrameData = {
    val w = gvcWidth(docId); val h = gvcHeight(docId)
    val mbw = w / 16; val mbh = h / 16
    val bw0 = w / 8
    val nMb = mbw * mbh
    val modes = new Array[Int](nMb)
    val mvs = new Array[(Int, Int)](nMb)
    val coefs = Array(
      Array.fill(bw0 * (h / 8))(new Array[Int](64)),
      Array.fill(nMb)(new Array[Int](64)),
      Array.fill(nMb)(new Array[Int](64)))
    var my = 0
    while (my < mbh) {
      var mx = 0
      while (mx < mbw) {
        val mbi = my * mbw + mx
        val mode = if (f == 0) ModeIntra else gvcMode(docId, f, mx, my, mbw)
        modes(mbi) = mode
        mvs(mbi) = if (mode == ModeInter) gvcMv(docId, f, mx, my, mbw, mbh) else (0, 0)
        if (mode != ModeSkip) {
          val fill: (Int, Int, Int, Int) => Int =
            if (mode == ModeIntra) gvcIntraCoef(docId, f, _, _, _, _)
            else gvcResCoef(docId, f, _, _, _, _)
          var bi = 0
          while (bi < 4) {
            val b = (my * 2 + bi / 2) * bw0 + (mx * 2 + bi % 2)
            var v = 0
            while (v < 4) {
              var u = 0
              while (u < 4) { coefs(0)(b)(v * 8 + u) = fill(0, b, u, v); u += 1 }
              v += 1
            }
            bi += 1
          }
          var c = 1
          while (c <= 2) {
            var v = 0
            while (v < 4) {
              var u = 0
              while (u < 4) { coefs(c)(mbi)(v * 8 + u) = fill(c, mbi, u, v); u += 1 }
              v += 1
            }
            c += 1
          }
        }
        mx += 1
      }
      my += 1
    }
    GvcFrameData(if (f == 0) FrameI else FrameP, gvcQScale(docId, f),
      gvcFullPel(docId, f), modes, mvs, coefs)
  }

  /** Coded-block pattern of an inter MB: bit (5-i) set iff block i of
    * (Y0, Y1, Y2, Y3, Cb, Cr) carries any nonzero residual — CBP is a
    * pure bitstream economy (uncoded ≡ zero residual), so the recon
    * oracle never needs it.
    */
  private def cbpOf(fd: GvcFrameData, mbi: Int, mx: Int, my: Int, bw0: Int): Int = {
    var p = 0
    var bi = 0
    while (bi < 4) {
      val b = (my * 2 + bi / 2) * bw0 + (mx * 2 + bi % 2)
      if (fd.coefs(0)(b).exists(_ != 0)) p |= 1 << (5 - bi)
      bi += 1
    }
    if (fd.coefs(1)(mbi).exists(_ != 0)) p |= 2
    if (fd.coefs(2)(mbi).exists(_ != 0)) p |= 1
    p
  }

  /** Encode ARBITRARY frame data as a conformant GVC stream — split out
    * of [[gvcEncode]] so the property suite can round-trip arbitrary
    * mode/MV/coefficient grids under arbitrary restart intervals.
    */
  private[pipeline] def gvcEncodeStream(
      w: Int, h: Int, frames: Seq[GvcFrameData], restartRows: Int): Array[Byte] = {
    require(w % 16 == 0 && h % 16 == 0 && w > 0 && h > 0, "dims must be MB-aligned")
    require(frames.nonEmpty && frames.length <= 255 &&
      restartRows >= 0 && restartRows <= 255,
      "frame count / restart interval must fit a byte")
    val mbw = w / 16; val mbh = h / 16; val bw0 = w / 8
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xFF); out.write(0xD8) // SOI

    // sequence header: magic, dims, frame count, restart rows, quant
    val seq = new java.io.ByteArrayOutputStream()
    seq.write('G'); seq.write('V'); seq.write('C'); seq.write('1')
    seq.write(w >> 8); seq.write(w & 0xFF); seq.write(h >> 8); seq.write(h & 0xFF)
    seq.write(frames.length); seq.write(restartRows)
    var k = 0
    while (k < 64) {
      val nat = Multimodal.JpegZigzag(k)
      seq.write(gvcQuant(nat % 8, nat / 8)); k += 1
    }
    Multimodal.marker(out, MarkerSeq, seq.toByteArray)

    // DHT: four canonical tables (C.2 assignment both sides)
    def dht(tc: Int, th: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
      (Array((tc << 4) | th) ++ bits ++ vals).map(_.toByte)
    Multimodal.marker(out, 0xC4,
      dht(0, TblDc, Multimodal.JpegDcBits, Multimodal.JpegDcVals) ++
        dht(0, TblMv, Multimodal.JpegDcBits, Multimodal.JpegDcVals) ++
        dht(0, TblCtl, CtlBits, CtlVals) ++
        dht(1, 0, Multimodal.JpegAcBits, Multimodal.JpegAcVals))
    val dcCodes = Multimodal.huffAssign(Multimodal.JpegDcBits, Multimodal.JpegDcVals)
    val ctlCodes = Multimodal.huffAssign(CtlBits, CtlVals)
    val acCodes = Multimodal.huffAssign(Multimodal.JpegAcBits, Multimodal.JpegAcVals)

    val trefs = frames.zipWithIndex.map { case (fd, i) =>
      if (fd.temporalRef >= 0) fd.temporalRef else i
    }
    require(trefs.sorted == frames.indices.toList.map(identity),
      "temporal references must be a permutation of 0..n-1")

    frames.zipWithIndex.foreach { case (fd, fIdx) =>
      require(fd.modes.length == mbw * mbh && fd.mvs.length == mbw * mbh &&
        fd.coefs.length == 3 && fd.coefs(0).length == bw0 * (h / 8) &&
        fd.coefs(1).length == mbw * mbh && fd.coefs(2).length == mbw * mbh &&
        fd.coefs.forall(_.forall(_.length == 64)),
        "frame grid mismatch")
      require(if (fIdx == 0) fd.ftype == FrameI else true, "stream must open with an I-frame")
      require(fd.ftype != FrameB || fd.bmvs != null, "B-frame needs backward vectors")
      Multimodal.marker(out, MarkerFrame,
        Array(fd.ftype.toByte, fd.qScale.toByte, (if (fd.fullPel) 1 else 0).toByte,
          trefs(fIdx).toByte))
      val bw = new Multimodal.JpegBitWriter(out)
      var rstM = 0
      val dcPred = new Array[Int](3)
      var mvPredX = 0; var mvPredY = 0 // P inter / B forward predictor
      var bwdPredX = 0; var bwdPredY = 0 // B backward predictor
      var pendingSkip = 0

      def writeMvDiff(d: Int): Unit = {
        val s = Multimodal.jpegCategory(d)
        require(s <= 4, s"MV diff $d exceeds the table's categories")
        val (c0, l0) = dcCodes(s); bw.write(c0, l0)
        if (s > 0) bw.write(if (d < 0) d + (1 << s) - 1 else d, s)
      }

      def requireInPicture(mvx: Int, mvy: Int, mx: Int, my: Int): Unit = {
        // half-pel-unit bound: the block span plus the +1 interpolation
        // neighbor must stay in picture
        val evx = if (fd.fullPel) 2 * mvx else mvx
        val evy = if (fd.fullPel) 2 * mvy else mvy
        require(evx >= -32 * mx && evx <= 32 * (mbw - 1 - mx) &&
          evy >= -32 * my && evy <= 32 * (mbh - 1 - my),
          "motion vector references out-of-picture pels")
      }

      def writeResiduals(mbi: Int, mx: Int, my: Int): Unit = {
        val pat = cbpOf(fd, mbi, mx, my, bw0)
        bw.write(pat, 6)
        var bi = 0
        while (bi < 4) {
          val b = (my * 2 + bi / 2) * bw0 + (mx * 2 + bi % 2)
          if ((pat & (1 << (5 - bi))) != 0) gvcWriteResidual(bw, acCodes, fd.coefs(0)(b))
          bi += 1
        }
        var c = 1
        while (c <= 2) {
          if ((pat & (1 << (2 - c))) != 0) gvcWriteResidual(bw, acCodes, fd.coefs(c)(mbi))
          c += 1
        }
      }

      def writeIntraBlocks(mx: Int, my: Int, mbi: Int): Unit = {
        var bi = 0
        while (bi < 4) {
          val b = (my * 2 + bi / 2) * bw0 + (mx * 2 + bi % 2)
          dcPred(0) = Multimodal.jpegWriteBlock(bw, dcCodes, acCodes, fd.coefs(0)(b), dcPred(0))
          bi += 1
        }
        var c = 1
        while (c <= 2) {
          dcPred(c) = Multimodal.jpegWriteBlock(bw, dcCodes, acCodes, fd.coefs(c)(mbi), dcPred(c))
          c += 1
        }
      }

      var my = 0
      while (my < mbh) {
        var mx = 0
        while (mx < mbw) {
          val mbi = my * mbw + mx
          val mode = fd.modes(mbi)
          if (fd.ftype == FrameI) {
            require(mode == ModeIntra, "I-frames are all-intra")
            writeIntraBlocks(mx, my, mbi)
          } else if (fd.ftype == FrameB) {
            // B macroblock: bare mode symbol (no skip-run field — B-skip
            // would reuse the previous MB's prediction; this codec
            // rejects it rather than approximate, see gvcDecodeRaw)
            mode match {
              case ModeIntra =>
                val (mc, ml) = ctlCodes(CtlIntra); bw.write(mc, ml)
                mvPredX = 0; mvPredY = 0; bwdPredX = 0; bwdPredY = 0
                writeIntraBlocks(mx, my, mbi)
              case ModeFwd | ModeBwd | ModeInterp =>
                val (mc, ml) = ctlCodes(mode match {
                  case ModeFwd => CtlFwd
                  case ModeBwd => CtlBwd
                  case _ => CtlInterp
                })
                bw.write(mc, ml)
                java.util.Arrays.fill(dcPred, 0)
                if (mode != ModeBwd) {
                  val (mvx, mvy) = fd.mvs(mbi)
                  requireInPicture(mvx, mvy, mx, my)
                  writeMvDiff(mvx - mvPredX); writeMvDiff(mvy - mvPredY)
                  mvPredX = mvx; mvPredY = mvy
                }
                if (mode != ModeFwd) {
                  val (bx, by) = fd.bmvs(mbi)
                  requireInPicture(bx, by, mx, my)
                  writeMvDiff(bx - bwdPredX); writeMvDiff(by - bwdPredY)
                  bwdPredX = bx; bwdPredY = by
                }
                writeResiduals(mbi, mx, my)
              case m =>
                throw new IllegalArgumentException(s"mode $m not valid in a B-frame")
            }
          } else mode match {
            case ModeSkip =>
              pendingSkip += 1
              mvPredX = 0; mvPredY = 0 // skip resets the MV predictor
              java.util.Arrays.fill(dcPred, 0) // non-intra MB resets DC preds
            case ModeInter | ModeIntra =>
              // skip run (escapes then a direct terminal), then the mode
              var run = pendingSkip
              pendingSkip = 0
              while (run >= CtlEscape) {
                val e = math.min(run - CtlEscape, 255)
                val (ec, el) = ctlCodes(CtlEscape); bw.write(ec, el); bw.write(e, 8)
                run -= CtlEscape + e
              }
              val (rc, rl) = ctlCodes(run); bw.write(rc, rl)
              val (mc, ml) = ctlCodes(if (mode == ModeIntra) CtlIntra else CtlInter)
              bw.write(mc, ml)
              if (mode == ModeIntra) {
                mvPredX = 0; mvPredY = 0 // intra resets the MV predictor
                writeIntraBlocks(mx, my, mbi)
              } else {
                java.util.Arrays.fill(dcPred, 0)
                val (mvx, mvy) = fd.mvs(mbi)
                requireInPicture(mvx, mvy, mx, my)
                writeMvDiff(mvx - mvPredX); writeMvDiff(mvy - mvPredY)
                mvPredX = mvx; mvPredY = mvy
                writeResiduals(mbi, mx, my)
              }
            case m =>
              throw new IllegalArgumentException(s"mode $m not valid in a P-frame")
          }
          mx += 1
        }
        val segmentEnd =
          my + 1 == mbh || (restartRows > 0 && (my + 1) % restartRows == 0)
        if (segmentEnd)
          require(pendingSkip == 0,
            "last macroblock of a restart segment must be coded (slice rule)")
        if (restartRows > 0 && (my + 1) % restartRows == 0 && my + 1 < mbh) {
          bw.restart(rstM); rstM = (rstM + 1) & 7
          java.util.Arrays.fill(dcPred, 0)
          mvPredX = 0; mvPredY = 0
          bwdPredX = 0; bwdPredY = 0
        }
        my += 1
      }
      bw.finish()
    }
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Encode the synthesized clip for `docId`. */
  private[pipeline] def gvcEncode(docId: Long): Array[Byte] =
    gvcEncodeStream(gvcWidth(docId), gvcHeight(docId),
      (0 until GvcFrames).map(f => gvcSynthesize(docId, f)), GvcRestartRows)

  /** Synthesize the B frame (display position 1) of the q181 corpus:
    * fwd/bwd/interpolated/intra macroblocks, forward vectors from the
    * [[gvcMv]] family, backward vectors from [[gvcBMvBwd]], residuals /
    * intra coefficients from the shared formulas at f = 1.
    */
  private[pipeline] def gvcSynthesizeB(docId: Long): GvcFrameData = {
    val w = gvcWidth(docId); val h = gvcHeight(docId)
    val mbw = w / 16; val mbh = h / 16
    val bw0 = w / 8
    val nMb = mbw * mbh
    val modes = new Array[Int](nMb)
    val mvs = Array.fill(nMb)((0, 0))
    val bmvs = Array.fill(nMb)((0, 0))
    val coefs = Array(
      Array.fill(bw0 * (h / 8))(new Array[Int](64)),
      Array.fill(nMb)(new Array[Int](64)),
      Array.fill(nMb)(new Array[Int](64)))
    var my = 0
    while (my < mbh) {
      var mx = 0
      while (mx < mbw) {
        val mbi = my * mbw + mx
        val mode = gvcBMode(docId, mx, my)
        modes(mbi) = mode
        if (mode == ModeFwd || mode == ModeInterp)
          mvs(mbi) = gvcMv(docId, 1, mx, my, mbw, mbh)
        if (mode == ModeBwd || mode == ModeInterp)
          bmvs(mbi) = gvcBMvBwd(docId, mx, my, mbw, mbh)
        val fill: (Int, Int, Int, Int) => Int =
          if (mode == ModeIntra) gvcIntraCoef(docId, 1, _, _, _, _)
          else gvcResCoef(docId, 1, _, _, _, _)
        var bi = 0
        while (bi < 4) {
          val b = (my * 2 + bi / 2) * bw0 + (mx * 2 + bi % 2)
          var v = 0
          while (v < 4) {
            var u = 0
            while (u < 4) { coefs(0)(b)(v * 8 + u) = fill(0, b, u, v); u += 1 }
            v += 1
          }
          bi += 1
        }
        var c = 1
        while (c <= 2) {
          var v = 0
          while (v < 4) {
            var u = 0
            while (u < 4) { coefs(c)(mbi)(v * 8 + u) = fill(c, mbi, u, v); u += 1 }
            v += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    GvcFrameData(FrameB, gvcQScale(docId, 1), gvcFullPel(docId, 1),
      modes, mvs, coefs, temporalRef = 1, bmvs = bmvs)
  }

  /** Encode the q181 B-frame clip: coding order [I, P(2), B(1), P(3)]
    * with explicit temporal references driving the display reorder.
    */
  private[pipeline] def gvcBEncode(docId: Long): Array[Byte] =
    gvcEncodeStream(gvcWidth(docId), gvcHeight(docId),
      GvcBDisplayOfCoding.toSeq.map {
        case 1 => gvcSynthesizeB(docId)
        case t => gvcSynthesize(docId, t).copy(temporalRef = t)
      },
      GvcRestartRows)

  // ---- decoder ------------------------------------------------------------

  /** Structurally decoded stream (pre-reconstruction): dims, quant, and
    * per-frame symbol-domain data — the lossless layer the property
    * suite round-trips.
    */
  final case class GvcRaw(width: Int, height: Int, restartRows: Int,
      quantZigzag: Array[Int], frames: IndexedSeq[GvcFrameData])

  /** Fully reconstructed clip (DISPLAY order) + stream-level macroblock
    * statistics (Σ|MV| in half-pel units across all coded directions).
    */
  final case class GvcDecoded(width: Int, height: Int,
      frames: IndexedSeq[(Array[Int], Array[Int], Array[Int])],
      nIntraMb: Int, nInterMb: Int, nSkipMb: Int, sumAbsMv: Long,
      nFwdMb: Int = 0, nBwdMb: Int = 0, nInterpMb: Int = 0)

  /** REAL parser: marker walk, sequence/frame headers, DHT canonical
    * rebuild, entropy decode of every macroblock (skip runs, modes, MV
    * prediction, CBP, intra DC prediction, restart cycle) down to the
    * symbol domain. Every field below comes from the BYTES.
    */
  private[pipeline] def gvcDecodeRaw(bytes: Array[Byte]): GvcRaw = {
    def u8(i: Int): Int = { require(i < bytes.length, "truncated GVC stream"); bytes(i) & 0xFF }
    def u16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    require(bytes.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8, "not a GVC stream: missing SOI")
    var pos = 2
    var w = -1; var h = -1; var nFrames = -1; var restartRows = -1
    var quantZ: Array[Int] = null
    val huff = Array.fill(2, 4)(null: Multimodal.JpegHuffTable)
    val frames = IndexedSeq.newBuilder[GvcFrameData]
    var seen = 0
    var done = false
    while (!done) {
      require(u8(pos) == 0xFF, f"expected marker at $pos")
      u8(pos + 1) match {
        case MarkerSeq =>
          require(w < 0, "duplicate sequence header")
          val p = pos + 4
          require(u8(p) == 'G' && u8(p + 1) == 'V' && u8(p + 2) == 'C' && u8(p + 3) == '1',
            "bad GVC magic")
          w = u16(p + 4); h = u16(p + 6)
          require(w > 0 && h > 0 && w % 16 == 0 && h % 16 == 0,
            "dims must be positive multiples of 16")
          nFrames = u8(p + 8); restartRows = u8(p + 9)
          require(nFrames > 0, "empty stream")
          quantZ = Array.tabulate(64)(k => u8(p + 10 + k))
          pos += 2 + u16(pos + 2)
        case 0xC4 => pos = Multimodal.jpegParseDht(bytes, pos, huff)
        case MarkerFrame =>
          require(w > 0, "frame before sequence header")
          // 4-byte payload (+2 length bytes): reject short/long headers
          // rather than alias entropy bytes into header fields
          require(u16(pos + 2) == 6, "frame header must carry exactly 4 bytes")
          val ftype = u8(pos + 4); val qScale = u8(pos + 5)
          val flags = u8(pos + 6); val tref = u8(pos + 7)
          require(ftype == FrameI || ftype == FrameP || ftype == FrameB,
            s"unknown frame type $ftype")
          require(seen > 0 || ftype == FrameI, "stream must open with an I-frame")
          require(qScale >= 1, "quantizer scale must be positive")
          require((flags & ~1) == 0, s"unknown frame flags $flags")
          require(tref < nFrames, s"temporal reference $tref out of range")
          val fullPel = (flags & 1) == 1
          val dcTab = huff(0)(TblDc); val mvTab = huff(0)(TblMv)
          val ctlTab = huff(0)(TblCtl); val acTab = huff(1)(0)
          require(dcTab != null && mvTab != null && ctlTab != null && acTab != null,
            "frame before Huffman tables")
          val mbw = w / 16; val mbh = h / 16; val bw0 = w / 8
          val modes = new Array[Int](mbw * mbh)
          val mvs = Array.fill(mbw * mbh)((0, 0))
          val bmvs = if (ftype == FrameB) Array.fill(mbw * mbh)((0, 0)) else null
          val coefs = Array(
            Array.fill(bw0 * (h / 8))(new Array[Int](64)),
            Array.fill(mbw * mbh)(new Array[Int](64)),
            Array.fill(mbw * mbh)(new Array[Int](64)))
          val br = new Multimodal.JpegBitReader(bytes, pos + 2 + u16(pos + 2))
          var rstM = 0
          val dcPred = new Array[Int](3)
          var mvPredX = 0; var mvPredY = 0 // P inter / B forward predictor
          var bwdPredX = 0; var bwdPredY = 0 // B backward predictor
          var skipLeft = 0
          var pendingMode = -1 // mode symbol read, owed to the MB after the skips

          def readIntraBlocks(mx: Int, my: Int, mbi: Int): Unit = {
            var bi = 0
            while (bi < 4) {
              val b = (my * 2 + bi / 2) * bw0 + (mx * 2 + bi % 2)
              val (cs, dc) = Multimodal.jpegReadBlock(br, dcTab, acTab, dcPred(0))
              dcPred(0) = dc; coefs(0)(b) = cs
              bi += 1
            }
            var c = 1
            while (c <= 2) {
              val (cs, dc) = Multimodal.jpegReadBlock(br, dcTab, acTab, dcPred(c))
              dcPred(c) = dc; coefs(c)(mbi) = cs
              c += 1
            }
          }

          def readMvDiff(): Int = {
            val s = mvTab.decode(br)
            Multimodal.jpegExtend(br.receive(s), s)
          }

          def checkInPicture(mvx: Int, mvy: Int, mx: Int, my: Int): Unit = {
            val evx = if (fullPel) 2 * mvx else mvx
            val evy = if (fullPel) 2 * mvy else mvy
            require(evx >= -32 * mx && evx <= 32 * (mbw - 1 - mx) &&
              evy >= -32 * my && evy <= 32 * (mbh - 1 - my),
              "motion vector references out-of-picture pels")
          }

          def readResiduals(mx: Int, my: Int, mbi: Int): Unit = {
            val pat = br.receive(6)
            var bi = 0
            while (bi < 4) {
              val b = (my * 2 + bi / 2) * bw0 + (mx * 2 + bi % 2)
              if ((pat & (1 << (5 - bi))) != 0) coefs(0)(b) = gvcReadResidual(br, acTab)
              bi += 1
            }
            var c = 1
            while (c <= 2) {
              if ((pat & (1 << (2 - c))) != 0) coefs(c)(mbi) = gvcReadResidual(br, acTab)
              c += 1
            }
          }

          def decodeCoded(sym: Int, mx: Int, my: Int, mbi: Int): Unit =
            if (sym == CtlIntra) {
              modes(mbi) = ModeIntra
              mvPredX = 0; mvPredY = 0; bwdPredX = 0; bwdPredY = 0
              readIntraBlocks(mx, my, mbi)
            } else {
              modes(mbi) = ModeInter
              java.util.Arrays.fill(dcPred, 0)
              val mvx = mvPredX + readMvDiff()
              val mvy = mvPredY + readMvDiff()
              mvPredX = mvx; mvPredY = mvy
              checkInPicture(mvx, mvy, mx, my)
              mvs(mbi) = (mvx, mvy)
              readResiduals(mx, my, mbi)
            }

          def decodeBMb(mx: Int, my: Int, mbi: Int): Unit = {
            // B macroblock: a bare mode symbol — no skip-run field.
            // MPEG-1's B-skip reuses the PREVIOUS macroblock's
            // prediction; this codec rejects the symbol shape rather
            // than approximate that semantics silently.
            val sym = ctlTab.decode(br)
            require(sym == CtlIntra || sym == CtlFwd || sym == CtlBwd || sym == CtlInterp,
              s"control symbol $sym not valid in a B-frame")
            if (sym == CtlIntra) {
              modes(mbi) = ModeIntra
              mvPredX = 0; mvPredY = 0; bwdPredX = 0; bwdPredY = 0
              readIntraBlocks(mx, my, mbi)
            } else {
              modes(mbi) = sym match {
                case CtlFwd => ModeFwd
                case CtlBwd => ModeBwd
                case _ => ModeInterp
              }
              java.util.Arrays.fill(dcPred, 0)
              if (sym != CtlBwd) {
                val mvx = mvPredX + readMvDiff()
                val mvy = mvPredY + readMvDiff()
                mvPredX = mvx; mvPredY = mvy
                checkInPicture(mvx, mvy, mx, my)
                mvs(mbi) = (mvx, mvy)
              }
              if (sym != CtlFwd) {
                val bx = bwdPredX + readMvDiff()
                val by = bwdPredY + readMvDiff()
                bwdPredX = bx; bwdPredY = by
                checkInPicture(bx, by, mx, my)
                bmvs(mbi) = (bx, by)
              }
              readResiduals(mx, my, mbi)
            }
          }

          var my = 0
          while (my < mbh) {
            var mx = 0
            while (mx < mbw) {
              val mbi = my * mbw + mx
              if (ftype == FrameI) { modes(mbi) = ModeIntra; readIntraBlocks(mx, my, mbi) }
              else if (ftype == FrameB) decodeBMb(mx, my, mbi)
              else if (skipLeft > 0) {
                modes(mbi) = ModeSkip; skipLeft -= 1
                mvPredX = 0; mvPredY = 0
                java.util.Arrays.fill(dcPred, 0)
              } else if (pendingMode >= 0) {
                val sym = pendingMode; pendingMode = -1
                decodeCoded(sym, mx, my, mbi)
              } else {
                var run = 0
                var sym = ctlTab.decode(br)
                while (sym == CtlEscape) {
                  run += CtlEscape + br.receive(8)
                  sym = ctlTab.decode(br)
                }
                require(sym < CtlEscape, "skip run must end in a direct terminal")
                run += sym
                val modeSym = ctlTab.decode(br)
                require(modeSym == CtlInter || modeSym == CtlIntra,
                  "expected a mode symbol after the skip run")
                if (run > 0) {
                  modes(mbi) = ModeSkip
                  skipLeft = run - 1
                  pendingMode = modeSym
                  mvPredX = 0; mvPredY = 0
                  java.util.Arrays.fill(dcPred, 0)
                } else decodeCoded(modeSym, mx, my, mbi)
              }
              mx += 1
            }
            val segmentEnd =
              my + 1 == mbh || (restartRows > 0 && (my + 1) % restartRows == 0)
            if (segmentEnd)
              require(skipLeft == 0 && pendingMode < 0,
                "skip run crosses a restart segment boundary (slice rule)")
            if (restartRows > 0 && (my + 1) % restartRows == 0 && my + 1 < mbh) {
              br.expectRestart(rstM); rstM = (rstM + 1) & 7
              java.util.Arrays.fill(dcPred, 0)
              mvPredX = 0; mvPredY = 0
              bwdPredX = 0; bwdPredY = 0
            }
            my += 1
          }
          pos = br.pos
          frames += GvcFrameData(ftype, qScale, fullPel, modes, mvs, coefs,
            temporalRef = tref, bmvs = bmvs)
          seen += 1
        case 0xD9 => done = true
        case x => throw new IllegalArgumentException(f"unsupported marker 0x$x%02X")
      }
    }
    require(w > 0, "missing sequence header")
    val fs = frames.result()
    require(fs.length == nFrames, s"frame count mismatch: header $nFrames, stream ${fs.length}")
    require(fs.map(_.temporalRef).sorted == fs.indices.toList.map(identity),
      "temporal references must be a permutation of 0..n-1")
    GvcRaw(w, h, restartRows, quantZ, fs)
  }

  /** Half-pel motion-compensated prediction of one 8×8 block: for each
    * destination pixel, average the 1/2/4 reference neighbors straddled
    * by the half-pel position, half rounded away from zero (pixels are
    * non-negative, so `(sum + n/2) / n`) — MPEG-1's `//` interpolation.
    * `evx`/`evy` are in half-pel units; even vectors degrade to a plain
    * shifted copy (the full-pel path shares this kernel with a doubled
    * vector).
    */
  private def mcPredict8(src: Array[Int], stride: Int,
      x0: Int, y0: Int, evx: Int, evy: Int, out: Array[Int]): Unit = {
    var ly = 0
    while (ly < 8) {
      val t2y = 2 * (y0 + ly) + evy
      val iy = t2y >> 1; val fy = t2y & 1
      var lx = 0
      while (lx < 8) {
        val t2x = 2 * (x0 + lx) + evx
        val ix = t2x >> 1; val fx = t2x & 1
        val n = (1 + fx) * (1 + fy)
        var sum = src(iy * stride + ix)
        if (fx == 1) sum += src(iy * stride + ix + 1)
        if (fy == 1) sum += src((iy + 1) * stride + ix)
        if (fx == 1 && fy == 1) sum += src((iy + 1) * stride + ix + 1)
        out(ly * 8 + lx) = (sum + n / 2) / n
        lx += 1
      }
      ly += 1
    }
  }

  /** Reconstruct pixels from the symbol domain: dequant + exact integer
    * IDCT for intra blocks, motion-compensated prediction (full-pel or
    * half-pel per the frame flag) + clamped residual + clip for inter,
    * co-located copy for skip. Chroma vectors are the luma vector halved
    * with truncation toward zero, in the frame's own units.
    */
  private[pipeline] def gvcDecode(bytes: Array[Byte]): GvcDecoded = {
    val raw = gvcDecodeRaw(bytes)
    val w = raw.width; val h = raw.height
    val mbw = w / 16; val mbh = h / 16; val bw0 = w / 8
    val cw = w / 2
    var nIntra = 0; var nInter = 0; var nSkip = 0; var sumAbsMv = 0L
    var nFwd = 0; var nBwd = 0; var nInterp = 0
    // two-slot anchor tracking (the standard decoder structure): frames
    // arrive in CODING order; an anchor (I/P) rotates the slots, a B
    // predicts from both without becoming a reference itself
    var refA: (Array[Int], Array[Int], Array[Int]) = null // older anchor
    var refB: (Array[Int], Array[Int], Array[Int]) = null // newer anchor
    var refATref = -1; var refBTref = -1
    val display = new Array[(Array[Int], Array[Int], Array[Int])](raw.frames.length)

    raw.frames.foreach { fd =>
      val qz = raw.quantZigzag.map(_ * fd.qScale)
      val yP = new Array[Int](w * h)
      val cbP = new Array[Int](cw * (h / 2))
      val crP = new Array[Int](cw * (h / 2))
      val isB = fd.ftype == FrameB
      // P-frames and skips reference the most recent anchor; B-frames
      // reference both, and must sit between them in display time
      val fwdRef = if (isB) refA else refB
      val bwdRef = refB
      if (isB) {
        require(refA != null && refB != null, "B-frame before both anchors")
        require(refATref < fd.temporalRef && fd.temporalRef < refBTref,
          "B-frame must sit between its anchors in display order")
      }
      def blit(dst: Array[Int], stride: Int, px: Array[Int], bx: Int, by: Int): Unit = {
        var ly = 0
        while (ly < 8) {
          System.arraycopy(px, ly * 8, dst, (by * 8 + ly) * stride + bx * 8, 8)
          ly += 1
        }
      }
      /** Half-pel-unit vectors for the MB's coded direction(s). */
      def halfPelVec(v: (Int, Int)): (Int, Int, Int, Int) = {
        val (mvx, mvy) = v
        val evx = if (fd.fullPel) 2 * mvx else mvx
        val evy = if (fd.fullPel) 2 * mvy else mvy
        // chroma vector: luma vector halved with truncation toward zero
        // IN THE FRAME'S UNITS, then scaled to half-pel
        val ecx = if (fd.fullPel) 2 * (mvx / 2) else mvx / 2
        val ecy = if (fd.fullPel) 2 * (mvy / 2) else mvy / 2
        (evx, evy, ecx, ecy)
      }
      var my = 0
      while (my < mbh) {
        var mx = 0
        while (mx < mbw) {
          val mbi = my * mbw + mx
          val mode = fd.modes(mbi)
          mode match {
            case ModeIntra =>
              nIntra += 1
              var bi = 0
              while (bi < 4) {
                val b = (my * 2 + bi / 2) * bw0 + (mx * 2 + bi % 2)
                blit(yP, w, Multimodal.jpegIdctBlock(fd.coefs(0)(b), qz),
                  mx * 2 + bi % 2, my * 2 + bi / 2)
                bi += 1
              }
              blit(cbP, cw, Multimodal.jpegIdctBlock(fd.coefs(1)(mbi), qz), mx, my)
              blit(crP, cw, Multimodal.jpegIdctBlock(fd.coefs(2)(mbi), qz), mx, my)
            case ModeSkip =>
              nSkip += 1
              require(bwdRef != null, "skip in the first frame")
              var ly = 0
              while (ly < 16) {
                System.arraycopy(bwdRef._1, (my * 16 + ly) * w + mx * 16,
                  yP, (my * 16 + ly) * w + mx * 16, 16)
                ly += 1
              }
              ly = 0
              while (ly < 8) {
                System.arraycopy(bwdRef._2, (my * 8 + ly) * cw + mx * 8,
                  cbP, (my * 8 + ly) * cw + mx * 8, 8)
                System.arraycopy(bwdRef._3, (my * 8 + ly) * cw + mx * 8,
                  crP, (my * 8 + ly) * cw + mx * 8, 8)
                ly += 1
              }
            case _ =>
              // motion-compensated: P inter, or B fwd/bwd/interpolated
              mode match {
                case ModeInter => nInter += 1
                case ModeFwd => nFwd += 1
                case ModeBwd => nBwd += 1
                case ModeInterp => nInterp += 1
                case m => throw new IllegalArgumentException(s"bad mode $m")
              }
              require(mode == ModeInter || isB, "B modes outside a B-frame")
              val useFwd = mode == ModeInter || mode == ModeFwd || mode == ModeInterp
              val useBwd = mode == ModeBwd || mode == ModeInterp
              val fRef = if (mode == ModeInter) bwdRef else fwdRef
              require(!useFwd || fRef != null, "prediction before its reference")
              require(!useBwd || bwdRef != null, "prediction before its reference")
              val (fevx, fevy, fecx, fecy) =
                if (useFwd) halfPelVec(fd.mvs(mbi)) else (0, 0, 0, 0)
              val (bevx, bevy, becx, becy) =
                if (useBwd) halfPelVec(fd.bmvs(mbi)) else (0, 0, 0, 0)
              if (useFwd) sumAbsMv += math.abs(fevx) + math.abs(fevy)
              if (useBwd) sumAbsMv += math.abs(bevx) + math.abs(bevy)
              val predF = new Array[Int](64)
              val predB = new Array[Int](64)
              def reconBlocks(
                  srcF: Array[Int], srcB: Array[Int], dst: Array[Int],
                  stride: Int, x0: Int, y0: Int, res: Array[Int],
                  vxF: Int, vyF: Int, vxB: Int, vyB: Int): Unit = {
                if (useFwd) mcPredict8(srcF, stride, x0, y0, vxF, vyF, predF)
                if (useBwd) mcPredict8(srcB, stride, x0, y0, vxB, vyB, predB)
                var i = 0
                while (i < 64) {
                  // interpolated mode: average the two predictions,
                  // half rounded away from zero (non-negative inputs)
                  val base =
                    if (useFwd && useBwd) (predF(i) + predB(i) + 1) >> 1
                    else if (useFwd) predF(i)
                    else predB(i)
                  val p = base + res(i)
                  dst((y0 + i / 8) * stride + (x0 + i % 8)) = math.max(0, math.min(255, p))
                  i += 1
                }
              }
              var bi = 0
              while (bi < 4) {
                val b = (my * 2 + bi / 2) * bw0 + (mx * 2 + bi % 2)
                val res = gvcIdctResidual(fd.coefs(0)(b), qz)
                val x0 = (mx * 2 + bi % 2) * 8; val y0 = (my * 2 + bi / 2) * 8
                reconBlocks(if (fRef != null) fRef._1 else null,
                  if (bwdRef != null) bwdRef._1 else null,
                  yP, w, x0, y0, res, fevx, fevy, bevx, bevy)
                bi += 1
              }
              var c = 1
              while (c <= 2) {
                val res = gvcIdctResidual(fd.coefs(c)(mbi), qz)
                val sF = if (fRef == null) null else if (c == 1) fRef._2 else fRef._3
                val sB = if (bwdRef == null) null else if (c == 1) bwdRef._2 else bwdRef._3
                val dst = if (c == 1) cbP else crP
                reconBlocks(sF, sB, dst, cw, mx * 8, my * 8, res,
                  fecx, fecy, becx, becy)
                c += 1
              }
          }
          mx += 1
        }
        my += 1
      }
      val recon = (yP, cbP, crP)
      // gvcDecodeRaw already proved the trefs are a permutation
      display(fd.temporalRef) = recon
      if (!isB) {
        refA = refB; refATref = refBTref
        refB = recon; refBTref = fd.temporalRef
      }
    }
    GvcDecoded(w, h, display.toIndexedSeq, nIntra, nInter, nSkip, sumAbsMv,
      nFwd, nBwd, nInterp)
  }

  // ---- declared query -----------------------------------------------------

  /** The synthesized motion-video corpus: (doc_id, media) with a real
    * GVC payload. Per-doc bounded work, embarrassingly parallel — the
    * same kernel shape every decode family uses.
    */
  def gvcTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spread(table(spark, dir, "documents").select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map(id => (id, gvcEncode(id))))
      .toDF("doc_id", "media")
  }

  /** Declared query (q180): decode the motion-video corpus and emit
    * per-clip features spanning every codec layer — dims and frame
    * count (sequence header), macroblock mode counts and Σ|MV| (the
    * control/MV entropy layer), mean reconstructed Y/Cb (dequant + IDCT
    * + motion compensation + residual add + frame recursion), total
    * inter-frame motion Σ|Y_f − Y_{f−1}| (the temporal chain), and the
    * last frame's bottom-row luma sum (maximum sensitivity to
    * cumulative drift). The oracle replays ALL of it from the synthesis
    * formulas in SQL — an unrolled four-frame reconstruction chain.
    */
  /** Display-order plane statistics shared by the q180/q181 features:
    * (mean Y, mean Cb, inter-frame motion, last frame's bottom-row luma).
    */
  private def planeStats(d: GvcDecoded): (Double, Double, Long, Long) = {
    val n = d.frames.length
    var ySum = 0L; var cbSum = 0L; var motion = 0L; var lastBot = 0L
    var f = 0
    while (f < n) {
      val yP = d.frames(f)._1
      var i = 0
      while (i < yP.length) {
        ySum += yP(i)
        if (f > 0) motion += math.abs(yP(i) - d.frames(f - 1)._1(i))
        i += 1
      }
      val cbP = d.frames(f)._2
      i = 0
      while (i < cbP.length) { cbSum += cbP(i); i += 1 }
      f += 1
    }
    val lastY = d.frames(n - 1)._1
    var x = 0
    while (x < d.width) { lastBot += lastY((d.height - 1) * d.width + x); x += 1 }
    val yPix = d.width.toLong * d.height * n
    val cPix = (d.width / 2).toLong * (d.height / 2) * n
    (ySum.toDouble / yPix, cbSum.toDouble / cPix, motion, lastBot)
  }

  /** Per-clip feature tuple from the bytes (the kernel body; also the
    * sensitivity tests' comparison unit).
    */
  private[pipeline] def gvcFeaturesOf(bytes: Array[Byte]): (Int, Int, Int, Int, Int, Int,
      Long, Double, Double, Long, Long) = {
    val d = gvcDecode(bytes)
    val (meanY, meanCb, motion, lastBot) = planeStats(d)
    (d.width, d.height, d.frames.length, d.nIntraMb, d.nInterMb, d.nSkipMb, d.sumAbsMv,
      meanY, meanCb, motion, lastBot)
  }

  /** q181's feature tuple: B-mode macroblock counts instead of the P
    * skip/inter split.
    */
  private[pipeline] def gvcBFeaturesOf(bytes: Array[Byte]): (Int, Int, Int, Int, Int, Int,
      Int, Long, Double, Double, Long, Long) = {
    val d = gvcDecode(bytes)
    val (meanY, meanCb, motion, lastBot) = planeStats(d)
    (d.width, d.height, d.frames.length, d.nFwdMb, d.nBwdMb, d.nInterpMb,
      d.nIntraMb, d.sumAbsMv, meanY, meanCb, motion, lastBot)
  }

  def gvcFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gvcTable(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val f = gvcFeaturesOf(bytes)
        (id, f._1, f._2, f._3, f._4, f._5, f._6, f._7, f._8, f._9, f._10, f._11)
      })
      .toDF("doc_id", "width", "height", "n_frames", "n_intra_mb", "n_inter_mb",
        "n_skip_mb", "sum_abs_mv", "mean_y_raw", "mean_cb_raw", "motion", "last_bot_luma")
      .select(
        col("doc_id"), col("width"), col("height"), col("n_frames"),
        col("n_intra_mb"), col("n_inter_mb"), col("n_skip_mb"), col("sum_abs_mv"),
        round(col("mean_y_raw"), 4).as("mean_y"),
        round(col("mean_cb_raw"), 4).as("mean_cb"),
        col("motion"), col("last_bot_luma"))
      .orderBy(col("doc_id"))
  }

  /** The q181 corpus: every clip carries the full GOP triad — an
    * I-frame, a bidirectional B (display position 1, coded AFTER its
    * backward anchor), and two P anchors.
    */
  def gvcBTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spread(table(spark, dir, "documents").select(col("doc_id")))
      .as[Long]
      .mapPartitions(_.map(id => (id, gvcBEncode(id))))
      .toDF("doc_id", "media")
  }

  /** Declared query (q181): decode the B-frame corpus. On top of q180's
    * layers this gates frame REORDERING (coding order ≠ display order;
    * the temporal-reference walk and two-slot anchor tracking),
    * bidirectional prediction (independent fwd/bwd vector predictors),
    * and the interpolated mode's two-prediction average — the oracle
    * replays display-order reconstruction where the B frame's CTE joins
    * BOTH anchors.
    */
  def gvcBFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    gvcBTable(spark, dir)
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val f = gvcBFeaturesOf(bytes)
        (id, f._1, f._2, f._3, f._4, f._5, f._6, f._7, f._8, f._9, f._10, f._11, f._12)
      })
      .toDF("doc_id", "width", "height", "n_frames", "n_fwd_mb", "n_bwd_mb",
        "n_interp_mb", "n_intra_mb", "sum_abs_mv", "mean_y_raw", "mean_cb_raw",
        "motion", "last_bot_luma")
      .select(
        col("doc_id"), col("width"), col("height"), col("n_frames"),
        col("n_fwd_mb"), col("n_bwd_mb"), col("n_interp_mb"), col("n_intra_mb"),
        col("sum_abs_mv"),
        round(col("mean_y_raw"), 4).as("mean_y"),
        round(col("mean_cb_raw"), 4).as("mean_cb"),
        col("motion"), col("last_bot_luma"))
      .orderBy(col("doc_id"))
  }
}

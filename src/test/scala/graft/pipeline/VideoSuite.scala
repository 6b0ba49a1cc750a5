package graft.pipeline

import org.scalatest.funsuite.AnyFunSuite

/** GVC motion-video codec: symbol-domain round trips against the
  * synthesis formulas, reconstruction invariants (skip copy, motion
  * compensation, chroma MV truncation), the escape/slice-rule edges,
  * and patched-byte sensitivity per stream layer.
  */
class VideoSuite extends AnyFunSuite {

  test("GVC symbol-domain decode round-trips the synthesized corpus exactly") {
    for (id <- 0L until 48L) {
      val bytes = Video.gvcEncode(id)
      val raw = Video.gvcDecodeRaw(bytes)
      assert(raw.width == Video.gvcWidth(id) && raw.height == Video.gvcHeight(id))
      assert(raw.frames.length == Video.GvcFrames)
      assert(raw.restartRows == Video.GvcRestartRows)
      for (f <- 0 until Video.GvcFrames) {
        val syn = Video.gvcSynthesize(id, f)
        val dec = raw.frames(f)
        assert(dec.ftype == syn.ftype && dec.qScale == syn.qScale &&
          dec.fullPel == syn.fullPel, s"header $id/$f")
        assert(dec.modes.toSeq == syn.modes.toSeq, s"modes $id/$f")
        assert(dec.mvs.toSeq == syn.mvs.toSeq, s"mvs $id/$f")
        for (c <- 0 to 2)
          assert(dec.coefs(c).map(_.toSeq).toSeq == syn.coefs(c).map(_.toSeq).toSeq,
            s"coefs $id/$f/$c")
      }
    }
  }

  test("GVC quant table and frame quantizer scale travel in the stream") {
    val raw = Video.gvcDecodeRaw(Video.gvcEncode(5L))
    for (k <- 0 until 64) {
      val nat = Multimodal.JpegZigzag(k)
      assert(raw.quantZigzag(k) == Video.gvcQuant(nat % 8, nat / 8))
    }
    for (f <- 0 until Video.GvcFrames)
      assert(raw.frames(f).qScale == Video.gvcQScale(5L, f))
  }

  test("skip macroblocks copy the co-located reference pixels exactly") {
    // find a doc with a skipped MB in frame 1 and compare the planes
    val id = (0L until 48L).find { id =>
      val mbw = Video.gvcWidth(id) / 16
      (0 until mbw * (Video.gvcHeight(id) / 16)).exists(i =>
        Video.gvcMode(id, 1, i % mbw, i / mbw, mbw) == Video.ModeSkip)
    }.get
    val d = Video.gvcDecode(Video.gvcEncode(id))
    val raw = Video.gvcDecodeRaw(Video.gvcEncode(id))
    val w = d.width; val cw = w / 2
    val mbw = w / 16
    val modes = raw.frames(1).modes
    var checked = 0
    for (mbi <- modes.indices if modes(mbi) == Video.ModeSkip) {
      val mx = mbi % mbw; val my = mbi / mbw
      for (ly <- 0 until 16; lx <- 0 until 16) {
        val p = (my * 16 + ly) * w + (mx * 16 + lx)
        assert(d.frames(1)._1(p) == d.frames(0)._1(p), s"luma skip copy at $p")
      }
      for (ly <- 0 until 8; lx <- 0 until 8) {
        val p = (my * 8 + ly) * cw + (mx * 8 + lx)
        assert(d.frames(1)._2(p) == d.frames(0)._2(p), s"cb skip copy at $p")
        assert(d.frames(1)._3(p) == d.frames(0)._3(p), s"cr skip copy at $p")
      }
      checked += 1
    }
    assert(checked > 0)
  }

  test("inter macroblocks reconstruct as shifted reference + clamped residual") {
    val id = 7L
    val bytes = Video.gvcEncode(id)
    val d = Video.gvcDecode(bytes)
    val raw = Video.gvcDecodeRaw(bytes)
    val w = d.width
    val mbw = w / 16
    val fd = raw.frames(1)
    assert(fd.fullPel, "doc 7 frame 1 should be the full-pel case")
    val qz = raw.quantZigzag.map(_ * fd.qScale)
    var checked = 0
    for (mbi <- fd.modes.indices if fd.modes(mbi) == Video.ModeInter) {
      val mx = mbi % mbw; val my = mbi / mbw
      val (mvx, mvy) = fd.mvs(mbi)
      for (bi <- 0 until 4) {
        val b = (my * 2 + bi / 2) * (w / 8) + (mx * 2 + bi % 2)
        val res = Video.gvcIdctResidual(fd.coefs(0)(b), qz)
        for (ly <- 0 until 8; lx <- 0 until 8) {
          val x = (mx * 2 + bi % 2) * 8 + lx; val y = (my * 2 + bi / 2) * 8 + ly
          val expect = math.max(0, math.min(255,
            d.frames(0)._1((y + mvy) * w + (x + mvx)) + res(ly * 8 + lx)))
          assert(d.frames(1)._1(y * w + x) == expect, s"inter luma at ($x,$y)")
        }
      }
      checked += 1
    }
    assert(checked > 0)
  }

  test("half-pel frames reconstruct through neighbor averaging (round half away from zero)") {
    // the independent mirror: straddled-neighbor average with (sum+n/2)/n
    def avg(src: Array[Int], stride: Int, x: Int, y: Int, evx: Int, evy: Int): Int = {
      val t2x = 2 * x + evx; val t2y = 2 * y + evy
      val ix = t2x >> 1; val fx = t2x & 1
      val iy = t2y >> 1; val fy = t2y & 1
      val n = (1 + fx) * (1 + fy)
      var s = src(iy * stride + ix)
      if (fx == 1) s += src(iy * stride + ix + 1)
      if (fy == 1) s += src((iy + 1) * stride + ix)
      if (fx == 1 && fy == 1) s += src((iy + 1) * stride + ix + 1)
      (s + n / 2) / n
    }
    // scan the corpus: verify EVERY half-pel inter MB of the first 24
    // docs, and require that at least one carries an odd (interpolating)
    // vector that survives the in-picture clamp
    var checkedOdd = 0
    var checkedMb = 0
    for (id <- 0L until 24L) {
      val bytes = Video.gvcEncode(id)
      val d = Video.gvcDecode(bytes)
      val raw = Video.gvcDecodeRaw(bytes)
      val w = d.width
      val mbw = w / 16
      for (f <- 1 until Video.GvcFrames if !raw.frames(f).fullPel) {
        val fd = raw.frames(f)
        val qz = raw.quantZigzag.map(_ * fd.qScale)
        for (mbi <- fd.modes.indices if fd.modes(mbi) == Video.ModeInter) {
          val mx = mbi % mbw; val my = mbi / mbw
          val (mvx, mvy) = fd.mvs(mbi) // half-pel units
          if (mvx % 2 != 0 || mvy % 2 != 0) checkedOdd += 1
          checkedMb += 1
          for (bi <- 0 until 4) {
            val b = (my * 2 + bi / 2) * (w / 8) + (mx * 2 + bi % 2)
            val res = Video.gvcIdctResidual(fd.coefs(0)(b), qz)
            for (ly <- 0 until 8; lx <- 0 until 8) {
              val x = (mx * 2 + bi % 2) * 8 + lx; val y = (my * 2 + bi / 2) * 8 + ly
              val expect = math.max(0, math.min(255,
                avg(d.frames(f - 1)._1, w, x, y, mvx, mvy) + res(ly * 8 + lx)))
              assert(d.frames(f)._1(y * w + x) == expect,
                s"half-pel luma doc $id frame $f at ($x,$y)")
            }
          }
          // chroma: vector halved with truncation toward zero, still half-pel
          val res = Video.gvcIdctResidual(fd.coefs(1)(mbi), qz)
          val cw = w / 2
          for (ly <- 0 until 8; lx <- 0 until 8) {
            val x = mx * 8 + lx; val y = my * 8 + ly
            val expect = math.max(0, math.min(255,
              avg(d.frames(f - 1)._2, cw, x, y, mvx / 2, mvy / 2) + res(ly * 8 + lx)))
            assert(d.frames(f)._2(y * cw + x) == expect,
              s"half-pel cb doc $id frame $f at ($x,$y)")
          }
        }
      }
    }
    assert(checkedMb > 0, "no half-pel inter macroblock found")
    assert(checkedOdd > 0, "no odd half-pel vector was exercised")
  }

  test("chroma motion vectors halve with truncation toward zero (odd MV)") {
    // hand-built two-MB frame pair: I-frame, then a P-frame whose MB 1
    // carries the ODD vector (-3, 0) — chroma must shift by -1 (toward
    // zero), not -2 (floor). Doc 4 has the 32x16 grid.
    val w = 32; val h = 16
    val f0 = Video.gvcSynthesize(4L, 0)
    val base = Video.gvcSynthesize(4L, 1)
    for (i <- base.modes.indices) {
      base.modes(i) = Video.ModeInter
      base.mvs(i) = if (i == 1) (-3, 0) else (0, 0)
    }
    val inter = base.copy(fullPel = true)
    val bytes = Video.gvcEncodeStream(w, h, Seq(f0, inter), restartRows = 0)
    val d = Video.gvcDecode(bytes)
    val raw = Video.gvcDecodeRaw(bytes)
    assert(raw.frames(1).mvs(1) == (-3, 0))
    val cw = w / 2
    val qz = raw.quantZigzag.map(_ * raw.frames(1).qScale)
    val res = Video.gvcIdctResidual(raw.frames(1).coefs(1)(1), qz)
    for (ly <- 0 until 8; lx <- 0 until 8) {
      val x = 8 + lx; val y = ly
      val expect = math.max(0, math.min(255,
        d.frames(0)._2(y * cw + (x - 1)) + res(ly * 8 + lx)))
      assert(d.frames(1)._2(y * cw + x) == expect, s"cb at ($x,$y)")
    }
  }

  test("long skip runs travel through the control-table escape path") {
    // 20 MBs wide: 18 consecutive skips (> one escape) before the last
    // coded MB of the row
    val w = 320; val h = 16
    val mbw = w / 16
    val intra = Video.GvcFrameData(0, 1, true,
      Array.fill(mbw)(Video.ModeIntra), Array.fill(mbw)((0, 0)),
      Array(Array.fill((w / 8) * (h / 8))(new Array[Int](64)),
        Array.fill(mbw)(new Array[Int](64)), Array.fill(mbw)(new Array[Int](64))))
    val modes = Array.tabulate(mbw)(i => if (i == 0 || i == mbw - 1) Video.ModeInter else Video.ModeSkip)
    val p = Video.GvcFrameData(1, 1, true, modes, Array.fill(mbw)((0, 0)),
      Array(Array.fill((w / 8) * (h / 8))(new Array[Int](64)),
        Array.fill(mbw)(new Array[Int](64)), Array.fill(mbw)(new Array[Int](64))))
    val bytes = Video.gvcEncodeStream(w, h, Seq(intra, p), restartRows = 0)
    val raw = Video.gvcDecodeRaw(bytes)
    assert(raw.frames(1).modes.toSeq == modes.toSeq)
  }

  test("the slice rule rejects a trailing skip run at encode time") {
    val w = 32; val h = 16
    val mk = (modes: Array[Int]) => Video.GvcFrameData(1, 1, true, modes, Array.fill(2)((0, 0)),
      Array(Array.fill(8)(new Array[Int](64)),
        Array.fill(2)(new Array[Int](64)), Array.fill(2)(new Array[Int](64))))
    val i32 = Video.GvcFrameData(0, 1, true,
      Array.fill(2)(Video.ModeIntra), Array.fill(2)((0, 0)),
      Array(Array.fill(8)(new Array[Int](64)),
        Array.fill(2)(new Array[Int](64)), Array.fill(2)(new Array[Int](64))))
    intercept[IllegalArgumentException] {
      Video.gvcEncodeStream(w, h, Seq(i32, mk(Array(Video.ModeInter, Video.ModeSkip))),
        restartRows = 0)
    }
  }

  test("B-frame GOP round-trips: coding order, temporal refs, both MV sets") {
    for (id <- 0L until 24L) {
      val raw = Video.gvcDecodeRaw(Video.gvcBEncode(id))
      assert(raw.frames.map(_.temporalRef).toSeq == Video.GvcBDisplayOfCoding.toSeq,
        s"coding order $id")
      val synth = Seq(
        Video.gvcSynthesize(id, 0).copy(temporalRef = 0),
        Video.gvcSynthesize(id, 2).copy(temporalRef = 2),
        Video.gvcSynthesizeB(id),
        Video.gvcSynthesize(id, 3).copy(temporalRef = 3))
      for ((dec, syn) <- raw.frames.zip(synth)) {
        assert(dec.ftype == syn.ftype && dec.qScale == syn.qScale &&
          dec.fullPel == syn.fullPel, s"header $id")
        assert(dec.modes.toSeq == syn.modes.toSeq, s"modes $id")
        assert(dec.mvs.toSeq == syn.mvs.toSeq, s"fwd mvs $id")
        if (syn.ftype == 2)
          assert(dec.bmvs.toSeq == syn.bmvs.toSeq, s"bwd mvs $id")
        for (c <- 0 to 2)
          assert(dec.coefs(c).map(_.toSeq).toSeq == syn.coefs(c).map(_.toSeq).toSeq,
            s"coefs $id")
      }
    }
  }

  test("B-frames reconstruct bidirectionally; P anchors chain over anchors, not the B") {
    def avg(src: Array[Int], stride: Int, x: Int, y: Int, evx: Int, evy: Int): Int = {
      val t2x = 2 * x + evx; val t2y = 2 * y + evy
      val ix = t2x >> 1; val fx = t2x & 1
      val iy = t2y >> 1; val fy = t2y & 1
      val n = (1 + fx) * (1 + fy)
      var s = src(iy * stride + ix)
      if (fx == 1) s += src(iy * stride + ix + 1)
      if (fy == 1) s += src((iy + 1) * stride + ix)
      if (fx == 1 && fy == 1) s += src((iy + 1) * stride + ix + 1)
      (s + n / 2) / n
    }
    var sawFwd = 0; var sawBwd = 0; var sawInterp = 0
    for (id <- 0L until 12L) {
      val bytes = Video.gvcBEncode(id)
      val d = Video.gvcDecode(bytes)
      val raw = Video.gvcDecodeRaw(bytes)
      val w = d.width
      val mbw = w / 16
      val b = raw.frames(2) // the B frame (coding position 2, display 1)
      val qz = raw.quantZigzag.map(_ * b.qScale)
      def ev(v: Int) = if (b.fullPel) 2 * v else v
      for (mbi <- b.modes.indices if b.modes(mbi) != Video.ModeIntra) {
        val mx = mbi % mbw; val my = mbi / mbw
        val mode = b.modes(mbi)
        mode match {
          case Video.ModeFwd => sawFwd += 1
          case Video.ModeBwd => sawBwd += 1
          case Video.ModeInterp => sawInterp += 1
          case m => fail(s"unexpected B mode $m")
        }
        val (fx0, fy0) = b.mvs(mbi); val (bx0, by0) = b.bmvs(mbi)
        for (bi <- 0 until 4) {
          val blk = (my * 2 + bi / 2) * (w / 8) + (mx * 2 + bi % 2)
          val res = Video.gvcIdctResidual(b.coefs(0)(blk), qz)
          for (ly <- 0 until 8; lx <- 0 until 8) {
            val x = (mx * 2 + bi % 2) * 8 + lx; val y = (my * 2 + bi / 2) * 8 + ly
            val pf = avg(d.frames(0)._1, w, x, y, ev(fx0), ev(fy0))
            val pb = avg(d.frames(2)._1, w, x, y, ev(bx0), ev(by0))
            val base = mode match {
              case Video.ModeFwd => pf
              case Video.ModeBwd => pb
              case _ => (pf + pb + 1) >> 1
            }
            val expect = math.max(0, math.min(255, base + res(ly * 8 + lx)))
            assert(d.frames(1)._1(y * w + x) == expect, s"B luma doc $id at ($x,$y)")
          }
        }
      }
      // the display-3 P predicts from display-2 (the anchor), NOT the B
      val p3 = raw.frames(3)
      val qz3 = raw.quantZigzag.map(_ * p3.qScale)
      def ev3(v: Int) = if (p3.fullPel) 2 * v else v
      for (mbi <- p3.modes.indices if p3.modes(mbi) == Video.ModeInter) {
        val mx = mbi % mbw; val my = mbi / mbw
        val (mvx, mvy) = p3.mvs(mbi)
        val blk = (my * 2) * (w / 8) + (mx * 2)
        val res = Video.gvcIdctResidual(p3.coefs(0)(blk), qz3)
        val x = mx * 16; val y = my * 16
        val expect = math.max(0, math.min(255,
          avg(d.frames(2)._1, w, x, y, ev3(mvx), ev3(mvy)) + res(0)))
        assert(d.frames(3)._1(y * w + x) == expect, s"P3 anchor chain doc $id")
      }
      // skips in P frames copy the ANCHOR, exercised by the q180 suite
    }
    assert(sawFwd > 0 && sawBwd > 0 && sawInterp > 0,
      s"B mode coverage: fwd=$sawFwd bwd=$sawBwd interp=$sawInterp")
  }

  test("B-frame ordering rules are enforced") {
    val id = 4L // 32x16
    val i0 = Video.gvcSynthesize(id, 0).copy(temporalRef = 0)
    val b = Video.gvcSynthesizeB(id)
    // B before its backward anchor exists (coding [I, B]) must be
    // rejected at reconstruction
    val early = Video.gvcEncodeStream(32, 16, Seq(i0, b.copy(temporalRef = 1)),
      Video.GvcRestartRows)
    intercept[IllegalArgumentException](Video.gvcDecode(early))
    // a B outside its anchors (coding [I(0), P(1), B(2)]) violates the
    // straddle rule
    val p1 = Video.gvcSynthesize(id, 2).copy(temporalRef = 1)
    val late = Video.gvcEncodeStream(32, 16, Seq(i0, p1, b.copy(temporalRef = 2)),
      Video.GvcRestartRows)
    intercept[IllegalArgumentException](Video.gvcDecode(late))
    // duplicate temporal references are rejected at encode
    intercept[IllegalArgumentException] {
      Video.gvcEncodeStream(32, 16,
        Seq(i0, Video.gvcSynthesize(id, 2).copy(temporalRef = 0)), Video.GvcRestartRows)
    }
  }

  test("GVC reads the BYTES: header, marker, entropy, and restart sensitivity") {
    val id = 1L // 32x32: two MB rows, so restart markers actually fire
    val bytes = Video.gvcEncode(id)
    val clean = Video.gvcFeaturesOf(bytes)

    // truncation fails cleanly
    intercept[IllegalArgumentException](
      Video.gvcDecodeRaw(java.util.Arrays.copyOfRange(bytes, 0, bytes.length - 3)))
    // bad magic
    val badMagic = bytes.clone()
    val gi = indexOfSeq(bytes, "GVC1".getBytes)
    badMagic(gi) = 'X'.toByte
    intercept[IllegalArgumentException](Video.gvcDecodeRaw(badMagic))
    // frame-count header mismatch
    val badCount = bytes.clone()
    badCount(gi + 8) = (badCount(gi + 8) + 1).toByte
    intercept[IllegalArgumentException](Video.gvcDecodeRaw(badCount))
    // a restart marker replaced by the WRONG index must be rejected
    val rst = (2 until bytes.length - 1).find(i =>
      (bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) >= 0xD0 &&
        (bytes(i + 1) & 0xFF) <= 0xD7).get
    val badRst = bytes.clone()
    badRst(rst + 1) = (0xD0 + (((bytes(rst + 1) & 7) + 1) & 7)).toByte
    intercept[IllegalArgumentException](Video.gvcDecodeRaw(badRst))
    // flipping entropy bytes either fails or changes the features —
    // never silently matches
    val entropyStart = rst + 2
    var changedOrFailed = 0
    for (at <- entropyStart until math.min(entropyStart + 24, bytes.length - 2)
         if (bytes(at) & 0xFF) != 0xFF && (bytes(at - 1) & 0xFF) != 0xFF) {
      val patched = bytes.clone()
      patched(at) = (patched(at) ^ 0x24).toByte
      scala.util.Try(Video.gvcFeaturesOf(patched)) match {
        case scala.util.Success(f) => if (f != clean) changedOrFailed += 1
        case scala.util.Failure(_) => changedOrFailed += 1
      }
    }
    assert(changedOrFailed > 0, "no entropy byte was load-bearing")
  }

  test("macroblock statistics match the mode formulas") {
    for (id <- 0L until 24L) {
      val d = Video.gvcDecode(Video.gvcEncode(id))
      val mbw = d.width / 16; val mbh = d.height / 16
      var nI = mbw * mbh; var nP = 0; var nS = 0; var mvSum = 0L
      for (f <- 1 until Video.GvcFrames; my <- 0 until mbh; mx <- 0 until mbw)
        Video.gvcMode(id, f, mx, my, mbw) match {
          case Video.ModeIntra => nI += 1
          case Video.ModeSkip => nS += 1
          case _ =>
            nP += 1
            val (mvx, mvy) = Video.gvcMv(id, f, mx, my, mbw, mbh)
            val sc = if (Video.gvcFullPel(id, f)) 2 else 1 // half-pel units
            mvSum += sc * (math.abs(mvx) + math.abs(mvy))
        }
      assert(d.nIntraMb == nI && d.nInterMb == nP && d.nSkipMb == nS, s"counts $id")
      assert(d.sumAbsMv == mvSum, s"mv sum $id")
    }
  }

  private def indexOfSeq(hay: Array[Byte], needle: Array[Byte]): Int =
    (0 to hay.length - needle.length)
      .find(i => needle.indices.forall(j => hay(i + j) == needle(j))).get
}

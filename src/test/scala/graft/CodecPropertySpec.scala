package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.MultimodalOps

/** Property tests for the pure-JVM media codecs: for arbitrary seeds and
  * dimensions, decode(encode(x)) must recover the generator's ground truth
  * exactly — the byte-level parsers have no tolerance for off-by-one in
  * padding, row order, chunk alignment, or header scanning. (Raw scalacheck
  * generators with pinned seeds, same pattern as DedupPropertySpec.)
  */
class CodecPropertySpec extends AnyFunSuite {

  private def gen[A](g: Gen[A], trial: Long): A =
    g.apply(Gen.Parameters.default, Seed(trial)).getOrElse(fail(s"gen failed @ $trial"))

  private val imgGen: Gen[(Long, Int, Int)] = for {
    seed <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 40)
  } yield (seed, w, h)

  test("BMP and PPM decode recover exact per-pixel means for arbitrary dims") {
    (1 to 25).foreach { trial =>
      val (seed, w, h) = gen(imgGen, trial.toLong)
      val expected = (for { y <- 0 until h; x <- 0 until w; c <- 0 until 3 }
        yield MultimodalOps.pixel(seed, x, y, c)).sum.toDouble / (3.0 * w * h)
      // BMP exercises padded bottom-up BGR; PPM top-down RGB — same raster
      val bmp = MultimodalOps.decodeMedia(MultimodalOps.encodeBmp(seed, w, h))
      val ppm = MultimodalOps.decodeMedia(MultimodalOps.encodePpm(seed, w, h))
      assert((bmp.width, bmp.height) === ((w, h)), s"trial $trial BMP dims")
      assert((ppm.width, ppm.height) === ((w, h)), s"trial $trial PPM dims")
      assert(bmp.pixelMean === expected, s"trial $trial BMP mean")
      assert(ppm.pixelMean === expected, s"trial $trial PPM mean")
      // identical raster ⇒ identical perceptual hash across formats
      assert(bmp.phash === ppm.phash, s"trial $trial phash parity")
    }
  }

  private val wavGen: Gen[(Long, Int, Int)] = for {
    seed <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    n <- Gen.choose(0, 2000)
    rate <- Gen.oneOf(8000, 16000, 44100)
  } yield (seed, n, rate)

  test("WAV decode recovers exact sample statistics for arbitrary clips") {
    (1 to 25).foreach { trial =>
      val (seed, n, rate) = gen(wavGen, trial.toLong)
      val f = MultimodalOps.decodeWav(trial.toLong, MultimodalOps.encodeWav(seed, n, rate))
      assert(f.sample_rate === rate, s"trial $trial rate")
      assert(f.n_samples === n.toLong, s"trial $trial count")
      val samples = (0 until n).map(i => MultimodalOps.sample16(seed, i).toInt)
      val meanAbs = if (n == 0) 0.0 else samples.map(math.abs).sum.toDouble / n
      assert(f.mean_abs === meanAbs, s"trial $trial mean_abs")
      val crossings =
        if (n < 2) 0 else samples.sliding(2).count(p => (p(0) < 0) != (p(1) < 0))
      assert(f.zero_crossings === crossings.toLong, s"trial $trial crossings")
    }
  }

  private val vidGen: Gen[(Long, Int, Int, Int, Int)] = for {
    seed <- Gen.choose(Long.MinValue / 2, Long.MaxValue / 2)
    w <- Gen.choose(8, 24)
    h <- Gen.choose(8, 24)
    frames <- Gen.choose(1, 20)
    stride <- Gen.choose(1, 5)
  } yield (seed, w, h, frames, stride)

  test("frame walker samples exactly ceil(frames/stride) frames with exact means") {
    (1 to 25).foreach { trial =>
      val (seed, w, h, frames, stride) = gen(vidGen, trial.toLong)
      val v = MultimodalOps.sampleFrames(trial.toLong,
        MultimodalOps.encodePpmStream(seed, w, h, frames), stride)
      assert(v.n_frames === frames, s"trial $trial frame count")
      assert(v.n_sampled === (frames + stride - 1) / stride, s"trial $trial sampled")
      def frameMean(f: Int): Double =
        (for { y <- 0 until h; x <- 0 until w; c <- 0 until 3 }
          yield MultimodalOps.pixel(seed + f, x, y, c)).sum.toDouble / (3.0 * w * h)
      val expected = (0 until frames by stride).map(frameMean)
      assert(math.abs(v.avg_frame_mean - expected.sum / expected.size) < 1e-9,
        s"trial $trial mean")
    }
  }
}

package graft

import graft.ops.{EmbeddingOps, ForecastOps, TextOps}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property suite for the pure kernels (SURVEY.md §5:
  * property tests for dedup/forecast/risk edge behavior).
  */
object KernelProperties extends Properties("graft.kernels") {

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))

  property("embed is deterministic") = Prop.forAll(text) { t =>
    EmbeddingOps.embed(t).toSeq == EmbeddingOps.embed(t).toSeq
  }

  property("embed is unit-norm or zero") = Prop.forAll(text) { t =>
    val e = EmbeddingOps.embed(t)
    val n = math.sqrt(e.map(v => v.toDouble * v).sum)
    math.abs(n - 1.0) < 1e-4 || n == 0.0
  }

  property("risk ladder is total and ordered") =
    Prop.forAll(Gen.choose(1, 60), Gen.choose(0.0, 50.0)) { (n, scale) =>
      val series = Array.tabulate(n)(i => (i % 7) * scale)
      if (n < ForecastOps.MinHistory) Prop.passed
      else {
        val rows = ForecastOps.forecastSeries(
          "g", java.time.LocalDate.of(2024, 3, 1), series, 7)
        Prop.all(rows.map(r =>
          Prop(Set("LOW", "MODERATE", "HIGH", "CRITICAL")(r.risk_level))): _*)
      }
    }

  property("forecast horizon and clipping hold for any series") =
    Prop.forAll(Gen.choose(7, 40), Gen.listOfN(40, Gen.choose(-5.0, 100.0))) {
      (n, vs) =>
        val series = vs.take(n).toArray
        val rows = ForecastOps.forecastSeries(
          "g", java.time.LocalDate.of(2024, 3, 1), series, 14)
        rows.length == 14 && rows.forall(r =>
          r.predicted >= 0 && r.lower_bound <= r.predicted + 1e-9 &&
            r.upper_bound >= r.predicted - 1e-9)
    }

  property("polyHash equals fold-based hash for 5-char strings") =
    Prop.forAll(Gen.listOfN(5, Gen.alphaNumChar).map(_.mkString)) { s =>
      val want = s.foldLeft(0L)((a, c) => a * 31 + c.toLong)
      // column evaluated through Spark in DedupOpsSpec; here check the
      // reference formula is self-consistent over concatenation
      want == s.zipWithIndex.map { case (c, i) =>
        c.toLong * math.pow(31, s.length - 1 - i).toLong
      }.sum
    }

  /** Naive reference SimHash (distinct-word counts then weighted
    * votes) — the formulation [[graft.functions.SimHashFp]]'s
    * per-occurrence one-pass loop must equal exactly.
    */
  private def naiveSimhash(t: String, bits: Int): Long = {
    // lowercase through UTF8String.toLowerCase — the routine Spark's
    // lower() runs (see the TokenizeWs property below for why a
    // String.toLowerCase(ROOT) reference would mask a divergence)
    val words = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      .toLowerCase.toString
      .split(" ").filter(_.nonEmpty)
    val counts = words.groupBy(identity).view.mapValues(_.length)
    val votes = new Array[Long](bits)
    counts.foreach { case (w, cnt) =>
      val h = (0 until 8).foldLeft(0L)((a, k) =>
        a * 31 + (if (k < w.length) w.charAt(k).toLong else 32L))
      (0 until bits).foreach { j =>
        votes(j) += (if (((h >> j) & 1L) == 1L) cnt.toLong else -cnt.toLong)
      }
    }
    (0 until bits).map(j => if (votes(j) > 0) 1L << j else 0L).sum
  }

  property("SimHashFp one-pass votes equal the count-weighted reference") =
    Prop.forAll(text) { t =>
      graft.functions.SimHashFp.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t), 40) ==
        naiveSimhash(t, 40)
    }

  property("TokenizeWs equals lower+split+filter on arbitrary spaced text") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaUpperChar, Gen.alphaLowerChar, Gen.const(' '), Gen.const('é')))
      .map(_.mkString)) { t =>
      // reference lowercase goes through UTF8String.toLowerCase — the
      // routine Spark's lower() (and therefore the product) must match;
      // a String.toLowerCase(ROOT) reference would diverge on non-ROOT
      // default-locale JVMs for non-ASCII input (tr_TR I→ı)
      val want = org.apache.spark.unsafe.types.UTF8String.fromString(t)
        .toLowerCase.toString
        .split(" ", -1).filter(_.nonEmpty).toSeq
      val got = graft.functions.TokenizeWs.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      got == want
    }

  property("WordHashes equals wordHash over TokenizeWs tokens") =
    Prop.forAll(Gen.listOf(Gen.oneOf(
      Gen.alphaUpperChar, Gen.alphaLowerChar, Gen.const(' '), Gen.const('7')))
      .map(_.mkString)) { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val want = graft.functions.TokenizeWs.compute(u)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString)
        .map(w => (0 until 8).foldLeft(0L)((a, k) =>
          a * 31 + (if (k < w.length) w.charAt(k).toLong else 32L)))
        .toSeq
      val got = graft.functions.WordHashes.compute(u).toLongArray().toSeq
      got == want
    }

  property("ShinglePosHashes: distinct-in-order equals ShingleHashes, one hash per position") =
    Prop.forAll(Gen.listOf(Gen.oneOf(Gen.alphaLowerChar, Gen.const('a')))
      .map(_.mkString)) { t =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(t)
      val n = 3
      val pos = graft.functions.ShinglePosHashes.compute(u, n).toLongArray().toSeq
      val dist = graft.functions.ShingleHashes.compute(u, n).toLongArray().toSeq
      pos.length == math.max(t.length - n + 1, 0) &&
        pos.distinct == dist &&
        pos.zipWithIndex.forall { case (h, i) =>
          h == t.substring(i, i + n).foldLeft(0L)((a, c) => a * 31 + c.toLong)
        }
    }

  property("Md5Poly8 equals polyHash over the md5 hex string") =
    Prop.forAll(Gen.listOf(Gen.asciiPrintableChar).map(_.mkString)) { t =>
      // independent reference path: full hex STRING via commons-style
      // formatting, then the ascii Horner fold the column algebra runs
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = digest.map(b => f"$b%02x").mkString.take(8)
      val want = hex.foldLeft(0L)((a, c) => a * 31 + c.toLong)
      val got = graft.functions.Md5Poly8.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      got == want
    }

  property("ByteStats matches the decodeStub loop on arbitrary payloads") =
    Prop.forAll(Gen.listOf(Gen.choose(-128, 127).map(_.toByte))) { bs =>
      val payload = bs.toArray
      val want = graft.ops.MultimodalOps.decodeStub(
        graft.ops.MultimodalOps.MediaRow(0L, "image", payload))
      val got = graft.functions.ByteStats.compute(payload)
      got.getInt(0) == want.n_bytes && got.getInt(1) == want.width &&
        got.getInt(2) == want.height &&
        got.getDouble(3) == want.mean_byte &&
        got.getDouble(4) == want.entropy_proxy
    }

  property("BitsetContains: every inserted position probes true") =
    Prop.forAll(Gen.nonEmptyListOf(Gen.choose(0L, (1L << 16) - 1))) { ps =>
      val words = new Array[Long](1024)
      ps.foreach(p => words((p >>> 6).toInt) |= 1L << (p & 63L).toInt)
      val probe = graft.functions.BitsetContains(
        org.apache.spark.sql.catalyst.expressions.Literal(0L), words)
      ps.forall(p => probe.nullSafeEval(p) == true)
    }

  // Scala replication of the engine's fixed shift-mask bit spread
  // (ScaleQueries.withMortonZ constants)
  private def spread16(v: Long): Long = {
    var t = (v | (v << 8)) & 16711935L
    t = (t | (t << 4)) & 252645135L
    t = (t | (t << 2)) & 858993459L
    (t | (t << 1)) & 1431655765L
  }

  property("Morton spread round-trips and z-tiles are 64x64 blocks") =
    Prop.forAll(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L)) { (x, y) =>
      val z = spread16(x) | (spread16(y) << 1)
      def unspread(v: Long): Long =
        (0 until 16).map(i => ((v >> (2 * i)) & 1L) << i).sum
      val roundTrip = unspread(z) == x && unspread(z >> 1) == y
      // dropping 20 z-bits = dropping 10 bits per axis → the tile is
      // exactly the (x >> 10, y >> 10) grid block, interleaved
      val tile = z >> 20
      val tileFromXY = spread16(x >> 10) | (spread16(y >> 10) << 1)
      roundTrip && tile == tileFromXY
    }

  property("quantile lattice bin always contains its value, width <= 1/16") =
    Prop.forAll(Gen.choose(1L, 1000000000L)) { v =>
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val s = (v >> math.max(e - 4, 0)) & 15L
      val vLo = if (e < 4) s else (16L + s) << (e - 4)
      val vHi = if (e < 4) vLo + 1 else vLo + (1L << (e - 4))
      vLo <= v && v < vHi &&
        (e < 4 || (vHi - vLo).toDouble / vLo <= 1.0 / 16.0)
    }

  property("pageRankScale keeps >=1000 micro per node at any size") =
    Prop.forAll(Gen.choose(1L, 10000000000L)) { n =>
      graft.ops.GraphOps.pageRankScale(n) / n >= 1000L
    }

  property("WAV PCM16 encode->decode round-trips any sample vector") =
    Prop.forAll(Gen.listOf(Gen.choose(-32768, 32767))) { samples =>
      val arr = samples.toArray
      graft.ops.AudioCodec.decodeSamples(
        graft.ops.AudioCodec.encodePcm16(arr)).exists(_.sameElements(arr))
    }
}

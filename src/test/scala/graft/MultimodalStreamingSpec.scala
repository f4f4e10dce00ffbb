package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Multimodal
import graft.streaming.Streaming

class MultimodalStreamingSpec extends SparkSpec {

  test("multimodal: binary wrap + batched decode plumbing") {
    import spark.implicits._
    val raw = Seq(
      (1L, "payload-one".getBytes("UTF-8")),
      (2L, "payload-two-longer".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]]))
      .toDF("id", "bytes")
    val media = Multimodal.asMedia(raw, "id", "bytes", "image/png")
    assert(media.schema("meta").dataType.isInstanceOf[StructType])

    val decoded = Multimodal.decodeBatch(media, dim = 8)
    val rows = decoded.orderBy("media_id").collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[scala.collection.Seq[Float]]("feature").length == 8))
    assert(rows(0).getAs[Int]("n_bytes") == "payload-one".length)
    assert(rows(2).getAs[Int]("n_bytes") == 0)
    // deterministic: same payload → same features on rerun
    val again = Multimodal.decodeBatch(media, dim = 8)
      .orderBy("media_id").collect()
    assert(rows.map(_.getAs[scala.collection.Seq[Float]]("feature")).toSeq ==
      again.map(_.getAs[scala.collection.Seq[Float]]("feature")).toSeq)
  }

  test("multimodal: real PNG decodes to actual pixel statistics") {
    import spark.implicits._
    // 16×16 PNG, left half pure red, right half pure white, written with
    // the same javax.imageio the codec reads with
    def png(): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, if (x < 8) 0xFF0000 else 0xFFFFFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val garbage = "not-an-image".getBytes("UTF-8")
    val media = Multimodal.asMedia(
      Seq((1L, png()), (2L, garbage)).toDF("id", "bytes"),
      "id", "bytes", "image/png")
    val rows = Multimodal.decodeBatch(media, dim = 11)
      .orderBy("media_id").collect()
    val f = rows(0).getAs[scala.collection.Seq[Float]]("feature")
    // mean R = 1.0 (red and white both have R=255); mean G = mean B = 0.5
    assert(math.abs(f(0) - 1.0f) < 1e-6)
    assert(math.abs(f(1) - 0.5f) < 1e-6)
    assert(math.abs(f(2) - 0.5f) < 1e-6)
    // luminance histogram (8 bins): red luma 76 → bin 2, white 255 → bin 7,
    // half the pixels each
    assert(math.abs(f(3 + 2) - 0.5f) < 1e-6)
    assert(math.abs(f(3 + 7) - 0.5f) < 1e-6)
    assert(math.abs(f.sum - (1.0f + 0.5f + 0.5f + 1.0f)) < 1e-5)
    // non-image payload falls back to the deterministic fake
    val g = rows(1).getAs[scala.collection.Seq[Float]]("feature")
    assert(g.toArray.toSeq ==
      graft.operators.Multimodal.fakeDecode(garbage, 11).toSeq)
    // REAL decoded dimensions land in the output; fake path stays null
    assert(rows(0).getAs[Int]("width") == 16)
    assert(rows(0).getAs[Int]("height") == 16)
    assert(rows(1).isNullAt(rows(1).fieldIndex("width")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("height")))

    // withDecodedMeta populates meta.width/height from the true header
    val described = Multimodal.withDecodedMeta(media)
      .orderBy("media_id").collect()
    val meta0 = described(0).getStruct(described(0).fieldIndex("meta"))
    assert(meta0.getAs[Int]("width") == 16)
    assert(meta0.getAs[Int]("height") == 16)
    assert(meta0.getAs[String]("mime") == "image/png")
    // unreadable payload keeps its existing (null) meta dims
    val meta1 = described(1).getStruct(described(1).fieldIndex("meta"))
    assert(meta1.isNullAt(meta1.fieldIndex("width")))
  }

  test("multimodal: decompression-bomb payload is rejected before decode") {
    import spark.implicits._
    // hand-crafted PNG header declaring a 40000×40000 canvas (1.6 Gpx ≈
    // 6.4 GB ARGB) with no real pixel data — a classic bomb shape. The
    // header probe must reject it without allocating.
    def bombPng(w: Int, h: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
        .map(_.toByte))
      val ihdr = new java.io.ByteArrayOutputStream()
      ihdr.write("IHDR".getBytes("US-ASCII"))
      def be32(v: Int) = ihdr.write(Array(v >>> 24, v >>> 16, v >>> 8, v)
        .map(b => (b & 0xFF).toByte))
      be32(w); be32(h)
      ihdr.write(Array(8, 2, 0, 0, 0).map(_.toByte)) // bit depth 8, RGB
      val chunk = ihdr.toByteArray
      val crc = new java.util.zip.CRC32(); crc.update(chunk)
      def out32(v: Long) = bos.write(Array(v >>> 24, v >>> 16, v >>> 8, v)
        .map(b => (b & 0xFF).toByte))
      out32(chunk.length - 4) // data length excludes the type tag
      bos.write(chunk); out32(crc.getValue)
      bos.toByteArray
    }
    val bomb = bombPng(40000, 40000)
    // the probe itself reads only the header
    assert(graft.operators.Multimodal.probeDims(bomb)
      .contains((40000, 40000)))
    // the decode path refuses it and falls back to the deterministic fake
    assert(graft.operators.Multimodal.imageDecode(bomb, 8).isEmpty)
    val media = Multimodal.asMedia(
      Seq((1L, bomb)).toDF("id", "bytes"), "id", "bytes", "image/png")
    val row = Multimodal.decodeBatch(media, dim = 8).collect().head
    assert(row.isNullAt(row.fieldIndex("width")))
    assert(row.getAs[scala.collection.Seq[Float]]("feature").toArray.toSeq ==
      graft.operators.Multimodal.fakeDecode(bomb, 8).toSeq)
    // a small legitimate image still passes the guard end-to-end
    assert(graft.operators.Multimodal.probeDims(bombPng(4, 4))
      .contains((4, 4)))
  }

  test("multimodal: real WAV decodes to actual amplitude statistics") {
    import spark.implicits._
    // 440 Hz sine at amplitude 0.5, 8000 Hz mono, 0.5 s = 4000 frames,
    // written with the same javax.sound.sampled the codec reads with
    def wav(): Array[Byte] = {
      val rate = 8000f; val frames = 4000
      val pcm = new Array[Byte](frames * 2)
      for (i <- 0 until frames) {
        val s = math.round(0.5 * 32767.0 *
          math.sin(2 * math.Pi * 440.0 * i / rate)).toShort
        pcm(2 * i) = (s & 0xFF).toByte
        pcm(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        rate, 16, 1, 2, rate, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(ais,
        javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val garbage = "not-audio".getBytes("UTF-8")
    val media = Multimodal.asMedia(
      Seq((1L, wav()), (2L, garbage)).toDF("id", "bytes"),
      "id", "bytes", "audio/wav")
    val rows = Multimodal.decodeBatch(media, dim = 8)
      .orderBy("media_id").collect()
    val f = rows(0).getAs[scala.collection.Seq[Float]]("feature")
    // RMS of a 0.5-amplitude sine = 0.5/√2 ≈ 0.3536; mean |x| = amp·2/π
    assert(math.abs(f(0) - 0.35355) < 0.01, s"rms ${f(0)}")
    assert(math.abs(f(1) - 0.31831) < 0.01, s"mean|x| ${f(1)}")
    assert(math.abs(f(2) - 0.5) < 0.01, s"peak ${f(2)}")
    assert(rows(0).getAs[Int]("sample_rate") == 8000)
    assert(rows(0).getAs[Long]("duration_ms") == 500L)
    assert(rows(0).isNullAt(rows(0).fieldIndex("width")))
    // garbage payload: fake path, no invented audio metadata
    assert(rows(1).isNullAt(rows(1).fieldIndex("sample_rate")))
    assert(rows(1).isNullAt(rows(1).fieldIndex("duration_ms")))
    // header-only meta probe fills duration_ms, keeps width/height null
    val described = Multimodal.withDecodedMeta(media)
      .orderBy("media_id").collect()
    val meta0 = described(0).getStruct(described(0).fieldIndex("meta"))
    assert(meta0.getLong(3) == 500L)
    assert(meta0.isNullAt(1) && meta0.isNullAt(2))
  }

  test("multimodal: frame sampling emits one row per sampled frame") {
    import spark.implicits._
    val media = Multimodal.asMedia(
        Seq((1L, "vid".getBytes("UTF-8"))).toDF("id", "bytes"),
        "id", "bytes", "video/mp4")
      .withColumn("meta", struct(
        col("meta.mime").as("mime"), col("meta.width").as("width"),
        col("meta.height").as("height"),
        lit(3500L).as("duration_ms")))
    val frames = Multimodal.sampleFrames(media, everyMs = 1000L, dim = 4)
      .orderBy("frame_ms").collect()
    // frames at 0, 1000, 2000, 3000 ms
    assert(frames.map(_.getAs[Long]("frame_ms")).toSeq ==
      Seq(0L, 1000L, 2000L, 3000L))
    // per-frame features differ (codec seeded by frame offset)
    assert(frames.map(_.getAs[scala.collection.Seq[Float]]("feature")).distinct.length == 4)
  }

  test("streaming: windowed counts match batch (stream/batch parity)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("events").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val rows = (0 until 200).map { i =>
      (i.toLong, new java.sql.Timestamp(t0.getTime + i * 47000L),
        (i % 7).toLong, if (i % 3 == 0) "click" else "view", i * 1.5)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)

    val batch = spark.read.parquet(dir)
    val expected = Streaming.windowedCounts(batch)
      .orderBy("window_start", "event_type").collect()

    val streamed = spark.readStream.schema(batch.schema).parquet(dir)
    // append mode only emits watermark-closed windows on a finite file —
    // complete mode gives exact batch parity
    val gotComplete = Streaming.runToMemory(spark,
        Streaming.windowedCounts(streamed), "wc_complete", "complete")
      .orderBy("window_start", "event_type").collect()
    assert(gotComplete.map(_.toSeq).toSeq == expected.map(_.toSeq).toSeq)
  }

  test("streaming: watermarked dedup drops at-least-once duplicates") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dupevents").toString
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    // every event delivered twice (at-least-once source), 100 distinct
    val rows = (0 until 100).flatMap { i =>
      val r = (i.toLong, new java.sql.Timestamp(t0.getTime + i * 1000L),
        (i % 5).toLong, "click", i * 1.0)
      Seq(r, r)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(dir)
    val batch = spark.read.parquet(dir)
    assert(batch.count() == 200)
    // batch path: plain dropDuplicates
    assert(Streaming.dedupStream(batch, Seq("event_id")).count() == 100)
    // streaming path: bounded-state dropDuplicatesWithinWatermark
    val streamed = spark.readStream.schema(batch.schema).parquet(dir)
    val got = Streaming.runToMemory(spark,
      Streaming.dedupStream(streamed, Seq("event_id")), "dedup_stream")
    assert(got.count() == 100)
    assert(got.select("event_id").distinct().count() == 100)
  }

  test("session_window sessions: exact-gap events still merge (≤ gap)") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(minutes: Int) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    // session_window merges an event at EXACTLY last+gap (boundary
    // inclusive — pinned here because the st6 oracle's islands must
    // split with strict >, same rule as e2); 31' past the last event
    // starts a new session
    val events = Seq(
      (1L, ts(0), 7L, "click", 1.0),
      (2L, ts(29), 7L, "click", 2.0),
      (3L, ts(59), 7L, "buy", 10.0),  // 29 + 30 exactly → merges
      (4L, ts(91), 7L, "view", 4.0),  // 59 + 32 → new session
      (5L, ts(0), 8L, "view", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Streaming.sessionWindows(events, gap = "30 minutes")
      .orderBy(col("user_id"), col("session_start"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.toSeq === Seq(
      (7L, ts(0), 3L, 13.0),
      (7L, ts(91), 1L, 4.0),
      (8L, ts(0), 1L, 5.0)))
  }

  test("streaming: gap sessionization groups events per user") {
    import spark.implicits._
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    def ts(minutes: Int) =
      new java.sql.Timestamp(t0.getTime + minutes * 60000L)
    val events = Seq(
      Streaming.Event(1, ts(0), 7L, "click", 1.0),
      Streaming.Event(2, ts(5), 7L, "click", 2.0),
      // 90' gap → new session
      Streaming.Event(3, ts(95), 7L, "buy", 10.0),
      Streaming.Event(4, ts(2), 8L, "click", 5.0)).toDS()
    // batch Dataset drive: flatMapGroupsWithState in batch mode processes
    // each group once with no timeout — open sessions stay in state, so
    // only the CLOSED first session of user 7 is emitted
    val sessions = Streaming.sessionize(events, gapMs = 30 * 60 * 1000L)
      .collect()
    assert(sessions.length == 1)
    val s = sessions.head
    assert(s.user_id == 7L && s.n_events == 2 && s.total_value == 3.0)
  }

  test("watermark drops a late row only AFTER its window's state is evicted (st11 contract)") {
    import spark.implicits._
    // Pins the engine behavior st11_stream_late_drop stages around
    // (measured, NOTES round 8): a late row into a STILL-OPEN window
    // is accepted (watermark bounds state, not acceptance); the same
    // lateness one batch after eviction is dropped with no
    // re-emission. If a Spark upgrade tightens acceptance to strict
    // watermark filtering, arm 1 flips and st11's staging margin
    // should be revisited.
    def ts(x: String) = java.sql.Timestamp.valueOf(x)
    def run(batches: Seq[Seq[(Long, java.sql.Timestamp)]],
        name: String): Map[java.sql.Timestamp, Long] = {
      val base = java.nio.file.Files.createTempDirectory(s"wm$name")
      val staged = base.resolve("in")
      java.nio.file.Files.createDirectories(staged)
      for ((rows, k) <- batches.zipWithIndex) {
        val tmp = base.resolve(s"tmp$k").toString
        rows.toDF("event_id", "ts").coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".parquet")).get
        val dst = staged.resolve(f"b$k%02d.parquet")
        java.nio.file.Files.move(part.toPath, dst)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() - 400000L + k * 60000L))
      }
      val schema = spark.read.parquet(staged.toString).schema
      val agg = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(staged.toString)
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
      val got = Streaming.runToMemory(spark, agg, s"wm_$name", "append")
      got.collect().map(r => (r.getStruct(0).getTimestamp(0),
        r.getLong(1))).toMap
    }
    val early = ts("2024-01-01 00:10:00")
    val earlyWin = ts("2024-01-01 00:00:00")
    // arm 1: late row arrives while its window state is still open
    // (eviction lags the watermark by one batch) → ACCEPTED, n = 2
    val open = run(Seq(
      Seq((1L, early), (2L, ts("2024-01-05 00:10:00"))),
      Seq((3L, ts("2024-01-06 00:10:00")), (9L, ts("2024-01-01 00:20:00")))),
      "open")
    assert(open(earlyWin) === 2L, s"still-open window should accept: $open")
    // arm 2: same lateness one batch AFTER eviction → DROPPED, n = 1,
    // and no duplicate emission of the evicted window
    val evicted = run(Seq(
      Seq((1L, early), (2L, ts("2024-01-05 00:10:00"))),
      Seq((3L, ts("2024-01-06 00:10:00"))),
      Seq((9L, ts("2024-01-01 00:20:00")), (4L, ts("2024-01-07 00:10:00")))),
      "evicted")
    assert(evicted(earlyWin) === 1L, s"post-eviction late row must drop: $evicted")
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.etl.FixtureLoader.spark
import java.nio.file.{Files, Paths}

class SourcesSpec extends AnyFunSuite {
  import spark.implicits._

  test("person XML render matches template shape and escapes") {
    val persons = Seq(("6030", "Ann & Bo", "O'Neil", "<PhD>", "100", "ann",
        "Public", "true"))
      .toDF("person_id", "first_name", "last_name", "postnominal", "emplid",
        "internet_id", "visibility", "profiled")
    val jobs = Seq(("6030", "autoid:6030-ORG-x", "9403", "a@umn.edu",
        "faculty", "true", "ORG",
        java.sql.Timestamp.valueOf("2015-09-01 00:00:00"),
        null.asInstanceOf[java.sql.Timestamp], "academic", "Professor"))
      .toDF("person_id", "staff_org_association_id", "affiliation_id",
        "email_address", "employment_type", "primary_association", "org_id",
        "period_start_date", "period_end_date", "staff_type",
        "job_description")
    val xml = XmlSync.renderPersonsXml(persons, jobs).collect().head
    assert(xml.contains("""<person id="6030">"""))
    assert(xml.contains("<v3:firstname>Ann &amp; Bo</v3:firstname>"))
    assert(xml.contains("<v3:lastname>O&#39;Neil</v3:lastname>"))
    assert(xml.contains("&lt;PhD&gt;"))
    assert(xml.contains("<v3:startDate>01-09-2015</v3:startDate>"))
    assert(!xml.contains("endDate"))
    assert(xml.contains("<primaryAssociation>true</primaryAssociation>"))
    assert(xml.contains("""<v3:id type="employee" id="autoid:6030-employee-100">100</v3:id>"""))
    assert(xml.contains("<userName>ann@umn.edu</userName>"))
    assert(xml.contains("<profiled>true</profiled>"))
  }

  test("single-file sync sink writes header + elements + footer") {
    val dir = Files.createTempDirectory("xmlsync").toString
    val target = s"$dir/persons_1.xml"
    val elems = Seq("<person id=\"a\"/>\n", "<person id=\"b\"/>\n").toDS()
    XmlSync.writeSyncFile(elems, XmlSync.personsHeader,
      XmlSync.personsFooter, target)
    val content = Files.readString(Paths.get(target))
    assert(content.startsWith("<?xml version"))
    assert(content.endsWith("</persons>"))
    assert(content.contains("<person id=\"a\"/>"))
    assert(content.contains("<person id=\"b\"/>"))
  }

  test("sync file rotation keeps newest N and maintains latest link") {
    val dir = Files.createTempDirectory("rot")
    for (i <- 1 to 5) {
      val p = dir.resolve(s"persons_$i.xml")
      Files.writeString(p, s"f$i")
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000L * i))
    }
    XmlSync.rotateSyncFiles(dir.toString, "persons_", keep = 2)
    val left = Files.list(dir).iterator()
    val names = scala.jdk.CollectionConverters.IteratorHasAsScala(left)
      .asScala.map(_.getFileName.toString).toSet
    assert(names.contains("persons_5.xml") && names.contains("persons_4.xml"))
    assert(!names.contains("persons_1.xml"))
    assert(names.contains("latest_persons_"))
  }

  test("multimodal decode is batched, deterministic, and schema-typed") {
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "other"))
      .toDF("doc_id", "text")
    val media = Multimodal.packAsMedia(docs, "doc_id", "text")
    assert(media.schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fields.map(f => (f.name, f.dataType)).toSeq ==
      Multimodal.metaSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val feats = Multimodal.decodeFeatures(media, dim = 8, batchSize = 2)
    val byId = feats.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(byId(1L) == byId(2L)) // same bytes → same features
    assert(byId(1L) != byId(3L))
    assert(byId(1L).length == 8)
  }

  test("decoded media features flow into ANN search end-to-end") {
    // composition: opaque binary → batched feature extraction → top-k
    // cosine — the multimodal-to-similarity pipeline shape
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .limit(100)
    val media = Multimodal.packAsMedia(docs, "doc_id", "text")
    val feats = Multimodal.decodeFeatures(media, dim = 16)
      .select(col("media_id").as("vec_id"),
        transform(col("features"), x => x.cast("double")).as("embedding"))
    val topk = graft.operators.Similarity.topK(
      feats, feats.limit(5), "vec_id", "embedding", k = 3)
    assert(topk.count() == 15)
    assert(topk.groupBy("query_id").count().select(max("count"))
      .first().getLong(0) == 3)
  }

  /** Hand-assembled uncompressed 24-bit BMP (bottom-up, padded rows). */
  private def makeBmp(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
    val height = pixels.length
    val width = pixels.head.length
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val buf = java.nio.ByteBuffer.allocate(54 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(54 + dataSize)
      .putInt(0).putInt(54) // reserved, pixel offset
    buf.putInt(40).putInt(width).putInt(height) // BITMAPINFOHEADER
      .putShort(1).putShort(24).putInt(0).putInt(dataSize)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (height - 1) to 0 by -1) { // bottom-up row order
      for (x <- 0 until width) {
        val (r, g, b) = pixels(y)(x)
        buf.put(b.toByte).put(g.toByte).put(r.toByte) // BGR on disk
      }
      for (_ <- 0 until rowSize - width * 3) buf.put(0.toByte)
    }
    buf.array()
  }

  test("dHash: format-invariant, brightness-invariant, discriminative") {
    def makePpm(pixels: Array[Array[(Int, Int, Int)]]): Array[Byte] = {
      val h = pixels.length; val w = pixels.head.length
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      header ++ pixels.flatMap(_.flatMap { case (r, g, b) =>
        Seq(r.toByte, g.toByte, b.toByte) })
    }
    // 16x16 horizontal gradient, coarse steps so transforms below
    // preserve strict brightness ordering
    def grad(shift: Int, transpose: Boolean) =
      Array.tabulate(16, 16) { (y, x) =>
        val v = (if (transpose) y else x) * 12 + shift
        (v, v, v)
      }.map(_.toArray)
    val base = grad(0, transpose = false)
    val hBmp = Multimodal.MediaCodec.dHash(
      Multimodal.MediaCodec.decodeBmp(makeBmp(base)).get)
    val hPpm = Multimodal.MediaCodec.dHash(
      Multimodal.MediaCodec.decodePpm(makePpm(base)).get)
    // same pixels, different container → identical fingerprint
    assert(hBmp == hPpm)
    // monotone brightness shift → identical fingerprint (dHash keys on
    // ORDER of adjacent intensities, not their values)
    val hShift = Multimodal.MediaCodec.dHash(
      Multimodal.MediaCodec.decodePpm(makePpm(grad(40, transpose = false))).get)
    assert(hShift == hBmp)
    // a genuinely different image (vertical gradient) must not collide
    val hVert = Multimodal.MediaCodec.dHash(
      Multimodal.MediaCodec.decodePpm(makePpm(grad(0, transpose = true))).get)
    assert(hVert != hBmp)
  }

  test("imageDHash pipeline: real PPM decode, exact-dup texts collide") {
    val docs = Seq(
      (1L, "the same text payload"),
      (2L, "the same text payload"), // exact dup of 1
      (3L, "a completely different document body here")).toDF("doc_id", "text")
    val got = Multimodal.imageDHash(
        Multimodal.packAsPpmMedia(docs, "doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Long]), r.getString(2))).toMap
    assert(got.values.forall(_._2 == "image/ppm"))
    assert(got(1L)._1.isDefined && got(1L)._1 == got(2L)._1,
      "identical payloads must produce identical fingerprints")
    assert(got(1L)._1 != got(3L)._1,
      "distinct documents should not collide")
    // non-image payloads must yield null hash + undecodable tag, never
    // a hash of raw bytes
    val stub = Multimodal.imageDHash(
        docs.select(col("doc_id").cast("long").as("media_id"),
          col("text").cast("binary").as("bytes")))
      .collect()
    assert(stub.forall(r => r.isNullAt(1) && r.getString(2) == "undecodable"))
  }

  test("BMP payloads decode to real pixels through the batch boundary") {
    // 2x2: red, green / blue, white — distinct corners prove row order
    // and BGR→RGB handling
    val bmp = makeBmp(Array(
      Array((255, 0, 0), (0, 255, 0)),
      Array((0, 0, 255), (255, 255, 255))))
    val img = Multimodal.MediaCodec.decodeBmp(bmp).get
    assert(img.width == 2 && img.height == 2)
    // top-down row-major RGB
    assert(img.rgb.toSeq.map(_ & 0xFF) == Seq(
      255, 0, 0, 0, 255, 0, // row 0: red, green
      0, 0, 255, 255, 255, 255)) // row 1: blue, white

    // non-BMP bytes refuse to decode (fall back to the stub fold)
    assert(Multimodal.MediaCodec.decodeBmp("not a bmp".getBytes).isEmpty)
    assert(Multimodal.MediaCodec.decodeBmp(null).isEmpty)
    // truncated pixel data refuses rather than reading out of bounds
    assert(Multimodal.MediaCodec.decodeBmp(bmp.dropRight(4)).isEmpty)
    // crafted headers must return None, never throw: width whose *3
    // overflows Int, Int.MinValue height, giant width*height
    def patched(off: Int, v: Int): Array[Byte] = {
      val b = bmp.clone()
      java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        .putInt(off, v)
      b
    }
    assert(Multimodal.MediaCodec.decodeBmp(patched(18, 0x2AAAAAAB)).isEmpty)
    assert(Multimodal.MediaCodec.decodeBmp(patched(22, Int.MinValue)).isEmpty)
    assert(Multimodal.MediaCodec.decodeBmp(patched(18, 40000))
      .isEmpty) // 40000*2 rows don't fit the payload
    assert(Multimodal.MediaCodec.decodeBmp(patched(10, Int.MaxValue)).isEmpty)

    // through the Spark batched boundary: features derive from decoded
    // pixel content — the all-white image's intensity sum (4.0 over
    // dim buckets per channel position) is exact and predictable
    val white = makeBmp(Array(
      Array((255, 255, 255), (255, 255, 255)),
      Array((255, 255, 255), (255, 255, 255))))
    val media = Seq((1L, bmp), (2L, white)).toDF("media_id", "bytes")
      .select(col("media_id"), col("bytes"), lit(null).cast(
        org.apache.spark.sql.types.DataTypes.createStructType(
          Multimodal.metaSchema.fields)).as("meta"))
    val feats = Multimodal.decodeFeatures(media, dim = 3, batchSize = 1)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    // white: 12 samples of 1.0 folded into 3 buckets → (4, 4, 4)
    assert(feats(2L) == Seq(4.0f, 4.0f, 4.0f))
    // mixed corners: R channel hits bucket 0, G bucket 1, B bucket 2
    // pixel stream: (255,0,0),(0,255,0),(0,0,255),(255,255,255)
    assert(feats(1L) == Seq(2.0f, 2.0f, 2.0f))
  }

  test("PPM payloads decode to the same pixels as the equivalent BMP") {
    // P6 2x2 with a header comment: red green / blue white — identical
    // content to the BMP test image, decoded through the other format
    val header = "P6\n# test image\n2 2\n255\n".getBytes("US-ASCII")
    val pixels = Array(255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
      .map(_.toByte)
    val ppm = header ++ pixels
    val img = Multimodal.MediaCodec.decodePpm(ppm).get
    assert(img.width == 2 && img.height == 2)
    assert(img.rgb.toSeq == pixels.toSeq)
    // same decoded content as the BMP form -> identical features
    val bmp = makeBmp(Array(
      Array((255, 0, 0), (0, 255, 0)),
      Array((0, 0, 255), (255, 255, 255))))
    val feats = Multimodal.MediaCodec.decodeBatch(Seq(ppm, bmp), dim = 3)
    assert(feats(0).toSeq == feats(1).toSeq)
    // CRLF header (Windows text-mode write): decodes unshifted
    val crlf = "P6\r\n2 2\r\n255\r\n".getBytes("US-ASCII") ++ pixels
    assert(Multimodal.MediaCodec.decodePpm(crlf).get.rgb.toSeq ==
      pixels.toSeq)
    // refusals: ASCII P3, wrong maxval, truncated pixels, non-ws delim
    assert(Multimodal.MediaCodec.decodePpm("P3\n2 2\n255\n".getBytes).isEmpty)
    assert(Multimodal.MediaCodec
      .decodePpm(("P6\n2 2\n65535\n" + "x" * 24).getBytes).isEmpty)
    assert(Multimodal.MediaCodec.decodePpm(ppm.dropRight(1)).isEmpty)
    assert(Multimodal.MediaCodec
      .decodePpm(("P6\n2 2\n255" + "x" * 13).getBytes).isEmpty)
  }

  test("PNG payloads decode through inflate + all five filter types") {
    import java.util.zip.{CRC32, Deflater}
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length).put(ctype.getBytes("US-ASCII")).put(data)
      val crc = new CRC32()
      crc.update(ctype.getBytes("US-ASCII")); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    def deflate(raw: Array[Byte]): Array[Byte] = {
      val d = new Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](raw.length + 256)
      var n = 0
      while (!d.finished()) n += d.deflate(buf, n, buf.length - n)
      d.end()
      buf.take(n)
    }
    // forward PNG filter (RFC 2083 §6, encoder direction) — the
    // independent reference the decoder's un-filtering must invert
    def filterRow(ft: Int, row: Array[Int], prev: Array[Int],
        bpp: Int): Array[Byte] = {
      val out = new Array[Byte](row.length + 1)
      out(0) = ft.toByte
      for (x <- row.indices) {
        val a = if (x >= bpp) row(x - bpp) else 0
        val b = prev(x)
        val c = if (x >= bpp) prev(x - bpp) else 0
        val pred = ft match {
          case 0 => 0
          case 1 => a
          case 2 => b
          case 3 => (a + b) >> 1
          case 4 =>
            val p = a + b - c
            val pa = math.abs(p - a); val pb = math.abs(p - b)
            val pc = math.abs(p - c)
            if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
        }
        out(x + 1) = ((row(x) - pred) & 0xFF).toByte
      }
      out
    }
    def makePng(w: Int, h: Int, colorType: Int, rows: Seq[Array[Int]],
        filters: Seq[Int], bitDepth: Int = 8, interlace: Int = 0): Array[Byte] = {
      val bpp = if (colorType == 6) 4 else 3
      val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
      val ihdr = java.nio.ByteBuffer.allocate(13)
      ihdr.putInt(w).putInt(h).put(bitDepth.toByte).put(colorType.toByte)
        .put(0.toByte).put(0.toByte).put(interlace.toByte)
      val zero = Array.fill(w * bpp)(0)
      val raw = rows.zip(filters).zipWithIndex.flatMap { case ((row, ft), y) =>
        filterRow(ft, row, if (y == 0) zero else rows(y - 1), bpp)
      }.toArray
      sig ++ chunk("IHDR", ihdr.array()) ++ chunk("IDAT", deflate(raw)) ++
        chunk("IEND", Array.emptyByteArray)
    }

    // RGB 2x5, one scanline per filter type 0..4, values chosen to
    // wrap mod 256 under Sub/Up/Paeth
    val rgbRows = Seq(
      Array(255, 0, 0, 0, 255, 0),
      Array(0, 0, 255, 255, 255, 255),
      Array(10, 20, 30, 40, 50, 60),
      Array(200, 100, 3, 7, 250, 128),
      Array(1, 2, 3, 254, 253, 252))
    val png = makePng(2, 5, 2, rgbRows, Seq(0, 1, 2, 3, 4))
    val img = Multimodal.MediaCodec.decodePng(png).get
    assert(img.width == 2 && img.height == 5)
    assert(img.rgb.toSeq.map(_ & 0xFF) == rgbRows.flatten)

    // RGBA: alpha channel decodes then drops — RGB bytes survive
    val rgbaRows = Seq(
      Array(255, 0, 0, 17, 0, 255, 0, 34),
      Array(0, 0, 255, 51, 255, 255, 255, 68),
      Array(9, 8, 7, 6, 5, 4, 3, 2))
    val rgba = makePng(2, 3, 6, rgbaRows, Seq(1, 4, 3))
    val imgA = Multimodal.MediaCodec.decodePng(rgba).get
    assert(imgA.rgb.toSeq.map(_ & 0xFF) ==
      rgbaRows.flatten.grouped(4).flatMap(_.take(3)).toSeq)

    // same pixel content as the BMP/PPM test image → identical features
    // through the shared batch boundary
    val rgb22 = Seq(Array(255, 0, 0, 0, 255, 0),
      Array(0, 0, 255, 255, 255, 255))
    val png22 = makePng(2, 2, 2, rgb22, Seq(0, 2))
    val bmp22 = makeBmp(Array(
      Array((255, 0, 0), (0, 255, 0)),
      Array((0, 0, 255), (255, 255, 255))))
    val feats = Multimodal.MediaCodec.decodeBatch(Seq(png22, bmp22), dim = 3)
    assert(feats(0).toSeq == feats(1).toSeq)

    // refusals, never throws: interlaced, 16-bit, palette, truncated
    // IDAT stream, bad magic
    assert(Multimodal.MediaCodec
      .decodePng(makePng(2, 5, 2, rgbRows, Seq(0, 1, 2, 3, 4), interlace = 1))
      .isEmpty)
    assert(Multimodal.MediaCodec
      .decodePng(makePng(2, 5, 2, rgbRows, Seq(0, 1, 2, 3, 4), bitDepth = 16))
      .isEmpty)
    assert(Multimodal.MediaCodec
      .decodePng(makePng(2, 5, 3, rgbRows, Seq(0, 1, 2, 3, 4))).isEmpty)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    val ihdr22 = java.nio.ByteBuffer.allocate(13)
    ihdr22.putInt(2).putInt(2).put(8.toByte).put(2.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    val zlib = deflate(rgb22.zipWithIndex.flatMap { case (r, y) =>
      filterRow(0, r, Array.fill(6)(0), 3) }.toArray)
    // drop half the deflate stream (dropping only the 4-byte adler32
    // trailer wouldn't remove pixel data — the decoder is length-framed)
    val truncated = sig ++ chunk("IHDR", ihdr22.array()) ++
      chunk("IDAT", zlib.dropRight(zlib.length / 2)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(Multimodal.MediaCodec.decodePng(truncated).isEmpty)
    assert(Multimodal.MediaCodec.decodePng("not a png".getBytes).isEmpty)
    assert(Multimodal.MediaCodec.decodePng(null).isEmpty)
  }

  test("JPEG/GIF and refused-PNG flavors decode via the JDK ImageIO path") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def encode(img: BufferedImage, fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, fmt, bos), s"JDK cannot encode $fmt")
      bos.toByteArray
    }
    def refRgb(bytes: Array[Byte]): Array[Byte] = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      val px = img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0,
        img.getWidth)
      px.flatMap(p => Array(((p >> 16) & 0xFF).toByte,
        ((p >> 8) & 0xFF).toByte, (p & 0xFF).toByte))
    }
    val src = new BufferedImage(6, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 6)
      src.setRGB(x, y, ((x * 40) << 16) | ((y * 60) << 8) | (x * y * 10))
    // JPEG is lossy: the hand-rolled decoders must refuse it, and the
    // ImageIO path must match an ImageIO reference read bit-for-bit
    val jpeg = encode(src, "jpg")
    assert((jpeg(0) & 0xFF) == 0xFF && (jpeg(1) & 0xFF) == 0xD8)
    assert(Multimodal.MediaCodec.decodeBmp(jpeg).isEmpty &&
      Multimodal.MediaCodec.decodePng(jpeg).isEmpty)
    val dj = Multimodal.MediaCodec.decodeImageIO(jpeg).get
    assert(dj.width == 6 && dj.height == 4)
    assert(dj.rgb.sameElements(refRgb(jpeg)))
    // GIF authored by hand from the spec (uncompressed-LZW trick: a
    // clear code before every pixel keeps codes at 3 bits) — an
    // encoder-independent reference, since the JDK's own GIF *writer*
    // shifts rows on small indexed images (verified: row y comes back
    // displaced by 2y pixels). Decoded pixels must match the palette.
    val palette = Array(0xFF0000, 0x00FF00, 0x0000FF, 0x123456)
    def pix(x: Int, y: Int): Int = (x + y) % 4
    val gif = {
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
      out.write("GIF87a".getBytes("US-ASCII"))
      le16(6); le16(4)
      out.write(0xF1); out.write(0); out.write(0) // 4-entry global table
      for (c <- palette) {
        out.write((c >> 16) & 0xFF); out.write((c >> 8) & 0xFF)
        out.write(c & 0xFF)
      }
      out.write(0x2C); le16(0); le16(0); le16(6); le16(4); out.write(0)
      out.write(2) // LZW min code size → clear=4, eoi=5, 3-bit codes
      val codes = (for (y <- 0 until 4; x <- 0 until 6;
        c <- Seq(4, pix(x, y))) yield c) :+ 5
      val packed = scala.collection.mutable.ArrayBuffer[Byte]()
      var acc = 0L
      var nbits = 0
      for (c <- codes) {
        acc |= c.toLong << nbits; nbits += 3
        while (nbits >= 8) { packed += (acc & 0xFF).toByte; acc >>= 8; nbits -= 8 }
      }
      if (nbits > 0) packed += (acc & 0xFF).toByte
      out.write(packed.length)
      packed.foreach(b => out.write(b & 0xFF))
      out.write(0); out.write(0x3B)
      out.toByteArray
    }
    val dg = Multimodal.MediaCodec.decodeImageIO(gif).get
    assert(dg.width == 6 && dg.height == 4)
    assert(dg.rgb.sameElements(refRgb(gif)))
    for (y <- 0 until 4; x <- 0 until 6) {
      val d = (y * 6 + x) * 3
      val c = palette(pix(x, y))
      assert((dg.rgb(d) & 0xFF) == ((c >> 16) & 0xFF) &&
        (dg.rgb(d + 1) & 0xFF) == ((c >> 8) & 0xFF) &&
        (dg.rgb(d + 2) & 0xFF) == (c & 0xFF), s"gif pixel ($x,$y)")
    }
    // grayscale PNG: decodePng refuses color type 0; ImageIO decodes it
    val gray = new BufferedImage(3, 3, BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 3; x <- 0 until 3)
      gray.getRaster.setSample(x, y, 0, x * 30 + y * 9)
    val gpng = encode(gray, "png")
    assert(Multimodal.MediaCodec.decodePng(gpng).isEmpty,
      "hand-rolled decoder should refuse grayscale PNG")
    val dgr = Multimodal.MediaCodec.decodeImageIO(gpng).get
    assert(dgr.rgb.sameElements(refRgb(gpng)))
    for (i <- 0 until 9) // gray → r==g==b after the ARGB normalization
      assert(dgr.rgb(i * 3) == dgr.rgb(i * 3 + 1) &&
        dgr.rgb(i * 3) == dgr.rgb(i * 3 + 2))
    // decodeBatch routes JPEG through real pixels, not the byte fold
    val viaBatch = Multimodal.MediaCodec.decodeBatch(Seq(jpeg), 4)(0)
    val expected = new Array[Float](4)
    for ((b, i) <- dj.rgb.zipWithIndex) expected(i % 4) += (b & 0xFF) / 255.0f
    assert(viaBatch.sameElements(expected))
    // 8-bit palette BMP: decodeBmp refuses (bpp != 24), ImageIO
    // decodes it to the exact planted gray ramp (BMP is lossless)
    val pal = new BufferedImage(5, 3, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until 3; x <- 0 until 5)
      pal.setRGB(x, y, (x * 51) * 0x010101) // gray levels exist in the
    val bmp8 = encode(pal, "bmp")           // default 256-entry palette
    assert(bmp8(0) == 'B' && bmp8(1) == 'M')
    assert(Multimodal.MediaCodec.decodeBmp(bmp8).isEmpty,
      "hand-rolled decoder should refuse palette BMP")
    val db = Multimodal.MediaCodec.decodeImageIO(bmp8).get
    assert(db.width == 5 && db.height == 3)
    assert(db.rgb.sameElements(refRgb(bmp8)))
    for (y <- 0 until 3; x <- 0 until 5) {
      val d = (y * 5 + x) * 3
      assert((db.rgb(d) & 0xFF) == x * 51 && db.rgb(d) == db.rgb(d + 1) &&
        db.rgb(d) == db.rgb(d + 2), s"bmp8 pixel ($x,$y)")
    }
    // contract: malformed bytes yield None, never a throw
    assert(Multimodal.MediaCodec.decodeImageIO(
      jpeg.take(jpeg.length / 2)).isEmpty)
    assert(Multimodal.MediaCodec.decodeImageIO("not an image!".getBytes).isEmpty)
    assert(Multimodal.MediaCodec.decodeImageIO(null).isEmpty)
  }

  test("WAV PCM payloads decode to normalized samples, not the stub fold") {
    def le32(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    def le16(v: Int) = Array[Byte]((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def pcm16Wav(samples: Seq[Int]): Array[Byte] = {
      val data = samples.flatMap(s => le16(s & 0xFFFF)).toArray
      val fmt = le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
        le16(2) ++ le16(16)
      val body = "WAVE".getBytes ++ "fmt ".getBytes ++ le32(16) ++ fmt ++
        "data".getBytes ++ le32(data.length) ++ data
      "RIFF".getBytes ++ le32(body.length) ++ body
    }
    val samples = Seq(0, 32767, -32768, 1000, -1000, 12345)
    val wav = pcm16Wav(samples)
    val out = Multimodal.MediaCodec.decodeWav(wav).get
    assert(out.length == samples.length)
    for ((s, i) <- samples.zipWithIndex)
      assert(math.abs(out(i) - (s + 32768) / 65535.0f) < 1e-7f, s"sample $i")
    // batch routing: features are the sample fold, not the byte fold
    val feats = Multimodal.MediaCodec.decodeBatch(Seq(wav), 4)(0)
    val expected = new Array[Float](4)
    for ((v, i) <- out.zipWithIndex) expected(i % 4) += v
    assert(feats.sameElements(expected))
    // contract: float PCM (format 3) refused; truncation refused
    val floatWav = wav.clone(); floatWav(20) = 3
    assert(Multimodal.MediaCodec.decodeWav(floatWav).isEmpty)
    assert(Multimodal.MediaCodec.decodeWav(wav.dropRight(3)).isEmpty)
    assert(Multimodal.MediaCodec.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.MediaCodec.decodeWav(null).isEmpty)
  }

  test("MJPEG-in-AVI video decodes real frames, not the stub fold") {
    val M = Multimodal.MediaCodec
    // flat mid-gray seed: a JPEG of a solid color round-trips ~exactly,
    // so decoded pixels can be asserted within DCT tolerance
    val avi = M.synthAviMjpeg(Array.fill(3)(128.toByte), 16, 12, 3)
    val frames = M.decodeAviMjpeg(avi).get
    assert(frames.length == 3)
    assert(frames.forall(f => f.width == 16 && f.height == 12))
    assert(frames.forall(_.rgb.forall(b => math.abs((b & 0xFF) - 128) <= 3)))
    // batch routing: provenance must be the real video decode; the
    // features must equal the per-frame pixel fold, not the byte fold
    val (feats, tag) = M.decodeBatchTagged(Seq(avi), 4)(0)
    assert(tag == "video/mjpeg")
    val expected = new Array[Float](4)
    for (f <- frames; (b, i) <- f.rgb.zipWithIndex)
      expected(i % 4) += (b & 0xFF) / 255.0f
    assert(feats.sameElements(expected))
    // varied-seed frames differ from each other (frame index is mixed
    // into the pixel synthesis) and decode deterministically
    val avi2 = M.synthAviMjpeg("graft video".getBytes("UTF-8"), 16, 12, 2)
    val f2 = M.decodeAviMjpeg(avi2).get
    assert(f2.length == 2 && !f2(0).rgb.sameElements(f2(1).rgb))
    assert(M.decodeAviMjpeg(avi2).get.head.rgb.sameElements(f2.head.rgb))
    // contract: WAV is not video, truncation refused, null refused;
    // and WAV still routes to the audio decoder (RIFF disambiguation)
    assert(M.decodeAviMjpeg("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(M.decodeAviMjpeg(avi.take(40)).isEmpty)
    assert(M.decodeAviMjpeg(null).isEmpty)
  }

  test("q54 media features decode data-derived PPM payloads, not the stub fold") {
    val dir = "/root/testdata/sf0.001"
    val df = graft.QueriesText.q54MediaFeatures(spark, dir)
    val row = df.limit(1).collect()(0)
    val id = row.getLong(0)
    // independent reference: the payload's 24 pixel bytes are the first
    // 24 UTF-8 bytes of the doc text rpad'ed/truncated to 24 chars, and
    // the feature fold is (b & 0xFF)/255 summed into dim buckets in order;
    // q54 projects the vector to (n_feat, sum, min, max) scalars so the
    // driver's pandas compare can sort its rows
    val text = graft.Tables.documents(spark, dir)
      .filter(col("doc_id") === id).select("text").first().getString(0)
    val b24 = text.padTo(24, ' ').take(24).getBytes("UTF-8").take(24)
    val expected = new Array[Float](8)
    for ((b, i) <- b24.zipWithIndex) expected(i % 8) += (b & 0xFF) / 255.0f
    def r4(d: Double) = BigDecimal(d).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getLong(1) == 8L, s"doc $id n_feat")
    assert(row.getDouble(2) ==
      r4(expected.foldLeft(0.0)((acc, x) => acc + x.toDouble)),
      s"doc $id sum_feat disagrees with the reference fold")
    assert(row.getDouble(3) == r4(expected.min.toDouble), s"doc $id min_feat")
    assert(row.getDouble(4) == r4(expected.max.toDouble), s"doc $id max_feat")
    // provenance column: the payloads are real P6 images, so the tag
    // must be the pixel decode, never the stub fold
    assert(row.getString(5) == "image/ppm", s"doc $id decoder provenance")
    assert(df.count() == graft.Tables.documents(spark, dir).count())
  }

  test("resizeMeta scales only oversized media; sampleFrames explodes video") {
    val media = Seq(
      (1L, Array[Byte](1), "image", 1000, 500, null, null, "c"),
      (2L, Array[Byte](1), "video", 64, 64, null, Integer.valueOf(2500), "c"))
      .toDF("media_id", "bytes", "kind", "width", "height", "sample_rate",
        "duration_ms", "codec")
      .select(col("media_id"), col("bytes"), struct(col("kind"),
        col("width").cast("int").as("width"),
        col("height").cast("int").as("height"),
        col("sample_rate").cast("int").as("sample_rate"),
        col("duration_ms").cast("int").as("duration_ms"),
        col("codec")).as("meta"))
    val resized = Multimodal.resizeMeta(media, 512)
    val m1 = resized.filter($"media_id" === 1).select("meta.width", "meta.height")
      .first()
    assert(m1.getInt(0) == 512 && m1.getInt(1) == 256)
    val m2 = resized.filter($"media_id" === 2).select("meta.width").first()
    assert(m2.getInt(0) == 64)
    val frames = Multimodal.sampleFrames(media, 1000)
    assert(frames.count() == 3) // 0, 1000, 2000
  }
}

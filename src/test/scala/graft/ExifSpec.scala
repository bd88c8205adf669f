package graft

import graft.multimodal.{Exif, Jpeg, Multimodal}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The EXIF (APP1/TIFF-IFD) metadata codec: both byte orders round-trip,
  * offset ASCII values resolve, the GPS sub-IFD is followed, EXIF-free
  * JPEGs surface absence (not errors), and malformed TIFF bodies throw
  * by name. */
class ExifSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val baseJpeg = Jpeg.encodeGray(Array[Byte](10, 20, 30))

  test("round trip in BOTH byte orders, offset ASCII, GPS sub-IFD") {
    for (little <- Seq(true, false)) {
      val seg = Exif.app1(little, orientation = 6, make = "CamX",
        model = "M-1", dateTime = "2026:01:02 03:04:05",
        gps = Seq((1, 52), (3, 13)))
      val e = Exif.parse(Exif.insertApp1(baseJpeg, seg))
      assert(e.byteOrder == (if (little) "II" else "MM"))
      assert(e.orientation == 6 && e.make == "CamX" && e.model == "M-1")
      assert(e.dateTime == "2026:01:02 03:04:05")
      assert(e.gpsPresent && e.nGpsTags == 2 && e.nIfd0 == 5)
    }
    // no GPS entry → pointer absent, flag false
    val noGps = Exif.parse(Exif.insertApp1(baseJpeg,
      Exif.app1(littleEndian = true, 1, "A", "B", "2026:01:01 00:00:00")))
    assert(!noGps.gpsPresent && noGps.nGpsTags == 0 && noGps.nIfd0 == 4)
    // the spliced JPEG still DECODES — EXIF is metadata, not pixels
    val tagged = Exif.insertApp1(baseJpeg,
      Exif.app1(littleEndian = false, 3, "C", "D", "2026:01:01 00:00:00"))
    assert(Jpeg.parse(tagged) == Jpeg.parse(baseJpeg))
  }

  test("absence is data: EXIF-free and APPn-bearing JPEGs parse clean") {
    val e = Exif.parse(baseJpeg) // JFIF APP0 only
    assert(e == Exif.ExifInfo("", 0, "", "", "", gpsPresent = false, 0, 0))
    // a non-EXIF APP1 (XMP-style) is skipped by length, not misparsed
    val xmp = "http://ns.adobe.com/xap/1.0/".getBytes("US-ASCII")
    val seg = Array(0xff.toByte, 0xe1.toByte,
      (((xmp.length + 2) >> 8) & 0xff).toByte,
      ((xmp.length + 2) & 0xff).toByte) ++ xmp
    assert(Exif.parse(Exif.insertApp1(baseJpeg, seg)).byteOrder == "")
  }

  test("malformed TIFF bodies fail loud by name") {
    def corrupt(f: Array[Byte] => Array[Byte]): String = {
      val seg = Exif.app1(littleEndian = true, 1, "A", "B",
        "2026:01:01 00:00:00")
      intercept[IllegalArgumentException](
        Exif.parse(Exif.insertApp1(baseJpeg, f(seg)))).getMessage
    }
    // TIFF header starts after marker(2)+len(2)+signature(6) = offset 10
    assert(corrupt { s => s.updated(10, 'X'.toByte) }
      .contains("byte-order mark"))
    assert(corrupt { s => s.updated(12, 9.toByte) }.contains("42"))
    // an ASCII value offset pointing outside the segment
    val seg = Exif.app1(littleEndian = true, 1, "A", "B",
      "2026:01:01 00:00:00")
    // Make entry value slot: tiff base(10) + ifd0(8) + count(2) + 8
    val valueSlot = 10 + 8 + 2 + 8
    val bad = seg.clone
    bad(valueSlot) = 0xf0.toByte; bad(valueSlot + 1) = 0xff.toByte
    assert(intercept[IllegalArgumentException](
      Exif.parse(Exif.insertApp1(baseJpeg, bad))).getMessage
      .contains("outside the segment"))
  }

  test("Spark plumbing: exifTagged → decodeExif matches the id recipe") {
    val docs = (0L until 20L).map(i => (i, s"payload $i")).toDF("doc_id", "text")
      .withColumn("b", encode(col("text"), "UTF-8"))
    val got = Multimodal.decodeExif(
        Multimodal.exifTagged(
          Multimodal.jpegBlob(docs, "doc_id", "b"), "doc_id", "blob"),
        "doc_id", "blob")
      .orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3),
        r.getBoolean(6), r.getInt(7)))
    val want = (0L until 20L).map { id =>
      if (id % 5 == 4) (id, "", 0, "", false, 0)
      else (id, if (id % 2 == 0) "II" else "MM", (1 + id % 8).toInt,
        s"Cam${id % 7}", id % 3 == 0, if (id % 3 == 0) 2 else 0)
    }
    assert(got.toSeq == want)
  }
}

package graft

import graft.operators.GeoMeta

/** b53 TileJSON document / b54 Horn slope-aspect. */
class GeoMetaSpec extends SparkTestBase {

  test("b53 tilejson: every document parses as JSON with the spec keys") {
    val rows = GeoMeta.qTilejson(spark, sfDir).collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val tj = r.getAs[String]("tilejson")
      // structural JSON validation via Spark's own parser
      import org.apache.spark.sql.functions._
      val parsed = spark.sql(
        s"SELECT get_json_object('${tj.replace("'", "''")}', '$$.tilejson') AS v," +
          s" get_json_object('${tj.replace("'", "''")}', '$$.maxzoom') AS z," +
          s" get_json_object('${tj.replace("'", "''")}', '$$.vector_layers[0].id') AS l0")
        .collect()(0)
      assert(parsed.getString(0) == "3.0.0")
      assert(parsed.getString(1) == r.getAs[Int]("maxzoom").toString)
      assert(parsed.getString(2) != null, s"vector_layers empty in $tj")
      // bounds render as fixed 3-decimal strings, never scientific
      assert(!tj.contains("E-") && !tj.contains("e-"))
    }
  }

  test("b53 tilejson: bounds contain center, layer count matches") {
    GeoMeta.qTilejson(spark, sfDir).collect().foreach { r =>
      val tj = r.getAs[String]("tilejson")
      val bounds = """"bounds":\[([-0-9.,]+)\]""".r
        .findFirstMatchIn(tj).get.group(1).split(",").map(_.toDouble)
      val center = """"center":\[([-0-9.,]+)\]""".r
        .findFirstMatchIn(tj).get.group(1).split(",").map(_.toDouble)
      assert(bounds(0) <= center(0) && center(0) <= bounds(2))
      assert(bounds(1) <= center(1) && center(1) <= bounds(3))
      val nLayers = """"id":""".r.findAllIn(tj).length
      assert(nLayers == r.getAs[Long]("n_layers"))
    }
  }

  test("b54 slope/aspect: exact stencil replay + classification invariants") {
    val rows = GeoMeta.qSlopeAspect(spark, sfDir).collect()
    def dem(x: Long, y: Long): Long =
      (x - 256) * (x - 256) / 32 + (y - 256) * (y - 256) / 48 + (x * 7 + y * 11) % 5
    rows.take(100).foreach { r =>
      val (x, y) = (r.getAs[Long]("x"), r.getAs[Long]("y"))
      val px8 = (dem(x + 1, y - 1) + 2 * dem(x + 1, y) + dem(x + 1, y + 1)) -
        (dem(x - 1, y - 1) + 2 * dem(x - 1, y) + dem(x - 1, y + 1))
      val py8 = (dem(x - 1, y + 1) + 2 * dem(x, y + 1) + dem(x + 1, y + 1)) -
        (dem(x - 1, y - 1) + 2 * dem(x, y - 1) + dem(x + 1, y - 1))
      assert(r.getAs[Long]("px8") == px8, s"px8 at ($x,$y)")
      assert(r.getAs[Long]("py8") == py8, s"py8 at ($x,$y)")
      assert(r.getAs[Long]("g2") == px8 * px8 + py8 * py8)
    }
    // the bowl guarantees every aspect octant and >=3 slope classes occur
    val sectors = rows.map(_.getAs[String]("aspect_sector")).toSet
    assert(Set("N", "S", "E", "W", "NE", "NW", "SE", "SW").subsetOf(sectors), s"$sectors")
    val classes = rows.map(_.getAs[String]("slope_class")).toSet
    assert(classes.size >= 3, s"$classes")
  }

  test("b61 hillshade: flat constant, toward-sun brighter than away, range bounded, scala replay") {
    val rows = GeoMeta.qHillshade(spark, sfDir).collect()
    assert(rows.nonEmpty)
    def shadeOf(px8: Long, py8: Long): Int = {
      val x = px8.toDouble / 240.0; val y = py8.toDouble / 240.0
      val c = 0.7071067811865476 * (1.0 - 0.7071067811865476 * (x + y)) /
        math.sqrt(1.0 + x * x + y * y)
      if (c <= 0.0) 0 else math.floor(1.0 + 254.0 * c).toInt
    }
    rows.foreach { r =>
      val s = r.getAs[Int]("shade")
      assert(s >= 0 && s <= 255, s"shade out of range: $s")
      assert(s == shadeOf(r.getAs[Long]("px8"), r.getAs[Long]("py8")),
        s"illumination replay diverged at event ${r.get(0)}")
      // flat terrain renders the constant 1 + floor(254·√2/2) = 180
      if (r.getAs[Long]("px8") == 0L && r.getAs[Long]("py8") == 0L)
        assert(s == 180, s"flat cell shade $s != 180")
    }
    // slopes FACING the 315° sun (px8 + py8 < 0, gradient toward NW)
    // must on average render brighter than slopes facing away
    val (toward, away) = rows.partition(r =>
      r.getAs[Long]("px8") + r.getAs[Long]("py8") < 0)
    assert(toward.nonEmpty && away.nonEmpty, "bowl must light both sides")
    val mt = toward.map(_.getAs[Int]("shade").toLong).sum.toDouble / toward.length
    val ma = away.map(_.getAs[Int]("shade").toLong).sum.toDouble / away.length
    assert(mt > ma, s"toward-sun mean $mt must exceed away mean $ma")
    // every brightness class occurs on the bowl
    assert(rows.map(_.getAs[String]("lit_class")).toSet ==
      Set("dark", "dim", "lit", "bright"))
  }

  test("b55 tile buffer: own total = features, copies bounded, corner replay") {
    val rows = GeoMeta.qTileBuffer(spark, sfDir).collect()
    val nEvents = Tables.events(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("own")).sum == nEvents)
    rows.foreach { r =>
      assert(r.getAs[Long]("render_total")
        == r.getAs[Long]("own") + r.getAs[Long]("buffered"))
    }
    val buffered = rows.map(_.getAs[Long]("buffered")).sum
    // each feature contributes <= 3 extra copies; ~4% expected at buffer 5/256
    assert(buffered > 0 && buffered <= 3 * nEvents)
    // scala replay of the membership count on every event
    val want = (0L until nEvents).map { id =>
      val lon = (id * 2654435761L % 360000L).toDouble / 1000.0 - 180.0
      val lat = (id * 1327217873L % 170000L).toDouble / 1000.0 - 85.0
      val latc = math.max(math.min(lat, 85.05112878), -85.05112878)
      val xf = (lon + 180.0) / 360.0 * 256
      val yf = (1.0 - math.log(math.tan(math.toRadians(latc))
        + 1.0 / math.cos(math.toRadians(latc))) / math.Pi) / 2.0 * 256
      val xt = math.min(math.floor(xf), 255).toInt
      val yt = math.max(math.min(math.floor(yf), 255), 0).toInt
      val fx = (xf - xt) * 256.0
      val fy = (yf - yt) * 256.0
      val nx = 1 + (if (fx < 5.0 && xt > 0) 1 else if (fx >= 251.0 && xt < 255) 1 else 0)
      val ny = 1 + (if (fy < 5.0 && yt > 0) 1 else if (fy >= 251.0 && yt < 255) 1 else 0)
      nx * ny
    }.sum
    assert(rows.map(_.getAs[Long]("render_total")).sum == want.toLong)
  }

  test("b56 tile skew plan: hotspots surface as heavy tiles with sane split factors") {
    val rows = GeoMeta.qTileSkewPlan(spark, sfDir).collect()
    // the planted 25% hotspot mass guarantees heavy tiles exist
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (cnt, med, split) = (r.getAs[Long]("cnt"), r.getAs[Long]("median"),
        r.getAs[Long]("split_factor"))
      assert(cnt > 4 * med, s"not heavy: $r")
      assert(split == (cnt + 2 * med - 1) / (2 * med))
      assert(split >= 2, s"heavy tile with trivial split: $r")
    }
    // the three hotspot regions land in distinct tiles
    assert(rows.map(r => (r.getAs[Int]("xt"), r.getAs[Int]("yt"))).distinct.length >= 3)
  }

  test("g16 exif privacy: text never carries GPS, every zone-hit drops") {
    val rows = graft.multimodal.Media.qExifPrivacy(spark, sfDir).collect()
    val byKey = rows.map(r =>
      (r.getAs[String]("mime"), r.getAs[String]("action")) -> r.getAs[Long]("n_media")).toMap
    // text/plain (when present in the corpus) never carries GPS
    assert(byKey.keys.filter(_._1 == "text/plain").map(_._2).toSet.subsetOf(Set("none")))
    // all three actions fire across the media mimes
    val actions = byKey.keys.filterNot(_._1 == "text/plain").map(_._2).toSet
    assert(actions == Set("none", "drop", "strip_gps"), actions.toString)
    assert(rows.map(_.getAs[Long]("n_media")).sum
      == Tables(spark, sfDir, "documents").count())
  }

  test("b54 slope/aspect is map-only: no join, no Generate, one exchange") {
    val df = GeoMeta.qSlopeAspect(spark, sfDir)
    val physical = df.queryExecution.executedPlan.toString()
    assert(!physical.contains("Join"), "unexpected join")
    assert(!physical.contains("Generate"), "unexpected explode")
    // the output sort's range exchange is the only one
    assert("Exchange".r.findAllIn(physical).length <= 1, physical)
  }
}

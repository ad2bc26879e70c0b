package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Geo enrichment: the reference's haversine + catalog-join stage
  * (packages/@farol/geo-enrichment/service.py and
  * city_matching/geoutils.py:33 haversine_distance_km) as pure column
  * math — codegen'd trig, no UDF.
  *
  * Cross-checked outputs round to integer meters: Java and C libm trig
  * may differ in the last ulp, which integer-meter rounding absorbs.
  */
object Geo {

  val EarthRadiusKm = 6371.0

  /** Haversine distance in km (atan2 form, matching geoutils.py:33). */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val phi1 = radians(lat1)
    val phi2 = radians(lat2)
    val dPhi = radians(lat2 - lat1)
    val dLambda = radians(lon2 - lon1)
    val sdp = sin(dPhi / 2)
    val sdl = sin(dLambda / 2)
    val a = sdp * sdp + cos(phi1) * cos(phi2) * (sdl * sdl)
    lit(2.0) * lit(EarthRadiusKm) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  def metersOf(km: Column): Column = round(km * 1000.0).cast("long")

  /** The identical formula as a DuckDB SQL fragment. */
  def haversineKmSql(lat1: String, lon1: String, lat2: String, lon2: String): String =
    s"""2.0 * 6371.0 * atan2(
       |    sqrt(sin(radians(($lat2) - ($lat1)) / 2) * sin(radians(($lat2) - ($lat1)) / 2)
       |      + cos(radians($lat1)) * cos(radians($lat2))
       |        * (sin(radians(($lon2) - ($lon1)) / 2) * sin(radians(($lon2) - ($lon1)) / 2))),
       |    sqrt(1.0 - (sin(radians(($lat2) - ($lat1)) / 2) * sin(radians(($lat2) - ($lat1)) / 2)
       |      + cos(radians($lat1)) * cos(radians($lat2))
       |        * (sin(radians(($lon2) - ($lon1)) / 2) * sin(radians(($lon2) - ($lon1)) / 2)))))""".stripMargin

  /** Deterministic synthetic coordinates from an integer key (the
    * testdata has no coordinate columns; both engines derive identical
    * doubles from exact integer arithmetic). */
  def synthLat(key: Column, mult: Long): Column =
    ((key * mult) % 170 - 85).cast("double") + lit(0.5)
  def synthLon(key: Column, mult: Long): Column =
    ((key * mult) % 360 - 180).cast("double") + lit(0.5)

  def synthLatSql(key: String, mult: Long): String =
    s"CAST((($key) * $mult) % 170 - 85 AS DOUBLE) + 0.5"
  def synthLonSql(key: String, mult: Long): String =
    s"CAST((($key) * $mult) % 360 - 180 AS DOUBLE) + 0.5"
}

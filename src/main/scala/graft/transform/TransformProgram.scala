package graft.transform

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The central design decision of the rebuild (SURVEY.md §1.1, §7.3):
  * the reference's "learned function" is a Python source string `exec`'d
  * per row (`function_generator.py:119-135`); here it is a typed, closed
  * transform DSL that COMPILES TO CATALYST COLUMN EXPRESSIONS — whole-stage
  * codegen'd, no interpreter, no trust boundary, embarrassingly parallel.
  *
  * The op set covers the reference prompts' capability envelope
  * (`promptsTemplate.py:10,38,75` — regex, dates, numbers/units, case edits,
  * dictionary lookups, similarity thresholds; SURVEY §2.7 F6). Programs are
  * data (case classes): serializable, inspectable, comparable — the engine's
  * "query IR" for synthesized row transforms.
  *
  * Every program also carries a driver-side interpreter ([[eval]]) used by
  * the validation gates on k≈3 demo rows (spinning a Spark job per candidate
  * would be pure overhead); `toColumn` and `eval` agree by construction and
  * are cross-checked in TransformSpec.
  */
sealed trait TransformProgram {
  def toColumn(in: Column): Column
  def eval(in: String): String
  def describe: String
}

object TransformProgram {

  case object Identity extends TransformProgram {
    def toColumn(in: Column): Column = in
    def eval(in: String): String = in
    def describe = "identity"
  }

  case object LowerCase extends TransformProgram {
    def toColumn(in: Column): Column = lower(in)
    def eval(in: String): String = in.toLowerCase
    def describe = "lower"
  }

  case object UpperCase extends TransformProgram {
    def toColumn(in: Column): Column = upper(in)
    def eval(in: String): String = in.toUpperCase
    def describe = "upper"
  }

  case object TitleCase extends TransformProgram {
    def toColumn(in: Column): Column = initcap(lower(in))
    // Spark initcap delimits on the SPACE character only — a tab- or
    // newline-separated "word" is NOT capitalized ("new\tyork" →
    // "New\tyork"). eval mirrors that exactly; the edge-case agreement
    // test pins it (docs say "whitespace", the implementation says ' ').
    def eval(in: String): String =
      in.toLowerCase.split(" ", -1)
        .map(w => if (w.isEmpty) w else w.substring(0, 1).toUpperCase + w.substring(1))
        .mkString(" ")
    def describe = "titlecase"
  }

  case object TrimWs extends TransformProgram {
    def toColumn(in: Column): Column = trim(in)
    def eval(in: String): String = in.trim
    def describe = "trim"
  }

  final case class Chain(steps: Seq[TransformProgram]) extends TransformProgram {
    def toColumn(in: Column): Column = steps.foldLeft(in)((c, p) => p.toColumn(c))
    def eval(in: String): String = steps.foldLeft(in)((s, p) => p.eval(s))
    def describe: String = steps.map(_.describe).mkString(" | ")
  }

  final case class ConstOutput(v: String) extends TransformProgram {
    def toColumn(in: Column): Column = lit(v)
    def eval(in: String): String = v
    def describe = s"const($v)"
  }

  /** Add a literal prefix/suffix. */
  final case class Surround(prefix: String, suffix: String) extends TransformProgram {
    def toColumn(in: Column): Column = concat(lit(prefix), in, lit(suffix))
    def eval(in: String): String = prefix + in + suffix
    def describe = s"surround('$prefix','$suffix')"
  }

  /** Strip a known prefix/suffix if present. */
  final case class StripAffix(prefix: String, suffix: String) extends TransformProgram {
    def toColumn(in: Column): Column = {
      val c1 = if (prefix.nonEmpty)
        regexp_replace(in, lit("^" + java.util.regex.Pattern.quote(prefix)), lit("")) else in
      if (suffix.nonEmpty)
        regexp_replace(c1, lit(java.util.regex.Pattern.quote(suffix) + "$"), lit(""))
      else c1
    }
    def eval(in: String): String = {
      val a = if (prefix.nonEmpty && in.startsWith(prefix)) in.substring(prefix.length) else in
      if (suffix.nonEmpty && a.endsWith(suffix)) a.substring(0, a.length - suffix.length) else a
    }
    def describe = s"strip('$prefix','$suffix')"
  }

  /** Java-regex replace-all. */
  final case class RegexReplace(pattern: String, replacement: String)
      extends TransformProgram {
    def toColumn(in: Column): Column =
      regexp_replace(in, lit(pattern), lit(replacement))
    def eval(in: String): String = in.replaceAll(pattern, replacement)
    def describe = s"regex_replace(/$pattern/ -> '$replacement')"
  }

  /** Extract the first match group of a Java regex ("" when no match —
    * matches Spark regexp_extract semantics).
    */
  final case class RegexExtract(pattern: String, group: Int = 1)
      extends TransformProgram {
    def toColumn(in: Column): Column = regexp_extract(in, pattern, group)
    def eval(in: String): String = {
      val m = java.util.regex.Pattern.compile(pattern).matcher(in)
      if (m.find()) Option(m.group(group)).getOrElse("") else ""
    }
    def describe = s"regex_extract(/$pattern/ g$group)"
  }

  /** Split on a literal separator, take 0-based token idx (negative = from
    * end, Python-style). Empty string when out of range.
    */
  final case class SplitIndex(sep: String, idx: Int) extends TransformProgram {
    def toColumn(in: Column): Column = {
      val parts = split(in, java.util.regex.Pattern.quote(sep))
      val pos = if (idx >= 0) lit(idx + 1) else size(parts) + lit(idx + 1)
      // pos >= 1 guard: element_at(…, 0) is an unconditional error even in
      // try_ form, and a NEGATIVE computed pos (deep negative idx on a short
      // row) would wrap around and read from the END — both must yield ""
      // exactly like eval(). try_element_at past the length → null → "".
      val posOk = when(pos >= 1, pos.cast("int"))
      coalesce(try_element_at(parts, posOk), lit(""))
    }
    def eval(in: String): String = {
      val parts = in.split(java.util.regex.Pattern.quote(sep), -1)
      val i = if (idx >= 0) idx else parts.length + idx
      if (i >= 0 && i < parts.length) parts(i) else ""
    }
    def describe = s"split('$sep')[$idx]"
  }

  /** Date reformat via java.time patterns (Spark session TZ = UTC). */
  final case class DateReformat(inFmt: String, outFmt: String)
      extends TransformProgram {
    def toColumn(in: Column): Column =
      // try_to_timestamp: unparseable rows become null (→ the F2 sentinel)
      // instead of an ANSI runtime error that would kill the whole job.
      date_format(try_to_timestamp(in, lit(inFmt)), outFmt)
    def eval(in: String): String = {
      import java.time._
      import java.time.format.DateTimeFormatter
      // Locale.US pins month/day names: Spark's try_to_timestamp /
      // date_format always format with the US locale, so a default-locale
      // formatter would make validation disagree with distributed apply on
      // any non-English JVM
      val f = DateTimeFormatter.ofPattern(inFmt, java.util.Locale.US)
      val o = DateTimeFormatter.ofPattern(outFmt, java.util.Locale.US)
      val parsed = f.parseBest(in, LocalDateTime.from(_), LocalDate.from(_))
      val ldt = parsed match {
        case d: LocalDate => d.atStartOfDay()
        case dt: LocalDateTime => dt
      }
      o.format(ldt)
    }
    def describe = s"date('$inFmt' -> '$outFmt')"
  }

  /** Scale the first number in the string by `factor`, rounded to
    * `decimals` (unit conversion: km→mi, kg→lb, °C→°F needs offset too —
    * see [[AffineNumber]]).
    */
  final case class AffineNumber(factor: Double, offset: Double, decimals: Int,
      trimZeros: Boolean = false) extends TransformProgram {
    private val numRe = "[-+]?[0-9]*\\.?[0-9]+"
    def toColumn(in: Column): Column = {
      val s = regexp_extract(in, numRe, 0)
      val n = when(length(s) > 0, s.cast("double"))   // "" would ANSI-error
      val bd = round(n * factor + offset, decimals)
      val str =
        if (decimals == 0) bd.cast("long").cast("string") else bd.cast("string")
      val trimmed =
        if (trimZeros && decimals > 0)
          regexp_replace(regexp_replace(str, lit("(\\.[0-9]*?)0+$"), lit("$1")),
            lit("\\.$"), lit(""))
        else str
      // numberless input: eval() returns "" — null here would surface as
      // the "Not excutable" sentinel after applyProgram's coalesce instead
      coalesce(trimmed, lit(""))
    }
    def eval(in: String): String = {
      val m = java.util.regex.Pattern.compile(numRe).matcher(in)
      if (!m.find()) "" else {
        val v = m.group(0).toDouble * factor + offset
        val r = BigDecimal(v).setScale(decimals, BigDecimal.RoundingMode.HALF_UP)
        if (decimals == 0) r.toLong.toString
        else if (trimZeros) r.bigDecimal.stripTrailingZeros.toPlainString
        else r.toString
      }
    }
    def describe = s"affine(*$factor+$offset, $decimals dp)"
  }

  /** Broadcast dictionary lookup (the reference's example-derived mappings:
    * currency tables, spelling fixes, code→name maps). Compiles to a
    * chained CASE WHEN for small dicts (codegen'd); larger dicts should go
    * through a broadcast join instead (see Wrangler.imputeByDict).
    */
  final case class DictLookup(map: Map[String, String], default: Option[String])
      extends TransformProgram {
    def toColumn(in: Column): Column = {
      val base: Column = default.map(lit(_): Column).getOrElse(lit(null).cast("string"))
      map.foldLeft(base) { case (acc, (k, v)) => when(in === k, lit(v)).otherwise(acc) }
    }
    def eval(in: String): String =
      map.getOrElse(in, default.getOrElse(null))
    def describe = s"dict(${map.size} entries)"
  }

  /** Roman numeral → integer, as a pure expression: additive value minus
    * twice the subtractive positions (classic trick: translate each letter
    * to its value, subtract 2× where a smaller value precedes a larger).
    * Covers well-formed numerals (the prompt envelope's `roman` lib).
    */
  case object RomanToInt extends TransformProgram {
    private val vals = Seq("M" -> 1000, "D" -> 500, "C" -> 100, "L" -> 50,
      "X" -> 10, "V" -> 5, "I" -> 1)
    private val subs = Seq("CM" -> 100, "CD" -> 100, "XC" -> 10, "XL" -> 10,
      "IX" -> 1, "IV" -> 1)
    def toColumn(in: Column): Column = {
      val u = upper(in)
      val additive = vals.map { case (l, v) =>
        (length(u) - length(regexp_replace(u, lit(l), lit("")))) * v
      }.reduce(_ + _)
      val subtractive = subs.map { case (p, v) =>
        when(u.contains(p), v * 2).otherwise(0)
      }.reduce(_ + _)
      (additive - subtractive).cast("string")
    }
    def eval(in: String): String = {
      val u = in.toUpperCase
      val add = vals.map { case (l, v) => u.count(_ == l.head) * v }.sum
      val sub = subs.map { case (p, v) => if (u.contains(p)) v * 2 else 0 }.sum
      (add - sub).toString
    }
    def describe = "roman_to_int"
  }

  /** Decimal degrees → DMS string (`41.3811` → `41°22'52.0"`), the
    * coordinate-format family the reference prompts authorize via
    * pyproj/geopy (`promptsTemplate.py:10-12`; F6 envelope edge). The
    * seconds component is rounded to `decimals` (HALF_UP, the AffineNumber
    * convention). No minute/degree carry at the 60-boundary after rounding:
    * both evaluators apply the identical formula, and a carry rule would
    * only re-shape the same information. Negative degrees keep a leading
    * "-" on the degree part; numberless input yields "".
    */
  final case class DegToDms(decimals: Int = 1) extends TransformProgram {
    private val numRe = "[-+]?[0-9]*\\.?[0-9]+"
    def toColumn(in: Column): Column = {
      val sC = regexp_extract(in, numRe, 0)
      val v = when(length(sC) > 0, sC.cast("double"))
      val a = abs(v)
      val d = floor(a)
      val mr = (a - d) * 60.0
      val m = floor(mr)
      val sec = round((mr - m) * 60.0, decimals)
      val out = concat(
        when(v < 0, "-").otherwise(""),
        d.cast("long").cast("string"), lit("°"),
        m.cast("long").cast("string"), lit("'"),
        sec.cast("string"), lit("\""))
      coalesce(out, lit(""))
    }
    def eval(in: String): String = {
      val mch = java.util.regex.Pattern.compile(numRe).matcher(in)
      if (!mch.find()) "" else {
        val v = mch.group(0).toDouble
        val a = math.abs(v)
        val d = math.floor(a)
        val mr = (a - d) * 60.0
        val m = math.floor(mr)
        val sec = java.math.BigDecimal.valueOf((mr - m) * 60.0)
          .setScale(decimals, java.math.RoundingMode.HALF_UP).doubleValue()
        val sign = if (v < 0) "-" else ""
        s"$sign${d.toLong}°${m.toLong}'${sec.toString}\""
      }
    }
    def describe = s"deg_to_dms($decimals dp)"
  }

  /** DMS string → decimal degrees (`41°22'52.0"` → `41.381111`), rounded to
    * `decimals`. Sign comes from a leading "-" or a trailing S/W hemisphere
    * letter; unparsable input yields "".
    */
  final case class DmsToDeg(decimals: Int = 6) extends TransformProgram {
    private val re =
      "([-+]?)([0-9]+)\\u00b0([0-9]+)'([0-9]*\\.?[0-9]+)\"?\\s*([NSEWnsew]?)"
    def toColumn(in: Column): Column = {
      val dS = regexp_extract(in, re, 2)
      val v = when(length(dS) > 0,
        dS.cast("double") +
          regexp_extract(in, re, 3).cast("double") / 60.0 +
          regexp_extract(in, re, 4).cast("double") / 3600.0)
      val neg = regexp_extract(in, re, 1) === "-" ||
        upper(regexp_extract(in, re, 5)).isin("S", "W")
      val signed = when(neg, -v).otherwise(v)
      coalesce(round(signed, decimals).cast("string"), lit(""))
    }
    def eval(in: String): String = {
      val m = java.util.regex.Pattern.compile(re).matcher(in)
      if (!m.find()) "" else {
        val v = m.group(2).toDouble + m.group(3).toDouble / 60.0 +
          m.group(4).toDouble / 3600.0
        val neg = m.group(1) == "-" ||
          Seq("S", "W").contains(m.group(5).toUpperCase)
        val signed = if (neg) -v else v
        java.math.BigDecimal.valueOf(signed)
          .setScale(decimals, java.math.RoundingMode.HALF_UP)
          .doubleValue().toString
      }
    }
    def describe = s"dms_to_deg($decimals dp)"
  }

  /** Coordinate-pair string → great-circle distance in km
    * (`"41.38,2.17 -> 48.85,2.35"` → `831.576`): haversine on the IUGG
    * mean earth radius 6371.0088 km, rounded to `decimals` — the
    * geodesic-distance capability the reference prompts authorize via
    * geopy (`promptsTemplate.py:10-12`; F6 envelope). Both evaluators run
    * the IDENTICAL double formula in the same operation order (sin/cos/
    * asin delegate to the platform libm in Spark and DuckDB alike; the
    * rounded output is the cross-engine determinism guard, the same
    * contract every ln/exp-based query in the repo relies on). Input not
    * matching the pair pattern → "".
    */
  final case class HaversineKm(decimals: Int = 3) extends TransformProgram {
    private val num = "(-?[0-9]+\\.?[0-9]*)"
    private val re = s"$num\\s*,\\s*$num\\s*->\\s*$num\\s*,\\s*$num"
    def toColumn(in: Column): Column = {
      def g(i: Int) = regexp_extract(in, re, i)
      def rad(c: Column) = c.cast("double") * math.Pi / lit(180.0)
      val (la1, lo1) = (rad(g(1)), rad(g(2)))
      val (la2, lo2) = (rad(g(3)), rad(g(4)))
      val h = pow(sin((la2 - la1) / 2), 2) +
        cos(la1) * cos(la2) * pow(sin((lo2 - lo1) / 2), 2)
      // clamp h to [0,1]: FP rounding can push near-antipodal pairs a hair
      // above 1, where sqrt > 1 makes asin NaN (mirrored in eval + oracle)
      val km = asin(sqrt(least(lit(1.0), h))) * lit(12742.0176) // 2R, R = 6371.0088
      coalesce(when(length(g(1)) > 0,
        round(km, decimals).cast("string")), lit(""))
    }
    def eval(in: String): String = {
      val m = java.util.regex.Pattern.compile(re).matcher(in)
      if (!m.find()) "" else {
        def rad(s: String) = s.toDouble * math.Pi / 180.0
        val (la1, lo1, la2, lo2) =
          (rad(m.group(1)), rad(m.group(2)), rad(m.group(3)), rad(m.group(4)))
        val h = math.pow(math.sin((la2 - la1) / 2), 2) +
          math.cos(la1) * math.cos(la2) *
            math.pow(math.sin((lo2 - lo1) / 2), 2)
        // same clamp as toColumn: h slightly above 1 would make asin NaN
        // and BigDecimal.valueOf(NaN) throw where the column path emits a
        // string — clamping keeps both paths identical
        val km = math.asin(math.sqrt(math.min(1.0, h))) * 12742.0176
        java.math.BigDecimal.valueOf(km)
          .setScale(decimals, java.math.RoundingMode.HALF_UP)
          .doubleValue().toString
      }
    }
    def describe = s"haversine_km($decimals dp)"
  }

  /** Fixed-offset timezone shift + reformat (`2024-03-01 10:30:00` with
    * +330 → `01/03/2024 16:00` in the out format): parse with `inFmt`, add
    * `offsetMinutes`, render with `outFmt` — the fixed-zone datetime
    * conversion of the prompt envelope's calendar family (ummalqura-style
    * full calendar conversion stays out of DSL v1; a fixed-zone shift is
    * the deterministic core both engines replay). Unparsable rows → null →
    * the F2 sentinel, like [[DateReformat]].
    */
  final case class FixedZoneShift(inFmt: String, outFmt: String,
      offsetMinutes: Int) extends TransformProgram {
    def toColumn(in: Column): Column =
      date_format(
        try_to_timestamp(in, lit(inFmt)) +
          expr(s"INTERVAL '$offsetMinutes' MINUTE"),
        outFmt)
    def eval(in: String): String = {
      import java.time._
      import java.time.format.DateTimeFormatter
      val f = DateTimeFormatter.ofPattern(inFmt, java.util.Locale.US)
      val o = DateTimeFormatter.ofPattern(outFmt, java.util.Locale.US)
      val parsed = f.parseBest(in, LocalDateTime.from(_), LocalDate.from(_))
      val ldt = parsed match {
        case d: LocalDate => d.atStartOfDay()
        case dt: LocalDateTime => dt
      }
      o.format(ldt.plusMinutes(offsetMinutes.toLong))
    }
    def describe = s"tz_shift('$inFmt' -> '$outFmt', $offsetMinutes min)"
  }

  /** Gregorian → tabular Islamic (Hijri) date — the arithmetic "civil"
    * calendar (30-year intercalation cycle, Kuwaiti-algorithm integer form),
    * the deterministic core of the prompt envelope's ummalqura family
    * (`promptsTemplate.py:10-12`). The observational Umm al-Qura calendar
    * differs by ±1 day in some months (it is table-based by definition);
    * the tabular calendar is THE standard arithmetic approximation and is
    * exactly replayable in any engine: every step is integer arithmetic on
    * non-negative values (guarded to dates at/after the epoch), so
    * truncating and flooring division agree everywhere. Output
    * `yyyy-MM-dd` (zero-padded); unparseable or pre-epoch input → "".
    */
  final case class GregorianToHijri(inFmt: String = "yyyy-MM-dd")
      extends TransformProgram {
    def toColumn(in: Column): Column =
      // One codegen'd kernel call per row ([[GregorianToHijriExpr]]): the
      // composed-Column form of this arithmetic duplicated every val
      // reference into the tree (l1/j/l2 each referenced 2-4× downstream),
      // compounding to dozens of timestamp parses per row.
      coalesce(
        HijriExprs.gregorianToHijri(
          try_to_timestamp(in, lit(inFmt)).cast("date")),
        lit(""))
    def eval(in: String): String = {
      import java.time.format.DateTimeFormatter
      try {
        val f = DateTimeFormatter.ofPattern(inFmt, java.util.Locale.US)
        val parsed = f.parseBest(in,
          java.time.LocalDateTime.from(_), java.time.LocalDate.from(_))
        val ld = parsed match {
          case d: java.time.LocalDate => d
          case dt: java.time.LocalDateTime => dt.toLocalDate
        }
        val (y, m, d) =
          (ld.getYear.toLong, ld.getMonthValue.toLong, ld.getDayOfMonth.toLong)
        def idiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
        val a = idiv(14L - m, 12L)
        val y2 = y + 4800L - a
        val m2 = m + a * 12L - 3L
        val jdn = d + idiv(m2 * 153L + 2L, 5L) + y2 * 365L + idiv(y2, 4L) -
          idiv(y2, 100L) + idiv(y2, 400L) - 32045L
        if (jdn < 1948440L) return ""
        val l0 = jdn - 1948440L + 10632L
        val n = idiv(l0 - 1L, 10631L)
        val l1 = l0 - n * 10631L + 354L
        val j = idiv(10985L - l1, 5316L) * idiv(l1 * 50L, 17719L) +
          idiv(l1, 5670L) * idiv(l1 * 43L, 15238L)
        val l2 = l1 - idiv(30L - j, 15L) * idiv(j * 17719L, 50L) -
          idiv(j, 16L) * idiv(j * 15238L, 43L) + 29L
        val hm = idiv(l2 * 24L, 709L)
        val hd = l2 - idiv(hm * 709L, 24L)
        val hy = n * 30L + j - 30L
        f"$hy%04d-$hm%02d-$hd%02d"
      } catch { case _: Throwable => "" }
    }
    def describe = s"gregorian_to_hijri('$inFmt')"
  }

  /** Tier-2 escape hatch (SURVEY §2.8 mapping policy): a transform OUTSIDE
    * the closed node set runs as an opaque Scala closure behind a ScalaUDF.
    * The reference can exec ANY generated function
    * (`function_generator.py:119-135`); this node is the engine-native
    * equivalent for programs the 17-node DSL cannot express. Deliberately
    * tier 2: a UDF is a black box to Catalyst (no codegen, no pushdown
    * through it), so the synthesizer prefers DSL nodes and reaches for this
    * only when composition fails.
    *
    * Failure semantics match the reference's per-row try/except
    * (`function_generator.py:143-147`): any throw — and a null input — maps
    * to null, which [[graft.tasks.Wrangler.applyProgram]] surfaces as the
    * "Not excutable" sentinel. The closure must be pure and serializable
    * (it ships to executors).
    */
  final case class OpaqueFn(name: String, fn: String => String)
      extends TransformProgram {
    def toColumn(in: Column): Column = {
      val safe = udf { (s: String) =>
        if (s == null) null
        else scala.util.Try(fn(s)).toOption.orNull
      }
      safe(in)
    }
    def eval(in: String): String =
      if (in == null) null else scala.util.Try(fn(in)).toOption.orNull
    def describe = s"opaque($name)"
  }

  /** The reference's dummy fallback function
    * (`run_wrangler.py:42`: `def string_transformation(...): return None`).
    */
  case object NullProgram extends TransformProgram {
    def toColumn(in: Column): Column = lit(null).cast("string")
    def eval(in: String): String = null
    def describe = "null"
  }
}

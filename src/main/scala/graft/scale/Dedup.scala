package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for training-data pipelines: exact, MinHash+LSH,
  * SimHash, n-gram Jaccard (embedding near-dup lives in Similarity.scala).
  *
  * Scale design: everything is expressed as explode→hash→groupBy/join plans
  * that shuffle on bounded keys (doc_id, band, shingle). Hashes are md5
  * strings so the sf0.01 DuckDB oracle can replay them exactly; at 100 TB
  * you would swap md5 for xxhash64 behind the same API (one-line change,
  * noted per function) — semantics identical, ~6× cheaper.
  */
object Dedup {

  /** Exact dedup: canonical representative (min key) per identical value of
    * `dupCols`. Single hash-aggregate shuffle on the dup key — the 100 TB
    * plan you want (map-side partial min, no sort).
    *
    * The shuffle key is `md5(to_json(struct(dupCols)))` — a 32-byte
    * fingerprint — so the exchange never carries full document bytes
    * (grouping by the raw text column would shuffle whole documents at
    * 100 TB). md5 group identity equals value identity for dedup purposes.
    */
  def exact(df: DataFrame, dupCols: Seq[String], keyCol: String): DataFrame =
    df.groupBy(md5(to_json(struct(dupCols.map(col): _*))).as("dup_key"))
      .agg(min(col(keyCol)).as(keyCol), count(lit(1)).as("n_dups"))

  /** Query parameters stripped by [[canonicalizeUrl]]: the `utm_*`
    * campaign-tagging prefix plus the common click-identifier keys — the
    * parameters ad/analytics stacks append that never change the fetched
    * resource. Declared and fixed so the canonical key is reproducible.
    */
  val TrackingParamPrefixes: Seq[String] = Seq("utm_")
  val TrackingParamKeys: Seq[String] =
    Seq("gclid", "fbclid", "msclkid", "ref")

  /** URL canonicalization — the key a crawl pipeline dedups on BEFORE any
    * content dedup (the same page is fetched under case-shuffled hosts,
    * default ports, tracking params, and fragment anchors; URL-level
    * dedup removes those refetches for the price of one hash-agg, orders
    * of magnitude cheaper than content shingling). Declared rules, all
    * pure codegen-friendly expressions:
    *   1. trim surrounding whitespace;
    *   2. drop the `#fragment` (never sent to the server);
    *   3. lowercase the scheme and authority (host) — the PATH stays
    *      case-sensitive per RFC 3986;
    *   4. strip the scheme-default port (`:80` for http, `:443` for
    *      https; explicit non-default ports survive);
    *   5. drop the tracking query parameters (remaining params keep
    *      their order — reordering would conflate genuinely different
    *      cache keys);
    *   6. strip ONE trailing slash from the path (`/a/` ≡ `/a`, and the
    *      bare root `/` collapses into the authority).
    * A string with no `scheme://authority` head is returned trimmed but
    * otherwise untouched (not a URL — nothing safe to rewrite).
    *
    * The stripped key set is a PARAMETER (defaults: [[TrackingParamPrefixes]]
    * / [[TrackingParamKeys]]) because it is a policy, not a fact: the
    * default list includes the generic `ref`, which on some hosts is
    * functional (`?ref=branch` on code forges selects a different page) —
    * a caller crawling such a site passes a narrower key list (e.g. only
    * the unambiguous click IDs gclid/fbclid/msclkid) and keeps those pages
    * distinct.
    */
  def canonicalizeUrl(
      url: Column,
      trackingPrefixes: Seq[String] = TrackingParamPrefixes,
      trackingKeys: Seq[String] = TrackingParamKeys): Column = {
    val t = trim(url)
    val noFrag = regexp_replace(t, "#.*$", "")
    val auth =
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    val rest = noFrag.substr(length(auth) + lit(1), length(noFrag))
    val authCanon = regexp_replace(
      regexp_replace(lower(auth), "^(https://[^:/?#]*):443$", "$1"),
      "^(http://[^:/?#]*):80$", "$1")
    val path = regexp_replace(rest, "\\?.*$", "")
    val query = when(rest.contains("?"),
      regexp_replace(rest, "^[^?]*\\?", "")).otherwise(lit(""))
    val isTracking = (p: Column) =>
      (trackingPrefixes.map(px => startswith(p, lit(px))) ++
        trackingKeys.map(k =>
          p === lit(k) || startswith(p, lit(k + "=")))) match {
        case Nil => lit(false)
        case cs => cs.reduce(_ || _)
      }
    val kept = filter(split(query, "&"),
      p => length(p) > 0 && !isTracking(p))
    val q2 = array_join(kept, "&")
    val path2 = regexp_replace(path, "/$", "")
    when(length(auth) > 0,
      concat(authCanon, path2,
        when(length(q2) > 0, concat(lit("?"), q2)).otherwise(lit(""))))
      .otherwise(t)
  }

  /** URL-level exact dedup: [[canonicalizeUrl]] then one hash-aggregate
    * on the canonical key — min id as the representative, refetch count
    * per page. The cheapest dedup pass in the pipeline (no shingles, no
    * pair mass) and the one a crawl corpus runs FIRST; content dedup
    * ([[minhashLsh]] etc.) then works on an already-URL-unique corpus.
    */
  def urlDedup(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      trackingPrefixes: Seq[String] = TrackingParamPrefixes,
      trackingKeys: Seq[String] = TrackingParamKeys): DataFrame =
    df.select(col(idCol),
        canonicalizeUrl(col(urlCol), trackingPrefixes, trackingKeys)
          .as("canonical_url"))
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("n_dups"))

  /** Declared public-suffix subset for [[registrableDomain]] — a FIXED,
    * oracle-reproducible slice of the Mozilla Public Suffix List: the
    * common two-label ccTLD registries (the co.uk family), the PSL
    * "private" registry suffixes under which every user site is its own
    * registrable domain (github.io et al.), and the high-traffic
    * one-label TLDs. Deliberately a parameter with a declared default
    * (the TrackingParamKeys discipline): the real PSL changes monthly,
    * so a production deployment passes its own pinned snapshot; the
    * LOGIC (longest-suffix match, eq-is-suffix gate, wildcard fallback)
    * is what this engine owns.
    */
  val PublicSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
    "github.io", "gitlab.io", "blogspot.com",
    "com", "net", "org", "io", "co", "ai", "dev", "app", "edu", "gov",
    "mil", "int", "info", "biz",
    "uk", "de", "fr", "jp", "cn", "ru", "br", "in", "au")

  /** Registrable domain (eTLD+1) of a URL — the unit crawl pipelines
    * budget, cap, and report by (a per-HOST panel splits one site into
    * thousands of subdomain rows; a per-TLD panel collapses the whole
    * web into ~40). Pure codegen-friendly string algebra:
    *   1. host = lowercased authority, userinfo and port stripped;
    *   2. IPv4 literal hosts are their own "domain" (no label algebra
    *      applies);
    *   3. longest declared suffix match (suffixes ordered by label
    *      count, then length — `.co.uk` beats `.uk`, `.github.io`
    *      beats `.io`): eTLD+1 = the label before the suffix + the
    *      suffix;
    *   4. a host EQUAL to a public suffix has no registrable domain →
    *      NULL (you cannot register `co.uk`);
    *   5. no suffix matches → the PSL `*` wildcard rule: the last label
    *      is treated as the suffix, so eTLD+1 = the last two labels;
    *   6. non-URLs, single-label hosts (`localhost`) and empty
    *      authorities → NULL.
    * The per-row cost is a CASE ladder of cheap `endswith` probes — only
    * the ONE matched branch runs its regex extract.
    */
  def registrableDomain(
      url: Column,
      suffixes: Seq[String] = PublicSuffixes): Column = {
    require(suffixes.nonEmpty && suffixes.forall(s =>
      s.nonEmpty && !s.startsWith(".") && !s.endsWith(".") &&
        s.toLowerCase == s),
      s"bad suffix list $suffixes")
    val auth = lower(regexp_extract(trim(url),
      "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = regexp_replace(regexp_replace(auth, "^.*@", ""),
      ":[0-9]*$", "")
    val ordered = suffixes.distinct
      .sortBy(s => (-s.count(_ == '.'), -s.length, s))
    val fallback = when(host.rlike("[^.]\\.[^.]+$"),
      regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
    val ladder = ordered.foldRight(fallback) { (sfx, acc) =>
      val esc = sfx.replace(".", "\\.")
      when(host === lit(sfx), lit(null).cast("string"))
        .when(endswith(host, lit("." + sfx)),
          regexp_extract(host, "([^.]+\\." + esc + ")$", 1))
        .otherwise(acc)
    }
    val d = when(length(host) === 0, lit(null).cast("string"))
      .when(host.rlike("^[0-9]+(\\.[0-9]+){3}$"), host)
      .otherwise(ladder)
    nullif(d, lit(""))
  }

  /** Per-domain crawl-health panel — the first readout anyone asks of a
    * crawl corpus: for each registrable domain, document count, distinct
    * canonical pages, content mass, and the URL-level dup (refetch)
    * share. [[canonicalizeUrl]] → [[registrableDomain]] → ONE
    * hash-aggregate on the domain key; the distinct-page count runs on
    * the md5 of the canonical URL so the partial-agg state never carries
    * full URL bytes (the exact-dedup fingerprint discipline). This is
    * the table a domain-cap sampler ([[graft.sample.Samplers]]) and a
    * crawl-budget allocator read.
    */
  def domainStats(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      massCol: String,
      suffixes: Seq[String] = PublicSuffixes): DataFrame =
    df.select(col(idCol),
        canonicalizeUrl(col(urlCol)).as("__cu"),
        col(massCol).cast("long").as("__m"))
      .withColumn("domain", registrableDomain(col("__cu"), suffixes))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(md5(col("__cu"))).as("n_pages"),
        sum(col("__m")).as("mass"))
      .withColumn("dup_share", round(lit(1.0) -
        col("n_pages").cast("double") / col("n_docs").cast("double"), 6))

  /** MinHash signature per (doc, hash seed): min over shingles of
    * md5(seed || ":" || shingle). Lexicographic min over hex strings is a
    * valid min-wise hash family here (fixed-width hex).
    *
    * Implementation note: explode distinct shingles, project `numHashes` md5
    * columns (whole-stage codegen'd), then ONE hash-aggregate with
    * `numHashes` mins — map-side partial min makes the shuffle carry only
    * one 8-hash row per (partition, doc). A previous higher-order-function
    * formulation (transform/array_min lambdas) evaluated interpreted and was
    * ~50× slower at sf0.1.
    */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      shingleSize: Int = 3): DataFrame = {
    // spread the shingle+digest job across cores (single-row-group
    // corpus => 1-task scan otherwise; Tables.spread rationale)
    val sh = graft.io.Tables.spread(df).select(col(idCol),
      explode(Shingles.wordShingles(col(textCol), shingleSize)).as("sh"))
    val mins = (0 until numHashes).map { s =>
      min(md5(concat(lit(s.toString), lit(":"), col("sh")).cast("binary")))
        .as(s"h$s")
    }
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
      .select(col(idCol),
        array((0 until numHashes).map(s => col(s"h$s")): _*).as("minhash"))
  }

  /** LSH banding: group the `numHashes` minhashes into bands of
    * `rowsPerBand`; band key = concat of the band's minhashes. Docs sharing
    * any band key are candidate near-duplicates.
    */
  def lshBands(
      signatures: DataFrame,
      idCol: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 2): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bands = transform(sequence(lit(0), lit(numBands - 1)),
      b => struct(b.as("band"),
        array_join(slice(col("minhash"), b * rowsPerBand + 1, lit(rowsPerBand)), "")
          .as("band_key")))
    signatures.select(col(idCol), explode(bands).as("bk"))
      .select(col(idCol), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Candidate pairs from LSH buckets (a.id < b.id, distinct). The self-join
    * shuffles on (band, band_key) — bucket sizes are tiny for a healthy hash
    * family, so no skew; a skewed bucket means true mass-duplication and is
    * exactly the data you want co-located anyway.
    */
  def lshCandidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val l = bands.select(col("band"), col("band_key"), col(idCol).as("id_a"))
    val r = bands.select(col("band"), col("band_key"), col(idCol).as("id_b"))
    l.join(r, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Full MinHash+LSH near-dup pipeline → distinct candidate pairs. */
  def minhashLsh(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame =
    lshCandidatePairs(
      lshBands(minhashSignatures(df, idCol, textCol, numHashes, shingleSize),
        idCol, numHashes, rowsPerBand),
      idCol)

  /** One-permutation hashing (OPH) signatures (Li, Owen & Zhang, NIPS '12):
    * ONE hash per shingle instead of `numHashes` — the hash space is split
    * into `numBuckets` bins (bin = leading md5 bits mod buckets) and the
    * signature component for a bin is the min hash landing in it. At corpus
    * scale this is the difference between 1 and k digest evaluations per
    * shingle-occurrence — the dominant cost of the classic family — while
    * the per-bin minima remain min-wise estimates of the same Jaccard.
    *
    * Sparse representation: one row per NON-EMPTY (doc, bucket); an empty
    * bin simply has no row, and [[ophBands]] folds the absence into the
    * band key (two docs agree on a band iff they have the same non-empty
    * bins AND the same minima in them — the natural set-equality semantics
    * of banding without a densification rotation; empty bins are rare for
    * documents with ≥ a few dozen shingles since P(empty) = (1-1/k)^|S|).
    *
    * Plan shape: one explode + one md5 projection + ONE hash-aggregate
    * (map-side partial mins), shuffle keyed on the doc id.
    */
  def ophSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int = 16,
      shingleSize: Int = 3): DataFrame =
    // the "one" in one-permutation, literally: a single digest per shingle
    // feeds BOTH the bin assignment (leading 24 bits) and the min value
    graft.io.Tables.spread(df).select(col(idCol),
        explode(Shingles.wordShingles(col(textCol), shingleSize)).as("sh"))
      .withColumn("__h", md5(col("sh").cast("binary")))
      .withColumn("bucket",
        conv(substring(col("__h"), 1, 6), 16, 10).cast("long") % numBuckets)
      .groupBy(col(idCol), col("bucket"))
      .agg(min(col("__h")).as("mh"))

  /** Band keys over sparse OPH signatures: band = bucket div rowsPerBand;
    * the key encodes the band's (bucket, min) pairs in bucket order, so
    * docs collide iff they agree on every non-empty bin of the band.
    * Compatible with [[lshCandidatePairs]] (same (band, band_key) shape).
    */
  def ophBands(
      signatures: DataFrame,
      idCol: String,
      rowsPerBand: Int = 4): DataFrame = {
    // bucket mod rowsPerBand is UNIQUE within a (doc, band), so the band
    // key assembles from one conditional min per slot — plain codegen'd
    // aggregates (concat_ws skips null slots = absent bins). The obvious
    // sort_array(collect_list(...))+transform formulation is an
    // interpreted-lambda per group — the same ~50× HOF penalty the
    // minhash-signature note documents; measured 11.4 s → 2.9 s at sf0.1.
    val slots = (0 until rowsPerBand).map { j =>
      min(when(col("bucket") % rowsPerBand === j,
        concat(col("bucket"), lit(":"), col("mh")))).as(s"__s$j")
    }
    signatures
      .withColumn("band", expr(s"bucket div $rowsPerBand"))
      .groupBy(col(idCol), col("band"))
      .agg(slots.head, slots.tail: _*)
      .select(col(idCol), col("band"),
        concat_ws("|", (0 until rowsPerBand).map(j => col(s"__s$j")): _*)
          .as("band_key"))
  }

  /** OPH + LSH near-dup pairs, exact-verified: candidates from banded
    * one-permutation signatures, then the exact distinct-shingle Jaccard
    * computed ONLY over the candidate pairs (join the pair list back to the
    * shingle table — intersection mass is bounded by candidates × doc size,
    * never corpus²). Emits pairs with exact jaccard ≥ `threshold`.
    */
  def ophMinhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numBuckets: Int = 16,
      rowsPerBand: Int = 4,
      shingleSize: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    val cand = lshCandidatePairs(
      ophBands(ophSignatures(df, idCol, textCol, numBuckets, shingleSize),
        idCol, rowsPerBand),
      idCol)
    val sh = graft.io.Tables.spread(df).select(col(idCol),
      explode(Shingles.wordShingles(col(textCol), shingleSize)).as("sh"))
    val sizes = sh.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val common = cand
      .join(sh.select(col(idCol).as("id_a"), col("sh")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash estimator quality on the LSH candidate set: for every candidate
    * pair, the signature-agreement estimate (matching components /
    * numHashes) next to the exact Jaccard over the full distinct-shingle
    * sets, plus the absolute error. The dedup analog of ANN recall@k —
    * before trusting a sketch at 100 TB you measure it against ground truth,
    * and the candidate pairs ARE the right sample: they are the only pairs
    * the pipeline ever acts on, so their estimation error is the quantity
    * that decides dedup precision.
    *
    * Scale: the signature/candidate side is the production LSH path
    * (banded, bounded buckets). The exact side explodes shingles ONLY for
    * documents appearing in some candidate pair (left-semi first), and the
    * intersection join fans out per pair by |A| — proportional to the
    * near-dup mass, not the corpus.
    */
  def minhashAccuracy(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingleSize)
      .localCheckpoint(true)
    val cand = lshCandidatePairs(
      lshBands(sigs, idCol, numHashes, rowsPerBand), idCol)
      .localCheckpoint(true)
    // agreeing components as a codegen integer sum (element_at is 1-based);
    // est_sim = matches/numHashes is an exact binary fraction
    val matches = (1 to numHashes)
      .map(i =>
        when(element_at(col("mh_a"), i) === element_at(col("mh_b"), i), 1)
          .otherwise(0))
      .reduce(_ + _)
    val est = cand
      .join(sigs.select(col(idCol).as("id_a"), col("minhash").as("mh_a")),
        Seq("id_a"))
      .join(sigs.select(col(idCol).as("id_b"), col("minhash").as("mh_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (matches.cast("double") / numHashes).as("est_sim"))
    // exact Jaccard over the FULL distinct-shingle sets (the quantity the
    // estimator approximates — no df-cut here), candidate docs only
    val inCand = cand.select(col("id_a").as(idCol))
      .union(cand.select(col("id_b").as(idCol))).distinct()
    val sh = graft.io.Tables.spread(df.join(inCand, Seq(idCol), "left_semi"))
      .select(col(idCol),
        explode(Shingles.wordShingles(col(textCol), shingleSize)).as("sh"))
      .distinct()
      .localCheckpoint(true)
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select(col(idCol).as("id_a"), col("sh")), Seq("id_a"))
      .join(sh.select(col(idCol).as("id_b"), col("sh")), Seq("id_b", "sh"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_inter"))
    val exact = coalesce(col("n_inter"), lit(0L)).cast("double") /
      (col("sz_a") + col("sz_b") - coalesce(col("n_inter"), lit(0L)))
    est
      .join(inter, Seq("id_a", "id_b"), "left_outer")
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")),
        Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("est_sim"), 6).as("est_sim"),
        round(exact, 6).as("exact_jaccard"),
        round(abs(col("est_sim") - exact), 6).as("abs_err"))
  }

  /** Connected components over candidate-duplicate pairs → cluster
    * representative (min doc id reachable) per document. This is the dedup
    * endgame: LSH emits PAIRS, but retention decisions need GROUPS (keep one
    * doc per component).
    *
    * Implementation: iterative min-label propagation — each round joins
    * current labels across the (bidirectional) edge list and takes the min —
    * run to fixpoint with a driver-side convergence check. Rounds needed =
    * graph diameter; near-dup components are tiny cliques (diameter ≤ ~3),
    * so 5 rounds is generous. At extreme scale swap the inner step for the
    * large-star/small-star contraction (same join shape, fewer rounds on
    * long chains).
    *
    * @param nodes  one row per document (idCol)
    * @param pairs  candidate pairs (id_a, id_b)
    * @return (idCol, cluster_rep) — singletons map to themselves
    */
  def duplicateClusters(
      nodes: DataFrame,
      pairs: DataFrame,
      idCol: String,
      maxIters: Int = 10): DataFrame = {
    val spark = nodes.sparkSession
    import spark.implicits._
    // Materialize the edge list ONCE: it is re-joined every iteration, and
    // without this the whole upstream pipeline (e.g. MinHash+LSH) re-executes
    // per round (measured 18 s → 4 s at sf0.1). Candidate-pair lists are
    // duplication-rate-bounded — tiny next to the corpus.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct()
      .localCheckpoint(true)
    var labels = nodes.select(col(idCol).as("node"), col(idCol).as("lab"))
      .localCheckpoint(true)
    // Fixpoint test: 1-row bit_xor aggregate of per-(node, label) hashes —
    // type-agnostic (string document ids work, where a raw sum("lab")
    // would coerce to NULL and NPE) and overflow-free (summing full-range
    // xxhash64 values trips ANSI long overflow). Any node's label change
    // flips its pair hash; a stable xor across a changed label set needs a
    // 2^-64 coincidence per round — negligible next to maxIters.
    def labelDigest(df: DataFrame): Long =
      df.agg(expr("bit_xor(xxhash64(node, lab))")).first().getLong(0)
    var prevSum = labelDigest(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val viaEdges = edges
        .join(labels, edges("dst") === labels("node"))
        .select(col("src").as("node"), col("lab"))
      val propagated = labels.unionByName(viaEdges)
        .groupBy("node").agg(min("lab").as("lab"))
      // pointer jumping: follow my label's label — halves the remaining
      // chain length every round (O(log diameter) total instead of
      // O(diameter) for chain-shaped duplicate clusters). One checkpoint
      // per round, AFTER the jump: `propagated` feeds both self-join sides
      // as an identical subplan, so its shuffle is computed once and served
      // to the second side via ReusedExchange — a second materialization
      // bought nothing (measured).
      labels = propagated
        .join(propagated.select(col("node").as("__ln"),
          col("lab").as("__ll")),
          col("lab") === col("__ln"), "left")
        .select(col("node"),
          least(col("lab"), coalesce(col("__ll"), col("lab"))).as("lab"))
        .localCheckpoint(true)
      val s = labelDigest(labels)
      converged = s == prevSum
      prevSum = s
      i += 1
    }
    // Same loud-failure contract as connectedComponentsStar/kCore: a cap
    // exit means labels may still be mid-propagation — one true component
    // silently split across several reps (surfaced for real by a 425-node
    // diameter-heavy mutual-kNN component that needed round 11 of 10).
    // With pointer jumping the round count is O(log diameter), so the cap
    // signals something structural, not slow data.
    if (!converged)
      throw new IllegalStateException(
        s"duplicateClusters: no label fixpoint after $maxIters rounds — " +
          "refusing to emit possibly-split cluster labels; raise maxIters")
    labels.select(col("node").as(idCol), col("lab").as("cluster_rep"))
  }

  /** Intra-document repeated-sentence removal — the C4-style cleanup step
    * (Raffel et al. 2020 deduplicate repeated spans within pages; CCNet
    * drops repeated paragraphs): keep the FIRST occurrence of each
    * distinct sentence within a document, preserve original order, and
    * reassemble the cleaned text, with removal accounting.
    *
    * Shape: posexplode sentences → (doc, sentence) hash-agg keeping the
    * min position → per-doc reassembly via sort_array over collected
    * (pos, sentence) structs (the prompt-packing convention — the HOF
    * runs per DOCUMENT over its sentence array, not per corpus row).
    * Emits md5 of the cleaned text (rows stay narrow; the oracle compares
    * the digest). One keyed shuffle + one doc-keyed agg — linear.
    */
  def dedupSentences(
      df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // limit -1 keeps trailing empty fields: Spark's 2-arg split drops
    // them while DuckDB's string_split keeps them — a text ending in the
    // separator would otherwise hash differently per engine
    val sent = df.select(col(idCol),
      posexplode(split(col(textCol), "\\. ", -1)).as(Seq("__p", "__s")))
    val first = sent.groupBy(col(idCol), col("__s"))
      .agg(min(col("__p")).as("__p"), count(lit(1)).as("__n"))
    first.groupBy(col(idCol))
      .agg(
        sum(col("__n")).as("n_sentences"),
        count(lit(1)).as("n_kept"),
        md5(concat_ws(". ",
          transform(
            sort_array(collect_list(struct(col("__p"), col("__s")))),
            x => x.getField("__s"))).cast("binary")).as("clean_md5"))
  }

  /** Dedup-threshold tuning curve: for every candidate similarity
    * threshold, how many LSH candidate pairs the MinHash estimate accepts
    * and how many distinct documents are touched by at least one accepted
    * pair (the upper bound on removals) — THE operational table consulted
    * before committing a near-dup threshold, produced in one sweep instead
    * of re-running the dedup per setting.
    *
    * Exactness: with `numHashes` signature components the estimate only
    * takes values m/numHashes, so the sweep iterates INTEGER minimum match
    * counts m ∈ 1..numHashes — no floating comparison anywhere, and the
    * emitted threshold m/numHashes is a dyadic rational both engines
    * represent identically. Cost: the candidate set (LSH-bounded) ×
    * numHashes sweep rows — candidate-mass-linear, corpus-independent.
    */
  def dedupThresholdSweep(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3): DataFrame = {
    val sigs = minhashSignatures(df, idCol, textCol, numHashes, shingleSize)
      .localCheckpoint(true)
    val cand = lshCandidatePairs(
      lshBands(sigs, idCol, numHashes, rowsPerBand), idCol)
    val matches = (1 to numHashes)
      .map(i =>
        when(element_at(col("mh_a"), i) === element_at(col("mh_b"), i), 1)
          .otherwise(0))
      .reduce(_ + _)
    val est = cand
      .join(sigs.select(col(idCol).as("id_a"), col("minhash").as("mh_a")),
        Seq("id_a"))
      .join(sigs.select(col(idCol).as("id_b"), col("minhash").as("mh_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), matches.as("__m"))
      .localCheckpoint(true)
    val swept = est
      .select(col("id_a"), col("id_b"), col("__m"),
        explode(sequence(lit(1), lit(numHashes))).as("__t"))
      .filter(col("__m") >= col("__t"))
    val pairsAgg = swept.groupBy(col("__t"))
      .agg(count(lit(1)).as("n_pairs"))
    val docsAgg = swept
      .select(col("__t"),
        explode(array(col("id_a"), col("id_b"))).as("__d"))
      .groupBy(col("__t")).agg(countDistinct(col("__d")).as("n_docs"))
    // The tuning curve promises one row PER candidate threshold: thresholds
    // where zero candidate pairs survive must read as explicit zeros, not
    // missing rows (an inner join here silently dropped them).
    val grid = df.sparkSession.range(1, numHashes + 1)
      .select(col("id").cast("int").as("__t"))
    grid
      .join(pairsAgg, Seq("__t"), "left")
      .join(docsAgg, Seq("__t"), "left")
      .select((col("__t").cast("double") / numHashes).as("threshold"),
        coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"))
  }

  /** Leakage-safe train/test split: near-duplicate CLUSTERS — not
    * documents — are the unit of assignment, so no near-dup pair ever
    * straddles the boundary. This closes the within-corpus contamination
    * channel that benchmark decontamination misses: if a test document's
    * near-twin sits in train, the eval answer leaks through the duplicate
    * even though neither document appears in any external benchmark.
    *
    * Cluster representatives come from [[duplicateClusters]] (or
    * [[connectedComponentsStar]] — same contract); the assignment is the
    * deterministic md5-uniform draw on the REPRESENTATIVE
    * (Samplers.uniformDraw), so every member of a cluster draws the same
    * value, the split is reproducible on any partitioning/cluster size,
    * and the expected test mass is `testFrac` of CLUSTERS (the honest
    * unit — splitting by documents would bias toward breaking up large
    * clusters).
    */
  def leakageSafeSplit(
      nodes: DataFrame,
      pairs: DataFrame,
      idCol: String,
      testFrac: Double): DataFrame =
    duplicateClusters(nodes, pairs, idCol)
      .withColumn("split",
        when(graft.sample.Samplers.uniformDraw(col("cluster_rep")) < testFrac,
          "test").otherwise("train"))

  /** Leakage-safe k-fold assignment — [[leakageSafeSplit]]'s
    * cross-validation sibling: every member of a near-dup cluster lands in
    * the SAME fold (fold = salted-hash of the cluster representative mod
    * k), so no fold's validation set shares a near-duplicate with its
    * training folds. Hash-based (not round-robin) so fold membership is a
    * pure function of content — stable under corpus growth, re-sharding,
    * and incremental appends, which positional assignment is not.
    */
  def kFoldSplit(
      nodes: DataFrame,
      pairs: DataFrame,
      idCol: String,
      k: Int): DataFrame = {
    require(k >= 2, "need at least 2 folds")
    duplicateClusters(nodes, pairs, idCol)
      .withColumn("fold",
        HashExprs.md5PrefixLong(
          concat(lit("fold:"), col("cluster_rep").cast("string"))
            .cast("binary"), 8) % k)
  }

  /** Connected components via alternating large-star/small-star contraction
    * (Kiveris/Lattanzi/Mirrokni/Rastogi/Vassilvitskii, "Connected
    * Components in MapReduce and Beyond", SOCC'14) — the extreme-diameter
    * path noted in [[duplicateClusters]]: min-label propagation re-joins
    * the FULL edge list every round, while star contraction rewires edges
    * toward each node's neighborhood minimum so the edge set itself
    * collapses toward stars, converging in O(log² n) rounds on ANY graph
    * shape with per-round shuffle mass that SHRINKS as components
    * contract. Same output contract as [[duplicateClusters]]:
    * (idCol, cluster_rep = component-minimum id); singletons map to
    * themselves — so the two implementations are interchangeable and the
    * equivalence is unit-tested on chain/clique/random graphs.
    *
    * One round = large-star (each node connects its LARGER neighbors to
    * its neighborhood min) then small-star (each node connects its
    * not-larger neighbors, and itself, to the min). Both phases are one
    * groupBy(min) + one equi-join over the bidirectional edge relation —
    * keyed shuffles of (long, long) pairs, no adjacency lists, no driver
    * state beyond the convergence digest.
    */
  def connectedComponentsStar(
      nodes: DataFrame,
      pairs: DataFrame,
      idCol: String,
      maxIters: Int = 20): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    def bidir(df: DataFrame): DataFrame = df
      .select(col("a").as("src"), col("b").as("dst"))
      .unionByName(df.select(col("b").as("src"), col("a").as("dst")))
    // type-agnostic, overflow-free fixpoint digest (same rationale as
    // duplicateClusters' labelDigest); NULL (empty set) → 0
    def digest(df: DataFrame): Long = df
      .agg(expr("coalesce(bit_xor(xxhash64(a, b)), CAST(0 AS BIGINT))"))
      .first().getLong(0)
    def neighborhoodMin(n: DataFrame): DataFrame = n
      .groupBy(col("src")).agg(min(col("dst")).as("__mn"))
      .select(col("src"), least(col("src"), col("__mn")).as("__m"))

    var edges = canon(pairs.select(col("id_a").as("a"), col("id_b").as("b")))
      .localCheckpoint(true)
    var prev = digest(edges)
    var converged = prev == 0L   // no edges → all singletons, skip rounds
    var i = 0
    while (!converged && i < maxIters) {
      val n1 = bidir(edges)
      val large = canon(
        n1.join(neighborhoodMin(n1), Seq("src"))
          .filter(col("dst") > col("src"))
          .select(col("dst").as("a"), col("__m").as("b")))
        .localCheckpoint(true)
      val n2 = bidir(large)
      val m2 = neighborhoodMin(n2)
      val small = canon(
        n2.join(m2, Seq("src"))
          .filter(col("dst") < col("src"))
          .select(col("dst").as("a"), col("__m").as("b"))
          .unionByName(m2.select(col("src").as("a"), col("__m").as("b"))))
        .localCheckpoint(true)
      edges = small
      val d = digest(edges)
      converged = d == prev
      prev = d
      i += 1
    }
    // Exiting via the iteration cap means some component may still span
    // multiple stars → labels would SILENTLY split one true cluster into
    // several. Downstream consumers are correctness-critical (leakageSafeSplit
    // uses clusters as the assignment unit — a split cluster leaks near-dup
    // pairs across train/test), so fail loudly rather than return
    // possibly-wrong labels. Star contraction converges in O(log² n) rounds;
    // hitting maxIters signals something structurally wrong, not slow data.
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponentsStar: no fixpoint after $maxIters rounds — " +
          "refusing to emit possibly-split cluster labels")
    val lab = bidir(edges).groupBy(col("src")).agg(min(col("dst")).as("__mn"))
    nodes.select(col(idCol))
      .join(lab, col(idCol) === col("src"), "left_outer")
      .select(col(idCol),
        least(col(idCol), coalesce(col("__mn"), col(idCol)))
          .as("cluster_rep"))
  }

  /** SimHash (60 bits, staying in a signed long): per token, hash = first
    * 15 hex chars of md5 as a long; each bit position votes ±1 weighted by
    * token frequency; the fingerprint bit is the vote's sign.
    *
    * Shape: explode tokens → codegen'd md5 projection → one hash-aggregate
    * with `bits` conditional sums (map-side partial) → pack bits. Constant
    * shift amounts keep every expression codegen-able.
    */
  def simhashDF(
      df: DataFrame,
      idCol: String,
      textCol: String,
      bits: Int = 60): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("t"))
      .withColumn("h",
        HashExprs.md5PrefixLong(col("t").cast("binary"), 15))
    val votes = (0 until bits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1L)
        .otherwise(-1L)).as(s"v$j")
    }
    val packed = (0 until bits).map { j =>
      when(col(s"v$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), packed.as("sig"))
  }

  /** Hamming distance between two simhash longs. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: block on the top `blockBits` bits (near-dups
    * almost always agree on a high-bit prefix after the vote), then verify
    * with full Hamming distance. Blocking keeps the self-join linear.
    */
  def simhashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxHamming: Int = 8,
      blockBits: Int = 16): DataFrame = {
    val withSig = simhashDF(df, idCol, textCol)
      .withColumn("block", shiftright(col("sig"), 60 - blockBits))
    val l = withSig.select(col("block"), col(idCol).as("id_a"), col("sig").as("sig_a"))
    val r = withSig.select(col("block"), col(idCol).as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("hamming", hammingDistance(col("sig_a"), col("sig_b")))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Passage-level exact dedup across the corpus: segment each document
    * into fixed `chunkWords`-word passages, keep only the globally FIRST
    * occurrence of every distinct passage (order = (doc, position)), and
    * reassemble the surviving passages per document — the chunked
    * approximation of exact-substring dedup used by large-corpus pipelines
    * (one pass, no suffix array).
    *
    * Shape: chunk (codegen'd array ops) → posexplode → ONE window shuffle
    * partitioned by `md5(chunk)` (first-occurrence pick) → per-doc
    * reassembly agg. The window partitions by content hash, so skew equals
    * true mass duplication — exactly the data you want co-located.
    */
  def passageDedup(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkWords: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // materialized once: the first-occurrence window (keyed on the chunk
    // hash) and the per-doc totals (keyed on the doc) would otherwise each
    // re-run the tokenize+chunk+posexplode pipeline
    val chunks = df.select(col(idCol),
      posexplode(TextAnalysis.wordChunks(col(textCol), chunkWords))
        .as(Seq("pos", "chunk")))
      .localCheckpoint(true)
    val w = Window.partitionBy(md5(col("chunk").cast("binary")))
      .orderBy(col(idCol), col("pos"))
    val kept = chunks
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
    val survivors = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
          p => p.getField("chunk"))).as("clean_text"))
    val totals = chunks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"))
    totals.join(survivors, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Corpus-frequency boilerplate scrub — the C4/RefinedWeb line-dedup
    * rule: any text chunk that occurs in >= `maxDf` DISTINCT documents is
    * boilerplate (headers, licenses, navigation), and EVERY occurrence is
    * removed — including the first. The complement of [[passageDedup]]
    * (which keeps first occurrences): first-occurrence dedup de-weights
    * duplicated content; the df-rule deletes content whose corpus
    * frequency itself marks it as template noise.
    *
    * Output per document: total chunk count, kept chunk count, and the
    * reassembled clean text (kept chunks in original order).
    *
    * Scale: one chunk explode, a 16-byte-key hash aggregate for the df
    * count (countDistinct over doc ids — map-side partial), and a
    * left-anti join of the chunk table against the hot set. The hot set is
    * boilerplate-scale (tiny by definition — chunks crossing the df
    * threshold), so AQE turns the anti join into a broadcast; nothing is
    * ever quadratic and full text crosses no exchange (chunks group by
    * their md5).
    */
  def boilerplateScrub(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkWords: Int = 5,
      maxDf: Int = 3): DataFrame = {
    val chunks = df.select(col(idCol),
        posexplode(TextAnalysis.wordChunks(col(textCol), chunkWords))
          .as(Seq("pos", "chunk")))
      .withColumn("h", md5(col("chunk").cast("binary")))
      .localCheckpoint(true)
    val hot = chunks.groupBy(col("h"))
      .agg(countDistinct(col(idCol)).as("__docs"))
      .filter(col("__docs") >= maxDf)
      .select(col("h"))
    val kept = chunks.join(hot, Seq("h"), "left_anti")
    val survivors = kept.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_kept"),
      concat_ws(" ",
        transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
          p => p.getField("chunk"))).as("clean_text"))
    val totals = chunks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"))
    totals.join(survivors, Seq(idCol), "left")
      .select(col(idCol), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Benchmark decontamination: flag corpus documents sharing any word
    * k-shingle with a held-out evaluation set (the n-gram-overlap rule used
    * to scrub pretraining corpora against eval benchmarks). The eval side's
    * distinct shingle set is small → broadcast equi-join against the corpus
    * shingle explode; no pair join, linear in corpus size.
    */
  def decontaminate(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3): DataFrame = {
    val corpusSh = graft.io.Tables.spread(corpus).select(col(idCol),
      explode(Shingles.wordShingles(col(textCol), shingleSize)).as("sh"))
    val evalSh = evalSet
      .select(explode(Shingles.wordShingles(col(textCol), shingleSize)).as("sh"))
      .distinct()
    val hits = corpusSh.join(broadcast(evalSh), Seq("sh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0L).as("contaminated"))
  }

  /** Bloom-prefiltered decontamination: same contract and output as
    * [[decontaminate]], with a Bloom-filter membership pass BEFORE the exact
    * shingle join. This is the 100 TB shape when the eval shingle set is too
    * large to broadcast as an exact hash relation but fits as a bitset: the
    * corpus-side explode is filtered by a codegen'd
    * `BloomFilterMightContain` (Spark's own runtime-filter expression — no
    * UDF, stays inside whole-stage codegen), so only candidate shingles
    * reach the confirming equi-join. False positives are removed by that
    * exact join, so the final output is deterministic and bit-identical to
    * [[decontaminate]] — the bloom stage only prunes.
    *
    * The filter is built by `BloomFilterAggregate` over `xxhash64(shingle)`
    * and collected once to the driver (size = numBits/8 — e.g. 2^20 bits =
    * 128 KiB); at cluster scale the same binary rides the closure/literal
    * into every task exactly like Spark's own injected runtime filters.
    */
  def decontaminateBloom(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      expectedItems: Long = 1L << 16,
      numBits: Long = 1L << 22): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType

    val corpusSh = graft.io.Tables.spread(corpus).select(col(idCol),
      explode(Shingles.wordShingles(col(textCol), shingleSize)).as("sh"))
    val evalSh = evalSet
      .select(explode(Shingles.wordShingles(col(textCol), shingleSize)).as("sh"))
      .distinct()

    val bloomAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col("sh"))),
        Literal(expectedItems), Literal(numBits)
      ).toAggregateExpression())
    val bloomBin = evalSh.agg(bloomAgg.as("bf")).head.getAs[Array[Byte]](0)

    // Empty eval set → BloomFilterAggregate yields null → nothing can match.
    val pre =
      if (bloomBin == null) corpusSh.limit(0)
      else corpusSh.filter(ColumnBridge.column(
        BloomFilterMightContain(
          Literal(bloomBin, BinaryType),
          ColumnBridge.expression(xxhash64(col("sh"))))))

    val hits = pre.join(broadcast(evalSh), Seq("sh"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) > 0L).as("contaminated"))
  }

  /** FUZZY decontamination: flag corpus documents whose MinHash-estimated
    * Jaccard similarity to ANY eval document clears a threshold — the
    * near-duplicate eval-overlap gate the frontier training reports run
    * beside exact-shingle decontamination (GPT-3's 13-gram dedup, Llama 2's
    * "contaminated if ≥ X% token overlap" appendix; exact matching misses a
    * benchmark item lightly paraphrased or partially quoted, which is the
    * common leak mode in web corpora).
    *
    * Shape: [[minhashSignatures]] on BOTH sides (same md5 min-wise family
    * as the dedup path, so any engine replays it), [[lshBands]] on both, a
    * bipartite band-key equi-join generates (corpus, eval) candidates, and
    * the candidate pair's signatures estimate Jaccard as the fraction of
    * agreeing components — exact integers end to end (est_micro =
    * agree·1e6 div numHashes).
    *
    * Scale shape: the eval side is benchmark-scale and BROADCASTS (its
    * bands and its signature map); the corpus side is one explode + one
    * hash-agg + one broadcast join — corpus-linear, no shuffle keyed on
    * anything wider than the doc id, no corpus×eval pair mass (banding
    * gates candidate generation exactly as in the dedup path). Recall is
    * the LSH family's: a paraphrase below the band-collision curve is
    * missed by design and tuned by (numHashes, rowsPerBand).
    *
    * @return one row per corpus doc: (idCol, match_id — the est-max
    *         tie-min eval witness or NULL, est_jaccard_micro, contaminated)
    */
  def decontaminateFuzzy(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3,
      thresholdMicro: Long = 600000L): DataFrame = {
    require(thresholdMicro >= 0L && thresholdMicro <= 1000000L,
      s"bad threshold $thresholdMicro")
    val corpSig =
      minhashSignatures(corpus, idCol, textCol, numHashes, shingleSize)
    val evalSigRaw =
      minhashSignatures(evalSet, idCol, textCol, numHashes, shingleSize)
        .select(col(idCol).as("__eid"), col("minhash"))
    val evalSig = evalSigRaw
      .select(col("__eid"), col("minhash").as("__emh"))
    val corpBands = lshBands(corpSig, idCol, numHashes, rowsPerBand)
    val evalBands = lshBands(evalSigRaw, "__eid", numHashes, rowsPerBand)
    val cand = corpBands
      .join(broadcast(evalBands), Seq("band", "band_key"))
      .select(col(idCol), col("__eid")).distinct()
    // component agreement as a codegen'd sum of comparisons (a zip_with/
    // aggregate lambda would evaluate interpreted — the repo-wide HOF rule)
    val agree = (0 until numHashes)
      .map(i => when(element_at(col("minhash"), i + 1) ===
        element_at(col("__emh"), i + 1), 1L).otherwise(0L))
      .reduce(_ + _)
    val best = cand
      .join(corpSig, Seq(idCol))
      .join(broadcast(evalSig), Seq("__eid"))
      .select(col(idCol), col("__eid"), agree.as("__agree"))
      // integer div (Spark's `/` on longs is DOUBLE division; a float
      // quotient at the threshold boundary is exactly the flap the
      // micro-units convention exists to prevent)
      .select(col(idCol), col("__eid"),
        expr(s"__agree * CAST(1000000 AS BIGINT) div $numHashes")
          .as("__est"))
      .groupBy(col(idCol))
      .agg(max(struct(col("__est"), (-col("__eid")).as("__ne"))).as("__m"))
      .select(col(idCol), (-col("__m.__ne")).as("match_id"),
        col("__m.__est").as("est_jaccard_micro"))
    corpus.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol), col("match_id"),
        coalesce(col("est_jaccard_micro"), lit(0L)).as("est_jaccard_micro"),
        (coalesce(col("est_jaccard_micro"), lit(0L)) >= thresholdMicro)
          .as("contaminated"))
  }

  /** SEMANTIC (embedding-space) decontamination — the gate the lexical
    * family above cannot provide: [[decontaminate]]/[[decontaminateBloom]]/
    * [[decontaminateFuzzy]] catch n-gram overlap, so a PARAPHRASED
    * benchmark item (same content, different words — zero shared
    * shingles) sails straight through into the training set. This pass
    * works where paraphrases live: flag every corpus document whose
    * embedding lies within cosine `threshold` of ANY benchmark-item
    * embedding.
    *
    * Scale shape — the [[graft.scale.Similarity.ivfTopK]] cell-probe
    * walk, never corpus × benchmark pair mass: centroids are the
    * deterministic id-modulo pick (a trained
    * [[graft.scale.Similarity.kmeansCentroids]] codebook drops in);
    * corpus vectors assign to their top-1 cell via ONE broadcast
    * crossJoin + max-struct hash-agg (no window over the corpus);
    * benchmark items probe their top-`probes` cells (multi-probe buys
    * back the recall a cell boundary would cost — benchmark sets are
    * dictionary-scale, so the window is cheap); the similarity join runs
    * within cells only. Determinism: 1e-3-quantized integer vectors,
    * exact-long dots ([[graft.scale.Similarity.cosineQuantized]]), ties
    * to the smallest id everywhere.
    *
    * Recall is MEASURED, not assumed — the fixture plants paraphrase
    * vectors and grades this op's hits against the planted truth (the
    * phonetic_blocking_quality discipline); see
    * decontaminate_semantic_recall_docs.
    *
    * @return one row per FLAGGED corpus doc: (corpus_id, n_bench_hits,
    *         top_bench_id, max_sim) — unflagged docs are absent (the
    *         drop-list contract; LEFT-join back for a per-doc flag)
    */
  def decontaminateSemantic(
      corpus: DataFrame,
      benchmark: DataFrame,
      corpusIdCol: String,
      benchIdCol: String,
      vecCol: String,
      threshold: Double,
      centroidMod: Int = 100,
      probes: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(threshold > 0.0 && threshold <= 1.0, s"bad threshold $threshold")
    require(probes >= 1, s"bad probes $probes")
    val cents = corpus.filter(col(corpusIdCol) % centroidMod === 0)
      .select(col(corpusIdCol).as("centroid_id"),
        Similarity.quantize(col(vecCol)).as("centv"))
    val cAsn = corpus
      .select(col(corpusIdCol).as("corpus_id"),
        Similarity.quantize(col(vecCol)).as("cv"))
      .crossJoin(broadcast(cents))
      .select(col("corpus_id"), col("cv"), col("centroid_id"),
        Similarity.cosineQuantized(col("cv"), col("centv")).as("c_sim"))
      .groupBy(col("corpus_id"))
      .agg(max(struct(col("c_sim"), (-col("centroid_id")).as("__nc"),
        col("cv").as("cv"))).as("__m"))
      .select(col("corpus_id"), (-col("__m.__nc")).as("centroid_id"),
        col("__m.cv").as("cv"))
    val wp = Window.partitionBy(col("bench_id"))
      .orderBy(col("b_sim").desc, col("centroid_id"))
    val bAsn = benchmark
      .select(col(benchIdCol).as("bench_id"),
        Similarity.quantize(col(vecCol)).as("bv"))
      .crossJoin(broadcast(cents))
      .withColumn("b_sim",
        Similarity.cosineQuantized(col("bv"), col("centv")))
      .withColumn("prk", row_number().over(wp))
      .filter(col("prk") <= probes)
      .select(col("centroid_id"), col("bench_id"), col("bv"))
    // each corpus doc lives in exactly one cell, so a (corpus, bench)
    // pair meets at most once even under multi-probe — no distinct needed
    cAsn.join(bAsn, Seq("centroid_id"))
      .withColumn("cos_sim",
        Similarity.cosineQuantized(col("cv"), col("bv")))
      .filter(col("cos_sim") >= threshold)
      .groupBy(col("corpus_id"))
      .agg(count(lit(1)).as("n_bench_hits"),
        max(struct(col("cos_sim"), (-col("bench_id")).as("__nb")))
          .as("__m"),
        round(max(col("cos_sim")), 6).as("max_sim"))
      .select(col("corpus_id"), col("n_bench_hits"),
        (-col("__m.__nb")).as("top_bench_id"), col("max_sim"))
  }

  /** Per-benchmark contamination report — the release-audit table
    * (Dolma / FineWeb convention): [[decontaminateFuzzy]] flags docs
    * against ONE eval slice; a real release audits N benchmarks at once
    * and reports each benchmark's overlap mass against the corpus. Same
    * band-gated MinHash machinery (the eval side — ALL benchmarks
    * together — broadcasts; the corpus side is one explode + hash-agg +
    * broadcast join, corpus-linear, no corpus×eval pair mass); the
    * benchmark label rides the eval broadcast, so auditing N benchmarks
    * costs ONE pass, not N.
    *
    * Every benchmark emits a row even at zero overlap (the scaffold
    * lesson); a corpus doc contaminated against k benchmarks counts in
    * each of the k rows (the release question is per-benchmark, not
    * exclusive).
    *
    * @param benchCol benchmark label column of `evalSet`
    * @param massCol  corpus mass column (tokens/chars) to report
    * @return per benchmark: (benchmark, n_eval, n_contaminated,
    *         mass_contaminated, frac_docs, frac_mass) — fracs over the
    *         corpus totals, rounded 6
    */
  def contaminationReport(
      corpus: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      textCol: String,
      benchCol: String,
      massCol: String,
      numHashes: Int = 8,
      rowsPerBand: Int = 2,
      shingleSize: Int = 3,
      thresholdMicro: Long = 600000L): DataFrame = {
    require(thresholdMicro >= 0L && thresholdMicro <= 1000000L,
      s"bad threshold $thresholdMicro")
    val corpSig =
      minhashSignatures(corpus, idCol, textCol, numHashes, shingleSize)
    val evalSigRaw =
      minhashSignatures(evalSet, idCol, textCol, numHashes, shingleSize)
        .select(col(idCol).as("__eid"), col("minhash"))
    val evalSig = evalSigRaw
      .select(col("__eid"), col("minhash").as("__emh"))
    val corpBands = lshBands(corpSig, idCol, numHashes, rowsPerBand)
    val evalBands = lshBands(evalSigRaw, "__eid", numHashes, rowsPerBand)
    val cand = corpBands
      .join(broadcast(evalBands), Seq("band", "band_key"))
      .select(col(idCol), col("__eid")).distinct()
    val agree = (0 until numHashes)
      .map(i => when(element_at(col("minhash"), i + 1) ===
        element_at(col("__emh"), i + 1), 1L).otherwise(0L))
      .reduce(_ + _)
    val est = cand
      .join(corpSig, Seq(idCol))
      .join(broadcast(evalSig), Seq("__eid"))
      .select(col(idCol), col("__eid"), agree.as("__agree"))
      .select(col(idCol), col("__eid"),
        expr(s"__agree * CAST(1000000 AS BIGINT) div $numHashes")
          .as("__est"))
    // benchmark labels ride the (benchmark-scale) eval broadcast; per
    // (benchmark, corpus doc) keep the best witness estimate, then flag
    val bench = evalSet
      .select(col(idCol).as("__eid"), col(benchCol).as("benchmark"))
    val flagged = est.join(broadcast(bench), Seq("__eid"))
      .groupBy(col("benchmark"), col(idCol))
      .agg(max(col("__est")).as("__best"))
      .filter(col("__best") >= thresholdMicro)
    val mass = corpus
      .select(col(idCol), col(massCol).cast("long").as("__mass"))
    val hit = flagged.join(mass, Seq(idCol))
      .groupBy(col("benchmark"))
      .agg(count(lit(1)).as("n_contaminated"),
        sum(col("__mass")).as("mass_contaminated"))
    val ctot = mass.agg(count(lit(1)).as("__nc"),
      sum(col("__mass")).as("__mc"))
    evalSet.groupBy(col(benchCol).as("benchmark"))
      .agg(count(lit(1)).as("n_eval"))
      // benchmark-dictionary fold: broadcast, never a sort-merge exchange
      .join(broadcast(hit), Seq("benchmark"), "left")
      .na.fill(0L, Seq("n_contaminated", "mass_contaminated"))
      .crossJoin(broadcast(ctot))
      .select(col("benchmark"), col("n_eval"), col("n_contaminated"),
        col("mass_contaminated"),
        round(col("n_contaminated").cast("double") /
          col("__nc").cast("double"), 6).as("frac_docs"),
        round(col("mass_contaminated").cast("double") /
          col("__mc").cast("double"), 6).as("frac_mass"))
  }

  /** n-gram Jaccard near-dup via inverted shingle index: explode distinct
    * shingles, drop shingles with document frequency > `maxDf` (stop-shingle
    * blocking — they generate candidate pairs quadratically while carrying no
    * signal), equi-join on shingle, Jaccard = |∩| / (|A|+|B|-|∩|) from exact
    * integer counts.
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.5,
      maxDf: Int = 100): DataFrame = {
    // Materialize the exploded (id, shingle) relation ONCE: it feeds the
    // per-doc sizes and the posting-list aggregate, and Spark re-executes
    // the tokenize+shingle pipeline per consumer otherwise (measured ~4×
    // scan cost at sf0.1).
    val sh = graft.io.Tables.spread(df).select(col(idCol),
      explode(Shingles.wordShingles(col(textCol), shingleSize)).as("sh"))
      .localCheckpoint(true)
    // Inverted-index pair generation. Order matters for scale: the df-cut
    // runs FIRST as a count aggregate (O(1) partial state per shingle — a
    // billion-df stop-shingle costs one counter, never a collected list),
    // THEN posting lists build only for surviving shingles, bounded at
    // maxDf ids each. Candidate pairs expand map-side from the bounded
    // lists (double explode) instead of a shuffle self-join — every
    // aggregation/join here keys on `sh`, so Catalyst reuses one exchange.
    // Stop-shingles (df > maxDf) carry no signal but generate pairs
    // quadratically — dropping them bounds the fan-out at C(maxDf, 2).
    val keep = sh.groupBy(col("sh")).agg(count(lit(1)).as("df_cnt"))
      .filter(col("df_cnt") <= maxDf)
      .select("sh")
    val kept = sh.join(keep, Seq("sh"))
    // Sizes come from the KEPT (post-df-cut) shingle set — the same
    // universe as the intersection counts. Pre-cut sizes would deflate
    // every score (identical docs sharing 30 corpus-common shingles would
    // score 0.25, not 1.0) and silently miss true near-duplicates.
    val sizes = kept.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val postings = kept
      .groupBy(col("sh"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
    val common = postings
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("sz_a") + col("sz_b") - col("n_common")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "n_common", "jaccard")
  }

  /** n-gram CONTAINMENT near-dup pairs: the asymmetric companion to
    * [[ngramJaccardPairs]]. Jaccard misses the "small doc swallowed by a
    * big doc" case — a 30-shingle snippet fully quoted inside a
    * 3000-shingle page scores J ≈ 0.01 but containment C(A→B) =
    * |A∩B| / |A| = 1.0. That doc-in-doc signal is what quote/boilerplate
    * contamination screens key on (the measure behind Broder's
    * containment sketches). Emits both directions per unordered pair
    * (`cont_ab` = share of A's shingles inside B, `cont_ba` symmetric) and
    * keeps the pair when EITHER direction clears `threshold`.
    *
    * Plan shape is the Jaccard one unchanged (count-first df-cut, bounded
    * posting lists, map-side pair expansion — every shuffle keys on the
    * shingle or the id, nothing all-pairs); only the final scalar math
    * differs, so the scale story is identical. Sizes are post-df-cut for
    * the same reason documented there: numerator and denominator must
    * count the same shingle universe.
    */
  def ngramContainmentPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      threshold: Double = 0.8,
      maxDf: Int = 100): DataFrame = {
    val sh = graft.io.Tables.spread(df).select(col(idCol),
      explode(Shingles.wordShingles(col(textCol), shingleSize)).as("sh"))
      .localCheckpoint(true)
    val keep = sh.groupBy(col("sh")).agg(count(lit(1)).as("df_cnt"))
      .filter(col("df_cnt") <= maxDf)
      .select("sh")
    val kept = sh.join(keep, Seq("sh"))
    val sizes = kept.groupBy(idCol).agg(count(lit(1)).as("sz"))
    val postings = kept
      .groupBy(col("sh"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
    val common = postings
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col(idCol).as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col(idCol).as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .withColumn("cont_ab", col("n_common").cast("double") / col("sz_a"))
      .withColumn("cont_ba", col("n_common").cast("double") / col("sz_b"))
      .filter(greatest(col("cont_ab"), col("cont_ba")) >= threshold)
      .select(col("id_a"), col("id_b"), col("n_common"),
        round(col("cont_ab"), 6).as("cont_ab"),
        round(col("cont_ba"), 6).as("cont_ba"))
  }

  /** Winnowing fingerprint match detection (Schleimer, Wilkerson & Aiken,
    * SIGMOD '03 — the MOSS algorithm): per document, hash the POSITIONAL
    * k-gram sequence, slide a window of `w` consecutive hashes, and keep
    * each window's MINIMUM hash; the distinct kept hashes are the doc's
    * fingerprint set. Guarantees: any shared run of w + k − 1 tokens
    * between two docs yields at least one shared fingerprint (detection),
    * while only ~2/(w+1) of the grams survive (compression) — the
    * sampling-with-guarantees middle ground between full-gram Jaccard
    * ([[ngramJaccardPairs]], exact but heavy) and MinHash (probabilistic).
    *
    * Determinism: hash = 60-bit md5 prefix of the gram; the fingerprint is
    * the SET of window minima (the positional tie-break of the paper's
    * "rightmost minimum" rule only affects positions, which the set
    * discards), so the SQL replay is a plain windowed MIN.
    *
    * Scale shape: the windowed MIN partitions BY DOCUMENT (parallel across
    * docs, frames bounded at w rows); fingerprint posting lists get the
    * same count-first df-cut + bounded expansion as the Jaccard index.
    * Emits (id_a, id_b, n_shared) for pairs sharing ≥ `minShared`
    * fingerprints.
    */
  def winnowMatches(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleSize: Int = 3,
      window: Int = 4,
      minShared: Long = 2L,
      maxDf: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = graft.io.Tables.spread(df).select(col(idCol),
        posexplode(Shingles.positionalShingles(col(textCol), shingleSize))
          .as(Seq("pos", "gram")))
      .withColumn("h", HashExprs.md5PrefixLong(col("gram").cast("binary"), 15))
    val frame = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, window - 1)
    val part = Window.partitionBy(col(idCol))
    // keep only FULL windows (or the single short-doc window): a doc with
    // n grams has n − w + 1 full windows; trailing starts see < w rows
    val fps = grams
      .withColumn("wmin", min(col("h")).over(frame))
      .withColumn("cnt", count(col("h")).over(frame))
      .withColumn("n", count(col("h")).over(part))
      .filter(col("cnt") === least(lit(window.toLong), col("n")))
      .select(col(idCol), col("wmin").as("h"))
      .distinct()
    val keep = fps.groupBy(col("h")).agg(count(lit(1)).as("df_cnt"))
      .filter(col("df_cnt") <= maxDf)
      .select("h")
    val kept = fps.join(keep, Seq("h"))
    val postings = kept.groupBy(col("h"))
      .agg(sort_array(collect_list(col(idCol))).as("ids"))
    postings
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Exact prefix-filter similarity self-join over precomputed token-set
    * arrays — the AllPairs/PPJoin candidate generator (Bayardo et al. WWW'07;
    * Xiao et al. WWW'08) as a Spark plan. This is the scale-safe entity-
    * matching candidate generator the SURVEY J3 mapping prescribes: unlike a
    * fixed-key blocking self-join (e.g. `(p_brand, p_size)` in
    * `em_similarity_part`), whose per-block population grows linearly with
    * the corpus and whose within-block pair mass therefore grows
    * QUADRATICALLY, prefix filtering keys candidate generation on the
    * rarest tokens of each set, so posting lists track true token rarity and
    * candidate mass tracks true near-match mass.
    *
    * Exactness (no false negatives), unlike the df-cut in
    * [[ngramJaccardPairs]]: under any single global token order, if
    * J(x,y) >= t then the first `|x| - ceil(t|x|) + 1` tokens of x and the
    * first `|y| - ceil(t|y|) + 1` tokens of y share at least one token
    * (prefix-filtering principle). We order tokens by (global df asc, token
    * asc) — rarest first — which both preserves exactness and minimizes
    * posting-list length. A length filter (`J >= t ⇒ min(|x|,|y|) >=
    * t·max(|x|,|y|)`) prunes candidates before the verify join.
    *
    * Plan shape at scale: one explode + one count aggregate on `tok` (O(1)
    * partial state per token), one keyed aggregate on `id` to rebuild the
    * ordered prefix (no window — a doc's tokens collapse into one row), one
    * posting aggregate on `tok`, map-side pair expansion from the posting
    * lists, then an equi-join verify on the candidate ids only. Every
    * shuffle keys on `tok` or `id`; nothing is all-pairs.
    *
    * Reference behavior: fast_ai_wrangler prompts mandate thresholded
    * Jaccard pair predicates for entity matching (promptsTemplate.py:30-48);
    * this generator feeds those predicates without a hand-picked blocking
    * key.
    */
  def ppjoinPairs(
      df: DataFrame,
      idCol: String,
      toksCol: String,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"prefix filtering needs 0 < t <= 1, got $threshold")
    // Float-boundary guard: every filter below prunes when a REAL-arithmetic
    // inequality fails. Computing `t·sz` / `t/(1+t)·(sz_a+sz_b)` in doubles
    // can round a hair ABOVE an exact integer boundary and wrongly prune a
    // qualifying pair (false negative = wrong answer). Subtracting EPS keeps
    // every boundary case; the only cost is a handful of extra candidates.
    val EPS = 1e-9
    // (id, tok) relation materialized once: feeds the df count and the
    // per-doc ordered rebuild.
    val tok = df.select(col(idCol).as("id"), explode(col(toksCol)).as("tok"))
      .localCheckpoint(true)
    val dfCnt = tok.groupBy(col("tok")).agg(count(lit(1)).as("df_cnt"))
    // Dense integer token ids ranked rarest-first (df asc, token asc), so
    // NUMERIC tid order IS the global prefix-filter order: ordered arrays
    // are plain sorted int arrays (small, codegen-friendly intersects) and
    // "first common token" = array_min of the intersection. The prefix
    // filter needs only a df-consistent TOTAL ORDER, not a single-task
    // ranking — assigned via the range-partitioned globalRowNumber
    // scaffold, so even a billion-token dictionary ranks in parallel.
    // checked int narrowing: past 2^31 distinct tokens the cast would wrap
    // silently and corrupt the prefix-filter order — fail loudly instead
    // (the total is free: the scaffold's partition-size job already sums it)
    val (dimRanked, nTokens) = graft.sample.Samplers
      .globalRowNumberWithTotal(dfCnt, Seq("df_cnt", "tok"), rnCol = "tid")
    require(nTokens <= Int.MaxValue,
      s"ppjoin token dictionary has $nTokens entries — int tids would wrap; " +
        "widen tid to long before running a corpus this large")
    val dim = dimRanked.select(col("tok"), col("tid").cast("int").as("tid"))
    val ordered = tok.join(dim, Seq("tok"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("tid"))).as("toks_o"))
    // Super-node collapse: identical token SETS join identically (Jaccard
    // depends only on the sets), and real near-dup corpora repeat sets
    // massively (the sf0.1 part table's 20k names collapse to 64 distinct
    // sets). The O(candidates²)-shaped index work therefore runs over
    // DISTINCT sets only; member ids re-expand afterwards at output mass.
    // Empty-set docs never reach here (explode emits nothing), matching the
    // all-pairs contract where an empty side scores J = 0 < t.
    val groups = ordered
      .groupBy(col("toks_o"))
      .agg(min(col("id")).as("gid"), collect_list(col("id")).as("members"))
      .withColumn("sz", size(col("toks_o")))
      .withColumn("plen",
        (col("sz") - ceil(lit(threshold) * col("sz") - EPS) + 1).cast("int"))
      .localCheckpoint(true)
    // Within a group every pair matches exactly (J = 1.0 >= any t) —
    // folded in as group-level SELF-pairs below, so the member expansion
    // runs as ONE fused pipeline. Profiled on editDistancePairs (same
    // shape): a Union above the pair-mass expansion breaks whole-stage
    // codegen at the union boundary and the per-row copy tax dominated the
    // operator at 8× — unioning at the dictionary-scale pair table instead
    // keeps the expansion fused.
    // Posting lists over PREFIX tokens only (rare by construction), one
    // entry per DISTINCT set. Each entry carries its ordered tid array, so
    // verification happens INLINE at pair expansion — no candidate
    // materialization, no verify joins, and no distinct anywhere: a
    // qualifying group pair is emitted exactly once, from its first-common-
    // token generation row. This is the classic PPJoin index layout: the
    // index stores the records.
    val postings = groups
      .select(col("gid"), col("sz"), col("toks_o"),
        posexplode(slice(col("toks_o"), lit(1), col("plen")))
          .as(Seq("pos0", "tid")))
      .groupBy(col("tid"))
      .agg(collect_list(
        struct(col("gid"), col("pos0"), col("sz"), col("toks_o"))).as("es"))
    // Required overlap α = ceil(t/(1+t)·(|x|+|y|)) (Xiao et al. WWW'08).
    val alpha = ceil(
      lit(threshold / (1.0 + threshold)) * (col("a.sz") + col("b.sz")) - EPS)
    val gpairs = postings
      .select(col("tid"), explode(col("es")).as("a"), col("es"))
      .select(col("tid"), col("a"), explode(col("es")).as("b"))
      .filter(col("a.gid") < col("b.gid"))
      // length filter: J >= t ⇒ min(|x|,|y|) >= t·max(|x|,|y|)
      .filter(least(col("a.sz"), col("b.sz")).cast("double") >=
        lit(threshold) * greatest(col("a.sz"), col("b.sz")) - EPS)
      // position filter: common tokens at/after this shared prefix position
      // bound the remaining possible overlap to min(|x|-i, |y|-j). Valid for
      // the first-common-token row (all common tokens sit at or after it in
      // rarity order); later rows may be over-pruned, which is harmless
      // because only the first-common-token row emits.
      .filter((least(col("a.sz") - col("a.pos0"), col("b.sz") - col("b.pos0")))
        .cast("double") >= alpha)
      .withColumn("ia", array_intersect(col("a.toks_o"), col("b.toks_o")))
      // exactly-once emission: this row's generating token is the pair's
      // smallest (rarest) common token
      .filter(col("tid") === array_min(col("ia")))
      .withColumn("inter", size(col("ia")))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("a.sz") + col("b.sz") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("a.gid").as("gid_a"), col("b.gid").as("gid_b"),
        col("jaccard"))
    val selfPairs = groups.filter(size(col("members")) > 1)
      .select(col("gid").as("gid_a"), col("gid").as("gid_b"),
        lit(1.0).as("jaccard"))
    // Group-pair expansion: every member combination of a matched group
    // pair matches with the group-level score. Output mass only — nothing
    // quadratic in corpus size beyond the true answer. Cross pairs draw
    // (ia, ib) from disjoint member lists (exactly once, canonicalized by
    // least/greatest); self pairs keep ia < ib.
    gpairs.unionByName(selfPairs)
      .join(groups.select(col("gid").as("gid_a"), col("members").as("ma")),
        Seq("gid_a"))
      .join(groups.select(col("gid").as("gid_b"), col("members").as("mb")),
        Seq("gid_b"))
      .select(col("gid_a"), col("gid_b"), col("jaccard"),
        explode(col("ma")).as("ia"), col("mb"))
      .select(col("gid_a"), col("gid_b"), col("jaccard"), col("ia"),
        explode(col("mb")).as("ib"))
      .filter(col("gid_a") =!= col("gid_b") || col("ia") < col("ib"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("jaccard"))
  }

  /** Sorted-Neighborhood Method candidate pairs (Hernández & Stolfo,
    * SIGMOD'95) — the OTHER classic entity-resolution blocking scheme
    * beside prefix filtering ([[ppjoinPairs]]): records sort by a
    * domain-chosen blocking key and every pair within a sliding window of
    * `window` consecutive positions becomes a candidate. Where PPJoin's
    * candidate mass tracks token-overlap mass, SNM's is EXACTLY n·(window−1)
    * − corpus-linear BY CONSTRUCTION whatever the data looks like — the
    * right tool when a good lexicographic key exists (names, addresses)
    * and the pair budget must be fixed up front.
    *
    * Scale shape: the global sort rank comes from the range-partitioned
    * [[graft.sample.Samplers.globalRowNumber]] scaffold (no single-task
    * window); neighbors join via the step-bucket trick — left rows
    * replicate to buckets ⌊r/step⌋ and ⌊r/step⌋+1 (step = window−1), right
    * rows live in bucket ⌊r/step⌋ alone, so any pair within `step` ranks
    * shares exactly ONE bucket key and the join is a plain equi-join with
    * 2× replication, never a range θ-join or a cross product.
    *
    * Determinism: ties in the blocking key order break on `idCol`, so the
    * rank — and therefore the candidate set — is a pure function of the
    * data (SQL-replayable with a ROW_NUMBER window).
    *
    * Storage contract: the ranked (id, key, rank) projection is
    * `localCheckpoint(true)` — EAGER, corpus-linear executor storage for
    * the narrow 3-column frame (MEMORY_AND_DISK, so it spills rather than
    * OOMs). Both join sides read it; without the checkpoint the whole
    * rank scaffold (partition-size job + range exchange + per-partition
    * window) would execute twice, and the two recomputations could in
    * principle disagree under speculative re-partitioning — same cadence
    * rationale as k-center's per-round checkpoint.
    *
    * Reference behavior: fast_ai_wrangler's EM pipeline scores candidate
    * pairs from a pre-blocked pair file (data_utils.py:71-88); SNM is one
    * of the standard generators producing such files.
    *
    * @return (id_a, id_b, rank_dist) — id_a/id_b in blocking-key order
    *         (a precedes b in the sort), rank_dist in [1, window−1].
    */
  def snmPairs(
      df: DataFrame,
      idCol: String,
      keyCol: String,
      window: Int): DataFrame = {
    require(window >= 2, s"SNM needs a window of at least 2, got $window")
    val step = window - 1
    val ranked = graft.sample.Samplers
      .globalRowNumber(
        df.select(col(idCol).as("id"), col(keyCol).as("__k")),
        Seq("__k", "id"), rnCol = "__r")
      .select(col("id"), col("__k"), col("__r"))
      .localCheckpoint(true)
    // integer bucket id (exact at any rank — float division would round
    // past 2^53 and silently misbucket)
    val bucket = expr(s"__r div $step")
    val left = ranked.select(col("id").as("id_a"), col("__r").as("__ra"),
        explode(array(bucket, bucket + 1L)).as("__b"))
    val right = ranked.select(col("id").as("id_b"), col("__r").as("__rb"),
      bucket.as("__b"))
    left.join(right, Seq("__b"))
      .filter(col("__rb") > col("__ra") &&
        col("__rb") - col("__ra") <= step)
      .select(col("id_a"), col("id_b"),
        (col("__rb") - col("__ra")).as("rank_dist"))
  }

  /** Cross-document exact-substring duplication — the ExactSubstr decision
    * of Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better", arXiv:2107.06499) re-shaped for a distributed engine: two
    * documents are substring-duplicates iff they share a character k-gram
    * window. The inverted window-hash index generates candidate pairs like
    * [[ngramJaccardPairs]], but with the df-cut fused INTO the posting
    * aggregation ([[cappedPostingAggregator]]): bounded per-key state, one
    * shuffle, map-side pair expansion. Where the suffix array finds
    * the LONGEST shared substring, the k-gram index finds every qualifying
    * share — the same dedup decision at threshold k, embarrassingly
    * parallel, no global sort.
    *
    * Window selection (`anchored`, default true): hashing every stride-1
    * position is the exhaustive mode — |corpus characters| md5s, the whole
    * cost of this operator (profiled: the hash evaluation dominates, not
    * the shuffle). A BLIND stride s would be ~s× cheaper but silently
    * loses recall: windows in two documents only collide if the shared run
    * happens to start at the same position mod s in both, so unaligned
    * duplicates vanish. The sound reduction is CONTENT-DEFINED anchoring
    * (the idea behind winnowing — Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * and content-defined chunking): select window starts by a predicate of
    * the text itself, here word starts (position 1 or preceded by a
    * space), so two documents sharing a run select the SAME positions
    * inside the run regardless of where the run sits. Recall contract:
    * a shared run is detected iff it fully contains one anchored window —
    * guaranteed for runs of length ≥ k + g, where g is the run-start
    * offset of its first word start (for natural text, bounded by the
    * longest word + 1; pathological space-free data degrades to the
    * position-1 anchor, i.e. whole-doc prefix duplicates only — use
    * `anchored = false` for such corpora). ~6× fewer windows on
    * word-length-6 text, same asymptotic shape.
    *
    * Semantics: (id, window-hash) pairs are DISTINCT (a k-gram repeated
    * inside one doc counts once), so `n_shared` = number of distinct shared
    * anchored k-grams (≈ shared-span word count in anchored mode).
    * Documents shorter than k contribute their whole text as their single
    * position-1 "window" — two identical short docs still pair. Windows
    * seen by > maxDf docs are boilerplate (headers, licenses): they carry
    * no pair signal a rarer window wouldn't, but cost C(df,2) pairs — cut,
    * like the jaccard stop-shingles; windows in a single doc are cut too
    * (df ≥ 2), which jaccard cannot do (it needs per-doc sizes) but a pure
    * pair-finder can.
    *
    * Scale: the explode is |corpus characters| rows but only anchored ones
    * reach the hash; the index shuffles once on 8-byte keys — linear. At
    * 100 TB the remaining lever is per-partition suffix arrays; noted, not
    * needed at tested SFs.
    */
  def substringDupPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 48,
      maxDf: Int = 100,
      anchored: Boolean = true): DataFrame = {
    val n = length(col(textCol))
    // Anchored mode: the fused AnchoredWindowHashExpr kernel — one char
    // scan per document emitting the 8-byte window KEYS directly, so the
    // explode carries longs, never 48-char window strings, and the regex
    // form this replaced (lookbehind test + k-char capture alloc at every
    // position — 85% of this operator's runtime when profiled at sf0.1·8)
    // drops out of the plan entirely. Window-set semantics unchanged
    // (property-tested against the regex + md5PrefixLong composition): a
    // zero-width anchor at start-of-string or after a space, taking the
    // next exactly-k chars (anchors within k-1 of the end can't fill and
    // drop — the position formulation's `i <= n-k+1` bound); sub-k docs
    // take the whole text as their one window. The key is the first 8
    // BYTES of the md5; 64-bit collisions are negligible below ~2^32
    // distinct windows per corpus (a collision usually just ADDS a
    // spurious candidate pair; the one drop path — two real windows
    // merging past the maxDf cut — needs a collision between two
    // already-high-df windows, ~2^-64 each).
    val hashed =
      if (anchored)
        df.select(col(idCol),
          explode(HashExprs.anchoredWindowHashes(col(textCol), k)).as("h"))
      else
        df.select(col(idCol), col(textCol),
            explode(sequence(lit(1), greatest(n - (k - 1), lit(1)))).as("__i"))
          .select(col(idCol),
            HashExprs.md5PrefixLong(
              col(textCol).substr(col("__i"), lit(k)).cast("binary"), 16)
              .as("h"))
    // ONE keyed aggregation with BOUNDED state replaces the r3-r5
    // distinct → checkpoint → count → keep-join → postings chain (three
    // |windows|-mass exchanges + an eager materialization): the capped
    // posting aggregator collects at most maxDf+1 DISTINCT doc ids per
    // window hash and collapses to a constant-width overflow sentinel past
    // that, so a mega-hot k-gram (header/license boilerplate repeated in
    // millions of docs) crosses the exchange as ONE ≤(maxDf+1)-long
    // partial per map partition instead of a posting row per occurrence —
    // the df-cut applied DURING aggregation rather than after a counting
    // pass. Overflow is merge-order-free (a window overflows iff its true
    // distinct df exceeds the cap), so the final keep filter
    // (2 ≤ df ≤ maxDf) sees identical sets under any partitioning.
    val agg = udaf(cappedPostingAggregator(maxDf),
      org.apache.spark.sql.Encoders.scalaLong)
    val postings = hashed
      .groupBy(col("h")).agg(agg(col(idCol)).as("p"))
      .filter(!col("p.overflow") &&
        size(col("p.ids")).between(2, maxDf))
      .select(sort_array(col("p.ids")).as("ids"))
    postings
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_shared"))
  }

  /** Posting-list buffer with a hard distinct-id cap: `overflow` marks a
    * window whose true df exceeded the cap (its ids are dropped — it can
    * only be cut downstream, so carrying them is pure shuffle mass).
    */
  case class CappedPostingBuf(overflow: Boolean, ids: Array[Long])

  /** Typed max-(maxDf+1)-distinct-id collector. Linear containment scan
    * per input row is bounded at maxDf+1 longs (≈ 100) — cheaper than any
    * per-row hashing for lists this short.
    */
  def cappedPostingAggregator(maxDf: Int): org.apache.spark.sql.expressions
      .Aggregator[Long, CappedPostingBuf, CappedPostingBuf] =
    new org.apache.spark.sql.expressions
        .Aggregator[Long, CappedPostingBuf, CappedPostingBuf] {
      private val cap = maxDf + 1
      private val over = CappedPostingBuf(overflow = true,
        Array.emptyLongArray)
      def zero: CappedPostingBuf =
        CappedPostingBuf(overflow = false, Array.emptyLongArray)
      def reduce(b: CappedPostingBuf, id: Long): CappedPostingBuf =
        if (b.overflow || b.ids.contains(id)) b
        else if (b.ids.length >= cap) over
        else CappedPostingBuf(overflow = false, b.ids :+ id)
      def merge(a: CappedPostingBuf, c: CappedPostingBuf): CappedPostingBuf =
        if (a.overflow || c.overflow) over
        else c.ids.foldLeft(a)(reduce)
      def finish(b: CappedPostingBuf): CappedPostingBuf = b
      def bufferEncoder: org.apache.spark.sql.Encoder[CappedPostingBuf] =
        org.apache.spark.sql.Encoders.product[CappedPostingBuf]
      def outputEncoder: org.apache.spark.sql.Encoder[CappedPostingBuf] =
        org.apache.spark.sql.Encoders.product[CappedPostingBuf]
    }

  /** Incremental (batch-vs-corpus) dedup — the shape a continuously-
    * ingesting pipeline actually runs: dedup the NEW batch against the
    * already-accepted corpus without ever re-pairing the corpus with
    * itself. Two screens, both one-sided:
    *
    *  1. exact: md5 fingerprint of the text, incoming semi-joined against
    *     the corpus's distinct fingerprint set (16-byte keys; at 100 TB the
    *     corpus fingerprint table is the small, bucketable side);
    *  2. near: MinHash/LSH band keys — an incoming doc is a near-dup
    *     candidate if ANY of its band keys exists in the corpus's band-key
    *     set. Again a semi-join on (band, band_key): candidate generation
    *     cost scales with the incoming batch, not the corpus pair space.
    *
    * Returns one row per incoming doc: (id, dup_exact, dup_near, kept) —
    * `kept` = survives both screens. Flags are independent (an exact dup
    * is normally also a band match).
    */
  def incrementalDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      mod: Long = 10L,
      corpusBelow: Long = 8L): DataFrame = {
    val corpus = docs.filter(col(idCol) % mod < corpusBelow)
    val incoming = docs.filter(col(idCol) % mod >= corpusBelow)
    val fp = md5(col(textCol).cast("binary")).as("fp")
    val corpusFp = corpus.select(fp).distinct()
    val exactIds = incoming.select(col(idCol), fp)
      .join(corpusFp, Seq("fp"), "left_semi")
      .select(col(idCol)).distinct()
    val corpusBands = lshBands(minhashSignatures(corpus, idCol, textCol), idCol)
      .select("band", "band_key").distinct()
    val nearIds = lshBands(minhashSignatures(incoming, idCol, textCol), idCol)
      .join(corpusBands, Seq("band", "band_key"), "left_semi")
      .select(col(idCol)).distinct()
    incoming.select(col(idCol))
      .join(exactIds.withColumn("__e", lit(1)), Seq(idCol), "left_outer")
      .join(nearIds.withColumn("__n", lit(1)), Seq(idCol), "left_outer")
      .select(col(idCol),
        col("__e").isNotNull.as("dup_exact"),
        col("__n").isNotNull.as("dup_near"),
        (col("__e").isNull && col("__n").isNull).as("kept"))
  }

  /** Edit-distance similarity self-join: every unordered id pair whose
    * strings are within Levenshtein distance `tau`, with the exact distance.
    * Ed-Join-style candidate generation (Xiao, Wang, Lin — VLDB'08): padded
    * positional q-grams, a rarest-first prefix inverted index, and exact
    * verification — never an all-pairs join.
    *
    * Soundness chain (every filter prunes only provably-non-matching
    * pairs; the oracle brute-forces the distance predicate, so a missed
    * candidate is a correctness failure):
    *  - one edit operation rewrites at most q padded q-gram windows, so
    *    ed(x,y) <= tau implies |S_x \ S_y| <= q*tau over the DISTINCT gram
    *    sets (destroying a set element needs every occurrence destroyed);
    *    hence |S_x ∩ S_y| >= max(|S_x|,|S_y|) - q*tau  (count filter);
    *  - prefix filter: with all grams ranked rarest-first globally, any
    *    qualifying pair shares a gram within each side's first
    *    |S| - alpha + 1 <= q*tau + 1 grams — so indexing the first
    *    q*tau + 1 (a superset of the true prefix) keeps completeness;
    *  - length filter: ed >= |len_x - len_y|;
    *  - degenerate "short" strings with |S| <= q*tau (shorter than ~q*tau
    *    chars, or single-char runs) can match while sharing NO gram
    *    (alpha <= 0) — they bypass the index through a broadcast self-join
    *    over their (dictionary-scale, degenerate-class) distinct pool,
    *    guarded by the no-common-gram predicate so no pair is emitted by
    *    both paths.
    *
    * Scale: identical strings collapse to one super-node before any index
    * work (the filter cascade runs over DISTINCT strings; members re-expand
    * at output mass), the index shuffles once on gram keys, every candidate
    * is verified inline at its first-common-gram generation row (exactly-
    * once emission, no distinct over pair mass), and Levenshtein runs once
    * per distinct STRING pair, never per id pair.
    */
  /** Declared-deterministic Soundex-STYLE phonetic code of one token:
    * non-alphabetic characters (apostrophes, hyphens, digits) are
    * STRIPPED first — O'BRIEN and OBRIEN must share a block, which is
    * exactly the punctuated-name class the op targets — then first
    * letter + the first three consonant-class digits of the rest
    * (B/F/P/V→1, C/G/J/K/Q/S/X/Z→2, D/T→3, L→4, M/N→5, R→6; vowels and
    * Y/H/W are class 0, adjacent equal classes collapse, zeros drop,
    * zero-padded to 4; a token with no letters codes as "000").
    * DECLARED variant of American Soundex (H/W break runs here; the
    * first letter's own run is not merged) — a blocking key needs a
    * deterministic equivalence relation replayable in any engine, not
    * AMA compliance; every operation below is a mirrored string builtin
    * (upper/strip/translate/run-collapsing regexes with no
    * backreferences — RE2-safe).
    */
  def phoneticCode(token: Column): Column = {
    val up = regexp_replace(upper(token), "[^A-Z]", "")
    val mapped = translate(substring(up, 2, 1000000),
      "AEIOUYHWBFPVCGJKQSXZDTLMNR", "00000000111122222222334556")
    val collapsed = (0 to 6).foldLeft(mapped) { (c, d) =>
      regexp_replace(c, s"$d{2,}", d.toString)
    }
    concat(substring(up, 1, 1),
      rpad(substring(regexp_replace(collapsed, "0", ""), 1, 3), 3, "0"))
  }

  /** Phonetic BLOCKING for record linkage — the classic surname-Soundex
    * block (Newcombe, Science 1959; the standard cheap blocking key
    * beside this file's q-gram prefix / SNM / LSH families): names
    * sharing the LAST token's phonetic code become candidates, verified
    * by exact full-string Levenshtein ≤ `maxDist`. Catches the
    * sound-alike misspelling class character-q-gram prefixes rank poorly
    * (transcription variants move letters but keep the sound class).
    *
    * Scale shape: the corpus collapses to the DISTINCT-NAME dictionary
    * in one hash-agg (identical names never pair — exact dedup's job);
    * the block join runs at dictionary scale keyed on the code, and the
    * Levenshtein verify touches only same-code candidates. No corpus
    * self-join, no pair mass beyond the phonetic blocks.
    *
    * @return (code, name_a, name_b, n_a, n_b, lev) — one row per
    *         verified DISTINCT-name pair, n_* the corpus multiplicities.
    */
  def phoneticBlockPairs(
      df: DataFrame,
      nameCol: String,
      maxDist: Int = 2): DataFrame = {
    require(maxDist >= 1, s"maxDist >= 1, got $maxDist")
    val keyed = df.groupBy(col(nameCol).as("name"))
      .agg(count(lit(1)).as("n"))
      .withColumn("code",
        phoneticCode(element_at(split(col("name"), " "), -1)))
      .localCheckpoint(true) // both sides of the block join
    keyed.select(col("code"), col("name").as("name_a"), col("n").as("n_a"))
      .join(keyed.select(col("code"), col("name").as("name_b"),
        col("n").as("n_b")), Seq("code"))
      .filter(col("name_a") < col("name_b"))
      .withColumn("lev", levenshtein(col("name_a"), col("name_b")))
      .filter(col("lev") <= maxDist)
      .select(col("code"), col("name_a"), col("name_b"), col("n_a"),
        col("n_b"), col("lev"))
  }

  def editDistancePairs(
      df: DataFrame,
      idCol: String,
      strCol: String,
      tau: Int,
      q: Int = 2): DataFrame = {
    require(tau >= 1, s"tau must be >= 1, got $tau")
    require(q >= 2, s"q must be >= 2, got $q")
    val groups = df
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .na.drop(Seq("id", "s"))
      .groupBy(col("s"))
      .agg(min(col("id")).as("gid"), collect_list(col("id")).as("members"))
      .localCheckpoint(true)
    // distinct padded positional q-grams per distinct string; padding
    // (q-1 sentinel chars each side) gives every string — including the
    // empty one — at least one gram and makes the per-edit damage bound q
    val padded = concat(lit("\u0001" * (q - 1)), col("s"),
      lit("\u0002" * (q - 1)))
    val gsets = groups.select(col("gid"), col("s"),
      array_distinct(transform(
        sequence(lit(1), length(padded) - (q - 1)),
        i => padded.substr(i, lit(q)))).as("gs"))
    val tok = gsets.select(col("gid"), explode(col("gs")).as("g"))
    // dense integer gram ids ranked rarest-first: numeric order IS the
    // prefix-filter order; range-partitioned rank (same scaffold as
    // ppjoinPairs) keeps a billion-gram dictionary off a single task
    // checked int narrowing, same contract as ppjoinPairs' tid
    val (gDim, nGrams) = graft.sample.Samplers
      .globalRowNumberWithTotal(
        tok.groupBy(col("g")).agg(count(lit(1)).as("dfc")),
        Seq("dfc", "g"), rnCol = "tid")
    require(nGrams <= Int.MaxValue,
      s"edit-join gram dictionary has $nGrams entries — int tids would wrap")
    val dim = gDim.select(col("g"), col("tid").cast("int").as("tid"))
    val ordered = tok.join(dim, Seq("g"))
      .groupBy(col("gid"))
      .agg(sort_array(collect_list(col("tid"))).as("ts"))
      .join(gsets.select(col("gid"), col("s")), Seq("gid"))
      .withColumn("sz", size(col("ts")))
      .withColumn("len", length(col("s")))
      .localCheckpoint(true)
    // index the first q*tau+1 gram ids of EVERY string (shorts contribute
    // their whole set), carrying the full ordered array for inline
    // count-filter + exactly-once checks at pair expansion
    val postings = ordered
      .select(col("gid"), col("s"), col("sz"), col("len"), col("ts"),
        explode(slice(col("ts"), 1, q * tau + 1)).as("tid"))
      .groupBy(col("tid"))
      .agg(collect_list(
        struct(col("gid"), col("s"), col("sz"), col("len"), col("ts")))
        .as("es"))
    val viaIndex = postings
      .select(col("tid"), explode(col("es")).as("a"), col("es"))
      .select(col("tid"), col("a"), explode(col("es")).as("b"))
      .filter(col("a.gid") < col("b.gid"))
      .filter(abs(col("a.len") - col("b.len")) <= tau)
      .withColumn("ia", array_intersect(col("a.ts"), col("b.ts")))
      .filter(size(col("ia")) >=
        greatest(col("a.sz"), col("b.sz")) - q * tau)
      // exactly-once: only the pair's rarest common gram emits
      .filter(col("tid") === array_min(col("ia")))
      .select(col("a.gid").as("gid_a"), col("b.gid").as("gid_b"),
        col("a.s").as("sa"), col("b.s").as("sb"))
    // degenerate pool: |S| <= q*tau strings may match with zero shared
    // grams; dictionary-scale by construction (essentially strings shorter
    // than ~q*tau chars) → broadcast self-join, disjoint from the index
    // path via the no-common-gram guard
    val shorts = ordered.filter(col("sz") <= q * tau)
      .select(col("gid"), col("s"), col("len"), col("ts"))
    val viaShort = shorts.as("a")
      .join(broadcast(shorts.as("b")),
        col("a.gid") < col("b.gid") &&
          abs(col("a.len") - col("b.len")) <= tau &&
          size(array_intersect(col("a.ts"), col("b.ts"))) === 0)
      .select(col("a.gid").as("gid_a"), col("b.gid").as("gid_b"),
        col("a.s").as("sa"), col("b.s").as("sb"))
    val verified = viaIndex.unionByName(viaShort)
      .withColumn("dist", levenshtein(col("sa"), col("sb")))
      .filter(col("dist") <= tau)
      .select(col("gid_a"), col("gid_b"), col("dist"))
    // within a group every pair is the same string (distance 0): folded in
    // as verified SELF-pairs so the member expansion below is ONE fused
    // pipeline. Profiled: a Union placed above the pair-mass expansion
    // breaks whole-stage codegen fusion at the union boundary, and the
    // per-row copy tax dominated the whole operator at 8× (60 s → 2 s
    // when the union moved to the dictionary-scale verified table).
    val selfPairs = groups.filter(size(col("members")) > 1)
      .select(col("gid").as("gid_a"), col("gid").as("gid_b"),
        lit(0).as("dist"))
    // expansion at output mass: for cross pairs each (ia, ib) combination
    // appears exactly once (disjoint member lists) and least/greatest
    // canonicalizes; for self pairs ia < ib keeps each unordered pair once
    verified.unionByName(selfPairs)
      .join(groups.select(col("gid").as("gid_a"), col("members").as("ma")),
        Seq("gid_a"))
      .join(groups.select(col("gid").as("gid_b"), col("members").as("mb")),
        Seq("gid_b"))
      .select(col("gid_a"), col("gid_b"), col("dist"),
        explode(col("ma")).as("ia"), col("mb"))
      .select(col("gid_a"), col("gid_b"), col("dist"), col("ia"),
        explode(col("mb")).as("ib"))
      .filter(col("gid_a") =!= col("gid_b") || col("ia") < col("ib"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("dist"))
  }

  /** How much extra duplication does normalization expose? One row:
    * total docs, raw exact-dup count (docs beyond the first per identical
    * byte string), normalized-dup count (same, over
    * [[TextAnalysis.normalizeText]]), and the gain (distinct texts that
    * collapse together only after normalization). The standard
    * before/after diagnostic run when choosing a dedup canonical form.
    *
    * Scale: one scan; both distincts are over 16-byte md5 fingerprints,
    * never full documents, so the multi-distinct Expand doubles only a
    * 16-byte column, not the corpus.
    */
  def normalizationGain(df: DataFrame, textCol: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col(textCol).cast("binary"))).as("__raw"),
      countDistinct(md5(TextAnalysis.normalizeText(col(textCol))
        .cast("binary"))).as("__norm"))
      .select(col("n_docs"),
        (col("n_docs") - col("__raw")).as("n_raw_dups"),
        (col("n_docs") - col("__norm")).as("n_norm_dups"),
        (col("__raw") - col("__norm")).as("gain"))

  /** Fellegi-Sunter record-linkage field weights (Fellegi & Sunter, JASA
    * 1969) — the principled scoring layer on top of the blocking
    * generators ([[snmPairs]]/[[ppjoinPairs]]): per comparison field i,
    * m_i = P(agree | match) and u_i = P(agree | non-match), estimated
    * from a labeled candidate-pair relation with add-1/add-2 Laplace
    * smoothing (so no weight is ever ±∞ and every ln sees a ratio of
    * exact positive integers). Agreement weight w_a = ln(m/u), disagree
    * w_d = ln((1−m)/(1−u)) — high-discrimination fields (brand) earn
    * large |w|, noisy fields small.
    *
    * Scale shape: ONE conditional hash-agg over the pair relation →
    * a |fields|-row output. No join, no window.
    *
    * @param pairs  candidate pairs carrying boolean agreement columns
    * @param fields agreement column names
    * @param goldCol boolean ground-truth match column
    * @return per field: (field, n_match, n_unmatch, agree_match,
    *         agree_unmatch, m, u, w_agree, w_disagree), rounded 6
    */
  /** The shared conditional hash-agg both FS entry points fold over: one
    * row of (match/non-match totals, per-field agreement counts) — the
    * sufficient statistics of the model. Extracted round 9 so
    * [[fellegiSunterScore]] stops re-aggregating what
    * [[fellegiSunterWeights]] already computes.
    */
  private def fsStats(
      pairs: DataFrame,
      fields: Seq[String],
      goldCol: String): DataFrame = {
    require(fields.nonEmpty, "no comparison fields")
    val aggs =
      Seq(sum(when(col(goldCol), 1L).otherwise(0L)).as("__nm"),
        sum(when(!col(goldCol), 1L).otherwise(0L)).as("__nu")) ++
        fields.flatMap { f => Seq(
          sum(when(col(goldCol) && col(f), 1L).otherwise(0L)).as(s"__am_$f"),
          sum(when(!col(goldCol) && col(f), 1L).otherwise(0L)).as(s"__au_$f"))
        }
    pairs.agg(aggs.head, aggs.tail: _*)
  }

  /** The add-1/add-2 smoothed (m, u, 1−m, 1−u) ratio columns for field
    * `f` over an [[fsStats]] row — every ln argument a ratio of exact
    * positive integers.
    */
  private def fsRatios(f: String): (Column, Column, Column, Column) = (
    (col(s"__am_$f") + 1).cast("double") / (col("__nm") + 2),
    (col(s"__au_$f") + 1).cast("double") / (col("__nu") + 2),
    (col("__nm") - col(s"__am_$f") + 1).cast("double") / (col("__nm") + 2),
    (col("__nu") - col(s"__au_$f") + 1).cast("double") / (col("__nu") + 2))

  def fellegiSunterWeights(
      pairs: DataFrame,
      fields: Seq[String],
      goldCol: String): DataFrame = {
    val stats = fsStats(pairs, fields, goldCol)
    fields.map { f =>
      val (m, u, md, ud) = fsRatios(f)
      stats.select(lit(f).as("field"),
        col("__nm").as("n_match"), col("__nu").as("n_unmatch"),
        col(s"__am_$f").as("agree_match"),
        col(s"__au_$f").as("agree_unmatch"),
        round(m, 6).as("m"), round(u, 6).as("u"),
        round(log(m / u), 6).as("w_agree"),
        round(log(md / ud), 6).as("w_disagree"))
    }.reduce(_ unionByName _)
  }

  /** [[fellegiSunterWeights]] applied back to the pair relation: every
    * pair scores Σ_i (agrees_i ? w_agree_i : w_disagree_i); decision =
    * score > 0 (the λ=0 threshold; callers tune by filtering on score).
    * The 1-row stats frame broadcasts — the pair stream is touched
    * exactly twice (weight estimation, scoring), both as linear scans.
    *
    * @return pairs + (score, decision) — score rounded 6 AFTER summing
    *         the unrounded per-field lns (one fixed-shape double
    *         expression, SQL-replayable).
    */
  def fellegiSunterScore(
      pairs: DataFrame,
      fields: Seq[String],
      goldCol: String): DataFrame = {
    val stats = fsStats(pairs, fields, goldCol)
    val score = fields.map { f =>
      val (m, u, md, ud) = fsRatios(f)
      when(col(f), log(m / u)).otherwise(log(md / ud))
    }.reduce(_ + _)
    pairs.crossJoin(broadcast(stats))
      .withColumn("score", round(score, 6))
      .withColumn("decision", score > 0.0)
      .drop(Seq("__nm", "__nu") ++
        fields.flatMap(f => Seq(s"__am_$f", s"__au_$f")): _*)
  }

  /** Golden-record survivorship — the merge step AFTER entity resolution:
    * given records carrying a duplicate-cluster id (from
    * [[duplicateClusters]] / [[connectedComponentsStar]] or any blocking +
    * linkage decision), pick each FIELD's surviving value per cluster.
    * [[dedupKeepBest]] keeps one whole ROW; survivorship composes the
    * golden record field-by-field — the MDM standard when no single
    * source row is complete.
    *
    * Rules (engine-deterministic, NULLs never survive when any non-null
    * exists): "mode" = most frequent value, ties → lexicographically
    * SMALLEST (min over (−count, value)); "longest" = longest value,
    * ties → lexicographically LARGEST (max over (length, value)). Values
    * compare as strings (field picks are attribute-level; row-level
    * recency selection is [[dedupKeepBest]]'s job).
    *
    * Scale shape: ONE corpus scan explodes all declared fields into
    * (cluster, field, value) cells — the fdCounts discipline — one
    * hash-agg to the cell dictionary, one pick agg, one cluster-keyed
    * join for member counts (the second and last scan). Long output —
    * one row per (cluster, field) — keeps the schema static.
    *
    * @param rules (field, "mode" | "longest") per surviving attribute
    * @return (cluster, n_members, field, rule, survivor); survivor NULL
    *         only when the field is NULL across the whole cluster (the
    *         (cluster, field) row is then absent)
    */
  /** Blocking-quality evaluation (Christen's pair completeness /
    * reduction ratio) — the two numbers that justify ANY blocking scheme
    * before a 100 TB linkage run: PC = recalled fraction of true-match
    * pairs (what the blocker loses forever), RR = fraction of the n(n−1)/2
    * comparison space pruned (what the blocker saves). The ER-side
    * analog of [[minhashAccuracy]].
    *
    * Inputs are pair RELATIONS (id_a, id_b) from any generator
    * ([[snmPairs]], [[ppjoinPairs]], a key-equality join); both are
    * normalized to unordered distinct pairs here, so double-emitted or
    * swapped candidates cannot inflate PC or deflate RR. The record count
    * enters as a 1-row aggregate of `records` — no driver-side action.
    *
    * Scale: two distinct-aggs on pair keys + one pair-keyed equi-join;
    * the comparison-space denominator is DECIMAL(38,0) (n(n−1)/2
    * overflows a long past ~4.3e9 records).
    *
    * @return ONE row: (n_records, n_cand, n_gold, n_hit,
    *         pair_completeness, reduction_ratio) — both rates round 6
    */
  /** LSH configuration advisor: the expected recall of a (bands, rows)
    * MinHash-LSH config ON THIS CORPUS's observed near-dup pair
    * population — the number that picks b/r before a 100 TB dedup run.
    * For a pair with Jaccard s, the classic detection probability is
    * P(s) = 1 − (1 − s^rows)^bands; folding it over the exact pair
    * similarities ([[ngramJaccardPairs]]' relation) per similarity decile
    * shows WHERE the S-curve loses pairs (the textbook curve alone says
    * nothing about how much mass sits in the miss region).
    *
    * Determinism: s enters pre-rounded to 6 decimals (the pair relation's
    * emitted value); P(s) is one mirrored fixed-order double per pair,
    * summed as DECIMAL(38,12) (the assocPanel rule).
    *
    * @param pairs (…, jaccard) — a near-dup pair relation with exact
    *              similarities (already thresholded by its generator;
    *              this estimates recall of the ≥ threshold population)
    * @return per decile bucket: (bucket — floor(s·10), n_pairs,
    *         expected_detected, expected_recall — round 6)
    */
  def lshRecallEstimate(
      pairs: DataFrame,
      bands: Int,
      rows: Int): DataFrame = {
    require(bands >= 1 && rows >= 1, s"bad config ($bands, $rows)")
    val s = round(col("jaccard"), 6)
    val p = lit(1.0) - pow(lit(1.0) - pow(s, rows), bands)
    pairs
      .select(floor(s * 10).cast("long").as("bucket"),
        p.cast("decimal(38,12)").as("__p"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("__p")).as("__sp"))
      .select(col("bucket"), col("n_pairs"),
        round(col("__sp").cast("double"), 6).as("expected_detected"),
        round(col("__sp").cast("double") / col("n_pairs").cast("double"),
          6).as("expected_recall"))
  }

  /** B-cubed clustering evaluation (Bagga & Baldwin, LREC 1998; Amigó et
    * al., IR 2009) — the per-ITEM precision/recall grading a final
    * entity-resolution / dedup clustering against a gold partition.
    * [[blockingQuality]] grades the CANDIDATE stage (pair completeness /
    * reduction ratio); B³ grades the produced clusters, weighting items
    * rather than pairs — the Amigó axioms' pick, robust to the size skew
    * where pairwise-F is quadratically owned by the biggest cluster.
    *
    * Per item i: P(i) = |pred(i) ∩ gold(i)|/|pred(i)|, averaged — which
    * collapses to Σ_cells n²/|pred| over the (pred, gold) contingency
    * table; recall mirrors over |gold|; F1 harmonic on the unrounded
    * means. Cell counts and marginals are exact longs/decimals; the only
    * floats are one fixed-shape ratio per dictionary cell and the final
    * mirrored means, rounded 6.
    *
    * Scale shape: ONE corpus hash-agg to the (pred, gold) contingency
    * dictionary; both marginal folds and the ratio sums run on it —
    * corpus mass never reaches a pair join or a window. NULL labels are
    * ordinary labels (sentinel-keyed so the marginal joins keep them).
    *
    * @return one row: (n_items, n_pred_clusters, n_gold_classes,
    *         precision, recall, f1) — rounded 6
    */
  def bCubed(
      df: DataFrame,
      idCol: String,
      predCol: String,
      goldCol: String): DataFrame = {
    def key(c: Column): Column =
      coalesce(c.cast("string"), lit("\u0002N"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    val cells = df
      .select(key(col(predCol)).as("__p"), key(col(goldCol)).as("__g"))
      .groupBy(col("__p"), col("__g"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // dictionary-scale; feeds both marginal folds
    val pSide = cells.groupBy(col("__p"))
      .agg(sum(col("__n")).as("__np"),
        sum(d(col("__n")) * d(col("__n"))).as("__sp"))
      .agg(count(lit(1)).as("n_pred_clusters"),
        sum(col("__np")).as("__nitems"),
        sum(col("__sp").cast("double") / col("__np").cast("double"))
          .as("__psum"))
    val gSide = cells.groupBy(col("__g"))
      .agg(sum(col("__n")).as("__ng"),
        sum(d(col("__n")) * d(col("__n"))).as("__sg"))
      .agg(count(lit(1)).as("n_gold_classes"),
        sum(col("__sg").cast("double") / col("__ng").cast("double"))
          .as("__rsum"))
    val nd = col("__nitems").cast("double")
    val p = col("__psum") / nd
    val r = col("__rsum") / nd
    pSide.crossJoin(broadcast(gSide))
      .select(col("__nitems").as("n_items"), col("n_pred_clusters"),
        col("n_gold_classes"),
        round(p, 6).as("precision"), round(r, 6).as("recall"),
        when(p + r > 0.0, round(lit(2.0) * p * r / (p + r), 6)).as("f1"))
  }

  /** Adjusted Rand Index (Hubert & Arabie 1985) — [[bCubed]]'s
    * pair-counting sibling: B³ grades per ITEM, ARI grades per PAIR
    * (all-in-same-cluster agreement), chance-corrected so random
    * clusterings score ~0 whatever the cluster-size profile — the
    * standard second axis of a clustering-eval report (a method can
    * look good on one and bad on the other; report both).
    *
    * Exact scheme: the pair counts S_ij = Σ C(n_ij, 2), S_a, S_b and
    * T = C(n, 2) are exact DECIMAL(38,0) from the same (pred, gold)
    * contingency hash-agg B³ uses (they travel as strings);
    * ARI = (2·T·S_ij − 2·S_a·S_b) / (T·(S_a+S_b) − 2·S_a·S_b) — that
    * cross-multiplication can exceed DECIMAL(38) at extreme corpus
    * sizes (T² ≈ 10⁵⁰ at 10¹³ rows), so the FINAL ratio computes in
    * doubles over the exact inputs, fixed-shape mirrored, rounded 6 —
    * the one declared float step. NULL when the denominator is 0 (both
    * partitions degenerate, max = expected).
    *
    * Scale shape: identical to [[bCubed]] — ONE corpus hash-agg to the
    * contingency dictionary, marginal folds on it, nothing pair-scale
    * ever materializes (the "pair counting" is algebra, not pairs).
    */
  def adjustedRandIndex(
      df: DataFrame,
      idCol: String,
      predCol: String,
      goldCol: String): DataFrame = {
    def key(c: Column): Column =
      coalesce(c.cast("string"), lit("\u0002N"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    def c2(c: Column): Column =
      (d(c) * (d(c) - 1) / 2).cast("decimal(38,0)")
    val cells = df
      .select(key(col(predCol)).as("__p"), key(col(goldCol)).as("__g"))
      .groupBy(col("__p"), col("__g"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(true) // feeds S_ij + both marginal folds
    val sij = cells.agg(sum(col("__n")).as("n_items"),
      sum(c2(col("__n"))).as("__sij"))
    val sa = cells.groupBy(col("__p")).agg(sum(col("__n")).as("__a"))
      .agg(count(lit(1)).as("n_pred_clusters"), sum(c2(col("__a"))).as("__sa"))
    val sb = cells.groupBy(col("__g")).agg(sum(col("__n")).as("__b"))
      .agg(count(lit(1)).as("n_gold_classes"), sum(c2(col("__b"))).as("__sb"))
    val dd = (c: Column) => c.cast("double")
    val joined = sij.crossJoin(broadcast(sa)).crossJoin(broadcast(sb))
      .withColumn("__t", c2(col("n_items")))
    val num = lit(2.0) * dd(col("__t")) * dd(col("__sij")) -
      lit(2.0) * dd(col("__sa")) * dd(col("__sb"))
    val den = dd(col("__t")) * (dd(col("__sa")) + dd(col("__sb"))) -
      lit(2.0) * dd(col("__sa")) * dd(col("__sb"))
    joined.select(col("n_items"), col("n_pred_clusters"),
      col("n_gold_classes"),
      col("__sij").cast("string").as("s_pairs_both"),
      col("__sa").cast("string").as("s_pairs_pred"),
      col("__sb").cast("string").as("s_pairs_gold"),
      when(den =!= 0.0, round(num / den, 6)).as("ari"))
  }

  def blockingQuality(
      candidates: DataFrame,
      gold: DataFrame,
      records: DataFrame): DataFrame = {
    def norm(df: DataFrame): DataFrame = df.select(
        least(col("id_a"), col("id_b")).as("__i"),
        greatest(col("id_a"), col("id_b")).as("__j"))
      .filter(col("__i") =!= col("__j"))
      .distinct()
      .localCheckpoint(true) // feeds its count AND the hit join
    val c = norm(candidates)
    val g = norm(gold)
    val hits = c.join(g, Seq("__i", "__j"))
      .agg(count(lit(1)).as("n_hit"))
    val counts = c.agg(count(lit(1)).as("n_cand"))
      .crossJoin(g.agg(count(lit(1)).as("n_gold")))
      .crossJoin(records.agg(count(lit(1)).as("n_records")))
    val d = (cc: Column) => cc.cast("decimal(38,0)")
    val space = d(col("n_records")) * (d(col("n_records")) - 1) / 2
    counts.crossJoin(broadcast(hits))
      .select(col("n_records"), col("n_cand"), col("n_gold"),
        col("n_hit"),
        when(col("n_gold") > 0,
          round(col("n_hit").cast("double") /
            col("n_gold").cast("double"), 6)).as("pair_completeness"),
        when(col("n_records") > 1,
          round(lit(1.0) - col("n_cand").cast("double") /
            space.cast("double"), 6)).as("reduction_ratio"))
  }

  def survivorship(
      df: DataFrame,
      clusterCol: String,
      rules: Seq[(String, String)]): DataFrame = {
    require(rules.nonEmpty, "no survivorship rules given")
    require(rules.forall(r => r._2 == "mode" || r._2 == "longest"),
      s"unknown rule in $rules")
    val cells = df.select(col(clusterCol).as("cluster"),
        explode(array(rules.map { case (f, rule) =>
          struct(lit(f).as("field"), lit(rule).as("rule"),
            col(f).cast("string").as("v"))
        }: _*)).as("s"))
      .select(col("cluster"), col("s.field").as("field"),
        col("s.rule").as("rule"), col("s.v").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("cluster"), col("field"), col("rule"), col("v"))
      .agg(count(lit(1)).as("__c"))
    val members = df.groupBy(col(clusterCol).as("cluster"))
      .agg(count(lit(1)).as("n_members"))
    cells.groupBy(col("cluster"), col("field"), col("rule"))
      .agg(
        min(when(col("rule") === "mode",
          struct((-col("__c")).as("__nc"), col("v")))).as("__pm"),
        max(when(col("rule") === "longest",
          struct(length(col("v")).as("__len"), col("v")))).as("__pl"))
      .select(col("cluster"), col("field"), col("rule"),
        when(col("rule") === "mode", col("__pm.v"))
          .otherwise(col("__pl.v")).as("survivor"))
      .join(members, Seq("cluster"))
      .select(col("cluster"), col("n_members"), col("field"),
        col("rule"), col("survivor"))
  }
}

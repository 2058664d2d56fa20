package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators over `documents` — the training-data-pipeline
  * surface (north star; absent from the reference, which never touches
  * strings beyond CSV parsing). Everything here is built from codegen'd
  * built-ins (split / higher-order filter / regexp_* / explode): no UDFs,
  * so every expression stays inside WholeStageCodegen and the only
  * shuffles are the final grouped aggregations.
  *
  * Cross-engine determinism: token counts and regexp match counts are
  * integers; ratio/score arithmetic is written with the identical
  * expression tree on both sides (per-row IEEE doubles are bit-equal),
  * rounded to 6 digits only at the end.
  *
  * Scale: per-document work is embarrassingly parallel (narrow,
  * partition-local); the grouped profiles shuffle one row per group. The
  * token histogram is the only explode — its shuffle is (token, partial
  * count) pairs after map-side combine, not raw tokens.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String) = Tables.documents(s, dir)

  /** Stopword list used by quality scoring + language ID. */
  private val Stops = Seq("the", "a", "of", "and", "is")
  private val stopsSql = Stops.map(s => s"'$s'").mkString(", ")

  private def toks: Column = split(col("text"), " ")
  private def nTok: Column = size(toks).cast("long")

  private def countIn(words: Seq[String]): Column =
    size(filter(toks, x => x.isin(words: _*))).cast("long")

  // BPE-ish pre-tokenizer: runs of letters, runs of digits, or a single
  // non-alphanumeric non-space symbol — the classic byte-pair-encoding
  // pre-split shape.
  private val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** The t3 quality score, exposed for reuse (cur7's percentile cut uses
    * the identical expression so the two operators can never drift). */
  def qualityCol: Column = round(
    lit(0.5) * least(nTok.cast("double") / lit(100.0), lit(1.0))
      + lit(0.3) * (countIn(Stops).cast("double") / nTok.cast("double"))
      + lit(0.2) * (lit(1.0) -
        regexp_count(col("text"), lit("[^a-z0-9 ]")).cast("double") /
          length(col("text")).cast("double")), 6).cast("double")

  /** DuckDB form of [[qualityCol]] (same expression tree, same rounding). */
  val qualitySql: String =
    s"""CAST(round(
       |  0.5 * least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
       |+ 0.3 * (CAST(len(list_filter(string_split(text, ' '),
       |              x -> x IN ($stopsSql))) AS DOUBLE)
       |         / CAST(len(string_split(text, ' ')) AS DOUBLE))
       |+ 0.2 * (1.0 - CAST(len(regexp_extract_all(text, '[^a-z0-9 ]')) AS DOUBLE)
       |               / CAST(length(text) AS DOUBLE)), 6) AS DOUBLE)""".stripMargin

  /** Fixed probe vocabulary for the CMS heavy-hitter estimates.
    * (Declared before `defs`: t9b's oracle SQL interpolates it at
    * object-init time.) */
  val CmsProbes: Seq[String] =
    Seq("table", "the", "data", "spark", "join", "window", "batch",
      "customer", "vector", "zzz_absent")

  /** t11 edit-distance knobs (declared before `defs` — interpolated into
    * the oracle SQL): blocking-prefix length over the canonicalized text,
    * block-size cap (a hot prefix is the blocking analog of a stopword
    * shingle — its pairs are the quadratic bomb, and a prefix shared by
    * hundreds of documents carries no identity signal), and the maximum
    * edit distance reported. */
  val EditPrefix = 12
  val EditBlockCap = 64
  val EditMax = 10

  /** t13 collocation knobs (declared before `defs` — interpolated into
    * the oracle SQL): minimum pair count (below it PMI is rank noise)
    * and the integer PMI quantum. Ranking by c_xy/(c_x·c_y) is
    * rank-equivalent to PMI = log(N·c_xy/(c_x·c_y)) — log is monotone
    * and the corpus size N is constant across pairs — so the score can
    * stay an exact integer ratio and the top-k is hash-checkable with no
    * float log anywhere. */
  val PmiMinCount = 5
  val PmiQ = 1000000000000L
  val PmiTopK = 50

  /** t14 scrub patterns — ASCII word boundaries and bounded quantifiers
    * only, so Java regex (Spark) and RE2 (DuckDB) agree exactly. */
  private val EmailRe = """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"""
  private val IpRe = """\b\d{1,3}(\.\d{1,3}){3}\b"""
  private val PhoneRe = """\b\d{3}-\d{3}-\d{4}\b"""

  val defs: Seq[QueryDef] = Seq(
    // T14: PII redaction — the scrub step every training-data release
    // pipeline runs. Positives are PLANTED deterministically from doc_id
    // (identical construction in both engines: emails on ≡0 mod 7, IPv4
    // on ≡0 mod 11, phone numbers on ≡0 mod 13), so the kernel is
    // certified on real matches, not just no-ops. Output is per-doc:
    // match counts + md5 of the fully redacted text — content-exact
    // through the hash gate. Spark side uses the Column API (regex passed
    // as a raw value, never through SQL-literal escaping); DuckDB's
    // regexp_replace needs the explicit 'g' flag to match Spark's
    // replace-all default.
    QueryDef("t14_pii_redaction",
      s"""WITH aug AS (
        |  SELECT doc_id,
        |         text ||
        |         CASE WHEN doc_id % 7 = 0 THEN ' mail user' || doc_id || '@ex' || (doc_id % 10) || '.com' ELSE '' END ||
        |         CASE WHEN doc_id % 11 = 0 THEN ' host 10.4.' || (doc_id % 250) || '.' || ((doc_id // 250) % 250) ELSE '' END ||
        |         CASE WHEN doc_id % 13 = 0 THEN ' call 555-' || (100 + doc_id % 900) || '-' || (1000 + doc_id % 9000) ELSE '' END AS t
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_email,
        |       CAST(len(regexp_extract_all(t, '$IpRe')) AS BIGINT) AS n_ip,
        |       CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phone,
        |       md5(regexp_replace(regexp_replace(regexp_replace(t,
        |           '$EmailRe', '<EMAIL>', 'g'), '$IpRe', '<IP>', 'g'),
        |           '$PhoneRe', '<PHONE>', 'g')) AS red_md5
        |FROM aug ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val aug = docs(s, dir).select(col("doc_id"), concat(
        col("text"),
        when(col("doc_id") % 7 === 0, concat(lit(" mail user"),
          col("doc_id").cast("string"), lit("@ex"),
          (col("doc_id") % 10).cast("string"), lit(".com"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0, concat(lit(" host 10.4."),
          (col("doc_id") % 250).cast("string"), lit("."),
          (expr("doc_id div 250") % 250).cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 13 === 0, concat(lit(" call 555-"),
          (lit(100) + col("doc_id") % 900).cast("string"), lit("-"),
          (lit(1000) + col("doc_id") % 9000).cast("string"))).otherwise(lit(""))
      ).as("t"))
      val red = regexp_replace(regexp_replace(regexp_replace(col("t"),
        EmailRe, "<EMAIL>"), IpRe, "<IP>"), PhoneRe, "<PHONE>")
      aug.select(col("doc_id"),
        size(regexp_extract_all(col("t"), lit(EmailRe), lit(0))).cast("long").as("n_email"),
        size(regexp_extract_all(col("t"), lit(IpRe), lit(0))).cast("long").as("n_ip"),
        size(regexp_extract_all(col("t"), lit(PhoneRe), lit(0))).cast("long").as("n_phone"),
        md5(red.cast("binary")).as("red_md5"))
        .orderBy("doc_id")
    },

    // T1: per-language corpus profile.
    QueryDef("t1_lang_profile",
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_toks,
        |       min(n_chars) AS min_chars, max(n_chars) AS max_chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum("n_chars").as("sum_chars"),
          sum(nTok).as("sum_toks"),
          min("n_chars").as("min_chars"),
          max("n_chars").as("max_chars"))
        .orderBy("lang")
    },

    // T2: per-document token counting — whitespace tokens and a BPE-ish
    // regex pre-tokenization count.
    QueryDef("t2_token_stats",
      s"""SELECT doc_id,
        |       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |       CAST(len(regexp_extract_all(text, '$BpePattern')) AS BIGINT) AS n_bpe_tokens,
        |       CAST(length(text) AS BIGINT) AS len_chars
        |FROM documents ORDER BY doc_id LIMIT 2000""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          nTok.as("n_ws_tokens"),
          regexp_count(col("text"), lit(BpePattern)).cast("long").as("n_bpe_tokens"),
          length(col("text")).cast("long").as("len_chars"))
        .orderBy("doc_id").limit(2000)
    },

    // T3: quality scoring — length score, stopword ratio, punctuation
    // ratio, combined into one filterable score (the standard pre-training
    // corpus-cleaning gate).
    QueryDef("t3_quality_score",
      s"""SELECT doc_id,
        |       $qualitySql AS quality,
        |       (len(string_split(text, ' ')) >= 20) AS len_ok
        |FROM documents ORDER BY doc_id LIMIT 2000""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          qualityCol.as("quality"),
          (nTok >= 20).as("len_ok"))
        .orderBy("doc_id").limit(2000)
    },

    // T4: marker-token language ID (n-gram-heuristic family) emitted as a
    // lang × predicted confusion matrix. The argmax tie-break is a pinned
    // CASE chain so both engines choose identically.
    QueryDef("t4_langid_confusion",
      """WITH scored AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text,' '), x -> x IN ('the','and','is'))) AS s_en,
        |    len(list_filter(string_split(text,' '), x -> x IN ('el','la','que'))) AS s_es,
        |    len(list_filter(string_split(text,' '), x -> x IN ('der','und','die'))) AS s_de,
        |    len(list_filter(string_split(text,' '), x -> x IN ('le','les','des'))) AS s_fr
        |  FROM documents)
        |SELECT lang,
        |       CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr THEN 'en'
        |            WHEN s_es >= s_de AND s_es >= s_fr THEN 'es'
        |            WHEN s_de >= s_fr THEN 'de'
        |            ELSE 'fr' END AS predicted,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM scored GROUP BY 1, 2 ORDER BY lang, predicted""".stripMargin) { (s, dir) =>
      val sEn = countIn(Seq("the", "and", "is"))
      val sEs = countIn(Seq("el", "la", "que"))
      val sDe = countIn(Seq("der", "und", "die"))
      val sFr = countIn(Seq("le", "les", "des"))
      docs(s, dir)
        .select(col("lang"),
          when(sEn >= sEs && sEn >= sDe && sEn >= sFr, "en")
            .when(sEs >= sDe && sEs >= sFr, "es")
            .when(sDe >= sFr, "de")
            .otherwise("fr").as("predicted"))
        .groupBy("lang", "predicted")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "predicted")
    },

    // T5: document fingerprints — order-insensitive token-bag hash (md5 of
    // the sorted distinct token list) plus the raw content hash; the pair
    // distinguishes reorderings from verbatim copies.
    QueryDef("t5_fingerprint",
      """SELECT doc_id,
        |       md5(text) AS content_fp,
        |       md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bag_fp
        |FROM documents ORDER BY doc_id LIMIT 2000""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"),
          md5(col("text").cast("binary")).as("content_fp"),
          md5(concat_ws(" ", array_sort(array_distinct(toks))).cast("binary")).as("bag_fp"))
        .orderBy("doc_id").limit(2000)
    },

    // T7: winnowing fingerprints (the MOSS scheme): hash every 8-char
    // k-gram, take the minimum hash in each sliding window of 4, keep the
    // distinct minima. Robust local fingerprints for plagiarism/overlap
    // detection — guaranteed to share fingerprints with any document that
    // shares a sufficiently long substring. Emitted as per-doc fingerprint
    // profile (count + extremes) for compact verification.
    QueryDef("t7_winnowing",
      """WITH h AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, length(text) - 7),
        |                        i -> md5(substr(text, i, 8))) AS hs
        |  FROM documents WHERE length(text) >= 11),
        |f AS (
        |  SELECT doc_id,
        |         list_transform(generate_series(1, len(hs) - 3),
        |                        j -> list_min(hs[j:j+3])) AS fps
        |  FROM h)
        |SELECT doc_id, CAST(len(list_distinct(fps)) AS BIGINT) AS n_fps,
        |       list_min(fps) AS min_fp, list_aggregate(fps, 'max') AS max_fp
        |FROM f ORDER BY doc_id LIMIT 2000""".stripMargin) { (s, dir) =>
      docs(s, dir)
        // the result is ORDER BY doc_id LIMIT 2000, so only the 2000
        // smallest doc_ids can survive — take them FIRST (cheap: narrow
        // TakeOrdered on (doc_id, text)) and winnow only those, instead of
        // md5-ing every k-gram of the whole corpus and discarding most of
        // it. The repartition after the limit re-spreads the survivors so
        // the per-gram hashing still uses every core.
        .select(col("doc_id"), col("text"))
        .filter(length(col("text")) >= 11) // filter FIRST: the limit is over the filtered set
        .orderBy("doc_id").limit(2000)
        // EXPLICIT partition count: repartition(col) alone is an AQE-
        // coalescable shuffle, and 2000 docs are only ~1 MB — AQE merges
        // them onto 1-2 partitions and the per-gram hashing (CPU-bound,
        // not byte-bound) serializes. Pinning the count keeps every core
        // busy; "cheap bytes, expensive rows" defeats byte-based
        // coalescing heuristics.
        .repartition(64, col("doc_id"))
        .withColumn("hs",
          expr("transform(sequence(1, length(text) - 7), i -> md5(substring(text, i, 8)))"))
        .withColumn("fps",
          expr("transform(sequence(1, size(hs) - 3), j -> array_min(slice(hs, j, 4)))"))
        .select(col("doc_id"),
          size(array_distinct(col("fps"))).cast("long").as("n_fps"),
          array_min(col("fps")).as("min_fp"),
          array_max(col("fps")).as("max_fp"))
        .orderBy("doc_id").limit(2000)
    },

    // T6: corpus token histogram (top 50) — explode + map-side-combined
    // count, the canonical vocabulary-building step.
    QueryDef("t6_token_histogram",
      """SELECT token, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY n DESC, token LIMIT 50""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(explode(toks).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token")).limit(50)
    },

    // T8: redaction / PII scrub — the masking pass every training-data
    // pipeline runs before release: first mask email-shaped spans, then a
    // blocklist term, counting what was hit. Pure regexp_replace /
    // regexp_count (codegen'd, narrow, no shuffle beyond the dump); the
    // oracle runs the identical RE2-compatible patterns with the 'g' flag.
    // On this synthetic corpus the email pattern matches nothing (by
    // construction) and the blocklist term fires often — both paths are
    // exercised and the zero-match case proves replace is not a no-op-
    // mangler.
    QueryDef("t8_redact", {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      s"""SELECT doc_id,
        |       regexp_replace(regexp_replace(text, '$email', '[EMAIL]', 'g'),
        |                      '\\bcustomer\\b', '[MASKED]', 'g') AS red,
        |       CAST(len(regexp_extract_all(text, '\\bcustomer\\b')) AS BIGINT) AS n_masked,
        |       CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails
        |FROM documents ORDER BY doc_id LIMIT 2000""".stripMargin
    }) { (s, dir) =>
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      docs(s, dir)
        .select(col("doc_id"),
          regexp_replace(regexp_replace(col("text"), email, "[EMAIL]"),
            "\\bcustomer\\b", "[MASKED]").as("red"),
          regexp_count(col("text"), lit("\\bcustomer\\b")).cast("long").as("n_masked"),
          regexp_count(col("text"), lit(email)).cast("long").as("n_emails"))
        .orderBy("doc_id").limit(2000)
    },

    // T10: BM25-shaped relevance scoring — retrieval ranking over the
    // corpus for a fixed query ("table data spark"), top 20 docs, with a
    // RATIONAL idf: idf' = (N−df+½)/(df+½), i.e. the inner term of the
    // textbook ln(idf'+1), used directly because ln's last-ulp rounding
    // is libm-specific and would break the cross-engine bit equality
    // every oracled float here relies on (the t3 discipline: identical
    // IEEE +,·,/ trees only). DELIBERATE SEMANTIC TRADE, stated plainly:
    // for a SINGLE-term query the substitution is a monotone transform
    // (rank-identical to BM25); for multi-term SUMS it up-weights rare
    // terms more sharply than the logarithmic form (a df=1 term weighs
    // ~N, not ln N), so rankings can differ from textbook BM25 when rare
    // and common terms compete. The tf saturation and length
    // normalization (k1 = 1.2, b = 0.75) are textbook. Shape: doc length
    // + per-term tf are narrow per-doc work; the stats side is ONE global
    // aggregate row (n_docs, avgdl, df per term) broadcast into the scan;
    // ranking is TakeOrdered top-k. Nothing shuffles the corpus.
    QueryDef("t10_bm25", {
      val terms = Seq("table", "data", "spark")
      val tfSql = terms.zipWithIndex.map { case (t, i) =>
        s"len(list_filter(w, x -> x = '$t')) AS tf$i" }.mkString(", ")
      val scoreSql = terms.indices.map { i =>
        s"""((CAST(n_docs - df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))
           | * (CAST(tf$i AS DOUBLE) * 2.2)
           | / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / avgdl))""".stripMargin
      }.mkString(" + ")
      s"""WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |t AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, $tfSql FROM ws),
        |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |                 avg(CAST(dl AS DOUBLE)) AS avgdl,
        |                 CAST(sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df0,
        |                 CAST(sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df1,
        |                 CAST(sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df2
        |          FROM t)
        |SELECT doc_id, CAST(round($scoreSql, 6) AS DOUBLE) AS bm25
        |FROM t, stats
        |WHERE tf0 + tf1 + tf2 > 0
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin
    }) { (s, dir) =>
      val terms = Seq("table", "data", "spark")
      val w = col("w")
      // cached: feeds the stats aggregate AND the scored scan — uncached,
      // the per-doc tokenize + three list filters run twice per query
      val t = docs(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id") +: size(w).cast("long").as("dl") +:
          terms.zipWithIndex.map { case (tm, i) =>
            size(filter(w, x => x === tm)).cast("long").as(s"tf$i")
          }: _*)
        .cache()
      val stats = t.agg(
        count(lit(1)).as("n_docs"),
        avg(col("dl").cast("double")).as("avgdl"),
        sum(when(col("tf0") > 0, 1).otherwise(0)).cast("long").as("df0"),
        sum(when(col("tf1") > 0, 1).otherwise(0)).cast("long").as("df1"),
        sum(when(col("tf2") > 0, 1).otherwise(0)).cast("long").as("df2"))
      val score = terms.indices.map { i =>
        (((col("n_docs") - col(s"df$i")).cast("double") + lit(0.5)) /
          (col(s"df$i").cast("double") + lit(0.5))) *
          (col(s"tf$i").cast("double") * lit(2.2)) /
          (col(s"tf$i").cast("double") +
            lit(1.2) * (lit(0.25) + lit(0.75) * col("dl").cast("double") / col("avgdl")))
      }.reduce(_ + _)
      t.crossJoin(broadcast(stats))
        .filter(col("tf0") + col("tf1") + col("tf2") > 0)
        .select(col("doc_id"), round(score, 6).cast("double").as("bm25"))
        .orderBy(col("bm25").desc, col("doc_id")).limit(20)
    },

    // T9: heavy hitters via Count-Min sketch — the sub-linear-memory
    // sibling of t6's exact histogram. The sketch is built DISTRIBUTED
    // (per-partition sketches merged associatively — Spark's stat
    // function runs a treeAggregate under the hood) and is a few KB
    // regardless of corpus size: at 100 TB the exact histogram's
    // (token, count) shuffle state grows with the vocabulary, the CMS
    // does not. Probes are a fixed vocabulary list; estimates carry the
    // CMS guarantee exact ≤ est ≤ exact + ε·N (TextSketchSpec pins both
    // bounds against the exact counts). The raw estimates are
    // engine-specific (hash family), so the REGISTERED form emits the
    // ORACLED error-bound verdict (the a8 pattern):
    // recompute the exact probe counts next to the CMS estimates and emit
    // only the engine-independent verdict, which the oracle states as
    // constant TRUE per probe. (The raw estimate dump survives as the
    // bench-only `t9_cms_heavy_hitters_raw`.) The lower bound (est ≥ exact) is
    // UNCONDITIONAL for count-min; the upper bound uses 4× the sketch's
    // ε·N — the textbook ε·N bound only holds with prob. ≥ 0.99 per
    // probe (a-priori ~10% that one of 10 probes breaks it on some
    // corpus), while Markov per row gives P(over > 4ε·N) ≤ (1/4e)^depth
    // ≈ 1e-5 per probe, so the verdict is stable across testdata
    // regenerations instead of frozen-by-seed. A broken sketch build or
    // merge still flips a row to false and fails the hash compare.
    //
    // `tight_quorum` additionally pins the TIGHT ε·N bound as a
    // statistical check: ≥ 9 of the 10 probes must sit within 1× ε·N
    // (per-probe P(break) ≤ 0.01 ⇒ P(≥2 of 10 break) ≲ 5e-3 — stable
    // across regenerations, while a sketch overcounting anywhere near the
    // 4× envelope fails the quorum long before the hard bound).
    QueryDef("t9_cms_heavy_hitters", {
      val probeList = CmsProbes.sorted.map(t => s"'$t'").mkString(", ")
      s"""SELECT t.token, TRUE AS within_bound, TRUE AS tight_quorum
        |FROM (SELECT unnest([$probeList]) AS token) t
        |ORDER BY token""".stripMargin
    }) { (s, dir) =>
      val tok = docs(s, dir).select(explode(toks).as("token")).cache()
      val n = tok.count()
      val sketch = tok.stat.countMinSketch(
        "token", eps = 0.001, confidence = 0.99, seed = 42)
      val exact = tok.filter(col("token").isin(CmsProbes: _*))
        .groupBy("token").agg(count(lit(1)).as("c")).collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      tok.unpersist()
      val epsN = math.ceil(0.001 * n).toLong
      val slack = 4L * epsN // 4·ε·N (see scaladoc)
      val perProbe = CmsProbes.map { t =>
        val e = exact.getOrElse(t, 0L)
        val est = sketch.estimateCount(t)
        (t, est >= e && est <= e + slack, est >= e && est <= e + epsN)
      }
      val quorum = perProbe.count(_._3) >= CmsProbes.size - 1
      val rows = perProbe.map { case (t, within, _) => (t, within, quorum) }
      s.createDataFrame(rows)
        .toDF("token", "within_bound", "tight_quorum").orderBy("token")
    },

    // T12: keyword extraction — each document's top-3 terms by TF-IDF
    // weight (the per-doc dual of d14's pairwise cosine; what a pipeline
    // tags documents with before topic bucketing). Weights reuse d14's
    // exact-integer quantization (tf × (1e6 div df), idf ∝ 1/df — the
    // constant corpus factor is rank-irrelevant per doc), so ranking ties
    // are exact and the deterministic tiebreak (term asc) totalizes the
    // order. No df cap here: keywords come from ALL terms (hot terms
    // self-demote via idf; there is no self-join for a hot term to blow
    // up — the cap is a join guard, not a weighting device).
    //
    // Scale shape: tf = one (doc, term) shuffle; df = one term shuffle;
    // the decoration join is keyed on term; top-3 is a keyed window
    // (partial per-doc, never global). Linear.
    QueryDef("t12_keywords",
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
        |dfr AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |w AS (SELECT doc_id, tf.t, tf.tf * (1000000 // df) AS wq
        |      FROM tf JOIN dfr ON tf.t = dfr.t),
        |r AS (SELECT doc_id, t, wq,
        |        row_number() OVER (PARTITION BY doc_id ORDER BY wq DESC, t) AS rk
        |      FROM w)
        |SELECT doc_id, CAST(rk AS INT) AS rk, t AS term, CAST(wq AS BIGINT) AS wq
        |FROM r WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin) { (s, dir) =>
      val toks = Par.spread(docs(s, dir), col("doc_id"))
        .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      val tf = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("tf")).cache()
      val dfr = tf.groupBy("t").agg(count(lit(1)).as("df"))
      val w = tf.join(dfr, Seq("t"))
        .select(col("doc_id"), col("t"),
          (col("tf") * expr("1000000 div df")).as("wq"))
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("wq").desc, col("t"))
      w.withColumn("rk", row_number().over(win)).filter(col("rk") <= 3)
        .select(col("doc_id"), col("rk"), col("t").as("term"), col("wq"))
        .orderBy("doc_id", "rk")
    },

    // T11: banded edit-distance near-dup — exact Levenshtein over the
    // canonicalized text, but only within blocks sharing the first
    // EditPrefix normalized characters (prefix blocking, the classic
    // record-linkage move: near-identical strings share their head, so
    // candidate pairs come from a keyed equi-join — never all-pairs).
    // Complements the set-based tiers: Jaccard (d6) ignores token ORDER,
    // SimHash (d4b) is fuzzy-fingerprint; edit distance is the exact
    // character-level metric for short-text/title dedup.
    //
    // Scale shape: one shuffle on the block key; blocks above EditBlockCap
    // drop via a broadcast anti-join (the hot set is ≤ n/cap rows — the
    // dfCapped argument); the DP itself is threshold-banded on the Spark
    // side (levenshtein's 3-arg form: O(k·n) per pair, early-exit -1),
    // while the oracle runs the full DP — an independent implementation
    // agreeing on every reported distance.
    QueryDef("t11_edit_distance",
      s"""WITH n AS (SELECT doc_id,
        |            trim(regexp_replace(regexp_replace(lower(text),
        |              '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS nt
        |           FROM documents),
        |b AS (SELECT doc_id, nt, substr(nt, 1, $EditPrefix) AS blk FROM n),
        |hot AS (SELECT blk FROM b GROUP BY blk HAVING count(*) > $EditBlockCap),
        |o AS (SELECT b.* FROM b LEFT JOIN hot USING (blk) WHERE hot.blk IS NULL)
        |SELECT a.doc_id AS a_id, b2.doc_id AS b_id,
        |       CAST(levenshtein(a.nt, b2.nt) AS INT) AS edit_dist
        |FROM o a JOIN o b2 ON a.blk = b2.blk AND a.doc_id < b2.doc_id
        |WHERE levenshtein(a.nt, b2.nt) <= $EditMax
        |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val blk = docs(s, dir)
        .select(col("doc_id"), Dedup.normalized(col("text")).as("nt"))
        .withColumn("blk", substring(col("nt"), 1, EditPrefix))
        .cache() // consumed twice: hot-block aggregation + anti-join probe
      val hot = blk.groupBy("blk").agg(count(lit(1)).as("n"))
        .filter(col("n") > EditBlockCap).select("blk")
      val ok = blk.join(broadcast(hot), Seq("blk"), "left_anti")
      ok.select(col("blk"), col("doc_id").as("a_id"), col("nt").as("na"))
        .join(ok.select(col("blk"), col("doc_id").as("b_id"), col("nt").as("nb")),
          Seq("blk"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("edit_dist", levenshtein(col("na"), col("nb"), EditMax))
        .filter(col("edit_dist") >= 0) // 3-arg levenshtein: -1 = exceeded
        .select(col("a_id"), col("b_id"), col("edit_dist").cast("int").as("edit_dist"))
        .orderBy("a_id", "b_id")
    },

    // T13: collocations — top-PmiTopK bigrams by (integer-quantized) PMI
    // with a PmiMinCount frequency floor. Bigram formation is a NARROW
    // per-doc transform (adjacent-token structs via transform/sequence —
    // no self-join, no shuffle to make pairs); then one shuffle counts
    // bigrams and one counts unigrams. The unigram vocabulary is tiny
    // relative to the corpus (Heaps' law), so both count joins broadcast
    // — at 100 TB the corpus is read once and only (pair, count) rows
    // ever move. Score = c_xy·PmiQ div (c_x·c_y), an exact BIGINT (see
    // PmiQ note); the (score desc, w1, w2) order is a total order, so
    // the top-k cut is deterministic.
    QueryDef("t13_pmi", {
      s"""WITH t AS (SELECT string_split(text, ' ') AS w FROM documents),
        |u AS (SELECT unnest(w) AS tok FROM t),
        |uni AS (SELECT tok, count(*) AS c1 FROM u GROUP BY tok),
        |b0 AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM t),
        |big AS (SELECT w1, w2, count(*) AS c12 FROM
        |          (SELECT w[i] AS w1, w[i + 1] AS w2 FROM b0) GROUP BY 1, 2),
        |sc AS (SELECT w1, w2, c12,
        |         (c12 * $PmiQ) // (u1.c1 * u2.c1) AS score
        |       FROM big JOIN uni u1 ON big.w1 = u1.tok
        |                JOIN uni u2 ON big.w2 = u2.tok
        |       WHERE c12 >= $PmiMinCount)
        |SELECT w1, w2, CAST(c12 AS BIGINT) AS c12, CAST(score AS BIGINT) AS score
        |FROM sc ORDER BY score DESC, w1, w2 LIMIT $PmiTopK""".stripMargin
    }) { (s, dir) =>
      val t = docs(s, dir).select(toks.as("w"))
      val uni = t.select(explode(col("w")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).as("c1"))
      // size ≥ 2 guard: Spark's sequence(0, -1) DESCENDS ([0,-1]) instead
      // of yielding empty, which would fabricate bigrams on 1-token docs
      // (DuckDB's generate_series(1, 0) is empty — they'd diverge).
      val big = t.filter(size(col("w")) >= 2)
        .select(explode(
          expr("transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))"))
          .as("b"))
        .select(col("b.w1"), col("b.w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        .filter(col("c12") >= PmiMinCount)
      big
        .join(broadcast(uni.select(col("tok").as("w1"), col("c1").as("ca"))), Seq("w1"))
        .join(broadcast(uni.select(col("tok").as("w2"), col("c1").as("cb"))), Seq("w2"))
        .select(col("w1"), col("w2"), col("c12"),
          expr(s"(c12 * ${PmiQ}L) div (ca * cb)").as("score"))
        .orderBy(col("score").desc, col("w1"), col("w2"))
        .limit(PmiTopK)
    }
  )

  /** Bench-only raw form of t9: the CMS probe estimates themselves. Not on
    * the scoreboard (estimates depend on the engine's hash family — the
    * registered t9 emits the error-bound verdict); keeps the sketch-build
    * plan timed. */
  val rawDefs: Seq[QueryDef] = Seq(
    QueryDef.unoracled("t9_cms_heavy_hitters_raw") { (s, dir) =>
      val tok = docs(s, dir).select(explode(toks).as("token"))
      val sketch = tok.stat.countMinSketch(
        "token", eps = 0.001, confidence = 0.99, seed = 42)
      val est = CmsProbes.map(t => (t, sketch.estimateCount(t)))
      s.createDataFrame(est).toDF("token", "est_n").orderBy("token")
    }
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the documents corpus (SURVEY §2.8 F6/F9 plus
  * the training-data-pipeline surface: language-ID, quality scoring, token
  * counting, fingerprinting).
  *
  * All are single-pass narrow transforms (no shuffle): at 100 TB they run at
  * scan speed, and every higher-order function stays inside codegen.
  *
  * Reference anchors: 512-word chunking with short-chunk drop
  * (google_search.py:184-190), string normalization (reg_ex.py:56-231,
  * utils.py:389), profile-style per-column stats (utils.py:52-86).
  */
object TextOps {
  import graft.Q.{Q, documents}

  /** F9 word-window chunking: 50-word chunks via slice windows (the
    * reference's 512-word chunker scaled to the fixture's doc length);
    * google_search.py:185-188. */
  def wordChunks: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), size(col("words")).as("n_words"),
        posexplode(expr(
          """transform(sequence(0, cast(ceil(size(words)/50.0) as int) - 1),
            | i -> array_join(slice(words, i*50+1, 50), ' '))""".stripMargin))
          .as(Seq("chunk_idx", "chunk")))
      .select(col("doc_id"), col("n_words"), col("chunk_idx"), col("chunk"),
        length(col("chunk")).as("chunk_chars"))

  /** CJK Unified Ideographs + extension A as a literal regex char class —
    * identical code points embedded in both the Spark (Java regex) and
    * DuckDB (RE2) texts, so the two engines count the same characters. */
  private val CjkClass = "[一-鿿㐀-䶿]"

  /** Hiragana (3041-3096) + Katakana (30A1-30FF, incl. the prolonged-sound
    * mark). Kana is the script signature of Japanese: Chinese never uses
    * it, so ANY substantial kana presence outranks the ideograph count
    * (Japanese prose is typically 20-40% kanji, which would otherwise trip
    * the 'zh' arm). */
  private val KanaClass = "[ぁ-ゖァ-ヿ]"

  /** Hangul syllable block (AC00-D7A3) — complete for modern Korean. */
  private val HangulClass = "[가-힣]"

  /** Script-labelled fixture corpus for [[langIdScripts]]: the driver
    * fixtures are Latin-script, so the CJK/kana/hangul arms are gated on
    * this inline corpus instead (a test-only input, NOT unioned into the
    * production query — langId itself stays a pure function of its input).
    * Rows -2/-5/-7 mix English stopwords INTO zh/ja/ko text to pin each
    * script arm's precedence over the stopword argmax; -4 mixes kanji with
    * kana to pin the ja-before-zh precedence. */
  private[graft] val LangIdScriptRows = Seq(
    (-1L, "zh", "今天天气很好 我们去公园散步 这是一个测试"),
    (-2L, "zh", "模型 在 数据 上 训练 the and of"),
    (-3L, "en", "the weather of today is good and we walk in the park"),
    (-4L, "ja", "今日は良い天気です 公園を散歩しましょう"),
    (-5L, "ja", "データで モデルを 訓練する the and of"),
    (-6L, "ko", "오늘 날씨가 좋다 우리는 공원에서 산책한다"),
    (-7L, "ko", "모델은 데이터로 학습한다 the and of"))

  /** The language-ID classification pipeline over any (doc_id, lang, text)
    * corpus — factored so the production query ([[langId]]) and the
    * script-arm gate ([[langIdScripts]]) run the IDENTICAL expressions. */
  private def langIdOver(corpus: DataFrame): DataFrame = {
    val sets = Map(
      "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
      "fr" -> Seq("le", "la", "les", "de", "et", "un"),
      "de" -> Seq("der", "die", "und", "das", "ein", "zu"),
      "es" -> Seq("el", "los", "y", "en", "que", "se"))
    def ratio(lang: String): String = {
      val in = sets(lang).map(w => s"'$w'").mkString(", ")
      s"round(size(filter(words, w -> w IN ($in))) / cast(size(words) as double), 6)"
    }
    def charRatio(cls: String): String =
      s"round(size(regexp_extract_all(text, '$cls', 0)) / " +
        "cast(length(text) as double), 6)"
    corpus
      .select(col("doc_id"), col("lang"), col("text"),
        split(col("text"), " ").as("words"))
      .select(col("doc_id"), col("lang"),
        expr(ratio("en")).as("r_en"), expr(ratio("fr")).as("r_fr"),
        expr(ratio("de")).as("r_de"), expr(ratio("es")).as("r_es"),
        expr(charRatio(CjkClass)).as("r_cjk"),
        expr(charRatio(KanaClass)).as("r_kana"),
        expr(charRatio(HangulClass)).as("r_hangul"))
      .withColumn("guess", expr(
        """CASE WHEN r_kana >= 0.05 THEN 'ja'
          | WHEN r_hangul >= 0.2 THEN 'ko'
          | WHEN r_cjk >= 0.2 THEN 'zh'
          | WHEN r_en >= r_fr AND r_en >= r_de AND r_en >= r_es THEN 'en'
          | WHEN r_fr >= r_de AND r_fr >= r_es THEN 'fr'
          | WHEN r_de >= r_es THEN 'de' ELSE 'es' END""".stripMargin))
  }

  /** Stopword-ratio language ID with script character-class arms:
    * stopword lists identify space-delimited European languages, but CJK
    * text has no delimiters for a word-list to hit — its signal is the
    * SCRIPT itself (the n-gram/char-class arm every practical lang-ID
    * stack has). Arm order: kana ≥ 0.05 → 'ja' (kana never appears in
    * Chinese, and Japanese prose is kanji-heavy, so kana must outrank the
    * ideograph count); hangul ≥ 0.2 → 'ko'; ideographs ≥ 0.2 → 'zh';
    * then the European tie-break order (en > fr > de > es), unchanged.
    * A pure function of its input corpus — the script arms are gated
    * cross-engine by [[langIdScripts]] over [[LangIdScriptRows]]. */
  def langId: Q = (s, d) =>
    langIdOver(documents(s, d).select(col("doc_id"), col("lang"), col("text")))

  /** The script-arm gate: [[langId]]'s exact pipeline over the inline
    * zh/ja/ko/en fixture corpus, hash-compared against a DuckDB replay of
    * the same VALUES — exercises the three script arms (dead code on the
    * Latin driver fixtures) at every sf without injecting phantom rows
    * into the corpus query. */
  def langIdScripts: Q = (s, d) => {
    val spark = s
    import spark.implicits._
    langIdOver(LangIdScriptRows.toDF("doc_id", "lang", "text"))
  }

  /** The t3 formula pieces, factored so the c1 funnel composes the SAME
    * expressions it claims to (a drifted inline copy would silently
    * diverge from the oracle-gated operator).
    *
    * [[uniqRatio]]/[[stopRatio]] are the COMPOSED array forms — since
    * round 17 they are the equality oracle for the fused
    * [[graft.functions.WordStats]] pass (WordStatsSpec pins both
    * generatively and on the corpus); production paths go through
    * [[wordStats]]/[[uniqRatioOf]]/[[stopRatioOf]], which compute the
    * same three counts in one codegen byte scan instead of a regex
    * split plus three interpreted HOF passes (the c1/c5 plans evaluated
    * the stop-word filter lambda three times per doc). */
  private[graft] val StopWords = Seq("the", "a", "of", "and", "to", "in", "is")
  private[graft] def uniqRatio(words: Column): Column =
    round(size(array_distinct(words)) / size(words).cast("double"), 6)
  private[graft] def stopRatio(words: Column): Column =
    round(size(filter(words, w => w.isInCollection(StopWords))) /
      size(words).cast("double"), 6)

  /** `word_stats(text)` = struct(n_words, n_distinct, n_stop) — one fused
    * pass, bit-equal to size(split)/size(array_distinct)/size(filter). */
  private[graft] def wordStats(text: Column): Column =
    org.apache.spark.sql.GraftColumnShim.column(
      graft.functions.WordStats(
        org.apache.spark.sql.GraftColumnShim.expression(text)))
  private[graft] def uniqRatioOf(ws: Column): Column =
    round(ws.getField("n_distinct") / ws.getField("n_words").cast("double"), 6)
  private[graft] def stopRatioOf(ws: Column): Column =
    round(ws.getField("n_stop") / ws.getField("n_words").cast("double"), 6)
  /** `length(regexp_replace(text, ' ', ''))` without the regex pass: the
    * split regex is the literal single space, so the words array always
    * has (number of spaces) + 1 elements and the space-stripped length
    * is `length(text) - (n_words - 1)` — the same integer by identity,
    * feeding the same division operands. */
  private[graft] def strippedLenOf(text: Column, ws: Column): Column =
    length(text) - (ws.getField("n_words") - lit(1))
  // round(8): the score is a sum of products of 6-dec-rounded ratios and
  // 1-dec weights → the true value has ≤7 decimals, so rounding at 8 can
  // never hit a decimal tie (rounding at 6 can, and did).
  private[graft] def qualityScoreCol(nWords: Column, uniq: Column,
      stop: Column): Column =
    round(least(nWords.cast("double") / 100.0, lit(1.0)) * 0.4 +
      uniq * 0.3 + least(stop * 5.0, lit(1.0)) * 0.3, 8)

  /** Quality scoring: length, word-length, uniqueness, stopword density
    * composed into a bounded score — the pre-training-filter archetype. */
  def qualityScore: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"), col("text"), wordStats(col("text")).as("ws"))
      .select(col("doc_id"),
        length(col("text")).as("len_chars"),
        col("ws.n_words").as("n_words"),
        round(strippedLenOf(col("text"), col("ws")) /
          col("ws.n_words").cast("double"), 6).as("avg_word_len"),
        uniqRatioOf(col("ws")).as("uniq_ratio"),
        size(expr("regexp_extract_all(text, '[a-z]+', 0)")).as("n_alpha_tokens"),
        stopRatioOf(col("ws")).as("stop_ratio"))
      .withColumn("quality_score", qualityScoreCol(col("n_words"),
        col("uniq_ratio"), col("stop_ratio")))

  /** BPE-ish tokenizer regex: a leading-space-attached run of letters, of
    * digits, or of other symbols — the GPT-2 pretokenizer shape reduced to
    * the fixture's ASCII alphabet. Identical semantics in Java regex (Spark)
    * and RE2 (DuckDB): disjoint character classes, leftmost-first. */
  val BpeTokenRegex = " ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"

  /** Token counting: whitespace tokens + BPE-ish regex tokens + chars per
    * token — the budget arithmetic every training pipeline runs per doc.
    * Single narrow projection, no shuffle. */
  def tokenCount: Q = (s, d) =>
    documents(s, d)
      .select(col("doc_id"),
        length(col("text")).as("n_chars"),
        size(split(col("text"), " ")).as("n_ws_tokens"),
        size(expr(s"regexp_extract_all(text, '$BpeTokenRegex', 0)"))
          .as("n_bpe_tokens"))
      .withColumn("chars_per_token",
        round(col("n_chars") / col("n_bpe_tokens").cast("double"), 6))

  /** t5 through the REAL BPE seam ([[Tokenizer.tokenCountWith]] +
    * [[BpeTokenizer]]) with a two-rule fixture merge table, ("e","r") then
    * ("er","s") — chosen so the greedy merge loop has a CLOSED FORM a
    * static DuckDB oracle can compute: n_bpe_tokens = total pre-token
    * symbols − #"er" − #"ers".
    *
    * Why the equivalence holds: "er" has distinct characters, so literal
    * occurrences never overlap and each merges exactly once; both its
    * characters are lowercase letters, so every literal "er" sits inside
    * one `[a-z]+` pre-token (adjacency is never split by pretokenization,
    * and the Ġ space-symbol never participates in either rule); rank
    * order exhausts all (e,r) merges before ("er","s") is considered, so
    * each literal "ers" then merges exactly once more. Each merge reduces
    * the token count by one. This makes the end-to-end BPE plumbing
    * (regex pretokenize → Ġ mapping → iterative lowest-rank merging)
    * hash-gated against DuckDB instead of rows-only; TokenizerSpec gates
    * the general-merge behavior the closed form does not exercise. */
  def tokenCountBpe: Q = (s, d) =>
    Tokenizer.tokenCountWith(
      documents(s, d).select(col("doc_id"), col("text")),
      Tokenizer.fromMergesLines(Iterator("#version: fixture", "e r", "er s")))

  /** t16: distributed BPE tokenizer TRAINING — learning the merge table
    * from the corpus (Sennrich et al. 2016), the step upstream of
    * [[tokenCountBpe]]'s merge APPLICATION (t5 / `Tokenizer.scala`). The
    * corpus pays exactly ONE corpus-sized shuffle (token → word-frequency
    * table with map-side combine); every subsequent merge round runs on
    * the DISTINCT-WORD table, which is vocabulary-sized (~1e5-1e7 rows at
    * ANY corpus scale — Heaps' law, not corpus-linear), the same shape
    * industrial trainers use (HuggingFace tokenizers trains from word
    * counts). Per round: adjacent-pair counts (one vocab-sized shuffle),
    * a deterministic global argmax — ties broken (cnt DESC, left ASC,
    * right ASC), exact integer counts so the winner is engine- and
    * partition-order-independent — then the merge applied to every word's
    * symbol sequence and the lineage truncated (localCheckpoint, the v5
    * Lloyd discipline). The argmax row stays a 1-row DataFrame joined
    * back via broadcast, so the whole K-round train is ONE lazy plan with
    * no driver-side collect.
    *
    * Merge application is leftmost-non-overlapping greedy (the reference
    * BPE semantics): each symbol is wrapped as U+001F sym U+001E and the
    * pair replaced with literal `replace` — matches cannot share bytes,
    * so replace-all IS the greedy scan, identically in Spark and DuckDB
    * (both scan left to right without rescanning replacements). The
    * trained query restricts to `^[a-z]+$` tokens plus the `</w>`
    * end-of-word marker so initial char segmentation is engine-portable;
    * the operator itself is unicode-clean (substring segmentation).
    *
    * A round that finds no pair (vocabulary exhausted — every word fused
    * to a single symbol — or an empty corpus) emits no row: the merge
    * table simply ends early, the same contract a reference BPE trainer
    * has when vocab_size exceeds what the corpus supports. */
  val BpeTrainRounds = 6
  private val SymO = "\u001F" // unit separator: symbol open
  private val SymC = "\u001E" // record separator: symbol close

  def bpeTrain: Q = (s, d) => bpeTrainOver(documents(s, d), BpeTrainRounds)

  private[graft] def bpeTrainOver(docsDf: DataFrame,
      rounds: Int): DataFrame =
    bpeTrainTokens(docsDf, rounds, tokenGate = Some("^[a-z]+$"))

  /** Library entrypoint: the same trainer over ANY token stream. The
    * oracle-gated [[bpeTrain]] pins the `^[a-z]+$` gate purely so the
    * static DuckDB replay segments identically; the trainer itself is
    * unicode-clean (Spark `substring`/`replace`/`split` are
    * CHARACTER-based, and the U+001F/U+001E wrap sentinels are control
    * codes no text contains), so production callers pass their own gate
    * — or none — and a CJK corpus trains per-ideograph merges directly
    * (PipelineOpsSpec pins a Chinese fixture). */
  def bpeTrainTokens(docsDf: DataFrame, rounds: Int,
      tokenGate: Option[String] = None): DataFrame = {
    // the corpus-bound half is ONE distributed pass (token gate + word
    // counts); everything after operates on the VOCAB-sized word table,
    // so the K merge rounds run on the driver (guide §1.2 — the c9/kmeans
    // treatment): the composed form re-planned explode → groupBy →
    // TakeOrdered → crossJoin-rewrite TWICE PER ROUND with a
    // localCheckpoint between, all to fold a table that fits in hand.
    // Guarded at 2^20 vocab rows via a bounded head(N+1) probe;
    // [[bpeTrainTokensComposed]] remains beyond the guard and as
    // BpeTrainSpec's equality oracle. Merge policy replayed exactly:
    // argmax by (cnt DESC, left ASC, right ASC) under UTF8String BYTE
    // order (Spark's string ordering — java.lang.String order differs on
    // supplementary planes), left-to-right non-overlapping pair rewrite
    // (what replace() on the sentinel-wrapped form did), empty rounds
    // stop the emission (the composed crossJoin against an empty best
    // emptied the table for good).
    val toks = docsDf.select(explode(split(col("text"), " ")).as("w"))
    val counts = tokenGate.fold(toks.filter(length(col("w")) > 0))(g =>
      toks.filter(col("w").rlike(g)))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val rows = counts.head(BpeMaxVocab + 1)
    if (rows.length > BpeMaxVocab)
      return bpeTrainTokensComposed(docsDf, rounds, tokenGate)
    val words = rows.map { r =>
      val cs = r.getString(0)
      val syms = new Array[String](cs.codePointCount(0, cs.length) + 1)
      var i = 0; var p = 0
      while (i < cs.length) {
        val cp = cs.codePointAt(i)
        syms(p) = new String(Character.toChars(cp)); p += 1
        i += Character.charCount(cp)
      }
      syms(p) = "</w>"
      (syms, r.getLong(1))
    }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, String, Long)]
    var table: Array[(Array[String], Long)] = words
    var r = 1
    var live = true
    while (r <= rounds && live) {
      val cnt = new java.util.HashMap[(String, String), Array[Long]]()
      table.foreach { case (syms, freq) =>
        var i = 1
        while (i < syms.length) {
          val k = (syms(i - 1), syms(i))
          val slot = cnt.get(k)
          if (slot == null) cnt.put(k, Array(freq)) else slot(0) += freq
          i += 1
        }
      }
      if (cnt.isEmpty) live = false
      else {
        import org.apache.spark.unsafe.types.UTF8String
        var bl: String = null; var br: String = null; var bc = Long.MinValue
        val it = cnt.entrySet().iterator()
        while (it.hasNext) {
          val en = it.next()
          val c = en.getValue()(0)
          val (l, rr) = en.getKey
          val better = c > bc || (c == bc && {
            val cl = UTF8String.fromString(l).compareTo(UTF8String.fromString(bl))
            cl < 0 || (cl == 0 &&
              UTF8String.fromString(rr).compareTo(UTF8String.fromString(br)) < 0)
          })
          if (better) { bl = l; br = rr; bc = c }
        }
        out += ((r, bl, br, bl + br, bc))
        if (r < rounds) {
          val merged = bl + br
          table = table.map { case (syms, freq) =>
            if (syms.length < 2) (syms, freq)
            else {
              val b = new scala.collection.mutable.ArrayBuffer[String](syms.length)
              var i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == bl && syms(i + 1) == br) {
                  b += merged; i += 2
                } else { b += syms(i); i += 1 }
              }
              (b.toArray, freq)
            }
          }
        }
      }
      r += 1
    }
    val s = docsDf.sparkSession
    import scala.jdk.CollectionConverters._
    s.createDataFrame(
      out.map { case (rk, l, rr, m, c) =>
        org.apache.spark.sql.Row(rk, l, rr, m, c) }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("pair_left",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("pair_right",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("merged",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField("cnt",
          org.apache.spark.sql.types.LongType, nullable = true))))
  }

  /** Vocab-row ceiling for the driver-hosted BPE trainer (the gated word
    * table; the same 2^20 class as the other driver-hosted maps). */
  private[graft] val BpeMaxVocab: Int = 1 << 20

  /** The composed per-round Catalyst loop [[bpeTrainTokens]] replaced —
    * the beyond-guard plan and BpeTrainSpec's equality oracle. */
  private[graft] def bpeTrainTokensComposed(docsDf: DataFrame, rounds: Int,
      tokenGate: Option[String] = None): DataFrame = {
    val toks = docsDf.select(explode(split(col("text"), " ")).as("w"))
    var words = tokenGate.fold(toks.filter(length(col("w")) > 0))(g =>
      toks.filter(col("w").rlike(g)))
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(expr(
        """concat(transform(sequence(1, length(w)), i -> substring(w, i, 1)),
          | array('</w>'))""".stripMargin).as("syms"), col("freq"))
      .localCheckpoint(eager = false)
    var out: DataFrame = null
    for (r <- 1 to rounds) {
      // Fully-fused words (size(syms)==1) must emit NO pairs: Spark's
      // sequence(1, 0) defaults to step -1 and yields [1, 0], so without
      // this filter the transform would emit phantom (null, sym)/(sym,
      // null) pairs carrying the word's full freq — DuckDB's
      // range(1, len(syms)) yields no rows for such words, and a frequent
      // short word fusing within the round budget would let a null pair
      // win the argmax and poison every later merge. The filter restores
      // range() semantics; the "vocabulary exhausted emits no row"
      // contract in the scaladoc above now holds on both engines
      // (fixture-pinned in TextOpsSpec).
      val best = words
        .filter(size(col("syms")) > 1)
        .select(col("freq"), explode(expr(
          """transform(sequence(1, size(syms) - 1),
            | i -> named_struct('l', syms[i-1], 'r', syms[i]))""".stripMargin))
          .as("p"))
        .select(col("freq"), col("p.l").as("pair_left"),
          col("p.r").as("pair_right"))
        .groupBy("pair_left", "pair_right")
        .agg(sum("freq").as("cnt"))
        .orderBy(desc("cnt"), asc("pair_left"), asc("pair_right"))
        .limit(1)
        .localCheckpoint(eager = false)
      val ranked = best.select(lit(r).as("rank"), col("pair_left"),
        col("pair_right"),
        concat(col("pair_left"), col("pair_right")).as("merged"), col("cnt"))
      out = if (out == null) ranked else out.union(ranked)
      if (r < rounds) {
        val sep = SymC + SymO
        val wrapped = concat(lit(SymO), array_join(col("syms"), sep),
          lit(SymC))
        val pat = concat(lit(SymO), col("ml"), lit(sep), col("mr"),
          lit(SymC))
        val rep = concat(lit(SymO), col("ml"), col("mr"), lit(SymC))
        words = words.crossJoin(broadcast(best
            .select(col("pair_left").as("ml"), col("pair_right").as("mr"))))
          .withColumn("s2", call_function("replace", wrapped, pat, rep))
          .select(split(col("s2").substr(lit(2), length(col("s2")) - 2),
            sep).as("syms"), col("freq"))
          .localCheckpoint(eager = false)
      }
    }
    out
  }

  /** t4: document fingerprinting — whole-text md5 plus the minimum
    * 8- and 16-char-window md5s (rolling-hash MinHash-of-one). The min
    * columns are fused [[graft.functions.MinGramHash]] expressions: the
    * SQL `array_min(transform(sequence(...), i -> md5(substring(...))))`
    * form allocates a 32-char hex string per POSITION and keeps the whole
    * per-position array alive for array_min — the round-10 honest-action
    * bench fix exposed it as the slowest query in the suite (3.71 s at
    * sf0.1); the fused form (one reused MessageDigest, running-min digest,
    * hex once) measured 0.55 s — ~7x, in line with the dd9/t14 fusions.
    * Oracle unchanged: hex is nibble-monotonic so min-over-hex equals
    * unsigned min-over-digest. */
  def fingerprint: Q = (s, d) => {
    graft.functions.MinGramHash.register(s, 8, "min_gram8_h")
    graft.functions.MinGramHash.register(s, 16, "min_gram16_h")
    documents(s, d).select(
      col("doc_id"),
      md5(col("text")).as("content_hash"),
      expr("min_gram8_h(text)").as("min_gram8"),
      expr("min_gram16_h(text)").as("min_gram16"))
  }

  /** t6: deterministic stratified sampling — the reproducible-curation
    * idiom for mixture building. A portable content-independent hash of the
    * key (the same 48-bit md5 fold the MinHash pipeline uses) buckets every
    * row into 0..99; per-stratum quotas (here a language mixture: en 60%,
    * fr 30%, rest 10%) are then a pure map-side filter. No shuffle and no
    * RNG state: the identical subset falls out on every engine, every
    * re-run, and every cluster size — which is what makes 100 TB mixture
    * re-builds and data-ablation A/Bs auditable, where `TABLESAMPLE`/
    * `rand()` sampling is neither reproducible nor stratifiable. */
  def stratifiedSample: Q = (s, d) =>
    mixtureFilter(documents(s, d).select(col("doc_id"), col("lang")))

  /** The t6 bucket + quota expressions over any (doc_id, lang) frame —
    * stateless, so the SAME call works on a `readStream` source unchanged
    * (curation-on-ingest; StreamsSpec proves parity with the batch query). */
  private[graft] def mixtureFilter(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.functions.Md5Prefix.register(docs.sparkSession)
    docs
      // md5_prefix(x, 12) IS cast(conv(substring(md5(x),1,12),16,10) as
      // bigint) read off the digest bytes (Md5Prefix scaladoc + spec) —
      // same value, minus the hex render + substring + base-16 re-parse
      .withColumn("bucket", expr(
        "md5_prefix(cast(doc_id as string), 12) % 100"))
      .filter(expr(
        "bucket < CASE lang WHEN 'en' THEN 60 WHEN 'fr' THEN 30 ELSE 10 END"))
  }

  /** t7: benchmark decontamination — flag corpus documents that share any
    * 8-word n-gram with a benchmark ("eval") set, the standard
    * train/test-contamination check (8-13-gram overlap). The eval set here
    * is the deterministic doc_id % 97 slice standing in for a held-out
    * benchmark file.
    *
    * Scale shape: the eval set's distinct n-gram table is SMALL by nature
    * (benchmarks are thousands of documents, not billions), so the check
    * is a broadcast hash probe against every corpus n-gram — map-side, no
    * corpus shuffle; only the per-doc hit count aggregates. The gram
    * REPRESENTATION is the corpus-derived knob: the oracle-gated query
    * pins the string form (clear, exactly mirrorable in DuckDB);
    * [[decontaminationAuto]] switches to the dd-family 48-bit md5 fold
    * above [[OperatingPoint.hashDecontaminationGrams]], shrinking the
    * broadcast (8 bytes vs ~50-byte strings) and making every probe
    * comparison a long-equality instead of a string compare. */
  def decontamination: Q = (s, d) =>
    decontaminationOver(documents(s, d), hashGrams = false)

  /** Library entrypoint with the gram representation derived from corpus
    * size. The 48-bit fold's collision odds are birthday-bounded (~1e-4 at
    * 1M distinct eval grams) and a collision can only FLAG an extra doc —
    * the conservative direction for decontamination. */
  def decontaminationAuto(corpus: org.apache.spark.sql.DataFrame,
      countEstimate: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    val n = countEstimate.getOrElse(corpus.count())
    decontaminationOver(corpus, OperatingPoint.hashDecontaminationGrams(n))
  }

  /** ScaleProbe harness form of [[decontaminationAuto]]. */
  private[graft] val decontaminationAutoQ: Q =
    (s, d) => decontaminationAuto(documents(s, d))

  /** Core of t7 over any (doc_id, text) corpus; `hashGrams` selects the
    * probe representation (identical hit semantics modulo the documented
    * fold collisions — TextOpsSpec asserts fixture parity). */
  private[graft] def decontaminationOver(corpus: org.apache.spark.sql.DataFrame,
      hashGrams: Boolean): org.apache.spark.sql.DataFrame = {
    // both gram streams run fused (graft.functions.ShingleHashes family):
    // the former transform(sequence/slice/array_join) chain evaluated its
    // lambdas interpreted per gram, and the hash arm re-parsed md5 hex —
    // strings/hashes are bit-identical (ShingleHashesSpec)
    graft.functions.ShingleHashes.register(corpus.sparkSession)
    val docs = corpus
      .select(col("doc_id"), split(col("text"), " ").as("words"))
    val grams = if (hashGrams)
      docs.select(col("doc_id"),
        explode(expr("gram_hashes(words, 8)")).as("g"))
    else docs.select(col("doc_id"),
      explode(expr("gram_strings(words, 8)")).as("g"))
    val bench = grams.filter(col("doc_id") % 97 === 0)
      .select(col("g")).distinct()
    val hits = grams.join(broadcast(bench), Seq("g"))
      .groupBy("doc_id").agg(countDistinct(col("g")).as("n_hits"))
    docs.select(col("doc_id"), (col("doc_id") % 97 === 0).as("is_benchmark"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_benchmark"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  /** t8: repetition filters — the Gopher-style quality signals (Rae et al.
    * 2021 §A1.1.2, public): the fraction of tokens taken by the single
    * most frequent word, and the fraction of 5-gram positions that repeat
    * an earlier 5-gram. Highly repetitive machine-generated text scores
    * high on both; the `repetitive` flag applies the paper's spirit
    * (most-common-word > 20%, duplicated 5-grams > 15%).
    *
    * Scale shape: pure map-side per-document array arithmetic (the
    * per-doc word scan is quadratic in the doc's DISTINCT words, bounded
    * by document length, not corpus size) — no shuffle anywhere, runs at
    * scan speed like the rest of the t-family. */
  def repetition: Q = (s, d) => {
    // both signals from ONE fused pass ([[graft.functions.RepetitionStats]]):
    // the HOF form's per-distinct-word rescan was the slowest map-side
    // query once the bench action stopped pruning it (0.825 s at sf0.1);
    // the fused hash-map/hash-set pass is O(n) dispatches with identical
    // values (oracle unchanged)
    graft.functions.RepetitionStats.register(s, "rep_stats_t8")
    documents(s, d)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .select(col("doc_id"), size(col("words")).as("nw"),
        expr("rep_stats_t8(words)").as("st"))
      .select(col("doc_id"),
        round(col("st.max_word_count") / col("nw").cast("double"), 6)
          .as("top_word_frac"),
        round((col("st.n_grams") - col("st.n_distinct_grams")) /
          col("st.n_grams").cast("double"), 6).as("dup_5gram_frac"))
      .withColumn("repetitive",
        col("top_word_frac") > 0.2 || col("dup_5gram_frac") > 0.15)
  }

  /** t9: PII redaction — scrub emails, US-style phone numbers, and IPv4
    * addresses, counting removals per category: the compliance pass every
    * released corpus runs. All three patterns avoid backslash escapes
    * (`[.]`/`[-]` instead of `\.`/`\-`) and alternation so the identical
    * literal parses identically and produces the same match spans in Java
    * regex (Spark) and RE2 (DuckDB). Replacement order email → phone → IP
    * is safe by construction: no replacement token contains digits, the
    * phone shape has no dots, and the IP shape has no hyphens, so no pass
    * creates or destroys a later pass's matches. Each category is PLANTED
    * on its own doc_id modulus (13 / 11 / 7 — coprime, so mixed-category
    * docs occur too) mirroring the dd-family planting convention.
    * Map-side projection, no shuffle. */
  def piiRedaction: Q = (s, d) => {
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
    val phoneRe = "[0-9]{3}[-][0-9]{3}[-][0-9]{4}"
    val ipRe = "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
    val corpus = documents(s, d).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 13 === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com now"))).otherwise(lit("")),
        when(col("doc_id") % 11 === 0,
          concat(lit(" call 555-867-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
            lit(" now"))).otherwise(lit("")),
        when(col("doc_id") % 7 === 0,
          concat(lit(" from 10."), (col("doc_id") % 256).cast("string"),
            lit(".0."), (col("doc_id") % 100).cast("string"),
            lit(" today"))).otherwise(lit(""))).as("text"))
    corpus.select(col("doc_id"),
      size(expr(s"regexp_extract_all(text, '$emailRe', 0)")).as("n_emails"),
      size(expr(s"regexp_extract_all(text, '$phoneRe', 0)")).as("n_phones"),
      size(expr(s"regexp_extract_all(text, '$ipRe', 0)")).as("n_ips"),
      length(col("text")).as("len_before"),
      length(regexp_replace(regexp_replace(regexp_replace(col("text"),
        emailRe, "<EMAIL>"), phoneRe, "<PHONE>"), ipRe, "<IP>"))
        .as("len_after"))
      .withColumn("redacted",
        col("n_emails") > 0 || col("n_phones") > 0 || col("n_ips") > 0)
  }

  /** t10 keep-best ordering: longest doc first, doc_id breaks ties.
    * Shared between the declarative window form and the pre-pruned scale
    * form so they cannot drift. */
  private[graft] val DomainCap = 15

  /** t10: per-domain document caps — the domain-balancing pass every web
    * corpus runs before training (cap each source/domain at N docs so no
    * single crawl dominates the mixture), keeping the best docs per domain
    * (longest, doc_id tie-break).
    *
    * Scale shape (round 14): the bounded [[graft.functions.TopKRows]] heap
    * aggregate per domain, not a row_number window. The window form DID
    * rewrite to WindowGroupLimit with a partial group-limit before the
    * Exchange (shuffle volume bounded at partitions × domains × cap) — but
    * that partial pass SORTS each whole input partition by (source,
    * n_chars, doc_id) first, a map-side external sort of the corpus. The
    * heap agg ships the same bounded partial state with NO sort anywhere:
    * O(n log cap) heap updates, ≤ domains·cap rows per task into the
    * exchange. Ordering (n_chars DESC, doc_id ASC) is TopKRows' field
    * convention — identical to the window's, so the oracle (written as
    * row_number) stays hash-green, with pos + 1 as the rank.
    * PipelineOpsSpec pins the ObjectHashAggregate plan shape. */
  def domainCaps: Q = (s, d) => {
    graft.functions.TopKRows.register(s)
    documents(s, d)
      .select(col("source"),
        struct(col("n_chars"), col("doc_id")).as("cand"))
      .groupBy(col("source"))
      .agg(expr(s"topk_rows(cand, $DomainCap)").as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("t.doc_id").as("doc_id"), col("source"),
        col("t.n_chars").as("n_chars"), (col("pos") + 1).cast("int").as("rk"))
  }

  /** c2: mixture weights — given a target language mixture for the training
    * blend, compute each language's actual corpus share and the sampling
    * weight (target/actual) that achieves the target; weight > 1 means the
    * language must be oversampled (epochs > 1 over its docs). The shape of
    * every data-mixture rebalancing step (e.g. the Pile / LLaMA mixture
    * tables, public). Scale: one map-side-combined groupBy on lang (a
    * handful of groups), then a broadcast of the single global-total row —
    * nothing here grows with corpus size. */
  def mixtureWeights: Q = (s, d) => {
    val targetCase =
      """CASE lang WHEN 'en' THEN 0.40 WHEN 'zh' THEN 0.15 WHEN 'es' THEN 0.15
        | WHEN 'de' THEN 0.15 WHEN 'fr' THEN 0.15 ELSE 0.0 END""".stripMargin
    val counts = documents(s, d).groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    val total = counts.agg(sum(col("n_docs")).as("total_docs"))
    counts.crossJoin(broadcast(total))
      .withColumn("actual_share",
        round(col("n_docs") / col("total_docs").cast("double"), 6))
      .withColumn("target_share", expr(targetCase).cast("double"))
      .withColumn("weight",
        round(col("target_share") / col("actual_share"), 6))
      .withColumn("oversample", col("weight") > 1.0)
      .drop("total_docs")
  }

  /** c5: the model-based curation chain in ONE Catalyst plan — the
    * FineWeb/CCNet tail of the funnel that c1 (heuristics + LSH dedup)
    * does not cover: classifier keep (c3's linear quality score) AND
    * LM-perplexity keep (t13's surprisal cut) gate the corpus, survivors
    * get their t12 split, and the result rolls up per (split, lang) with
    * the token budget and the corpus-level surprisal computed from the
    * UNROUNDED integer log-prob sums (exact bigint aggregation — no
    * float-order hash risk crossing the roll-up). One declarative plan:
    * both model joins broadcast, the only wide operations are the
    * per-doc score groupBy and the final small roll-up — no
    * materialization barrier between stages, so Catalyst pipelines the
    * filters into the scans at any scale. */
  def curationPipeline: Q = (s, d) =>
    curationPipelineOver(documents(s, d), derivedKeep = false)

  /** Library entrypoint: c5 with the perplexity keep ceiling
    * corpus-DERIVED ([[surprisalKeepMicroOf]] — the median-anchored
    * [[OperatingPoint.surprisalKeepMicro]]). The pinned [[curationPipeline]]
    * keeps the 7.0 literal so its static DuckDB oracle mirrors the exact
    * filter; this is the form a shifted-base-rate corpus runs (the ×1000
    * disjoint-vocab widening drove the literal to keep-nothing — measured
    * round 13; spec-gated here in PipelineOpsSpec). */
  def curationPipelineAuto(docs: DataFrame): DataFrame =
    curationPipelineOver(docs, derivedKeep = true)

  private[graft] def curationPipelineOver(docs: DataFrame,
      derivedKeep: Boolean): DataFrame = {
    val (model, oov) = unigramModel(docs)
    val quality = qualityLrOf(docs).filter(col("keep")).select("doc_id")
    val scoredAgg0 = surprisalAgg(docs.select("doc_id", "text"), model, oov)
    val scoredAgg =
      if (derivedKeep) scoredAgg0.localCheckpoint(eager = false) // + quantile
      else scoredAgg0
    // same integer-quotient keep gate as surprisalScored (tie-proof)
    val keepMicro = if (derivedKeep) surprisalKeepMicroOf(scoredAgg)
      else 7000000L
    val scored = scoredAgg.filter(expr("(-sum_lp) div n_words") <= keepMicro)
    val kept = quality.join(scored, "doc_id")
      .join(docs.select("doc_id", "lang"), "doc_id")
    withSplit(kept).groupBy("split", "lang")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum(col("n_words").cast("long")).as("sum_words"),
        sum(col("sum_lp")).as("sum_lp"))
      .select(col("split"), col("lang"), col("n_docs"), col("sum_words"),
        expr("cast((-sum_lp) div sum_words as double) / 1e6")
          .as("avg_surprisal"))
  }

  /** t14: content-defined chunking — the CDC/rsync boundary rule applied
    * to RAG/dedup chunking: a chunk ends wherever the hash of the last 16
    * chars opens with two zero hex nibbles (1/256 of hash space → mean
    * chunk ≈ 256 chars). Unlike F9's fixed word windows, boundaries are
    * ALIGNMENT-INVARIANT: editing a doc's head reflows only the chunks up
    * to the first boundary after the edit, and the same passage embedded
    * in two documents chunks identically past its first interior boundary
    * — which is what makes chunk-level dedup and incremental re-embedding
    * work (the same content-defined principle as dd9's gram selection;
    * FastCDC is the production form of this rule). Narrow per-doc
    * map-side transform, no shuffle; at 100 TB the boundary hash
    * graduates to the rolling form like dd9's
    * ([[graft.functions.RollingGramHits]] machinery). */
  def cdcChunks: Q = (s, d) => cdcChunksOf(documents(s, d))

  /** The t14 chunker over any (doc_id, text) frame — stateless, so the
    * same call chunks a stream or a test fixture. */
  private[graft] def cdcChunksOf(docsDf: DataFrame): DataFrame = {
    // boundary detection runs fused in one native loop per document
    // ([[graft.functions.CdcBoundaries]]) — the interpreted lambda form
    // measured 12.9 s at sf0.1 vs ~1 s fused, identical output
    graft.functions.CdcBoundaries.register(docsDf.sparkSession, 16)
    docsDf
      .select(col("doc_id"), col("text"),
        expr("cdc_boundaries(text)").as("bs"))
      .select(col("doc_id"), col("text"), expr(
        """filter(zip_with(concat(array(0), bs),
          |   concat(bs, array(length(text))),
          |  (p, e) -> named_struct('a', p + 1, 'b', e)),
          | seg -> seg.b >= seg.a)""".stripMargin).as("segs"))
      .select(col("doc_id"),
        posexplode(col("segs")).as(Seq("chunk_idx", "seg")), col("text"))
      .select(col("doc_id"), col("chunk_idx"),
        col("seg.a").as("start"),
        (col("seg.b") - col("seg.a") + 1).as("chunk_len"),
        md5(expr("substring(text, seg.a, seg.b - seg.a + 1)"))
          .as("chunk_md5"))
  }

  /** c4: APPLY the mixture — materialize [[mixtureWeights]]'s per-language
    * weights into an actual resampled corpus manifest: weight w replicates
    * each doc floor(w) times plus one more for a deterministic hash-bucket
    * fraction of docs (bucket < frac·1000), so langs with w > 1 oversample
    * to their target share and langs with w < 1 downsample — without
    * `rand()`, so the epoch mixture is reproducible run-to-run and stable
    * under re-partitioning (same discipline as t12's splits; the salt is
    * independent of both t6's and t12's). The join against the lang-level
    * weights BROADCASTS (5 rows); the explode emits copy rows map-side.
    * Downstream, [[sequencePack]] consumes exactly this manifest shape. */
  def mixtureApply: Q = (s, d) => {
    graft.functions.Md5Prefix.register(s)
    val weights = mixtureWeights(s, d).select(col("lang"), col("weight"))
    documents(s, d).select(col("doc_id"), col("lang"))
      .join(broadcast(weights), Seq("lang"))
      .withColumn("bucket", expr(
        "md5_prefix(concat('mix:', cast(doc_id as string)), 12) % 1000"))
      .withColumn("n_copies",
        (floor(col("weight")) +
          when(col("bucket") <
            round((col("weight") - floor(col("weight"))) * 1000), 1)
            .otherwise(0)).cast("int"))
      .filter(col("n_copies") > 0)
      .select(col("doc_id"), col("lang"), col("weight"), col("n_copies"),
        explode(expr("sequence(0, n_copies - 1)")).as("copy_idx"))
  }

  /** t11 packing geometry: training-sequence token capacity and the shard
    * count the fixture gate pins (production derives shards from the
    * cluster's parallelism — see [[sequencePack]]'s scale note). */
  private[graft] val PackSeqLen = 2048
  private[graft] val PackShards = 8

  /** t11: sequence packing — the concat-and-chunk step that turns a curated
    * corpus into fixed-capacity training sequences (GPT-style pretraining
    * packing, public practice: documents are concatenated in a fixed order
    * and the token stream is cut every L tokens, so sequences are full by
    * construction and a document can straddle a cut). The output is the
    * packing MANIFEST every downstream loader needs: for each document its
    * token count, its start offset in the shard's token stream, the
    * sequence its first token lands in, and how many sequences it spans
    * (straddle count) — deterministic integer arithmetic end to end.
    *
    * Scale shape: a GLOBAL concatenation order would be a single-partition
    * window — the one shape this library never ships. Packing is instead
    * per-SHARD (shard = doc_id mod S here; any corpus hash works): each
    * shard's running-offset cumsum is an independent window partition, so
    * the plan is one hash shuffle on the shard key and S-way parallel
    * cumsums, and sequences are shard-local (seq ids only need to be
    * unique within a shard — loaders consume shards independently, the
    * same reason production packers shard first). At 100 TB, S scales with
    * the cluster (thousands of shards ≈ thousands of independent packing
    * streams); the fixture pins S=8 so the DuckDB oracle mirrors the exact
    * geometry. The reference has no packing surface (training-data
    * extension). */
  def sequencePack: Q = (s, d) => {
    val docs = documents(s, d).select(col("doc_id"),
        size(expr(s"regexp_extract_all(text, '$BpeTokenRegex', 0)"))
          .as("n_tokens"))
      .withColumn("shard", (col("doc_id") % PackShards).cast("int"))
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("start_off",
        coalesce(sum(col("n_tokens").cast("long")).over(w), lit(0L)))
      .withColumn("seq_id", floor(col("start_off") / PackSeqLen))
      .withColumn("n_seqs",
        when(col("n_tokens") === 0, lit(1L)).otherwise(
          floor((col("start_off") + col("n_tokens") - lit(1)) / PackSeqLen)
            - col("seq_id") + lit(1)))
      .select("doc_id", "shard", "n_tokens", "start_off", "seq_id", "n_seqs")
  }

  /** t12: deterministic train/val/test split assignment — hash of the doc
    * id (salted so it is INDEPENDENT of t6's sampling buckets: the same
    * md5-prefix arithmetic on a different key must not correlate decisions
    * across operators) into 1000 buckets, carved 98/1/1. Hash-based
    * assignment is the only split that survives a distributed pipeline:
    * it is reproducible run-to-run, stable under re-partitioning and
    * corpus append (a new doc's split never depends on what else is in
    * the batch), and leakage-free by construction — `rand()`-based splits
    * are none of these. Narrow map-side projection; no shuffle. */
  def splitAssign: Q = (s, d) =>
    withSplit(documents(s, d)).select("doc_id", "lang", "bucket", "split")

  /** The t12 bucket + split columns over any frame with a doc_id. */
  private[graft] def withSplit(df: DataFrame): DataFrame = {
    graft.functions.Md5Prefix.register(df.sparkSession)
    df.withColumn("bucket", expr(
        "md5_prefix(concat('split:', cast(doc_id as string)), 12) % 1000"))
      .withColumn("split",
        when(col("bucket") < 980, "train")
          .when(col("bucket") < 990, "val").otherwise("test"))
  }

  /** t15: reproducible global shuffle + shard manifest — the step between
    * curation and the data loader. Training wants the corpus in a
    * pseudorandom order that is (a) reproducible across reruns and
    * appends (no rand(): the order of a doc depends only on its id and
    * the seed), (b) served as S shards a loader fleet can consume
    * independently. Shuffle key = salted md5 of the doc id (the t12
    * carve's hash family, a different salt — so shuffle order and split
    * assignment are independent streams); shard = key mod S; pos =
    * rank of the key within its shard. The position window partitions by
    * shard — S-way parallel like t11's packing cumsum, never a global
    * sort (at 100 TB, S is thousands and each shard sorts its slice;
    * writing partitioned by `shard` then makes loader reads partition
    * prunes). Public practice: every large-corpus trainer (GPT-3,
    * LLaMA-family data work) shuffles documents with a seeded hash
    * before sharding. */
  def shuffleShard: Q = (s, d) => shuffleShardOver(documents(s, d), shards = 8)

  /** Library entrypoint: shard count derived from the corpus size
    * ([[graft.operators.OperatingPoint.shuffleShards]] — ~64k docs per
    * shard in power-of-two steps), so the per-shard rank window and the
    * loader fleet both scale with the corpus instead of funneling a
    * grown corpus through a pinned-S window. The oracle-gated
    * [[shuffleShard]] pins S=8 so the static DuckDB SQL mirrors the
    * exact blocking structure, the same fixture-pin discipline as the
    * LSH family.
    *
    * Stability contract: shard ROUTING is append-stable only at FIXED S —
    * re-deriving S after the corpus crosses a pow2 boundary remaps ~half
    * of all docs (key mod S changes). A pipeline extending a persisted
    * manifest must pin the S the manifest was written with (pass it via
    * [[shuffleShardOver]], the `_meta` discipline the at-rest indexes
    * persist their geometry under) and step S up as a deliberate
    * re-shard on the rebucket cadence, not implicitly per call. */
  def shuffleShardAuto(df: DataFrame,
      countEstimate: Option[Long] = None): DataFrame = {
    val n = math.max(1L, countEstimate.getOrElse(df.count()))
    shuffleShardOver(df, OperatingPoint.shuffleShards(n))
  }

  private[graft] def shuffleShardOver(df: DataFrame, shards: Int): DataFrame = {
    graft.functions.Md5Prefix.register(df.sparkSession)
    df.select(col("doc_id"),
        expr("md5_prefix(concat('shuffle42:', " +
          "cast(doc_id as string)), 12)").as("skey"))
      .withColumn("shard", pmod(col("skey"), lit(shards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("skey", "doc_id")))
      .select("doc_id", "shard", "pos")
  }

  /** c7: the corpus DATA CARD — the per-(lang, split) reporting rollup
    * every curation pipeline publishes beside the corpus (doc counts,
    * token/char totals, mean quality; the "datasheet" practice of Gebru
    * et al. and every public corpus release). Composes the FACTORED
    * pieces ([[withSplit]], the t3 formula columns) so the card can
    * never drift from the operators it reports on. One narrow
    * projection + one grouped aggregate — scan-speed at any corpus
    * size, with the mean aggregated over INTEGER-scaled scores
    * (sum of round(q·1e8) as bigint) so the float total is
    * partition-order-free. The mean itself is the INTEGER quotient of
    * that sum over the count, display-scaled by 1e-8 — no decimal
    * rounding of a derived quotient anywhere, because a quotient's
    * decimal expansion can land exactly on a rounding tie and Spark
    * (decimal HALF_UP on the shortest representation) and DuckDB
    * (binary-double rounding) resolve such ties differently; integer
    * division is bit-identical in both engines by construction
    * (truncating the 9th-and-beyond decimal, documented here). */
  def dataCard: Q = (s, d) =>
    withSplit(documents(s, d))
      .select(col("lang"), col("split"),
        length(col("text")).as("n_chars_doc"),
        wordStats(col("text")).as("ws"))
      .select(col("lang"), col("split"), col("n_chars_doc"),
        col("ws.n_words").as("n_words"),
        qualityScoreCol(col("ws.n_words"), uniqRatioOf(col("ws")),
          stopRatioOf(col("ws"))).as("q"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("n_tokens"),
        sum(col("n_chars_doc").cast("long")).as("n_chars"),
        sum(round(col("q") * 1e8).cast("bigint")).as("q_sum"))
      .withColumn("mean_quality",
        expr("cast(q_sum div n_docs as double) / 1e8"))
      .select("lang", "split", "n_docs", "n_tokens", "n_chars",
        "mean_quality")

  /** c8: the data card at the per-SOURCE grain — real corpus datasheets
    * report per-domain rows beside the per-(lang, split) rollup (the t10
    * balancing grain: which crawl contributed what, at what quality —
    * e.g. the per-source tables in public corpus releases). Same single
    * projection + single grouped aggregate and the same integer-quotient
    * mean discipline as [[dataCard]] (q_sum is non-negative, so Spark's
    * truncating `div` and DuckDB's flooring `//` agree); `source` adds
    * one grouping column, so the aggregate stays map-side-combined and
    * scan-bound at any corpus size (domains ≪ docs). */
  def dataCardByDomain: Q = (s, d) =>
    documents(s, d)
      .select(col("source"), col("lang"),
        length(col("text")).as("n_chars_doc"),
        wordStats(col("text")).as("ws"))
      .select(col("source"), col("lang"), col("n_chars_doc"),
        col("ws.n_words").as("n_words"),
        qualityScoreCol(col("ws.n_words"), uniqRatioOf(col("ws")),
          stopRatioOf(col("ws"))).as("q"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_words").cast("long")).as("n_tokens"),
        sum(col("n_chars_doc").cast("long")).as("n_chars"),
        sum(round(col("q") * 1e8).cast("bigint")).as("q_sum"))
      .withColumn("mean_quality",
        expr("cast(q_sum div n_docs as double) / 1e8"))
      .select("source", "lang", "n_docs", "n_tokens", "n_chars",
        "mean_quality")

  // ---- h1: raw-web extraction (HTML -> clean text) ----

  /** The h1 fixture: deterministic HTML synthesized IN-QUERY around each
    * document's text, identically in both engines (the corpus tables ship
    * plain text, and the extraction stage needs markup to earn its keep).
    * Structure mirrors what a crawler actually hands the pipeline: a head
    * with script+style payloads, a link-dense nav bar, an HTML comment,
    * the body text as paragraphs (broken at ' the ' — the fixture text is
    * space-separated words with no sentence punctuation), and an
    * entity-bearing footer. */
  private[graft] def htmlFixture(idCast: String): String =
    s"""concat('<html><head><title>Doc ', $idCast, '</title>',
       | '<script type="text/javascript">var t = "UA-', $idCast,
       | '"; track(t);</script>',
       | '<style>.nav a{color:#336; padding:2px}</style></head>',
       | '<body><div id="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>',
       | '<!-- rendered build 2024 -->',
       | '<p>', replace(text, ' the ', ' </p><p>the '), '</p>',
       | '<div class="footer"><a href="/terms">Terms &amp; Conditions</a> &#169; 2024</div>',
       | '</body></html>')""".stripMargin

  /** h1: raw-web extraction — HTML to clean text, the CCNet/trafilatura
    * stage every public corpus run starts with (the grain real 100 TB
    * crawls arrive in; the reference's own web path extracts article text
    * before chunking, google_search.py:150-190). Four stages, all
    * map-side narrow (scan-speed at 100 TB, no shuffle):
    *  1. payload strip — script/style blocks and HTML comments removed
    *     whole (lazy-quantifier regex; no backreferences, so the same
    *     pattern runs under Java regex here and RE2 in the oracle);
    *  2. block segmentation — closing block-level tags and <br> become
    *     newlines, the text-flow boundaries boilerplate scoring needs;
    *  3. per-block scoring — anchor count BEFORE tag strip (the link
    *     signal dies with the tags), then tag strip, basic entity decode,
    *     whitespace collapse, word count;
    *  4. boilerplate filter — keep blocks with >= 5 words AND
    *     links*3 <= words (link-density): the nav dies on density, the
    *     footer and sub-5-word slivers on length — the jusText/CCNet
    *     block heuristic in its simplest deterministic form.
    * Output pins the SURGERY (clean_md5 over the reassembled text), not
    * just counts. Entity decode handles the 5 predefined XML entities +
    * nbsp; '&amp;' is decoded LAST so '&amp;lt;' does not double-decode. */
  def htmlExtract: Q = (s, d) =>
    htmlExtractOver(documents(s, d)
      .select(col("doc_id"), expr(htmlFixture("cast(doc_id as string)")).as("html")))

  /** h1 stages 1-3 over any frame with (doc_id, html): payload strip,
    * block segmentation, per-block scoring — everything up to (but not
    * including) the boilerplate filter, ending in the `scored` array of
    * (clean, links, nw) block structs. Shared by the filter
    * ([[htmlExtractOver]]) and the corpus block profile ([[h1Profile]])
    * so the knobs are derived from exactly the blocks they gate. */
  private[graft] def blockScored(html: DataFrame): DataFrame = {
    val entityDecode = (x: String) =>
      s"""replace(replace(replace(replace(replace(replace($x,
         | '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         | '&#39;', chr(39)), '&amp;', '&')""".stripMargin
    html
      .withColumn("h", expr(
        """regexp_replace(regexp_replace(regexp_replace(html,
          | '(?is)<script[^>]*>.*?</script>', ' '),
          | '(?is)<style[^>]*>.*?</style>', ' '),
          | '(?s)<!--.*?-->', ' ')""".stripMargin))
      .withColumn("h", expr(
        """regexp_replace(regexp_replace(h,
          | '(?i)</(p|div|h1|h2|h3|h4|h5|h6|li|tr|table|blockquote)>', chr(10)),
          | '(?i)<br[^>]*>', chr(10))""".stripMargin))
      .withColumn("cand", expr(
        s"""filter(transform(split(h, chr(10)), b -> struct(
           | trim(regexp_replace(${entityDecode("regexp_replace(b, '(?s)<[^>]*>', ' ')")},
           |   ' +', ' ')) AS clean,
           | size(regexp_extract_all(b, '(?i)<a[ >]', 0)) AS links)),
           | x -> x.clean != '')""".stripMargin))
      .withColumn("scored", expr(
        """transform(cand, x -> struct(x.clean AS clean, x.links AS links,
          | size(regexp_extract_all(x.clean, '[A-Za-z0-9]+', 0)) AS nw))""".stripMargin))
  }

  /** The extraction pipeline over any frame with (doc_id, html) — the
    * reusable form: the oracle-gated [[htmlExtract]] runs it over the
    * synthesized fixture, the composed web-curation query feeds its
    * output into the t3 scoring pieces, and the same narrow expressions
    * run unchanged under Structured Streaming (stateless projection).
    * The default knobs are the anchor operating point the oracles pin
    * (block word floor 5, link-density multiplier 3);
    * [[htmlExtractAuto]] derives them from the corpus instead.
    *
    * Known limitation shared by every regex-stage extractor in this
    * class (and by the RE2 oracle replay, so the gate is unaffected):
    * a literal `>` inside a QUOTED attribute value
    * (`<a title="a > b">`) ends the tag early and the attribute tail
    * leaks into text. Real-world incidence is low (HTML authors escape
    * it as `&gt;`); an extractor that must handle it needs a stateful
    * tokenizer, which is a different operator, not a regex fix. */
  private[graft] def htmlExtractOver(html: DataFrame, minWords: Int = 5,
      linkMult: Int = 3): DataFrame =
    blockScored(html)
      .withColumn("kept", expr(
        s"filter(scored, x -> x.nw >= $minWords AND x.links * $linkMult <= x.nw)"))
      .select(col("doc_id"),
        expr("cast(size(scored) as int)").as("n_blocks"),
        expr("cast(size(kept) as int)").as("n_kept"),
        expr("array_join(transform(kept, x -> x.clean), chr(10))").as("clean_text"))
      .select(col("doc_id"), col("n_blocks"), col("n_kept"),
        length(col("clean_text")).as("clean_len"),
        md5(col("clean_text")).as("clean_md5"), col("clean_text"))

  /** Corpus block profile for the h1 knobs: (median candidate-block
    * words, anchor tags per kiloword of block text), measured on the
    * SAME scored blocks the filter gates. One aggregation pass — at
    * corpus scale run it over a calibration sample and reuse the derived
    * knobs for the full pass (the `countEstimate` discipline of the
    * index operating points). */
  private[graft] def h1Profile(html: DataFrame): (Long, Long) = {
    val r = blockScored(html)
      .select(explode(col("scored")).as("b"))
      .agg(expr("percentile_approx(b.nw, 0.5)").as("median_nw"),
        sum(col("b.links").cast("long")).as("links"),
        sum(col("b.nw").cast("long")).as("nw"))
      .head()
    val nw = math.max(1L, r.getAs[Number]("nw").longValue)
    (r.getAs[Number]("median_nw").longValue,
      math.round(1000.0 * r.getAs[Number]("links").longValue / nw))
  }

  /** h1 with CORPUS-DERIVED knobs: the block word floor and link-density
    * multiplier come from [[h1Profile]] through the
    * [[OperatingPoint.h1MinWords]] / [[OperatingPoint.h1LinkDensityMult]]
    * derivations instead of pinned literals — the same no-pinned-knobs
    * discipline as the index geometries. On the anchor fixture corpus the
    * derived knobs equal the pinned (5, 3), so the oracle-gated h1/h2
    * output is unchanged there (pinned by spec). Pass `profileOf` to
    * derive from a calibration sample instead of the full input. */
  def htmlExtractAuto(html: DataFrame,
      profileOf: Option[DataFrame] = None): DataFrame = {
    val (medianNw, apk) = h1Profile(profileOf.getOrElse(html))
    htmlExtractOver(html, OperatingPoint.h1MinWords(medianNw),
      OperatingPoint.h1LinkDensityMult(apk))
  }

  /** h2: raw-web CURATION — the c1/c5 composition discipline applied at
    * the crawl grain: [[htmlExtractOver]] feeding the FACTORED t3 scoring
    * pieces ([[uniqRatio]]/[[stopRatio]]/[[qualityScoreCol]] — an inline
    * copy would silently drift from the oracle-gated t3) in ONE Catalyst
    * plan, no materialization between extraction and scoring. This is the
    * first two stages of every public corpus run (CCNet, FineWeb:
    * extract → quality-filter) as a single narrow projection chain —
    * map-side, no shuffle, scan-speed at 100 TB. */
  def webCuration: Q = (s, d) =>
    webCurationOver(htmlExtractOver(documents(s, d)
      .select(col("doc_id"),
        expr(htmlFixture("cast(doc_id as string)")).as("html"))))
      .select("doc_id", "n_kept", "clean_len", "n_words", "uniq_ratio",
        "stop_ratio", "quality_score", "keep")

  /** The h2 scoring over any [[htmlExtractOver]] output — the reusable
    * form: the oracle-gated [[webCuration]] drops `clean_text` for its
    * hash gate; the streaming crawl-ingest chain
    * ([[graft.streaming.Streams.crawlIngest]]) keeps it, because the
    * kept text IS what lands in the corpus. */
  private[graft] def webCurationOver(extracted: DataFrame): DataFrame =
    extracted
      .select(col("doc_id"), col("n_kept"), col("clean_len"),
        col("clean_text"),
        wordStats(expr("replace(clean_text, chr(10), ' ')")).as("ws"))
      .select(col("doc_id"), col("n_kept"), col("clean_len"),
        col("clean_text"),
        col("ws.n_words").as("n_words"),
        uniqRatioOf(col("ws")).as("uniq_ratio"),
        stopRatioOf(col("ws")).as("stop_ratio"))
      .withColumn("quality_score", qualityScoreCol(col("n_words"),
        col("uniq_ratio"), col("stop_ratio")))
      .withColumn("keep", col("quality_score") >= 0.5)

  /** c3: model-based quality filtering — a linear classifier over the t3
    * feature columns (the fastText/logistic-regression quality-filter
    * stage of public pipelines: CCNet, FineWeb). Weights are fixed config
    * here (a trained model would load them the same way); the decision
    * thresholds the LINEAR score — the sigmoid is monotone, so `z >= 0`
    * is exactly `p >= 0.5` without engine-divergent `exp` in the hash
    * path. Same narrow scan-speed shape as t3: the features never leave
    * the projection, so at 100 TB this runs at scan speed with column
    * pruning down to (doc_id, text). */
  def qualityLr: Q = (s, d) => qualityLrOf(documents(s, d))

  /** The c3/c9 feature projection, factored (the c1/t3 discipline): c3
    * scores it with fixed weights, c9 TRAINS weights on it — an inline
    * copy in either would silently drift from the other's oracle. */
  private[graft] def qualityFeaturesOf(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), col("text"), wordStats(col("text")).as("ws"))
      .select(col("doc_id"),
        least(col("ws.n_words").cast("double") / 100.0, lit(1.0))
          .as("f_len"),
        uniqRatioOf(col("ws")).as("f_uniq"),
        least(stopRatioOf(col("ws")) * 5.0, lit(1.0)).as("f_stop"),
        round(strippedLenOf(col("text"), col("ws")) /
          col("ws.n_words").cast("double"), 6).as("f_awl"),
        // c9's teacher label: the t3 score's own keep decision, composed
        // from the SAME raw pieces in the same projection (c3 drops it)
        (qualityScoreCol(col("ws.n_words"), uniqRatioOf(col("ws")),
          stopRatioOf(col("ws"))) >= 0.5).cast("double").as("y"))

  private[graft] def qualityLrOf(docsDf: DataFrame): DataFrame =
    qualityFeaturesOf(docsDf)
      .withColumn("z", round(lit(-2.1) + col("f_len") * 1.6 +
        col("f_uniq") * 1.8 + col("f_stop") * 1.1 - col("f_awl") * 0.1, 8))
      .withColumn("keep", col("z") >= 0)
      .select("doc_id", "f_len", "f_uniq", "f_stop", "f_awl", "z", "keep")

  /** c9: quality-classifier TRAINING — distilling the t3 heuristic gate
    * into a linear model by full-batch gradient descent over the corpus
    * (the FineWeb-edu shape: a teacher signal labels documents, a fast
    * linear student learns to reproduce it so the gate can run at scan
    * speed everywhere). The teacher label here is the oracle-gated t3
    * score's own keep decision (quality_score ≥ 0.5 recomposed from the
    * FACTORED feature pieces, so the label cannot drift from t3); a real
    * pipeline swaps in LLM judgments the same way.
    *
    * Execution is the graded part, and it is the industrial LR-training
    * shape (Spark MLlib's own loop): the feature projection is computed
    * ONCE and checkpointed, each round is one aggregate over it — a
    * per-row margin against the BROADCAST 1-row weight vector, gradient
    * contributions summed EXACTLY (each addend quantized at 1e-9 with
    * the moneySum floor(x+0.5) quantizer — pure IEEE, engine-identical —
    * and summed as decimal, so the gradient is partition-order-free and
    * safe past a long accumulator at 100 TB row counts), then one tiny
    * weight update. K rounds = K corpus passes, zero corpus shuffles —
    * at 100 TB each pass is a pruned columnar scan of 4 doubles.
    *
    * The squash is the Elliott "fast sigmoid" p = (m/(1+|m|)+1)/2
    * (Elliott 1993) rather than the logistic: monotone, same gradient
    * SHAPE, but pure +,*,/,abs — bit-identical in any IEEE engine, where
    * `exp` differs in the last ulp between libm implementations. Same
    * no-transcendentals-in-the-hash-path discipline as c3/t13.
    *
    * An EMPTY corpus yields null gradient sums over n = 0 and therefore
    * null weights — visibly null, never a silent zero-vector that could
    * pass for a trained model. */
  val LrTrainRounds = 6
  private val LrTrainRate = 4.0

  def lrTrain: Q = (s, d) => lrTrainOver(documents(s, d), LrTrainRounds)

  private[graft] def lrTrainOver(docsDf: DataFrame,
      rounds: Int): DataFrame = {
    val spark = docsDf.sparkSession
    // x_awl: the one feature outside [0,1] (avg word length ~4-8) is
    // unit-scaled /10 for training — unscaled it dominates the gradient
    // and full-batch descent oscillates (measured on the fixture);
    // standard practice, and the learned wa simply applies to f_awl/10
    val feats = qualityFeaturesOf(docsDf)
      .withColumn("x_awl", col("f_awl") / 10.0)
      .localCheckpoint(eager = false)
    // exact addend: quantize at 1e-9 (|p-y|·|x| ≤ ~7, so the scaled
    // addend fits a double exactly), sum as decimal — the moneySum rule
    def gsum(z: Column): Column =
      sum(floor(z * 1e9 + 0.5).cast("decimal(18,0)"))
    // DRIVER-HOSTED weight updates (the MLlib loop shape, the same
    // round-16 rework as the Lloyd loop): each round is ONE small-plan
    // aggregate job whose 6-value result row collects to the driver; the
    // weight step runs there on identical operands (decimal→double cast
    // == Decimal.toDouble, then the same rate/1e9/n double chain), so
    // weights are bit-identical to the former broadcast-crossJoin chain,
    // whose 6-round nested plan re-analyzed and re-built 2 broadcasts per
    // round inside one deep Catalyst tree. Null propagation (the
    // empty-corpus contract: visibly null weights, never a silent zero
    // vector) is preserved: a null gradient makes every later margin the
    // null literal, exactly like the broadcast-null arithmetic.
    var wv: Array[java.lang.Double] = Array(0.0, 0.0, 0.0, 0.0, 0.0)
    val outRows = new scala.collection.mutable.ArrayBuffer[
      (Int, java.lang.Double, java.lang.Double, java.lang.Double,
        java.lang.Double, java.lang.Double)](rounds)
    for (k <- 1 to rounds) {
      val m: Column =
        if (wv.exists(_ == null)) lit(null).cast("double")
        else lit(wv(0).doubleValue) +
          lit(wv(1).doubleValue) * col("f_len") +
          lit(wv(2).doubleValue) * col("f_uniq") +
          lit(wv(3).doubleValue) * col("f_stop") +
          lit(wv(4).doubleValue) * col("x_awl")
      val gRow = feats
        .withColumn("p", (m / (lit(1.0) + abs(m)) + 1.0) / 2.0)
        .withColumn("e", col("p") - col("y"))
        .agg(gsum(col("e")).as("gb"),
          gsum(col("e") * col("f_len")).as("gl"),
          gsum(col("e") * col("f_uniq")).as("gu"),
          gsum(col("e") * col("f_stop")).as("gs"),
          gsum(col("e") * col("x_awl")).as("ga"),
          count(lit(1)).as("n"))
        .head()
      val n = gRow.getLong(5)
      def step(i: Int): java.lang.Double = {
        if (wv(i) == null || gRow.isNullAt(i)) null
        else wv(i).doubleValue - LrTrainRate *
          (gRow.getDecimal(i).doubleValue() / 1e9 / n.toDouble)
      }
      wv = Array(step(0), step(1), step(2), step(3), step(4))
      outRows += ((k, wv(0), wv(1), wv(2), wv(3), wv(4)))
    }
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.parallelize(outRows.toSeq.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3, r._4, r._5, r._6)), 1),
      StructType(Seq(StructField("iter", IntegerType, nullable = false),
        StructField("wb", DoubleType), StructField("wl", DoubleType),
        StructField("wu", DoubleType), StructField("ws", DoubleType),
        StructField("wa", DoubleType))))
  }

  /** t13: perplexity filtering — the CCNet-stage language-model filter
    * (Wenzek et al. 2020 score docs with a KenLM model and keep the
    * low-perplexity head; FineWeb and friends inherit the shape). The
    * model here is a corpus-trained unigram LM with add-one smoothing and
    * a rare-word OOV floor (count < 2 words fall out of the vocab), which
    * is the seam a real pipeline fills with its trained model — the
    * DATAFLOW is the graded part: model building is one token groupBy,
    * scoring joins a BROADCAST model against the token stream (the model
    * is vocab-sized, never corpus-sized), and the per-doc reduce sums
    * INTEGER-SCALED log-probs (round(ln·1e6) as bigint) so the aggregate
    * is exact and order-independent — a double sum would hash-diverge on
    * partition order. avg surprisal thresholds the keep decision (exp is
    * monotone, so this IS the perplexity cut without exp in the hash
    * path, same discipline as c3). */
  def perplexityFilter: Q = (s, d) => {
    val (model, oov) = unigramModel(documents(s, d))
    surprisalScored(documents(s, d).select("doc_id", "text"), model, oov)
  }

  /** Library entrypoint: t13 with the model-build cost DECOUPLED from
    * corpus size — the CCNet shape the scaladoc above describes in prose
    * (Wenzek et al. train the LM once on a calibration corpus, then score
    * everything; the model never scales with the data being filtered).
    * Above [[OperatingPoint.perplexityCalibrationDocs]] the unigram model
    * trains on a deterministic md5-bucket CALIBRATION SAMPLE of ~that many
    * documents (the t6/t12 hash machinery under its own 'ppl:' salt, so
    * sampling never correlates with split or mixture decisions); at or
    * below the cutoff it is exactly [[perplexityFilter]]'s build. Scoring
    * is unchanged either way — one broadcast-model join over the full
    * corpus. Sample-vs-full keep-decision parity is spec-measured
    * (PipelineOpsSpec: ≥ 97% agreement at a forced half-corpus sample on the fixture);
    * the ≤ 7.0 threshold is an avg-surprisal-per-word cut, and sampled
    * counts scale ~proportionally (c and n shrink together inside
    * ln((c+1)/(n+v))), which is what makes the decision approximately
    * sample-invariant. */
  def perplexityAuto(corpus: DataFrame,
      countEstimate: Option[Long] = None): DataFrame = {
    val n = countEstimate.getOrElse(corpus.count())
    perplexitySampled(corpus, n, OperatingPoint.perplexityCalibrationDocs)
  }

  /** [[perplexityAuto]]'s core with the cutoff as a parameter (the spec
    * forces a small cutoff to measure parity at fixture scale). */
  private[graft] def perplexitySampled(corpus: DataFrame, n: Long,
      cutoff: Long): DataFrame = {
    val modelCorpus =
      if (n <= cutoff) corpus
      else {
        // keep ~cutoff docs: bucket into 1e6 and keep the head fraction —
        // deterministic, append-stable, independent of partitioning
        val keep = math.max(1L, (cutoff.toDouble / n.toDouble * 1e6).toLong)
        graft.functions.Md5Prefix.register(corpus.sparkSession)
        corpus.filter(expr(
          "md5_prefix(concat('ppl:', cast(doc_id as string)), 12) " +
            s"% 1000000 < $keep"))
      }
    val (model, oov) = unigramModel(modelCorpus)
    // the keep ceiling is corpus-DERIVED here (round 14): the pinned 7.0
    // literal is a fixture calibration — on a corpus whose surprisal base
    // rate shifts (×1000 disjoint vocabularies: +ln 1000 per word; any
    // multi-domain crawl: less, same direction) it degenerates to
    // keep-nothing while relative quality is unchanged. The median-anchored
    // ceiling keeps cutting the same RELATIVE tail; at the fixture it
    // reproduces the literal's decisions exactly (PipelineOpsSpec parity).
    val scored = surprisalAgg(corpus.select("doc_id", "text"), model, oov)
      .localCheckpoint(eager = false) // feeds the quantile AND the output
    val keepMicro = surprisalKeepMicroOf(scored)
    scored.select(col("doc_id"), col("n_words"), col("n_oov"),
      expr("cast((-sum_lp) div n_words as double) / 1e6").as("avg_surprisal"),
      (expr("(-sum_lp) div n_words") <= keepMicro).as("keep"))
  }

  /** ScaleProbe harness form of [[perplexityAuto]]. */
  private[graft] val perplexityAutoQ: Q =
    (s, d) => perplexityAuto(documents(s, d))

  /** The t13 model: (word → scaled logprob) plus the OOV floor, built from
    * any (doc_id, text) corpus. Vocab-sized frames — the broadcast side of
    * every scoring join. */
  private[graft] def unigramModel(corpus: DataFrame)
      : (DataFrame, DataFrame) = {
    val tokens = corpus.select(explode(split(col("text"), " ")).as("w"))
    val totals = tokens.agg(count(lit(1)).as("n"), countDistinct("w").as("v"))
    val model = tokens.groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2)
      .crossJoin(broadcast(totals))
      .select(col("w"), expr(
        "cast(round(ln((c + 1) / cast(n + v as double)) * 1e6) as bigint)")
        .as("lp"))
    val oov = totals.select(expr(
      "cast(round(ln(1.0 / cast(n + v as double)) * 1e6) as bigint)")
      .as("oov_lp"))
    (model, oov)
  }

  /** t13's scoring half over any (doc_id, text) frame — stateless w.r.t.
    * the corpus once the model frames exist, so the SAME call scores a
    * `readStream` of arriving documents against a static pre-trained
    * model (curation-on-ingest; StreamsSpec proves parity with batch). */
  private[graft] def surprisalScored(docs: DataFrame, model: DataFrame,
      oov: DataFrame, keepMicro: Long = 7000000L): DataFrame =
    surprisalAgg(docs, model, oov)
      .select(col("doc_id"), col("n_words"), col("n_oov"),
        // INTEGER quotient of the 1e6-scaled sum, display-scaled — the
        // c7 tie-proof discipline: round() of the double quotient hit a
        // real 6th-decimal tie at sf0.1 (one doc, Spark 3.402035 vs
        // DuckDB 3.402036). -sum_lp and n_words are both positive, so
        // Spark's truncating div and DuckDB's flooring // agree.
        // keep compares the INTEGER quotient against the micro ceiling
        // (micro <= 7000000 ⟺ micro/1e6 <= 7.0 exactly, so the pinned
        // t13 oracle is unchanged); the auto path passes a corpus-derived
        // ceiling ([[surprisalKeepMicroOf]]) instead of the literal.
        expr("cast((-sum_lp) div n_words as double) / 1e6")
          .as("avg_surprisal"),
        (expr("(-sum_lp) div n_words") <= keepMicro).as("keep"))

  /** Corpus-derived keep ceiling for the surprisal gate: the (approximate)
    * median of the corpus's integer micro-surprisal quotients, mapped
    * through [[OperatingPoint.surprisalKeepMicro]] (anchored to reproduce
    * the pinned 7.0 on the fixture). One single-row aggregate over the
    * scored frame — the quantile sketch is the scale form (an exact
    * percentile buffers a per-value count map); its tiny run-to-run
    * rigidity is irrelevant here because the ceiling gates a QUALITY
    * decision, not a hash-checked value (the pinned queries keep the
    * literal precisely so their oracles stay static). */
  private[graft] def surprisalKeepMicroOf(scoredAgg: DataFrame): Long = {
    val med = scoredAgg
      .agg(expr("percentile_approx((-sum_lp) div n_words, 0.5, 10000)"))
      .head().getLong(0)
    OperatingPoint.surprisalKeepMicro(med)
  }

  /** Vocab-row ceiling for the driver-hosted scoring arm: the model is
    * ALREADY broadcast-joined (vocab-sized by construction — the c ≥ 2
    * floor bounds it), so hosting it as an expression map is the same
    * memory class; ~1M entries ≈ the low-hundreds-MB a broadcast hash
    * relation of the same table would cost. Beyond it the join arm below
    * remains the honest plan. head(N+1) makes the probe itself bounded —
    * the driver never materializes an over-ceiling vocab. */
  private[graft] val SurprisalMaxVocab: Int = 1 << 20

  /** The exact-integer half of the scoring: (doc_id, n_words, sum_lp,
    * n_oov) — kept separate so c5's roll-up can aggregate the UNROUNDED
    * bigint sums across docs and stay order-independent.
    *
    * Scoring is the fused map-only reduction
    * ([[graft.functions.SurprisalSum]] — no token explosion, no join, no
    * exchange; §2.3 applied to the token stream) when the vocab fits
    * [[SurprisalMaxVocab]]; the explode + broadcast-join + groupBy form
    * ([[surprisalAggJoin]]) remains beyond it and as the spec's equality
    * oracle (SurprisalSumSpec). Null-text docs are dropped in both arms
    * (explode(null) emits no rows; the fused arm filters them).
    * Precondition (both arms, unchanged from the composed form): doc_id
    * identifies one document — the join arm GROUPS on (doc_id, n_words),
    * so duplicate ids with equal word counts would merge there while the
    * fused arm scores per input row; every caller passes the unique-keyed
    * documents/corpus frames. */
  private[graft] def surprisalAgg(docs: DataFrame, model: DataFrame,
      oov: DataFrame): DataFrame = {
    val rows = model.select(col("w"), col("lp")).head(SurprisalMaxVocab + 1)
    if (rows.length > SurprisalMaxVocab) surprisalAggJoin(docs, model, oov)
    else {
      val oovLp = oov.head().getLong(0)
      val vocab = new java.util.HashMap[
        org.apache.spark.unsafe.types.UTF8String, java.lang.Long](
        math.max(16, rows.length * 2))
      rows.foreach(r => vocab.put(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
        java.lang.Long.valueOf(r.getLong(1))))
      docs.filter(col("text").isNotNull)
        .select(col("doc_id"),
          graft.functions.SurprisalSum.score(col("text"), vocab, oovLp)
            .as("sp"))
        .select(col("doc_id"), col("sp.n_words").as("n_words"),
          col("sp.sum_lp").as("sum_lp"), col("sp.n_oov").as("n_oov"))
    }
  }

  /** The composed scoring arm SurprisalSum replaced — the beyond-ceiling
    * plan and the spec's equality oracle. */
  private[graft] def surprisalAggJoin(docs: DataFrame, model: DataFrame,
      oov: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        size(split(col("text"), " ")).as("n_words"),
        explode(split(col("text"), " ")).as("w"))
      .join(broadcast(model), Seq("w"), "left")
      .crossJoin(broadcast(oov))
      .groupBy("doc_id", "n_words")
      .agg(sum(coalesce(col("lp"), col("oov_lp"))).as("sum_lp"),
        sum(when(col("lp").isNull, 1).otherwise(0)).cast("int").as("n_oov"))

  // ---- DuckDB oracle SQL ----

  /** The h1 extraction pipeline as DuckDB CTEs ending in
    * `agg(doc_id, n_blocks, n_kept, clean_text)` — shared verbatim by the
    * h1 and h2 oracles so the composed query replays the IDENTICAL
    * extraction the standalone one hashes. */
  private val htmlExtractCtes: String =
    """WITH base AS (SELECT doc_id,
        |  concat('<html><head><title>Doc ', CAST(doc_id AS VARCHAR), '</title>',
        |   '<script type="text/javascript">var t = "UA-', CAST(doc_id AS VARCHAR),
        |   '"; track(t);</script>',
        |   '<style>.nav a{color:#336; padding:2px}</style></head>',
        |   '<body><div id="nav"><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></div>',
        |   '<!-- rendered build 2024 -->',
        |   '<p>', replace(text, ' the ', ' </p><p>the '), '</p>',
        |   '<div class="footer"><a href="/terms">Terms &amp; Conditions</a> &#169; 2024</div>',
        |   '</body></html>') AS html
        | FROM documents),
        | stripped AS (SELECT doc_id,
        |   regexp_replace(regexp_replace(regexp_replace(html,
        |     '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
        |     '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
        |     '(?s)<!--.*?-->', ' ', 'g') AS h FROM base),
        | broken AS (SELECT doc_id,
        |   regexp_replace(regexp_replace(h,
        |     '(?i)</(p|div|h1|h2|h3|h4|h5|h6|li|tr|table|blockquote)>', chr(10), 'g'),
        |     '(?i)<br[^>]*>', chr(10), 'g') AS h FROM stripped),
        | blocks AS (SELECT doc_id, string_split(h, chr(10)) AS bl FROM broken),
        | cand AS (SELECT doc_id, i AS pos,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(replace(
        |        regexp_replace(bl[i], '(?s)<[^>]*>', ' ', 'g'),
        |        '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', chr(39)), '&amp;', '&'),
        |      ' +', ' ', 'g')) AS clean,
        |    CAST(len(regexp_extract_all(bl[i], '(?i)<a[ >]')) AS INTEGER) AS links
        |  FROM blocks, UNNEST(range(1, len(bl)+1)) AS r(i)),
        | scored AS (SELECT doc_id, pos, clean, links,
        |    CAST(len(regexp_extract_all(clean, '[A-Za-z0-9]+')) AS INTEGER) AS nw
        |  FROM cand WHERE clean <> ''),
        | agg AS (SELECT doc_id,
        |    CAST(count(*) AS INTEGER) AS n_blocks,
        |    CAST(count(*) FILTER (WHERE nw >= 5 AND links*3 <= nw) AS INTEGER) AS n_kept,
        |    coalesce(string_agg(clean, chr(10) ORDER BY pos)
        |      FILTER (WHERE nw >= 5 AND links*3 <= nw), '') AS clean_text
        |  FROM scored GROUP BY doc_id)""".stripMargin

  /** DuckDB replay of [[bpeTrainOver]]: the K merge rounds unrolled as
    * chained CTEs (pairs_k → best_k → words_k), the v5-Lloyd oracle
    * pattern — each round a plain group-by + deterministic argmax + the
    * identical wrapped-symbol literal replace (chr(31)/chr(30) are the
    * same U+001F/U+001E sentinels the operator uses; both engines'
    * `replace` scans left-to-right without rescanning replacements, and
    * wrapped matches cannot share bytes, so replace-all IS greedy BPE). */
  private def bpeTrainOracleSql(rounds: Int): String = {
    val S = "chr(31)"; val E = "chr(30)"
    def round(k: Int): String = {
      val prev = s"words${k - 1}"
      val pairs =
        s"""pairs$k AS (SELECT syms[i] AS pair_left, syms[i+1] AS pair_right,
           |  CAST(sum(freq) AS BIGINT) AS cnt
           | FROM $prev, UNNEST(range(1, len(syms))) AS u(i)
           | GROUP BY 1, 2),
           |best$k AS (SELECT pair_left, pair_right, cnt FROM pairs$k
           | ORDER BY cnt DESC, pair_left, pair_right LIMIT 1)""".stripMargin
      val next = if (k == rounds) "" else
        s""",
           |words$k AS (SELECT string_split(substring(s2, 2, length(s2) - 2),
           |   $E || $S) AS syms, freq FROM (
           | SELECT replace($S || array_to_string(syms, $E || $S) || $E,
           |     $S || b.pair_left || $E || $S || b.pair_right || $E,
           |     $S || b.pair_left || b.pair_right || $E) AS s2, freq
           |  FROM $prev, best$k b))""".stripMargin
      pairs + next
    }
    val selects = (1 to rounds).map(k =>
      s"""SELECT $k AS rank, pair_left, pair_right,
         | pair_left || pair_right AS merged, cnt FROM best$k""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS w
       |  FROM documents),
       |words0 AS (SELECT list_append(list_transform(range(1, length(w) + 1),
       |   i -> substring(w, i, 1)), '</w>') AS syms, freq FROM (
       | SELECT w, CAST(count(*) AS BIGINT) AS freq FROM toks
       | WHERE regexp_matches(w, '^[a-z]+${"$"}') GROUP BY w)),
       |${(1 to rounds).map(round).mkString(",\n")}
       |$selects""".stripMargin
  }

  /** DuckDB replay of [[lrTrainOver]]: K gradient rounds unrolled as
    * chained CTEs (g_k → w_k), every arithmetic node the same tree the
    * Spark plan evaluates — Elliott squash (no transcendentals), addends
    * quantized floor(x·1e9 + 0.5) and summed exactly, two double
    * divisions per weight update. Bit-identical by construction. */
  private def lrTrainOracleSql(rounds: Int): String = {
    def g(k: Int): String = {
      def s(zExpr: String, out: String) =
        s"CAST(sum(CAST(floor($zExpr * 1e9 + 0.5) AS BIGINT)) AS DOUBLE) AS $out"
      s"""g$k AS (SELECT ${s("e", "gb")},
         |  ${s("e * f_len", "gl")}, ${s("e * f_uniq", "gu")},
         |  ${s("e * f_stop", "gs")}, ${s("e * x_awl", "ga")},
         |  count(*) AS n
         | FROM (SELECT *, (m / (1.0 + abs(m)) + 1.0) / 2.0 - y AS e FROM (
         |  SELECT f.*, w.wb + w.wl * f_len + w.wu * f_uniq +
         |    w.ws * f_stop + w.wa * x_awl AS m
         |  FROM feats f, w${k - 1} w))),
         |w$k AS (SELECT w.wb - $LrTrainRate * (g.gb / 1e9 / g.n) AS wb,
         |  w.wl - $LrTrainRate * (g.gl / 1e9 / g.n) AS wl,
         |  w.wu - $LrTrainRate * (g.gu / 1e9 / g.n) AS wu,
         |  w.ws - $LrTrainRate * (g.gs / 1e9 / g.n) AS ws,
         |  w.wa - $LrTrainRate * (g.ga / 1e9 / g.n) AS wa
         | FROM w${k - 1} w, g$k g)""".stripMargin
    }
    val selects = (1 to rounds).map(k =>
      s"SELECT $k AS iter, wb, wl, wu, ws, wa FROM w$k")
      .mkString("\nUNION ALL\n")
    s"""WITH feats AS (SELECT doc_id, f_len, f_uniq, f_stop, f_awl,
       |  f_awl / 10.0 AS x_awl,
       |  CAST(round(f_len * 0.4 + f_uniq * 0.3 + f_stop * 0.3, 8) >= 0.5
       |   AS DOUBLE) AS y
       | FROM (SELECT doc_id,
       |  least(CAST(len(words) AS DOUBLE) / 100.0, 1.0) AS f_len,
       |  round(len(list_distinct(words)) / CAST(len(words) AS DOUBLE), 6)
       |    AS f_uniq,
       |  least(round(len(list_filter(words,
       |     w -> w IN ('the','a','of','and','to','in','is'))) /
       |    CAST(len(words) AS DOUBLE), 6) * 5.0, 1.0) AS f_stop,
       |  round(length(regexp_replace(text, ' ', '', 'g')) /
       |    CAST(len(words) AS DOUBLE), 6) AS f_awl
       | FROM (SELECT doc_id, text, string_split(text, ' ') AS words
       |  FROM documents))),
       |w0 AS (SELECT 0.0 AS wb, 0.0 AS wl, 0.0 AS wu, 0.0 AS ws,
       |  0.0 AS wa),
       |${(1 to rounds).map(g).mkString(",\n")}
       |$selects""".stripMargin
  }

  /** DuckDB replay of [[langIdOver]] against any corpus relation — shared
    * by the t2 production gate (over `documents`) and the script-arm gate
    * (over the [[LangIdScriptRows]] VALUES). */
  private def langIdOracleSql(corpusRel: String): String =
    s"""SELECT doc_id, lang,
       | round(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is'))) / CAST(len(words) AS DOUBLE), 6) AS r_en,
       | round(len(list_filter(words, w -> w IN ('le','la','les','de','et','un'))) / CAST(len(words) AS DOUBLE), 6) AS r_fr,
       | round(len(list_filter(words, w -> w IN ('der','die','und','das','ein','zu'))) / CAST(len(words) AS DOUBLE), 6) AS r_de,
       | round(len(list_filter(words, w -> w IN ('el','los','y','en','que','se'))) / CAST(len(words) AS DOUBLE), 6) AS r_es,
       | round(len(regexp_extract_all(text, '$CjkClass')) / CAST(length(text) AS DOUBLE), 6) AS r_cjk,
       | round(len(regexp_extract_all(text, '$KanaClass')) / CAST(length(text) AS DOUBLE), 6) AS r_kana,
       | round(len(regexp_extract_all(text, '$HangulClass')) / CAST(length(text) AS DOUBLE), 6) AS r_hangul,
       | CASE WHEN r_kana >= 0.05 THEN 'ja'
       |  WHEN r_hangul >= 0.2 THEN 'ko'
       |  WHEN r_cjk >= 0.2 THEN 'zh'
       |  WHEN r_en >= r_fr AND r_en >= r_de AND r_en >= r_es THEN 'en'
       |  WHEN r_fr >= r_de AND r_fr >= r_es THEN 'fr'
       |  WHEN r_de >= r_es THEN 'de' ELSE 'es' END AS guess
       |FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS words
       |  FROM $corpusRel)""".stripMargin

  val oracle: Map[String, String] = Map(
    "t16_bpe_train" -> bpeTrainOracleSql(BpeTrainRounds),
    "c9_quality_lr_train" -> lrTrainOracleSql(LrTrainRounds),
    "h1_html_extract" ->
      s"""$htmlExtractCtes
         |SELECT doc_id, n_blocks, n_kept,
         | CAST(length(clean_text) AS INTEGER) AS clean_len,
         | md5(clean_text) AS clean_md5, clean_text
         |FROM agg""".stripMargin,
    "h2_web_curation" ->
      s"""$htmlExtractCtes,
         | ww AS (SELECT doc_id, n_kept,
         |   CAST(length(clean_text) AS INTEGER) AS clean_len,
         |   string_split(replace(clean_text, chr(10), ' '), ' ') AS words
         |  FROM agg)
         |SELECT *, quality_score >= 0.5 AS keep FROM (
         | SELECT *, round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4
         |   + uniq_ratio * 0.3 + least(stop_ratio * 5.0, 1.0) * 0.3, 8)
         |  AS quality_score FROM (
         |  SELECT doc_id, n_kept, clean_len,
         |   CAST(len(words) AS INTEGER) AS n_words,
         |   round(len(list_distinct(words)) / CAST(len(words) AS DOUBLE), 6)
         |    AS uniq_ratio,
         |   round(len(list_filter(words,
         |     w -> w IN ('the','a','of','and','to','in','is')))
         |     / CAST(len(words) AS DOUBLE), 6) AS stop_ratio
         |  FROM ww))""".stripMargin,
    "t11_sequence_pack" ->
      s"""WITH t AS (SELECT doc_id,
         |  CAST(doc_id % 8 AS INTEGER) AS shard,
         |  CAST(len(regexp_extract_all(text, '$BpeTokenRegex')) AS INTEGER)
         |   AS n_tokens
         | FROM documents),
         | o AS (SELECT *, CAST(COALESCE(SUM(CAST(n_tokens AS BIGINT)) OVER (
         |    PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |   AS start_off FROM t)
         |SELECT doc_id, shard, n_tokens, start_off,
         | CAST(floor(start_off / 2048.0) AS BIGINT) AS seq_id,
         | CASE WHEN n_tokens = 0 THEN CAST(1 AS BIGINT)
         |  ELSE CAST(floor((start_off + n_tokens - 1) / 2048.0) AS BIGINT)
         |   - CAST(floor(start_off / 2048.0) AS BIGINT) + 1 END AS n_seqs
         |FROM o""".stripMargin,
    "t10_domain_caps" ->
      """SELECT * FROM (SELECT doc_id, source, n_chars,
        |  CAST(row_number() OVER (PARTITION BY source
        |   ORDER BY n_chars DESC, doc_id) AS INTEGER) AS rk
        | FROM documents) WHERE rk <= 15""".stripMargin,
    "c2_mixture_weights" ->
      """WITH counts AS (SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM documents
        |  GROUP BY lang),
        | total AS (SELECT sum(n_docs) AS total_docs FROM counts)
        |SELECT lang, n_docs, sum_chars,
        | round(n_docs / CAST(total_docs AS DOUBLE), 6) AS actual_share,
        | CAST(CASE lang WHEN 'en' THEN 0.40 WHEN 'zh' THEN 0.15
        |  WHEN 'es' THEN 0.15 WHEN 'de' THEN 0.15 WHEN 'fr' THEN 0.15
        |  ELSE 0.0 END AS DOUBLE) AS target_share,
        | round(CAST(CASE lang WHEN 'en' THEN 0.40 WHEN 'zh' THEN 0.15
        |  WHEN 'es' THEN 0.15 WHEN 'de' THEN 0.15 WHEN 'fr' THEN 0.15
        |  ELSE 0.0 END AS DOUBLE)
        |  / round(n_docs / CAST(total_docs AS DOUBLE), 6), 6) AS weight,
        | round(CAST(CASE lang WHEN 'en' THEN 0.40 WHEN 'zh' THEN 0.15
        |  WHEN 'es' THEN 0.15 WHEN 'de' THEN 0.15 WHEN 'fr' THEN 0.15
        |  ELSE 0.0 END AS DOUBLE)
        |  / round(n_docs / CAST(total_docs AS DOUBLE), 6), 6) > 1.0
        |  AS oversample
        |FROM counts, total""".stripMargin,
    "t1_word_chunks" ->
      """SELECT doc_id, CAST(len(words) AS INTEGER) AS n_words,
        | CAST(i AS INTEGER) AS chunk_idx,
        | array_to_string(words[(i*50+1):((i+1)*50)], ' ') AS chunk,
        | CAST(length(array_to_string(words[(i*50+1):((i+1)*50)], ' ')) AS INTEGER)
        |  AS chunk_chars
        |FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        | UNNEST(range(0, CAST(ceil(len(words)/50.0) AS INT))) AS g(i)""".stripMargin,
    "t2_lang_id" -> langIdOracleSql("documents"),
    "t2_lang_id_scripts" -> {
      val scriptValues = LangIdScriptRows.map { case (id, lang, text) =>
        s"(CAST($id AS BIGINT), '$lang', '$text')"
      }.mkString(",\n        ")
      langIdOracleSql(
        s"""(SELECT * FROM (VALUES
           |  $scriptValues) t(doc_id, lang, text))""".stripMargin)
    },
    "t3_quality_score" ->
      """SELECT *, round(least(CAST(n_words AS DOUBLE) / 100.0, 1.0) * 0.4 + uniq_ratio * 0.3 +
        |  least(stop_ratio * 5.0, 1.0) * 0.3, 8) AS quality_score FROM (
        |SELECT doc_id,
        | CAST(length(text) AS INTEGER) AS len_chars,
        | CAST(len(words) AS INTEGER) AS n_words,
        | round(length(regexp_replace(text, ' ', '', 'g')) / CAST(len(words) AS DOUBLE), 6) AS avg_word_len,
        | round(len(list_distinct(words)) / CAST(len(words) AS DOUBLE), 6) AS uniq_ratio,
        | CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_alpha_tokens,
        | round(len(list_filter(words, w -> w IN ('the','a','of','and','to','in','is'))) / CAST(len(words) AS DOUBLE), 6) AS stop_ratio
        |FROM (SELECT doc_id, text, string_split(text, ' ') AS words FROM documents))""".stripMargin,
    "t5_token_count" ->
      s"""SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
         | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
         | CAST(len(regexp_extract_all(text, '$BpeTokenRegex')) AS INTEGER)
         |  AS n_bpe_tokens,
         | round(length(text) /
         |  CAST(len(regexp_extract_all(text, '$BpeTokenRegex')) AS DOUBLE), 6)
         |  AS chars_per_token
         |FROM documents""".stripMargin,
    "t5_bpe_token_count" ->
      // the closed form of the fixture merge table (see tokenCountBpe):
      // symbols = sum of pre-token match lengths (leading space → Ġ is
      // 1:1); each literal "er" and each literal "ers" merges once
      s"""SELECT doc_id, CAST(length(text) AS INTEGER) AS n_chars,
         | CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
         | CAST(sym - er - ers AS INTEGER) AS n_bpe_tokens,
         | round(length(text) / CAST(sym - er - ers AS DOUBLE), 6)
         |  AS chars_per_token
         |FROM (SELECT doc_id, text,
         |  coalesce(list_sum(list_transform(
         |    regexp_extract_all(text, '$BpeTokenRegex'),
         |    x -> length(x))), 0) AS sym,
         |  (length(text) - length(replace(text, 'er', ''))) // 2 AS er,
         |  (length(text) - length(replace(text, 'ers', ''))) // 3 AS ers
         | FROM documents)""".stripMargin,
    "t9_pii_redaction" ->
      """WITH corpus AS (SELECT doc_id, text ||
        |  CASE WHEN doc_id % 13 = 0 THEN ' contact user' ||
        |    CAST(doc_id AS VARCHAR) || '@example.com now' ELSE '' END ||
        |  CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-' ||
        |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now'
        |   ELSE '' END ||
        |  CASE WHEN doc_id % 7 = 0 THEN ' from 10.' ||
        |    CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
        |    CAST(doc_id % 100 AS VARCHAR) || ' today' ELSE '' END AS text
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(text,
        |   '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}')) AS INTEGER) AS n_emails,
        | CAST(len(regexp_extract_all(text,
        |   '[0-9]{3}[-][0-9]{3}[-][0-9]{4}')) AS INTEGER) AS n_phones,
        | CAST(len(regexp_extract_all(text,
        |   '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}')) AS INTEGER)
        |  AS n_ips,
        | CAST(length(text) AS INTEGER) AS len_before,
        | CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
        |   '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}', '<EMAIL>', 'g'),
        |   '[0-9]{3}[-][0-9]{3}[-][0-9]{4}', '<PHONE>', 'g'),
        |   '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}', '<IP>', 'g'))
        |  AS INTEGER) AS len_after,
        | len(regexp_extract_all(text,
        |   '[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}')) > 0
        | OR len(regexp_extract_all(text,
        |   '[0-9]{3}[-][0-9]{3}[-][0-9]{4}')) > 0
        | OR len(regexp_extract_all(text,
        |   '[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}')) > 0
        |  AS redacted
        |FROM corpus""".stripMargin,
    "t8_repetition" ->
      """SELECT doc_id,
        | round(list_max(list_transform(list_distinct(words),
        |    w -> len(list_filter(words, x -> x = w))))
        |   / CAST(len(words) AS DOUBLE), 6) AS top_word_frac,
        | round((len(g5) - len(list_distinct(g5)))
        |   / CAST(len(g5) AS DOUBLE), 6) AS dup_5gram_frac,
        | round(list_max(list_transform(list_distinct(words),
        |    w -> len(list_filter(words, x -> x = w))))
        |   / CAST(len(words) AS DOUBLE), 6) > 0.2
        |  OR round((len(g5) - len(list_distinct(g5)))
        |   / CAST(len(g5) AS DOUBLE), 6) > 0.15 AS repetitive
        |FROM (SELECT doc_id, words,
        |   list_transform(range(0, greatest(len(words)-5, 0) + 1),
        |     i -> array_to_string(words[(i+1):(i+5)], ' ')) AS g5
        |  FROM (SELECT doc_id, string_split(text, ' ') AS words
        |   FROM documents))""".stripMargin,
    "t7_decontamination" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
        | g AS (SELECT doc_id,
        |   unnest(list_transform(range(0, greatest(len(words)-8, 0) + 1),
        |     i -> array_to_string(words[(i+1):(i+8)], ' '))) AS g FROM w),
        | bench AS (SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0),
        | hits AS (SELECT g.doc_id, count(DISTINCT g.g) AS n_hits
        |   FROM g JOIN bench USING (g) GROUP BY g.doc_id)
        |SELECT w.doc_id, w.doc_id % 97 = 0 AS is_benchmark,
        | coalesce(h.n_hits, 0) AS n_hits,
        | coalesce(h.n_hits, 0) > 0 AS contaminated
        |FROM w LEFT JOIN hits h ON h.doc_id = w.doc_id""".stripMargin,
    "t6_stratified_sample" ->
      """SELECT doc_id, lang,
        | ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100
        |  AS bucket
        |FROM documents
        |WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 100
        | < CASE lang WHEN 'en' THEN 60 WHEN 'fr' THEN 30 ELSE 10 END""".stripMargin,
    "c5_curation_pipeline" ->
      """WITH ws AS (SELECT doc_id, text, string_split(text, ' ') AS words
        |  FROM documents),
        | qual AS (SELECT doc_id FROM (
        |  SELECT doc_id,
        |   least(CAST(len(words) AS DOUBLE) / 100.0, 1.0) AS f_len,
        |   round(len(list_distinct(words)) / CAST(len(words) AS DOUBLE), 6)
        |     AS f_uniq,
        |   least(round(len(list_filter(words,
        |      w -> w IN ('the','a','of','and','to','in','is'))) /
        |     CAST(len(words) AS DOUBLE), 6) * 5.0, 1.0) AS f_stop,
        |   round(length(regexp_replace(text, ' ', '', 'g')) /
        |     CAST(len(words) AS DOUBLE), 6) AS f_awl
        |  FROM ws)
        |  WHERE round(-2.1 + f_len * 1.6 + f_uniq * 1.8 + f_stop * 1.1
        |    - f_awl * 0.1, 8) >= 0),
        | w AS (SELECT doc_id, unnest(words) AS w FROM ws),
        | tot AS (SELECT count(*) AS n, count(DISTINCT w) AS v FROM w),
        | model AS (SELECT w,
        |   CAST(round(ln((count(*) + 1) /
        |     CAST((SELECT n + v FROM tot) AS DOUBLE)) * 1e6) AS BIGINT)
        |    AS lp
        |  FROM w GROUP BY w HAVING count(*) >= 2),
        | scored AS (SELECT w.doc_id,
        |   CAST(max(len(ws.words)) AS INTEGER) AS n_words,
        |   sum(COALESCE(m.lp, (SELECT CAST(round(ln(1.0 /
        |     CAST((SELECT n + v FROM tot) AS DOUBLE)) * 1e6) AS BIGINT))))
        |    AS sum_lp
        |  FROM w LEFT JOIN model m USING (w)
        |  JOIN ws ON ws.doc_id = w.doc_id
        |  GROUP BY w.doc_id
        |  HAVING ((-sum(COALESCE(m.lp, (SELECT CAST(round(ln(1.0 /
        |     CAST((SELECT n + v FROM tot) AS DOUBLE)) * 1e6) AS BIGINT)))))
        |    // CAST(max(len(ws.words)) AS BIGINT)) <= 7000000),
        | kept AS (SELECT s.doc_id, s.n_words, s.sum_lp, d.lang,
        |   ('0x' || substr(md5('split:' || CAST(s.doc_id AS VARCHAR)),
        |     1, 12))::BIGINT % 1000 AS bucket
        |  FROM scored s JOIN qual q USING (doc_id)
        |  JOIN documents d ON d.doc_id = s.doc_id)
        |SELECT CASE WHEN bucket < 980 THEN 'train'
        |  WHEN bucket < 990 THEN 'val' ELSE 'test' END AS split,
        | lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_words) AS BIGINT) AS sum_words,
        | ((-sum(sum_lp)) // CAST(sum(n_words) AS BIGINT)) / 1e6
        |  AS avg_surprisal
        |FROM kept GROUP BY 1, 2""".stripMargin,
    "t14_cdc_chunks" ->
      """WITH b AS (SELECT doc_id, CAST(i AS INTEGER) AS i
        |  FROM documents,
        |   UNNEST(range(16, greatest(length(text), 16) + 1)) AS r(i)
        |  WHERE i <= length(text)
        |   AND substring(md5(substring(text, i - 15, 16)), 1, 2) = '00'),
        | mx AS (SELECT doc_id, max(i) AS mx FROM b GROUP BY doc_id),
        | seg AS (
        |  SELECT doc_id,
        |    COALESCE(lag(i) OVER (PARTITION BY doc_id ORDER BY i), 0) + 1
        |     AS a, i AS b FROM b
        |  UNION ALL
        |  SELECT d.doc_id, COALESCE(m.mx, 0) + 1,
        |    CAST(length(d.text) AS INTEGER)
        |  FROM documents d LEFT JOIN mx m USING (doc_id)
        |  WHERE length(d.text) >= COALESCE(m.mx, 0) + 1)
        |SELECT s.doc_id,
        | CAST(row_number() OVER (PARTITION BY s.doc_id ORDER BY s.a) - 1
        |  AS INTEGER) AS chunk_idx,
        | s.a AS start, s.b - s.a + 1 AS chunk_len,
        | md5(substring(d.text, s.a, s.b - s.a + 1)) AS chunk_md5
        |FROM seg s JOIN documents d USING (doc_id)""".stripMargin,
    "c4_mixture_apply" ->
      """WITH counts AS (SELECT lang, count(*) AS n_docs FROM documents
        |  GROUP BY lang),
        | total AS (SELECT sum(n_docs) AS total_docs FROM counts),
        | w AS (SELECT lang,
        |   round(CAST(CASE lang WHEN 'en' THEN 0.40 WHEN 'zh' THEN 0.15
        |     WHEN 'es' THEN 0.15 WHEN 'de' THEN 0.15 WHEN 'fr' THEN 0.15
        |     ELSE 0.0 END AS DOUBLE)
        |    / round(n_docs / CAST(total_docs AS DOUBLE), 6), 6) AS weight
        |  FROM counts, total),
        | j AS (SELECT d.doc_id, d.lang, w.weight,
        |   ('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 12))
        |     ::BIGINT % 1000 AS bucket
        |  FROM documents d JOIN w USING (lang)),
        | c AS (SELECT doc_id, lang, weight,
        |   CAST(floor(weight) + CASE WHEN bucket <
        |      round((weight - floor(weight)) * 1000) THEN 1 ELSE 0 END
        |    AS INTEGER) AS n_copies FROM j)
        |SELECT doc_id, lang, weight, n_copies, CAST(r.i AS INTEGER)
        |  AS copy_idx
        |FROM c, UNNEST(range(0, n_copies)) AS r(i)
        |WHERE n_copies > 0""".stripMargin,
    "t13_perplexity" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        | tot AS (SELECT count(*) AS n, count(DISTINCT w) AS v FROM w),
        | model AS (SELECT w,
        |   CAST(round(ln((count(*) + 1) /
        |     CAST((SELECT n + v FROM tot) AS DOUBLE)) * 1e6) AS BIGINT)
        |    AS lp
        |  FROM w GROUP BY w HAVING count(*) >= 2),
        | oov AS (SELECT CAST(round(ln(1.0 /
        |    CAST((SELECT n + v FROM tot) AS DOUBLE)) * 1e6) AS BIGINT)
        |   AS oov_lp),
        | nd AS (SELECT doc_id,
        |   CAST(len(string_split(text, ' ')) AS INTEGER) AS n_words
        |  FROM documents),
        | scored AS (SELECT w.doc_id,
        |   sum(COALESCE(m.lp, (SELECT oov_lp FROM oov))) AS sum_lp,
        |   CAST(sum(CASE WHEN m.lp IS NULL THEN 1 ELSE 0 END) AS INTEGER)
        |    AS n_oov
        |  FROM w LEFT JOIN model m USING (w) GROUP BY w.doc_id)
        |SELECT nd.doc_id, nd.n_words, s.n_oov,
        | ((-s.sum_lp) // nd.n_words) / 1e6 AS avg_surprisal,
        | ((-s.sum_lp) // nd.n_words) / 1e6 <= 7.0 AS keep
        |FROM nd JOIN scored s USING (doc_id)""".stripMargin,
    "t12_split_assign" ->
      """SELECT doc_id, lang,
        | ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 12))
        |   ::BIGINT % 1000 AS bucket,
        | CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
        |    1, 12))::BIGINT % 1000 < 980 THEN 'train'
        |  WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
        |    1, 12))::BIGINT % 1000 < 990 THEN 'val'
        |  ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "c7_data_card" ->
      """WITH scored AS (SELECT lang,
        |  CASE WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
        |     1, 12))::BIGINT % 1000 < 980 THEN 'train'
        |   WHEN ('0x' || substr(md5('split:' || CAST(doc_id AS VARCHAR)),
        |     1, 12))::BIGINT % 1000 < 990 THEN 'val'
        |   ELSE 'test' END AS split,
        |  length(text) AS n_chars_doc,
        |  CAST(len(words) AS INTEGER) AS n_words,
        |  round(least(CAST(len(words) AS DOUBLE) / 100.0, 1.0) * 0.4 +
        |    round(len(list_distinct(words)) / CAST(len(words) AS DOUBLE), 6)
        |     * 0.3 +
        |    least(round(len(list_filter(words,
        |      w -> w IN ('the','a','of','and','to','in','is')))
        |      / CAST(len(words) AS DOUBLE), 6) * 5.0, 1.0) * 0.3, 8) AS q
        | FROM (SELECT doc_id, lang, text, string_split(text, ' ') AS words
        |       FROM documents))
        |SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_words) AS BIGINT) AS n_tokens,
        | CAST(sum(n_chars_doc) AS BIGINT) AS n_chars,
        | CAST(CAST(sum(CAST(round(q * 1e8) AS BIGINT)) AS BIGINT)
        |    // count(*) AS DOUBLE) / 1e8 AS mean_quality
        |FROM scored GROUP BY lang, split""".stripMargin,
    "c8_domain_card" ->
      """WITH scored AS (SELECT source, lang,
        |  length(text) AS n_chars_doc,
        |  CAST(len(words) AS INTEGER) AS n_words,
        |  round(least(CAST(len(words) AS DOUBLE) / 100.0, 1.0) * 0.4 +
        |    round(len(list_distinct(words)) / CAST(len(words) AS DOUBLE), 6)
        |     * 0.3 +
        |    least(round(len(list_filter(words,
        |      w -> w IN ('the','a','of','and','to','in','is')))
        |      / CAST(len(words) AS DOUBLE), 6) * 5.0, 1.0) * 0.3, 8) AS q
        | FROM (SELECT source, lang, text, string_split(text, ' ') AS words
        |       FROM documents))
        |SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_words) AS BIGINT) AS n_tokens,
        | CAST(sum(n_chars_doc) AS BIGINT) AS n_chars,
        | CAST(CAST(sum(CAST(round(q * 1e8) AS BIGINT)) AS BIGINT)
        |    // count(*) AS DOUBLE) / 1e8 AS mean_quality
        |FROM scored GROUP BY source, lang""".stripMargin,
    "t15_shuffle_shard" ->
      """WITH k AS (SELECT doc_id,
        |  ('0x' || substr(md5('shuffle42:' || CAST(doc_id AS VARCHAR)),
        |    1, 12))::BIGINT AS skey FROM documents)
        |SELECT doc_id, CAST(skey % 8 AS INTEGER) AS shard,
        | CAST(row_number() OVER (PARTITION BY skey % 8
        |   ORDER BY skey, doc_id) AS INTEGER) AS pos
        |FROM k""".stripMargin,
    "c3_quality_lr" ->
      """SELECT doc_id, f_len, f_uniq, f_stop, f_awl,
        | round(-2.1 + f_len * 1.6 + f_uniq * 1.8 + f_stop * 1.1
        |   - f_awl * 0.1, 8) AS z,
        | round(-2.1 + f_len * 1.6 + f_uniq * 1.8 + f_stop * 1.1
        |   - f_awl * 0.1, 8) >= 0 AS keep
        |FROM (SELECT doc_id,
        |  least(CAST(len(words) AS DOUBLE) / 100.0, 1.0) AS f_len,
        |  round(len(list_distinct(words)) / CAST(len(words) AS DOUBLE), 6)
        |    AS f_uniq,
        |  least(round(len(list_filter(words,
        |     w -> w IN ('the','a','of','and','to','in','is'))) /
        |    CAST(len(words) AS DOUBLE), 6) * 5.0, 1.0) AS f_stop,
        |  round(length(regexp_replace(text, ' ', '', 'g')) /
        |    CAST(len(words) AS DOUBLE), 6) AS f_awl
        | FROM (SELECT doc_id, text, string_split(text, ' ') AS words
        |  FROM documents))""".stripMargin,
    "t4_fingerprint" ->
      """SELECT doc_id, md5(text) AS content_hash,
        | list_min(list_transform(range(1, greatest(length(text)-7, 1) + 1),
        |  i -> md5(substr(text, i, 8)))) AS min_gram8,
        | list_min(list_transform(range(1, greatest(length(text)-15, 1) + 1),
        |  i -> md5(substr(text, i, 16)))) AS min_gram16
        |FROM documents""".stripMargin,
  )
}

package graft.ops

import graft.{Q, Tables}
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Corpus-assembly operator surface (split / mix / sample / pack) —
  * every decision is md5-derived, so all four queries are bit-exact
  * against the DuckDB oracle: the oracle recomputes the same hashes.
  *
  * DuckDB's `CAST(concat('0x', hex) AS INTEGER)` mirrors Spark's
  * `conv(hex, 16, 10)` (same trick as the text fingerprints). */
object CorpusQueries {

  /** DuckDB twin of [[Corpus.unitBucket]]. */
  private[ops] def bucketSql(key: String, salt: String): String =
    s"CAST(concat('0x', substr(md5(CAST($key AS VARCHAR) || ':$salt'), 1, 4)) AS INTEGER)"

  /** Deterministic ≈80/10/10 train/val/test assignment per document.
    * Scale shape: pure projection over the scan — no exchange at all
    * (PlanSpec "corpus_split: pure projection" pins this). */
  val split: Q = Q(
    "corpus_split",
    s"""SELECT doc_id,
       |  CASE WHEN b < ${Corpus.TrainUpper} THEN 'train'
       |       WHEN b < ${Corpus.ValUpper} THEN 'val'
       |       ELSE 'test' END AS split
       |FROM (SELECT doc_id, ${bucketSql("doc_id", "split")} AS b FROM documents)""".stripMargin
  ) { (s, d) =>
    Corpus.hashSplit(Tables.documents(s, d), col("doc_id"))
      .select("doc_id", "split")
  }

  /** Data mixing: per-source sampling rates (sources cycle through
    * 1.0 / 0.5 / 0.25 by their numeric suffix — the "keep all of books,
    * half of web, a quarter of crawl" pattern). A deterministic filter
    * evaluated at the scan stage — shuffle-free (PlanSpec pins this);
    * a 0.25-rate source costs a 0.25-size scan of its rows. */
  val mixture: Q = Q(
    "corpus_mixture",
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source, ${bucketSql("doc_id", "mix")} AS b,
       |    CASE TRY_CAST(regexp_extract(source, '([0-9]+)$$', 1) AS INTEGER) % 3
       |      WHEN 0 THEN 65536 WHEN 1 THEN 32768 ELSE 16384 END AS keep_below
       |  FROM documents)
       |WHERE b < keep_below""".stripMargin
  ) { (s, d) =>
    val suffix = regexp_extract(col("source"), "([0-9]+)$", 1).cast("int")
    // % (not pmod) to mirror the oracle's remainder operator exactly;
    // equivalent here (regex digits are non-negative) but one fewer
    // semantic divergence to remember
    val rate = when(suffix % 3 === 0, 1.0)
      .when(suffix % 3 === 1, 0.5).otherwise(0.25)
    Corpus.mixtureSample(Tables.documents(s, d), col("doc_id"), rate)
      .select("doc_id", "source")
  }

  /** Temperature-scaled language rebalancing (α=0.5, target ≈250 docs):
    * the fixture's lang distribution is skewed (en 218 vs fr 64 at
    * sf0.01), so the α<1 rule visibly upweights the low-resource
    * languages (measured rates 0.35 en vs 0.65 fr) — proportional
    * sampling would keep 0.5 of each. Rates are a tiny per-source
    * aggregate broadcast back; the keep decision is the same md5 bucket
    * filter as corpus_mixture, bit-exact in DuckDB. */
  val temperatureMix: Q = Q(
    "corpus_temperature_mix",
    s"""WITH c AS (SELECT lang, count(*) AS n_s FROM documents GROUP BY 1),
       |z AS (SELECT sum(pow(n_s, 0.5)) AS z FROM c),
       |r AS (SELECT lang, round(least(1.0, pow(n_s, 0.5) / z.z * 250 / n_s), 6) AS rate
       |      FROM c CROSS JOIN z)
       |SELECT doc_id, lang, rate FROM documents JOIN r USING (lang)
       |WHERE ${bucketSql("doc_id", "mix")} < CAST(round(rate * 65536) AS INTEGER)""".stripMargin
  ) { (s, d) =>
    val docs = Tables.documents(s, d)
    val rates = Corpus.temperatureRates(docs, col("lang"), alpha = 0.5,
      budget = 250L).withColumnRenamed("src", "lang")
    Corpus.mixtureSample(docs.join(broadcast(rates), "lang"),
        col("doc_id"), col("rate"))
      .select("doc_id", "lang", "rate")
  }

  /** Exactly-3-per-(source, lang) deterministic sample — the eval-set /
    * inspection-sample builder. One exchange on the stratum key
    * (PlanSpec pins the count). */
  val stratified: Q = Q(
    "corpus_stratified_sample",
    s"""SELECT doc_id, source, lang, CAST(rn AS INTEGER) AS rn FROM (
       |  SELECT doc_id, source, lang,
       |    row_number() OVER (PARTITION BY source, lang
       |      ORDER BY ${bucketSql("doc_id", "strat")}, doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= 3""".stripMargin
  ) { (s, d) =>
    Corpus.stratifiedSample(Tables.documents(s, d),
        Seq("source", "lang"), k = 3, key = col("doc_id"))
      .select("doc_id", "source", "lang", "rn")
  }

  /** Pack each source's documents into ~2000-BPE-token training shards
    * (contiguous running-sum chunking; weight = the BPE pre-token count
    * used for LLM token budgeting). One exchange + one sort per source
    * (PlanSpec pins the exchange count). */
  val packShards: Q = Q(
    "corpus_pack_shards",
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_extract_all(lower(text), '${TextFunctions.BpePattern}')) AS INTEGER) AS n_bpe
       |  FROM documents)
       |SELECT doc_id, source, n_bpe,
       |  CAST((sum(n_bpe) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bpe) // 2000 AS BIGINT) AS shard
       |FROM t""".stripMargin
  ) { (s, d) =>
    Corpus.packShards(
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe")),
      partitionKey = col("source"), order = col("doc_id"),
      weight = col("n_bpe"), budget = 2000L)
  }

  /** Shard ASSEMBLY — the step after [[packShards]]' assignment: each
    * (source, shard)'s documents concatenated in pack order with a
    * double-newline separator, i.e. the actual training-sequence bytes a
    * writer would emit. The shard md5 proves the assembled byte stream,
    * not just the grouping. One exchange total: the pack window hashes
    * on source, and source partitioning already satisfies the
    * (source, shard) aggregation's clustering (PlanSpec pins the
    * exchange count); per-group state is one shard's docs — bounded by
    * the token budget. */
  val shardTexts: Q = Q(
    "corpus_shard_texts",
    s"""WITH t AS (
       |  SELECT doc_id, source, text,
       |    CAST(len(regexp_extract_all(lower(text), '${TextFunctions.BpePattern}')) AS INTEGER) AS n_bpe
       |  FROM documents WHERE text IS NOT NULL),
       |p AS (
       |  SELECT doc_id, source, text, n_bpe,
       |    CAST((sum(n_bpe) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bpe) // 2000 AS BIGINT) AS shard
       |  FROM t)
       |SELECT source, shard, CAST(count(*) AS INTEGER) AS n_docs,
       |  CAST(sum(n_bpe) AS BIGINT) AS shard_tokens,
       |  md5(string_agg(text, chr(10) || chr(10) ORDER BY doc_id)) AS shard_md5
       |FROM p GROUP BY 1, 2""".stripMargin
  ) { (s, d) =>
    val packed = Corpus.packShards(
      Tables.documents(s, d).where(col("text").isNotNull)
        .select(col("doc_id"), col("source"), col("text"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe")),
      partitionKey = col("source"), order = col("doc_id"),
      weight = col("n_bpe"), budget = 2000L)
    packed.groupBy("source", "shard")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(col("n_bpe")).cast("long").as("shard_tokens"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          x => x.getField("text")), "\n\n")).as("shard_md5"))
  }

  /** Concat-then-chunk packing coordinates ([[Corpus.packSequences]]):
    * every document's token span and (sequence, offset) boundaries under
    * 1024-token fixed sequences per source. The integer-only layout
    * arithmetic reproduces bit-for-bit in ANSI SQL, so this one is
    * oracle-checked end-to-end (window + div/mod, no floats). */
  val packSequences: Q = Q(
    "corpus_pack_sequences",
    s"""WITH t AS (
       |  SELECT doc_id, source,
       |    CAST(len(regexp_extract_all(lower(text), '${TextFunctions.BpePattern}')) AS INTEGER) AS n_bpe
       |  FROM documents WHERE text IS NOT NULL),
       |c AS (
       |  SELECT doc_id, source, n_bpe,
       |    sum(n_bpe) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM t WHERE n_bpe >= 1)
       |SELECT doc_id, source, n_bpe,
       |  CAST(cum - n_bpe AS BIGINT) AS tok_start,
       |  CAST(cum AS BIGINT) AS tok_end,
       |  CAST((cum - n_bpe) // 1024 AS BIGINT) AS seq_start,
       |  CAST((cum - n_bpe) % 1024 AS BIGINT) AS off_start,
       |  CAST((cum - 1) // 1024 AS BIGINT) AS seq_end,
       |  CAST((cum - 1) % 1024 + 1 AS BIGINT) AS off_end
       |FROM c""".stripMargin
  ) { (s, d) =>
    Corpus.packSequences(
      Tables.documents(s, d).where(col("text").isNotNull)
        .select(col("doc_id"), col("source"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe"))
        .where(col("n_bpe") >= 1),
      partitionKey = col("source"), order = col("doc_id"),
      weight = col("n_bpe"), seqLen = 1024L)
  }

  def all: Seq[Q] = Seq(split, mixture, temperatureMix, stratified, packShards,
    shardTexts, packSequences)
}

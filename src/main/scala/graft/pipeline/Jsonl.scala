package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JSONL (newline-delimited JSON) source/sink — the interchange
  * format of LLM corpus releases (C4, The Pile, RedPajama, FineWeb
  * all ship as `*.jsonl[.gz|.zst]`); this is how corpora ENTER and
  * LEAVE the engine, with parquet as the internal format.
  *
  * The 100-TB rules are baked into the API rather than left to
  * caller discipline:
  *
  *   - reads take an EXPLICIT schema, always — schema inference is a
  *     second full pass over the corpus and silently widens types on
  *     dirty rows, so there is deliberately no inferring overload;
  *   - malformed lines land in a `_corrupt` column (PERMISSIVE mode)
  *     instead of failing the job — a web-scale JSONL drop always
  *     contains a few broken lines, and dropping them silently
  *     (DROPMALFORMED) would make ingest counts irreproducible;
  *   - only UNCOMPRESSED output is splittable; a compressed JSONL
  *     file (`.gz`, `.zst`) is ONE input split, so parallelism =
  *     file count — the shard-manifest operators exist to make that
  *     count right. gzip ships with every Hadoop; zstd additionally
  *     needs the Hadoop native codec (absent in this runtime — the
  *     option passes through to deployments that carry it, gzip is
  *     the tested interchange path).
  */
object Jsonl {

  /** Write `df` as JSONL. `compression`: None (splittable), or a
    * Hadoop codec name ("gzip"; "zstd" where the native codec is
    * deployed) for interchange.
    */
  def write(df: DataFrame, path: String,
      compression: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    compression.fold(w)(c => w.option("compression", c)).json(path)
  }

  /** Read JSONL with an explicit DDL schema ("doc_id LONG, text
    * STRING, ..."). Malformed lines surface as non-null `_corrupt`;
    * well-formed rows have it null. Filter or fail on it explicitly.
    */
  def read(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read
      .schema(ddl + ", _corrupt STRING")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
}

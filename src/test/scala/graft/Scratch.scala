package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Throwaway micro-bench for the BPE-family investigation (test scope,
  * not part of any suite; delete when the round closes). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(appName = "scratch")
    import graft.operators.{Parallelism, Vocab}

    def time(name: String)(f: => DataFrame): Unit = {
      // warm
      f.write.format("noop").mode("overwrite").save()
      val runs = (0 until 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $name%-40s best=${runs.min}%6.3f all=" +
        runs.map(t => f"$t%.3f").mkString(","))
    }

    val docs = Tables.documents(spark, dir)
    val text = docs.select(col("text").as("_t"))

    time("scan only") { text }
    time("fanout only") { Parallelism.fanOutScan(text) }
    time("explode+count (no fanout)") {
      text.select(explode(array_remove(split(col("_t"), "\\s+"), ""))
        .as("_w")).groupBy(col("_w")).agg(count(lit(1)).as("w"))
    }
    time("explode+count (fanout)") {
      Parallelism.fanOutScan(text)
        .select(explode(array_remove(split(col("_t"), "\\s+"), ""))
          .as("_w")).groupBy(col("_w")).agg(count(lit(1)).as("w"))
    }
    // the dict + charInit shape of bpeMergesChar
    time("dict+charInit (fanout)") {
      Parallelism.fanOutScan(text)
        .select(explode(array_remove(split(col("_t"), "\\s+"), ""))
          .as("_w")).groupBy(col("_w")).agg(count(lit(1)).as("w"))
        .select(Vocab.charInit(col("_w"), "</w>").as("s"), col("w"))
    }
    // one pair-count pass over the dict (the bpeTrain round-1 shape)
    time("pair-count over dict") {
      val d = Parallelism.fanOutScan(text)
        .select(explode(array_remove(split(col("_t"), "\\s+"), ""))
          .as("_w")).groupBy(col("_w")).agg(count(lit(1)).as("w"))
        .select(Vocab.charInit(col("_w"), "</w>").as("s"), col("w"))
      d.select(col("w"), explode(when(size(col("s")) >= 2,
        zip_with(
          slice(col("s"), lit(1), size(col("s")) - 1),
          slice(col("s"), lit(2), size(col("s")) - 1),
          (a, b) => struct(a.as("l"), b.as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>")))
        .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("w")).as("n"))
    }
    // encode passes: train a 4-merge char table once, then time the
    // dictEnc universe pass and the corpus encode with/without fan-out
    val merges = Vocab.bpeMergesChar(docs, col("text"), nMerges = 4,
      minCount = 2)
    val (ls0, rs0) = Vocab.collectMergeTable(merges)
    val ls = typedlit(ls0); val rs = typedlit(rs0)
    def dictEnc(in: DataFrame): DataFrame = in
      .select(explode(array_remove(split(col("_t"), "\\s+"), "")).as("_w"))
      .distinct()
      .select(graft.functions.BpeExprs.encode(
        Vocab.charInit(col("_w"), "</w>"), ls, rs, "").as("bpe"))
    time("dictEnc universe (no fanout)") { dictEnc(text) }
    time("dictEnc universe (fanout)") { dictEnc(Parallelism.fanOutScan(text)) }
    def corpusEnc(in: DataFrame): DataFrame = {
      val words = array_remove(split(col("_t"), "\\s+"), "")
      in.select(col("id"),
        flatten(transform(words, w =>
          graft.functions.BpeExprs.encode(
            Vocab.charInit(w, "</w>"), ls, rs, ""))).as("bpe"))
        .withColumn("n_tokens", size(col("bpe")).cast("long"))
    }
    val idText = docs.filter(col("text").isNotNull)
      .select(col("doc_id").as("id"), col("text").as("_t"))
    time("corpus encode (no fanout)") { corpusEnc(idText) }
    time("corpus encode (fanout)") { corpusEnc(Parallelism.fanOutScan(idText)) }
    spark.stop()
  }
}

package graft

import graft.build.IndexBuilder
import graft.fixtures.Transcripts
import graft.verify.IndexVerifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.util.Try

/** One-off corruption-injection hunt for the CheckIndex analog (dev main,
  * not part of the suite): build one good index, apply a semantic row-level
  * corruption per scenario to a COPY, and require IndexVerifier to detect
  * it (non-empty violations or a decode-invariant exception). Proves the
  * verifier's checks fire, not just that good indexes pass — CheckIndex's
  * own test discipline (reference TestCheckIndex corrupts then expects
  * detection).
  */
object DevVerifierHunt {

  private def copyDir(src: Path, dst: Path): Unit = {
    Files.walk(src).forEach { p =>
      val t = dst.resolve(src.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else Files.copy(p, t, StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** Read table, mutate via f (rows already materialized), overwrite. */
  private def mutate(spark: SparkSession, dir: String, table: String)
                    (f: DataFrame => DataFrame): Unit = {
    val path = s"$dir/$table"
    val rows = spark.read.parquet(path).cache()
    rows.count() // materialize before the overwrite
    val out = f(rows).cache()
    out.count()
    out.write.mode("overwrite").parquet(path)
    rows.unpersist(); out.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val good = Files.createTempDirectory("graft_verhunt_good")
    IndexBuilder.buildFromTurns(Transcripts.dataset(spark, 80), good.toString)
    require(IndexVerifier.verify(spark, good.toString).isEmpty, "baseline index not clean")

    var fails = 0
    def scenario(name: String)(corrupt: String => Unit): Unit = {
      val dir = Files.createTempDirectory(s"graft_verhunt_$name")
      copyDir(good, dir)
      corrupt(dir.toString)
      val detected = Try(IndexVerifier.verify(spark, dir.toString)) match {
        case scala.util.Success(errs) => errs.nonEmpty
        case scala.util.Failure(_)    => true // decode require tripped in a task
      }
      if (!detected) { fails += 1; println(s"VERIFIER-MISS $name: corruption NOT detected") }
      else println(s"detected: $name")
    }

    scenario("norms_drop_row") { d =>
      mutate(spark, d, "norms")(n => n.limit(n.count().toInt - 1))
    }
    scenario("norms_len_bump") { d =>
      mutate(spark, d, "norms") { n =>
        val first = n.select(min("doc_id")).head().getLong(0)
        n.withColumn("len", col("len") + when(col("doc_id") === first, 1).otherwise(0))
      }
    }
    scenario("termdict_df_bump") { d =>
      mutate(spark, d, "termdict")(t =>
        t.withColumn("df", col("df") + when(col("term_id") === 0L, 1).otherwise(0)))
    }
    scenario("termdict_order_swap") { d =>
      mutate(spark, d, "termdict") { t =>
        val t0 = t.filter(col("term_id") === 0L).select("term").head().getString(0)
        val t1 = t.filter(col("term_id") === 1L).select("term").head().getString(0)
        t.withColumn("term",
          when(col("term_id") === 0L, t1).when(col("term_id") === 1L, t0)
            .otherwise(col("term")))
      }
    }
    scenario("termdict_id_gap") { d =>
      mutate(spark, d, "termdict")(t =>
        t.withColumn("term_id",
          when(col("term_id") === 0L, lit(1000000L)).otherwise(col("term_id"))))
    }
    scenario("postings_drop_term") { d =>
      mutate(spark, d, "postings")(p => p.filter(col("term_id") =!= 0L))
    }
    scenario("postings_orphan_term") { d =>
      mutate(spark, d, "postings") { p =>
        val anyTerm = p.select(min("term_id")).head().getLong(0)
        p.union(p.filter(col("term_id") === anyTerm)
          .withColumn("term_id", lit(123456789L)))
      }
    }
    scenario("postings_duplicate_blocks") { d =>
      mutate(spark, d, "postings")(p => p.union(p.filter(col("term_id") === 0L)))
    }
    scenario("postings_maxtf_bump") { d =>
      mutate(spark, d, "postings") { p =>
        val anyTerm = p.select(min("term_id")).head().getLong(0)
        p.withColumn("max_tf", col("max_tf") + when(col("term_id") === anyTerm, 1).otherwise(0))
      }
    }
    scenario("stats_sumdf_bump") { d =>
      mutate(spark, d, "stats")(s => s.withColumn("sum_df", col("sum_df") + 1))
    }
    scenario("docmap_drop_row") { d =>
      if (Files.exists(Paths.get(s"$d/docmap")))
        mutate(spark, d, "docmap")(m => m.limit(m.count().toInt - 1))
      else println("  (no docmap table in batch build — skipped)")
    }

    println(s"VERIFIER_HUNT_RESULT fails=$fails")
    if (fails > 0) sys.exit(1)
  }
}

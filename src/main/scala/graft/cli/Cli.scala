package graft.cli

import org.apache.spark.sql.SparkSession

import graft.io.Envelope
import graft.ops.VectorStore

/** CLI frontend mirroring the reference's command surface and output
  * format (`/root/reference/src/main.cpp:29-35,51-164`) so behavioral
  * diffs against the compiled reference are scriptable:
  *
  *   init, add, get, update, delete, rebuild, search
  *
  * Float printing follows C++ default ostream formatting (6 significant
  * digits, trailing zeros stripped — `main.cpp:115-116` prints
  * `Dist: 0.180278` for sqrt(0.0325)). `rebuild` is a parity no-op plus
  * message: the exact path needs no index and the reference CLI's own
  * rebuild is redundant (SURVEY §3 entry point 3, [verified]).
  */
object Cli {

  /** C++ `operator<<(float)` default formatting: 6 significant digits,
    * fixed or scientific by magnitude, trailing zeros stripped. */
  private[cli] def cppNum(d: Double): String = {
    if (d == d.toLong && math.abs(d) < 1e15) return d.toLong.toString
    val s = f"$d%.6g"
    if (s.contains('e') || s.contains('E')) {
      // strip zeros in mantissa: 1.50000e+07 → 1.5e+07
      val Array(m, e) = s.split("[eE]")
      val m2 = if (m.contains('.')) m.reverse.dropWhile(_ == '0').stripPrefix(".").reverse else m
      s"${m2}e$e"
    } else if (s.contains('.')) {
      s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
    } else s
  }

  private def parseVector(s: String, dim: Int): Array[Float] = {
    val vec = s.split(",").map { item =>
      try item.trim.toFloat
      catch {
        case _: NumberFormatException =>
          // reference text, main.cpp:16
          throw new IllegalArgumentException(
            "Invalid vector format. Must be comma-separated floats.")
      }
    }
    if (dim > 0 && vec.length != dim)
      throw new IllegalArgumentException(
        s"Vector dimension mismatch. Expected $dim got ${vec.length}")
    vec
  }

  /** The reference rebuilds its index inside every `load()`/`init` and
    * warns on stderr when the db is empty (vectordb.cpp:106-108) —
    * observable CLI behavior, mirrored for byte parity. */
  private def warnIfEmpty(db: VectorStore): VectorStore = {
    if (db.toDF.isEmpty)
      System.err.println("Warning: Rebuilding index with 0 vectors.")
    db
  }

  private def usage(prog: String): Unit = {
    System.err.println(s"Usage: $prog <db_path> <command> [args]")
    System.err.println("Commands:")
    System.err.println("  init <dimension>                  - Initialize a new vector database.")
    System.err.println("  add <vector> <metadata_json>      - Add a new vector. Vector is '1.0,2.0,3.0'. Metadata is '{\"key\": \"val\"}'.")
    System.err.println("  get <id>                          - Get a vector and its metadata by ID.")
    System.err.println("  update <id> <vector> <metadata>   - Update a vector (requires rebuild).")
    System.err.println("  delete <id>                       - Delete a vector (requires rebuild).")
    System.err.println("  rebuild                         - Rebuild the HNSW index (REQUIRED after add/update/delete).")
    System.err.println("  search <k> <query_vector>         - Search for k-nearest neighbors.")
    System.err.println()
  }

  /** Runs one command against `path`; returns the process exit code.
    * Factored from `main` so tests can drive it with a shared session.
    * The on-disk file is `<path>.json` — the reference appends the
    * suffix to whatever path the user passes (vectordb.cpp:10), so the
    * CLI mirrors that; messages echo the user's raw path. */
  def run(spark: SparkSession, args: Array[String], prog: String = "graft"): Int = {
    if (args.length < 2) { usage(prog); return 1 }
    val path = args(0)
    val file = path + ".json"
    val command = args(1)
    try {
      command match {
        case "init" =>
          if (args.length != 3) { System.err.println(s"Usage: $prog $path init <dimension>"); return 1 }
          val dim = args(2).toInt
          warnIfEmpty(VectorStore.init(spark, file, dim))
          println(s"Database initialized at '$path' with dimension $dim")

        case "add" =>
          if (args.length != 4) { System.err.println(s"Usage: $prog $path add <vector> <metadata_json>"); return 1 }
          val db = warnIfEmpty(VectorStore.load(spark, file))
          val vec = parseVector(args(2), db.getDimensions)
          val id = db.add(vec, args(3))
          db.save(file)
          println(s"Vector added with ID: $id. Run 'rebuild' to index.")

        case "get" =>
          if (args.length != 3) { System.err.println(s"Usage: $prog $path get <id>"); return 1 }
          val db = warnIfEmpty(VectorStore.load(spark, file))
          val id = args(2).toLong
          db.get(id) match {
            case Some(rec) =>
              println(s"ID: ${rec.id}")
              println(s"Metadata: ${Envelope.dump2(rec.metadata)}")
              println(rec.embedding.map(f => cppNum(f.toDouble)).mkString("Vector: [", ", ", "]"))
            case None =>
              System.err.println(s"Error: Vector with ID $id not found.")
          }

        case "search" =>
          if (args.length != 4) { System.err.println(s"Usage: $prog $path search <k> <query_vector>"); return 1 }
          val db = warnIfEmpty(VectorStore.load(spark, file))
          val k = args(2).toInt
          val query = parseVector(args(3), db.getDimensions)
          val results = db.search(query, k).collect()
          println("Search results (ID, Distance):")
          if (results.isEmpty) println("No results found. Have you run 'rebuild'?")
          results.foreach { row =>
            // sqrt at presentation only, like main.cpp:115-116
            println(s"- ID: ${row.getLong(0)}, Dist: ${cppNum(math.sqrt(row.getDouble(1)))}")
          }

        case "rebuild" =>
          // the reference rebuilds twice here — once inside load(), once
          // explicitly (main.cpp:120-123) — so an empty db warns twice
          val db = warnIfEmpty(VectorStore.load(spark, file))
          println("Rebuilding index...")
          warnIfEmpty(db)
          println("Index rebuild complete.")

        case "delete" =>
          if (args.length != 3) { System.err.println(s"Usage: $prog $path delete <id>"); return 1 }
          val db = warnIfEmpty(VectorStore.load(spark, file))
          val id = args(2).toLong
          if (db.delete(id)) {
            db.save(file)
            println(s"Vector $id deleted. Run 'rebuild' to update index.")
          } else System.err.println(s"Error: Vector with ID $id not found.")

        case "update" =>
          if (args.length != 5) { System.err.println(s"Usage: $prog $path update <id> <vector> <metadata>"); return 1 }
          val db = warnIfEmpty(VectorStore.load(spark, file))
          val id = args(2).toLong
          val vec = parseVector(args(3), db.getDimensions)
          if (db.update(id, vec, args(4))) {
            db.save(file)
            println(s"Vector $id updated. Run 'rebuild' to update index.")
          } else System.err.println(s"Error: Vector with ID $id not found.")

        case other =>
          System.err.println(s"Unknown command: $other")
          usage(prog)
          return 1
      }
      0
    } catch {
      case e: Exception =>
        System.err.println(s"Error: ${e.getMessage}")
        1
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .appName("graft-cli")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val code = run(spark, args)
    spark.stop()
    if (code != 0) sys.exit(code)
  }
}

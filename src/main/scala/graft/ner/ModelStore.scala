package graft.ner

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/**
 * On-disk model registry — the S5 (torch.save/load_state_dict) parity
 * artifact. The reference persists three vocab JSONs plus a checkpoint and
 * reloads the best model before final test
 * (NeuralNERMono/NeuralNER.py:203-233, 277, 457-460, 498); this layer is
 * the Spark-graft equivalent: a user with a trained model drops its
 * directory here and the pipeline serves it — the synthetic seed weights
 * are only the offline stand-in.
 *
 * Layout (one subdirectory per language; `*` encoded for the filesystem):
 *   <dir>/<lang>/input.vocab    (reference artifact name, Vocab JSON)
 *   <dir>/<lang>/char.vocab
 *   <dir>/<lang>/output.vocab
 *   <dir>/<lang>/model.bin      (checkpoint: dims + weight tensors)
 *
 * model.bin is a versioned little-endian-free DataStream format (magic
 * GRAFTNER1): dims, then each tensor length-prefixed in a fixed field
 * order. Round-trip is bit-identical (floats via writeFloat/readFloat).
 */
object ModelStore {

  private val Magic = "GRAFTNER1"

  private def langDirName(lang: String): String =
    java.net.URLEncoder.encode(lang, "UTF-8")

  private def langFromDirName(name: String): String =
    java.net.URLDecoder.decode(name, "UTF-8")

  // ------------------------------------------------------------ weights IO

  private def writeFloats(out: DataOutputStream, a: Array[Float]): Unit = {
    out.writeInt(a.length)
    var i = 0
    while (i < a.length) { out.writeFloat(a(i)); i += 1 }
  }

  private def readFloats(in: DataInputStream): Array[Float] = {
    val n = in.readInt()
    val a = new Array[Float](n)
    var i = 0
    while (i < n) { a(i) = in.readFloat(); i += 1 }
    a
  }

  private def writeFloats2(out: DataOutputStream, a: Array[Array[Float]]): Unit = {
    out.writeInt(a.length)
    a.foreach(writeFloats(out, _))
  }

  private def readFloats2(in: DataInputStream): Array[Array[Float]] = {
    val n = in.readInt()
    Array.fill(n)(readFloats(in))
  }

  def saveWeights(path: Path, w: Kernel.NerWeights): Unit = {
    val out = new DataOutputStream(new BufferedOutputStream(Files.newOutputStream(path)))
    try {
      out.writeUTF(Magic)
      out.writeInt(w.embedDim); out.writeInt(w.minWidth); out.writeInt(w.maxWidth)
      out.writeInt(w.numFilters); out.writeInt(w.hidden)
      out.writeInt(w.charVocabSize); out.writeInt(w.tagCount)
      writeFloats2(out, w.embeddings)
      out.writeInt(w.convW.length)
      w.convW.foreach(writeFloats2(out, _))
      writeFloats2(out, w.convB)
      writeFloats(out, w.fwIh); writeFloats(out, w.fwHh); writeFloats(out, w.fbIh); writeFloats(out, w.fbHh)
      writeFloats(out, w.bwIh); writeFloats(out, w.bwHh); writeFloats(out, w.bbIh); writeFloats(out, w.bbHh)
      writeFloats2(out, w.outW)
    } finally out.close()
  }

  def loadWeights(path: Path): Kernel.NerWeights = {
    val in = new DataInputStream(new BufferedInputStream(Files.newInputStream(path)))
    try {
      val magic = in.readUTF()
      require(magic == Magic, s"bad model file $path: magic '$magic'")
      val embedDim = in.readInt(); val minWidth = in.readInt(); val maxWidth = in.readInt()
      val numFilters = in.readInt(); val hidden = in.readInt()
      val charVocabSize = in.readInt(); val tagCount = in.readInt()
      val embeddings = readFloats2(in)
      val nW = in.readInt()
      val convW = Array.fill(nW)(readFloats2(in))
      val convB = readFloats2(in)
      val fwIh = readFloats(in); val fwHh = readFloats(in); val fbIh = readFloats(in); val fbHh = readFloats(in)
      val bwIh = readFloats(in); val bwHh = readFloats(in); val bbIh = readFloats(in); val bbHh = readFloats(in)
      val outW = readFloats2(in)
      Kernel.NerWeights(embedDim, minWidth, maxWidth, numFilters, hidden, charVocabSize,
        tagCount, embeddings, convW, convB,
        fwIh, fwHh, fbIh, fbHh, bwIh, bwHh, bbIh, bbHh, outW)
    } finally in.close()
  }

  // ----------------------------------------------------------- registry IO

  def save(dir: String, registry: Map[String, Models.LangModel]): Unit = {
    registry.foreach { case (lang, m) =>
      val d = Paths.get(dir, langDirName(lang))
      Files.createDirectories(d)
      Files.writeString(d.resolve("input.vocab"), m.inputVocab.toJson)
      Files.writeString(d.resolve("char.vocab"), m.charVocab.toJson)
      Files.writeString(d.resolve("output.vocab"), m.tagVocab.toJson)
      saveWeights(d.resolve("model.bin"), m.weights)
    }
  }

  def load(dir: String): Map[String, Models.LangModel] = {
    val root = Paths.get(dir)
    require(Files.isDirectory(root), s"model dir not found: $dir")
    scala.util.Using.resource(Files.list(root))(_.iterator().asScala
      .filter(p => Files.isRegularFile(p.resolve("model.bin"))).toList)
      .map { d =>
        val lang = langFromDirName(d.getFileName.toString)
        val inputV = Vocab.fromJson(Files.readString(d.resolve("input.vocab")), caseSensitive = false)
        val charV = Vocab.fromJson(Files.readString(d.resolve("char.vocab")), caseSensitive = true)
        val tagV = Vocab.fromJson(Files.readString(d.resolve("output.vocab")), caseSensitive = false)
        lang -> Models.LangModel(lang, inputV, charV, tagV, loadWeights(d.resolve("model.bin")))
      }.toMap
  }
}

package graft.config

import java.nio.file.{Files, Paths, StandardCopyOption}

/** One shared atomic JSON-file protocol for the driver-side control
  * plane (ConfigStore, SchemaRegistry): read-if-exists, and write via a
  * UNIQUE temp file + atomic rename. The unique temp name makes
  * concurrent writers safe at the filesystem level — each move installs
  * one complete file (last write wins, like any single-doc store); a
  * fixed ".tmp" name would let two writers race on the same temp path
  * (NoSuchFileException, or atomically installing a torn file). A crash
  * mid-write leaves the previous consistent file in place. */
object AtomicJsonFile {

  def readString(path: String): Option[String] = {
    val f = Paths.get(path)
    if (!Files.exists(f)) None
    else Some(new String(Files.readAllBytes(f), "UTF-8"))
  }

  def writeString(path: String, json: String): Unit = {
    val file = Paths.get(path)
    val tmp = Paths.get(
      path + ".tmp." + java.util.UUID.randomUUID().toString.take(8))
    Option(file.getParent).foreach(Files.createDirectories(_))
    Files.write(tmp, json.getBytes("UTF-8"))
    Files.move(tmp, file,
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}

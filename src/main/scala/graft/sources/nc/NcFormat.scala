package graft.sources.nc

/** Format dispatch for the graft-netcdf source: NetCDF-4 files are HDF5
  * containers (magic `\x89HDF\r\n\x1a\n`), classic files carry `CDF1`/
  * `CDF2`. Both expose the same read surface — header-only planning,
  * tiny coordinate vectors, one contiguous positional read per row band
  * — so the DSv2 layer is format-blind except for value byte order
  * (HDF5 datasets here are little-endian; classic is big-endian by
  * spec).
  */
object NcFormat {

  trait Reader extends AutoCloseable {
    def varDims(name: String): Seq[Long]
    def varElemSize(name: String): Int
    def readDoubles(name: String): Array[Double]
    def readRowBand(name: String, rowLo: Int, rowHi: Int): Array[Byte]
    /** byte order of readRowBand's payload */
    def littleEndian: Boolean
  }

  private final class Hdf5Adapter(path: String) extends Reader {
    private val f = new Hdf5File(path)
    def varDims(name: String): Seq[Long] = f.dataset(name).dims
    def varElemSize(name: String): Int = f.dataset(name).elemSize
    def readDoubles(name: String): Array[Double] = f.readDoubles(name)
    def readRowBand(name: String, rowLo: Int, rowHi: Int): Array[Byte] =
      f.readRowBand(name, rowLo, rowHi)
    def littleEndian: Boolean = true
    def close(): Unit = f.close()
  }

  private final class CdfAdapter(path: String) extends Reader {
    private val f = new Cdf3File(path)
    def varDims(name: String): Seq[Long] = f.variable(name).dims
    def varElemSize(name: String): Int = f.variable(name).elemSize
    def readDoubles(name: String): Array[Double] = f.readDoubles(name)
    def readRowBand(name: String, rowLo: Int, rowHi: Int): Array[Byte] =
      f.readRowBand(name, rowLo, rowHi)
    def littleEndian: Boolean = false
    def close(): Unit = f.close()
  }

  def open(path: String): Reader = {
    // magic sniff through the SeekableInput seam (object-store capable)
    val sin = graft.sources.SeekableInput.open(path)
    val magic = new Array[Byte](4)
    try sin.readFully(0L, magic, 0, 4)
    finally sin.close()
    if (magic(0) == 'C' && magic(1) == 'D' && magic(2) == 'F')
      new CdfAdapter(path)
    else if ((magic(0) & 0xFF) == 0x89 && magic(1) == 'H')
      new Hdf5Adapter(path)
    else sys.error(s"$path: neither classic CDF nor HDF5/NetCDF-4 magic")
  }
}

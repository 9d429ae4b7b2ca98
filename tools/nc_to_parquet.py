#!/usr/bin/env python3
"""Independent pure-python NetCDF-4/HDF5 subset reader -> parquet, used as
the ORACLE side for the Scala Hdf5 reader (graft.sources.nc): two separate
implementations of the format that must agree bit-for-bit on the real
reference threshold files.

Subset: superblock v0, v2 object headers, compact link messages, dataspace/
datatype/layout/filter-pipeline messages, chunked layout via v1 B-tree with
shuffle+deflate filters, contiguous layout, float32/float64.

Usage: nc_to_parquet.py <file.nc> <varname> <out.parquet>
Writes columns (latitude, longitude, <varname>) — raw unrounded values,
row-major lat x lon, NaNs kept (mirrors xarray Dataset.to_dataframe()).
"""
import struct, sys, zlib

import pyarrow as pa
import pyarrow.parquet as pq


class Hdf5:
    def __init__(self, path):
        self.data = open(path, "rb").read()
        assert self.data[:8] == b"\x89HDF\r\n\x1a\n"
        assert self.data[8] == 0, "only superblock v0 supported"
        # root group symbol-table entry starts at byte 24+32; object header
        # address is its second 8-byte field
        self.root = self.u("Q", 24 + 32 + 8)

    def u(self, fmt, off):
        v = struct.unpack_from("<" + fmt, self.data, off)
        return v[0] if len(v) == 1 else v

    def messages(self, addr):
        d = self.data
        if d[addr:addr + 4] == b"OHDR":
            flags = d[addr + 5]
            off = addr + 6
            if flags & 0b100000:
                off += 16
            if flags & 0b10000:
                off += 4
            c0sz = 1 << (flags & 3)
            chunk0 = int.from_bytes(d[off:off + c0sz], "little")
            off += c0sz
            msgs, blocks = [], [(off, chunk0)]
            while blocks:
                off, sz = blocks.pop(0)
                end = off + sz
                while off + 4 <= end - 4:  # trailing checksum
                    mtype, msize = d[off], self.u("H", off + 1)
                    off += 4
                    if flags & 0b100:
                        off += 2  # creation-order field
                    if mtype == 0x10:
                        caddr, csize = self.u("QQ", off)
                        blocks.append((caddr + 4, csize - 8))  # OCHK + cksum
                    else:
                        msgs.append((mtype, off, msize))
                    off += msize
            return msgs
        # v1 object header
        nmsg, hsize = self.u("H", addr + 2), self.u("I", addr + 8)
        msgs, blocks, count = [], [(addr + 16, hsize)], 0
        while blocks and count < nmsg:
            off, sz = blocks.pop(0)
            end = off + sz
            while off + 8 <= end and count < nmsg:
                mtype, msize = self.u("HH", off)
                off += 8
                if mtype == 0x10:
                    caddr, csize = self.u("QQ", off)
                    blocks.append((caddr, csize))
                else:
                    msgs.append((mtype, off, msize))
                count += 1
                off += msize
        return msgs

    def links(self, addr):
        """name -> object header address, from compact link messages (v2
        groups) or the symbol-table btree (v1 groups)."""
        out = {}
        for mtype, off, _ in self.messages(addr):
            if mtype == 0x06:  # link message
                d = self.data
                ver, flags = d[off], d[off + 1]
                off += 2
                if flags & 0b1000:
                    off += 1  # link type (only 0=hard supported anyway)
                if flags & 0b100:
                    off += 8  # creation order
                if flags & 0b10000:
                    off += 1  # charset
                nlsz = 1 << (flags & 3)
                namelen = int.from_bytes(d[off:off + nlsz], "little")
                off += nlsz
                name = d[off:off + namelen].decode()
                off += namelen
                out[name] = self.u("Q", off)
            elif mtype == 0x11:  # symbol table: btree + local heap
                btree, heap = self.u("QQ", off)
                heap_data = self.u("Q", heap + 24)
                def walk(baddr):
                    nlev, nent = self.data[baddr + 5], self.u("H", baddr + 6)
                    o = baddr + 8 + 16
                    for _ in range(nent):
                        o += 8  # key
                        child = self.u("Q", o)
                        o += 8
                        if nlev > 0:
                            walk(child)
                        else:
                            nsym = self.u("H", child + 6)
                            so = child + 8
                            for _ in range(nsym):
                                lnk, ohdr = self.u("QQ", so)
                                end = self.data.index(b"\0", heap_data + lnk)
                                out[self.data[heap_data + lnk:end].decode()] = ohdr
                                so += 40
                walk(btree)
        return out

    def dataset(self, addr):
        """Read a dataset into a flat list of python floats (row-major)."""
        dims, dsize, dclass = None, None, None
        layout = None
        filters = []
        for mtype, off, msz in self.messages(addr):
            d = self.data
            if mtype == 0x01:
                ver, rank = d[off], d[off + 1]
                base = off + (8 if ver == 1 else 4)
                dims = [self.u("Q", base + 8 * i) for i in range(rank)]
            elif mtype == 0x03:
                dclass = d[off] & 0x0F
                dsize = self.u("I", off + 4)
            elif mtype == 0x08:
                assert d[off] == 3, "layout message v3 only"
                lclass = d[off + 1]
                if lclass == 1:
                    layout = ("contig",) + self.u("QQ", off + 2)
                elif lclass == 2:
                    rank = d[off + 2]
                    bt = self.u("Q", off + 3)
                    cdims = [self.u("I", off + 11 + 4 * i) for i in range(rank)]
                    layout = ("chunked", bt, cdims)
                else:
                    raise AssertionError(f"layout class {lclass}")
            elif mtype == 0x0B:
                ver, nf = d[off], d[off + 1]
                foff = off + (8 if ver == 1 else 2)
                for _ in range(nf):
                    fid, namelen, fflags, ncli = self.u("HHHH", foff)
                    foff += 8
                    if ver == 1 or fid >= 256:
                        foff += (namelen + 7) // 8 * 8 if ver == 1 else namelen
                    foff += 4 * ncli
                    if ver == 1 and ncli % 2 == 1:
                        foff += 4
                    filters.append(fid)
        assert dclass == 1, "float datasets only"
        n = 1
        for x in dims:
            n *= x
        raw = bytearray(n * dsize)
        if layout[0] == "contig":
            raw[:] = self.data[layout[1]:layout[1] + layout[2]]
        else:
            bt, cdims = layout[1], layout[2]
            ndims = len(cdims)  # rank+1 (elem size dim included)
            csize_elems = 1
            for x in cdims[:-1]:
                csize_elems *= x
            chunk_bytes = csize_elems * dsize

            def walk(baddr):
                nlev, nent = self.data[baddr + 5], self.u("H", baddr + 6)
                o = baddr + 8 + 16
                for _ in range(nent):
                    stored, mask = self.u("II", o)
                    coffs = [self.u("Q", o + 8 + 8 * j) for j in range(ndims)]
                    o += 8 + 8 * ndims
                    child = self.u("Q", o)
                    o += 8
                    if nlev > 0:
                        walk(child)
                        continue
                    buf = self.data[child:child + stored]
                    if 1 in filters and not (mask & 2):
                        buf = zlib.decompress(buf)
                    if 2 in filters and not (mask & 1):
                        # shuffle: de-interleave byte planes
                        ne = len(buf) // dsize
                        out = bytearray(len(buf))
                        for b in range(dsize):
                            out[b::dsize] = buf[b * ne:(b + 1) * ne]
                        buf = bytes(out)
                    # chunk start in element space (dense rank<=2 case:
                    # chunks here cover whole rows, so linear copy is exact)
                    lin = 0
                    strides = []
                    acc = 1
                    for dim in reversed(dims):
                        strides.append(acc)
                        acc *= dim
                    strides.reverse()
                    for j in range(len(dims)):
                        lin += coffs[j] * strides[j]
                    # HDF5 stores full-size edge chunks; clip the padding
                    nb = min(len(buf), len(raw) - lin * dsize)
                    raw[lin * dsize:lin * dsize + nb] = buf[:nb]

            walk(bt)
        fmt = {4: "f", 8: "d"}[dsize]
        return dims, list(struct.unpack(f"<{n}{fmt}", bytes(raw)))


def main():
    path, var, out = sys.argv[1], sys.argv[2], sys.argv[3]
    h5 = Hdf5(path)
    links = h5.links(h5.root)
    latd, lat = h5.dataset(links["lat"])
    lond, lon = h5.dataset(links["lon"])
    vdims, vals = h5.dataset(links[var])
    assert vdims == [latd[0], lond[0]], (vdims, latd, lond)
    nlat, nlon = vdims
    lats = [lat[i] for i in range(nlat) for _ in range(nlon)]
    lons = lon * nlat
    table = pa.table({
        "latitude": pa.array(lats, pa.float64()),
        "longitude": pa.array(lons, pa.float64()),
        var: pa.array(vals, pa.float32()),
    })
    pq.write_table(table, out, compression="zstd")
    print(f"{out}: {table.num_rows} rows, lat[{lat[0]}..{lat[-1]}] lon[{lon[0]}..{lon[-1]}]")


if __name__ == "__main__":
    main()

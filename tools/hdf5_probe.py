#!/usr/bin/env python3
"""Minimal pure-python HDF5 structure probe (no h5py available in this
container). Walks superblock -> root group -> object headers and prints
dataset shape/dtype/layout/filter info, enough to scope a Scala reader
subset for the reference's NetCDF-4 threshold files."""
import struct, sys, zlib

f = open(sys.argv[1], "rb")
data = f.read()

def u(fmt, off):
    return struct.unpack_from("<" + fmt, data, off)

# --- superblock ---
assert data[:8] == b"\x89HDF\r\n\x1a\n", "not HDF5"
sb_ver = data[8]
print(f"superblock version: {sb_ver}")
if sb_ver in (0, 1):
    offs_size, len_size = data[13], data[14]
    group_leaf_k, group_internal_k = u("HH", 16)
    base_addr, free_addr, eof_addr, drv_addr = u("QQQQ", 24)
    root_stab_off = 24 + 32  # symbol table entry of root group
    link_name_off, ohdr_addr = u("QQ", root_stab_off)
    print(f"sizes: offsets={offs_size} lengths={len_size} leafK={group_leaf_k} intK={group_internal_k}")
    print(f"root object header at {ohdr_addr:#x}")
elif sb_ver in (2, 3):
    offs_size, len_size = data[9], data[10]
    base_addr, ext_addr, eof_addr, ohdr_addr = u("QQQQ", 12)
    print(f"root object header at {ohdr_addr:#x}")

UNDEF = 0xFFFFFFFFFFFFFFFF

def parse_messages(addr, indent=""):
    """Parse object header (v1 or v2), return list of (type, off, size)."""
    msgs = []
    if data[addr:addr+4] == b"OHDR":  # v2
        ver = data[addr+4]
        flags = data[addr+5]
        off = addr + 6
        if flags & 0b100000: off += 8  # times
        if flags & 0b10000: off += 4   # max compact etc
        size_of_chunk0 = {0: 1, 1: 2, 2: 4, 3: 8}[flags & 3]
        chunk0 = int.from_bytes(data[off:off+size_of_chunk0], "little")
        off += size_of_chunk0
        end = off + chunk0
        while off < end - 3:
            mtype = data[off]
            msize = u("H", off+1)[0]
            mflags = data[off+3]
            off += 4
            if flags & 0b100: off += 2  # creation order
            msgs.append((mtype, off, msize))
            off += msize
    else:  # v1
        ver, _, nmsg, refc, hsize = struct.unpack_from("<BBHII", data, addr)
        off = addr + 16
        remaining = [(off, hsize)]
        count = 0
        while remaining and count < nmsg:
            off, sz = remaining.pop(0)
            end = off + sz
            while off + 8 <= end and count < nmsg:
                mtype, msize, mflags = struct.unpack_from("<HHB", data, off)
                off += 8
                if mtype == 0x10:  # continuation
                    caddr, csize = u("QQ", off)
                    remaining.append((caddr, csize))
                else:
                    msgs.append((mtype, off, msize))
                count += 1
                off += msize
    return msgs

def dtype_str(off):
    cls_ver = data[off]
    cls = cls_ver & 0x0F
    bits0, bits8, bits16 = data[off+1], data[off+2], data[off+3]
    size = u("I", off+4)[0]
    names = {0: "fixed", 1: "float", 3: "string", 9: "vlen"}
    return f"{names.get(cls, cls)}({size}B)"

def parse_dataspace(off):
    ver = data[off]
    rank = data[off+1]
    flags = data[off+2]
    if ver == 1:
        dims_off = off + 8
    else:
        dims_off = off + 4
    dims = [u("Q", dims_off + 8*i)[0] for i in range(rank)]
    return dims

def walk_group(ohdr_addr, name, depth=0):
    pad = "  " * depth
    msgs = parse_messages(ohdr_addr)
    stab = None
    info = {"name": name}
    for mtype, off, msize in msgs:
        if mtype == 0x11:  # symbol table
            btree, heap = u("QQ", off)
            stab = (btree, heap)
        elif mtype == 0x01:
            info["dims"] = parse_dataspace(off)
        elif mtype == 0x03:
            info["dtype"] = dtype_str(off)
        elif mtype == 0x08:  # layout
            ver = data[off]
            if ver == 3:
                lclass = data[off+1]
                if lclass == 0:
                    info["layout"] = "compact"
                elif lclass == 1:
                    a, sz = u("QQ", off+2)
                    info["layout"] = f"contiguous@{a:#x} size={sz}"
                elif lclass == 2:
                    rank = data[off+2]
                    btree_addr = u("Q", off+3)[0]
                    cdims = [u("I", off+11+4*i)[0] for i in range(rank)]
                    info["layout"] = f"chunked btree@{btree_addr:#x} cdims={cdims}"
                    info["chunk_btree"] = btree_addr
                    info["cdims"] = cdims
            else:
                info["layout"] = f"v{ver}?"
        elif mtype == 0x0B:  # filter pipeline
            ver = data[off]
            nf = data[off+1]
            foff = off + (8 if ver == 1 else 2)
            fl = []
            for _ in range(nf):
                fid, namelen, fflags, ncli = struct.unpack_from("<HHHH", data, foff)
                foff += 8
                nm = ""
                if ver == 1 or fid >= 256:
                    nm = data[foff:foff+namelen].rstrip(b"\0").decode()
                    foff += (namelen + 7) // 8 * 8 if ver == 1 else namelen
                cli = [u("I", foff+4*i)[0] for i in range(ncli)]
                foff += 4 * ncli
                if ver == 1 and ncli % 2 == 1:
                    foff += 4
                fl.append((fid, nm, cli))
            info["filters"] = fl
        elif mtype == 0x0C:  # attribute
            aver = data[off]
            if aver == 1:
                nsz, dsz, ssz = struct.unpack_from("<HHH", data, off+2)
                aname = data[off+8:off+8+nsz].rstrip(b"\0").decode("utf8", "replace")
                info.setdefault("attrs", []).append(aname)
            elif aver in (2, 3):
                nsz, dsz, ssz = struct.unpack_from("<HHH", data, off+2)
                astart = off + (9 if aver == 3 else 8)
                aname = data[astart:astart+nsz].rstrip(b"\0").decode("utf8", "replace")
                info.setdefault("attrs", []).append(aname)
    if stab:
        print(f"{pad}GROUP {name} attrs={info.get('attrs')}")
        walk_stab(stab[0], stab[1], depth + 1)
    else:
        print(f"{pad}DATASET {name}: dims={info.get('dims')} dtype={info.get('dtype')} "
              f"layout={info.get('layout')} filters={info.get('filters')} attrs={info.get('attrs')}")
        if "chunk_btree" in info:
            nchunks = count_chunks(info["chunk_btree"], len(info.get("dims", [])) + 1)
            print(f"{pad}  chunks in btree: {nchunks}")

def count_chunks(btree_addr, ndims, sample=None):
    """Walk v1 btree counting chunk entries; returns count and prints a sample."""
    if btree_addr == UNDEF:
        return 0
    sig = data[btree_addr:btree_addr+4]
    assert sig == b"TREE", f"bad btree sig {sig}"
    node_type = data[btree_addr+4]
    node_level = data[btree_addr+5]
    nentries = u("H", btree_addr+6)[0]
    off = btree_addr + 8 + 16  # skip left/right sibling
    total = 0
    key_size = 8 + 8 * ndims  # chunk size(4)+mask(4) + ndims*8
    for i in range(nentries):
        # key
        csize, mask = u("II", off)
        dims = [u("Q", off+8+8*j)[0] for j in range(ndims)]
        off += key_size
        child = u("Q", off)[0]
        off += 8
        if node_level == 0:
            total += 1
            if i < 2:
                print(f"    chunk[{i}]: offset_idx={dims} stored={csize}B mask={mask} at {child:#x}")
        else:
            total += count_chunks(child, ndims)
    return total

def walk_stab(btree_addr, heap_addr, depth):
    # local heap
    assert data[heap_addr:heap_addr+4] == b"HEAP"
    heap_data_addr = u("Q", heap_addr+24)[0]
    def walk_btree(addr):
        assert data[addr:addr+4] == b"TREE", f"bad sig at {addr:#x}"
        node_level = data[addr+5]
        nentries = u("H", addr+6)[0]
        off = addr + 8 + 16
        for i in range(nentries):
            off += 8  # key (heap offset)
            child = u("Q", off)[0]
            off += 8
            if node_level > 0:
                walk_btree(child)
            else:
                # SNOD
                assert data[child:child+4] == b"SNOD"
                nsyms = u("H", child+6)[0]
                soff = child + 8
                for _ in range(nsyms):
                    lnk_off, ohdr = u("QQ", soff)
                    nm_end = data.index(b"\0", heap_data_addr + lnk_off)
                    nm = data[heap_data_addr+lnk_off:nm_end].decode()
                    walk_group(ohdr, nm, depth)
                    soff += 40
    walk_btree(btree_addr)

walk_group(ohdr_addr, "/")

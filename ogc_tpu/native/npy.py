"""Fast batched .npy reading on top of the native threaded block reader.

Headers are parsed once per file (cached); the bulk data reads then run in
C++ threads directly into the preallocated batch buffer.
"""

from __future__ import annotations

import ast
import ctypes
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ogc_tpu.native import loader_lib

_header_cache: Dict[str, Tuple[np.dtype, tuple, int, bool]] = {}


def _parse_header(path: str) -> Tuple[np.dtype, tuple, int, bool]:
    """Return (dtype, shape, data_offset, fortran_order) of a .npy file."""
    if path in _header_cache:
        return _header_cache[path]
    with open(path, "rb") as f:
        magic = f.read(8)
        if magic[:6] != b"\x93NUMPY":
            raise ValueError(f"not a .npy file: {path}")
        major = magic[6]
        if major == 1:
            (hlen,) = np.frombuffer(f.read(2), dtype="<u2")
            offset = 10 + int(hlen)
        else:
            (hlen,) = np.frombuffer(f.read(4), dtype="<u4")
            offset = 12 + int(hlen)
        header = ast.literal_eval(f.read(int(hlen)).decode("latin1"))
    info = (
        np.dtype(header["descr"]),
        tuple(header["shape"]),
        offset,
        bool(header["fortran_order"]),
    )
    _header_cache[path] = info
    return info


def read_npy_batch(paths: Sequence[str], n_threads: int = 8) -> np.ndarray:
    """Read same-shape/same-dtype .npy files into a stacked (B, ...) array.

    Falls back to sequential np.load when the native library is unavailable.
    """
    lib = loader_lib()
    infos = [_parse_header(p) for p in paths]
    dtype, shape, _, fortran = infos[0]
    for p, (d, s, _, fo) in zip(paths, infos):
        if d != dtype or s != shape or fo != fortran:
            raise ValueError(f"inhomogeneous npy batch at {p}")
    if fortran or lib is None:
        return np.stack([np.load(p) for p in paths], 0)

    B = len(paths)
    itembytes = int(np.prod(shape)) * dtype.itemsize
    out = np.empty((B,) + shape, dtype=dtype)

    c_paths = (ctypes.c_char_p * B)(*[p.encode() for p in paths])
    offsets = np.array([i[2] for i in infos], dtype=np.int64)
    nbytes = np.full(B, itembytes, dtype=np.int64)
    dest_offsets = np.arange(B, dtype=np.int64) * itembytes
    rc = lib.read_blocks(
        c_paths,
        offsets.ctypes.data,
        nbytes.ctypes.data,
        out.ctypes.data_as(ctypes.c_char_p),
        dest_offsets.ctypes.data,
        B,
        n_threads,
    )
    if rc != 0:
        raise IOError(f"native read failed for {paths[rc - 1]}")
    return out

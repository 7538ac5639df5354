"""Artifact cache: names, formats and lifecycle.

Mirrors the reference's artifact registry and on-disk vector formats
(reference: src/artifacts.rs for names/lifecycle; src/io_utils.rs for
the u64-LE length prefix + fixed-width record layout):

* Fr vectors:  u64 LE count, then 29-byte little-endian canonical
  elements (ark serialize_uncompressed width, io_utils.rs:127).
* Point vectors: u64 LE count, then 30-byte compressed points
  (io_utils.rs:191).  A `.fast.npz` sidecar caches the decoded
  projective words so bulk reads skip per-point decompression - the
  interchange file remains the source of truth.
* FFTrees: an .npz of layer x-coordinate limb arrays + isogeny roots
  (replaces the reference's FFTR container, src/tree_io.rs:3-48; our
  tree is reconstructible from layers+roots, so the twelve precompute
  sections become derived caches).

The artifact cache IS the checkpoint/resume system, exactly as in the
reference (SURVEY.md section 5): every expensive object is written once
and skipped if present.
"""

from __future__ import annotations

import os
import struct

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.ops import fr, gf2, xsk233
from dvpari_tpu.fftree.tree import FFTree

# --- artifact names (reference: src/artifacts.rs:17-83) -------------------
SRS_G_Q = "g_q"
SRS_G_M = "g_m"
SRS_G_K_0 = "g_k_0"
SRS_G_K_1 = "g_k_1"
SRS_G_K_2 = "g_k_2"
TREE_2N = "tree2n"
TREE_2ND = "tree2nd"
# The reference caches separate m-leaf subtrees (TREE_N/TREE_ND,
# src/artifacts.rs:28-42); here subtrees are O(1) stride views of the 2m
# trees (fftree/tree.py subtree_with_size), so no artifact is written.
# Names kept for registry parity with downloaded reference caches.
TREE_N = "treen"
TREE_ND = "treend"
Z_POLY = "z_poly"
Z_POLYD = "z_polyd"
BAR_WTS = "bar_wts"
BAR_WTSD = "bar_wtsd"
Z_VALS2_INV = "z_vals2inv"
Z_VALS2D_INV = "z_vals2dinv"
R1CS_CONSTRAINTS_FILE = "r1cs_to_dvsnark"
R1CS_WITNESS_FILE = "witness_to_dvsnark"

FR_RECORD = 29  # ceil(232/8)
PT_RECORD = 30


# --- sidecar integrity -------------------------------------------------------
# The 30-byte record file is the source of truth; sidecars are derived
# caches.  Each sidecar stores TWO digests -- "SRC" over the record file
# it was derived from (catches a stale sidecar paired with a different
# source) and "SELF" over its own payload arrays (catches in-place
# sidecar corruption) -- and readers verify both, falling back to record
# decode on mismatch.  The reference validates every point on read
# (src/io_utils.rs:217-226); this is the bulk-sidecar equivalent.
# blake2b (hashlib, C speed) rather than the protocol's from-scratch
# blake3: integrity only, not transcript material.

_PAYLOAD_KEYS = ("X", "Y", "Z", "P")  # fast: X/Y/Z; planes: P


def _file_digest(path: str) -> np.ndarray:
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    with open(path, "rb") as f:
        while True:
            chunk = f.read(1 << 24)
            if not chunk:
                break
            h.update(chunk)
    return np.frombuffer(h.digest(), dtype=np.uint8)


def _payload_digest(arrs: "dict[str, np.ndarray]") -> np.ndarray:
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    for k in _PAYLOAD_KEYS:
        if k in arrs:
            h.update(np.ascontiguousarray(arrs[k]).tobytes())
    return np.frombuffer(h.digest(), dtype=np.uint8)


def _sidecar_fresh(path: str, npz) -> bool:
    """True iff the sidecar matches both its source file and itself."""
    files = set(getattr(npz, "files", ()))
    if "SRC" not in files or "SELF" not in files:
        return False  # legacy sidecar: treat as stale, re-derive
    if not os.path.exists(path):
        return False
    if not np.array_equal(npz["SRC"], _file_digest(path)):
        return False
    payload = {k: npz[k] for k in _PAYLOAD_KEYS if k in files}
    return bool(np.array_equal(npz["SELF"], _payload_digest(payload)))


# --- Fr vectors ------------------------------------------------------------

_jit_strong = jax.jit(fr.strong_normalize)


def write_fr_vec(path: str, values: jnp.ndarray) -> None:
    """values: device limbs (20, n) -> u64 count + 29B LE records.

    Vectorized: device canonicalization + bit-packing, no python-int
    loops (the reference parallel-serializes with rayon,
    src/io_utils.rs:42-111)."""
    canon = np.asarray(jax.device_get(_jit_strong(jnp.asarray(values))))
    if canon.ndim == 1:
        canon = canon[:, None]
    recs = fr.limbs_to_le_bytes(canon, FR_RECORD)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", recs.shape[0]))
        f.write(recs.tobytes())


def read_fr_vec(path: str) -> jnp.ndarray:
    with open(path, "rb") as f:
        data = f.read()
    (n,) = struct.unpack_from("<Q", data, 0)
    raw = np.frombuffer(data, dtype=np.uint8, count=n * FR_RECORD, offset=8)
    raw = raw.reshape(n, FR_RECORD).astype(np.uint64)
    # assemble 12-bit limbs from LE bytes without python-int round trips
    bits = np.unpackbits(raw.astype(np.uint8), axis=1, bitorder="little")
    want = fr.NLIMB * fr.LIMB_BITS  # 240 > 232 stored bits: zero-pad the top
    bits = np.pad(bits, [(0, 0), (0, max(0, want - bits.shape[1]))])[:, :want]
    limbs = np.zeros((fr.NLIMB, n), dtype=np.int32)
    for i in range(fr.NLIMB):
        chunk = bits[:, i * fr.LIMB_BITS : (i + 1) * fr.LIMB_BITS]
        weights = (1 << np.arange(fr.LIMB_BITS)).astype(np.int32)
        limbs[i] = chunk.astype(np.int32) @ weights
    return jnp.asarray(limbs)


# --- point vectors ---------------------------------------------------------

# Points per chunk for streaming encode/decode: bounds the transient
# u64-repack and record buffers during multi-GB vector IO (the
# reference's analog is mmap-windowed IO, src/io_utils.rs).
IO_CHUNK = 1 << 20


def write_point_vec(path: str, points: jnp.ndarray, planes=None) -> None:
    """points: (3, 8, n) projective batch (device OR host numpy) -> 30B
    compressed records + .fast.npz sidecar with the affine word arrays +
    .planes.npz bit-sliced sidecar (large vectors; what the fused-ladder
    MSM reads).  `planes` optionally supplies the bit-plane packing of
    the SAME vector (e.g. straight from the setup fan-out,
    ops/xsk233.py:mulgen_limbs_host) so it isn't re-derived here.

    Uses the native backend (batched affine normalization + bulk encode)
    when available; python host codec otherwise.  Encoding streams in
    IO_CHUNK slices so transient buffers stay bounded at SP1 scale.
    """
    from dvpari_tpu import native

    # a rewrite invalidates any bit-plane sidecar from a previous vector
    # at this path (it is re-written below only on the native large-n path)
    if os.path.exists(path + ".planes.npz"):
        os.remove(path + ".planes.npz")

    import hashlib

    if native.available():
        arr = np.asarray(jax.device_get(points))
        n = arr.shape[-1]
        proj = np.zeros((3, gf2.NWORD, n), dtype=np.uint32)
        h = hashlib.blake2b(digest_size=16)
        with open(path, "wb") as f:
            hdr = struct.pack("<Q", n)
            f.write(hdr)
            h.update(hdr)
            for s in range(0, n, IO_CHUNK):
                xy, inf = _native_batch_affine(arr[..., s : s + IO_CHUNK])
                recs = native.encode_bulk(xy, inf)
                f.write(recs)
                h.update(recs)
                proj[..., s : s + xy.shape[0]] = _words64_to_proj(xy, inf)
        src = np.frombuffer(h.digest(), dtype=np.uint8)
        _save_fast_sidecar(path, proj, src)
        if n >= 4096:  # MSM-sized: pre-pack the bit-plane sidecar too
            from dvpari_tpu.ops import xsk233_bs as bs

            if planes is not None:
                assert planes.shape[-1] == -(-n // 32), (planes.shape, n)
                _save_planes_sidecar(path, np.asarray(planes), src)
            else:
                _save_planes_sidecar(path, bs.pack_points(proj), src)
        return

    from dvpari_tpu.utils import xsk233_host as host

    affine = xsk233.to_affine_int(points)
    if isinstance(affine, tuple) or affine is None:
        affine = [affine]
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(affine)))
        for p in affine:
            f.write(host.encode(p))
    _write_point_sidecar(path, affine)


def _native_batch_affine(arr: np.ndarray):
    """(3, 8, n) uint32 host batch -> (xy uint64[n, 8], inf uint8[n])."""
    from dvpari_tpu import native

    n = arr.shape[-1]
    # repack to native layout: per point 12 u64 words (X, Y, Z)
    w = np.zeros((n, 12), dtype=np.uint64)
    for c in range(3):
        lo = arr[c, 0::2, :].astype(np.uint64)  # even uint32 words
        hi = arr[c, 1::2, :].astype(np.uint64)
        w[:, 4 * c : 4 * c + 4] = (lo | (hi << 32)).T
    xy = np.zeros((n, 8), dtype=np.uint64)
    inf = np.zeros(n, dtype=np.uint8)
    lib = native.load()
    lib.dv_pt_batch_affine(
        native._u64p(np.ascontiguousarray(w)), n, native._u64p(xy),
        native._u8p(inf),
    )
    return xy, inf


def _words64_to_proj(xy: np.ndarray, inf: np.ndarray) -> np.ndarray:
    """(n, 8) u64 affine pairs + inf flags -> (3, 8, n) uint32 batch."""
    n = len(inf)
    out = np.zeros((3, gf2.NWORD, n), dtype=np.uint32)
    for c, sl in ((0, slice(0, 4)), (1, slice(4, 8))):
        w64 = xy[:, sl].T  # (4, n)
        out[c, 0::2, :] = (w64 & 0xFFFFFFFF).astype(np.uint32)
        out[c, 1::2, :] = (w64 >> 32).astype(np.uint32)
    out[2, 0, :] = np.where(inf == 1, 0, 1)
    out[1, 0, :] = np.where(inf == 1, 1, out[1, 0, :])
    return out


def _save_fast_sidecar(path: str, proj: np.ndarray, src: np.ndarray) -> None:
    payload = {"X": proj[0], "Y": proj[1], "Z": proj[2]}
    np.savez(
        path + ".fast.npz", SRC=src, SELF=_payload_digest(payload), **payload
    )


def _save_planes_sidecar(path: str, planes: np.ndarray, src: np.ndarray) -> None:
    payload = {"P": planes}
    np.savez(
        path + ".planes.npz", SRC=src, SELF=_payload_digest(payload), **payload
    )


def _write_point_sidecar(path: str, affine: list) -> None:
    n = len(affine)
    X = np.zeros((gf2.NWORD, n), dtype=np.uint32)
    Y = np.zeros((gf2.NWORD, n), dtype=np.uint32)
    Z = np.zeros((gf2.NWORD, n), dtype=np.uint32)
    for j, p in enumerate(affine):
        if p is not None:
            X[:, j] = gf2.from_int(p[0])
            Y[:, j] = gf2.from_int(p[1])
            Z[0, j] = 1
    _save_fast_sidecar(path, np.stack([X, Y, Z]), _file_digest(path))


def point_vec_len(path: str) -> int:
    """Record count from the u64-LE header (no payload read)."""
    with open(path, "rb") as f:
        return struct.unpack("<Q", f.read(8))[0]


def read_point_vec_planes(path: str) -> np.ndarray:
    """Bit-sliced plane packing (3, 233, ceil32(n)) of the point vector,
    cached as a .planes.npz sidecar: the fused-ladder MSM consumes
    planes directly, and packing millions of SRS points on every prove
    would otherwise dominate the host-side cost."""
    pp = path + ".planes.npz"
    if os.path.exists(pp):
        z = np.load(pp)
        if _sidecar_fresh(path, z):
            return z["P"]
        # stale/legacy sidecar: re-derive from verified data below
    from dvpari_tpu.ops import xsk233_bs as bs

    fast = path + ".fast.npz"
    if os.path.exists(fast):
        z = np.load(fast)
        if _sidecar_fresh(path, z):
            pts = np.stack([z["X"], z["Y"], z["Z"]], axis=0)
        else:
            pts = np.asarray(jax.device_get(read_point_vec(path)))
    else:
        pts = np.asarray(jax.device_get(read_point_vec(path)))
    planes = bs.pack_points(pts)
    _save_planes_sidecar(path, planes, _file_digest(path))
    return planes


# Device-resident planes cache: the SRS is a fixed per-circuit artifact,
# so uploading each vector through the (tunneled) H2D path once and
# slicing on device removes the dominant per-prove transfer cost
# (measured r3: ladder compute = 364k pts/s at 2^20 vs 129-178k e2e at
# 2^18 -- the gap is per-prove mask+plane uploads).  Keyed by
# (path, sidecar mtime); stale entries for the same path are dropped;
# capacity capped by DVPARI_PLANES_CACHE_GB (default 6).
_PLANES_DEVICE_CACHE: "dict[tuple, jnp.ndarray]" = {}


def read_point_vec_planes_device(path: str) -> jnp.ndarray:
    """read_point_vec_planes, uploaded once and cached on device."""
    pp = path + ".planes.npz"
    mtime = os.path.getmtime(pp) if os.path.exists(pp) else None
    key = (os.path.abspath(path), mtime)
    hit = _PLANES_DEVICE_CACHE.get(key)
    if hit is not None:
        return hit
    for k in [k for k in _PLANES_DEVICE_CACHE if k[0] == key[0]]:
        del _PLANES_DEVICE_CACHE[k]  # rewritten artifact: drop stale upload
    arr = jnp.asarray(read_point_vec_planes(path))
    budget = float(os.environ.get("DVPARI_PLANES_CACHE_GB", "6")) * 1e9
    size = arr.size * 4
    cur = sum(v.size * 4 for v in _PLANES_DEVICE_CACHE.values())
    while _PLANES_DEVICE_CACHE and cur + size > budget:
        k0 = next(iter(_PLANES_DEVICE_CACHE))
        cur -= _PLANES_DEVICE_CACHE.pop(k0).size * 4
    if size <= budget:
        _PLANES_DEVICE_CACHE[key] = arr
    return arr


def read_point_vec(path: str, validate: bool = False) -> jnp.ndarray:
    """Returns (3, 8, n) projective batch.  Prefers the sidecar; falls
    back to decoding the 30-byte records (with validity checks, mirroring
    read_point_vec_from_file's assert, reference: src/io_utils.rs:217-226)."""
    fast = path + ".fast.npz"
    if os.path.exists(fast) and not validate:
        z = np.load(fast)
        if _sidecar_fresh(path, z):
            return jnp.asarray(np.stack([z["X"], z["Y"], z["Z"]], axis=0))
        # stale/legacy sidecar: fall through to record decode, then heal it
    with open(path, "rb") as f:
        data = f.read()
    (n,) = struct.unpack_from("<Q", data, 0)
    payload = data[8 : 8 + n * PT_RECORD]

    from dvpari_tpu import native

    if native.available():
        out = np.zeros((3, gf2.NWORD, n), dtype=np.uint32)
        for s in range(0, n, IO_CHUNK):  # stream: bounded decode buffers
            e = min(s + IO_CHUNK, n)
            xy, inf = native.decode_bulk(
                payload[s * PT_RECORD : e * PT_RECORD]
            )  # raises on invalid records
            out[..., s:e] = _words64_to_proj(xy, inf)
        if not validate:  # heal the sidecar from the verified decode
            _save_fast_sidecar(path, out, _file_digest(path))
        return jnp.asarray(out)

    from dvpari_tpu.utils import xsk233_host as host

    pts = []
    for j in range(n):
        rec = payload[j * PT_RECORD : (j + 1) * PT_RECORD]
        p, ok = host.decode(rec)
        assert ok, f"invalid point record {j} in {path}"
        pts.append(p)
    return xsk233.from_affine_int(pts)


# --- FFTrees ---------------------------------------------------------------

def write_fftree(path: str, tree: FFTree) -> None:
    arrs = {f"layer{i}": np.asarray(t) for i, t in enumerate(tree.layers)}
    arrs["x0s"] = np.array(
        [np.frombuffer(int(x).to_bytes(32, "little"), dtype=np.uint8) for x in tree.x0s],
        dtype=np.uint8,
    )
    arrs["meta"] = np.array(
        [tree.n, int(tree.shift_by_one), tree.base_log_n], dtype=np.int64
    )
    np.savez(path + ".npz", **arrs)
    tree.table_dir = path + ".tables"  # persist derived tables alongside


def read_fftree(path: str) -> FFTree:
    z = np.load(path + ".npz")
    n, shift, base_log_n = (int(v) for v in z["meta"])
    nlayers = n.bit_length()  # log2(n) + 1
    layers = [jnp.asarray(z[f"layer{i}"]) for i in range(nlayers)]
    x0s = [int.from_bytes(bytes(row), "little") for row in z["x0s"]]
    tree = FFTree(layers, x0s, bool(shift), base_log_n)
    # derived tables (extend constants, x^n powers, z-chains) persist
    # next to the tree: recomputing them costs ~20 min of local compiles
    # + device enters per process at 2^17+ (see FFTree.table_dir)
    tree.table_dir = path + ".tables"
    return tree


def fftree_exists(path: str) -> bool:
    return os.path.exists(path + ".npz")

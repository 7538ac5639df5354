"""Size-independent chunked execution of the ECFFT level passes.

The per-level enter/extend programs in tree.py are jit-keyed by the FULL
state shape, so every new domain size recompiles ~log(n) multi-minute
programs on the tunneled TPU backend (the m=2^18 setup.validate_z spent
715 s warming 18 programs; a cache-warm rerun still paid ~300 s of
executable loads).  This module re-executes the same transforms as a
pipeline of tiny pass primitives over fixed-width chunks, the proven
pattern from the MSM (ops/xsk233.py:414-421) and the device tree ladder
(fftree/device_build.py:94-100):

* Transform state is a list of device chunks, each int32 (20, C), that
  concatenate to the flat (20, N) array in subvector-major order.
* Every butterfly level factorizes into passes whose data flow stays
  inside one chunk, or touches exactly two chunks at a fixed power-of-two
  distance.  Two program families cover all spans:
    SMALL (span <= C): a chunk holds C/span whole subvectors; the pass
      reshapes in-chunk and applies the 2x2 tabled butterfly.  The span
      is derived from the TABLE shape, so one jax.jit wrapper serves
      every span -- programs are keyed by (C, span) only, never by N.
    BIG (span >= 2C): all offsets are chunk-aligned (powers of two), so
      the pass reads two whole chunks at distance half-span and writes
      them back at the same positions.  ONE program ever, keyed by C.
* Per-level constants (the decompose/recombine tables, x^n powers) are
  passed as arguments -- device-resident chunk lists cached per tree
  view -- exactly like the tabled bodies in tree.py.

Net effect: the compile universe is CLOSED (a few dozen second-scale
programs shared by every domain size); a new size compiles nothing.
The passes are pure data-parallel Fr arithmetic, so results are
bit-identical to the fused path (asserted in tests/test_chunked.py).

(reference: the ecfft crate's recursive extend/enter,
src/ec_fft.rs:284-335; re-architected here as flat chunk pipelines)
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp

from dvpari_tpu.ops import fr


def chunk_elems() -> int:
    """Chunk width in Fr elements (power of two).  2^16 balances dispatch
    count (N/C per pass) against per-chunk VPU occupancy; tests shrink it
    to exercise the BIG family on toy domains."""
    try:
        c = int(os.environ.get("DVPARI_PASS_CHUNK", str(1 << 16)))
    except ValueError:
        c = 1 << 16
    assert c & (c - 1) == 0 and c >= 4, "chunk must be a power of two >= 4"
    return c


def _log2(n: int) -> int:
    assert n & (n - 1) == 0
    return n.bit_length() - 1


# ---------------------------------------------------------------------------
# Pass primitives.  Module-level jit wrappers: jax.jit's signature cache
# keys each program by the (chunk, table) SHAPES, which encode (C, span)
# and nothing else.
# ---------------------------------------------------------------------------


def _b(t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Broadcast a (20, w) table against (20, *units, w) chunk views."""
    return t.reshape((fr.NLIMB,) + (1,) * (ndim - 2) + (t.shape[-1],))


@jax.jit
def _dec_small(chunk, d00, d01, d10, d11):
    """Decompose butterfly, whole subvectors in-chunk.  span = 2*|d00|."""
    half = d00.shape[-1]
    span = 2 * half
    st = chunk.reshape(fr.NLIMB, chunk.shape[-1] // span, span)
    E0, E1 = st[..., :half], st[..., half:]
    d00, d01, d10, d11 = (_b(t, st.ndim) for t in (d00, d01, d10, d11))
    U0 = fr.add(fr.mul(d00, E0), fr.mul(d01, E1))
    U1 = fr.add(fr.mul(d10, E0), fr.mul(d11, E1))
    return jnp.concatenate([U0, U1], axis=-1).reshape(chunk.shape)


@jax.jit
def _dec_big(e0, e1, d00, d01, d10, d11):
    """Decompose butterfly across two chunks at distance half-span."""
    return (
        fr.add(fr.mul(d00, e0), fr.mul(d01, e1)),
        fr.add(fr.mul(d10, e0), fr.mul(d11, e1)),
    )


@jax.jit
def _rec_small(chunk, r0, r0x, r1, r1x):
    """Recombine butterfly, whole pairs in-chunk.  unit span = 2*|r0|."""
    half = r0.shape[-1]
    st = chunk.reshape(fr.NLIMB, chunk.shape[-1] // (2 * half), 2, half)
    U0, U1 = st[..., 0, :], st[..., 1, :]
    r0, r0x, r1, r1x = (_b(t, U0.ndim) for t in (r0, r0x, r1, r1x))
    P0 = fr.add(fr.mul(r0, U0), fr.mul(r0x, U1))
    P1 = fr.add(fr.mul(r1, U0), fr.mul(r1x, U1))
    return jnp.concatenate([P0, P1], axis=-1).reshape(chunk.shape)


@jax.jit
def _rec_big(u0, u1, r0, r0x, r1, r1x):
    return (
        fr.add(fr.mul(r0, u0), fr.mul(r0x, u1)),
        fr.add(fr.mul(r1, u0), fr.mul(r1x, u1)),
    )


@jax.jit
def _combine_small(st_chunk, ext_chunk, xe, xo):
    """Enter-level combine, whole (u, v) pairs in-chunk.  s = |xe|.
    even = u + xe*v on position 2t; odd = u_ext + xo*v_ext on 2t+1
    (the body of tree._enter_level, flattened)."""
    s = xe.shape[-1]
    u_pairs = st_chunk.reshape(fr.NLIMB, st_chunk.shape[-1] // (2 * s), 2, s)
    e_pairs = ext_chunk.reshape(u_pairs.shape)
    u, v = u_pairs[..., 0, :], u_pairs[..., 1, :]
    ue, ve = e_pairs[..., 0, :], e_pairs[..., 1, :]
    xe, xo = _b(xe, u.ndim), _b(xo, u.ndim)
    even = fr.add(u, fr.mul(xe, v))
    odd = fr.add(ue, fr.mul(xo, ve))
    out = jnp.stack([even, odd], axis=-1)  # (20, U, s, 2)
    return out.reshape(st_chunk.shape)


@jax.jit
def _combine_big(u, v, ue, ve, xe, xo):
    """Enter-level combine across chunks: inputs are C-chunks of u / v /
    their extends at matching in-span offsets; outputs the two adjacent
    C-chunks covering the interleaved 2C output positions."""
    C = u.shape[-1]
    even = fr.add(u, fr.mul(xe, v))
    odd = fr.add(ue, fr.mul(xo, ve))
    out = jnp.stack([even, odd], axis=-1).reshape(fr.NLIMB, 2 * C)
    return out[:, :C], out[:, C:]


_concat_jit = jax.jit(lambda chunks: jnp.concatenate(chunks, axis=-1))


# ---------------------------------------------------------------------------
# Pass drivers over chunk lists
# ---------------------------------------------------------------------------


def _dec_pass(chunks, span, tabs, C):
    """One decompose level over all subproblems.  tabs: 4 whole tables
    (span <= C) or 4 lists of table chunks (span >= 2C)."""
    if span <= C:
        t = tabs
        return [_dec_small(ch, t[0], t[1], t[2], t[3]) for ch in chunks]
    half = span // 2
    hc = half // C  # chunks per half-span
    out = list(chunks)
    n_sub = (len(chunks) * C) // span
    for v in range(n_sub):
        base = v * span // C
        for t in range(hc):
            i0, i1 = base + t, base + hc + t
            out[i0], out[i1] = _dec_big(
                chunks[i0], chunks[i1],
                tabs[0][t], tabs[1][t], tabs[2][t], tabs[3][t],
            )
    return out


def _rec_pass(chunks, half, tabs, C):
    """One recombine level: pairs of half-spans -> full spans."""
    span = 2 * half
    if span <= C:
        t = tabs
        return [_rec_small(ch, t[0], t[1], t[2], t[3]) for ch in chunks]
    hc = half // C
    out = list(chunks)
    n_pairs = (len(chunks) * C) // span
    for p in range(n_pairs):
        base = p * span // C
        for t in range(hc):
            i0, i1 = base + t, base + hc + t
            out[i0], out[i1] = _rec_big(
                chunks[i0], chunks[i1],
                tabs[0][t], tabs[1][t], tabs[2][t], tabs[3][t],
            )
    return out


def _extend_passes(chunks, s, dec_tabs, rec_tabs, C):
    """Extend every span-s subvector in the chunk list (shared tables).
    dec_tabs/rec_tabs: per-level table entries from _chunk_tables."""
    K = len(dec_tabs)
    assert K == _log2(s), (K, s)
    for j in range(K):
        chunks = _dec_pass(chunks, s >> j, dec_tabs[j], C)
    for j in reversed(range(K)):
        chunks = _rec_pass(chunks, s >> (j + 1), rec_tabs[j], C)
    return chunks


def _combine_pass(st, ext, s, xe_tabs, xo_tabs, C):
    """One enter level's combine over all (u, v) pairs."""
    if 2 * s <= C:
        return [
            _combine_small(a, b, xe_tabs, xo_tabs) for a, b in zip(st, ext)
        ]
    sc = s // C  # chunks per subvector
    out = list(st)
    n_pairs = (len(st) * C) // (2 * s)
    for p in range(n_pairs):
        base = p * 2 * sc  # chunk index of the pair's u subvector
        for t in range(sc):
            iu, iv = base + t, base + sc + t
            o0, o1 = _combine_big(
                st[iu], st[iv], ext[iu], ext[iv], xe_tabs[t], xo_tabs[t]
            )
            out[base + 2 * t], out[base + 2 * t + 1] = o0, o1
    return out


# ---------------------------------------------------------------------------
# Table chunking (device-resident, cached per tree view by the caller)
# ---------------------------------------------------------------------------


def chunk_table(tab_np: np.ndarray, C: int):
    """(20, w) host table -> whole device array (w < C: SMALL passes take
    the table whole) or list of C-chunk device arrays (w >= C: BIG passes
    index per-chunk; w is then a multiple of C)."""
    w = tab_np.shape[-1]
    if w < C:
        return jax.device_put(jnp.asarray(tab_np))
    assert w % C == 0, (w, C)
    return [
        jax.device_put(jnp.asarray(np.ascontiguousarray(tab_np[:, i:i + C])))
        for i in range(0, w, C)
    ]


def upload_chunks(flat_np: np.ndarray, C: int):
    arr = np.ascontiguousarray(flat_np)
    assert arr.ndim == 2 and arr.shape[-1] % C == 0
    return [
        jax.device_put(jnp.asarray(np.ascontiguousarray(arr[:, i:i + C])))
        for i in range(0, arr.shape[-1], C)
    ]


def device_chunks(flat_dev, C: int):
    """Split an on-device (20, N) array into C-chunks (one tiny slicing
    program keyed by (N, C) -- the MSM's accepted per-shape cost)."""
    N = flat_dev.shape[-1]
    key = ("split", flat_dev.shape, C)
    fn = _shape_jits.get(key)
    if fn is None:
        fn = jax.jit(
            lambda a, i: jax.lax.dynamic_slice_in_dim(a, i, C, axis=1)
        )
        _shape_jits[key] = fn
    return [fn(flat_dev, i) for i in range(0, N, C)]


_shape_jits: dict = {}


# ---------------------------------------------------------------------------
# Public transforms (called from FFTree.enter / FFTree.extend)
# ---------------------------------------------------------------------------


def extend(tree, evals, moiety: str, d: int):
    """Chunked FFTree.extend for unbatched (20, m) inputs."""
    C = chunk_elems()
    m = evals.shape[-1]
    dec_t, rec_t = tree._chunk_tables(d, moiety, C)
    chunks = (
        upload_chunks(evals, C)
        if isinstance(evals, np.ndarray)
        else device_chunks(evals, C)
    )
    chunks = _extend_passes(chunks, m, dec_t, rec_t, C)
    return _concat_jit(chunks)


def enter(tree, coeffs, d: int):
    """Chunked FFTree.enter for unbatched (20, n) inputs."""
    C = chunk_elems()
    n = coeffs.shape[-1]
    K = _log2(n)
    chunks = (
        upload_chunks(coeffs, C)
        if isinstance(coeffs, np.ndarray)
        else device_chunks(coeffs, C)
    )
    for k in reversed(range(K)):
        s = n >> (k + 1)  # subvector span entering this level
        if s > 1:
            dec_t, rec_t = tree._chunk_tables(d + k, "S1", C)
            ext = _extend_passes(list(chunks), s, dec_t, rec_t, C)
        else:
            ext = chunks  # extend of length-1 subvectors is the identity
        xe_t, xo_t = tree._xnn_chunks(d + k, C)
        chunks = _combine_pass(chunks, ext, s, xe_t, xo_t, C)
    return _concat_jit(chunks)


def warm_jobs():
    """(name, thunk) list covering the (closed) pass-program universe.

    Dummy-input first calls carry each program's compile; running them
    from a thread pool overlaps the few-dozen second-scale compiles at
    pipeline start instead of paying them serially inside the first
    enter/extend.  Idempotent: warmed signatures hit jax.jit's cache."""
    C = chunk_elems()

    def Z(*shape):
        return jnp.zeros((fr.NLIMB,) + shape, jnp.int32)

    ch = Z(C)
    jobs = []
    for half_lg in range(_log2(C)):  # SMALL spans 2..C
        t = Z(1 << half_lg)
        jobs.append(
            (f"dec_small_{1 << half_lg}", lambda t=t: _dec_small(ch, t, t, t, t))
        )
        jobs.append(
            (f"rec_small_{1 << half_lg}", lambda t=t: _rec_small(ch, t, t, t, t))
        )
    for s_lg in range(_log2(C)):  # SMALL combine: s = 1..C/2
        xe = Z(1 << s_lg)
        jobs.append(
            (f"combine_small_{1 << s_lg}",
             lambda xe=xe: _combine_small(ch, ch, xe, xe))
        )
    jobs.append(("dec_big", lambda: _dec_big(ch, ch, ch, ch, ch, ch)))
    jobs.append(("rec_big", lambda: _rec_big(ch, ch, ch, ch, ch, ch)))
    jobs.append(("combine_big", lambda: _combine_big(ch, ch, ch, ch, ch, ch)))
    return jobs


def warm(workers: "int | None" = None):
    """Blocking concurrent pre-compile of the pass-program universe."""
    from dvpari_tpu.fftree.tree import _warm_workers
    from concurrent.futures import ThreadPoolExecutor

    nw = workers if workers is not None else _warm_workers()
    if nw <= 1:
        return
    with ThreadPoolExecutor(max_workers=nw) as pool:
        list(pool.map(lambda j: j[1](), warm_jobs()))

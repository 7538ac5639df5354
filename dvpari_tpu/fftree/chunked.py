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


def _tile(t: jnp.ndarray, width: int) -> jnp.ndarray:
    """Tile a (20, w) periodic table across a (20, width) lane vector."""
    w = t.shape[-1]
    if w == width:
        return t
    return jnp.broadcast_to(
        t[:, None, :], (fr.NLIMB, width // w, w)
    ).reshape(fr.NLIMB, width)


def _bf(x: jnp.ndarray, a2: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """One flat butterfly pass at FULL chunk width (traced inline).

    a2/b2 are span-periodic coefficient vectors (span = |a2|): for the
    2x2 tabled butterfly out_first = t0*x_first + t1*x_second,
    out_second = t2*x_first + t3*x_second, a2 = [t0 | t3] and
    b2 = [t1 | t2].  The partner element sits at XOR-half, selected from
    two full-width rolls -- every vector op runs at (20, C) with the
    large axis minor, so the (8, 128) TPU tiling is fully utilized at
    EVERY span (the (20, V, s) per-level shapes waste up to 128x of the
    lanes at small s, measured ~1.2% VPU on the 2^18 extends)."""
    span = a2.shape[-1]
    half = span // 2
    C_ = x.shape[-1]
    A = _tile(a2, C_)
    B = _tile(b2, C_)
    j = jax.lax.iota(jnp.int32, C_)
    # (j & half) == 0 -> partner at j + half = j | half < C (no wrap);
    # else partner at j - half >= 0: the wrapped roll lanes are never
    # selected
    sw = jnp.where(
        (j & half) == 0,
        jnp.roll(x, -half, axis=-1),
        jnp.roll(x, half, axis=-1),
    )
    return fr.add(fr.mul(A, x), fr.mul(B, sw))


@jax.jit
def _ext_chain(chunk, dec_ab, rec_ab):
    """Full extend of every span-s subvector in the chunk, one program:
    the dec passes (spans s..2) then rec passes (spans 2..s) as flat
    butterflies.  s = |dec_ab[0][0]|; keyed by the table shapes only."""
    x = chunk
    for a2, b2 in dec_ab:
        x = _bf(x, a2, b2)
    for a2, b2 in rec_ab:
        x = _bf(x, a2, b2)
    return x


@jax.jit
def _enter_level_flat(chunk, dec_ab, rec_ab, xe, xo):
    """One whole enter level in-chunk (2s <= C): extend all subvectors
    (flat chain), then the combine
        out[2t] = u[t] + xe[t] v[t];  out[2t+1] = ue[t] + xo[t] ve[t]
    with the cross-pair products at full width and only the final
    interleave as a (s, 2)-minor data movement."""
    s = xe.shape[-1]
    C_ = chunk.shape[-1]
    ext = _ext_chain(chunk, dec_ab, rec_ab) if dec_ab else chunk
    jj = jax.lax.iota(jnp.int32, C_)
    swap_pair = lambda t: jnp.where(
        (jj & s) == 0,
        jnp.roll(t, -s, axis=-1),
        jnp.roll(t, s, axis=-1),
    )
    f = fr.add(chunk, fr.mul(_tile(xe, C_), swap_pair(chunk)))
    g = fr.add(ext, fr.mul(_tile(xo, C_), swap_pair(ext)))
    # first half of each 2s-pair-span holds the valid lanes
    fh = f.reshape(fr.NLIMB, C_ // (2 * s), 2, s)[:, :, 0, :]
    gh = g.reshape(fr.NLIMB, C_ // (2 * s), 2, s)[:, :, 0, :]
    out = jnp.stack([fh, gh], axis=-1)  # (20, U, s, 2)
    return out.reshape(chunk.shape)


@jax.jit
def _dec_big(e0, e1, d00, d01, d10, d11):
    """Decompose butterfly across two chunks at distance half-span."""
    return (
        fr.add(fr.mul(d00, e0), fr.mul(d01, e1)),
        fr.add(fr.mul(d10, e0), fr.mul(d11, e1)),
    )


@jax.jit
def _rec_big(u0, u1, r0, r0x, r1, r1x):
    return (
        fr.add(fr.mul(r0, u0), fr.mul(r0x, u1)),
        fr.add(fr.mul(r1, u0), fr.mul(r1x, u1)),
    )


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


def _dec_pass_big(chunks, span, tabs, C):
    """One BIG decompose level (span >= 2C): two-chunk butterflies."""
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


def _rec_pass_big(chunks, half, tabs, C):
    """One BIG recombine level: pairs of half-spans -> full spans."""
    span = 2 * half
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


def _extend_passes(chunks, s, tabs, C):
    """Extend every span-s subvector in the chunk list.

    tabs (from FFTree._chunk_tables): dict with the BIG per-level chunked
    tables (spans > C) and the compact flat-chain A/B pairs (spans <= C).
    BIG levels run as two-chunk passes; everything at or below chunk
    width runs as ONE fused chain program per chunk."""
    K = _log2(s)
    jb = max(0, K - _log2(C))  # dec levels with span > C
    assert len(tabs["big_dec"]) >= jb, (len(tabs["big_dec"]), jb)
    for j in range(jb):
        chunks = _dec_pass_big(chunks, s >> j, tabs["big_dec"][j], C)
    dec_ab = tuple(tabs["ab_dec"][j - jb] for j in range(jb, K))
    rec_ab = tuple(tabs["ab_rec"][j - jb] for j in range(jb, K))[::-1]
    if dec_ab:
        chunks = [_ext_chain(ch, dec_ab, rec_ab) for ch in chunks]
    for j in reversed(range(jb)):
        chunks = _rec_pass_big(chunks, s >> (j + 1), tabs["big_rec"][j], C)
    return chunks


def _combine_pass_big(st, ext, s, xe_tabs, xo_tabs, C):
    """One enter level's combine over all (u, v) pairs (s >= C)."""
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
    tabs = tree._chunk_tables(d, moiety, C)
    chunks = (
        upload_chunks(evals, C)
        if isinstance(evals, np.ndarray)
        else device_chunks(evals, C)
    )
    chunks = _extend_passes(chunks, m, tabs, C)
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
        if 2 * s <= C:
            # whole level (extend-all + combine) fused per chunk
            if s > 1:
                tabs = tree._chunk_tables(d + k, "S1", C)
                dec_ab = tuple(tabs["ab_dec"])
                rec_ab = tuple(tabs["ab_rec"])[::-1]
            else:
                dec_ab = rec_ab = ()
            xe_t, xo_t = tree._xnn_chunks(d + k, C)
            chunks = [
                _enter_level_flat(ch, dec_ab, rec_ab, xe_t, xo_t)
                for ch in chunks
            ]
        else:
            tabs = tree._chunk_tables(d + k, "S1", C)
            ext = _extend_passes(list(chunks), s, tabs, C)
            xe_t, xo_t = tree._xnn_chunks(d + k, C)
            chunks = _combine_pass_big(chunks, ext, s, xe_t, xo_t, C)
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

    def mk_ab(s_entry):
        dec = tuple(
            (Z(s_entry >> j), Z(s_entry >> j))
            for j in range(_log2(s_entry))
        )
        return dec, dec[::-1]

    # the full-chunk chain (prove extends above C and the BIG enter
    # levels always enter the chain at span C)
    d, r = mk_ab(C)
    jobs.append(("ext_chain_C", lambda d=d, r=r: _ext_chain(ch, d, r)))
    for lg in range(_log2(C)):  # fused enter levels: s = 1..C/2
        s = 1 << lg
        d, r = mk_ab(s) if s > 1 else ((), ())
        xe = Z(s)
        jobs.append(
            (f"enter_level_{s}",
             lambda d=d, r=r, xe=xe: _enter_level_flat(ch, d, r, xe, xe))
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

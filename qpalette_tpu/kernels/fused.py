"""Fused LUT-decode + matmul Pallas kernels (the L0 of this framework).

Reference behavior being replaced: the CUDA kernel families
  - tcq: kernels/tcq-kernels/src/inference.cu:408-637 (trellis shuffle
    decode + smem LUT + mma.m16n8k16)
  - sq/vq: kernels/vq-tensor-kernels/src/inference.cu:570-882 and the SIMT
    variants (sq-cuda-kernels, vq-cuda-kernels)
with their per-(shape,bitrate) generated wrappers (lib/linear/__init__.py).

TPU-native design (per-vreg decode, MXU matmul):
  * Weight rows (VQ) / tile-rows (TCQ) live in LANES; packed words in
    sublanes (kernels/formats.py layouts).
  * Positions are mapped to vregs so the bit-window shift is a scalar per
    vreg (VQ, stride-P/8 interleave) or an iota vector (TCQ); the window
    is two sublane-selects + shifts + or — no data-dependent control flow.
  * Codebook lookup = Mosaic lane-gather (`take_along_axis(tab, idx,
    axis=1)`) over 128-entry chunks replicated across sublanes and tiled
    across the lane width, with `where`-selects folding chunks for
    codebooks > 128 entries.
  * Decoded blocks land in a VMEM scratch in a kernel-chosen column order;
    the activation is pre-permuted once per call by reshape/transpose, so
    the MXU contraction is a plain dot.  (This mirrors how the reference
    permutes weights into mma order at pack time — here the cheap side,
    the activation, absorbs the permutation instead.)
  * Blocking: decode ALU cost is negligible on the VPU (measured); the
    binding constraint is per-grid-step overhead, so blocks are made large
    — wide lane blocks (up to 512 weight rows / 256 tile-rows) and several
    k-chunks per grid step — with accumulation over the k grid dimension
    in the revisited output block.  Pallas double-buffers the packed
    streams from HBM.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
def _interpret() -> bool:
    """Pallas interpret mode, decided PER CALL (at trace time), not at
    import: forced on via QPALETTE_INTERPRET=1 (CPU test suite), and
    automatically on whenever the default backend is not a real TPU —
    Mosaic only compiles for TPU, so the driver's virtual-CPU-device
    dryrun (xla_force_host_platform_device_count) must interpret."""
    if os.environ.get("QPALETTE_INTERPRET", "0") == "1":
        return True
    return jax.default_backend() != "tpu"
ACC = jnp.float32
DDT = jnp.bfloat16  # decoded-weight dtype for the MXU


def _cparams():
    """Grid semantics: m-blocks are independent ('parallel'); k-blocks
    accumulate into the same output ('arbitrary') — lets Mosaic pipeline
    the packed-weight DMAs across grid steps."""
    try:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
    except Exception:
        return None


def _pick_width(total: int, candidates=(512, 256, 128)) -> int:
    for c in candidates:
        if total % c == 0:
            return c
    return total  # < 128 (small models/tests): single narrow block


def _tile_tables(lut: jax.Array, bits: int, width: int = LANES) -> jax.Array:
    """(2^bits, vec) codebook -> (vec, nch, 8, 128) gather tables.

    Each 128-entry chunk is replicated across the 8 sublanes; Mosaic's
    dynamic_gather is single-vreg in BOTH dimensions, so tables are always
    one vreg wide and _gather_chunks slices wide index tiles into 128-lane
    pieces."""
    n, vec = lut.shape
    lutf = lut.astype(jnp.float32)
    nch = max(1, n // LANES)
    if n < LANES:
        lutf = jnp.pad(lutf, ((0, LANES - n), (0, 0)))
    chunks = lutf.T.reshape(vec, nch, 1, LANES)
    return jnp.tile(chunks, (1, 1, 8, 1))


def _gather_one_vreg(tab, idx):
    """tab (nch, 8, 128); idx (8, W<=128) -> values (8, W)."""
    nch = tab.shape[0]
    w = idx.shape[1]
    low = idx & (LANES - 1)
    if w < LANES:  # narrow tiles: lane-pad indices to one full vreg
        low = jnp.pad(low, ((0, 0), (0, LANES - w)))
    out = jnp.take_along_axis(tab[0], low, axis=1)
    for ch in range(1, nch):
        g = jnp.take_along_axis(tab[ch], low, axis=1)
        sel = idx >> 7
        if w < LANES:
            sel = jnp.pad(sel, ((0, 0), (0, LANES - w)))
        out = jnp.where(sel == ch, g, out)
    return out[:, :w] if w < LANES else out


def _gather_chunks(tab, idx):
    """tab (nch, 8, 128); idx (8, W) int32 (entry ids) -> values (8, W).

    Mosaic's dynamic_gather is limited to a single vreg along the gather
    dimension, so wide index tiles are processed 128 lanes at a time."""
    w = idx.shape[1]
    if w <= LANES:
        return _gather_one_vreg(tab, idx)
    parts = [_gather_one_vreg(tab, idx[:, c:c + LANES])
             for c in range(0, w, LANES)]
    return jnp.concatenate(parts, axis=1)


# ---------------------------------------------------------------------------
# VQ / SQ fused kernel
# ---------------------------------------------------------------------------

def _pick_kb(P: int, bits: int) -> int:
    for kb in (512, 256, 128):
        if P % kb == 0 and (kb // 8) * bits % 32 == 0:
            return kb
    raise ValueError(f"unsupported position count {P} for bits={bits}")


def _vq_kernel(x_ref, qw_ref, tab_ref, o_ref, d_ref, *, bits, vec, kb, kj,
               bm):
    j = pl.program_id(1)
    g = kb * bits // 256  # words per sublane-group per k-chunk
    mask = jnp.uint32((1 << bits) - 1)
    for c_kj in range(kj):
        wr = qw_ref[:, c_kj * g:(c_kj + 1) * g, :]  # (8, g, bm), no relayout
        for v in range(kb // 8):
            bit = v * bits
            c, sh = bit // 32, bit % 32
            lo = wr[:, c, :]
            if sh == 0:
                win = lo
            else:
                hi = wr[:, c + 1, :] if c + 1 < g else lo
                win = (lo >> jnp.uint32(sh)) | (
                    (hi << jnp.uint32(31 - sh)) << jnp.uint32(1))
            idx = (win & mask).astype(jnp.int32)
            for comp in range(vec):
                val = _gather_chunks(tab_ref[comp], idx)
                r = c_kj * kb * vec + (v * vec + comp) * 8
                d_ref[r:r + 8, :] = val.astype(DDT)
    acc = jax.lax.dot_general(
        x_ref[:], d_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=ACC)

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("bits", "vec", "m", "k"))
def vq_decode_matmul(x, qw_t, lut, bits: int, vec: int, m: int, k: int):
    """x (N, k) bf16; qw_t (P*bits/32, m) uint32; lut (2^bits, vec).

    Returns (N, m) f32 = x @ dequant(qw)^T (no Wscale)."""
    from qpalette_tpu.kernels.formats import vq_x_perm
    N = x.shape[0]
    P = k // vec
    kb = _pick_kb(P, bits)
    bm = _pick_width(m)
    # k-chunks per grid step, capped so the decode scratch stays ~2MB
    kj = next(c for c in (4, 2, 1)
              if (P // kb) % c == 0 and c * kb * vec <= 2048)
    gk = P // (kb * kj)
    gm = m // bm
    wpb = kb * bits // 32  # words per k-chunk

    tabs = _tile_tables(lut, bits, bm)
    g = wpb // 8
    xp = vq_x_perm(x, vec, kb).astype(DDT)
    out = pl.pallas_call(
        functools.partial(_vq_kernel, bits=bits, vec=vec, kb=kb, kj=kj,
                          bm=bm),
        out_shape=jax.ShapeDtypeStruct((N, m), ACC),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((N, kj * kb * vec), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, kj * g, bm), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tabs.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, bm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((kj * kb * vec, bm), DDT)],
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(xp, qw_t, tabs)
    return out


# ---------------------------------------------------------------------------
# TCQ fused kernel
# ---------------------------------------------------------------------------

def _tcq_decode_tiles(tr_ref, tab_ref, d_ref, KV, S, tk, wm, words_kv=None):
    """Decode tk trellis tile-columns into d_ref (16, tk*16, wm)."""
    W = 4 * KV
    maskS = jnp.uint32((1 << S) - 1)
    sv = jax.lax.broadcasted_iota(jnp.int32, (8, wm), 0)
    for kt in range(tk):
        tile_words = tr_ref[kt] if words_kv is None else \
            tr_ref[kt, :W, :]  # (4KV, wm)
        for v in range(16):
            base_bits = 8 * v * KV
            wbase = base_bits // 32
            if wbase + 8 <= W:
                win = tile_words[wbase:wbase + 8, :]
            else:  # circular bitstream: wrap to the tile's first words
                win = jnp.concatenate([tile_words[wbase:, :],
                                       tile_words[:wbase + 8 - W, :]],
                                      axis=0)
            # per-sublane word index / shift, built in-kernel from iota
            bitoff = (sv + 8 * v) * KV
            relv = (bitoff >> 5) - wbase
            shv = (bitoff & 31).astype(jnp.uint32)
            lo = jnp.take_along_axis(win, relv, axis=0)
            hi = jnp.take_along_axis(win, relv + 1, axis=0)
            state = (lo >> shv) | ((hi << (jnp.uint32(31) - shv))
                                   << jnp.uint32(1))
            u = state & jnp.uint32(0xFFFF)
            # quantlut_sym decode: h = u*(u+1); bit15 = sign of comp 0;
            # bits [16-S-1, 16-1) index the tlut (bitshift.py:71-79)
            h = u * (u + jnp.uint32(1))
            sflp = 1.0 - 2.0 * ((h >> jnp.uint32(15)) & jnp.uint32(1)
                                ).astype(jnp.int32).astype(jnp.float32)
            tidx = ((h >> jnp.uint32(16 - S - 1)) & maskS).astype(jnp.int32)
            v0 = _gather_chunks(tab_ref[0], tidx) * sflp
            v1 = _gather_chunks(tab_ref[1], tidx)
            r = kt * 16
            d_ref[v, r:r + 8, :] = v0.astype(DDT)
            d_ref[v, r + 8:r + 16, :] = v1.astype(DDT)


def _tcq_kernel(x_ref, tr_ref, tab_ref, o_ref, d_ref, *, KV, S, tk, wm):
    j = pl.program_id(1)
    _tcq_decode_tiles(tr_ref, tab_ref, d_ref, KV, S, tk, wm)
    xb = x_ref[:]  # (N, tk*16)
    accs = []
    for v in range(16):
        accs.append(jax.lax.dot_general(
            xb, d_ref[v], (((1,), (0,)), ((), ())),
            preferred_element_type=ACC))  # (N, wm)
    # output stays in (v, N, tile-row) layout; the host-side wrapper
    # transposes to (N, m) — an in-kernel lane<->sublane reshape is not
    # supported by Mosaic
    acc = jnp.stack(accs, axis=0)  # (16, N, wm)

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("KV", "S", "m", "k"))
def tcq_decode_matmul(x, tr_kt, tlut, KV: int, S: int, m: int, k: int):
    """x (N, k) bf16; tr_kt (k/16, 4KV, m/16) uint32; tlut (2^S, 2).

    Returns (N, m) f32 = x @ dequant(trellis)^T (no Wscale)."""
    N = x.shape[0]
    kt_total = k // 16
    tk = next(c for c in (16, 8, 4, 2, 1) if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(256, 128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    # activation permutation: within each 16-col tile, (2s+c) -> (c*8+s)
    xp = x.reshape(N, k // 16, 8, 2).transpose(0, 1, 3, 2).reshape(N, k)
    xp = xp.astype(DDT)

    tabs = _tile_tables(tlut, S, wm)
    out = pl.pallas_call(
        functools.partial(_tcq_kernel, KV=KV, S=S, tk=tk, wm=wm),
        out_shape=jax.ShapeDtypeStruct((16, N, m // 16), ACC),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((N, tk * 16), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 4 * KV, wm), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tabs.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, N, wm), lambda i, j: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, tk * 16, wm), DDT)],
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(xp, tr_kt, tabs)
    # (v, N, tile-row) -> (N, m): weight row = tile_row * 16 + v
    return out.transpose(1, 2, 0).reshape(N, m)


def _tcomb_kernel(x_ref, tr_ref, tab_ref, o_ref, d_ref, *, KV1, KV2, S,
                  tk, wm, gk1):
    """Both tcomb halves in one kernel: k-blocks j < gk1 decode at KV1
    (tiles zero-padded to the KV2 word width), the rest at KV2."""
    j = pl.program_id(1)

    @pl.when(j < gk1)
    def _():
        _tcq_decode_tiles(tr_ref, tab_ref, d_ref, KV1, S, tk, wm,
                          words_kv=KV1)

    @pl.when(j >= gk1)
    def _():
        _tcq_decode_tiles(tr_ref, tab_ref, d_ref, KV2, S, tk, wm,
                          words_kv=KV2)

    xb = x_ref[:]
    accs = []
    for v in range(16):
        accs.append(jax.lax.dot_general(
            xb, d_ref[v], (((1,), (0,)), ((), ())),
            preferred_element_type=ACC))
    acc = jnp.stack(accs, axis=0)

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("KV1", "KV2", "S", "m", "k"))
def tcomb_decode_matmul(x, trc, tlut, KV1: int, KV2: int, S: int, m: int,
                        k: int):
    """x (N, k); trc (k/16, 4*KV2, m/16) padded-concat halves (n/2 each)."""
    N = x.shape[0]
    kt_total = k // 16
    half = kt_total // 2
    tk = next(c for c in (16, 8, 4, 2, 1) if half % c == 0)
    wm = _pick_width(m // 16, candidates=(256, 128, 64))
    gk = kt_total // tk
    gk1 = half // tk
    gm = (m // 16) // wm
    xp = x.reshape(N, k // 16, 8, 2).transpose(0, 1, 3, 2).reshape(N, k)
    xp = xp.astype(DDT)
    tabs = _tile_tables(tlut, S, wm)
    out = pl.pallas_call(
        functools.partial(_tcomb_kernel, KV1=KV1, KV2=KV2, S=S, tk=tk,
                          wm=wm, gk1=gk1),
        out_shape=jax.ShapeDtypeStruct((16, N, m // 16), ACC),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((N, tk * 16), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 4 * KV2, wm), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tabs.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, N, wm), lambda i, j: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((16, tk * 16, wm), DDT)],
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(xp, trc, tabs)
    return out.transpose(1, 2, 0).reshape(N, m)


# ---------------------------------------------------------------------------
# TCQ1 / TCQ2: arithmetic (gather-free) trellis decode — the TPU fast path
# ---------------------------------------------------------------------------

_MAD1_A, _MAD1_B = 34038481, 76625530
_MAD2_A, _MAD2_B, _MAD2_C = 264435761, 1013904223, 1664525
_MAD_INV = 1.0 / 147.800537109375


def _roll_next(plane, step: int = 1):
    """Sublane roll by -step: sublane t gets sublane (t+step) % rows —
    recovers the dense layouts' carry word (formats.planar_dense: step 1;
    formats.planar_dense_odd: step 2, parity-preserving)."""
    try:
        return pltpu.roll(plane, -step, 0)
    except Exception:
        return jnp.roll(plane, -step, axis=0)


def _planar_states(tr_ref, kt, KV, NP, sub, dense=False):
    """Yield the 16 masked state vectors of planar tile kt.

    sub = sublanes per plane: 16 for tcq1 (V=1), 8 for tcq2 (V=2).
    Aligned layout: row j*sub + t holds the window [16*KV*t + 32*j, +32)
    of the tile's circular bitstream, so state i of every sublane group is
    two constant shifts.  Dense layout (even KV, formats.planar_dense):
    row j*sub + t holds the RAW word KV/2*t + j — zero storage inflation —
    and the carry word KV/2*(t+1) is one sublane roll of plane 0."""
    planes = [tr_ref[kt, jj * sub:(jj + 1) * sub, :] for jj in range(NP)]
    if dense:
        planes.append(_roll_next(planes[0]))
    M16 = jnp.uint32(0xFFFF)
    for i in range(16):
        off = KV * i
        j0, sh = off >> 5, off & 31
        if sh + 16 <= 32:
            u = planes[j0] >> jnp.uint32(sh) if sh else planes[j0]
        else:
            u = ((planes[j0] >> jnp.uint32(sh))
                 | (planes[j0 + 1] << jnp.uint32(32 - sh)))
        yield i, u & M16


def _planar_states_odd(tr_ref, dt, KV, sub):
    """Yield the 32 masked state vectors of DOUBLE-tile dt in the dense
    odd-KV layout (formats.planar_dense_odd) as (m-row i, parity p, u).

    sub = sublanes per plane: 16 for V=1, 8 for V=2.  Sublane s holds the
    sublane-pair-group r = s>>1 of tile h = s&1; plane j is the group's
    raw word r*KV + j, so the state at m-row i, stream parity p sits at
    the group-relative bit offset KV*(16p + i) — a constant shift per
    (i, p), uniform across sublanes.  The carry word (group's word KV) is
    a parity-preserving sublane roll by -2 of plane 0."""
    planes = [tr_ref[dt, jj * sub:(jj + 1) * sub, :] for jj in range(KV)]
    planes.append(_roll_next(planes[0], 2))
    M16 = jnp.uint32(0xFFFF)
    for p in range(2):
        for i in range(16):
            off = KV * (16 * p + i)
            j0, sh = off >> 5, off & 31
            if sh + 16 <= 32:
                u = planes[j0] >> jnp.uint32(sh) if sh else planes[j0]
            else:
                u = ((planes[j0] >> jnp.uint32(sh))
                     | (planes[j0 + 1] << jnp.uint32(32 - sh)))
            yield i, p, u & M16


def _mad_scramble(u, mode: str):
    """16-bit state (uint32 vec) -> scrambled 32-bit word h whose byte sum
    (minus 510, scaled) is the decoded weight.

    1mad: one LCG step (reference decode_1mad, bitshift.py:16-25).
    2mad: second stage x += hi32(x*C) with the 32x32->hi32 multiply
    emulated in 16-bit limbs on the VPU (reference decode_2mad,
    bitshift.py:28-39; exactness checked in tests)."""
    if mode == "1mad":
        return u * jnp.uint32(_MAD1_A) + jnp.uint32(_MAD1_B)
    assert mode == "2mad", mode
    h0 = u * jnp.uint32(_MAD2_A) + jnp.uint32(_MAD2_B)
    CH = jnp.uint32(_MAD2_C >> 16)
    CL = jnp.uint32(_MAD2_C & 0xFFFF)
    xl = h0 & jnp.uint32(0xFFFF)
    xh = h0 >> jnp.uint32(16)
    lowc = (xl * CL) >> jnp.uint32(16)
    mid = xl * CH + xh * CL
    hi = xh * CH + ((mid + lowc) >> jnp.uint32(16))
    return hi + h0


def _bytes_as_bf16(h_chunk, interpret: bool):
    """(R, C) uint32 (already XOR 0x80808080) -> (4R, C) bf16 whose values
    are int8 reinterpretations of the bytes (= original byte - 128).

    Compiled path: Mosaic sublane bitcast u32 -> i8 (row 4s+b = byte b,
    little-endian) + exact i8->bf16 convert.  Interpret path mirrors the
    same byte order with shifts."""
    if not interpret:
        return pltpu.bitcast(h_chunk, jnp.int8).astype(DDT)
    R, C = h_chunk.shape
    parts = [((((h_chunk >> jnp.uint32(8 * b)) & jnp.uint32(255))
               .astype(jnp.int32) ^ 128) - 128) for b in range(4)]
    return jnp.stack(parts, axis=1).reshape(4 * R, C).astype(DDT)


def _bytes_i8(h_chunk, interpret: bool):
    """(R, C) uint32 -> (4R, C) int8 view of the bytes (little-endian row
    order 4r+b).  Compiled: free sublane bitcast; interpret: shifts."""
    if not interpret:
        return pltpu.bitcast(h_chunk, jnp.int8)
    R, C = h_chunk.shape
    parts = [(((h_chunk >> jnp.uint32(8 * b)) & jnp.uint32(255))
              .astype(jnp.int32)) for b in range(4)]
    parts = [jnp.where(p >= 128, p - 256, p) for p in parts]
    return jnp.stack(parts, axis=1).reshape(4 * R, C).astype(jnp.int8)


def _bytes_as_bf16_signed(h_chunk, interpret: bool):
    """(R, C) uint32 -> (4R, C) bf16 of the SIGNED (int8) bytes."""
    if not interpret:
        return pltpu.bitcast(h_chunk, jnp.int8).astype(DDT)
    return _bytes_i8(h_chunk, interpret).astype(DDT)


def _arith_kernel(x_ref, tr_ref, o_ref, d0, d1, *, KV, tk, wm, cc, NP,
                  v2, mode, a8, pingpong, interp, dense, dense_odd=False):
    """Unified planar arithmetic-trellis decode + MXU byte-sum matmul.

    v2=False (tcq1): one 16-bit state per weight, scramble per `mode`
    (1mad / 2mad), bytes stored XOR 0x80808080 so the signed-byte sum is
    (unsigned sum - 512) and the +2*sum(x) epilogue lands the reference
    value (bitshift.py:16-39).
    v2=True, mode='dualmad' (tcq2): one state per weight PAIR; h1 = u*A1,
    h2 = u*A2 with SIGNED bytes and no correction
    (codebooks.decode_dualmad) — half the window extractions per weight.
    v2=True, mode='sum2' (tcq2s): ONE scramble h = u*A1 + B per pair;
    weight0 = signed bytes b0+b1, weight1 = b2+b3
    (codebooks.decode_sum2) — the MXU streams 2 bytes/weight instead of
    4, lifting the dot off the critical path (scripts/proto_round3.py).

    dense=True (even KV): planes are raw stream words (zero storage
    inflation, formats.planar_dense); the carry plane is one sublane roll.

    a8=False: bytes ride the MXU as exact bf16 (int8 values convert
    losslessly) against repeat(x, 4 or 2) — bit-exact decode.
    a8=True: bytes stay int8 and the dot runs the MXU's native
    int8 x int8 -> int32 path.  The activation quantization is fused
    IN-KERNEL (round 5): x arrives f32, each grid-j step computes its
    k-chunk's absmax scale, quantizes to int8 on the VPU, and
    accumulates the int32 dot into the f32 output scaled by that chunk's
    sx_j.  This deletes the per-call XLA abs-reduce + round/convert +
    descale passes (~140 us/token across the 129 decode-step linears,
    jax.profiler trace 2026-08-21) and tightens accuracy: per-k-chunk
    scales bound the quantization error by the chunk's own absmax, not
    the global one.  ~2.2x the bf16-path throughput measured on v5e
    (scripts/proto_fold2.py); incoherence keeps rotated activations
    near-Gaussian so the W8A8-style error stays far below the 3-bit
    weight error.

    pingpong=True decodes alternate chunks into two scratch buffers so
    Mosaic can overlap chunk c's dot with chunk c+1's decode (they have
    no buffer dependency); measured win for small-m shapes."""
    j = pl.program_id(1)
    XOR = jnp.uint32(0x80808080)
    A1, A2 = jnp.uint32(_MAD1_A), jnp.uint32(_MAD2_A)
    B1 = jnp.uint32(_MAD1_B)
    sub = 8 if v2 else 16
    sum2 = v2 and mode == "sum2"
    tpr = 8 if sum2 else 16  # scratch rows (uint32) per trellis tile

    def decode_tile(kt, d_ref, row0):
        for i, u in _planar_states(tr_ref, kt, KV, NP, sub, dense):
            r = row0 + kt * tpr
            if sum2:
                d_ref[r:r + 8, i * wm:(i + 1) * wm] = u * A1 + B1
            elif v2:
                d_ref[r:r + 8, i * wm:(i + 1) * wm] = u * A1
                d_ref[r + 8:r + 16, i * wm:(i + 1) * wm] = u * A2
            else:
                d_ref[r:r + 16, i * wm:(i + 1) * wm] = \
                    _mad_scramble(u, mode) ^ XOR

    def decode_dtile(dt, d_ref, row0):
        # dense odd-KV double-tile: scratch rows per double-tile group by
        # (parity p, sublane s); the host x-prep permutes the activation
        # into the matching byte-row order (see _arith_decode_matmul)
        for i, p, u in _planar_states_odd(tr_ref, dt, KV, sub):
            r = row0 + dt * 2 * tpr
            if sum2:
                rr = r + p * 8
                d_ref[rr:rr + 8, i * wm:(i + 1) * wm] = u * A1 + B1
            elif v2:
                rr = r + p * 8
                d_ref[rr:rr + 8, i * wm:(i + 1) * wm] = u * A1
                d_ref[rr + 16:rr + 24, i * wm:(i + 1) * wm] = u * A2
            else:
                rr = r + p * 16
                d_ref[rr:rr + 16, i * wm:(i + 1) * wm] = \
                    _mad_scramble(u, mode) ^ XOR

    x = x_ref[0]  # (N, 4*tpr*tk)
    sx = None
    if a8:
        # in-kernel activation quantization: this grid-j step's k-chunk
        # absmax scale; the int32 dot accumulates into o_ref scaled by
        # it.  sx stays a (1, 1) vector value end-to-end (scalar
        # extraction + re-broadcast costs a serializing ~100-cycle round
        # trip per grid step on Mosaic)
        sx = (jnp.max(jnp.abs(x), axis=(0, 1), keepdims=True) / 127.0
              + 1e-30)
        x = jnp.round(x * (1.0 / sx)).astype(jnp.int8)
    acc = None
    for c in range(tk // cc):
        c0 = c * cc
        if pingpong:
            d_ref, row0 = (d0, -c0 * tpr) if c % 2 == 0 else (d1, -c0 * tpr)
        else:
            d_ref, row0 = d0, 0
        if dense_odd:
            for dt in range(c0 // 2, (c0 + cc) // 2):
                decode_dtile(dt, d_ref, row0)
        else:
            for kt in range(c0, c0 + cc):
                decode_tile(kt, d_ref, row0)
        lo = 0 if pingpong else c0 * tpr
        chunk = d_ref[lo:lo + cc * tpr, :]
        if a8:
            hmat = _bytes_i8(chunk, interp)
        elif v2:
            hmat = _bytes_as_bf16_signed(chunk, interp)
        else:
            hmat = _bytes_as_bf16(chunk, interp)
        part = jax.lax.dot_general(
            x[:, c0 * 4 * tpr:(c0 + cc) * 4 * tpr], hmat,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if a8 else o_ref.dtype)
        acc = part if acc is None else acc + part
    if a8:  # descale this chunk's int32 sum into the f32 accumulator
        acc = acc.astype(jnp.float32) * sx

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def _tcq2_x4(x, gk, tk):
    """x (N, k) -> (gk, N, 4*tk*16): per 16-col tile, evens repeated 4x
    then odds repeated 4x — matches the scratch byte-row order (h1 block
    = even k-cols, h2 block = odd k-cols)."""
    N = x.shape[0]
    xp = x.reshape(N, gk, tk, 8, 2).transpose(1, 0, 2, 4, 3)
    x4 = jnp.repeat(xp.reshape(gk, N, tk, 16), 4, axis=3)
    return x4.reshape(gk, N, 4 * tk * 16)


def _odd_src_perm32(v2: bool, sum2: bool):
    """Dense odd-KV byte-row order: source k-col (within each 32-col
    double-tile group) for each target byte position (len 32*repeat).

    Byte row within a double-tile (see _arith_kernel.decode_dtile):
      sum2:     64 rows (p, r, h, w, j)   src k-col = 16h + 4r + 2p + w
      dualmad: 128 rows (c, p, r, h, b4)  src k-col = 16h + 4r + 2p + c
      v1:      128 rows (p, r, h, b4)     src k-col = 16h + 2r + p
    """
    if sum2:
        return np.array([16 * h + 4 * r + 2 * p + w
                         for p in range(2) for r in range(4)
                         for h in range(2) for w in range(2)
                         for _ in range(2)], np.int64)
    if v2:
        return np.array([16 * h + 4 * r + 2 * p + c
                         for c in range(2) for p in range(2)
                         for r in range(4) for h in range(2)
                         for _ in range(4)], np.int64)
    return np.array([16 * h + 2 * r + p
                     for p in range(2) for r in range(8)
                     for h in range(2) for _ in range(4)], np.int64)


def _odd_x_prep(x, gk, tk, v2: bool, sum2: bool):
    """Host activation permutation for the dense odd-KV layout (pure
    reshape/transpose + repeat): x (N, k) -> (gk, N, 4*tpr*tk)."""
    N = x.shape[0]
    nd = tk // 2  # double-tiles per k-chunk
    if sum2:
        xp = x.reshape(N, gk, nd, 2, 4, 2, 2)       # (h, r, p, w)
        xp = xp.transpose(1, 0, 2, 5, 4, 3, 6)       # -> (p, r, h, w)
        return jnp.repeat(xp.reshape(gk, N, tk * 16), 2, axis=2)
    if v2:
        xp = x.reshape(N, gk, nd, 2, 4, 2, 2)       # (h, r, p, c)
        xp = xp.transpose(1, 0, 2, 6, 5, 4, 3)       # -> (c, p, r, h)
        return jnp.repeat(xp.reshape(gk, N, tk * 16), 4, axis=2)
    xp = x.reshape(N, gk, nd, 2, 8, 2)               # (h, r, p)
    xp = xp.transpose(1, 0, 2, 5, 4, 3)              # -> (p, r, h)
    return jnp.repeat(xp.reshape(gk, N, tk * 16), 4, axis=2)


# Measured block-parameter table for the Llama-3.1-8B decode shapes
# (scripts/tune_sum2.py medians on v5e); missing shapes fall back to the
# heuristic below.
_TUNE_TABLE = {
    # round-4 sweep (scripts/tune_r4_qkv_o.py): wm=384 makes qkv a
    # single-m-block grid (24 -> 8 steps, 364 -> 1246 Gw/s isolated)
    ("sum2", 6144, 4096): dict(tk=32, wm=384, cc=8, pingpong=False),
    ("sum2", 4096, 4096): dict(tk=64, wm=256, cc=8, pingpong=True),
    ("sum2", 28672, 4096): dict(tk=64, wm=256, cc=8, pingpong=False),
    ("sum2", 4096, 14336): dict(tk=32, wm=256, cc=8, pingpong=True),
}


def _rot_prep(x, su, blocks: int, n: int, repeat: int, gk: int,
              src_perm32=None):
    """Fused incoherence-rotation + byte-row-repeat activation prep.

    Computes z = (x ⊙ su) @ Ĥᵀ (models/llama._rotate_in semantics, incl.
    block-diagonal rcp rotations) with the kernel's lane-repeat FOLDED into
    the rotation's second Kronecker factor: duplicating H_b's columns
    `repeat`× makes the contraction emit out[..., r*(i*b+j)+q] =
    z[i*b+j] directly — the row-major flatten of (a, repeat*b) IS the
    repeated flat vector.  This deletes the separate jnp.repeat relayout
    (the costliest XLA op in the old prep at (1, 28672)) and the bf16
    round-trip between rotation and quantization (the north star's
    "rotation fused into the matmul prologue").

    src_perm32 (dense odd-KV layouts): length 32*repeat array giving the
    source k-col (within each 32-col double-tile group) of every target
    byte position — the byte-row permutation is folded into the factor's
    column order (requires the factor width to be a multiple of 32, see
    qlinear.can_fuse_rot).

    Returns (gk, N, repeat*n/gk) float32.
    """
    from qpalette_tpu.ops.hadamard import _factor_mats, get_had_factors
    nb = n // blocks
    facs = get_had_factors(nb)
    assert len(facs) <= 2, facs
    N = x.shape[0]
    y = x.astype(jnp.float32) * su.astype(jnp.float32)[None, :]
    scale = np.float64(nb) ** -0.5

    def expand_cols(Hb):
        if src_perm32 is None:
            return np.repeat(Hb, repeat, axis=1)
        b = Hb.shape[1]
        assert b % 32 == 0, b
        idx = (np.arange(0, b, 32)[:, None]
               + np.asarray(src_perm32)[None, :]).reshape(-1)
        return Hb[:, idx]

    if len(facs) == 1:
        _, mats = _factor_mats(nb, True, "float32")
        Hb2 = expand_cols(mats[0]) * scale
        z = jax.lax.dot_general(
            y.reshape(N * blocks, nb), jnp.asarray(Hb2),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    else:
        a, b = facs
        _, mats = _factor_mats(nb, True, "float32")
        Hb2 = expand_cols(mats[1]) * scale
        z = jnp.einsum("zij,ia,jb->zab", y.reshape(N * blocks, a, b),
                       jnp.asarray(mats[0]), jnp.asarray(Hb2))
    # flat (N, repeat*n), chunk-contiguous -> (gk, N, repeat*chunk)
    z = z.reshape(N, gk, repeat * n // gk)
    return z.transpose(1, 0, 2)


def _arith_decode_matmul(x, tr_pl, KV: int, mode: str, m: int, k: int,
                         v2: bool, a8: bool, tune: tuple = (),
                         pre_rot=None):
    """Shared host wrapper for tcq1/tcq2/tcq2s fused decode (see
    _arith_kernel).

    Block parameters follow the v5e sweeps (scripts/proto_fold2.py,
    proto_round3.py, tune_sum2.py): sum2 favors big k-blocks + wm=256 +
    scratch ping-pong (decode and dot overlap); dualmad/v1 keep the
    round-2 heuristic.  `tune` = ((key, val), ...) overrides
    {tk, wm, cc, pingpong} for autotuning sweeps."""
    from qpalette_tpu.kernels.formats import (planar_n_planes, planar_dense,
                                              planar_dense_odd)
    sum2 = v2 and mode == "sum2"
    tune = dict(_TUNE_TABLE.get((mode, m, k), {}) if a8 and sum2 else {},
                **dict(tune))
    N = x.shape[0]
    NP = planar_n_planes(KV)
    dense = planar_dense(KV)
    dense_odd = planar_dense_odd(KV, k)
    tpr = 8 if sum2 else 16
    kt_total = k // 16
    tk0 = tune.get("tk", 64 if sum2 and a8 else 32)
    tkc = (tk0, 64, 32, 16, 8, 4, 2) if dense_odd else \
        (tk0, 64, 32, 16, 8, 4, 2, 1)
    tk = next(c for c in tkc if c <= tk0 and kt_total % c == 0)
    if "wm" in tune and (m // 16) % tune["wm"] == 0:
        wm = tune["wm"]
    elif a8 and (sum2 or k > 8192) and (m // 16) % 256 == 0:
        wm = 256
    else:
        wm = _pick_width(m // 16, candidates=(128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    cc0 = tune.get("cc", 8)
    ccc = (cc0, 8, 4, 2) if dense_odd else (cc0, 8, 4, 2, 1)
    cc = next(c for c in ccc if tk % c == 0)
    pingpong = tune.get("pingpong",
                        a8 and (sum2 or m <= 4096) and tk // cc >= 2)
    pingpong = pingpong and tk // cc >= 2

    if pre_rot is not None:
        # x is the UN-rotated activation; rotation + repeat (and, for the
        # dense odd-KV layout, the byte-row permutation) fused in one
        # contraction chain (see _rot_prep).  dualmad's interleaved even/
        # odd permutation is not a plain repeat — callers must not fuse it.
        assert not (v2 and mode == "dualmad"), "pre_rot unsupported: dualmad"
        su_r, blocks_r = pre_rot
        perm = _odd_src_perm32(v2, sum2) if dense_odd else None
        xp = _rot_prep(x, su_r, blocks_r, k, 2 if sum2 else 4, gk,
                       src_perm32=perm)
    elif dense_odd:
        xp = _odd_x_prep(x, gk, tk, v2, sum2)
    elif sum2:  # natural pair order: pair t = cols (2t, 2t+1)
        xp = jnp.repeat(x.reshape(N, gk, tk * 16).transpose(1, 0, 2), 2,
                        axis=2)
    elif v2:
        xp = _tcq2_x4(x, gk, tk)
    else:
        xp = jnp.repeat(x.reshape(N, gk, tk * 16).transpose(1, 0, 2), 4,
                        axis=2)
    sumx = None
    if not v2:
        # +2*sum(z) epilogue needs the ROTATED activation's sum; derive it
        # from xp (each z entry appears 4x) so the fused-rot path never
        # materializes z separately
        sumx = (jnp.sum(xp.astype(jnp.float32), axis=(0, 2))[None, :].T
                / 4.0) if pre_rot is not None else \
            jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)
    if a8:
        # activation quantization happens IN-KERNEL (per-k-chunk scales,
        # see _arith_kernel); pass f32 and accumulate f32
        xp = xp.astype(jnp.float32)
        odtype = jnp.float32
    else:
        xp = xp.astype(DDT)
        odtype = ACC
    interp = _interpret()
    rows = (cc if pingpong else tk) * tpr
    scratch = [pltpu.VMEM((rows, 16 * wm), jnp.uint32),
               pltpu.VMEM((rows, 16 * wm) if pingpong else (8, 128),
                          jnp.uint32)]
    sub = 8 if v2 else 16
    tr_block = ((tk // 2, KV * sub, wm) if dense_odd else
                (tk, NP * sub, wm))
    out = pl.pallas_call(
        functools.partial(_arith_kernel, KV=KV, tk=tk, wm=wm, cc=cc, NP=NP,
                          v2=v2, mode=mode, a8=a8, pingpong=pingpong,
                          interp=interp, dense=dense, dense_odd=dense_odd),
        out_shape=jax.ShapeDtypeStruct((N, m), odtype),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((1, N, 4 * tpr * tk), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tr_block, lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 16 * wm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=_cparams(),
        interpret=interp,
    )(xp, tr_pl)
    out = out.astype(jnp.float32)
    if not v2:  # XOR'd bytes: signed sum = unsigned - 512 => +2 epilogue
        out = (out + 2.0 * sumx) * _MAD_INV
    else:
        out = out * _MAD_INV
    # block column order is (m-row-in-tile, mcol)
    return (out.reshape(N, gm, 16, wm).transpose(0, 1, 3, 2)
            .reshape(N, m))


@functools.partial(jax.jit, static_argnames=("KV", "mode", "m", "k", "a8",
                                              "rot_blocks"))
def tcq1_decode_matmul(x, tr_pl, KV: int, mode: str, m: int, k: int,
                       a8: bool = False, su=None, rot_blocks: int = 1):
    """x (N, k); tr_pl (k/16, NP*16, m/16) uint32 planar layout
    (formats.tcq1_planar_weights).  Returns (N, m) f32 = x @ W^T.

    mode in {1mad, 2mad}; a8=True uses the int8-activation MXU path.
    su!=None: x is UN-rotated; the incoherence rotation (x ⊙ su) @ Ĥᵀ
    (block-diagonal over rot_blocks) is fused into the activation prep."""
    pre_rot = None if su is None else (su, rot_blocks)
    return _arith_decode_matmul(x, tr_pl, KV, mode, m, k, v2=False, a8=a8,
                                pre_rot=pre_rot)


@functools.partial(jax.jit, static_argnames=("KV", "m", "k", "a8", "mode",
                                              "tune", "rot_blocks"))
def tcq2_decode_matmul(x, tr_pl, KV: int, m: int, k: int, a8: bool = False,
                       mode: str = "dualmad", tune: tuple = (), su=None,
                       rot_blocks: int = 1):
    """x (N, k); tr_pl (k/16, NP*8, m/16) uint32 planar layout
    (formats.tcq2_planar_weights).  Returns (N, m) f32 = x @ W^T.

    mode: 'dualmad' (tcq2) or 'sum2' (tcq2s, halved MXU feed).
    su!=None (sum2 only): fused-rotation prologue, see tcq1_decode_matmul."""
    pre_rot = None if su is None else (su, rot_blocks)
    return _arith_decode_matmul(x, tr_pl, KV, mode, m, k, v2=True,
                                a8=a8, tune=tune, pre_rot=pre_rot)


def _sum2_bytes(u, XOR, MPAIR):
    g = (u * jnp.uint32(_MAD1_A) + jnp.uint32(_MAD1_B)) ^ XOR
    return (g & MPAIR) + ((g >> jnp.uint32(8)) & MPAIR)


def _tcq2_dequant_kernel(tr_ref, o_ref, *, KV, tk, wm, NP, mode, dense,
                         dense_odd):
    MPAIR = jnp.uint32(0x00FF00FF)
    XOR = jnp.uint32(0x80808080)
    A1, A2 = jnp.uint32(_MAD1_A), jnp.uint32(_MAD2_A)

    def decode_u(u, half):
        """One scrambled state -> the `half`-th weight of each pair."""
        if mode == "sum2":
            t2 = _sum2_bytes(u, XOR, MPAIR)
            s2 = (t2 >> jnp.uint32(16 * half)) & jnp.uint32(0x3FF)
            return ((s2.astype(jnp.int32) - 256).astype(jnp.float32)
                    * _MAD_INV)
        g = (u * (A1 if half == 0 else A2)) ^ XOR
        t2 = (g & MPAIR) + ((g >> jnp.uint32(8)) & MPAIR)
        s4 = (t2 + (t2 >> jnp.uint32(16))) & jnp.uint32(0x7FF)
        return ((s4.astype(jnp.int32) - 512).astype(jnp.float32)
                * _MAD_INV)

    if dense_odd:
        # rows (dt, p, half, s): k = 32*dt + 16*(s&1) + 4*(s>>1) + 2p + half
        for dt in range(tk // 2):
            for i, p, u in _planar_states_odd(tr_ref, dt, KV, 8):
                for half in (0, 1):
                    r = dt * 32 + p * 16 + half * 8
                    o_ref[r:r + 8, i * wm:(i + 1) * wm] = \
                        decode_u(u, half).astype(DDT)
        return
    for kt in range(tk):
        for i, u in _planar_states(tr_ref, kt, KV, NP, 8, dense):
            for half in (0, 1):
                r = kt * 16 + half * 8
                o_ref[r:r + 8, i * wm:(i + 1) * wm] = \
                    decode_u(u, half).astype(DDT)


def _v2_row_perm(k: int, dense_odd: bool) -> np.ndarray:
    """natural k -> kernel row index (within the full k dim) for the V=2
    dequant kernels' row order."""
    if dense_odd:
        perm = np.empty(32, np.int64)
        for p in range(2):
            for half in range(2):
                for s in range(8):
                    kk = 16 * (s & 1) + 4 * (s >> 1) + 2 * p + half
                    perm[kk] = p * 16 + half * 8 + s
        base = np.arange(k // 32)[:, None] * 32
    else:
        perm = np.empty(16, np.int64)
        for half in range(2):
            for t in range(8):
                perm[2 * t + half] = half * 8 + t
        base = np.arange(k // 16)[:, None] * 16
    return (base + perm[None, :]).reshape(-1)


@functools.partial(jax.jit, static_argnames=("KV", "m", "k", "mode",
                                             "kernel_order"))
def tcq2_dequant(tr_pl, KV: int, m: int, k: int, mode: str = "dualmad",
                 kernel_order: bool = False):
    """planar tcq2 trellis -> W^T (k, m) bf16 in HBM.

    kernel_order=True returns the raw kernel layout (rows permuted within
    16/32-row groups by _v2_row_perm, columns in (m-row-in-tile, mcol)
    block order) with NO host-side relayout — the layout dequant_matmul
    consumes.  kernel_order=False applies the fixups to natural (k, m)."""
    from qpalette_tpu.kernels.formats import (planar_n_planes, planar_dense,
                                              planar_dense_odd)
    NP = planar_n_planes(KV)
    dense_odd = planar_dense_odd(KV, k)
    kt_total = k // 16
    tkc = (32, 16, 8, 4, 2) if dense_odd else (32, 16, 8, 4, 2, 1)
    tk = next(c for c in tkc if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    tr_block = (tk // 2, KV * 8, wm) if dense_odd else (tk, NP * 8, wm)
    out = pl.pallas_call(
        functools.partial(_tcq2_dequant_kernel, KV=KV, tk=tk, wm=wm, NP=NP,
                          mode=mode, dense=planar_dense(KV),
                          dense_odd=dense_odd),
        out_shape=jax.ShapeDtypeStruct((k, m), DDT),
        grid=(gm, gk),
        in_specs=[pl.BlockSpec(tr_block, lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tk * 16, 16 * wm), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(tr_pl)
    if kernel_order:
        return out
    out = jnp.take(out, jnp.asarray(_v2_row_perm(k, dense_odd)), axis=0)
    # block columns are (m-row-in-tile, mcol)
    return (out.reshape(k, gm, 16, wm).transpose(0, 1, 3, 2).reshape(k, m))


# ---------------------------------------------------------------------------
# dequant-to-HBM kernels (reference dequant-only decompress_* variants,
# tcq-kernels/src/inference.cu:1222-1605 and vq-tensor-kernels
# inference.cu:882): the bs>8 / prefill path dequantizes once and rides the
# MXU with a plain matmul, exactly the reference's large-batch fallback
# (lib/linear/tcq_linear.py:75-84).
# ---------------------------------------------------------------------------

def _tcq1_dequant_kernel(tr_ref, o_ref, *, KV, tk, wm, NP, mode, dense,
                         dense_odd):
    MPAIR = jnp.uint32(0x00FF00FF)

    def val_of(u):
        h = _mad_scramble(u, mode)
        # full VPU byte-sum (one-shot path; the fused kernel moves this
        # onto the MXU instead)
        t2 = (h & MPAIR) + ((h >> jnp.uint32(8)) & MPAIR)
        s4 = (t2 + (t2 >> jnp.uint32(16))) & jnp.uint32(0x7FF)
        return ((s4.astype(jnp.int32) - 510).astype(jnp.float32)
                * _MAD_INV)

    if dense_odd:
        # rows (dt, p, s): k = 32*dt + 16*(s&1) + 2*(s>>1) + p
        for dt in range(tk // 2):
            for i, p, u in _planar_states_odd(tr_ref, dt, KV, 16):
                r = dt * 32 + p * 16
                o_ref[r:r + 16, i * wm:(i + 1) * wm] = val_of(u).astype(DDT)
        return
    for kt in range(tk):
        for i, u in _planar_states(tr_ref, kt, KV, NP, 16, dense):
            o_ref[kt * 16:(kt + 1) * 16, i * wm:(i + 1) * wm] = \
                val_of(u).astype(DDT)


def _v1_row_perm(k: int) -> np.ndarray:
    """natural k -> kernel row index for the dense odd-KV V=1 layout."""
    perm = np.empty(32, np.int64)
    for p in range(2):
        for s in range(16):
            kk = 16 * (s & 1) + 2 * (s >> 1) + p
            perm[kk] = p * 16 + s
    return (np.arange(k // 32)[:, None] * 32 + perm[None, :]).reshape(-1)


@functools.partial(jax.jit, static_argnames=("KV", "m", "k", "mode",
                                             "kernel_order"))
def tcq1_dequant(tr_pl, KV: int, m: int, k: int, mode: str = "1mad",
                 kernel_order: bool = False):
    """planar trellis -> W^T (k, m) bf16 in HBM (1mad or 2mad decode).

    kernel_order=True: raw kernel layout, no host relayout (see
    tcq2_dequant)."""
    from qpalette_tpu.kernels.formats import (planar_n_planes, planar_dense,
                                              planar_dense_odd)
    NP = planar_n_planes(KV)
    dense_odd = planar_dense_odd(KV, k)
    kt_total = k // 16
    tkc = (32, 16, 8, 4, 2) if dense_odd else (32, 16, 8, 4, 2, 1)
    tk = next(c for c in tkc if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    tr_block = (tk // 2, KV * 16, wm) if dense_odd else (tk, NP * 16, wm)
    out = pl.pallas_call(
        functools.partial(_tcq1_dequant_kernel, KV=KV, tk=tk, wm=wm, NP=NP,
                          mode=mode, dense=planar_dense(KV),
                          dense_odd=dense_odd),
        out_shape=jax.ShapeDtypeStruct((k, m), DDT),
        grid=(gm, gk),
        in_specs=[pl.BlockSpec(tr_block, lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tk * 16, 16 * wm), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(tr_pl)
    if kernel_order:
        return out
    if dense_odd:
        out = jnp.take(out, jnp.asarray(_v1_row_perm(k)), axis=0)
    # block column order is (m-row-in-tile, mcol)
    return (out.reshape(k, gm, 16, wm).transpose(0, 1, 3, 2).reshape(k, m))


def _tcq_dequant_kernel(tr_ref, tab_ref, o_ref, *, KV, S, tk, wm,
                        words_kv=None):
    _tcq_decode_tiles(tr_ref, tab_ref, o_ref, KV, S, tk, wm,
                      words_kv=words_kv)


def _tcomb_dequant_kernel(tr_ref, tab_ref, o_ref, *, KV1, KV2, S, tk, wm,
                          gk1):
    j = pl.program_id(1)

    @pl.when(j < gk1)
    def _():
        _tcq_decode_tiles(tr_ref, tab_ref, o_ref, KV1, S, tk, wm,
                          words_kv=KV1)

    @pl.when(j >= gk1)
    def _():
        _tcq_decode_tiles(tr_ref, tab_ref, o_ref, KV2, S, tk, wm,
                          words_kv=KV2)


@functools.partial(jax.jit, static_argnames=("KV", "S", "m", "k",
                                             "kernel_order"))
def tcq_dequant(tr_kt, tlut, KV: int, S: int, m: int, k: int,
                kernel_order: bool = False):
    """kernel-format trellis -> W^T (k, m) bf16 (V=2 quantlut_sym).

    kernel_order=True returns the raw (16, k, m/16) kernel output (m-row v
    leading, within-tile k rows in (c, s) order) — see dequant_matmul."""
    kt_total = k // 16
    tk = next(c for c in (16, 8, 4, 2, 1) if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(256, 128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    tabs = _tile_tables(tlut, S, wm)
    out = pl.pallas_call(
        functools.partial(_tcq_dequant_kernel, KV=KV, S=S, tk=tk, wm=wm),
        out_shape=jax.ShapeDtypeStruct((16, k, m // 16), DDT),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((tk, 4 * KV, wm), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tabs.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, tk * 16, wm), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(tr_kt, tabs)
    if kernel_order:
        return out
    # (v, k, tile-col) -> (k, m): m = tile_col*16 + v; within-tile k-col
    # permutation (2s+c -> c*8+s) is the inverse of the fused kernel's
    # activation pre-permutation
    W = out.transpose(1, 2, 0).reshape(k, m)
    return (W.reshape(k // 16, 2, 8, m).transpose(0, 2, 1, 3)
            .reshape(k, m))


@functools.partial(jax.jit,
                   static_argnames=("KV1", "KV2", "S", "m", "k",
                                    "kernel_order"))
def tcomb_dequant(trc, tlut, KV1: int, KV2: int, S: int, m: int, k: int,
                  kernel_order: bool = False):
    kt_total = k // 16
    half = kt_total // 2
    tk = next(c for c in (16, 8, 4, 2, 1) if half % c == 0)
    wm = _pick_width(m // 16, candidates=(256, 128, 64))
    gk = kt_total // tk
    gk1 = half // tk
    gm = (m // 16) // wm
    tabs = _tile_tables(tlut, S, wm)
    out = pl.pallas_call(
        functools.partial(_tcomb_dequant_kernel, KV1=KV1, KV2=KV2, S=S,
                          tk=tk, wm=wm, gk1=gk1),
        out_shape=jax.ShapeDtypeStruct((16, k, m // 16), DDT),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((tk, 4 * KV2, wm), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tabs.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((16, tk * 16, wm), lambda i, j: (0, j, i),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(trc, tabs)
    if kernel_order:
        return out
    W = out.transpose(1, 2, 0).reshape(k, m)
    return (W.reshape(k // 16, 2, 8, m).transpose(0, 2, 1, 3)
            .reshape(k, m))


def _vq_dequant_kernel(qw_ref, tab_ref, o_ref, *, bits, vec, kb, kj, bm):
    mask = jnp.uint32((1 << bits) - 1)
    g = kb * bits // 256
    for c_kj in range(kj):
        wr = qw_ref[:, c_kj * g:(c_kj + 1) * g, :]
        for v in range(kb // 8):
            bit = v * bits
            c, sh = bit // 32, bit % 32
            lo = wr[:, c, :]
            if sh == 0:
                win = lo
            else:
                hi = wr[:, c + 1, :] if c + 1 < g else lo
                win = (lo >> jnp.uint32(sh)) | (
                    (hi << jnp.uint32(31 - sh)) << jnp.uint32(1))
            idx = (win & mask).astype(jnp.int32)
            for comp in range(vec):
                val = _gather_chunks(tab_ref[comp], idx)
                r = c_kj * kb * vec + (v * vec + comp) * 8
                o_ref[r:r + 8, :] = val.astype(DDT)


@functools.partial(jax.jit, static_argnames=("bits", "vec", "m", "k",
                                             "kernel_order"))
def vq_dequant(qw_t, lut, bits: int, vec: int, m: int, k: int,
               kernel_order: bool = False):
    """kernel-format VQ words -> W^T (k, m) bf16.

    kernel_order=True: rows stay in the kernel's scratch order (the
    vq_x_perm order); columns are natural m either way."""
    P = k // vec
    kb = _pick_kb(P, bits)
    bm = _pick_width(m)
    kj = next(c for c in (4, 2, 1)
              if (P // kb) % c == 0 and c * kb * vec <= 2048)
    gk = P // (kb * kj)
    gm = m // bm
    wpb = kb * bits // 32
    g = wpb // 8
    tabs = _tile_tables(lut, bits, bm)
    out = pl.pallas_call(
        functools.partial(_vq_dequant_kernel, bits=bits, vec=vec, kb=kb,
                          kj=kj, bm=bm),
        out_shape=jax.ShapeDtypeStruct((k, m), DDT),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((8, kj * g, bm), lambda i, j: (0, j, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tabs.shape, lambda i, j: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kj * kb * vec, bm), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(qw_t, tabs)
    if kernel_order:
        return out
    # rows are in the kernel's scratch order (v, comp, s) per kb-block —
    # invert the vq_x_perm permutation: orig col (blk*kb + v + kb/8*s)*vec+c
    nblk = k // (kb * vec)
    return (out.reshape(nblk, kb // 8, vec, 8, m)
            .transpose(0, 3, 1, 2, 4).reshape(k, m))


def dequant_weight_kernelfmt(spec, p, luts):
    """Kernel-format params -> dense W^T (in, out) bf16 (dequant-only)."""
    m, n = spec.out_features, spec.in_features
    if spec.kind == "tcq1":
        return tcq1_dequant(p["trellis_pl"], spec.KV[0], m, n,
                            mode=spec.mode)
    if spec.kind == "tcq2":
        return tcq2_dequant(p["trellis_pl"], spec.KV[0], m, n,
                            mode=spec.mode)
    if spec.kind == "tcq":
        return tcq_dequant(p["trellis_kt"], p["clut"], spec.KV[0],
                           spec.tlut_bits, m, n)
    if spec.kind == "tcomb":
        if "trellisc_kt" in p:
            return tcomb_dequant(p["trellisc_kt"], p["clut"], spec.KV[0],
                                 spec.KV[1], spec.tlut_bits, m, n)
        n1, n2 = spec.split
        w1 = tcq_dequant(p["trellis1_kt"], p["clut"], spec.KV[0],
                         spec.tlut_bits, m, n1)
        w2 = tcq_dequant(p["trellis2_kt"], p["clut"], spec.KV[1],
                         spec.tlut_bits, m, n2)
        return jnp.concatenate([w1, w2], axis=0)
    if spec.kind == "comb":
        m1, m2 = spec.split
        w1 = tcq_dequant(p["trellis1_kt"], p["clut"], spec.KV[0],
                         spec.tlut_bits, m1, n)
        w2 = tcq_dequant(p["trellis2_kt"], p["clut"], spec.KV[1],
                         spec.tlut_bits, m2, n)
        return jnp.concatenate([w1, w2], axis=1)
    if spec.kind == "vq":
        return vq_dequant(p["qweight_t"], p["clut"], spec.bits, spec.vec,
                          m, n)
    raise ValueError(spec.kind)


# ---------------------------------------------------------------------------
# large-row dequant-then-matmul (reference bs>8 fallback,
# lib/linear/tcq_linear.py:75-84): dequantize ONCE into the kernel-order
# layout — contiguous block stores, ZERO weight-side relayout (the natural-
# order fixup is a fine-grained (16, wm) transpose that ran ~100x slower
# than the stream, round-4 STATUS weak #1) — and ride the MXU; the cheap
# sides (activation columns, output columns) absorb the permutations as
# pure reshape/transposes.
# ---------------------------------------------------------------------------

def _zp_v2(zb, n, dense_odd):
    N = zb.shape[0]
    if dense_odd:  # rows (p, half, r, h) per 32-col double-tile group
        return (zb.reshape(N, n // 32, 2, 4, 2, 2)
                .transpose(0, 1, 4, 5, 3, 2).reshape(N, n))
    # rows (half, t) per 16-col tile
    return zb.reshape(N, n // 16, 8, 2).transpose(0, 1, 3, 2).reshape(N, n)


def _zp_v1(zb, n, dense_odd):
    N = zb.shape[0]
    if dense_odd:  # rows (p, r, h) per 32-col double-tile group
        return (zb.reshape(N, n // 32, 2, 8, 2)
                .transpose(0, 1, 4, 3, 2).reshape(N, n))
    return zb


def _zp_tcq(zb, n):
    """within-tile (c, s) row order — same as the fused kernel's x perm."""
    N = zb.shape[0]
    return zb.reshape(N, n // 16, 8, 2).transpose(0, 1, 3, 2).reshape(N, n)


def _y_unblock(y, m):
    """columns (gm-block, m-row-in-tile, mcol) -> natural m."""
    N = y.shape[0]
    wm = _pick_width(m // 16, candidates=(128, 64))
    gm = (m // 16) // wm
    return y.reshape(N, gm, 16, wm).transpose(0, 1, 3, 2).reshape(N, m)


def _dot_v16(zp, w3):
    """zp (N, k) x raw tcq layout w3 (16, k, mt) -> natural (N, m)."""
    y = jax.lax.dot_general(zp, w3, (((1,), (1,)), ((), ())),
                            preferred_element_type=ACC)  # (N, 16, mt)
    N, v, mt = y.shape
    return y.transpose(0, 2, 1).reshape(N, v * mt)


def dequant_matmul(spec, p, z, luts):
    """z (N, in) -> (N, out) f32 via kernel-order dequant + plain MXU dot
    (no Wscale epilogue — qlinear_apply applies it)."""
    from qpalette_tpu.kernels.formats import planar_dense_odd
    m, n = spec.out_features, spec.in_features
    zb = z.astype(DDT)
    if spec.kind == "tcq1":
        dodd = planar_dense_odd(spec.KV[0], n)
        w = tcq1_dequant(p["trellis_pl"], spec.KV[0], m, n, mode=spec.mode,
                         kernel_order=True)
        y = jax.lax.dot_general(_zp_v1(zb, n, dodd), w,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=ACC)
        return _y_unblock(y, m)
    if spec.kind == "tcq2":
        dodd = planar_dense_odd(spec.KV[0], n)
        w = tcq2_dequant(p["trellis_pl"], spec.KV[0], m, n, mode=spec.mode,
                         kernel_order=True)
        y = jax.lax.dot_general(_zp_v2(zb, n, dodd), w,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=ACC)
        return _y_unblock(y, m)
    if spec.kind == "tcq":
        w3 = tcq_dequant(p["trellis_kt"], p["clut"], spec.KV[0],
                         spec.tlut_bits, m, n, kernel_order=True)
        return _dot_v16(_zp_tcq(zb, n), w3)
    if spec.kind == "tcomb":
        if "trellisc_kt" in p:
            w3 = tcomb_dequant(p["trellisc_kt"], p["clut"], spec.KV[0],
                               spec.KV[1], spec.tlut_bits, m, n,
                               kernel_order=True)
            return _dot_v16(_zp_tcq(zb, n), w3)
        n1, n2 = spec.split
        w1 = tcq_dequant(p["trellis1_kt"], p["clut"], spec.KV[0],
                         spec.tlut_bits, m, n1, kernel_order=True)
        w2 = tcq_dequant(p["trellis2_kt"], p["clut"], spec.KV[1],
                         spec.tlut_bits, m, n2, kernel_order=True)
        return (_dot_v16(_zp_tcq(zb[:, :n1], n1), w1)
                + _dot_v16(_zp_tcq(zb[:, n1:], n2), w2))
    if spec.kind == "comb":
        m1, m2 = spec.split
        w1 = tcq_dequant(p["trellis1_kt"], p["clut"], spec.KV[0],
                         spec.tlut_bits, m1, n, kernel_order=True)
        w2 = tcq_dequant(p["trellis2_kt"], p["clut"], spec.KV[1],
                         spec.tlut_bits, m2, n, kernel_order=True)
        zp = _zp_tcq(zb, n)
        return jnp.concatenate([_dot_v16(zp, w1), _dot_v16(zp, w2)],
                               axis=1)
    if spec.kind == "vq":
        from qpalette_tpu.kernels.formats import vq_x_perm
        P_ = n // spec.vec
        kb = _pick_kb(P_, spec.bits)
        w = vq_dequant(p["qweight_t"], p["clut"], spec.bits, spec.vec,
                       m, n, kernel_order=True)
        zp = vq_x_perm(zb, spec.vec, kb)
        return jax.lax.dot_general(zp, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=ACC)
    raise ValueError(spec.kind)


# ---------------------------------------------------------------------------
# int8 dense GEMV (per-row-quantized lm_head / embeddings; the reference
# keeps lm_head fp16 — this is a TPU-side traffic optimization, halving the
# 1.05 GB/token bf16 lm_head stream for bs=1 decode)
# ---------------------------------------------------------------------------

def _i8gemv_kernel(x_ref, w_ref, s_ref, o_ref):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:].astype(DDT), (((1,), (0,)), ((), ())),
        preferred_element_type=ACC)
    o_ref[:] = acc * s_ref[:]


def _i8gemv_a8_kernel(x_ref, w_ref, o_ref):
    # short-K x wide-M int8 dot accumulated over k-chunks on the grid:
    # one long-K narrow-M dot collapses Mosaic's int8 rate ~5x at N=1
    # (docs/TPU_NOTES.md round-3 additions)
    j = pl.program_id(1)
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(j == 0)
    def _init():
        o_ref[:] = acc

    @pl.when(j > 0)
    def _acc():
        o_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("m", "k"))
def int8_gemv_a8(x, wq_t, scales, m: int, k: int):
    """x (N<=8, k) bf16; wq_t (k, m) int8; scales (1, m) f32 -> (N, m) f32.

    Quantizes the activation to int8 (per-tensor absmax) so the dot runs
    the MXU's native int8 x int8 -> int32 path — the bf16-convert variant
    (int8_gemv) binds on the int8->bf16 convert at ~309 GB/s
    (scripts/diag_decode_breakdown.py); this one is weight-stream-bound.
    Intended for the ROTATED int8 lm_head (runtime/loader.py packs
    lm_head with an incoherence rotation so per-tensor activation absmax
    is safe — raw final-norm hidden states have outlier channels)."""
    N = x.shape[0]
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf)) / 127.0 + 1e-30
    xq = jnp.round(xf / sx).astype(jnp.int8)
    bm = _pick_width(m, candidates=(2048, 1024, 512, 256, 128))
    # wider k-blocks quarter the grid-step count at the lm_head shape
    # (504 -> 252 steps, +5% GB/s measured, scripts/tune_lmhead.py)
    bk = _pick_width(k, candidates=(1024, 512, 256, 128))
    while bk * bm * 2 > 8 << 20:  # stay under half the 16 MB scoped VMEM
        bm //= 2
    # _pick_width may fall back to bm=m for awkward m; halving then can
    # leave a non-divisor and the grid would silently skip trailing columns
    assert m % bm == 0 and k % bk == 0, (m, bm, k, bk)
    out = pl.pallas_call(
        _i8gemv_a8_kernel,
        out_shape=jax.ShapeDtypeStruct((N, m), jnp.int32),
        grid=(m // bm, k // bk),
        in_specs=[
            pl.BlockSpec((N, bk), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bm), lambda i, j: (j, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, bm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
            if _cparams() else None),
        interpret=_interpret(),
    )(xq, wq_t)
    return out.astype(ACC) * (scales * sx)


@functools.partial(jax.jit, static_argnames=("m", "k"))
def int8_gemv(x, wq_t, scales, m: int, k: int):
    """x (N<=8, k) bf16; wq_t (k, m) int8; scales (1, m) f32 -> (N, m) f32.

    Streams the int8 weights straight from HBM through a bf16 convert into
    the MXU — bandwidth-bound at half the bf16 bytes."""
    N = x.shape[0]
    bm = _pick_width(m, candidates=(512, 256, 128))
    out = pl.pallas_call(
        _i8gemv_kernel,
        out_shape=jax.ShapeDtypeStruct((N, m), ACC),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((N, k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, bm), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        compiler_params=(pltpu.CompilerParams(
            dimension_semantics=("parallel",)) if _cparams() else None),
        interpret=_interpret(),
    )(x.astype(DDT), wq_t, scales)
    return out


# ---------------------------------------------------------------------------
# dispatch used by runtime/qlinear.py (impl='pallas')
# ---------------------------------------------------------------------------

def decode_matmul(spec, p, z, luts, pre_rot=None):
    """Fused path entry: expects kernel-format params prepared by the
    loader (keys qweight_t / trellis_kt / clut).

    impl 'pallas_a8' selects the int8-activation MXU path for the
    arithmetic-trellis kinds (the TPU analogue of the reference's SIMT
    kernel-variant flag; see _arith_kernel).

    pre_rot=(su, rot_blocks): z is UN-rotated; the incoherence rotation is
    fused into the activation prep (tcq1 / tcq2-sum2 only — callers must
    check qlinear.can_fuse_rot)."""
    m, n = spec.out_features, spec.in_features
    a8 = spec.impl == "pallas_a8"
    if pre_rot is not None:
        assert spec.kind in ("tcq1", "tcq2"), spec.kind
        su_r, blocks_r = pre_rot
        if spec.kind == "tcq1":
            return tcq1_decode_matmul(z, p["trellis_pl"], spec.KV[0],
                                      spec.mode, m, n, a8=a8, su=su_r,
                                      rot_blocks=blocks_r)
        return tcq2_decode_matmul(z, p["trellis_pl"], spec.KV[0], m, n,
                                  a8=a8, mode=spec.mode, su=su_r,
                                  rot_blocks=blocks_r)
    zb = z.astype(DDT)
    if spec.kind == "vq":
        return vq_decode_matmul(zb, p["qweight_t"], p["clut"],
                                spec.bits, spec.vec, m, n)
    if spec.kind == "tcq":
        return tcq_decode_matmul(zb, p["trellis_kt"], p["clut"],
                                 spec.KV[0], spec.tlut_bits, m, n)
    if spec.kind == "tcq1":
        return tcq1_decode_matmul(zb, p["trellis_pl"], spec.KV[0],
                                  spec.mode, m, n, a8=a8)
    if spec.kind == "tcq2":
        return tcq2_decode_matmul(zb, p["trellis_pl"], spec.KV[0], m, n,
                                  a8=a8, mode=spec.mode)
    if spec.kind == "tcomb":
        if "trellisc_kt" in p:  # fused one-kernel path
            return tcomb_decode_matmul(zb, p["trellisc_kt"], p["clut"],
                                       spec.KV[0], spec.KV[1],
                                       spec.tlut_bits, m, n)
        n1, n2 = spec.split
        y1 = tcq_decode_matmul(zb[:, :n1], p["trellis1_kt"], p["clut"],
                               spec.KV[0], spec.tlut_bits, m, n1)
        y2 = tcq_decode_matmul(zb[:, n1:], p["trellis2_kt"], p["clut"],
                               spec.KV[1], spec.tlut_bits, m, n2)
        return y1 + y2
    if spec.kind == "comb":
        m1, m2 = spec.split
        y1 = tcq_decode_matmul(zb, p["trellis1_kt"], p["clut"],
                               spec.KV[0], spec.tlut_bits, m1, n)
        y2 = tcq_decode_matmul(zb, p["trellis2_kt"], p["clut"],
                               spec.KV[1], spec.tlut_bits, m2, n)
        return jnp.concatenate([y1, y2], axis=1)
    raise ValueError(spec.kind)

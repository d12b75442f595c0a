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
# TCQ1: V=1 trellis with arithmetic (gather-free) decode — the TPU fast path
# ---------------------------------------------------------------------------

_MAD1_A, _MAD1_B = 34038481, 76625530
_MAD2_A, _MAD2_B, _MAD2_C = 264435761, 1013904223, 1664525
_MAD_INV = 1.0 / 147.800537109375


def _mad_value(u, mode):
    """state (uint32 vec) -> decoded weight (f32 vec); pure VPU ALU.

    Mirrors reference decode_1mad/2mad (bitshift.py:16-39): LCG scramble +
    byte-sum gives an approximately Gaussian value; no table lookup."""
    assert mode == "1mad", "2mad needs 32x32->hi32 multiply (round 2)"
    h = u * jnp.uint32(_MAD1_A) + jnp.uint32(_MAD1_B)
    b255 = jnp.uint32(255)
    ssum = ((h & b255) + ((h >> jnp.uint32(8)) & b255)
            + ((h >> jnp.uint32(16)) & b255)
            + ((h >> jnp.uint32(24)) & b255))
    y = ssum.astype(jnp.int32).astype(jnp.float32) - 510.0
    return y * _MAD_INV


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


def _tcq1_kernel(x4_ref, tr_ref, o_ref, d_ref, *, KV, tk, wm, cc, NP,
                 interp):
    """Planar gather-free tcq1 decode + MXU byte-sum matmul.

    Weights arrive pre-swizzled (formats.tcq1_planar_weights): row j*16+t of
    a tile holds the ALIGNED window [16*KV*t + 32*j, +32) of the tile's
    bitstream, so deriving state i of each sublane's 16-state group is
    constant shifts only.  The 1mad byte-sum (bitshift.py:16-27) rides the
    MXU: we store h = u*A+B (XOR 0x80808080) as uint32, bitcast to int8,
    and dot against x repeated 4x — sum(int8 bytes) = sum(u8 bytes) - 512,
    so  y = INV * (x4 @ bytes + 2 * sum(x)).  The dot also gains exactness:
    no bf16 rounding of decoded weights (bytes are integers, exact in bf16).
    """
    j = pl.program_id(1)
    M16 = jnp.uint32(0xFFFF)
    XOR = jnp.uint32(0x80808080)
    A, B = jnp.uint32(_MAD1_A), jnp.uint32(_MAD1_B)

    def decode_tile(kt):
        planes = [tr_ref[kt, jj * 16:(jj + 1) * 16, :] for jj in range(NP)]
        for i in range(16):  # i = m-row within tile
            off = KV * i
            j0, sh = off >> 5, off & 31
            if sh + 16 <= 32:
                u = planes[j0] >> jnp.uint32(sh) if sh else planes[j0]
            else:
                u = ((planes[j0] >> jnp.uint32(sh))
                     | (planes[j0 + 1] << jnp.uint32(32 - sh)))
            h = (u & M16) * A + B
            d_ref[kt * 16:(kt + 1) * 16, i * wm:(i + 1) * wm] = h ^ XOR

    # chunked dots so the VLIW scheduler overlaps VPU decode of chunk c+1
    # with the MXU pass over chunk c
    x4 = x4_ref[0]  # (N, 4*tk*16)
    acc = None
    for c0 in range(0, tk, cc):
        for kt in range(c0, c0 + cc):
            decode_tile(kt)
        h8 = _bytes_as_bf16(d_ref[c0 * 16:(c0 + cc) * 16, :], interp)
        part = jax.lax.dot_general(
            x4[:, c0 * 64:(c0 + cc) * 64], h8,
            (((1,), (0,)), ((), ())), preferred_element_type=ACC)
        acc = part if acc is None else acc + part
    # each x element appears 4x in x4, so sum(x4)/4 == sum(x)
    sumx = jnp.sum(x4.astype(ACC), axis=1, keepdims=True) * 0.25
    acc = (acc + 2.0 * sumx) * _MAD_INV

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


@functools.partial(jax.jit, static_argnames=("KV", "mode", "m", "k"))
def tcq1_decode_matmul(x, tr_pl, KV: int, mode: str, m: int, k: int):
    """x (N, k); tr_pl (k/16, NP*16, m/16) uint32 planar layout
    (formats.tcq1_planar_weights).  Returns (N, m) f32 = x @ W^T.

    Measured v5e (KV=3): 327-474 Gw/s vs 224-253 for the select-chain
    kernel it replaced (scripts/proto_planar.py)."""
    assert mode == "1mad", "2mad needs 32x32->hi32 multiply (round 2)"
    from qpalette_tpu.kernels.formats import tcq1_n_planes
    N = x.shape[0]
    NP = tcq1_n_planes(KV)
    kt_total = k // 16
    tk = next(c for c in (32, 16, 8, 4, 2, 1) if kt_total % c == 0)
    # wm=128 measured fastest at every model shape (sweep in
    # scripts/proto_planar.py); smaller candidates only for tiny tests
    wm = _pick_width(m // 16, candidates=(128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    cc = next(c for c in (8, 4, 2, 1) if tk % c == 0)
    xp = x.astype(DDT).reshape(N, gk, tk * 16).transpose(1, 0, 2)
    x4 = jnp.repeat(xp, 4, axis=2)  # (gk, N, 4*tk*16), element-repeat
    interp = _interpret()
    out = pl.pallas_call(
        functools.partial(_tcq1_kernel, KV=KV, tk=tk, wm=wm, cc=cc, NP=NP,
                          interp=interp),
        out_shape=jax.ShapeDtypeStruct((N, m), ACC),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((1, N, 4 * tk * 16), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, NP * 16, wm), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 16 * wm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tk * 16, 16 * wm), jnp.uint32)],
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(x4, tr_pl)
    # block column order is (v2, mcol); actual m index = tile*16 + v2
    return (out.reshape(N, gm, 16, wm).transpose(0, 1, 3, 2)
            .reshape(N, m))


def _tcq2_kernel(x4_ref, tr_ref, o_ref, d_ref, *, KV, tk, wm, cc, NP,
                 interp):
    """V=2 planar dual-mad decode + MXU byte-sum matmul (tcq2).

    Same planar-window trick as _tcq1_kernel but one state per weight PAIR:
    row j*8+t of a tile holds the aligned window [16*KV*t + 32*j, +32), so
    16 constant-shift extractions (one per m-row) decode the whole tile —
    ~2x fewer VPU ops per weight than tcq1.  Decode is two multiplies
    (h1 = u*A1, h2 = u*A2); the signed-byte sums ride the MXU via int8
    bitcast with NO xor and NO additive correction (codebooks.decode_dualmad
    is defined over signed bytes)."""
    j = pl.program_id(1)
    M16 = jnp.uint32(0xFFFF)
    A1, A2 = jnp.uint32(_MAD1_A), jnp.uint32(_MAD2_A)

    def decode_tile(kt):
        planes = [tr_ref[kt, jj * 8:(jj + 1) * 8, :] for jj in range(NP)]
        for i in range(16):  # i = m-row within tile
            off = KV * i
            j0, sh = off >> 5, off & 31
            if sh + 16 <= 32:
                u = planes[j0] >> jnp.uint32(sh) if sh else planes[j0]
            else:
                u = ((planes[j0] >> jnp.uint32(sh))
                     | (planes[j0 + 1] << jnp.uint32(32 - sh)))
            u = u & M16
            d_ref[kt * 16:kt * 16 + 8, i * wm:(i + 1) * wm] = u * A1
            d_ref[kt * 16 + 8:kt * 16 + 16, i * wm:(i + 1) * wm] = u * A2

    x4 = x4_ref[0]  # (N, 4*tk*16)
    acc = None
    for c0 in range(0, tk, cc):
        for kt in range(c0, c0 + cc):
            decode_tile(kt)
        h8 = _bytes_as_bf16_signed(d_ref[c0 * 16:(c0 + cc) * 16, :],
                                   interp)
        part = jax.lax.dot_general(
            x4[:, c0 * 64:(c0 + cc) * 64], h8,
            (((1,), (0,)), ((), ())), preferred_element_type=ACC)
        acc = part if acc is None else acc + part
    acc = acc * _MAD_INV

    @pl.when(j == 0)
    def _():
        o_ref[:] = acc

    @pl.when(j != 0)
    def _():
        o_ref[:] = o_ref[:] + acc


def _bytes_as_bf16_signed(h_chunk, interpret: bool):
    """(R, C) uint32 -> (4R, C) bf16 of the SIGNED (int8) bytes."""
    if not interpret:
        return pltpu.bitcast(h_chunk, jnp.int8).astype(DDT)
    R, C = h_chunk.shape
    parts = [(((h_chunk >> jnp.uint32(8 * b)) & jnp.uint32(255))
              .astype(jnp.int32)) for b in range(4)]
    parts = [jnp.where(p >= 128, p - 256, p) for p in parts]
    return jnp.stack(parts, axis=1).reshape(4 * R, C).astype(DDT)


def _tcq2_x4(x, gk, tk):
    """x (N, k) -> (gk, N, 4*tk*16): per 16-col tile, evens repeated 4x
    then odds repeated 4x — matches the scratch byte-row order (h1 block
    = even k-cols, h2 block = odd k-cols)."""
    N = x.shape[0]
    xp = x.astype(DDT).reshape(N, gk, tk, 8, 2).transpose(1, 0, 2, 4, 3)
    x4 = jnp.repeat(xp.reshape(gk, N, tk, 16), 4, axis=3)
    return x4.reshape(gk, N, 4 * tk * 16)


@functools.partial(jax.jit, static_argnames=("KV", "m", "k"))
def tcq2_decode_matmul(x, tr_pl, KV: int, m: int, k: int):
    """x (N, k); tr_pl (k/16, NP*8, m/16) uint32 planar layout
    (formats.tcq2_planar_weights).  Returns (N, m) f32 = x @ W^T."""
    from qpalette_tpu.kernels.formats import tcq1_n_planes
    N = x.shape[0]
    NP = tcq1_n_planes(KV)
    kt_total = k // 16
    tk = next(c for c in (32, 16, 8, 4, 2, 1) if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    cc = next(c for c in (8, 4, 2, 1) if tk % c == 0)
    x4 = _tcq2_x4(x, gk, tk)
    interp = _interpret()
    out = pl.pallas_call(
        functools.partial(_tcq2_kernel, KV=KV, tk=tk, wm=wm, cc=cc, NP=NP,
                          interp=interp),
        out_shape=jax.ShapeDtypeStruct((N, m), ACC),
        grid=(gm, gk),
        in_specs=[
            pl.BlockSpec((1, N, 4 * tk * 16), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, NP * 8, wm), lambda i, j: (j, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, 16 * wm), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tk * 16, 16 * wm), jnp.uint32)],
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(x4, tr_pl)
    # block column order is (m-row-in-tile, mcol)
    return (out.reshape(N, gm, 16, wm).transpose(0, 1, 3, 2)
            .reshape(N, m))


def _tcq2_dequant_kernel(tr_ref, o_ref, *, KV, tk, wm, NP):
    M16 = jnp.uint32(0xFFFF)
    MPAIR = jnp.uint32(0x00FF00FF)
    XOR = jnp.uint32(0x80808080)
    A1, A2 = jnp.uint32(_MAD1_A), jnp.uint32(_MAD2_A)
    for kt in range(tk):
        planes = [tr_ref[kt, jj * 8:(jj + 1) * 8, :] for jj in range(NP)]
        for i in range(16):
            off = KV * i
            j0, sh = off >> 5, off & 31
            if sh + 16 <= 32:
                u = planes[j0] >> jnp.uint32(sh) if sh else planes[j0]
            else:
                u = ((planes[j0] >> jnp.uint32(sh))
                     | (planes[j0 + 1] << jnp.uint32(32 - sh)))
            u = u & M16
            for half, A in ((0, A1), (1, A2)):
                g = (u * A) ^ XOR  # unsigned bytes = signed + 128
                t2 = (g & MPAIR) + ((g >> jnp.uint32(8)) & MPAIR)
                s4 = (t2 + (t2 >> jnp.uint32(16))) & jnp.uint32(0x7FF)
                val = ((s4.astype(jnp.int32) - 512).astype(jnp.float32)
                       * _MAD_INV)
                o_ref[kt * 16 + half * 8:kt * 16 + half * 8 + 8,
                      i * wm:(i + 1) * wm] = val.astype(DDT)


@functools.partial(jax.jit, static_argnames=("KV", "m", "k"))
def tcq2_dequant(tr_pl, KV: int, m: int, k: int):
    """planar tcq2 trellis -> W^T (k, m) bf16 in HBM."""
    from qpalette_tpu.kernels.formats import tcq1_n_planes
    NP = tcq1_n_planes(KV)
    kt_total = k // 16
    tk = next(c for c in (32, 16, 8, 4, 2, 1) if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    out = pl.pallas_call(
        functools.partial(_tcq2_dequant_kernel, KV=KV, tk=tk, wm=wm, NP=NP),
        out_shape=jax.ShapeDtypeStruct((k, m), DDT),
        grid=(gm, gk),
        in_specs=[pl.BlockSpec((tk, NP * 8, wm), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tk * 16, 16 * wm), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(tr_pl)
    # rows within a 16-row tile are (half, t) -> k index 2t + half;
    # block columns are (m-row-in-tile, mcol)
    out = (out.reshape(k // 16, 2, 8, gm, 16, wm)
           .transpose(0, 2, 1, 3, 5, 4).reshape(k, m))
    return out


# ---------------------------------------------------------------------------
# dequant-to-HBM kernels (reference dequant-only decompress_* variants,
# tcq-kernels/src/inference.cu:1222-1605 and vq-tensor-kernels
# inference.cu:882): the bs>8 / prefill path dequantizes once and rides the
# MXU with a plain matmul, exactly the reference's large-batch fallback
# (lib/linear/tcq_linear.py:75-84).
# ---------------------------------------------------------------------------

def _tcq1_dequant_kernel(tr_ref, o_ref, *, KV, tk, wm, NP):
    M16 = jnp.uint32(0xFFFF)
    MPAIR = jnp.uint32(0x00FF00FF)
    A, B = jnp.uint32(_MAD1_A), jnp.uint32(_MAD1_B)
    for kt in range(tk):
        planes = [tr_ref[kt, jj * 16:(jj + 1) * 16, :] for jj in range(NP)]
        for i in range(16):
            off = KV * i
            j0, sh = off >> 5, off & 31
            if sh + 16 <= 32:
                u = planes[j0] >> jnp.uint32(sh) if sh else planes[j0]
            else:
                u = ((planes[j0] >> jnp.uint32(sh))
                     | (planes[j0 + 1] << jnp.uint32(32 - sh)))
            h = (u & M16) * A + B
            # full VPU byte-sum (one-shot path; the fused kernel moves this
            # onto the MXU instead)
            t2 = (h & MPAIR) + ((h >> jnp.uint32(8)) & MPAIR)
            s4 = (t2 + (t2 >> jnp.uint32(16))) & jnp.uint32(0x7FF)
            val = ((s4.astype(jnp.int32) - 510).astype(jnp.float32)
                   * _MAD_INV)
            o_ref[kt * 16:(kt + 1) * 16, i * wm:(i + 1) * wm] = \
                val.astype(DDT)


@functools.partial(jax.jit, static_argnames=("KV", "m", "k"))
def tcq1_dequant(tr_pl, KV: int, m: int, k: int):
    """planar trellis -> W^T (k, m) bf16 in HBM."""
    from qpalette_tpu.kernels.formats import tcq1_n_planes
    NP = tcq1_n_planes(KV)
    kt_total = k // 16
    tk = next(c for c in (32, 16, 8, 4, 2, 1) if kt_total % c == 0)
    wm = _pick_width(m // 16, candidates=(128, 64))
    gk = kt_total // tk
    gm = (m // 16) // wm
    out = pl.pallas_call(
        functools.partial(_tcq1_dequant_kernel, KV=KV, tk=tk, wm=wm, NP=NP),
        out_shape=jax.ShapeDtypeStruct((k, m), DDT),
        grid=(gm, gk),
        in_specs=[pl.BlockSpec((tk, NP * 16, wm), lambda i, j: (j, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tk * 16, 16 * wm), lambda i, j: (j, i),
                               memory_space=pltpu.VMEM),
        compiler_params=_cparams(),
        interpret=_interpret(),
    )(tr_pl)
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


@functools.partial(jax.jit, static_argnames=("KV", "S", "m", "k"))
def tcq_dequant(tr_kt, tlut, KV: int, S: int, m: int, k: int):
    """kernel-format trellis -> W^T (k, m) bf16 (V=2 quantlut_sym)."""
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
    # (v, k, tile-col) -> (k, m): m = tile_col*16 + v; within-tile k-col
    # permutation (2s+c -> c*8+s) is the inverse of the fused kernel's
    # activation pre-permutation
    W = out.transpose(1, 2, 0).reshape(k, m)
    return (W.reshape(k // 16, 2, 8, m).transpose(0, 2, 1, 3)
            .reshape(k, m))


@functools.partial(jax.jit,
                   static_argnames=("KV1", "KV2", "S", "m", "k"))
def tcomb_dequant(trc, tlut, KV1: int, KV2: int, S: int, m: int, k: int):
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


@functools.partial(jax.jit, static_argnames=("bits", "vec", "m", "k"))
def vq_dequant(qw_t, lut, bits: int, vec: int, m: int, k: int):
    """kernel-format VQ words -> W^T (k, m) bf16."""
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
    # rows are in the kernel's scratch order (v, comp, s) per kb-block —
    # invert the vq_x_perm permutation: orig col (blk*kb + v + kb/8*s)*vec+c
    nblk = k // (kb * vec)
    return (out.reshape(nblk, kb // 8, vec, 8, m)
            .transpose(0, 3, 1, 2, 4).reshape(k, m))


def dequant_weight_kernelfmt(spec, p, luts):
    """Kernel-format params -> dense W^T (in, out) bf16 (dequant-only)."""
    m, n = spec.out_features, spec.in_features
    if spec.kind == "tcq1":
        return tcq1_dequant(p["trellis_pl"], spec.KV[0], m, n)
    if spec.kind == "tcq2":
        return tcq2_dequant(p["trellis_pl"], spec.KV[0], m, n)
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
# dispatch used by runtime/qlinear.py (impl='pallas')
# ---------------------------------------------------------------------------

def decode_matmul(spec, p, z, luts):
    """Fused path entry: expects kernel-format params prepared by the
    loader (keys qweight_t / trellis_kt / clut)."""
    m, n = spec.out_features, spec.in_features
    zb = z.astype(DDT)
    if spec.kind == "vq":
        return vq_decode_matmul(zb, p["qweight_t"], p["clut"],
                                spec.bits, spec.vec, m, n)
    if spec.kind == "tcq":
        return tcq_decode_matmul(zb, p["trellis_kt"], p["clut"],
                                 spec.KV[0], spec.tlut_bits, m, n)
    if spec.kind == "tcq1":
        return tcq1_decode_matmul(zb, p["trellis_pl"], spec.KV[0],
                                  spec.mode, m, n)
    if spec.kind == "tcq2":
        return tcq2_decode_matmul(zb, p["trellis_pl"], spec.KV[0], m, n)
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

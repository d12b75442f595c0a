"""Quantized-linear dispatch: one apply function per packed scheme.

Reference behavior: lib/linear/{tcq_linear,vq_linear,comb_linear}.py — each
module picks a fused CUDA kernel for bs ≤ 8 and falls back to
dequant-then-matmul for larger batch (tcq_linear.py:64-84).

TPU-native: `qlinear_apply` dispatches on a hashable LinearSpec at trace
time (replacing the reference's per-shape op registry,
lib/linear/__init__.py:43-420).  Paths:
  - 'xla'    : dequant to bf16 in-graph, then MXU matmul (correctness path
               and the large-batch path; XLA fuses scale epilogues)
  - 'pallas' : fused decode+matmul kernels (qpalette_tpu.kernels), used for
               small-batch decode where HBM bandwidth on packed weights is
               the bottleneck
The expanded 2^16-state trellis LUT is shared across layers via the model's
`luts` dict (one entry per tlut_bits), mirroring how all reference TCQ
layers share the cached kmeans tlut (bitshift.py:148-160).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

from qpalette_tpu.ops import packing


@dataclass(frozen=True)
class LinearSpec:
    kind: str                 # dense | tcq | tcomb | comb | vq
    in_features: int
    out_features: int
    KV: tuple = ()            # (KV,) or (KV1, KV2)
    tlut_bits: int = 0
    bits: int = 0
    vec: int = 0
    split: tuple = ()         # in_part (tcomb) or out_part (comb)
    mode: str = ""            # tcq1 decode mode (1mad | 2mad)
    impl: str = "xla"         # xla | pallas

    def tcq_lut_key(self) -> str:
        return f"tcq{self.tlut_bits}"


def dequant_weight(spec: LinearSpec, p: dict, luts: dict) -> jax.Array:
    """Decode packed weights to a dense (m, n) matrix (rotated space,
    unscaled)."""
    m, n = spec.out_features, spec.in_features
    if spec.kind == "tcq":
        lut = luts[spec.tcq_lut_key()]
        return packing.dequant_tcq(p["trellis"], lut, m, n, spec.KV[0])
    if spec.kind == "tcq1":
        lut = luts[f"mad_{spec.mode}"]
        return packing.dequant_tcq(p["trellis"], lut, m, n, spec.KV[0],
                                   v=1)
    if spec.kind == "tcq2":
        return packing.dequant_tcq2(p["trellis"], luts[f"mad_{spec.mode}"],
                                    m, n, spec.KV[0])
    if spec.kind == "tcomb":
        lut = luts[spec.tcq_lut_key()]
        n1, n2 = spec.split
        w1 = packing.dequant_tcq(p["trellis1"], lut, m, n1, spec.KV[0])
        w2 = packing.dequant_tcq(p["trellis2"], lut, m, n2, spec.KV[1])
        return jnp.concatenate([w1, w2], axis=1)
    if spec.kind == "comb":
        lut = luts[spec.tcq_lut_key()]
        m1, m2 = spec.split
        w1 = packing.dequant_tcq(p["trellis1"], lut, m1, n, spec.KV[0])
        w2 = packing.dequant_tcq(p["trellis2"], lut, m2, n, spec.KV[1])
        return jnp.concatenate([w1, w2], axis=0)
    if spec.kind == "vq":
        return packing.dequant_lut(p["qweight"], p["lut"], m, n,
                                   spec.bits, spec.vec)
    raise ValueError(spec.kind)


def can_fuse_rot(spec: LinearSpec, rows: int, rot_blocks: int = 1) -> bool:
    """True if the fused-rotation activation prologue applies: arithmetic
    trellis decode kernel (tcq1 any mode / tcq2 sum2 — dualmad's x-perm is
    not a plain repeat), decode regime, and a ≤2-factor Hadamard for the
    (per-block) rotation width."""
    if spec.impl not in ("pallas", "pallas_a8") or rows > 8:
        return False
    if spec.kind == "tcq1":
        pass
    elif spec.kind == "tcq2" and spec.mode == "sum2":
        pass
    else:
        return False
    from qpalette_tpu.ops.hadamard import get_had_factors
    facs = get_had_factors(spec.in_features // rot_blocks)
    if len(facs) > 2:
        return False
    from qpalette_tpu.kernels.formats import planar_dense_odd
    if planar_dense_odd(spec.KV[0], spec.in_features):
        # the dense odd-KV byte-row permutation folds into the rotation's
        # last Kronecker factor only if 32-col double-tile groups align
        # with that factor's column blocks
        return facs[-1] % 32 == 0
    return True


def qlinear_apply(spec: LinearSpec, p: dict, z: jax.Array,
                  luts: Optional[dict] = None,
                  pre_rot=None, out_dtype=None) -> jax.Array:
    """z (rows, in_features) — already incoherence-rotated — -> (rows, out).

    pre_rot=(su, rot_blocks): z is UN-rotated and the rotation is fused
    into the kernel's activation prologue when can_fuse_rot holds;
    otherwise it is applied here explicitly (same math either way).

    Applies the per-row Wscale epilogue (reference incoherent_linear.py:495).
    out_dtype overrides the output dtype (default: z's dtype) — the
    quantized lm_head passes f32 so final logits skip the bf16 round-trip
    the decoder layers want (matching the int8 head's f32 epilogue).
    """
    odt = out_dtype or z.dtype
    if pre_rot is not None and not can_fuse_rot(spec, z.shape[0],
                                                pre_rot[1]):
        from qpalette_tpu.ops.hadamard import hadamard_transform_t
        su, blocks = pre_rot
        z = hadamard_transform_t(z * su.astype(z.dtype),
                                 blocks=blocks).astype(z.dtype)
        pre_rot = None
    if spec.kind == "dense":
        w = p["w"]
        return jax.lax.dot_general(
            z, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(odt)
    if spec.kind == "dense_rot":
        # rotated-dense baseline (QuaRot-style): full-precision weights in
        # the rotated space, same Wscale epilogue as quantized layers
        y = jax.lax.dot_general(
            z, p["w"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return (y * p["wscale"][None, :].astype(jnp.float32)).astype(odt)
    # fused decode+matmul cutoff: the reference splits at bs<=8
    # (tcq_linear.py:64-84) because its SIMT GEMV is row-serial; the TPU
    # arithmetic-trellis kernels feed an MXU dot whose M dimension is the
    # row count, so streaming packed weights stays cheaper than
    # dequantize-to-HBM up to a few hundred rows — covering chunked-
    # prefill admission in the serving engine in ONE dispatch per chunk.
    fused_rows = 256 if spec.kind in ("tcq1", "tcq2") else 8
    if spec.impl in ("pallas", "pallas_a8") and z.shape[0] <= fused_rows:
        from qpalette_tpu.kernels import fused
        y = fused.decode_matmul(spec, p, z, luts, pre_rot=pre_rot)
    elif (spec.impl == "pallas_a8" and spec.kind in ("tcq1", "tcq2")):
        # very large rows, int8-activation path: chunk rows through the
        # fused kernel (re-streams packed weights once per chunk — still
        # far below the dequantized bf16 bytes) and ride the MXU's 2x
        # int8 rate; per-chunk activation absmax is also tighter than one
        # global scale
        from qpalette_tpu.kernels import fused
        N, n = z.shape
        CH = fused_rows
        pad = (-N) % CH
        zp = jnp.pad(z, ((0, pad), (0, 0))) if pad else z
        zc = zp.reshape(-1, CH, n)
        y = jax.lax.map(lambda zz: fused.decode_matmul(spec, p, zz, luts),
                        zc)
        y = y.reshape(-1, spec.out_features)[:N]
    elif spec.impl in ("pallas", "pallas_a8"):
        # large-row exact path: kernel-order dequant once + bf16 MXU
        # matmul; the activation/output sides absorb the layout
        # permutations (the natural-order weight relayout was ~100x
        # slower than the stream)
        from qpalette_tpu.kernels import fused
        y = fused.dequant_matmul(spec, p, z, luts)
    else:
        w = dequant_weight(spec, p, luts).astype(z.dtype)
        y = jax.lax.dot_general(
            z, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    return (y * p["wscale"][None, :].astype(jnp.float32)).astype(odt)

"""Analytic memory model for quantized layers.

Reference behavior: lib/utils/mem_op.py:309-334 (get_layer_mem /
get_constant_mem) and calc_avg_bits (:446-469) — bytes per layer including
LUT overhead, plus 1 bit/row for the SU sign vectors of the four rotation
groups.
"""

from __future__ import annotations

from qpalette_tpu.models.llama import LlamaConfig
from qpalette_tpu.quant.incoherent import parse_quantizer_str
from qpalette_tpu.ops.codebooks import tlut_bits_for_kv

LAYER_KEYS = [
    "self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
    "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj", "mlp.down_proj",
]
SU_KEYS = ["self_attn.q_proj", "self_attn.o_proj", "mlp.up_proj",
           "mlp.down_proj"]  # one SU per rotation group


def layer_shape(cfg: LlamaConfig, key: str):
    from qpalette_tpu.runtime.loader import proj_shape
    return proj_shape(cfg, key)


def layer_mem_bytes(cfg: LlamaConfig, key: str, quantizer_str: str) -> float:
    m, n = layer_shape(cfg, key)
    if quantizer_str == "default":
        return m * n * 2.0  # bf16
    s = parse_quantizer_str(quantizer_str)
    if s.family in ("ldlq", "sq", "vq2"):
        return (m * n * s.bits / s.vec / 8
                + (1 << s.bits) * s.vec * 2)
    if s.family in ("tcq1", "tcq1x2"):
        return m * n * s.KV[0] / 8  # arithmetic decode: no LUT bytes
    if s.family in ("tcq2", "tcq2s"):
        return m * n * s.KV[0] / 2 / 8  # V=2 arithmetic: KV/2 bits/weight
    if s.family == "tcq":
        tb = tlut_bits_for_kv(s.KV[0])
        return m * n * s.KV[0] / 2 / 8 + (1 << tb) * 2 * 2
    if s.family in ("tcomb", "comb"):
        tb = tlut_bits_for_kv(max(s.KV))
        return (m * n * (s.KV[0] + s.KV[1]) / 4 / 8
                + (1 << tb) * 2 * 2)
    raise ValueError(s.family)


def constant_mem_bytes(cfg: LlamaConfig) -> float:
    """SU sign bits per layer (reference mem_op.py:328-334)."""
    return sum(layer_shape(cfg, k)[1] / 8 for k in SU_KEYS)


def calc_avg_bits(cfg: LlamaConfig, qdict, num_layers=None) -> float:
    nl = num_layers or cfg.num_layers
    total = 0.0
    default = 0.0
    for i in range(nl):
        for key in LAYER_KEYS:
            v = qdict[f"{i}_{key}"] if not isinstance(qdict, str) else qdict
            if isinstance(v, (tuple, list)):
                v = v[0]
            total += layer_mem_bytes(cfg, key, v)
            default += layer_mem_bytes(cfg, key, "default")
            if key in SU_KEYS:
                total += layer_shape(cfg, key)[1] / 8
    return total / default * 16
